package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Co-occurrence and statistical-test operators: market-basket pair
  * mining and contingency-table chi-square — the analytics a feature/
  * mixture pipeline runs to find correlated dimensions before deciding
  * sampling weights.
  *
  * Determinism: all counts are integers; the chi-square doubles are
  * computed with the identical expression order in both engines from
  * those exact integers, then rounded (libm-free arithmetic only:
  * +,-,*,/ are IEEE-exact given identical operands).
  */
object StatsQueries {

  // --- ST1: market-basket co-occurrence pairs ----------------------------

  /** Top-20 part pairs that co-occur in the most orders — frequent-pair
    * mining as one co-partitioned self-join: both sides hash on
    * l_orderkey (a single shuffle the two scans share), pairs expand
    * locally with p1 < p2, and the pair count is a hash aggregate.
    *
    * Scale: pair expansion is quadratic ONLY in basket size (TPC-H
    * baskets are ≤7 lines; real carts are similarly bounded — an
    * unbounded-basket corpus would cap the per-basket expansion with the
    * BoundedCollect pattern first). The aggregate's key space is the
    * pair dictionary, pruned by the final TakeOrderedAndProject top-k —
    * no global sort materializes. */
  def basketPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val pairs = li.join(li.toDF("ok", "pk2"), "ok")
      .filter($"pk" < $"pk2")
    pairs.groupBy($"pk".as("part1"), $"pk2".as("part2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"n_orders".desc, $"part1".asc, $"part2".asc)
      .limit(20)
  }

  val basketPairsSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      |SELECT a.pk AS part1, b.pk AS part2, COUNT(*) AS n_orders
      |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, part1, part2
      |LIMIT 20""".stripMargin

  // --- ST2: contingency table + chi-square -------------------------------

  /** lang × source contingency table with expected counts and per-cell
    * chi-square contributions — the independence test behind "does source
    * mix vary by language" (and, at training scale, "is my mixture
    * confounded"). Observed counts aggregate once; row totals, column
    * totals, and the grand total come from window sums over the tiny cell
    * table, so the fact table is scanned exactly once.
    *
    * Scale: one hash aggregate over the corpus to |langs|×|sources|
    * cells; everything after operates on that constant-size table —
    * window partitioning replaces three separate re-aggregations. */
  def contingencyChi2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("observed"))
    val wr = Window.partitionBy($"lang")
    val wc = Window.partitionBy($"source")
    val wall = Window.partitionBy()
    cells
      .withColumn("row_total", sum($"observed").over(wr))
      .withColumn("col_total", sum($"observed").over(wc))
      .withColumn("grand_total", sum($"observed").over(wall))
      .withColumn("expected",
        round($"row_total".cast(DoubleType) * $"col_total".cast(DoubleType)
          / $"grand_total".cast(DoubleType), 6))
      .withColumn("chi2_cell",
        round(($"observed".cast(DoubleType) - $"expected")
          * ($"observed".cast(DoubleType) - $"expected") / $"expected", 6))
      .select($"lang", $"source", $"observed", $"row_total", $"col_total",
        $"expected", $"chi2_cell")
      .orderBy($"lang", $"source")
  }

  val contingencyChi2Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, COUNT(*) AS observed
      |  FROM documents GROUP BY 1, 2),
      |t AS (
      |  SELECT lang, source, observed,
      |    SUM(observed) OVER (PARTITION BY lang) AS row_total,
      |    SUM(observed) OVER (PARTITION BY source) AS col_total,
      |    SUM(observed) OVER () AS grand_total
      |  FROM cells),
      |e AS (
      |  SELECT lang, source, observed,
      |    CAST(row_total AS BIGINT) AS row_total,
      |    CAST(col_total AS BIGINT) AS col_total,
      |    round(CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)
      |      / CAST(grand_total AS DOUBLE), 6) AS expected
      |  FROM t)
      |SELECT lang, source, observed, row_total, col_total, expected,
      |  round((CAST(observed AS DOUBLE) - expected)
      |    * (CAST(observed AS DOUBLE) - expected) / expected, 6) AS chi2_cell
      |FROM e ORDER BY lang, source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_basket_pairs", basketPairs, Some(basketPairsSql),
      "ST1 market-basket co-occurrence: co-partitioned self-join pair mining"),
    QueryDef("q_stats_contingency", contingencyChi2, Some(contingencyChi2Sql),
      "ST2 contingency table with chi-square contributions from one scan"))
}
