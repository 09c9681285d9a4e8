package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Deequ-style
  * audit a warehouse runs after every load, as one query: each rule is a
  * named violation count, the report is rules × counts. A healthy load
  * reports zeros; the operator's value is that it ALWAYS runs and its
  * shape never depends on the data.
  */
object QualityGate {

  /** Violation counts for a fixed rule set over the star schema:
    * null/duplicate keys, referential orphans (both directions of the
    * order↔lineitem and order↔customer edges), domain bounds, and
    * cross-field consistency. Each anti-join prunes to the two key
    * columns before shuffling; the count aggregates are one pass per
    * table. Scale note: every rule is either a narrow filter-count or a
    * key-only anti-join — nothing materializes wide rows, and AQE
    * broadcasts the smaller key set. */
  def dqExpectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val customer = Tables.customer(s, dir)

    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), $"n_violations")

    val rules = Seq(
      cnt("orders_null_key", orders.where($"o_orderkey".isNull)),
      cnt("orders_dup_key", orders.groupBy($"o_orderkey")
        .agg(count(lit(1)).as("c")).where($"c" > 1)),
      // Orphan rules are left_anti joins; the oracle spells them NOT EXISTS
      // (same null semantics). NOT IN would return UNKNOWN on any NULL key
      // and count 0 — diverging exactly when the gate matters.
      cnt("orders_orphan_custkey", orders.select($"o_custkey")
        .join(customer.select($"c_custkey"),
          $"o_custkey" === $"c_custkey", "left_anti")),
      cnt("lineitem_orphan_orderkey", lineitem.select($"l_orderkey")
        .join(orders.select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti")),
      cnt("lineitem_nonpositive_qty", lineitem.where($"l_quantity" <= 0)),
      cnt("lineitem_discount_range", lineitem
        .where($"l_discount" < 0 || $"l_discount" > 0.5)),
      cnt("lineitem_negative_price", lineitem.where($"l_extendedprice" < 0)),
      cnt("orders_future_date", orders
        .where($"o_orderdate" > lit("2030-01-01").cast("timestamp"))),
      // a rule that fires on this data, so the report provably counts
      cnt("lineitem_qty_over_40", lineitem.where($"l_quantity" > 40)))

    rules.reduce(_ unionByName _).orderBy($"rule")
  }

  val dqExpectationsSql: String =
    """SELECT 'lineitem_discount_range' AS rule,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.5) AS n_violations
      |UNION ALL SELECT 'lineitem_negative_price',
      |  (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < 0)
      |UNION ALL SELECT 'lineitem_nonpositive_qty',
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
      |UNION ALL SELECT 'lineitem_orphan_orderkey',
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |UNION ALL SELECT 'lineitem_qty_over_40',
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 40)
      |UNION ALL SELECT 'orders_dup_key',
      |  (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1))
      |UNION ALL SELECT 'orders_future_date',
      |  (SELECT COUNT(*) FROM orders WHERE o_orderdate > TIMESTAMP '2030-01-01')
      |UNION ALL SELECT 'orders_null_key',
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL)
      |UNION ALL SELECT 'orders_orphan_custkey',
      |  (SELECT COUNT(*) FROM orders r WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey))
      |ORDER BY rule""".stripMargin

  // --- DQ2: composition-drift audit ----------------------------------------

  /** Month-over-month composition drift: the L1 (total-variation ×2)
    * distance between consecutive months' order-priority mixes, in
    * integer basis points — the "did my input mixture silently shift"
    * gate a training pipeline runs on source/language shares before each
    * refresh. Shares never materialize as floats: the pair's common
    * denominator cross-multiplies through, drift_bp =
    * Σ_p |c_cur(p)·n_prev − c_prev(p)·n_cur| · 10⁴ div (n_cur·n_prev),
    * exact int64 while month volume < ~3e9 rows. Categories present in
    * only one month contribute their full share (full-outer + coalesce).
    *
    * Scale: one (month, priority) hash aggregate over the fact table;
    * everything after runs on the constant |months|·|priorities| table
    * (the month-rank window is over ≤ calendar-bounded rows). */
  def mixDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cnts = Tables.orders(s, dir)
      .select(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"o_orderpriority".as("prio"))
      .groupBy($"month", $"prio").agg(count(lit(1)).as("c"))
    val tot = cnts.groupBy($"month").agg(sum($"c").as("nt"))
      .withColumn("mrank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"month")))
    val cur = tot.select($"month".as("m_cur"), $"nt".as("n_cur"), $"mrank")
    val prev = tot.select($"month".as("m_prev"), $"nt".as("n_prev"),
      ($"mrank" + 1).as("mrank"))
    val monthPairs = cur.join(prev, Seq("mrank"))
    // explicit (pair × priority) grid: a category absent in a month
    // contributes its full share from the other side, absent in both
    // contributes 0 — no outer-join edge cases
    val prios = cnts.select($"prio").distinct()
    monthPairs.join(broadcast(prios))
      .join(cnts.select($"month".as("m_cur"), $"prio", $"c".as("c_cur")),
        Seq("m_cur", "prio"), "left")
      .join(cnts.select($"month".as("m_prev"), $"prio", $"c".as("c_prev")),
        Seq("m_prev", "prio"), "left")
      .groupBy($"m_prev", $"m_cur", $"n_cur", $"n_prev")
      .agg(sum(abs(coalesce($"c_cur", lit(0L)) * $"n_prev" -
        coalesce($"c_prev", lit(0L)) * $"n_cur")).as("l1num"))
      .select($"m_prev", $"m_cur",
        expr("l1num * 10000 div (n_cur * n_prev)").as("drift_bp"))
      .orderBy($"m_cur")
  }

  val mixDriftSql: String =
    """WITH cnts AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    o_orderpriority AS prio, COUNT(*) AS c
      |  FROM orders GROUP BY 1, 2),
      |tot AS (
      |  SELECT month, CAST(SUM(c) AS BIGINT) AS nt,
      |    row_number() OVER (ORDER BY month) AS mrank
      |  FROM cnts GROUP BY month),
      |mp AS (
      |  SELECT p.month AS m_prev, c.month AS m_cur,
      |    p.nt AS n_prev, c.nt AS n_cur
      |  FROM tot c JOIN tot p ON c.mrank = p.mrank + 1),
      |grid AS (
      |  SELECT mp.*, pr.prio
      |  FROM mp CROSS JOIN (SELECT DISTINCT prio FROM cnts) pr),
      |j AS (
      |  SELECT g.m_prev, g.m_cur, g.n_prev, g.n_cur,
      |    COALESCE(cc.c, 0) AS c_cur, COALESCE(cp.c, 0) AS c_prev
      |  FROM grid g
      |  LEFT JOIN cnts cc ON cc.month = g.m_cur AND cc.prio = g.prio
      |  LEFT JOIN cnts cp ON cp.month = g.m_prev AND cp.prio = g.prio)
      |SELECT m_prev, m_cur,
      |  CAST(SUM(abs(c_cur * n_prev - c_prev * n_cur)) * 10000
      |    // (n_cur * n_prev) AS BIGINT) AS drift_bp
      |FROM j GROUP BY m_prev, m_cur, n_cur, n_prev
      |ORDER BY m_cur""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_mix_drift", mixDrift, Some(mixDriftSql),
      "DQ2 month-over-month composition drift (L1 distance) in basis points"),
    QueryDef("q_dq_expectations", dqExpectations, Some(dqExpectationsSql),
      "DQ declarative data-quality expectations: rules x violation counts"))
}
