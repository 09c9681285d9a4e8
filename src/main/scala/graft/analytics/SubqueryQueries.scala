package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated / scalar / quantified subqueries (SURVEY.md §4 "subquery
  * decorrelation — we get free"): the one major Catalyst rewrite class, put
  * under the DuckDB oracle. The reference's per-train "latest vs average"
  * lookups (reference `main.tf:25-43`) are this shape.
  *
  * These are declared as SQL because correlated subqueries are a SQL-level
  * construct — the point is that Catalyst's decorrelation rules
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery) turn them
  * into the aggregate-plus-join plans a user would otherwise hand-write.
  * SubquerySpec asserts the rewrite actually happened (no subquery
  * predicates survive in the optimized plan) so a Catalyst regression can't
  * silently degrade these to per-row lookups.
  *
  * Determinism: `l_quantity` is integer-valued (1..50), so its double SUM
  * is exact in any summation order; `avg/5` is two IEEE ops on exact inputs
  * — bit-identical in Spark and DuckDB. Money sums go through DECIMAL as
  * everywhere else ([[graft.Ops]]).
  */
object SubqueryQueries {

  private def views(s: SparkSession, dir: String): Unit = {
    Tables.part(s, dir).createOrReplaceTempView("sq_part")
    Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
  }

  // --- Q17 shape: correlated SCALAR subquery ------------------------------
  /** Small-quantity orders relative to the part's own average — the
    * correlated scalar aggregate. Catalyst decorrelates to one aggregate
    * over lineitem joined back on partkey: at 100 TB that is one shuffle on
    * l_partkey feeding both sides, not a per-row lookup. */
  def subqueryScalar(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql("""
      SELECT l.l_partkey AS p_key,
             CAST(count(*) AS BIGINT) AS n_small,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_revenue
      FROM sq_part p
      JOIN sq_lineitem l ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23'
        AND l.l_quantity < (SELECT avg(l2.l_quantity) / 5
                            FROM sq_lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)
      GROUP BY l.l_partkey
      ORDER BY p_key""")
  }

  val subqueryScalarSql: String =
    """SELECT l.l_partkey AS p_key,
      |       CAST(count(*) AS BIGINT) AS n_small,
      |       CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
      |         AS small_revenue
      |FROM part p
      |JOIN lineitem l ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#23'
      |  AND l.l_quantity < (SELECT avg(l2.l_quantity) / 5
      |                      FROM lineitem l2
      |                      WHERE l2.l_partkey = p.p_partkey)
      |GROUP BY l.l_partkey
      |ORDER BY p_key""".stripMargin

  // --- Q4/Q21 shape: correlated EXISTS + NOT EXISTS -----------------------
  /** Finished orders with a returned line and no jumbo line — EXISTS
    * becomes a left-semi join, NOT EXISTS a left-anti join, both equi on
    * o_orderkey (the plans a user would hand-write; SubquerySpec pins
    * them). */
  def subqueryExists(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql("""
      SELECT o.o_orderpriority,
             CAST(count(*) AS BIGINT) AS order_count
      FROM sq_orders o
      WHERE o.o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM sq_lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_returnflag = 'R')
        AND NOT EXISTS (SELECT 1 FROM sq_lineitem l3
                        WHERE l3.l_orderkey = o.o_orderkey
                          AND l3.l_quantity > 48)
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority""")
  }

  val subqueryExistsSql: String =
    """SELECT o.o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o.o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = o.o_orderkey
      |                    AND l3.l_quantity > 48)
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  // --- Q18 shape: IN over an aggregated subquery --------------------------
  /** Large orders by total quantity — IN over a grouped HAVING subquery,
    * rewritten to a left-semi join against the aggregate. */
  def subqueryIn(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql("""
      SELECT o.o_orderkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM sq_orders o
      JOIN sq_lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM sq_lineitem l2
                             GROUP BY l2.l_orderkey
                             HAVING sum(l2.l_quantity) > 300)
      GROUP BY o.o_orderkey
      ORDER BY o.o_orderkey""")
  }

  val subqueryInSql: String =
    """SELECT o.o_orderkey,
      |       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM orders o
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM lineitem l2
      |                       GROUP BY l2.l_orderkey
      |                       HAVING sum(l2.l_quantity) > 300)
      |GROUP BY o.o_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_subquery_scalar", subqueryScalar, Some(subqueryScalarSql),
      "correlated scalar subquery (TPC-H Q17 shape), decorrelated by Catalyst"),
    QueryDef("q_subquery_exists", subqueryExists, Some(subqueryExistsSql),
      "EXISTS / NOT EXISTS (TPC-H Q4/Q21 shape) → semi/anti joins"),
    QueryDef("q_subquery_in", subqueryIn, Some(subqueryInSql),
      "IN over aggregated subquery (TPC-H Q18 shape) → semi join"))
}
