package graft.analytics

import graft.{GraftSession, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cost-based-optimizer evidence (SURVEY.md §4): real `ANALYZE TABLE`
  * statistics driving a join-reorder decision, exercised as a declared
  * query so the oracle gate covers the CBO-planned path end-to-end.
  *
  * The query text deliberately writes the WORST join order — the two
  * fact-scale tables first, the selective filtered dim last. Rule-based
  * optimization keeps roughly the written associativity; with table +
  * column stats and `spark.sql.cbo.joinReorder.enabled`, the DP
  * re-associates to grow the plan from the small side. CboSpec pins the
  * reorder in the optimized plan; this query pins that the reordered
  * plan still returns oracle-exact results.
  */
object CboQueries {

  /** Tables whose statistics feed the reorder DP. */
  val statTables: Seq[String] = Seq("lineitem", "orders", "customer", "nation")

  /** Star join written big-tables-first; planned under CBO (stats present)
    * so the physical plan is the DP's choice, then confs revert. */
  def cboStarJoin(s: SparkSession, dir: String): DataFrame = {
    val p = GraftSession.ensureStats(s, dir, statTables)
    GraftSession.withCbo(s) {
      val df = s.sql(
        s"""SELECT n_name, COUNT(*) AS n,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS revenue
           |FROM ${p}lineitem
           |JOIN ${p}orders ON l_orderkey = o_orderkey
           |JOIN ${p}customer ON o_custkey = c_custkey
           |JOIN ${p}nation ON c_nationkey = n_nationkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY n_name ORDER BY n_name""".stripMargin)
      df.queryExecution.executedPlan // freeze the CBO-planned physical plan
      df
    }
  }

  val cboStarJoinSql: String =
    """SELECT n_name, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_cbo_star_join", cboStarJoin, Some(cboStarJoinSql),
      "CBO: ANALYZE stats + join-reorder DP replans a bad written order"))
}
