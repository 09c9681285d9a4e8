package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for 100 TB-scale shuffles (SURVEY.md §7.4).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases AQE does not: hot-key *aggregation* skew and
  * broadcast-infeasible hot-key joins. Both follow the classic salting
  * scheme — spread a hot key over `n` synthetic sub-keys, do the heavy
  * shuffle on the salted key, then collapse.
  */
object Salting {

  /** Deterministic per-row salt in [0, n). Derived from the whole row's
    * hash rather than rand() so results are reproducible run-to-run. */
  def rowSalt(n: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(n))

  /** Two-phase salted sum/count aggregation: shuffle 1 groups on
    * (keys, salt) — hot keys split across n reducers — shuffle 2 collapses
    * the n partials per key. Correct for any decomposable aggregate; sum
    * and count are provided, extend by analogy.
    *
    * At 100 TB the first shuffle is the expensive one; it now has no
    * reducer hotter than hotkey_rows/n.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      n: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      rowSalt(n, df.columns.map(col).toSeq))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join for a hot-keyed left side against a right side too
    * large to broadcast: left rows get a deterministic salt in [0, n);
    * right rows are replicated n times (one per salt value); the join is
    * equi on (key, salt) so each hot key spreads over n reducers.
    *
    * Right-side replication costs n×|right| shuffle volume — use only when
    * the right side is the (much) smaller one and still over the broadcast
    * threshold.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      rowSalt(n, left.columns.map(col).toSeq))
    val explodedRight = right.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    saltedLeft.join(explodedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
