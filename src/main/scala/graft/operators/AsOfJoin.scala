package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (SURVEY.md J5) — "for each probe row, the latest
  * build-side value with build.ts <= probe.ts, per key".
  *
  * Spark has no native as-of operator; the naive rewrite (range join or
  * per-checkpoint scan) degenerates at scale. This is the single-shuffle
  * form: tag and union both sides, sort within each key by
  * (ts, build-before-probe), and forward-fill the build value with
  * last(ignoreNulls). One exchange on the key, one sort — the same cost as
  * one window query over the combined data, independent of how many probe
  * rows per key.
  *
  * Ordering puts build rows before probe rows at equal timestamps, so the
  * match is inclusive (<=).
  */
object AsOfJoin {

  /** @param probe      rows to enrich (kept unchanged, plus `as` column)
    * @param build      rows carrying the state value
    * @param key        equi key on both sides
    * @param tsCol      event-time column name present on both sides
    * @param buildValue build-side column to carry over
    * @param as         output column name on the probe side
    */
  def lastValueAsOf(probe: DataFrame, build: DataFrame, key: String,
      tsCol: String, buildValue: String, as: String): DataFrame = {
    val valueType = build.schema(buildValue).dataType
    val pCols = probe.columns.toSeq
    val p = probe
      .withColumn("__side", lit(1))
      .withColumn("__bv", lit(null).cast(valueType))
    val bBase = build
      .select(col(key), col(tsCol), col(buildValue).as("__bv"))
      .withColumn("__side", lit(0))
    // null-pad the probe-only columns onto the build side for the union
    val b = pCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(bBase) { (df, c) =>
        df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
      }
    val order = pCols ++ Seq("__side", "__bv")
    val u = p.select(order.map(col): _*)
      .unionByName(b.select(order.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(as, last(col("__bv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__bv")
  }
}
