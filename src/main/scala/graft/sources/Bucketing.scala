package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join scale path (SURVEY.md
  * "Partitioning & shuffle").
  *
  * Writing both sides of a recurring fact⋈fact join bucketed (and sorted)
  * by the join key lets Spark plan a sort-merge join with NO exchange on
  * either side: at 100 TB that removes the dominant cost (shuffling both
  * fact tables) from every downstream join on that key. The trade is paid
  * once at write time.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
