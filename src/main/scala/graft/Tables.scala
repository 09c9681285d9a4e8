package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * Every declared query starts from a parquet scan of one of these tables
  * (SURVEY.md §2.1 S11). Loading is a plain `spark.read.parquet` so Catalyst
  * keeps full pushdown freedom (column pruning + predicate pushdown reach the
  * scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (Spark 4 rejects it by default — read
    * nanos as long, truncate to µs) and naive timestamp[us] (Spark reads
    * it as TIMESTAMP_NTZ). Both normalize to a session-TZ TIMESTAMP; the
    * session pins UTC, so the NTZ cast preserves the stored micros
    * exactly — matching DuckDB's epoch_us() over the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Round-robin-spread a BATCH relation whose planned scan parallelism
    * sits below the session's core count (r21, guide §2.5 "input skew …
    * repartition immediately after the read"). Parquet splits only at
    * row-group boundaries, so a single-row-group file is ONE scan task no
    * matter how many cores the session has — the bench's task-metrics
    * attribution measured the whole marked-fold family running at
    * parallelism ≈ 1.0 on 32 cores (q_tokens_per_doc 5.8 s wall ≈ 5.6 s
    * single-task run time at sf1). The spread is conditional and
    * therefore scale-adaptive: at real scale a corpus scan has thousands
    * of row groups and this is a no-op; it fires exactly when the scan
    * under-parallelizes. `repartition(n)` is a user-specified partition
    * count (AQE will not coalesce it away) and round-robin sorts before
    * exchanging (SPARK-23207), so retried tasks reproduce the same
    * row-to-partition assignment. Never applied to streaming relations
    * (micro-batch parallelism is the source's contract). */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val want = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < want) df.repartition(want) else df
    }
  }
}

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against a DuckDB run of the
  * oracle SQL. Floating-point SUM/AVG over doubles is order-dependent, and
  * Spark's partial aggregation order differs from DuckDB's — so any money
  * arithmetic goes through exact DECIMAL and is cast back to DOUBLE only as
  * the very last step (a single exact decimal value casts to the identical
  * IEEE double on both engines). Timestamps are emitted as epoch
  * microseconds (BIGINT) or formatted date strings so physical parquet
  * timestamp encodings can never disagree.
  */
object Ops {
  /** Exact 2-decimal money representation; test-table doubles are generated
    * with 2 decimals so the cast is unambiguous. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Deterministic SUM over a money column: exact decimal sum → double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Deterministic AVG: exact decimal sum cast to double, divided by count
    * (double/long division is IEEE-deterministic given identical inputs). */
  def avgMoney(c: Column): Column =
    sum(money(c)).cast(DoubleType) / count(c)

  /** Timestamp → epoch microseconds (DuckDB: epoch_us(ts)). */
  def epochUs(c: Column): Column = unix_micros(c)

  /** Timestamp → 'yyyy-MM-dd' string (DuckDB: strftime(ts, '%Y-%m-%d')). */
  def dayStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
