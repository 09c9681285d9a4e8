package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Explicit schema-contract enforcement (SURVEY.md §1.3/§1.4, §5 tier 3).
  *
  * The reference's only schema enforcement is a live-API contract test
  * (reference tests/integration/test_cta_api_response.py:20-40) plus
  * KeyErrors at access time; everything else is inferred. We pin explicit
  * StructTypes and treat drift as a hard error at the pipeline edge.
  */
object SchemaContract {

  /** Field-by-field differences, ignoring nullability (parquet readers
    * report everything nullable). Empty = contract satisfied. */
  def diff(actual: StructType, expected: StructType): Seq[String] = {
    val a = actual.fields.map(f => f.name -> f.dataType).toMap
    val e = expected.fields.map(f => f.name -> f.dataType).toMap
    val missing = e.keySet.diff(a.keySet).toSeq.sorted
      .map(n => s"missing column: $n (${e(n).simpleString})")
    val extra = a.keySet.diff(e.keySet).toSeq.sorted
      .map(n => s"unexpected column: $n (${a(n).simpleString})")
    val retyped = e.keySet.intersect(a.keySet).toSeq.sorted
      .filter(n => a(n) != e(n))
      .map(n => s"type drift: $n expected ${e(n).simpleString} got ${a(n).simpleString}")
    missing ++ extra ++ retyped
  }

  /** Throws with every violation listed — schema drift should fail loudly
    * at the edge, not as a KeyError three stages later. */
  def assertMatches(df: DataFrame, expected: StructType, what: String): Unit = {
    val d = diff(df.schema, expected)
    if (d.nonEmpty)
      throw new IllegalStateException(
        s"schema contract violated for $what:\n  ${d.mkString("\n  ")}")
  }
}

/** Pinned schemas for the driver's test tables (TESTDATA.md) — the §1.4
  * "explicit StructType constants" stance applied to the analytics side.
  * `events.ts` is declared as the µs timestamp it becomes after the
  * nanos-as-long read conversion in Tables.events. */
object TestTableSchemas {
  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val all: Map[String, StructType] = Map(
    "region" -> st("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> st("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> st("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> st("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> st("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> st("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // parquet timestamp[ms] with isAdjustedToUTC=false → TIMESTAMP_NTZ
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> st("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> st("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> st("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> st("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
}
