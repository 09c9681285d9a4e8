package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The Spark-internal-surface tripwire (round 18, VERDICT r17 item 4).
  *
  * This library deliberately rides three Spark-internal surfaces:
  * `org.apache.spark.sql.graftbridge.Bridge` (the `private[sql]`
  * Column⇄Expression converters and `Dataset.ofRows`), the codegen
  * extension points (`defineCodeGen`/`nullSafeCodeGen`), and — most
  * subtly — `UTF8String`'s byte-stepping semantics, which
  * [[graft.functions.RollingHash64]] and
  * [[graft.functions.SanitizeUtf8]] replicate EXACTLY so that
  * fingerprint position i means `substring(s, i+1, 1)` even on
  * malformed crawl bytes. Those replicas were probed empirically on
  * Spark 4.1.2; a jar bump that changes any of them would silently skew
  * every substring-dedup fingerprint rather than fail a test.
  *
  * This spec asserts the probed behaviors DIRECTLY against the Spark
  * runtime on the classpath, so an upgrade fails a NAMED spec here
  * (mirroring OracleConventionSpec for the DuckDB side):
  *  - the exact Spark version contract (4.1.2);
  *  - the full 256-entry `numBytesForFirstByte` table;
  *  - `numChars`/`substringSQL` full-step advancement on the r16/r17
  *    malformed-lead cases (truncated multi-byte tail at end-of-string,
  *    stray continuation byte, invalid lead), including the
  *    zero-padded over-read a truncated lead produces — behaviors the
  *    rolling-hash property suite depends on holding steady.
  */
class SparkInternalsSpec extends AnyFunSuite {

  test("Spark version contract: internals probed on exactly this release") {
    // Bridge, TypeBridge, the codegen kernels, and the DSv2 source were
    // written and probed against the 4.1.2 jars in /opt/spark/jars. On
    // a version bump, re-verify: ExpressionUtils visibility, the
    // UTF8String behaviors below, and the transformWithState API shape.
    assert(org.apache.spark.SPARK_VERSION == "4.1.2",
      s"Spark runtime moved to ${org.apache.spark.SPARK_VERSION}: " +
        "re-probe every internal surface this spec documents before trusting " +
        "the substring-dedup fingerprints or the graftbridge shims")
  }

  test("numBytesForFirstByte: the full 256-entry stepping table") {
    // The table RollingHash64.codePoints and SanitizeUtf8 replicate:
    // 0x00-0xC1 -> 1 (ASCII, continuations, and the invalid overlong
    // leads C0/C1), 0xC2-0xDF -> 2, 0xE0-0xEF -> 3, 0xF0-0xF4 -> 4,
    // 0xF5-0xFF -> 1 (invalid leads).
    def expected(b: Int): Int =
      if (b < 0xc2) 1
      else if (b < 0xe0) 2
      else if (b < 0xf0) 3
      else if (b < 0xf5) 4
      else 1
    val drift = (0 until 256).flatMap { b =>
      val got = UTF8String.numBytesForFirstByte(b.toByte)
      if (got == expected(b)) None
      else Some(f"lead 0x$b%02X: runtime steps $got, kernels assume ${expected(b)}")
    }
    assert(drift.isEmpty,
      "UTF8String stepping table drifted — RollingHash64/SanitizeUtf8 " +
        s"positions no longer align with substring:\n${drift.mkString("\n")}")
  }

  test("malformed-lead substring stepping: full-step advance, clamped copy") {
    // Case 1 (r16): truncated 2-byte lead at end of string. The lead
    // still consumes its full step, so numChars counts it as one slot,
    // and substringSQL copies its DECLARED width zero-padded past the
    // end of the backing array. RollingHash64 hashes this slot as
    // U+FFFD; what matters here is that the slot EXISTS and position
    // arithmetic stays aligned.
    val truncated = UTF8String.fromBytes(Array('a'.toByte, 0xc3.toByte))
    assert(truncated.numChars() == 2,
      "truncated lead must still occupy exactly one character slot")
    assert(truncated.substringSQL(1, 1).toString == "a")
    assert(truncated.substringSQL(2, 1).getBytes.toSeq ==
      Seq(0xc3.toByte, 0x00.toByte),
      "truncated-lead slice: declared width, zero-padded over-read")

    // Case 2 (r17): stray continuation byte, ASCII, then a truncated
    // 4-byte lead. Three slots — continuation bytes are one slot each,
    // the 4-byte lead consumes 4 declared bytes (2 real + 2 padded).
    val stray = UTF8String.fromBytes(
      Array(0x80.toByte, 'x'.toByte, 0xf4.toByte, 'y'.toByte))
    assert(stray.numChars() == 3,
      "stray continuation = 1 slot; truncated 4-byte lead = 1 slot")
    assert(stray.substringSQL(1, 1).getBytes.toSeq == Seq(0x80.toByte))
    assert(stray.substringSQL(2, 1).toString == "x")
    assert(stray.substringSQL(3, 1).getBytes.toSeq ==
      Seq(0xf4.toByte, 'y'.toByte, 0x00.toByte, 0x00.toByte),
      "truncated 4-byte lead swallows the following byte and zero-pads")

    // Case 3: invalid lead 0xF5+ steps ONE byte (not 4) — the boundary
    // the table test pins, exercised through the substring path.
    val invalid = UTF8String.fromBytes(
      Array(0xf5.toByte, 'a'.toByte, 'b'.toByte))
    assert(invalid.numChars() == 3, "invalid lead 0xF5 advances one byte")
    assert(invalid.substringSQL(2, 2).toString == "ab")
  }

  test("graftbridge: Column⇄Expression and ofRows round-trip") {
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = TestSpark.spark
    import spark.implicits._
    val col = org.apache.spark.sql.functions.lit(7L) * 2
    val expr = Bridge.expression(col)
    val back = Bridge.column(expr)
    val df = Seq(1).toDF("x").select(back.as("y"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(14L))
    val viaPlan = Bridge.ofRows(spark,
      df.queryExecution.analyzed)
    assert(viaPlan.collect().map(_.getLong(0)).toSeq == Seq(14L),
      "Dataset.ofRows shim must execute an analyzed plan unchanged")
  }
}
