package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All W-CHARACTER window fingerprints of a string in ONE pass — the
  * 8-byte production key of the exact-substring dedup family (SURVEY.md
  * §2.9 X1c): polynomial rolling hash over the Unicode CODE POINTS,
  * base 1000003, arithmetic wrapping mod 2⁶⁴. Position p (0-based)
  * hashes code points [p, p+W); a string shorter than W code points
  * yields an empty array.
  *
  * Code-point grain, not byte grain, is load-bearing: every consumer of
  * these positions slices with `substring(text, p, W)` and compares
  * against DuckDB `substr`, and BOTH of those count characters (code
  * points), not UTF-8 bytes. A byte-grained window would shift every
  * position after the first multi-byte character, so the hashed dedup's
  * verify stage would slice the wrong windows and diverge from the
  * string-keyed form on non-ASCII text (the grain CdcChunks already
  * uses for the same reason). On pure-ASCII input code point == byte
  * value, so ASCII fingerprints are identical under either grain.
  *
  * Why a native expression: the composable form evaluates
  * `xxhash64(substr(text, p, W))` per exploded position — O(n·W) char
  * work and one string allocation per window (40× the input for W=40).
  * The rolling recurrence h(p+1) = (h(p) − c_p·B^{W−1})·B + c_{p+W−1}
  * makes the whole row O(n) with one decoded code-point array per row.
  * Identical hashing on the index-build and probe sides is the
  * only contract (both call this expression); collisions (~2⁻⁶⁴ per
  * probe) can only overcount the admission signal, never corrupt the
  * exact span dedup, which groups on window CONTENT.
  *
  * Codegen emits a static call into [[RollingHash64.hash]] — one tight
  * JVM loop, no interpreted-eval dispatch, and the enclosing stage stays
  * inside whole-stage codegen (a CodegenFallback here would break the
  * stage around every fingerprint scan).
  */
case class RollingHash64(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // analysis-time typing: a SQL call with a BIGINT text argument or a
  // non-integer width is rejected (or implicitly cast) at analysis, not
  // as an executor-side ClassCastException
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(str: Any, w: Any): Any =
    RollingHash64.hash(str.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w) =>
      s"${ev.value} = graft.functions.RollingHash64.hash($s, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingHash64 {

  /** Polynomial base — odd, so multiplication mod 2⁶⁴ is a bijection and
    * leading bytes never wash out of the window hash. */
  val Base = 1000003L

  /** One pass over the UTF-8 bytes → code points, CHAR grain: the i-th
    * slot is what Spark `substring(s, i+1, 1)` / DuckDB `substr` sees,
    * including supplementary planes (a 4-byte emoji is ONE code point
    * here, exactly as both engines count it — Java String.length would
    * count two UTF-16 units and shift every later position).
    *
    * MALFORMED input is total, never thrown on: crawl-shaped corpora
    * carry truncated multi-byte tails, stray continuation bytes, and
    * invalid leads, and one bad doc must not fail (or silently corrupt)
    * a corpus-wide dedup pass. The stepping mirrors Spark 4's
    * `UTF8String.numBytesForFirstByte` EXACTLY (probed empirically, and
    * pinned against `substringSQL` on arbitrary byte arrays by a
    * scalacheck property): lead 0x00-0xBF advances 1 (continuations are
    * one char each), 0xC0/0xC1 advance 1 (invalid overlong leads),
    * 0xC2-0xDF advance 2, 0xE0-0xEF advance 3, 0xF0-0xF4 advance 4,
    * 0xF5-0xFF advance 1 — multi-byte leads consume their FULL step
    * regardless of what the following bytes contain, exactly as Spark's
    * substring does. So position i here is position i of `substring`
    * even mid-garbage, and the slot count always equals `numChars()`
    * (no resize, no zero-filled phantom slots). A sequence whose
    * continuation bytes are missing (truncated at end of string) or
    * invalid (not 0x80-0xBF) hashes as U+FFFD, the Unicode replacement
    * character — a stray continuation or invalid lead likewise. */
  private def codePoints(s: UTF8String): Array[Int] = {
    val b = s.getBytes
    val out = new Array[Int](s.numChars())
    var i = 0
    var j = 0
    while (i < b.length) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) { out(j) = b0; i += 1 }
      else if (b0 < 0xc2 || b0 >= 0xf5) { out(j) = 0xfffd; i += 1 }
      else {
        val step = if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
        var cp = b0 & (0xff >> (step + 1))
        var k = 1
        var ok = i + step <= b.length
        while (ok && k < step) {
          val bc = b(i + k) & 0xff
          if (bc < 0x80 || bc >= 0xc0) ok = false
          else { cp = (cp << 6) | (bc & 0x3f); k += 1 }
        }
        out(j) = if (ok) cp else 0xfffd
        i += step
      }
      j += 1
    }
    out
  }

  /** Shared by interpreted eval, generated code, and tests. */
  def hash(s: UTF8String, w: Int): ArrayData = {
    val c = codePoints(s)
    val n = c.length
    if (w <= 0 || n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    var pw = 1L
    var i = 0
    while (i < w - 1) { pw *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + c(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - w) {
      h = (h - c(p - 1) * pw) * Base + c(p + w - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def rollingHash64(str: Column, w: Column): Column =
    Bridge.column(RollingHash64(Bridge.expression(str), Bridge.expression(w)))
}
