package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All W-byte window fingerprints of a string in ONE pass — the 8-byte
  * production key of the exact-substring dedup family (SURVEY.md §2.9
  * X1c): polynomial rolling hash over the UTF-8 bytes, base 1000003,
  * arithmetic wrapping mod 2⁶⁴. Position p (0-based) hashes bytes
  * [p, p+W); a string shorter than W yields an empty array.
  *
  * Why a native expression: the composable form evaluates
  * `xxhash64(substr(text, p, W))` per exploded position — O(n·W) byte
  * work and one string allocation per window (40× the input for W=40).
  * The rolling recurrence h(p+1) = (h(p) − b_p·B^{W−1})·B + b_{p+W−1}
  * makes the whole row O(n) with zero allocations beyond the output
  * array. Identical hashing on the index-build and probe sides is the
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

  /** Shared by interpreted eval, generated code, and tests. */
  def hash(s: UTF8String, w: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    if (w <= 0 || n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    var pw = 1L
    var i = 0
    while (i < w - 1) { pw *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (b(i) & 0xff); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - w) {
      h = (h - (b(p - 1) & 0xff) * pw) * Base + (b(p + w - 1) & 0xff)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def rollingHash64(str: Column, w: Column): Column =
    Bridge.column(RollingHash64(Bridge.expression(str), Bridge.expression(w)))
}
