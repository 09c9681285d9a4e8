package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-component minhash signature of a shingle array in ONE pass — the
  * signature tier of the LSH dedup family (SURVEY.md §2.9 X2,
  * `q_dedup_minhash_lsh` and the cluster pipeline behind it).
  *
  * Semantics are EXACTLY the composable HOF form it replaces (and the
  * DuckDB oracle mirrors): per shingle, the 64 lowercase hex chars of
  * `md5(sh) || md5('x' || sh)`; component j = the minimum 8-hex-char
  * chunk [8j, 8j+8) across shingles, compared as strings (fixed-length
  * lowercase hex, so string order == numeric order).
  *
  * Why a native expression: the HOF form materializes a 64-char string
  * per shingle and then runs K=8 more `transform`+`substring` passes
  * plus K `array_min` reductions over that array — all interpreted, ~9
  * traversals with per-element lambda dispatch and string slicing. This
  * is one JVM loop per row: two digests per shingle, running minima in
  * a K-slot array, zero intermediate arrays. (No doGenCode: md5 itself
  * dominates; the win is killing the 9 traversals, not the dispatch.)
  *
  * NULL array → NULL; a NULL shingle → NULL (the HOF form would poison
  * the mins with nulls anyway; shingle arrays are never null here).
  */
case class MinhashSig(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  val K = 8 // 64 hex chars (2 md5 digests) / 8-char chunks

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte], out: Array[Char], off: Int): Unit = {
    var i = 0
    while (i < bytes.length) {
      out(off + 2 * i) = hexChars((bytes(i) & 0xf0) >> 4)
      out(off + 2 * i + 1) = hexChars(bytes(i) & 0x0f)
      i += 1
    }
  }

  /** Shared by interpreted eval and tests. */
  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](K)
    val hexBuf = new Array[Char](64)
    var s = 0
    while (s < n) {
      if (shingles.isNullAt(s)) return null
      val sh = shingles.getUTF8String(s).getBytes
      hex(md.digest(sh), hexBuf, 0)
      md.reset()
      md.update('x'.toByte)
      md.update(sh)
      hex(md.digest(), hexBuf, 32)
      var j = 0
      while (j < K) {
        val chunk = new String(hexBuf, 8 * j, 8)
        if (mins(j) == null || chunk < mins(j)) mins(j) = chunk
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString))
  }

  /** Column-API entry point: input must be ARRAY<STRING> of shingles. */
  def minhashSig(shingles: Column): Column =
    Bridge.column(MinhashSig(Bridge.expression(shingles)))
}
