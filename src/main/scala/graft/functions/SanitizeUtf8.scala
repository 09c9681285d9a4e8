package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractDataType
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic UTF-8 sanitizer at [[RollingHash64]]'s exact stepping —
  * the bridge that makes the substring-dedup verify agree with its
  * fingerprint admission on MALFORMED text (SURVEY.md §2.9 X1c).
  *
  * The dedup family's contract is: two windows are duplicates iff their
  * decoded CODE-POINT sequences are equal, where decoding is Spark's
  * own `substring` stepping (`UTF8String.numBytesForFirstByte`) with
  * U+FFFD for every broken sequence — precisely what
  * [[RollingHash64.hash]] fingerprints. A raw `substring(text, p, W)`
  * slice honors the positions but not the values: a doc ending in a
  * truncated multi-byte sequence carries the ill-defined raw bytes into
  * the slice, so two positions whose fingerprints agree (both decode to
  * U+FFFD) can carry byte-different slices and the verify drops a real
  * trailing duplicate — or, symmetrically, keeps a spurious one.
  * Slicing from this expression's output instead makes the verify read
  * the SAME decoded sequence the fingerprint hashed: each stepping slot
  * re-encodes as the standard UTF-8 of its decoded code point (broken
  * sequences become a real 3-byte U+FFFD), so slot count, positions and
  * `substring` semantics are all preserved and every slice is
  * well-defined. On VALID input the output is byte-identical to the
  * input (and the fast path returns the input object unscanned twice —
  * no allocation), so oracle-visible behavior is unchanged; only
  * crawl-garbage tails gain a definition.
  *
  * Spark 4's `make_valid_utf8` cannot play this role — probed
  * empirically: after a failed multi-byte sequence it RE-STEPS the
  * bytes the lead already consumed (`C2 41` becomes U+FFFD + 'A', two
  * chars, where `substring`/`length` count ONE char), so it changes the
  * slot count and desyncs every later position from the fingerprint
  * stream. This expression steps exactly as `substring` does: the lead
  * consumes its full step, broken-or-not.
  *
  * Codegen emits a static call into [[SanitizeUtf8.sanitize]] — the
  * enclosing stage stays inside whole-stage codegen.
  */
case class SanitizeUtf8(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "sanitize_utf8"

  override protected def nullSafeEval(str: Any): Any =
    SanitizeUtf8.sanitize(str.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SanitizeUtf8.sanitize($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SanitizeUtf8 {

  /** Re-encode `s` as the standard UTF-8 of its decoded code points
    * under [[RollingHash64]]'s stepping. Valid input returns `s` itself
    * (one validation scan, zero allocation). Lone surrogates decoded
    * from CESU-shaped input (`ED A0 80` → U+D800) re-encode as their
    * 3-byte form — one stepping slot in, one slot out, which is the
    * position-fidelity invariant every consumer relies on; likewise an
    * overlong sequence re-encodes as its decoded code point's SHORTEST
    * form (that is the point: equality becomes code-point equality,
    * exactly the fingerprint's notion). */
  def sanitize(s: UTF8String): UTF8String = {
    val b = s.getBytes
    // validation pass at the numBytesForFirstByte stepping: a string is
    // clean iff every slot decodes without replacement AND re-encodes to
    // the same bytes (multi-byte leads complete, no overlongs — an
    // overlong must rewrite so equal code points compare equal)
    var i = 0
    var dirty = false
    while (i < b.length && !dirty) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xc2 || b0 >= 0xf5) { dirty = true }
      else {
        val step = if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
        if (i + step > b.length) dirty = true
        else {
          var k = 1
          var cp = b0 & (0xff >> (step + 1))
          while (k < step && !dirty) {
            val bc = b(i + k) & 0xff
            if (bc < 0x80 || bc >= 0xc0) dirty = true
            else { cp = (cp << 6) | (bc & 0x3f); k += 1 }
          }
          // overlong check: the decoded cp must need exactly `step` bytes
          if (!dirty && encodedLen(cp) != step) dirty = true
          if (!dirty) i += step
        }
      }
    }
    if (!dirty) return s
    // rewrite: decode every slot (U+FFFD for broken), re-encode shortest
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    i = 0
    while (i < b.length) {
      val b0 = b(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xc2 || b0 >= 0xf5) { cp = 0xfffd; i += 1 }
      else {
        val step = if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
        var c = b0 & (0xff >> (step + 1))
        var k = 1
        var ok = i + step <= b.length
        while (ok && k < step) {
          val bc = b(i + k) & 0xff
          if (bc < 0x80 || bc >= 0xc0) ok = false
          else { c = (c << 6) | (bc & 0x3f); k += 1 }
        }
        cp = if (ok) c else 0xfffd
        i += step
      }
      if (cp < 0x80) out.write(cp)
      else if (cp < 0x800) {
        out.write(0xc0 | (cp >> 6)); out.write(0x80 | (cp & 0x3f))
      } else if (cp < 0x10000) {
        out.write(0xe0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3f))
        out.write(0x80 | (cp & 0x3f))
      } else {
        out.write(0xf0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3f))
        out.write(0x80 | ((cp >> 6) & 0x3f)); out.write(0x80 | (cp & 0x3f))
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  private def encodedLen(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

  /** Column-API entry point. */
  def sanitizeUtf8(str: Column): Column =
    Bridge.column(SanitizeUtf8(Bridge.expression(str)))
}
