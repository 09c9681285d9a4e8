package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed `Aggregator` — the classic mergeable
  * frequency sketch Spark has no built-in for (approx_count_distinct and
  * approx_percentile cover cardinality and quantiles; CMS covers
  * per-item counts). State is a constant d×w long matrix per partial
  * aggregate regardless of input size, and `merge` is element-wise
  * addition — exactly the partial-agg/merge contract, so a 100-TB count
  * runs as one map-side-combined aggregation with d·w·8 bytes of
  * executor state.
  *
  * Guarantees (standard CMS): estimate(x) ≥ true(x) always; with d rows
  * and w columns, estimate(x) ≤ true(x) + e·N/w with probability
  * 1 − e^(−d) per item (N = total updates).
  *
  * Hashing is md5-derived — one digest per item, rows use disjoint
  * 8-hex-char chunks — so sketches are deterministic and reproducible
  * across engines and runs, which is what lets the oracle gate pin a
  * bounded-error `approx_ok` contract on query results.
  */
class CountMin(val d: Int, val w: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  // One 32-hex md5 digest supplies at most four disjoint 8-hex-char row
  // hashes (chunkBucket); validate here so a bad depth fails at construction
  // on the driver, not as a StringIndexOutOfBounds inside executor merges.
  require(d >= 1 && d <= 4, s"CountMin depth d must be in [1,4], got $d")
  require(w > 0, s"CountMin width w must be positive, got $w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    // ONE digest per row; buckets straight from the digest bytes (identical
    // values to the hex-substring form — row j reads big-endian bytes
    // 4j..4j+3 unsigned, exactly what parseLong(hex[8j,8j+8], 16) yields —
    // without formatting a 32-char hex string per input row).
    val bytes = CountMin.digest(item)
    var j = 0
    while (j < d) {
      buf(j * w + CountMin.byteBucket(bytes, j, w)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 of the UTF-8 item via a thread-local digest (getInstance per row
    * is measurable in the per-token hot loop). */
  def digest(item: String): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.digest(item.getBytes("UTF-8"))
  }

  /** Row-j bucket straight from digest bytes: big-endian unsigned int at
    * byte offset 4j, mod w — bit-identical to [[chunkBucket]] on the hex
    * form of the same digest. */
  def byteBucket(bytes: Array[Byte], j: Int, w: Int): Int = {
    val v = ((bytes(4 * j) & 0xffL) << 24) |
      ((bytes(4 * j + 1) & 0xffL) << 16) |
      ((bytes(4 * j + 2) & 0xffL) << 8) |
      (bytes(4 * j + 3) & 0xffL)
    (v % w).toInt
  }

  def md5hex(item: String): String =
    digest(item).map(b => f"${b & 0xff}%02x").mkString

  /** Row-j bucket from a precomputed digest: 8 hex chars, chunk j, mod w.
    * One digest serves d ≤ 4 rows (32 hex chars / 8). */
  def chunkBucket(hex: String, j: Int, w: Int): Int =
    (java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % w).toInt

  def bucket(item: String, j: Int, w: Int): Int =
    chunkBucket(md5hex(item), j, w)

  /** Point estimate from a flattened d×w sketch. */
  def estimate(sketch: Seq[Long], item: String, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val v = sketch(j * w + bucket(item, j, w))
      if (v < best) best = v
      j += 1
    }
    best
  }
}
