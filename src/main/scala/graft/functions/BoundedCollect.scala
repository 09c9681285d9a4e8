package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** collect_list with a hard state bound: accumulation STOPS once the buffer
  * holds cap+1 elements, so a degenerate hot key (the mega-bucket of an LSH
  * banding, a viral join key) cannot grow executor state past the cap — the
  * failure mode that makes plain collect_list unsafe at 100 TB.
  *
  * The buffer keeps AT MOST cap+1 elements: callers filter
  * `size(ms) <= cap` afterwards, and the +1 sentinel is what lets them
  * distinguish "exactly cap members" (keep) from "more than cap" (drop).
  * This collapses the usual two-phase guard — partial-agg count, filter,
  * re-join, collect — into ONE aggregation on one exchange.
  *
  * Only safe when downstream logic is insensitive to WHICH elements survive
  * an overflowing key (here: overflowed buckets are dropped entirely) and
  * to buffer order (here: pair expansion + distinct is order-independent).
  */
class BoundedCollect[T](cap: Int)(implicit val elem: Encoder[T],
    val listEnc: Encoder[Seq[T]])
  extends Aggregator[T, Seq[T], Seq[T]] {

  private val limit = cap + 1

  override def zero: Seq[T] = Vector.empty

  override def reduce(b: Seq[T], a: T): Seq[T] =
    if (b.length >= limit) b else b :+ a

  override def merge(b1: Seq[T], b2: Seq[T]): Seq[T] =
    if (b1.length >= limit) b1
    else if (b2.length >= limit) b2
    else (b1 ++ b2).take(limit)

  override def finish(reduction: Seq[T]): Seq[T] = reduction

  override def bufferEncoder: Encoder[Seq[T]] = listEnc
  override def outputEncoder: Encoder[Seq[T]] = listEnc
}

object BoundedCollect {
  /** One LSH bucket member: a doc and its full minhash signature. */
  final case class DocSig(doc_id: Long, sig: Seq[String])

  implicit val docSigEnc: Encoder[DocSig] = Encoders.product[DocSig]
  implicit val docSigSeqEnc: Encoder[Seq[DocSig]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DocSig]]()

  def docSigs(cap: Int): BoundedCollect[DocSig] = new BoundedCollect[DocSig](cap)

  /** Ids-only bucket member — for consumers that pair docs without scoring
    * signatures (e.g. the banding-config sweep). */
  implicit val longElemEnc: Encoder[Long] = Encoders.scalaLong
  implicit val longSeqEnc: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  def docIds(cap: Int): BoundedCollect[Long] = new BoundedCollect[Long](cap)
}
