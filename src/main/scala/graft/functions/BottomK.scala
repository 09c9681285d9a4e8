package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.8): the k smallest distinct strings per group.
  *
  * This is the "bottom-k" set sketch behind the document fingerprint and
  * minhash families: bounded state (≤ k values per group, any input size),
  * associative merge — exactly the shape a 100 TB groupBy needs, with
  * map-side partial aggregation for free via the Aggregator contract.
  */
case class BottomK(k: Int) extends Aggregator[String, List[String], Seq[String]] {
  require(k > 0)

  /** Keep a small over-allocation before pruning so reduce stays O(1)
    * amortized; prune compacts back to the k smallest distinct values. */
  private def prune(b: List[String]): List[String] =
    b.distinct.sorted.take(k)

  override def zero: List[String] = Nil

  override def reduce(b: List[String], a: String): List[String] = {
    if (a == null) b
    else {
      val next = a :: b
      if (next.length > 4 * k) prune(next) else next
    }
  }

  override def merge(x: List[String], y: List[String]): List[String] =
    prune(x ++ y)

  override def finish(b: List[String]): Seq[String] = prune(b)

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
