package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the UDAF surface of SURVEY §2B): per-group top-k
  * values with a deterministic tiebreak, maintained as a bounded buffer —
  * O(k) state per group regardless of group size, merge-associative, so
  * partial aggregation applies and no group ever materializes fully.
  *
  * Input: (value, tiebreak). Output: the k largest values, descending,
  * ties broken by ascending tiebreak id.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Double]] {

  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[Double] = buf.map(_._1)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
