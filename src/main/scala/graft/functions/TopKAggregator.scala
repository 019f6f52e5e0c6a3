package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state per-group top-k: keeps the k largest (value, key) pairs
  * (value desc, ties to the smaller key) in an O(k) buffer with
  * associative/commutative merge — so partial aggregation applies and the
  * shuffle carries at most k rows per (partition, group).
  *
  * This is the scale-correct alternative to the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`), which must
  * SORT every group's full row set; here per-group state never exceeds k
  * regardless of group size. The window form stays fine when whole groups
  * are small; this aggregator is for heavy groups or top-k-of-everything.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(k > 0, s"need k>0; got $k")

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) (buf :+ x).sortWith(beats)
    else if (beats(x, buf(k - 1))) { // beats the current worst → insert-sorted
      val out = buf.clone()
      var i = k - 1
      while (i > 0 && beats(x, out(i - 1))) { out(i) = out(i - 1); i -= 1 }
      out(i) = x
      out
    } else buf

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  // Tungsten ExpressionEncoder on BOTH sides: the buffer crosses the shuffle
  // on every partial-aggregate exchange, so Java serialization there would
  // undo the aggregator's whole point of a cheap bounded shuffle payload.
  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}
