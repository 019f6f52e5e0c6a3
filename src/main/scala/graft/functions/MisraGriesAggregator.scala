package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch over token streams: O(k) state, one
  * corpus pass, mergeable partials.
  *
  * The exact global token count (`explode → groupBy token`) shuffles one
  * row per DISTINCT token — fine when the vocabulary fits, but heavy-hitter
  * detection at 100 TB wants a sketch whose shuffle payload is CONSTANT.
  * This aggregator keeps at most k (token, counter) pairs per partial; the
  * shrink step on overflow subtracts the (k+1)-th largest counter from all
  * and drops the non-positive ones (Misra & Gries 1982, in the mergeable-
  * summaries form of Agarwal et al. 2012, which makes the merge
  * order-insensitive IN GUARANTEE: counters may differ by merge tree, but
  * any token with true count > N/(k+1) over N total tokens is present in
  * the final sketch — that membership, checked against exactly-counted top
  * tokens, is the deterministic, oracle-checkable output).
  *
  * Input is the per-document token ARRAY (one reduce call per document, a
  * local count first), so per-row overhead is amortized over the document.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[Seq[String], Map[String, Long], Map[String, Long]] {
  require(k > 0, s"need k>0; got $k")

  override def zero: Map[String, Long] = Map.empty

  /** Keep at most k entries: subtract the (k+1)-th largest counter from all,
    * drop non-positives (≤ k strictly-greater values can survive). */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val vs = m.valuesIterator.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(m.size - k - 1) // (k+1)-th largest
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }

  override def reduce(buf: Map[String, Long], toks: Seq[String]): Map[String, Long] = {
    if (toks == null) return buf
    val local = new scala.collection.mutable.HashMap[String, Long]
    toks.foreach { t => if (t != null) local.update(t, local.getOrElse(t, 0L) + 1L) }
    shrink(local.foldLeft(buf) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  // Tungsten encoders on both sides — the O(k) buffer crosses the partial-
  // aggregate shuffle (see TopKAggregator for the rationale).
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
