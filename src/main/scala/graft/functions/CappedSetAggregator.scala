package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state distinct-set collector: accumulates up to `cap` distinct
  * longs per group and then stops adding. The buffer is a sorted distinct
  * array, so reduce is a binary-search insert and merge is a linear
  * merge-union, both O(cap); partial aggregation applies and the shuffle
  * never carries more than `cap` values per (partition, group).
  *
  * Saturation contract: a finished set of size == cap means the group's TRUE
  * distinct count is ≥ cap (elements may have been dropped once the buffer
  * filled); a set of size < cap is guaranteed complete, because truncation
  * only ever happens at exactly `cap`. Callers that need "groups with at
  * most K distinct members, exactly" therefore use cap = K + 1 and filter
  * `size(ids) <= K` — the scale-correct alternative to `collect_set` +
  * post-filter, which would buffer a hot group's entire membership (possibly
  * millions of ids for a stop-shingle) before discarding it.
  */
class CappedSetAggregator(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(cap > 0, s"need cap>0; got $cap")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    if (buf.length >= cap) return buf
    val i = java.util.Arrays.binarySearch(buf, x)
    if (i >= 0) buf // already present
    else {
      val at = -i - 1
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, at)
      out(at) = x
      System.arraycopy(buf, at, out, at + 1, buf.length - at)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(cap, a.length + b.length))
    var i = 0; var j = 0; var k = 0
    while (k < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      out(k) = take; k += 1
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // Tungsten encoders on both sides: the buffer crosses the partial-agg
  // shuffle, where Java serialization would defeat the bounded payload.
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
