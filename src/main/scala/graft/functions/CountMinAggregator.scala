package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Count-Min sketch over token streams (Cormode & Muthukrishnan 2005):
  * `depth × width` counters, one corpus pass, mergeable partials.
  *
  * The complementary sketch to [[MisraGriesAggregator]]: Misra–Gries answers
  * "which tokens are heavy" with O(k) state; Count-Min answers POINT
  * frequency queries ("how often does token x occur") with constant state
  * and one-sided error — the estimate never undercounts, and overcounts by
  * at most the collision mass a row of `width` counters absorbs. At 100 TB
  * the exact alternative (`explode → groupBy token`) shuffles one row per
  * distinct token; the sketch's shuffle payload is a fixed `depth*width`
  * long array regardless of corpus or vocabulary size, and merge is
  * elementwise addition (exactly commutative/associative on longs, so the
  * result is INDEPENDENT of partitioning and merge order — bit-identical
  * across cluster layouts, unlike float aggregation).
  *
  * Row hashes are MurmurHash3 over the token with a per-row seed — the same
  * function [[CountMinAggregator.bucket]] exposes for probe-side reuse.
  *
  * Input is the per-document token ARRAY (one reduce call per document), so
  * per-row overhead is amortized over the document, mirroring the
  * Misra–Gries input contract.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[Seq[String], Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, s"need depth>0 and width>0; got $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], toks: Seq[String]): Array[Long] = {
    if (toks != null) {
      toks.foreach { t =>
        if (t != null) {
          var r = 0
          while (r < depth) {
            buf(r * width + CountMinAggregator.bucket(t, r, width)) += 1L
            r += 1
          }
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // Tungsten encoders on both sides — the constant-size buffer crosses the
  // partial-aggregate shuffle (see TopKAggregator for the rationale).
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {
  /** Row-`row` counter index for `token` in a width-`width` sketch row.
    * Shared by the aggregator's update path and the probe side so an
    * estimate reads the same cells the updates wrote. */
  def bucket(token: String, row: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(token, row * 0x9E3779B9 + 1), width)

  /** Point estimate: min over rows of the addressed counters. */
  def estimate(sketch: Seq[Long], token: String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(r * width + bucket(token, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
