package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch aggregator — the user-facing UDAF surface
  * (`Aggregator[IN, BUF, OUT]`) for building signatures from an exploded
  * shingle-hash column: `ds.groupByKey(_.id).agg(new MinHashAggregator(32).toColumn)`.
  *
  * Functionally identical to the relational formulation in
  * [[graft.operators.DedupOps.minhashSignatures]] (same affine family over
  * the same base hash, asserted equal in tests). The relational form stays
  * the hot path — its 32 `min` aggregates are whole-stage-codegen'd, while a
  * typed Aggregator round-trips through encoders — but the Aggregator
  * composes with other typed aggregations and is the extension template for
  * sketches Spark lacks natively.
  *
  * The buffer is the running element-wise minimum; merge is element-wise min,
  * so the aggregation is associative, commutative, and partial-aggregation
  * friendly (map-side combine applies).
  */
class MinHashAggregator(numHashes: Int = 32)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = 2147483647L // 2^31 - 1, matches DedupOps.minhashSignatures
  private val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)((1L + rnd.nextInt(Int.MaxValue - 1), rnd.nextInt(Int.MaxValue).toLong))
  }

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], baseHash: Long): Array[Long] = {
    val base = baseHash & P
    var i = 0
    while (i < numHashes) {
      val h = (coeffs(i)._1 * base + coeffs(i)._2) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
}

private object ExpressionEncoderHelp {
  val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
