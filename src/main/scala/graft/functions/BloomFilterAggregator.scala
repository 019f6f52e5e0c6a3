package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Shared Bloom hashing — ONE definition used by both the build-side
  * aggregator and the probe-side [[graft.plans.BloomMightContain]]
  * expression, so membership is consistent by construction.
  *
  * Double hashing (Kirsch–Mitzenmacher): bit_i = (h1 + i·h2) mod m from two
  * xxhash64 draws of the key — the standard construction giving k
  * independent-enough probes from two hashes.
  */
object BloomHash {
  def bitsFor(key: Long, numBits: Int, numHashes: Int): Array[Int] = {
    val h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(key, 42L)
    val h2 = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(key, 77L) | 1L
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      val h = h1 + i * h2
      // floorMod for a non-negative index from a possibly-negative hash
      out(i) = java.lang.Math.floorMod(h, numBits.toLong).toInt
      i += 1
    }
    out
  }

  /** Probe: every one of the key's k bits set? */
  def mightContain(words: Array[Long], key: Long, numHashes: Int): Boolean = {
    val numBits = words.length * 64
    val bits = bitsFor(key, numBits, numHashes)
    var i = 0
    while (i < numHashes) {
      val b = bits(i)
      if ((words(b >> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter build as a mergeable Aggregator: O(m) fixed state per
  * partial (a long[] bit array), merge = bitwise OR — the textbook
  * mergeable summary, so partial aggregation applies and the shuffle
  * carries one m-bit blob per partition, never the key set itself.
  *
  * The scale use is the pre-shuffle semi-join filter
  * ([[graft.operators.ScaleOps.bloomSemiJoin]]): build over the SMALL
  * side's keys, broadcast the blob, and discard most of the BIG side
  * map-side before any exchange. No false negatives by construction;
  * false positives are bounded by (1-e^(-kn/m))^k and removed by the
  * exact join that follows.
  */
class BloomFilterAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"need numHashes>0, got $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(words: Array[Long], key: Long): Array[Long] = {
    val bits = BloomHash.bitsFor(key, numBits, numHashes)
    var i = 0
    while (i < numHashes) {
      val b = bits(i)
      words(b >> 6) |= (1L << (b & 63))
      i += 1
    }
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) | b(i); i += 1 }
    out
  }

  override def finish(words: Array[Long]): Array[Long] = words

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
