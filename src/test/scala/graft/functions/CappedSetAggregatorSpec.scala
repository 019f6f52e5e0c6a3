package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the bounded distinct-set collector: distinctness,
  * sortedness, saturation-at-cap, and the completeness guarantee for
  * below-cap results — the invariants [[graft.operators.DedupOps.ngramJaccard]]
  * relies on for its df-cap semantics (size == cap ⇔ true df > cap-1).
  * Pure JVM, no Spark session: reduce/merge are exercised directly the way
  * partial aggregation composes them.
  */
class CappedSetAggregatorSpec extends AnyFunSuite {

  private def collect(agg: CappedSetAggregator, xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("collects distinct values sorted, below the cap") {
    val agg = new CappedSetAggregator(10)
    val out = collect(agg, Seq(5L, 3L, 5L, 9L, 3L, 1L))
    assert(out.toSeq == Seq(1L, 3L, 5L, 9L))
  }

  test("saturates at cap and stops adding") {
    val agg = new CappedSetAggregator(3)
    val out = collect(agg, (1L to 100L))
    assert(out.length == 3)
  }

  test("merge unions two partial buffers, dedupes, and truncates at cap") {
    val agg = new CappedSetAggregator(5)
    val a = collect(agg, Seq(1L, 3L, 5L))
    val b = collect(agg, Seq(2L, 3L, 6L))
    assert(agg.merge(a, b).toSeq == Seq(1L, 2L, 3L, 5L, 6L))
    val big = agg.merge(collect(agg, Seq(10L, 20L, 30L)), collect(agg, Seq(11L, 21L, 31L)))
    assert(big.length == 5)
    // empty identities
    assert(agg.merge(agg.zero, a).toSeq == a.toSeq)
    assert(agg.merge(a, agg.zero).toSeq == a.toSeq)
  }

  test("below-cap results are complete under any partial-aggregation split") {
    // the df-cap contract: if the merged size < cap, NO element was dropped,
    // regardless of how the input was partitioned into partial buffers
    val agg = new CappedSetAggregator(7)
    val xs = Seq(4L, 8L, 15L, 16L, 23L, 42L) // 6 distinct < cap
    for (split <- 0 to xs.length) {
      val (l, r) = xs.splitAt(split)
      val merged = agg.merge(collect(agg, l), collect(agg, r))
      assert(merged.toSeq == xs.sorted, s"split at $split")
    }
  }

  test("saturated-by-merge result has exactly cap elements (df > cap-1 detectable)") {
    val agg = new CappedSetAggregator(4)
    // two complete 3-element buffers whose union has 6 distinct values
    val merged = agg.merge(collect(agg, Seq(1L, 2L, 3L)), collect(agg, Seq(4L, 5L, 6L)))
    assert(merged.length == 4) // == cap ⇒ caller knows true df ≥ cap
  }
}
