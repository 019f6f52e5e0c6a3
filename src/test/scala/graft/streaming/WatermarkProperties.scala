package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the dedup core (SURVEY §5's mandated
  * high-water-mark monotonicity invariants). */
object WatermarkProperties extends Properties("WatermarkLogic") {

  private val unitGen: Gen[Seq[Long]] = Gen.listOf(Gen.chooseNum(0L, 1000L))
  private val unitsGen: Gen[Seq[Seq[Long]]] = Gen.listOf(unitGen)

  property("watermark is monotone and equals max of seed and inputs") =
    forAll(unitsGen, Gen.chooseNum(0L, 1000L)) { (units, wm0) =>
      val (_, wm) = WatermarkLogic.dedupUnits[Long](units, Some(_), wm0)
      val allTs = units.flatten
      wm == (wm0 +: allTs).max && wm >= wm0
    }

  property("every emitted event is strictly above the seed watermark") =
    forAll(unitsGen, Gen.chooseNum(0L, 1000L)) { (units, wm0) =>
      val (out, _) = WatermarkLogic.dedupUnits[Long](units, Some(_), wm0)
      out.forall(_ > wm0)
    }

  property("replaying the output emits nothing (idempotence)") =
    forAll(unitsGen, Gen.chooseNum(0L, 1000L)) { (units, wm0) =>
      val (out, wm) = WatermarkLogic.dedupUnits[Long](units, Some(_), wm0)
      val (replay, wm2) = WatermarkLogic.dedupUnits[Long](Seq(out), Some(_), wm)
      replay.isEmpty && wm2 == wm
    }

  property("equal timestamps within one unit all pass; across units they drop") =
    forAll(Gen.chooseNum(1L, 1000L), Gen.chooseNum(1, 5)) { (ts, n) =>
      val sameUnit = WatermarkLogic.dedupUnits[Long](Seq(Seq.fill(n)(ts)), Some(_), 0L)._1
      val acrossUnits = WatermarkLogic.dedupUnits[Long](Seq.fill(n)(Seq(ts)), Some(_), 0L)._1
      Prop(sameUnit.size == n && acrossUnits.size == 1)
    }

  property("splitting a batch into more units never emits more events") =
    forAll(unitGen, Gen.chooseNum(0L, 500L)) { (events, wm0) =>
      val oneUnit = WatermarkLogic.dedupUnits[Long](Seq(events), Some(_), wm0)._1
      val perEvent = WatermarkLogic.dedupUnits[Long](events.map(Seq(_)), Some(_), wm0)._1
      perEvent.size <= oneUnit.size
    }
}
