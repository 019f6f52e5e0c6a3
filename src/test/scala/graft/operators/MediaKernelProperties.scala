package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.MultimodalOps._

/** ScalaCheck properties for the r12 perceptual/media kernels — all pure
  * JVM functions, so thousands of random cases run without a Spark job.
  * Each invariance below is the DESIGN CLAIM of its kernel (the Scaladoc's
  * "gain-invariant" / "brightness-shift-proof" statements), mechanized.
  */
object MediaKernelProperties extends Properties("MediaKernels") {

  // levels small enough that level·gain stays inside signed 16-bit PCM
  private val levelsGen: Gen[Array[Int]] =
    Gen.chooseNum(65, 400).flatMap(n =>
      Gen.containerOfN[Array, Int](n, Gen.chooseNum(0, 320)))

  property("audioEnvelopeHash: uniform gain never moves the signature") =
    forAll(levelsGen, Gen.chooseNum(1, 100)) { (samples, gain) =>
      val a = DecodedAudio(8000, 1, samples)
      val scaled = DecodedAudio(8000, 1, samples.map(_ * gain))
      audioEnvelopeHash(a) == audioEnvelopeHash(scaled)
    }

  property("audioEnvelopeHash agrees with a naive per-span reference") =
    forAll(levelsGen) { samples =>
      val n = samples.length
      val spans = samples.indices.groupBy(i => (i.toLong * 65 / n).toInt)
      val e = Array.tabulate(65)(w =>
        spans.getOrElse(w, Seq.empty).map(i => samples(i).toLong * samples(i)).sum)
      val naive = (0 until 64).foldLeft(0L)((h, k) =>
        if (e(k + 1) > e(k)) h | (1L << k) else h)
      audioEnvelopeHash(DecodedAudio(8000, 1, samples)) == naive
    }

  private val clipGen: Gen[(Int, Array[Int])] = for {
    ch <- Gen.chooseNum(1, 3)
    frames <- Gen.chooseNum(1, 64)
    s <- Gen.containerOfN[Array, Int](frames * ch, Gen.chooseNum(-30000, 30000))
  } yield (ch, s)

  property("decimatePcm agrees with a naive grouped-truncating-mean reference") =
    forAll(clipGen, Gen.chooseNum(1, 9)) { case ((ch, samples), factor) =>
      val a = DecodedAudio(8000, ch, samples)
      val d = decimatePcm(a, factor)
      val frames = samples.length / ch
      val naive = (0 until frames).grouped(factor).flatMap { blk =>
        (0 until ch).map(c => (blk.map(f => samples(f * ch + c).toLong).sum / blk.size).toInt)
      }.toSeq
      // naive iterates blocks then channels — same frame-major order
      d.samples.toSeq == naive && d.sampleRate == 8000 / factor && d.channels == ch
    }

  private val imgGen: Gen[DecodedImage] = for {
    w <- Gen.chooseNum(8, 24)
    h <- Gen.chooseNum(8, 24)
    px <- Gen.containerOfN[Array, Int](w * h, Gen.chooseNum(0, 200))
  } yield DecodedImage(w, h, px)

  property("aHash64 and dHash64 are invariant under a global brightness shift") =
    forAll(imgGen, Gen.chooseNum(1, 55)) { (img, b) =>
      // +b on every pixel shifts every downsample cell and the mean by b:
      // all comparisons (cell > mean, right > left) are unchanged
      val shifted = DecodedImage(img.width, img.height, img.gray.map(_ + b))
      aHash64(img) == aHash64(shifted) && dHash64(img) == dHash64(shifted)
    }

  property("jaro_winkler is symmetric, bounded, and 1 exactly on equal strings") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val s = graft.plans.JaroWinklerSim.similarity(a, b)
      val sym = graft.plans.JaroWinklerSim.similarity(b, a)
      val self = if (a.nonEmpty) graft.plans.JaroWinklerSim.similarity(a, a) == 1.0 else true
      s == sym && s >= 0.0 && s <= 1.0 && self
    }
}
