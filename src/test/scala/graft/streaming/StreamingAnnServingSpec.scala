package graft.streaming

import graft.SparkSpec
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Query-side streaming ANN serving: micro-batches of query vectors search
  * the persisted IVF-PQ index through the same plan as the batch search,
  * so streamed results are bitwise the batch results for the same probes.
  */
class StreamingAnnServingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed query batches return exactly the batch search's top-k") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(59)
    val emb = (0 until 96).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val embDf = emb.toDF("vec_id", "embedding")
    val (centroids, books) = SimilarityOps.fitIvfPq(embDf, nCentroids = 8, nSub = 4,
      nPqCentroids = 8, kmeansIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-serve").toString
    SimilarityOps.writeIvfPqIndex(embDf, centroids, books, dir)

    // probes arrive as a stream in two micro-batches
    val probes = emb.take(6).map { case (id, v) => (2000L + id, v) }
    val in = MemoryStream[(Long, Array[Float])](spark)
    val served = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val writer = AnnServing.topKWriter(
      in.toDF().toDF("vec_id", "embedding"), dir, centroids, books, k = 4, nProbe = 3) {
      (topK, _) =>
        served ++= topK.as[(Long, Long, Long, Double)].collect()
    }
    val q = writer
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivf-serve-ckpt").toString)
      .start()
    in.addData(probes.take(3))
    q.processAllAvailable()
    in.addData(probes.drop(3))
    q.processAllAvailable()
    q.stop()

    // parity: the union of served micro-batches is the batch search's
    // result for the same probe set, bit for bit
    val batchProbes = probes.toSeq.toDF("vec_id", "embedding")
    val expected = SimilarityOps.readIvfPqIndexTopK(spark, dir, batchProbes,
      centroids, books, k = 4, nProbe = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served.toSet == expected,
      s"streamed serving diverged: ${(expected diff served.toSet) ++ (served.toSet diff expected)}")
    assert(served.size == expected.size, "no duplicate rows across micro-batches")
  }

  test("appends landing between micro-batches are visible to later batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(61)
    def vec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val base = (0 until 64).map(i => (i.toLong, vec()))
    val baseDf = base.toDF("vec_id", "embedding")
    val (centroids, books) = SimilarityOps.fitIvfPq(baseDf, nCentroids = 4, nSub = 2,
      nPqCentroids = 8, kmeansIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append-serve").toString
    SimilarityOps.writeIvfPqIndex(baseDf, centroids, books, dir)

    val in = MemoryStream[(Long, Array[Float])](spark)
    val batches = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long, Double)]]
    val q = AnnServing.topKWriter(
      in.toDF().toDF("vec_id", "embedding"), dir, centroids, books, k = 3, nProbe = 4) {
      (topK, bid) => batches(bid) = topK.as[(Long, Long, Long, Double)].collect().toSet
    }.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("ivf-append-ckpt").toString).start()

    // batch 0 probes the ORIGINAL corpus; expected snapshot taken pre-append
    val probes0 = base.take(3).map { case (id, v) => (2000L + id, v) }
    val expected0 = SimilarityOps.readIvfPqIndexTopK(spark, dir,
      probes0.toDF("vec_id", "embedding"), centroids, books, k = 3, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    in.addData(probes0)
    q.processAllAvailable()

    // a streamed-ingest append lands between micro-batches: SAME frozen
    // models, new ids — stateless ivfPqCode, the per-batch maintenance path
    val appended = (500 until 504).map(i => (i.toLong, vec()))
    SimilarityOps.writeIvfPqIndex(appended.toDF("vec_id", "embedding"),
      centroids, books, dir, mode = "append")

    // batch 1 probes AT the appended vectors — they must be searchable
    val probes1 = appended.map { case (id, v) => (3000L + id, v) }
    in.addData(probes1)
    q.processAllAvailable()
    q.stop()

    assert(batches(0L) == expected0, "pre-append batch must match pre-append snapshot")
    val expected1 = SimilarityOps.readIvfPqIndexTopK(spark, dir,
      probes1.toDF("vec_id", "embedding"), centroids, books, k = 3, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batches(1L) == expected1, "post-append batch must match post-append snapshot")
    val newNeighbors = batches(1L).map(_._2).intersect((500L until 504L).toSet)
    assert(newNeighbors.nonEmpty,
      s"appended vectors never surfaced as neighbors of their own probes: ${batches(1L)}")
  }

  test("drift-triggered refit between micro-batches: restart with new models, parity holds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(67)
    def vec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val corpusA = (0 until 64).map(i => (i.toLong, vec()))
    val aDf = corpusA.toDF("vec_id", "embedding")
    val (cA, bA) = SimilarityOps.fitIvfPq(aDf, nCentroids = 4, nSub = 2,
      nPqCentroids = 8, kmeansIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-refit-serve").toString
    SimilarityOps.writeIvfPqIndex(aDf, cA, bA, dir)

    def serveOnce(models: (Array[(Int, Seq[Double], Double)], Array[Array[Seq[Double]]]),
                  probes: Seq[(Long, Array[Float])]): Set[(Long, Long, Long, Double)] = {
      val in = MemoryStream[(Long, Array[Float])](spark)
      var out = Set.empty[(Long, Long, Long, Double)]
      val q = AnnServing.topKWriter(
        in.toDF().toDF("vec_id", "embedding"), dir, models._1, models._2,
        k = 3, nProbe = 4) { (topK, _) =>
        out = out ++ topK.as[(Long, Long, Long, Double)].collect()
      }.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivf-refit-ckpt").toString).start()
      in.addData(probes)
      q.processAllAvailable()
      q.stop()
      out
    }

    val probesA = corpusA.take(3).map { case (id, v) => (2000L + id, v) }
    val servedA = serveOnce((cA, bA), probesA)
    val expectedA = SimilarityOps.readIvfPqIndexTopK(spark, dir,
      probesA.toDF("vec_id", "embedding"), cA, bA, k = 3, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(servedA == expectedA, "pre-refit serving must match the batch search")

    // the corpus drifts wholesale (+2 on dim 0) — the poll predicate fires,
    // the index refits under fresh models, and serving RESTARTS with them
    // (the AnnServing lifecycle contract: old models describe nothing)
    val corpusB = corpusA.map { case (id, v) =>
      (id, v.zipWithIndex.map { case (x, d) => if (d == 0) x + 2.0f else x }) }
    val bDf = corpusB.toDF("vec_id", "embedding")
    assert(SimilarityOps.driftExceeds(aDf, bDf, maxShift = 0.5),
      "the planted +2.0 mean shift must trip the drift predicate")
    val (cB, bB) = SimilarityOps.refitIvfPqIndex(bDf, dir,
      nCentroids = 4, nSub = 2, nPqCentroids = 8, kmeansIters = 1)

    val probesB = corpusB.take(3).map { case (id, v) => (4000L + id, v) }
    val servedB = serveOnce((cB, bB), probesB)
    val expectedB = SimilarityOps.readIvfPqIndexTopK(spark, dir,
      probesB.toDF("vec_id", "embedding"), cB, bB, k = 3, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(servedB == expectedB, "post-refit serving must match the batch search under new models")
    assert(servedB.nonEmpty && servedB.forall(_._4 > 0.0),
      "post-refit search must return real neighbors, not empty cells")
  }
}
