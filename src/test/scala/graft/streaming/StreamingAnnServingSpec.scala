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
}
