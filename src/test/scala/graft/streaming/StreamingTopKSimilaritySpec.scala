package graft.streaming

import graft.SparkSpec
import graft.operators.SimilarityOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Vec(vec_id: Long, embedding: Array[Float])

/** Continuous top-k similarity search: [[SimilarityOps.topKAggregated]]'s
  * bounded-state aggregation runs unchanged on a streaming corpus — the
  * running per-query top-k IS the aggregation state, updated as corpus
  * vectors arrive (the continuously-maintained similarity-search shape of
  * the streaming top-k literature). The final streamed answer must equal
  * the batch brute force over everything seen.
  */
class StreamingTopKSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("streamed top-k state converges to the batch answer as corpus batches arrive") {
    val rnd = new scala.util.Random(23)
    val all = (0 until 90).map(i => Vec(i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
    val queries = all.take(3).toDF()

    val input = MemoryStream[Vec](spark)
    val topk = SimilarityOps.topKAggregated(input.toDF(), queries, k = 5)
    val ckpt = java.nio.file.Files.createTempDirectory("topk-ckpt").toString
    val q = topk.writeStream.format("memory").queryName("topk_out")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    try {
      input.addData(all.take(40): _*)
      q.processAllAvailable()
      val mid = spark.table("topk_out").count()
      assert(mid == 15, s"3 queries x k=5 expected after batch 1, got $mid")

      input.addData(all.drop(40): _*)
      q.processAllAvailable()
      val streamed = spark.table("topk_out")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = SimilarityOps.bruteForceTopK(all.toDF(), queries, k = 5)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"streamed state diverged from batch brute force:\n${(streamed diff batch) ++ (batch diff streamed)}")
    } finally q.stop()
  }
}
