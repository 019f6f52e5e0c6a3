package graft.streaming

import graft.SparkSpec
import graft.operators.{PipelineOps, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(doc_id: Long, text: String)

/** The per-document curation operators are narrow, stateless maps — so the
  * SAME operator code runs unchanged on a streaming source (the Spark-first
  * payoff of keeping them declarative: batch/stream parity for free).
  * Streamed output must equal the batch output row-for-row.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog"),
    Doc(2L, "spark streams are just incremental batch plans"),
    Doc(3L, "a a a a a"))

  test("maskTokens and qualityScore run unchanged on a stream with identical results") {
    val input = MemoryStream[Doc](spark)
    val masked = PipelineOps.maskTokens(input.toDF(), rate = 0.3)
    val scored = TextOps.qualityScore(input.toDF())
    val ckpt1 = java.nio.file.Files.createTempDirectory("cur-ckpt1").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("cur-ckpt2").toString
    val q1 = masked.writeStream.format("memory").queryName("mask_out")
      .option("checkpointLocation", ckpt1).outputMode("append").start()
    val q2 = scored.writeStream.format("memory").queryName("score_out")
      .option("checkpointLocation", ckpt2).outputMode("append").start()
    try {
      input.addData(docs: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      val streamedMask = spark.table("mask_out").collect().map(_.toSeq).toSet
      val batchMask = PipelineOps.maskTokens(docs.toDF(), rate = 0.3).collect().map(_.toSeq).toSet
      assert(streamedMask == batchMask)
      val streamedScore = spark.table("score_out").collect().map(_.toSeq).toSet
      val batchScore = TextOps.qualityScore(docs.toDF()).collect().map(_.toSeq).toSet
      assert(streamedScore == batchScore)
    } finally { q1.stop(); q2.stop() }
  }

  test("linear quality classifier runs unchanged on a stream with identical results") {
    val input = MemoryStream[Doc](spark)
    val scored = TextOps.linearQualityScore(input.toDF(), nFeatures = 64)
    val ckpt = java.nio.file.Files.createTempDirectory("cur-ckpt3").toString
    val q = scored.writeStream.format("memory").queryName("clf_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("clf_out").collect().map(_.toSeq).toSet
      val batch = TextOps.linearQualityScore(docs.toDF(), nFeatures = 64)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
