package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming counterpart of the keyword-scan tier: spotting, blocklist
  * filtering, and redaction are STATELESS narrow maps (one Aho–Corasick
  * automaton pass per document, automaton frozen into the plan), so the
  * identical operators run on a streaming corpus in append mode with no
  * rewrite and no state store — ingest-time blocklist screening. The
  * `SimplifyKeywordPredicates` rewrite applies to the streaming plan the
  * same way it does to batch. */
class StreamingKeywordSpec extends SparkSpec {
  import spark.implicits._

  private val deny = Seq("hash value", "customer query")

  test("keyword filter + spot run unchanged on a stream, append mode, parity with batch") {
    val corpus = Seq(
      (1L, "clean text with nothing bad"),
      (2L, "mentions a hash value midway"),
      (3L, "customer query arrives"),
      (4L, "also clean"))
    val batchKept = TextOps.keywordFilter(corpus.toDF("doc_id", "text"), deny)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 4L), s"batch oracle: $batchKept")

    val in = MemoryStream[(Long, String)](spark)
    val streamed = TextOps.keywordSpot(
      TextOps.keywordFilter(in.toDF().toDF("doc_id", "text"), deny),
      phrases = Seq("clean", "text"))
      .drop("hits_arr")
    val ckpt = java.nio.file.Files.createTempDirectory("kw-stream").toString
    val q = streamed.writeStream
      .format("memory").queryName(s"kw_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    in.addData(corpus.take(2))
    q.processAllAvailable()
    in.addData(corpus.drop(2))
    q.processAllAvailable()
    val got = spark.table(q.name)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    q.stop()
    assert(got.toSeq === Seq((1L, "clean,text", 2L), (4L, "clean", 1L)))
  }

  test("redaction runs unchanged on a stream (stateless narrow map)") {
    val in = MemoryStream[(Long, String)](spark)
    val masked = TextOps.keywordRedact(in.toDF().toDF("doc_id", "text"), deny)
    val ckpt = java.nio.file.Files.createTempDirectory("kwred-stream").toString
    val q = masked.writeStream
      .format("memory").queryName(s"kwred_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    in.addData(Seq((1L, "a hash value here"), (2L, "fine")))
    q.processAllAvailable()
    val got = spark.table(q.name).as[(Long, String)].collect().sortBy(_._1)
    q.stop()
    assert(got.toSeq === Seq((1L, "a ********** here"), (2L, "fine")))
  }
}
