package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming counterpart of benchmark decontamination
  * ([[DedupOps.contamination]]): the operator is a stateless per-document
  * shingle map plus a BROADCAST join against the (small, static) benchmark
  * shingle set, so the identical plan runs on a streaming corpus as a
  * stream-static join + stateful per-doc aggregation — ingest-time
  * contamination screening with no rewrite. Update mode emits each doc's
  * hit count as its micro-batch lands.
  */
class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination runs unchanged on a stream: stream-static broadcast join + agg") {
    // benchmark: one doc, 4-gram shingles {"w1 w2 w3 w4", "w2 w3 w4 w5"}
    val bench = Seq((900L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x w1 w2 w3 w4 y"),        // one benchmark gram → 1 hit
      (2L, "w1 w2 w3 w4 w5 z"),       // both grams → 2 hits
      (3L, "clean text with no overlap at all"))
    val expected = DedupOps.contamination(corpus.toDF("doc_id", "text"), bench, n = 4)
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 1L), (2L, 2L)), s"batch oracle: $expected")

    val in = MemoryStream[(Long, String)](spark)
    val out = DedupOps.contamination(in.toDF().toDF("doc_id", "text"), bench, n = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("contam-stream").toString
    val q = out.writeStream
      .format("memory").queryName(s"contam_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    in.addData(corpus.take(2))
    q.processAllAvailable()
    in.addData(corpus.drop(2))
    q.processAllAvailable()
    // update mode re-emits a doc's row when its count changes; docs arrive
    // whole here, so the latest row per doc is the final count
    val got = spark.table(q.name).groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.max("n_hits").as("n_hits"))
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == expected, s"streaming result diverged: $got vs $expected")
  }
}
