package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming parity for rolling-ingestion dedup: the per-incoming-document
  * decision of [[DedupOps.incrementalNearDup]] depends only on (doc,
  * existing corpus), so micro-batching the incoming stream and unioning the
  * per-batch pair sets must equal the one-shot batch answer over the same
  * incoming set — the property that makes the operator safe to run inside
  * `foreachBatch` against a static corpus index at ingest time.
  */
class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch incremental dedup unions to the batch answer") {
    val rnd = new scala.util.Random(21)
    val vocab = Seq("data", "spark", "row", "table", "hash", "join", "scan",
      "sort", "key", "value", "batch", "stream", "query", "filter")
    def doc(): String = (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val existingDocs = (0 until 15).map(i => (i.toLong, doc()))
    // incoming: 10 fresh docs + 4 near-copies of existing docs (1 token mutated)
    val fresh = (100 until 110).map(i => (i.toLong, doc()))
    val copies = (0 until 4).map { i =>
      val toks = existingDocs(i)._2.split(" ").toVector.updated(3, "MUTATED")
      (200L + i, toks.mkString(" "))
    }
    val incoming = fresh ++ copies
    val existing = existingDocs.toDF("doc_id", "text")

    val expected = DedupOps.incrementalNearDup(existing, incoming.toDF("doc_id", "text"),
        n = 3, threshold = 0.5)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "planted near-copies must match the corpus")
    assert(copies.map(_._1).toSet.subsetOf(expected.map(_._1)),
      "every planted near-copy must be flagged")

    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    def ingest(batch: DataFrame, batchId: Long): Unit =
      got.synchronized {
        got ++= DedupOps.incrementalNearDup(existing, batch, n = 3, threshold = 0.5)
          .select("new_id", "old_id").as[(Long, Long)].collect()
      }

    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch(ingest _)
      .start()
    try {
      in.addData(incoming.take(7): _*)
      q.processAllAvailable()
      in.addData(incoming.drop(7): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.toSet == expected,
      s"streamed union diverged:\n spurious ${got.toSet diff expected}\n missing ${expected diff got.toSet}")
  }
}
