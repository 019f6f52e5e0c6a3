package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Batch-style catch-up over a streaming checkpoint: Trigger.AvailableNow
  * drains the file-source backlog then self-terminates, and a restart from
  * the same checkpoint processes ONLY files that arrived in between — the
  * scheduled-incremental-job pattern (cron-driven catch-up with streaming
  * exactly-once bookkeeping, no always-on cluster).
  */
class AvailableNowSpec extends SparkSpec {
  import spark.implicits._

  test("drains the backlog, stops, and a restart picks up only new files") {
    val root = java.nio.file.Files.createTempDirectory("availnow").toString
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(in)
    val schema = spark.read.parquet(in).schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("checkpointLocation", cp)
        .option("path", out)
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not self-terminate")
    }

    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    // backlog grows while the job is down; restart must process only the delta
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(in)
    runOnce()
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c"))) // no reprocessing dupes
  }
}
