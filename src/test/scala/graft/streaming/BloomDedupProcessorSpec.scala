package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Bloom-filter streaming dedup: duplicates are never re-emitted (no false
  * negatives), novel items pass at the designed rate, in-batch duplicates
  * resolve to the first occurrence.
  */
class BloomDedupProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb(body: => Unit): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("emits first occurrences only, across and within batches, per key") {
    withRocksDb {
      val input = MemoryStream[SeenItem](spark)
      val fresh = BloomDedupProcessor.distinctItems(input.toDS())
      val ckpt = java.nio.file.Files.createTempDirectory("bloomdedup-ckpt").toString
      val q = fresh.writeStream.format("memory").queryName("bloom_fresh")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        // batch 1: items 1..50 on key a (3 appears twice in-batch), 1..5 on b
        input.addData(
          (1L to 50L).map(i => SeenItem("a", i, i)) ++
            Seq(SeenItem("a", 99L, 3L)) ++
            (1L to 5L).map(i => SeenItem("b", i, i)): _*)
        q.processAllAvailable()
        val b1 = spark.table("bloom_fresh").as[FreshItem].collect()
        // in-batch duplicate of item 3 suppressed; first occurrence kept
        assert(b1.count(f => f.key == "a" && f.item == 3L) == 1)
        assert(b1.find(f => f.key == "a" && f.item == 3L).get.seq == 3L)
        // keys are independent: b's items 1..5 all pass despite a's filter
        assert(b1.count(_.key == "b") == 5)
        val aPassed = b1.count(_.key == "a")
        assert(aPassed >= 49, s"novel pass rate too low: $aPassed of 50")

        // batch 2: replay all of batch 1 (pure duplicates) + novel 51..80
        input.addData(
          (1L to 50L).map(i => SeenItem("a", 1000 + i, i)) ++
            (51L to 80L).map(i => SeenItem("a", 2000 + i, i)): _*)
        q.processAllAvailable()
        val all = spark.table("bloom_fresh").as[FreshItem].collect()
        // no duplicate emission EVER: each (key, item) at most once
        val dupEmissions = all.groupBy(f => (f.key, f.item)).collect {
          case (ki, fs) if fs.length > 1 => ki
        }
        assert(dupEmissions.isEmpty, s"re-emitted: ${dupEmissions.toSeq}")
        // replayed ids contributed nothing; novels mostly passed
        val aNovel2 = all.count(f => f.key == "a" && f.item > 50L)
        assert(aNovel2 >= 29, s"novel pass rate too low in batch 2: $aNovel2 of 30")
      } finally q.stop()
    }
  }
}
