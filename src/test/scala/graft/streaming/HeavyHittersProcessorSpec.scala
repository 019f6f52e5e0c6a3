package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Misra-Gries heavy hitters in MapState: frequency guarantee, bounded
  * state, cross-batch accumulation.
  */
class HeavyHittersProcessorSpec extends SparkSpec {
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

  private def latestSnapshot(table: String): Map[String, Long] = {
    val rows = spark.table(table).as[HeavyHitter].collect()
    val asOf = rows.map(_.as_of_seq).max
    rows.filter(_.as_of_seq == asOf).map(h => h.item -> h.est).toMap
  }

  test("tracks items above n/(k+1) across batches with bounded counters") {
    withRocksDb {
      val input = MemoryStream[ItemEvent](spark)
      val hh = HeavyHittersProcessor.track(input.toDS(), capacity = 4)
      val ckpt = java.nio.file.Files.createTempDirectory("hh-ckpt").toString
      val q = hh.writeStream.format("memory").queryName("hh_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        val rnd = new scala.util.Random(3)
        var seq = 0L
        def mk(items: Seq[String]) = items.map { it => seq += 1; ItemEvent("k", seq, it) }
        // batch 1: 40 'hot' + 30 unique noise items (true freq(hot)=40/70 >> n/5)
        input.addData(mk(Seq.fill(40)("hot") ++ (1 to 30).map(i => s"noise$i")): _*)
        q.processAllAvailable()
        val s1 = latestSnapshot("hh_out")
        assert(s1.size <= 4, s"state exceeded capacity: $s1")
        assert(s1.contains("hot"))
        // Misra-Gries undercounts by at most n/(k+1) = 70/5 = 14
        assert(s1("hot") >= 40 - 14 && s1("hot") <= 40)

        // batch 2: a second heavy item emerges; 'hot' survives the decrements
        input.addData(mk(Seq.fill(25)("warm") ++ (1 to 10).map(i => s"late$i")): _*)
        q.processAllAvailable()
        val s2 = latestSnapshot("hh_out")
        assert(s2.size <= 4)
        assert(s2.contains("hot") && s2.contains("warm"))
        // total n = 105, bound n/(k+1) = 21
        assert(s2("hot") >= 40 - 21 && s2("warm") >= 25 - 21)
      } finally q.stop()
    }
  }

  test("keys are independent sketches") {
    withRocksDb {
      val input = MemoryStream[ItemEvent](spark)
      val hh = HeavyHittersProcessor.track(input.toDS(), capacity = 2)
      val ckpt = java.nio.file.Files.createTempDirectory("hh2-ckpt").toString
      val q = hh.writeStream.format("memory").queryName("hh2_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        input.addData(
          ItemEvent("a", 1, "x"), ItemEvent("a", 2, "x"), ItemEvent("a", 3, "y"),
          ItemEvent("b", 1, "z"))
        q.processAllAvailable()
        val rows = spark.table("hh2_out").as[HeavyHitter].collect()
        val a = rows.filter(_.key == "a").map(h => h.item -> h.est).toMap
        val b = rows.filter(_.key == "b").map(h => h.item -> h.est).toMap
        assert(a == Map("x" -> 2L, "y" -> 1L))
        assert(b == Map("z" -> 1L))
      } finally q.stop()
    }
  }
}
