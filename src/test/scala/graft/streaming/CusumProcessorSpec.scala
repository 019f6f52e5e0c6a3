package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CUSUM: O(1) fold state across micro-batches, bitwise
  * agreement with the batch sort+fold operator on the same series.
  */
class CusumProcessorSpec extends SparkSpec {
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

  test("running CUSUM matches the batch fold bitwise and flags sustained drift") {
    withRocksDb {
      val rnd = new scala.util.Random(17)
      // key "ok": in-control noise around the target; key "hot": shifted up
      // after seq 20 — sustained drift the monitor must flag
      val series =
        (1 to 40).map(i => SeriesPoint("ok", i.toLong, 10.0 + rnd.nextDouble())) ++
        (1 to 40).map(i => SeriesPoint("hot", i.toLong,
          if (i <= 20) 10.0 + rnd.nextDouble() else 14.0 + rnd.nextDouble()))
      val input = MemoryStream[SeriesPoint](spark)
      val scored = CusumProcessor.monitor(input.toDS(), target = 10.5, slack = 0.25, h = 20.0)
      val ckpt = java.nio.file.Files.createTempDirectory("cusum-ckpt").toString
      val q = scored.writeStream.format("memory").queryName("cusum_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        val (first, rest) = series.partition(_.seq <= 25)
        input.addData(first: _*)
        q.processAllAvailable()
        input.addData(rest: _*)
        q.processAllAvailable()
        val stream = spark.table("cusum_out").as[CusumPoint].collect()
        assert(stream.length == 80)

        // final streamed score per key ≡ the batch operator's fold
        val batchDf = series.map(p => (p.key, p.seq, p.value)).toDF("key", "seq", "value")
        val batch = graft.operators.TimeSeriesOps
          .cusum(batchDf, "key", "seq", "value", target = 10.5, slack = 0.25, h = 20.0)
          .as[(String, Long, Double, Boolean)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
        val finalPerKey = stream.groupBy(_.key).map { case (k, ps) =>
          val last = ps.maxBy(_.seq)
          k -> (last.n_obs, BigDecimal(last.cusum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, last.drifted)
        }
        assert(finalPerKey == batch, s"stream $finalPerKey vs batch $batch")

        // the in-control key never alarms; the shifted key alarms after the
        // shift and its score keeps growing
        assert(stream.filter(_.key == "ok").forall(!_.drifted))
        val hotAlarms = stream.filter(p => p.key == "hot" && p.drifted).map(_.seq)
        assert(hotAlarms.nonEmpty && hotAlarms.min > 20,
          s"drift flagged at ${hotAlarms.sorted.headOption} (shift began at 21)")

        // every point is the fold of its own prefix, bitwise
        val byKey = series.groupBy(_.key)
        stream.foreach { p =>
          val prefix = byKey(p.key).filter(_.seq <= p.seq).sortBy(_.seq)
          val expected = prefix.foldLeft(0.0)((s, x) =>
            math.max(0.0, s + ((x.value - 10.5) - 0.25)))
          assert(p.cusum == expected, s"${p.key}@${p.seq}: ${p.cusum} != $expected")
        }
      } finally q.stop()
    }
  }
}
