package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Welford anomaly detector: prior-only scoring, state carried
  * across micro-batches, agreement with the batch z-score operator.
  */
class AnomalyProcessorSpec extends SparkSpec {
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

  test("scores points against running stats carried across micro-batches") {
    withRocksDb {
      val input = MemoryStream[MetricPoint](spark)
      val scored = AnomalyProcessor.score(input.toDS(), minPrior = 5, threshold = 2.5)
      val ckpt = java.nio.file.Files.createTempDirectory("anom-ckpt").toString
      val q = scored.writeStream.format("memory").queryName("anom_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        // batch 1: 6 alternating in-distribution points — first 5 unscored
        // (fewer than minPrior priors), 6th scored small
        input.addData((1 to 6).map(i => MetricPoint("k", i.toLong, 10.0 + i % 2)): _*)
        q.processAllAvailable()
        val out1 = spark.table("anom_out").as[ScoredPoint].collect().sortBy(_.seq)
        assert(out1.take(5).forall(p => p.z.isEmpty && !p.is_anomaly))
        assert(out1(5).z.exists(z => math.abs(z) < 2.5) && !out1(5).is_anomaly)

        // batch 2: state persisted — the spike is scored against batch 1's
        // statistics and flags; a second key starts fresh (no priors)
        input.addData(MetricPoint("k", 7L, 100.0), MetricPoint("k2", 1L, 100.0))
        q.processAllAvailable()
        val out2 = spark.table("anom_out").as[ScoredPoint].collect()
        val spike = out2.find(p => p.key == "k" && p.seq == 7L).get
        assert(spike.z.exists(_ > 2.5) && spike.is_anomaly)
        val fresh = out2.find(_.key == "k2").get
        assert(fresh.z.isEmpty && !fresh.is_anomaly)
      } finally q.stop()
    }
  }

  test("agrees with the batch z-score operator on an identical series") {
    withRocksDb {
      // batch operator with lookback >= series length ≡ all-priors frame,
      // which is exactly the streaming detector's running statistics
      val rnd = new scala.util.Random(11)
      val series = (1 to 40).map(i => ("k", i.toLong, rnd.nextDouble() * 10))
      val batchDf = series.map { case (k, i, v) => (k, i * 1000L, i, v) }
        .toDF("key", "ts", "event_id", "value")
      val batch = graft.operators.TimeSeriesOps
        .zscoreAnomalies(batchDf, "key", "ts", "event_id", "value",
          lookback = 1000, threshold = 2.5, minPrior = 5)
        .orderBy("event_id")
        .collect()
        .map(r => (r.getLong(2).toLong, Option(r.get(4)).map(_.asInstanceOf[Double])))

      val input = MemoryStream[MetricPoint](spark)
      val scored = AnomalyProcessor.score(input.toDS(), minPrior = 5, threshold = 2.5)
      val ckpt = java.nio.file.Files.createTempDirectory("anom-agree-ckpt").toString
      val q = scored.writeStream.format("memory").queryName("anom_agree")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        input.addData(series.map { case (k, i, v) => MetricPoint(k, i, v) }: _*)
        q.processAllAvailable()
        val stream = spark.table("anom_agree").as[ScoredPoint].collect()
          .sortBy(_.seq).map(p => (p.seq, p.z))
        assert(stream.length == batch.length)
        stream.zip(batch).foreach { case ((si, sz), (bi, bz)) =>
          assert(si == bi)
          // batch z is rounded to 4 dp; Welford vs two-pass differ only in
          // floating roundoff
          (sz, bz) match {
            case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-3, s"seq $si: $a vs $b")
            case (None, None)       => ()
            case other              => fail(s"seq $si: $other")
          }
        }
      } finally q.stop()
    }
  }
}
