package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming EWMA: O(1) fold state carried across micro-batches, bitwise
  * agreement with the batch sort+fold operator on the same series.
  */
class EwmaProcessorSpec extends SparkSpec {
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

  test("running EWMA matches the batch fold bitwise, with state across micro-batches") {
    withRocksDb {
      val rnd = new scala.util.Random(7)
      val series = (1 to 60).map(i => SeriesPoint(s"k${i % 3}", i.toLong, rnd.nextDouble() * 10))
      val input = MemoryStream[SeriesPoint](spark)
      val smoothed = EwmaProcessor.smooth(input.toDS(), alpha = 0.5)
      val ckpt = java.nio.file.Files.createTempDirectory("ewma-ckpt").toString
      val q = smoothed.writeStream.format("memory").queryName("ewma_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        // split across two micro-batches: the second batch's folds must seed
        // from the first batch's persisted (n, s) state
        input.addData(series.take(30): _*)
        q.processAllAvailable()
        input.addData(series.drop(30): _*)
        q.processAllAvailable()
        val stream = spark.table("ewma_out").as[EwmaPoint].collect()
        assert(stream.length == 60)

        // final streamed value per key ≡ the batch operator's fold (both are
        // the same left fold with exact dyadic scaling → bitwise equal, so
        // the 6-dp rounding matches exactly)
        val batchDf = series.map(p => (p.key, p.seq, p.value)).toDF("key", "seq", "value")
        val batch = graft.operators.TimeSeriesOps
          .ewma(batchDf, "key", "seq", "value", alpha = 0.5)
          .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
        val finalPerKey = stream.groupBy(_.key).map { case (k, ps) =>
          val last = ps.maxBy(_.seq)
          k -> (last.n_obs, BigDecimal(last.ewma)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        assert(finalPerKey == batch, s"stream $finalPerKey vs batch $batch")

        // every intermediate point is the fold of its own prefix
        val byKey = series.groupBy(_.key)
        stream.foreach { p =>
          val prefix = byKey(p.key).filter(_.seq <= p.seq).sortBy(_.seq)
          val expected = prefix.tail.foldLeft(prefix.head.value)((s, x) => 0.5 * x.value + 0.5 * s)
          assert(p.ewma == expected, s"${p.key}@${p.seq}: ${p.ewma} != $expected")
          assert(p.n_obs == prefix.length)
        }
      } finally q.stop()
    }
  }
}
