package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class ClickEv(user: Long, clickTs: Timestamp, page: String)
case class BuyEv(user: Long, buyTs: Timestamp, amount: Double)

/** Watermarked stream-stream inner join: purchases joined to the click that
  * preceded them within an hour — both sides buffered in state, bounded by
  * watermarks + the time-range condition (the attribution-join pattern).
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("click-to-purchase attribution join with bounded state") {
    val clicks = MemoryStream[ClickEv](spark)
    val buys = MemoryStream[BuyEv](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("ssj-ckpt").toString
    val q = clicks.toDF().withWatermark("clickTs", "10 minutes").as("c")
      .join(buys.toDF().withWatermark("buyTs", "10 minutes").as("b"),
        expr("c.user = b.user AND b.buyTs >= c.clickTs AND b.buyTs <= c.clickTs + INTERVAL 1 HOUR"))
      .select(col("c.user"), col("page"), col("amount"))
      .writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    try {
      clicks.addData(ClickEv(1, t("2024-01-01 10:00:00"), "landing"),
                     ClickEv(2, t("2024-01-01 10:05:00"), "pricing"))
      buys.addData(BuyEv(1, t("2024-01-01 10:30:00"), 9.99),     // within the hour → joins
                   BuyEv(2, t("2024-01-01 12:00:00"), 5.0))      // outside the window → no match
      q.processAllAvailable()
      val out = spark.table("ssj_out").as[(Long, String, Double)].collect().toSet
      assert(out == Set((1L, "landing", 9.99)), s"got $out")
    } finally q.stop()
  }
}
