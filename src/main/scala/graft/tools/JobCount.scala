package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: count the Spark JOBS each named query submits — the
  * denominator of the driver-box divergence analysis (ARCHITECTURE,
  * "Driver-box bench divergence": per-job latency inflation hits
  * many-short-job queries hardest, so job count is the mitigation metric).
  * Usage: SPARK_GRAFT_ONLY=q_a,q_b runMain graft.tools.JobCount [sfDir]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        jobs.set(0)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Thread.sleep(200) // listener events are async; the bus drains quickly
        println(s"JOBS $name: ${jobs.get()}")
        graft.GraftSession.releaseMaterialized(spark)
      }
    spark.stop()
  }
}
