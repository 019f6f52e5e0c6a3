package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the kCore peel: per-job log with descriptions and
  * timestamps while the query runs, to attribute the job count (the r15
  * JobCount tool gives only a total). */
object DiagKcore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val d = Option(s.properties.getProperty("spark.job.description")).getOrElse("")
        println(f"[job] ${(System.nanoTime() - t0) / 1e9}%7.3f  #${s.jobId}%3d stages=${s.stageInfos.size}%2d  $d")
      }
    })
    val t = graft.Tables(spark, sfDir)
    val edges = graft.operators.GraphOps.coOccurrenceEdges(t.lineitem, "l_orderkey", "l_partkey")
      .where(col("w") >= 2)
    val res = graft.operators.GraphOps.kCore(edges, k = 2)
    res.orderBy("node").write.format("noop").mode("overwrite").save()
    println(f"[done] ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
