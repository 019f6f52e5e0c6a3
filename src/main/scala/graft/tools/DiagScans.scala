package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scratch: per-query FileScan census of the FINAL (post-AQE) physical plan
  * (dev tool). Executes each query at the given sf and prints
  * `name nScans nReused`, sorted by scan count — outliers are candidates
  * for the ReuseExchange/ngramJaccard treatment (a query re-scanning one
  * table many times usually has canonically-diverged subtrees).
  * Usage: runMain graft.tools.DiagScans <sfDir> [minScans]
  */
object DiagScans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val minScans = if (args.length > 1) args(1).toInt else 0
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      // AdaptiveSparkPlan.toString prints the final plan first, then the
      // "== Initial Plan ==" section — count only the final part
      val plan = df.queryExecution.executedPlan.toString
      val finalPart = plan.split("== Initial Plan ==")(0)
      val scans = "FileScan".r.findAllIn(finalPart).size
      val reused = "ReusedExchange".r.findAllIn(finalPart).size
      spark.catalog.clearCache()
      (name, scans, reused)
    }
    rows.sortBy(-_._2).foreach { case (n, s, r) =>
      if (s >= minScans) println(f"[scans] $s%3d $r%3d  $n")
    }
    spark.stop()
  }
}
