package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scratch: print executed-plan lines matching a pattern (dev tool).
  * Usage: runMain graft.tools.DiagPlan <sfDir> <query> <substr> */
object DiagPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, q, pat) = args
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains(pat)).foreach(l => println("=== " + l.trim.take(160)))
    spark.stop()
  }
}
