package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scratch: time individual declared queries at a given sf dir (dev tool).
  * Usage: runMain graft.tools.DiagTime <sfDir> <query> [query...] */
object DiagTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"=== $q rows=$n time=$dt%.2fs")
    }
    spark.stop()
  }
}
