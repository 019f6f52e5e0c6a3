package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main for q_dsir_sample (dev tool): times each stage of
  * the DSIR pipeline in isolation to attribute the query's wall time —
  * tokenize+bucket scan, per-(doc,bucket) histogram, and the full operator.
  */
object ProfileDsir {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val docs = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .documents

    def time(name: String)(f: => Long): Unit = {
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[profile] $name%-28s min ${runs.map(_._1).min}%.3f s  " +
        f"(runs ${runs.map(r => f"${r._1}%.3f").mkString(", ")})  n=${runs.head._2}")
    }

    val tok = docs.select(col("doc_id"), (col("lang") === "en").as("is_tgt"),
        explode(split(col("text"), " ")).as("w"))
    time("explode only")(tok.count())
    val bucketed = tok.select(col("doc_id"), col("is_tgt"),
      (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % 256).cast("int").as("b"))
    time("explode+md5 bucket")(bucketed.count())
    val perDoc = bucketed.groupBy("doc_id", "is_tgt", "b").agg(count(lit(1)).as("n"))
    time("per-doc histogram")(perDoc.count())
    time("full dsirResample") {
      graft.operators.PipelineOps.dsirResample(
        docs, isTarget = col("lang") === "en", k = 100).count()
    }
    spark.stop()
  }
}
