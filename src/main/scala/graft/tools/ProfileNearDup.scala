package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main for the near-dup pipeline stages (dev tool). */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("read-only")(docs.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => docs.count() })
    time("tokens")(docs.select(tokens(col("text")).as("t")).selectExpr("size(t) n").agg(sum("n")).count())
    val idx = docs.select(col("doc_id").as("id"), shingles(tokens(col("text")), 4).as("sh"))
    time("shingles")(idx.selectExpr("size(sh) n").agg(sum("n")).count())
    val ex = idx.select(col("id"), explode(col("sh")).as("s0"))
      .select(col("id"), xxhash64(col("s0")).as("s"))
    time("explode+hash")(ex.count())
    val a = ex.select(col("id").as("ida"), col("s"))
    val b = ex.select(col("id").as("idb"), col("s"))
    time("join")(a.join(b, Seq("s")).where(col("ida") < col("idb")).count())
    time("full-query")(graft.operators.DedupOps.ngramJaccard(docs, n = 4, threshold = 0.5).count())
    // variant: explode positions, build each shingle as a codegen'd scalar
    val ex2 = docs
      .select(col("doc_id").as("id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 4)
      .select(col("id"), col("toks"), explode(sequence(lit(0), size(col("toks")) - 4)).as("i"))
      .select(col("id"), xxhash64(concat_ws(" ", slice(col("toks"), col("i") + 1, lit(4)))).as("s"))
      .distinct()
    time("explode-pos+hash")(ex2.count())
    val a2 = ex2.select(col("id").as("ida"), col("s"))
    val b2 = ex2.select(col("id").as("idb"), col("s"))
    time("join-pos")(a2.join(b2, Seq("s")).where(col("ida") < col("idb")).count())
    spark.stop()
  }
}
