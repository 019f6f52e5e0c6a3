package graft.tools

import graft.{GraftSession, Tables}

/** Ad-hoc profiling main for the k-center greedy (dev tool): times
  * kCenterSelect across a k ladder to demonstrate the r14 per-round
  * checkpoint rewrite is linear-in-k (the pre-r14 least-chain re-eval form
  * was quadratic: round i re-evaluated all i previous distances from the
  * parquet scan up). Prints per-k wall time and the per-round marginal cost
  * — flat marginal cost = linear rounds.
  */
object ProfileKCenter {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val emb = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .embeddings
    var prev = 0.0
    var prevK = 0
    for (k <- Seq(8, 16, 32, 64)) {
      val t0 = System.nanoTime()
      graft.operators.SimilarityOps.kCenterSelect(emb, k).collect()
      val s = (System.nanoTime() - t0) / 1e9
      val marginal = if (prevK == 0) s / k else (s - prev) / (k - prevK)
      println(f"[profile] kCenterSelect k=$k%-3d  ${s}%7.3f s   marginal ${marginal}%6.4f s/round")
      prev = s; prevK = k
      GraftSession.releaseMaterialized(spark)
    }
    spark.stop()
  }
}
