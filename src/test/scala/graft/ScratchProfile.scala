package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Dev scratch — stage-level timing for the slowest bench queries at the
  * bench's local[32] configuration (ignored in the suite; delete freely). */
class ScratchProfile extends AnyFunSuite {

  // Findings (sf0.1, local[32], steady state): signature 0.9s, candidate
  // join+distinct 1.3s, verify 1.4s. Candidate generation is the one-sided
  // HmSearch probe shape — symmetric (both-side) probing keeps the same
  // Hamming-2-per-chunk pair coverage but collides equal chunks 17× (one
  // row per probe pair), so one-sided is the right trade.
  ignore("profile q_simhash stages at sf0.1") {
    val spark = GraftSession.local(32)
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    docs.count() // warmup
    time("signature build")(DedupOps.simhash(docs).write.format("noop").mode("overwrite").save())
    // candidate generation only: replicate the internal chunk+probe join
    import org.apache.spark.sql.functions._
    val width = 16
    val mask = (1L << width) - 1
    val sigs = DedupOps.simhash(docs)
    val chunked = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * width).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val flips: Seq[Long] = (0 until width).map(j => 1L << j) ++
      (for { i <- 0 until width; j <- i + 1 until width } yield (1L << i) | (1L << j))
    val probed = chunked.select(col("id"), col("simhash"), col("chunk"),
      explode(array(col("chunk_val") +: flips.map(m => col("chunk_val").bitwiseXOR(lit(m))): _*))
        .as("chunk_val"))
    val cands = probed.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .where(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 11)
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .distinct()
    for (i <- 1 to 2) time(s"candidates only #$i")(
      cands.write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      time(s"full simhashNearDup #$i")(
        DedupOps.simhashNearDup(docs, n = 4, threshold = 0.5, chunks = 4, probeBits = 2)
          .write.format("noop").mode("overwrite").save())
  }
}
