package graft.tools

import graft.GraftSession.Ckpt

import graft.{GraftSession, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: stage-break simhashNearDup at a given sf dir (dev tool; mirrors
  * the DedupOps.simhashNearDup internals — keep in sync when editing it).
  * Usage: runMain graft.tools.DiagSimhash <sfDir> */
object DiagSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"=== $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm
    time("warm full")(DedupOps.simhashNearDup(t.documents, n = 4, threshold = 0.5).count())
    GraftSession.releaseMaterialized(spark)

    val docs = t.documents
    val n = 4; val threshold = 0.5
    val chunks = 4; val probeBits = 2; val width = 64 / chunks
    val mask = (1L << width) - 1
    val sigs = graft.operators.ScaleOps.fanOut(docs
      .where(col("text").isNotNull)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
      .select(col("id"),
        call_function("simhash64", transform(col("toks"), x => xxhash64(x))).as("simhash"),
        size(call_function("ngram_hashes", col("toks"), lit(n))).cast("long").as("n_sh")))
    time("sigs")(sigs.count())
    val chunked = sigs.select(col("id"), col("simhash"), col("n_sh"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("simhash"), c * width).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    time("chunked")(chunked.count())
    val flips: Seq[Long] =
      (0 until width).map(j => 1L << j) ++
        (for { i <- 0 until width; j <- i + 1 until width } yield (1L << i) | (1L << j))
    val probed = chunked.select(col("id"), col("simhash"), col("n_sh"), col("chunk"),
      explode(array(col("chunk_val") +:
        flips.map(m => col("chunk_val").bitwiseXOR(lit(m))): _*)).as("chunk_val"))
    time("probed")(probed.count())
    val maxHamming = chunks * (probeBits + 1) - 1
    val xorSig = col("a.simhash").bitwiseXOR(col("b.simhash"))
    def chunkHamming(c: Int) =
      bit_count(shiftright(xorSig, c * width).bitwiseAND(lit(mask)))
    val firstCollidingChunk = (0 until chunks).reverse
      .foldLeft(lit(chunks): Column) { (acc, c) =>
        when(chunkHamming(c) <= probeBits, lit(c)).otherwise(acc)
      }
    val lengthGate = least(col("a.n_sh"), col("b.n_sh")).cast("double") >=
      lit(threshold) * greatest(col("a.n_sh"), col("b.n_sh")).cast("double")
    val cands = probed.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .where(bit_count(xorSig) <= maxHamming &&
        col("a.chunk") === firstCollidingChunk && lengthGate)
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
    time("cands")(cands.count())
    time("cands ckpt")(cands.ckpt(true).count())
    // verify internals
    val cands2 = cands.ckpt(true)
    val candIds = cands2.select(col("ida").as("__cand_id"))
      .union(cands2.select(col("idb").as("__cand_id")))
      .distinct()
    val needed = docs.join(candIds, col("doc_id") === col("__cand_id"), "left_semi")
    val sets = needed
      .where(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id").as("id"), split(col("text"), " ").as("toks"))
      .select(col("id"), call_function("ngram_hashes", col("toks"), lit(n)).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
      .where(col("n_sh") > 0)
    time("sets")(sets.count())
    val verified = cands2
      .join(sets.select(col("id").as("ida"), col("sh").as("sha"), col("n_sh").as("na")), Seq("ida"))
      .join(sets.select(col("id").as("idb"), col("sh").as("shb"), col("n_sh").as("nb")), Seq("idb"))
      .withColumn("shared", call_function("sorted_intersect_count", col("sha"), col("shb")))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .where(col("jaccard") >= threshold)
    time("verified")(verified.count())
    GraftSession.releaseMaterialized(spark)
    time("full")(DedupOps.simhashNearDup(t.documents, n = 4, threshold = 0.5).count())
    spark.stop()
  }
}
