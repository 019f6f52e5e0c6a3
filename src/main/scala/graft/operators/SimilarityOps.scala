package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *    against the full corpus; one pass, no shuffle of the corpus side.
  *  - [[lshTopK]]: the scale path — random-hyperplane LSH buckets both sides;
  *    the corpus is scanned once, scored only against queries sharing a
  *    bucket. At 100 TB the bucket join replaces an infeasible cross join.
  *  - [[nearDupPairs]]: all-pairs cosine ≥ threshold via a block-cross join
  *    at test scale; the LSH bucket variant is the production path.
  *
  * All scoring is double-precision in array index order (see
  * [[graft.functions.VectorFunctions]]), so results are reproducible across
  * partitionings.
  */
object SimilarityOps {

  /** Corpus with normalised vector + precomputed norm. */
  private def prepared(emb: DataFrame, vecCol: String, idCol: String): DataFrame =
    emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact top-k neighbours for each query vector (excluding self).
    * The query side is broadcast — corpus never shuffles. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, vecCol, idCol)
    val q = prepared(queries, vecCol, idCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("sim", cosinePrenormed(col("qv"), col("v"), col("qnrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** LSH-bucketed approximate top-k: both sides hashed to
    * `nPlanes`-bit hyperplane buckets; scoring happens only within a bucket.
    * Lower nPlanes → higher recall, bigger buckets. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, vecCol, idCol)
      .withColumn("bucket", packBits(hyperplaneBits(col("v"), nPlanes)))
    val q = prepared(queries, vecCol, idCol)
      .withColumn("bucket", packBits(hyperplaneBits(col("v"), nPlanes)))
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= col("query_id"))
      .withColumn("sim", cosinePrenormed(col("qv"), col("v"), col("qnrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer of
    * `nCentroids` centroids partitions the corpus into cells; queries score
    * only the `nProbe` nearest cells.
    *
    * Centroids are chosen deterministically (the lowest-id vectors — at
    * production scale substitute a k-means fit, the assignment plan is
    * unchanged). Plan shape: one corpus scan to assign cells (broadcast
    * centroids, argmin over a literal array), then a cell-keyed join against
    * the probed query cells — the corpus never cross-joins the query set.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, vecCol, idCol)
    // Deterministic coarse quantizer: the lowest-id vectors. This collect is
    // model metadata (nCentroids small vectors), not data — the k-means
    // analog of fitting a model, broadcast as literals into the plan.
    val centroids: Array[(Int, Seq[Double], Double)] = c.orderBy(col("id")).limit(nCentroids)
      .select(col("v")).collect().zipWithIndex
      .map { case (r, i) =>
        val v = r.getSeq[Double](0)
        (i, v, math.sqrt(v.map(x => x * x).sum))
      }
    val centArr = array(centroids.map { case (i, v, n) =>
      struct(lit(i).as("cid"), array(v.map(lit): _*).as("cv"), lit(n).as("cnorm"))
    }: _*)
    // nearest cell(s) by cosine: the row's own norm is constant across
    // centroids, so ranking by -dot/cnorm suffices
    def cellsFor(vCol: Column, n: Int): Column =
      slice(transform(
        array_sort(transform(centArr, cent =>
          struct((lit(-1.0) * call_function("vec_dot", cent.getField("cv"), vCol) /
            cent.getField("cnorm")).as("negSim"),
            cent.getField("cid").as("cid")))),
        s => s.getField("cid")), lit(1), lit(n))
    val assigned = c.withColumn("cell", element_at(cellsFor(col("v"), 1), 1))
    val q = prepared(queries, vecCol, idCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"),
        explode(cellsFor(col("v"), nProbe)).as("cell"))
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("sim", cosinePrenormed(col("qv"), col("v"), col("qnrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** All-pairs near-duplicates by cosine ≥ threshold (ida < idb). */
  /** Symmetric int8 quantization of an embedding column — the standard
    * storage/bandwidth reduction before ANN indexing (4× smaller than f32,
    * 8× smaller than the f64 compute type). Per vector: scale by
    * 127/max|x|, round to int; the l2 norm is kept at full precision for
    * dequantized scoring. Pure per-row map — no shuffle, no state. */
  def quantizeInt8(emb: DataFrame, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame = {
    val v = toDouble(col(vecCol))
    emb
      .withColumn("__v", v)
      // bind max|x| to a column first: a non-attribute expression referenced
      // inside a lambda re-evaluates per reference
      .withColumn("__mx", array_max(transform(col("__v"), x => abs(x))))
      .select(
        col(idCol),
        round(norm(col("__v")), 6).as("l2_norm"),
        when(col("__mx") === 0d, concat_ws(",", transform(col("__v"), _ => lit("0"))))
          .otherwise(concat_ws(",",
            transform(col("__v"), x => round(x * 127.0 / col("__mx"), 0).cast("int").cast("string"))))
          .as("quant"))
  }

  def nearDupPairs(emb: DataFrame, threshold: Double,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val p = prepared(emb, vecCol, idCol)
    val a = p.select(col("id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("sim", cosinePrenormed(col("va"), col("vb"), col("na"), col("nb")))
      .where(col("sim") >= threshold)
      .select(col("ida"), col("idb"), round(col("sim"), 4).as("sim"))
  }
}
