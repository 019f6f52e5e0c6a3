package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge DataFrames (PageRank-family).
  *
  * Scale design: the classic DataFrame power-iteration shape — the edge
  * relation is normalized once (per-source weight fractions), persisted, and
  * each iteration is one shuffle-join of edges against the current rank
  * vector plus one aggregation by destination. State per iteration is two
  * slim (node, double) relations; nothing is collected to the driver except
  * the node count (a scalar, computed once). Persisting the normalized edges
  * stops the iterative lineage from re-reading the source k times; on a
  * cluster the same plan runs with edges pre-partitioned by `src` so the
  * per-iteration join co-locates.
  */
object GraphOps {

  /** Undirected co-occurrence edges: items sharing a group, both directions,
    * weighted by co-occurrence count. (Co-purchase graph when `groupCol` is
    * the order key and `itemCol` the part key.)
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("item")).distinct()
    g.select(col("g"), col("item").as("src"))
      .join(g.select(col("g"), col("item").as("dst")), Seq("g"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank by fixed-iteration power iteration.
    *
    * rank₀ = 1/N; rankₖ₊₁(v) = (1-d)/N + d·Σ_{(u,v)∈E} rankₖ(u)·w(u,v)/outw(u).
    * The co-occurrence graph is symmetric, so every node has out-edges and
    * no dangling-mass term is needed. Returns (node, rank_ratio) where
    * rank_ratio = rank·N (mean 1.0), rounded to 6 dp for stable comparison.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    // out_w is one row per node — broadcast it so normalization is a
    // map-side join over the edge relation, not an |E|-row shuffle
    val outW = broadcast(edges.groupBy(col("src")).agg(sum(col("w")).as("out_w")))
    val e = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("out_w")).as("frac"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one scalar to the driver, by design
    // The rank vector is |V| slim rows vs |E| edges — broadcast it so each
    // iteration is a map-side join over the cached edges plus one partial
    // aggregation by dst (the shuffle carries ~|V| pre-combined rows, never
    // |E|). At a scale where |V| outgrows broadcast, flip to pre-partitioning
    // both sides by src once and reusing that exchange across iterations.
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = e.join(broadcast(ranks), col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("frac") * col("rank")).as("c"))
      ranks = nodes.join(broadcast(contrib), col("node") === col("dst"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
    }
    ranks.select(col("node"), round(col("rank") * n, 6).as("rank_ratio"))
  }
}
