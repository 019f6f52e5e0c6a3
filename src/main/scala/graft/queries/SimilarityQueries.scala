package graft.queries

import graft.Tables
import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding similarity-search bindings over the `embeddings` table
  * (SURVEY.md §2b X3 + driver north-star ANN operators).
  *
  * Scoring is double-precision in array-index order on both engines
  * (zip_with/aggregate ↔ list_dot_product), so similarity values agree
  * bitwise before the defensive round(…, 4).
  */
object SimilarityQueries {

  private val dotCte =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)""".stripMargin

  /** Selection size of the k-center query/oracle pair (one constant both
    * sides are generated from). */
  private val KCenterK = 8

  val queries: Map[String, Tables => DataFrame] = Map(
    // X3 — exact brute-force cosine top-k for a broadcast query set.
    "q_similarity_topk" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.bruteForceTopK(t.embeddings, queries, k = 5)
        .orderBy("query_id", "rank")
    },

    // Greedy k-center (farthest-point) core-set selection: the maximally-
    // diverse 8-exemplar panel from the embedded corpus (Gonzalez 1985 /
    // Sener & Savarese core-sets). Distances quantize to exact integers
    // before every comparison, so the greedy's argmax and tie-breaks are
    // integer decisions the unrolled-CTE oracle replays step by step.
    "q_kcenter_select" -> { t =>
      SimilarityOps.kCenterSelect(t.embeddings, k = SimilarityQueries.KCenterK)
        .orderBy("rank")
    },

    // Core-set partition: every vector assigned to its nearest k-center
    // exemplar (same quantized distance + lowest-center-id tie-break as
    // the greedy) — the per-stratum view a curator samples from. One
    // codegen'd scan against the k-vector model as array literals.
    "q_kcenter_assign" -> { t =>
      SimilarityOps.kCenterAssign(t.embeddings, k = SimilarityQueries.KCenterK)
        .orderBy("vec_id")
    },

    // Same semantics as q_similarity_topk through the bounded-state
    // aggregator (O(k) state per query, map-side combine, no window sort) —
    // the formulation that also runs unchanged on a streaming corpus
    // (continuous top-k maintenance; streaming equivalence pinned in
    // ScalaTest). Same brute-force oracle.
    "q_similarity_topk_agg" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.topKAggregated(t.embeddings, queries, k = 5)
        .orderBy("query_id", "rank")
    },

    // Embedding-cosine near-duplicate pairs — EXACT, as a blocked
    // distributed equi-join (threshold 0.4 sits in the continuous bulk of
    // this corpus's similarity distribution — the tightest true pair is at
    // sim 0.4000 — so no bucketing scheme retains full recall and exact
    // comparison is the honest semantics; the plan distributes the O(n²)
    // work instead of nested-looping it).
    "q_embedding_neardup" -> { t =>
      SimilarityOps.nearDupPairs(t.embeddings, threshold = 0.4, nBlocks = 64)
        .orderBy("ida", "idb")
    },

    // PRODUCTION near-dup path (the 100 TB shape): banded hyperplane-LSH
    // candidate pairs + exact rescoring at a genuine near-dup threshold.
    // The corpus's own tightest pair sits at sim 0.40, so the query plants
    // near-duplicates the oracle reproduces independently: doubled copies
    // of the 50 lowest-id vectors. Scaling by 2 is EXACT in floating point
    // and preserves every hyperplane sign, so each planted pair collides in
    // ALL bands — candidate recall 1 by construction — and the exact verify
    // step makes the output the hash-free pair set the SQL oracle
    // recomputes (the verify-exact contract of q_ann_lsh/q_minhash_lsh).
    // Cost scales with colliding-band pairs, never n² — the PlanQualitySpec
    // gate pins the no-all-pairs shape.
    "q_embedding_neardup_lsh" -> { t =>
      val base = t.embeddings.select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("embedding"))
      val copies = base.where(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0d)).as("embedding"))
      SimilarityOps.nearDupPairsLsh(base.unionByName(copies), threshold = 0.9)
        .orderBy("ida", "idb")
    },

    // Semantic benchmark decontamination: the "benchmark" is by
    // construction a leak — a ×2-scaled copy of every 19th corpus vector
    // (exact in FP, cosine exactly 1 against its source; the planting
    // convention of q_embedding_neardup_lsh) carried under bench ids
    // +500000. At τ = 0.8 only the leaked items flag (the corpus's
    // natural cross-similarity ceiling is 0.52 at sf0.1), so the oracle
    // re-derives the screen end-to-end from the same parquet.
    "q_semantic_decontaminate" -> { t =>
      val bench = t.embeddings.where(col("vec_id") % 19 === 0)
        .select((col("vec_id") + 500000L).as("vec_id"),
          transform(graft.functions.VectorFunctions.toDouble(col("embedding")),
            x => x * lit(2.0d)).as("embedding"))
      SimilarityOps.contaminationScreen(t.embeddings, bench, threshold = 0.8)
        .orderBy("vec_id")
    },

    // Margin-based mutual-top-1 pair mining (the bitext-mining shape):
    // every 29th vector is the seed side, the rest the corpus; a pair
    // survives only if both directions' nearest neighbours agree AND the
    // sim clears a 1.1 ratio margin over both sides' 4-NN neighbourhoods
    // (hub rejection). Sims quantize to exact 1e-4 integers before any
    // ranking/summing, so the oracle re-derives the identical pairs.
    "q_bitext_mine" -> { t =>
      SimilarityOps.marginMine(
          t.embeddings.where(col("vec_id") % 29 === 0),
          t.embeddings.where(col("vec_id") % 29 =!= 0),
          k = 4, minMargin = 1.1)
        .orderBy("x_id")
    },

    // ANN scale path: banded hyperplane-LSH candidates + exact rescoring.
    // 40 bands × 2 planes drive per-neighbour miss probability below 1e-7
    // even at this corpus's weakest top-5 similarity (0.26), and rescoring
    // is exact — so the output equals exact top-k and the SQL oracle is the
    // hash-free brute-force query. Banding recall additionally pinned in
    // ScalaTest; at production similarity regimes (≥0.8) fewer, wider bands
    // prune candidate volume by orders of magnitude with the same plan.
    "q_ann_lsh" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.lshTopK(t.embeddings, queries, k = 5, nPlanes = 2, bands = 40)
        .orderBy("query_id", "rank")
    },

    // ANN scale path #2: IVF with a spherical k-means coarse quantizer.
    // Probing ALL nCentroids cells makes the candidate set exhaustive BY
    // CONSTRUCTION (every corpus vector lives in some probed cell), so the
    // exact-rescored output equals brute force regardless of the fitted
    // centroids and the SQL oracle applies; partial-probe recall (nProbe=4)
    // is pinned in ScalaTest, where the approximation actually bites.
    "q_ivf_ann" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.ivfTopK(t.embeddings, queries, k = 5, nCentroids = 16, nProbe = 16)
        .orderBy("query_id", "rank")
    },

    // Symmetric int8 quantization (storage path for ANN at scale).
    "q_embedding_quantize" -> { t =>
      SimilarityOps.quantizeInt8(t.embeddings).orderBy("vec_id")
    },

    // Product-quantization codes (the storage layer of IVF-PQ): 4 subspaces
    // × 16 centroids = 64× compression, assigned in one narrow codegen'd
    // pass with broadcast-literal codebooks. Deterministic codebooks (the
    // lowest-id vectors' subvectors) make the assignment exactly
    // reproducible in the SQL oracle; the k-means-fitted variant is pinned
    // in ScalaTest.
    "q_pq_codes" -> { t =>
      SimilarityOps.pqCodes(t.embeddings, nSub = 4, nCentroids = 16)
        .orderBy("vec_id")
    },

    // Hard-negative mining: per query, the top-5 most-similar vectors of a
    // DIFFERENT label — the contrastive-training data-prep step (near-miss
    // negatives carry the gradient signal). Broadcast query side, corpus
    // never shuffles, label exclusion is a codegen'd join filter.
    "q_hard_negatives" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.hardNegatives(t.embeddings, queries, k = 5)
        .orderBy("query_id", "rank")
    },

    // Johnson-Lindenstrauss random projection 64 → 16 dims (±1/√16 = ±0.25
    // entries: exact in FP, so the projection reproduces bitwise in SQL).
    // The index-size/bandwidth reduction step before ANN indexing; one
    // narrow codegen'd scan, matrix rides as literals. The projected vector
    // is serialized to a comma-joined fixed-width string for the oracle
    // compare (the harness comparer cannot hash array cells); decimal(28,6)
    // renders identically ("0.250000") on both engines.
    "q_random_projection" -> { t =>
      SimilarityOps.randomProject(t.embeddings, inDim = 64, outDim = 16)
        .withColumn("proj", concat_ws(",",
          transform(col("proj"), x => x.cast("decimal(28,6)").cast("string"))))
        .orderBy("vec_id")
    },

    // ADC search over PQ codes — the SEARCH path of IVF-PQ, completing the
    // storage-path oracle of q_pq_codes: corpus vectors exist only as code
    // words; queries score cosine against the RECONSTRUCTION (per-subspace
    // codebook dots summed left-to-right, every dot in index order on both
    // engines), so with the same deterministic codebooks as q_pq_codes
    // (kmeansIters = 0: the lowest-16 vectors' subvectors) the scoring is
    // exactly reproducible in SQL. The k-means-fitted variant and the
    // reconstruction-space-equality contract are pinned in ScalaTest.
    "q_adc_topk" -> { t =>
      val books = SimilarityOps.pqFitBooks(t.embeddings, nSub = 4, nCentroids = 16)
      val codes = SimilarityOps.pqCodesWith(t.embeddings, books)
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.adcTopK(codes, queries, books, k = 5)
        .orderBy("query_id", "rank")
    },

    // Two-stage PQ retrieval (Jégou et al. 2011): ADC shortlist (top-20 by
    // reconstruction cosine) → exact cosine re-rank of the shortlist only.
    // Full vectors are read solely for the |queries|×20 candidates; the
    // oracle models both stages end-to-end with the same deterministic
    // codebooks as q_adc_topk.
    "q_adc_rerank" -> { t =>
      val books = SimilarityOps.pqFitBooks(t.embeddings, nSub = 4, nCentroids = 16)
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.adcRerankTopK(t.embeddings, queries, books, shortlist = 20, k = 5)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ — the composed production index (coarse cells + PQ codes +
    // ADC), searched at a genuinely PARTIAL probe (4 of 16 cells): the
    // oracle models the approximation itself, re-deriving cell routing,
    // probe selection, code assignment, and reconstruction-space scoring
    // from the parquet table alone (deterministic kmeansIters = 0
    // quantizers; every dot index-order, subspaces summed left-to-right).
    // Unlike q_ivf_ann (full probe) / q_adc_topk (no IVF), nothing here is
    // exhaustive — the oracle checks the pruned search path end-to-end.
    "q_ivf_pq" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      SimilarityOps.ivfPqTopK(t.embeddings, queries, k = 5,
          nCentroids = 16, nProbe = 4, nSub = 4, nPqCentroids = 16)
        .orderBy("query_id", "rank")
    },

    // Recall@5 of the partial-probe IVF-PQ index against brute force — the
    // index-quality evaluation every ANN deployment runs to tune its probe
    // budget. The oracle recomputes BOTH sides in SQL (the pruned IVF-PQ
    // search and the exact ranking) and joins them, so the measured recall
    // itself is verified, not assumed.
    "q_ann_recall" -> { t =>
      val queries = t.embeddings.where(col("vec_id") < 10)
      // fit-once contract: both quantizer models come from ONE bounded
      // sample collect and are shared by the approx search — refitting per
      // call is pure cost (the fits are deterministic), and was r9's
      // slowest-query root cause (15 s: two extra TakeOrdered corpus
      // passes + duplicated model work inside ivfPqTopK).
      val (centroids, books) = SimilarityOps.fitIvfPq(t.embeddings,
        nCentroids = 16, nSub = 4, nPqCentroids = 16)
      val approx = SimilarityOps.ivfPqTopKWith(t.embeddings, queries, k = 5,
        centroids, books, nProbe = 4)
      val exact = SimilarityOps.bruteForceTopK(t.embeddings, queries, k = 5)
      SimilarityOps.recallAtK(approx, exact, k = 5).orderBy("query_id")
    },

    // SemDeDup (Abbas et al. 2023): within-cell-only pair comparison after
    // coarse k-means cell assignment — the n²/nCentroids semantic-dedup
    // geometry. kmeansIters = 0 makes the quantizer the 16 lowest-id
    // vectors, so the oracle recomputes the identical cell partition (and
    // hence the identical within-cell pair set) from the parquet table
    // alone; the Lloyd-fitted variant is pinned in ScalaTest.
    "q_semantic_dedup" -> { t =>
      SimilarityOps.semanticDedup(t.embeddings, nCentroids = 16, threshold = 0.4)
        .orderBy("ida", "idb")
    },

    // Rolling-ingestion semantic dedup: a held-out tenth of the corpus
    // (vec_id ≡ 7 mod 10 — scale-proof split) scores against the rest
    // through the corpus-fitted cell index; linear in the batch, never
    // |corpus|². Quantizer = 16 lowest-id EXISTING vectors, so the oracle
    // re-derives the cells with a rank over the same split.
    "q_semantic_dedup_incr" -> { t =>
      val existing = t.embeddings.where(col("vec_id") % 10 =!= 7)
      val incoming = t.embeddings.where(col("vec_id") % 10 === 7)
      SimilarityOps.incrementalSemanticDedup(existing, incoming,
          nCentroids = 16, threshold = 0.4)
        .orderBy("new_id", "old_id")
    },

    // Prototype-distance pruning (Sorscher et al. 2022): keep the hardest
    // half of each quantizer cell by cosine-to-centroid — the redundant
    // cluster cores are dropped. One narrow assignment/scoring pass (the
    // prototype cosine falls out of the argmin expression); the only
    // shuffle is the cell-partitioned ranking window.
    "q_proto_prune" -> { t =>
      SimilarityOps.protoPrune(t.embeddings, keepFrac = 0.5, nCentroids = 16)
        .orderBy("vec_id")
    }
  )

  /** q_kcenter_select oracle: the greedy unrolled — step i's min-dist CTE
    * extends step i−1's with a `least` against the (i−1)-th chosen center
    * and excludes it from the candidate pool, exactly as the engine's
    * round-i scan does; every distance is the same quantized integer
    * 10000 − round(cos·10000), so argmax and ties replay bit-for-bit. */
  private def kcDist(eA: String, nA: String, eB: String, nB: String) =
    s"(10000 - CAST(round(list_dot_product($eA, $eB) / ($nA * $nB) * 10000) AS BIGINT))"

  /** The unrolled greedy CTE chain (sel0, m1/c1, …, m_{K−1}/c_{K−1}) —
    * shared by the selection and assignment oracles so both replay the
    * SAME centers. */
  private val kCenterCtes: String = {
    val sb = new StringBuilder(dotCte + ", ")
    sb ++= "sel0 AS (SELECT vec_id, e, nrm FROM n " +
      "WHERE vec_id = (SELECT min(vec_id) FROM n)), "
    sb ++= s"m1 AS (SELECT n.vec_id, n.e, n.nrm, " +
      s"${kcDist("n.e", "n.nrm", "s.e", "s.nrm")} AS md " +
      "FROM n CROSS JOIN sel0 s WHERE n.vec_id <> s.vec_id), "
    sb ++= "c1 AS (SELECT * FROM m1 ORDER BY md DESC, vec_id LIMIT 1), "
    for (i <- 2 until KCenterK) {
      sb ++= s"m$i AS (SELECT m.vec_id, m.e, m.nrm, " +
        s"least(m.md, ${kcDist("m.e", "m.nrm", "c.e", "c.nrm")}) AS md " +
        s"FROM m${i - 1} m CROSS JOIN c${i - 1} c WHERE m.vec_id <> c.vec_id), "
      sb ++= s"c$i AS (SELECT * FROM m$i ORDER BY md DESC, vec_id LIMIT 1), "
    }
    sb.toString
  }

  private val kCenterOracle: String = {
    val unions = (s"SELECT 0 AS rank, vec_id, CAST(NULL AS BIGINT) AS sep_dist FROM sel0" +:
      (1 until KCenterK).map(i =>
        s"SELECT $i AS rank, vec_id, md AS sep_dist FROM c$i")).mkString(" UNION ALL ")
    (kCenterCtes + s"u AS ($unions) " +
      "SELECT CAST(rank AS BIGINT) AS rank, vec_id, sep_dist FROM u ORDER BY rank")
      .replaceAll("\\s+", " ")
  }

  /** q_kcenter_assign oracle: the shared center chain, then per vector the
    * argmin over the k centers with the same (dist, center_id) tie order
    * the engine's struct array_min uses. */
  private val kCenterAssignOracle: String = {
    val centers = (s"SELECT vec_id, e, nrm FROM sel0" +:
      (1 until KCenterK).map(i => s"SELECT vec_id, e, nrm FROM c$i")).mkString(" UNION ALL ")
    (kCenterCtes + s"centers AS ($centers), " +
      s"a AS (SELECT n.vec_id, c.vec_id AS center_id, " +
      s"${kcDist("n.e", "n.nrm", "c.e", "c.nrm")} AS d " +
      "FROM n CROSS JOIN centers c), " +
      "r AS (SELECT vec_id, center_id, d, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY d, center_id) AS rk FROM a) " +
      "SELECT vec_id, center_id, d AS dist FROM r WHERE rk = 1 ORDER BY vec_id")
      .replaceAll("\\s+", " ")
  }

  val oracles: Map[String, String] = Map(
    "q_kcenter_select" -> kCenterOracle,
    "q_kcenter_assign" -> kCenterAssignOracle,
    // The scaled-copy norm is recomputed from the scaled vector exactly as
    // the engine does (×2 is exact FP scaling, so sqrt(4S) = 2·sqrt(S)
    // bitwise); dot argument order mirrors cosinePrenormed(bv, v).
    "q_semantic_decontaminate" ->
      (dotCte + """,
        |b AS (
        |  SELECT vec_id + 500000 AS bench_id, list_transform(e, x -> x * 2.0) AS be
        |  FROM n WHERE vec_id % 19 = 0),
        |bn AS (SELECT bench_id, be, sqrt(list_dot_product(be, be)) AS bnrm FROM b),
        |p AS (
        |  SELECT c.vec_id, bn.bench_id,
        |    list_dot_product(bn.be, c.e) / (bn.bnrm * c.nrm) AS sim
        |  FROM n c CROSS JOIN bn),
        |f AS (
        |  SELECT vec_id, bench_id, sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rn
        |  FROM p WHERE sim >= 0.8)
        |SELECT vec_id, bench_id, round(sim, 4) AS sim
        |FROM f WHERE rn = 1 ORDER BY vec_id""".stripMargin).replaceAll("\\s+", " "),

    // Quantized sims (exact 1e-4 integers) make ranks, 4-NN sums, and the
    // margin ratio bit-stable across engines; both row_number orders break
    // ties by ascending id exactly as the engine's windows do.
    "q_bitext_mine" ->
      (dotCte + """,
        |x AS (SELECT vec_id AS x_id, e AS xe, nrm AS xn FROM n WHERE vec_id % 29 = 0),
        |y AS (SELECT vec_id AS y_id, e AS ye, nrm AS yn FROM n WHERE vec_id % 29 <> 0),
        |s AS (SELECT x_id, y_id,
        |    CAST(round(list_dot_product(xe, ye) / (xn * yn) * 10000) AS BIGINT) AS si
        |  FROM x CROSS JOIN y),
        |rx AS (SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY si DESC, y_id) AS rk FROM s),
        |ax AS (SELECT x_id, sum(si) AS sum_x FROM rx WHERE rk <= 4 GROUP BY x_id),
        |bx AS (SELECT x_id, y_id, si FROM rx WHERE rk = 1),
        |ry AS (SELECT *, row_number() OVER (PARTITION BY y_id ORDER BY si DESC, x_id) AS rk FROM s),
        |ay AS (SELECT y_id, sum(si) AS sum_y FROM ry WHERE rk <= 4 GROUP BY y_id),
        |byt AS (SELECT y_id AS yy, x_id AS best_x FROM ry WHERE rk = 1),
        |p AS (SELECT bx.x_id AS x_id, bx.y_id AS y_id,
        |    round(bx.si / 10000.0, 4) AS sim,
        |    round(CAST(bx.si * 8 AS DOUBLE) / (ax.sum_x + ay.sum_y), 6) AS margin
        |  FROM bx JOIN byt ON byt.yy = bx.y_id AND byt.best_x = bx.x_id
        |  JOIN ax ON ax.x_id = bx.x_id JOIN ay ON ay.y_id = bx.y_id)
        |SELECT x_id, y_id, sim, margin FROM p
        |WHERE margin >= 1.1 ORDER BY x_id""".stripMargin).replaceAll("\\s+", " "),

    "q_similarity_topk" ->
      (dotCte + """,
        |p AS (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |    list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS sim
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin).replaceAll("\\s+", " "),

    "q_similarity_topk_agg" ->
      (dotCte + """,
        |p AS (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |    list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS sim
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin).replaceAll("\\s+", " "),

    // q_ann_lsh / q_ivf_ann exact-rescore full-recall candidates (see query
    // comments), so both equal the brute-force top-k — the same hash-free
    // oracle as q_similarity_topk.
    "q_ann_lsh" ->
      (dotCte + """,
        |p AS (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |    list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS sim
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin).replaceAll("\\s+", " "),

    "q_ivf_ann" ->
      (dotCte + """,
        |p AS (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |    list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS sim
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin).replaceAll("\\s+", " "),

    "q_embedding_neardup" ->
      (dotCte + """
        |SELECT a.vec_id AS ida, b.vec_id AS idb,
        |  round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    // LSH-blocked near-dup with exact rescoring at full candidate recall
    // (planted pairs collide in every band — see the binding comment), so
    // the hash-free exact pair set IS the output. The oracle rebuilds the
    // planted-copy union (×2 scaling is exact in FP on both engines) and
    // joins exactly.
    "q_embedding_neardup_lsh" ->
      """WITH v0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, e FROM v0
        |  UNION ALL
        |  SELECT vec_id + 100000, list_transform(e, x -> x * 2.0) FROM v0 WHERE vec_id < 50),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM u)
        |SELECT a.vec_id AS ida, b.vec_id AS idb,
        |  round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.9
        |ORDER BY ida, idb""".stripMargin.replaceAll("\\s+", " "),

    "q_embedding_quantize" ->
      (dotCte + """,
        |m AS (SELECT vec_id, e, list_max([abs(x) for x in e]) AS mx FROM v)
        |SELECT vec_id,
        |  round(sqrt(list_dot_product(e, e)), 6) AS l2_norm,
        |  CASE WHEN mx = 0 THEN array_to_string([0 for x in e], ',')
        |       ELSE array_to_string([CAST(round(x * 127.0 / mx) AS INTEGER) for x in e], ',')
        |  END AS quant
        |FROM m ORDER BY vec_id""".stripMargin).replaceAll("\\s+", " "),

    // dist² expands as (x·x − 2x·c) + c·c with every dot in index order —
    // the same association the Spark expression uses, so values agree
    // bitwise before the round.
    "q_pq_codes" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
        |s AS (SELECT vec_id, e, sub FROM v, (SELECT unnest(range(4)) AS sub)),
        |d AS (SELECT s.vec_id, s.sub, c.cid,
        |  (list_dot_product(e[sub*16+1 : sub*16+16], e[sub*16+1 : sub*16+16])
        |   - 2 * list_dot_product(e[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]))
        |   + list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS d2
        |  FROM s, c),
        |r AS (SELECT vec_id, sub, cid, d2,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d),
        |b AS (SELECT vec_id, sub, cid, d2 FROM r WHERE rn = 1)
        |SELECT vec_id, string_agg(CAST(cid AS VARCHAR), ',' ORDER BY sub) AS codes,
        |  round(sqrt(sum(d2)), 4) AS recon_err
        |FROM b GROUP BY vec_id ORDER BY vec_id""".stripMargin.replaceAll("\\s+", " "),

    "q_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |p AS (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id, x.label AS neg_label,
        |    list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS sim
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id AND x.label <> q.label
        |  WHERE q.vec_id < 10),
        |r AS (
        |  SELECT query_id, neighbor_id, neg_label, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, neg_label, CAST(rn AS BIGINT) AS rank,
        |  round(sim, 4) AS sim
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin.replaceAll("\\s+", " "),

    // the identical ±0.25 literal matrix is injected into both plans; dots
    // are index-order on both engines, so values agree bitwise; each
    // coordinate renders through DECIMAL(28,6) to the same fixed-width
    // string the Spark side emits, comma-joined (arrays can't be hashed
    // by the harness comparer)
    "q_random_projection" -> {
      val rows = SimilarityOps.projectionMatrix(inDim = 64, outDim = 16)
      val cols = rows.map(r =>
        "CAST(CAST(round(list_dot_product(e, [" + r.mkString(",") +
          "]), 6) AS DECIMAL(28,6)) AS VARCHAR)").mkString(", ")
      ("""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings)
        |SELECT vec_id, array_to_string([""" + cols + """], ',') AS proj
        |FROM v ORDER BY vec_id""").stripMargin.replaceAll("\\s+", " ")
    },

    // ADC scoring against the reconstruction: the code assignment is the
    // q_pq_codes oracle verbatim; then sim = (((d₀+d₁)+d₂)+d₃) /
    // (‖q‖ · sqrt(((cc₀+cc₁)+cc₂)+cc₃)) with dₛ = q_s·c_s and cc_s = c_s·c_s
    // — list() ORDER BY sub + explicit left-assoc addition reproduces the
    // Spark reduce(_ + _) association, so sims agree bitwise before the
    // round and the (sim DESC, id) ranking matches.
    "q_adc_topk" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
        |s AS (SELECT vec_id, e, sub FROM v, (SELECT unnest(range(4)) AS sub)),
        |d AS (SELECT s.vec_id, s.sub, c.cid, c.ce,
        |  (list_dot_product(e[sub*16+1 : sub*16+16], e[sub*16+1 : sub*16+16])
        |   - 2 * list_dot_product(e[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]))
        |   + list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS d2
        |  FROM s, c),
        |r AS (SELECT vec_id, sub, cid, ce, d2,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d),
        |b AS (SELECT vec_id, sub,
        |  ce[sub*16+1 : sub*16+16] AS cv,
        |  list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS cc
        |  FROM r WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 10),
        |sc AS (SELECT b.vec_id AS id, q.query_id, q.qnrm,
        |  list(list_dot_product(q.qe[b.sub*16+1 : b.sub*16+16], b.cv) ORDER BY b.sub) AS ds,
        |  list(b.cc ORDER BY b.sub) AS ccs
        |  FROM b JOIN q ON b.vec_id <> q.query_id
        |  GROUP BY b.vec_id, q.query_id, q.qnrm),
        |sim AS (SELECT query_id, id,
        |  (((ds[1] + ds[2]) + ds[3]) + ds[4])
        |    / (qnrm * sqrt((((ccs[1] + ccs[2]) + ccs[3]) + ccs[4]))) AS sim
        |  FROM sc),
        |rk AS (SELECT query_id, id AS neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rn FROM sim)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin.replaceAll("\\s+", " "),

    // Both stages in SQL: the q_adc_topk CTEs verbatim down to `rk` (the
    // unrounded ADC ranking), rn <= 20 as the shortlist, then exact cosine
    // over the full vectors for shortlist members only and a fresh ranking.
    "q_adc_rerank" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
        |s AS (SELECT vec_id, e, sub FROM v, (SELECT unnest(range(4)) AS sub)),
        |d AS (SELECT s.vec_id, s.sub, c.cid, c.ce,
        |  (list_dot_product(e[sub*16+1 : sub*16+16], e[sub*16+1 : sub*16+16])
        |   - 2 * list_dot_product(e[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]))
        |   + list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS d2
        |  FROM s, c),
        |r AS (SELECT vec_id, sub, cid, ce, d2,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d),
        |b AS (SELECT vec_id, sub,
        |  ce[sub*16+1 : sub*16+16] AS cv,
        |  list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS cc
        |  FROM r WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 10),
        |sc AS (SELECT b.vec_id AS id, q.query_id, q.qnrm,
        |  list(list_dot_product(q.qe[b.sub*16+1 : b.sub*16+16], b.cv) ORDER BY b.sub) AS ds,
        |  list(b.cc ORDER BY b.sub) AS ccs
        |  FROM b JOIN q ON b.vec_id <> q.query_id
        |  GROUP BY b.vec_id, q.query_id, q.qnrm),
        |sim AS (SELECT query_id, id,
        |  (((ds[1] + ds[2]) + ds[3]) + ds[4])
        |    / (qnrm * sqrt((((ccs[1] + ccs[2]) + ccs[3]) + ccs[4]))) AS sim
        |  FROM sc),
        |rk AS (SELECT query_id, id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rn FROM sim),
        |short AS (SELECT query_id, id FROM rk WHERE rn <= 20),
        |n2 AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |ex AS (SELECT sh.query_id, sh.id,
        |  list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm) AS sim
        |  FROM short sh
        |  JOIN n2 qv ON qv.vec_id = sh.query_id
        |  JOIN n2 cv ON cv.vec_id = sh.id),
        |rr AS (SELECT query_id, id AS neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rn FROM ex)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM rr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin.replaceAll("\\s+", " "),

    // The pruned IVF-PQ search end-to-end in SQL: `ca` ranks every vector
    // against the 16 lowest-id coarse centroids ((dot/cnrm) DESC, cid — the
    // cellsFor tie-break); rn = 1 routes the corpus, rn <= 4 picks each
    // query's probe set; the PQ-code CTEs are the q_pq_codes oracle
    // verbatim; candidates are cell-matches only, ADC-scored with the
    // q_adc_topk association. No exhaustive fallback anywhere.
    "q_ivf_pq" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |kc AS (SELECT CAST(vec_id AS INTEGER) AS ccid, e AS ce, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
        |ca AS (SELECT x.vec_id, kc.ccid,
        |  row_number() OVER (PARTITION BY x.vec_id
        |    ORDER BY list_dot_product(x.e, kc.ce) / kc.cnrm DESC, kc.ccid) AS rn
        |  FROM n x CROSS JOIN kc),
        |cells AS (SELECT vec_id, ccid AS cell FROM ca WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, ccid AS cell FROM ca
        |  WHERE vec_id < 10 AND rn <= 4),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
        |s AS (SELECT vec_id, e, sub FROM v, (SELECT unnest(range(4)) AS sub)),
        |d AS (SELECT s.vec_id, s.sub, c.cid, c.ce,
        |  (list_dot_product(e[sub*16+1 : sub*16+16], e[sub*16+1 : sub*16+16])
        |   - 2 * list_dot_product(e[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]))
        |   + list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS d2
        |  FROM s, c),
        |r AS (SELECT vec_id, sub, cid, ce, d2,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d),
        |b AS (SELECT vec_id, sub,
        |  ce[sub*16+1 : sub*16+16] AS cv,
        |  list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS cc
        |  FROM r WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 10),
        |cand AS (SELECT cells.vec_id AS id, qp.query_id
        |  FROM cells JOIN qp ON cells.cell = qp.cell
        |  WHERE cells.vec_id <> qp.query_id),
        |sc AS (SELECT b.vec_id AS id, q.query_id, q.qnrm,
        |  list(list_dot_product(q.qe[b.sub*16+1 : b.sub*16+16], b.cv) ORDER BY b.sub) AS ds,
        |  list(b.cc ORDER BY b.sub) AS ccs
        |  FROM b JOIN cand ON b.vec_id = cand.id JOIN q ON q.query_id = cand.query_id
        |  GROUP BY b.vec_id, q.query_id, q.qnrm),
        |sim AS (SELECT query_id, id,
        |  (((ds[1] + ds[2]) + ds[3]) + ds[4])
        |    / (qnrm * sqrt((((ccs[1] + ccs[2]) + ccs[3]) + ccs[4]))) AS sim
        |  FROM sc),
        |rk AS (SELECT query_id, id AS neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rn FROM sim)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(sim, 4) AS sim
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin.replaceAll("\\s+", " "),

    // The q_ivf_pq search chain verbatim down to `rk` (the approx top-5),
    // plus the exact brute-force top-5 from the same `n` CTE, left-joined:
    // per-query recall measured in SQL, nothing assumed.
    "q_ann_recall" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |kc AS (SELECT CAST(vec_id AS INTEGER) AS ccid, e AS ce, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
        |ca AS (SELECT x.vec_id, kc.ccid,
        |  row_number() OVER (PARTITION BY x.vec_id
        |    ORDER BY list_dot_product(x.e, kc.ce) / kc.cnrm DESC, kc.ccid) AS rn
        |  FROM n x CROSS JOIN kc),
        |cells AS (SELECT vec_id, ccid AS cell FROM ca WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, ccid AS cell FROM ca
        |  WHERE vec_id < 10 AND rn <= 4),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
        |s AS (SELECT vec_id, e, sub FROM v, (SELECT unnest(range(4)) AS sub)),
        |d AS (SELECT s.vec_id, s.sub, c.cid, c.ce,
        |  (list_dot_product(e[sub*16+1 : sub*16+16], e[sub*16+1 : sub*16+16])
        |   - 2 * list_dot_product(e[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]))
        |   + list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS d2
        |  FROM s, c),
        |r AS (SELECT vec_id, sub, cid, ce, d2,
        |  row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d),
        |b AS (SELECT vec_id, sub,
        |  ce[sub*16+1 : sub*16+16] AS cv,
        |  list_dot_product(ce[sub*16+1 : sub*16+16], ce[sub*16+1 : sub*16+16]) AS cc
        |  FROM r WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 10),
        |cand AS (SELECT cells.vec_id AS id, qp.query_id
        |  FROM cells JOIN qp ON cells.cell = qp.cell
        |  WHERE cells.vec_id <> qp.query_id),
        |sc AS (SELECT b.vec_id AS id, q.query_id, q.qnrm,
        |  list(list_dot_product(q.qe[b.sub*16+1 : b.sub*16+16], b.cv) ORDER BY b.sub) AS ds,
        |  list(b.cc ORDER BY b.sub) AS ccs
        |  FROM b JOIN cand ON b.vec_id = cand.id JOIN q ON q.query_id = cand.query_id
        |  GROUP BY b.vec_id, q.query_id, q.qnrm),
        |sim AS (SELECT query_id, id,
        |  (((ds[1] + ds[2]) + ds[3]) + ds[4])
        |    / (qnrm * sqrt((((ccs[1] + ccs[2]) + ccs[3]) + ccs[4]))) AS sim
        |  FROM sc),
        |rk AS (SELECT query_id, id AS neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rn FROM sim),
        |ap AS (SELECT query_id, neighbor_id FROM rk WHERE rn <= 5),
        |p2 AS (SELECT q2.vec_id AS query_id, x.vec_id AS neighbor_id,
        |  list_dot_product(q2.e, x.e) / (q2.nrm * x.nrm) AS bsim
        |  FROM n q2 JOIN n x ON x.vec_id <> q2.vec_id
        |  WHERE q2.vec_id < 10),
        |brk AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY bsim DESC, neighbor_id) AS rn
        |  FROM p2),
        |bf AS (SELECT query_id, neighbor_id FROM brk WHERE rn <= 5)
        |SELECT bf.query_id, CAST(count(ap.neighbor_id) AS BIGINT) AS n_matched,
        |  round(count(ap.neighbor_id) / 5.0, 6) AS recall
        |FROM bf LEFT JOIN ap
        |  ON bf.query_id = ap.query_id AND bf.neighbor_id = ap.neighbor_id
        |GROUP BY bf.query_id ORDER BY bf.query_id""".stripMargin.replaceAll("\\s+", " "),

    // Cell assignment mirrors the deterministic quantizer (centroids = the
    // 16 lowest-id vectors, cid = vec_id — same contract as the q_pq_codes
    // oracle), ranking -dot/cnrm with (sim DESC, cid) tie-break exactly as
    // the Spark expression; dots are index-order on both engines so the
    // argmax and the >= 0.4 cut agree bitwise. Then within-cell pairs only.
    "q_semantic_dedup" ->
      (dotCte + """,
        |c AS (SELECT CAST(vec_id AS INTEGER) AS cid, e AS ce, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
        |a AS (
        |  SELECT x.vec_id, x.e, x.nrm, c.cid,
        |    row_number() OVER (PARTITION BY x.vec_id
        |      ORDER BY list_dot_product(x.e, c.ce) / c.cnrm DESC, c.cid) AS rn
        |  FROM n x CROSS JOIN c),
        |cells AS (SELECT vec_id, e, nrm, cid AS cell FROM a WHERE rn = 1)
        |SELECT x.cell, x.vec_id AS ida, y.vec_id AS idb,
        |  round(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 4) AS sim
        |FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id
        |WHERE list_dot_product(x.e, y.e) / (x.nrm * y.nrm) >= 0.4
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    // Existing-side quantizer (16 lowest surviving ids, cid = rank not
    // vec_id — id 7 and 17 are in the incoming split); both splits get
    // cells by the same (sim DESC, cid) argmax, then batch×corpus pairs
    // within a cell only.
    "q_semantic_dedup_incr" ->
      (dotCte + """,
        |ex AS (SELECT * FROM n WHERE vec_id % 10 <> 7),
        |inc AS (SELECT * FROM n WHERE vec_id % 10 = 7),
        |c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
        |    e AS ce, nrm AS cnrm
        |  FROM (SELECT * FROM ex ORDER BY vec_id LIMIT 16)),
        |ae AS (
        |  SELECT x.vec_id, x.e, x.nrm, c.cid,
        |    row_number() OVER (PARTITION BY x.vec_id
        |      ORDER BY list_dot_product(x.e, c.ce) / c.cnrm DESC, c.cid) AS rn
        |  FROM ex x CROSS JOIN c),
        |ai AS (
        |  SELECT x.vec_id, x.e, x.nrm, c.cid,
        |    row_number() OVER (PARTITION BY x.vec_id
        |      ORDER BY list_dot_product(x.e, c.ce) / c.cnrm DESC, c.cid) AS rn
        |  FROM inc x CROSS JOIN c),
        |ce AS (SELECT vec_id, e, nrm, cid AS cell FROM ae WHERE rn = 1),
        |ci AS (SELECT vec_id, e, nrm, cid AS cell FROM ai WHERE rn = 1)
        |SELECT x.cell, x.vec_id AS new_id, y.vec_id AS old_id,
        |  round(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 4) AS sim
        |FROM ci x JOIN ce y ON x.cell = y.cell
        |WHERE list_dot_product(x.e, y.e) / (x.nrm * y.nrm) >= 0.4
        |ORDER BY new_id, old_id""".stripMargin).replaceAll("\\s+", " "),

    // Same cell routing as q_semantic_dedup (argmax of dot/cnorm, cid
    // tie-break), prototype cosine carries both norms; `+ 0` normalizes
    // DuckDB's signed-zero round (proto_sim can straddle 0 here, unlike
    // the thresholded dedup sims)
    "q_proto_prune" ->
      (dotCte + """,
        |c AS (SELECT CAST(vec_id AS INTEGER) AS cid, e AS ce, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
        |a AS (
        |  SELECT x.vec_id, c.cid,
        |    list_dot_product(x.e, c.ce) / (c.cnrm * x.nrm) AS sim,
        |    row_number() OVER (PARTITION BY x.vec_id
        |      ORDER BY list_dot_product(x.e, c.ce) / c.cnrm DESC, c.cid) AS rn
        |  FROM n x CROSS JOIN c),
        |cells AS (SELECT vec_id, cid AS cell, sim FROM a WHERE rn = 1),
        |r AS (SELECT cell, vec_id, sim,
        |  row_number() OVER (PARTITION BY cell ORDER BY sim ASC, vec_id) AS rk,
        |  count(*) OVER (PARTITION BY cell) AS n_cell FROM cells)
        |SELECT cell, vec_id, round(sim, 4) + 0 AS proto_sim, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= ceil(n_cell * 0.5) ORDER BY vec_id""".stripMargin)
        .replaceAll("\\s+", " ")
  )
}
