package graft.queries

import graft.Tables
import graft.operators.{PipelineOps, QualityOps, TimeSeriesOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-curation query bindings ([[graft.operators.PipelineOps]]): the
  * split/chunk/redact/balance/profile surface a training-data pipeline runs
  * before tokenization, each with a DuckDB oracle.
  */
object PipelineQueries {

  val queries: Map[String, Tables => DataFrame] = Map(
    // Deterministic content-hash train/valid/test split (no rand(): stable
    // across retries and re-runs, duplicate-safe across splits).
    "q_hash_split" -> { t =>
      PipelineOps.hashSplit(t.documents).orderBy("doc_id")
    },

    // Length-bucketed batch packing: pow-2 token-length buckets, fixed-size
    // batches within each bucket, pad-waste accounting per batch (docs pad
    // to the batch max) — the dynamic-batching efficiency report.
    "q_length_buckets" -> { t =>
      PipelineOps.lengthBuckets(t.documents, batchSize = 8)
        .orderBy("bucket", "batch_id")
    },

    // Sliding-window token chunking into training sequences (32-token
    // windows, stride 24 → 8-token overlap).
    "q_doc_chunks" -> { t =>
      PipelineOps.chunk(t.documents, size = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    },

    // GPT-style sequence packing: concatenate the doc-id-ordered token
    // stream, cut every 512 tokens; each doc reports where its first token
    // lands. Two-phase distributed prefix sum (bucket partials + tiny
    // offset window) — never a global single-task window.
    "q_pack_sequences" -> { t =>
      PipelineOps.packSequences(t.documents, ctxLen = 512, bucketSize = 64)
        .orderBy("doc_id")
    },

    // Deterministic MLM corruption: mask tokens where md5("doc:pos")'s
    // first 4 hex digits fall under the 15% threshold — reproducible across
    // engines and retries, no RNG state.
    // sort FIRST: the output contract is ORDER BY doc_id anyway, maskTokens
    // is a pure (order-preserving) projection, and the range exchange is
    // what spreads the per-token md5 work across cores when the documents
    // parquet scans as a single partition (small single-row-group file).
    "q_mask_tokens" -> { t =>
      PipelineOps.maskTokens(t.documents.orderBy("doc_id"), rate = 0.15)
    },

    // Chained regex redaction (PII-scrub shape) over customer names.
    "q_pii_redact" -> { t =>
      PipelineOps.redact(t.customer, "c_name", "redacted",
          Seq("Customer#" -> "id:", "[0-9]{3,}" -> "<NUM>"))
        .select(col("c_custkey"), col("c_name"), col("redacted"))
        .orderBy("c_custkey")
    },

    // Luhn checksum screen (the payment-card validator behind PII scrubs):
    // each doc carries a deterministic 16-digit candidate (zero-padded id
    // + an arbitrary final digit), and the validator separates true
    // card-shaped numbers from lookalikes — ~1 in 10 of the planted
    // candidates validates, exactly the false-positive-suppression role
    // the screen plays after a digit-run regex. Oracle recomputes the
    // checksum as 16 unrolled closed-form terms.
    "q_luhn_screen" -> { t =>
      val cand = concat(lpad(col("doc_id").cast("string"), 15, "0"),
        pmod(col("doc_id") * 7, lit(10)).cast("string"))
      t.documents.select(col("doc_id"), cand.as("candidate"),
          PipelineOps.luhnValid(cand).as("is_valid"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition metrics: boilerplate/degenerate-text flags.
    "q_repetition_stats" -> { t =>
      PipelineOps.repetitionStats(t.documents).orderBy("doc_id")
    },

    // Corpus top-20 bigrams, deterministically tie-broken.
    "q_top_ngrams" -> { t =>
      PipelineOps.topNgrams(t.documents, n = 2, k = 20)
    },

    // Cross-document boilerplate stripping: tokens covered by any 8-gram
    // shared across ≥2 documents are removed from the surviving text (the
    // repeated-span curation step; document-level dedup handles whole-doc
    // copies, this rewrites partial copies).
    "q_boilerplate_strip" -> { t =>
      PipelineOps.stripBoilerplate(t.documents, n = 8, minDf = 2).orderBy("doc_id")
    },

    // Keep-first exact-substring dedup (Lee et al. 2021 policy): only the
    // globally FIRST instance of each duplicated 8-gram survives; later
    // instances are removed wherever they occur (including within the
    // first doc). Contrast with q_boilerplate_strip, which removes every
    // instance of a shared span.
    "q_span_dedup" -> { t =>
      PipelineOps.dedupSpansKeepFirst(t.documents, n = 8).orderBy("doc_id")
    },

    // Per-provenance corpus health report: doc/token volumes, mean doc
    // length, vocabulary size and type-token ratio per source.
    "q_source_profile" -> { t =>
      QualityOps.sourceProfile(t.documents).orderBy("source")
    },

    // Cross-source duplication matrix: distinct shared 8-grams per
    // unordered source pair — which crawls mirror which, before dedup
    // decides keepers. Per-gram state bounded by the source count.
    "q_source_overlap" -> { t =>
      QualityOps.sourceOverlap(t.documents, n = 8).orderBy("source_a", "source_b")
    },

    // SHA-256 pseudonymization of the user key, referentially stable.
    "q_anonymize" -> { t =>
      PipelineOps.pseudonymize(t.events, "user_id", "pseudonym")
        .select(col("event_id"), col("pseudonym"), col("event_type"))
        .orderBy("event_id")
    },

    // k-anonymity / l-diversity release audit: equivalence classes over the
    // quasi-identifiers (event type, value band, hour-of-day), sensitive
    // attribute = user identity. One exchange — the shuffle carries one row
    // per class (QualityOps.kAnonymityAudit).
    "q_k_anonymity" -> { t =>
      graft.operators.QualityOps.kAnonymityAudit(
          t.events,
          quasiCols = Seq(
            col("event_type"),
            least(floor(col("value") / 25), lit(4L)).as("band"),
            expr("ts div 3600000000000 % 24").as("hour")),
          sensitiveCol = col("user_id"),
          k = 5L, l = 3L)
        .orderBy("event_type", "band", "hour")
    },

    // Explicit GROUPING SETS (finer than cube/rollup: a chosen lattice).
    "q_grouping_sets" -> { t =>
      t.lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // Exact multi-quantile (linear interpolation) per group — computed by
    // distributed sort + rank selection (QuantileOps), not the built-in
    // percentile() whose per-group value buffer concentrates on one reducer.
    "q_percentiles" -> { t =>
      graft.operators.QuantileOps.exactQuantiles(
          t.lineitem, "l_returnflag", "l_extendedprice",
          ps = Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75))
        .orderBy("l_returnflag")
    },

    // Approximate percentiles (the production quantile path at 100 TB —
    // Greenwald-Khanna sketch, bounded memory) pinned the same way as
    // q_approx_distinct: the oracled output is the EXACT quantile plus a
    // boolean asserting the sketch value lands within the exact ±1%-rank
    // band; the oracle asserts the same exact values and `true`, so the
    // sketch's accuracy contract is under test, not its bit pattern.
    "q_approx_quantile" -> { t =>
      val exact = graft.operators.QuantileOps.exactQuantiles(
        t.lineitem, "l_returnflag", "l_extendedprice",
        ps = Seq("p50" -> 0.50, "p95" -> 0.95,
          "lo50" -> 0.49, "hi50" -> 0.51, "lo95" -> 0.94, "hi95" -> 0.96))
      val approx = t.lineitem.groupBy("l_returnflag").agg(
        percentile_approx(col("l_extendedprice"), lit(0.50), lit(10000)).as("a50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("a95"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("p50"), col("p95"),
          col("a50").between(col("lo50"), col("hi50")).as("ok50"),
          col("a95").between(col("lo95"), col("hi95")).as("ok95"))
        .orderBy("l_returnflag")
    },

    // Feature-prep composition: synthesize NULLs (every 11th event), impute
    // them with the per-type mean, z-score the raw value per type, and
    // one-hot the event type — broadcast stats, no windows over the facts.
    "q_feature_prep" -> { t =>
      import graft.operators.FeatureOps
      val withNulls = t.events
        .select(col("event_id"), col("event_type"),
          when(col("event_id") % 11 =!= 0, col("value")).as("value"))
      val imputed = FeatureOps.imputeMean(withNulls, "event_type", "value")
      val scaled = FeatureOps.standardize(imputed, "event_type", "value")
      FeatureOps.oneHot(scaled, "event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .select(col("event_id"), col("event_type"), col("value_imp"), col("value_z"),
          col("event_type_click"), col("event_type_error"), col("event_type_purchase"),
          col("event_type_signup"), col("event_type_view"))
        .orderBy("event_id")
    },

    // Equi-depth histogram: quartile-edged bins per return flag —
    // near-equal populations by construction (modulo value ties).
    "q_histogram_eq" -> { t =>
      graft.operators.QuantileOps.equiDepthHistogram(
          t.lineitem, groupCol = "l_returnflag", valCol = "l_extendedprice", nBins = 4)
        .orderBy("l_returnflag", "bin")
    },

    // Winsorization: prices clamped into the per-flag [p05, p95] band —
    // robust-stats outlier treatment preserving row count.
    // NOTE: sort must stay LAST here — a sort below a join is removed by
    // Catalyst's EliminateSorts (join inputs are order-free), unlike the
    // pure-projection queries where sort-first parallelizes the map work.
    "q_winsorize" -> { t =>
      graft.operators.QuantileOps.winsorize(
          t.lineitem.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
          groupCol = "l_returnflag", valCol = "l_extendedprice",
          pLo = 0.05, pHi = 0.95)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice_w"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Data profiling: one summary row per inspected column.
    "q_column_profile" -> { t =>
      def cat(c: String): DataFrame = t.orders.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_null"),
        count_distinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"), col("n_distinct"),
          lit(null).cast("double").as("min_v"), lit(null).cast("double").as("max_v"))
      def num(c: String): DataFrame = t.orders.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"), col("n_distinct"),
          col("min_v"), col("max_v"))
      cat("o_orderstatus").union(cat("o_orderpriority")).union(num("o_totalprice"))
        .orderBy("col_name")
    },

    // Class-balanced subsample: equalize language frequencies
    // deterministically (hash-ranked, no rand()).
    "q_balance_classes" -> { t =>
      PipelineOps.balanceClasses(t.documents, "lang")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // Join/groupBy key-skew diagnostics (entropy + max multiplicity).
    "q_key_skew" -> { t =>
      PipelineOps.keySkew(t.events, "user_id")
    },

    // Weighted source mixing toward a target composition (even-numbered
    // sources kept at 3/4, odd at 1/4 — exact binary fractions).
    "q_mix_sources" -> { t =>
      val weights = (0 until 20)
        .map(i => s"src$i" -> (if (i % 2 == 0) 0.75 else 0.25)).toMap
      PipelineOps.mixSources(t.documents, weights).orderBy("doc_id")
    },

    // Per-domain cap (keep the 15 longest docs per source): rank-≤-k window
    // that Catalyst plans as WindowGroupLimit — map-side per-key pruning
    // before the exchange (gated in PlanQualitySpec).
    "q_source_cap" -> { t =>
      PipelineOps.sourceCap(t.documents, maxPerKey = 15).orderBy("doc_id")
    },

    // Temperature-based (α = 0.5) language rebalancing at half the corpus
    // size: dominant languages are damped toward √-proportional shares via
    // a broadcast per-language hash cut — a pure narrow map over the corpus
    // (no per-language window), the 100 TB-safe shape.
    "q_temperature_sample" -> { t =>
      PipelineOps.temperatureSample(t.documents, frac = 0.5).orderBy("doc_id")
    },

    // Weighted sampling without replacement (A-Res reservoir), 10 events
    // per type weighted by value — hash-derived uniforms so the sample is
    // retry- and engine-reproducible; O(k) state per group.
    "q_weighted_sample" -> { t =>
      PipelineOps.weightedSample(t.events, "event_type", "event_id", "value", k = 10)
        .orderBy("event_type", "rk")
    },

    // Filter-cascade observability: per-stage drop counts and cumulative
    // survivors for an ordered curation pipeline, in ONE corpus scan
    // (first-failing-stage conditional aggregation, never per-filter
    // rescans).
    "q_filter_cascade" -> { t =>
      val nTok = size(graft.functions.TextFunctions.tokens(col("text")))
      PipelineOps.filterCascade(t.documents, Seq(
        "min_tokens" -> (nTok >= 30),
        "max_tokens" -> (nTok <= 2000),
        "min_chars" -> (col("n_chars") >= 200)
      )).orderBy("stage")
    },

    // Token-budget corpus selection: the best documents by quality until an
    // 8k-token budget is spent — the data-mixing step after quality scoring.
    // Two-level bucketed prefix sums: the corpus never sees a global window
    // (gated in PlanQualitySpec); equals the oracle's global greedy cumsum
    // because quality is pre-rounded (cross-engine-stable ordering).
    "q_token_budget" -> { t =>
      val scored = graft.operators.TextOps.qualityScore(t.documents)
        .select(col("doc_id"), col("n_tokens"), col("quality"))
      PipelineOps.selectByTokenBudget(scored, budget = 8000).orderBy("doc_id")
    },

    // DSIR importance resampling (Xie et al. 2023): select the 100 raw docs
    // most resembling the English subset under hashed-unigram target/raw
    // models — one conditional-agg fit pass (shuffle carries 256 bucket
    // rows), broadcast ratio scoring, Gumbel-top-k with hash-derived noise.
    // Scores sum ×1e6-scaled int64 log-ratios, so ranking is exact and
    // order-invariant (no floating partial-agg drift at any partitioning).
    "q_dsir_sample" -> { t =>
      PipelineOps.dsirResample(t.documents, isTarget = col("lang") === "en", k = 100)
    },

    // SCD-1 upsert: updates for keys %3, inserts above the key space
    // (offset far past any scale factor's key range so synthetic inserts
    // never collide with real keys or the update set).
    "q_upsert" -> { t =>
      val base = t.customer.select("c_custkey", "c_name", "c_acctbal")
      val updates = base.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(lit("upd:"), col("c_name")).as("c_name"),
          (col("c_acctbal") + 1000d).as("c_acctbal"))
      val inserts = base.where(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"), col("c_acctbal"))
      PipelineOps.upsert(base, updates.union(inserts), "c_custkey")
        .withColumn("c_acctbal", round(col("c_acctbal"), 2))
        .orderBy("c_custkey")
    },

    // CDC changelog apply: four overlapping change waves exercise
    // latest-wins ordering — update, delete (beats the earlier update),
    // re-insert after delete, and brand-new keys.
    "q_cdc_apply" -> { t =>
      val base = t.customer.select("c_custkey", "c_name", "c_acctbal")
      def change(df: DataFrame, seq: Int, op: String) = df
        .withColumn("seq", lit(seq)).withColumn("op", lit(op))
      val changes =
        change(base.where(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), concat(lit("v1:"), col("c_name")).as("c_name"),
            (col("c_acctbal") + 100d).as("c_acctbal")), 1, "U")
        .unionByName(change(base.where(col("c_custkey") % 5 === 0), 2, "D"))
        .unionByName(change(base.where(col("c_custkey") % 15 === 0)
          .select(col("c_custkey"), concat(lit("v3:"), col("c_name")).as("c_name"),
            (col("c_acctbal") + 300d).as("c_acctbal")), 3, "U"))
        .unionByName(change(base.where(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"),
            col("c_acctbal")), 4, "I"))
      PipelineOps.applyCdc(base, changes, "c_custkey", "seq", "op")
        .withColumn("c_acctbal", round(col("c_acctbal"), 2))
        .orderBy("c_custkey")
    },

    // Snapshot diff (the inverse of CDC apply): derive the added/removed/
    // changed change set between two full snapshot republications — keys
    // dropped by the new filter read as removed, keys the old filter
    // lacked as added, value bumps as changed; unchanged keys are absent.
    "q_snapshot_diff" -> { t =>
      val oldSnap = t.events.where(col("event_id") % 7 =!= 0)
      val newSnap = t.events.where(col("event_id") % 5 =!= 0)
        .withColumn("value",
          when(col("event_id") % 11 === 0, col("value") + 1).otherwise(col("value")))
      PipelineOps.snapshotDiff(oldSnap, newSnap, "event_id",
          Seq("user_id", "event_type", "value"))
        .orderBy("event_id")
    },

    // URL canonicalization + exact dedup (the crawl-curation "same page in
    // disguise" primitive): five planted disguise variants per page — case
    // games, explicit default port + tracking params, www + trailing slash
    // + shuffled params — collapse to one canonical form, while an https
    // variant correctly stays its own group. The oracle re-derives the
    // expected CANONICAL STRING per (page, variant) closed-form, so the
    // canonicalizer's actual output is compared, not just group structure.
    "q_url_dedup" -> { t =>
      val n = col("event_id") % 50
      // variant derives from id DIV 50, so every page cycles through all
      // five disguises across the corpus — a canonicalizer bug that broke
      // cross-variant convergence could not slip past the group compare
      // (id % 5 would alias variant to page: 5 divides 50)
      val v = expr("(event_id div 50) % 5")
      val url = when(v === 0, concat(lit("http://example.com/p"), n, lit("?a=1&b=2")))
        .when(v === 1, concat(lit("HTTP://Example.COM/p"), n, lit("?a=1&b=2")))
        .when(v === 2, concat(lit("http://example.com:80/p"), n,
          lit("?a=1&b=2&utm_source=feed")))
        .when(v === 3, concat(lit("http://www.example.com/p"), n, lit("/?b=2&a=1")))
        .otherwise(concat(lit("https://example.com/p"), n, lit("?a=1&b=2")))
      graft.operators.TextOps.urlDedup(
          t.events.select(col("event_id"), url.as("url")), "url", "event_id")
        .orderBy("event_id")
    },

    // Hourly resample + forward fill per user (ts pre-truncated to µs so
    // bucket edges agree with the µs-precision oracle).
    "q_resample_fill" -> { t =>
      val e = t.events.withColumn("ts_us", col("ts") - col("ts") % 1000)
      TimeSeriesOps.resampleFill(e, "user_id", "ts_us", "value",
          bucketNs = 3600L * 1000 * 1000 * 1000)
        .orderBy("user_id", "bucket")
    },

    // Bitwise function surface over event ids.
    "q_bitwise_funcs" -> { t =>
      t.events.orderBy("event_id").select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("b_and"),
        col("event_id").bitwiseOR(lit(4096L)).as("b_or"),
        col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
        shiftleft(col("event_id"), 2).cast("long").as("b_shl"),
        shiftright(col("event_id"), 1).cast("long").as("b_shr"),
        bit_count(col("event_id")).cast("long").as("b_pop"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_hash_split" ->
      """SELECT doc_id,
        |CASE WHEN substring(md5(text), 1, 1) IN ('c','d') THEN 'valid'
        |     WHEN substring(md5(text), 1, 1) IN ('e','f') THEN 'test'
        |     ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_length_buckets" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT doc_id, n,
        |  CASE WHEN n <= 1 THEN 0 ELSE CAST(len(bin(n - 1)) AS BIGINT) END AS bucket
        |  FROM d),
        |r AS (SELECT doc_id, n, bucket,
        |  row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM b)
        |SELECT bucket, CAST((rn - 1) // 8 AS BIGINT) AS batch_id,
        |  count(*) AS n_docs, max(n) AS max_len, CAST(sum(n) AS BIGINT) AS sum_len,
        |  CAST(count(*) * max(n) - sum(n) AS BIGINT) AS padding_waste
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\\s+", " "),

    "q_doc_chunks" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (SELECT doc_id, t, unnest(range(0, greatest(len(t)-1, 0)+1, 24)) AS start FROM tok)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
        |array_to_string(t[start+1:start+32], ' ') AS chunk,
        |CAST(len(t[start+1:start+32]) AS BIGINT) AS n_tokens
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin.replaceAll("\\s+", " "),

    "q_pack_sequences" ->
      """WITH c AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |FROM documents),
        |s AS (SELECT doc_id, n_tok,
        |  coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |FROM c)
        |SELECT doc_id, n_tok, CAST(start // 512 AS BIGINT) AS seq_id,
        |CAST(start % 512 AS BIGINT) AS seq_offset
        |FROM s ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_mask_tokens" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |m AS (SELECT doc_id, t,
        |  [CASE WHEN substring(md5(doc_id || ':' || (i-1)), 1, 4) < '2666'
        |        THEN '<mask>' ELSE t[i] END for i in range(1, len(t)+1)] AS mt,
        |  [CASE WHEN substring(md5(doc_id || ':' || (i-1)), 1, 4) < '2666'
        |        THEN 1 ELSE 0 END for i in range(1, len(t)+1)] AS hits
        |FROM tok)
        |SELECT doc_id, array_to_string(mt, ' ') AS masked_text,
        |CAST(list_sum(hits) AS BIGINT) AS n_masked,
        |CAST(len(t) AS BIGINT) AS n_tokens
        |FROM m ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_pii_redact" ->
      """SELECT c_custkey, c_name,
        |regexp_replace(regexp_replace(c_name, 'Customer#', 'id:', 'g'), '[0-9]{3,}', '<NUM>', 'g') AS redacted
        |FROM customer ORDER BY c_custkey""".stripMargin.replaceAll("\\s+", " "),

    // 16 unrolled Luhn terms: position p from the left has right-index
    // 17-p; odd right-index digits pass through, even ones double-and-fold.
    "q_luhn_screen" -> {
      def dig(p: Int) = s"(ascii(substr(cand, $p, 1)) - 48)"
      val terms = (1 to 16).map { p =>
        if ((17 - p) % 2 == 1) dig(p)
        else s"(CASE WHEN 2 * ${dig(p)} > 9 THEN 2 * ${dig(p)} - 9 ELSE 2 * ${dig(p)} END)"
      }.mkString(" + ")
      s"""WITH c AS (SELECT doc_id,
         |  lpad(CAST(doc_id AS VARCHAR), 15, '0') ||
         |    CAST((doc_id * 7) % 10 AS VARCHAR) AS cand
         |  FROM documents)
         |SELECT doc_id, cand AS candidate, ($terms) % 10 = 0 AS is_valid
         |FROM c ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " ")
    },

    "q_repetition_stats" ->
      """WITH tc AS (SELECT doc_id, tok, count(*) AS c FROM
        |(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_distinct,
        |round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_frac,
        |round((sum(c) - count(*)) / CAST(sum(c) AS DOUBLE), 6) AS dup_frac
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_top_ngrams" ->
      """SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM (
        |SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS ngram
        |FROM (SELECT string_split(text, ' ') AS t FROM documents))
        |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin.replaceAll("\\s+", " "),

    "q_boilerplate_strip" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |g AS (SELECT doc_id, i, array_to_string(t[i:i+7],' ') AS gram
        |      FROM tok, unnest(range(1, len(t)-6)) AS u(i) WHERE len(t) >= 8),
        |freq AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT g.doc_id, g.i + d AS p
        |        FROM g JOIN freq USING (gram), unnest(range(0, 8)) AS w(d)),
        |tp AS (SELECT doc_id, t[i] AS tk, i FROM tok, unnest(range(1, len(t)+1)) AS u(i)),
        |kept AS (SELECT tp.doc_id,
        |  coalesce(string_agg(CASE WHEN cov.p IS NULL THEN tp.tk END, ' ' ORDER BY tp.i), '') AS clean_text
        |  FROM tp LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.p = tp.i
        |  GROUP BY tp.doc_id),
        |nrem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id)
        |SELECT tok.doc_id, kept.clean_text, coalesce(nrem.n_removed, 0) AS n_removed,
        |CAST(len(tok.t) AS BIGINT) AS n_tokens
        |FROM tok JOIN kept USING (doc_id) LEFT JOIN nrem USING (doc_id)
        |ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    // Keep-first policy: an instance is removed iff it is not row 1 of its
    // gram's (doc_id, i) order.
    "q_span_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |g AS (SELECT doc_id, i, array_to_string(t[i:i+7],' ') AS gram
        |      FROM tok, unnest(range(1, len(t)-6)) AS u(i) WHERE len(t) >= 8),
        |r AS (SELECT doc_id, i,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn FROM g),
        |cov AS (SELECT DISTINCT r.doc_id, r.i + d AS p
        |        FROM r, unnest(range(0, 8)) AS w(d) WHERE r.rn > 1),
        |tp AS (SELECT doc_id, t[i] AS tk, i FROM tok, unnest(range(1, len(t)+1)) AS u(i)),
        |kept AS (SELECT tp.doc_id,
        |  coalesce(string_agg(CASE WHEN cov.p IS NULL THEN tp.tk END, ' ' ORDER BY tp.i), '') AS clean_text
        |  FROM tp LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.p = tp.i
        |  GROUP BY tp.doc_id),
        |nrem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id)
        |SELECT tok.doc_id, kept.clean_text, coalesce(nrem.n_removed, 0) AS n_removed,
        |CAST(len(tok.t) AS BIGINT) AS n_tokens
        |FROM tok JOIN kept USING (doc_id) LEFT JOIN nrem USING (doc_id)
        |ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_source_profile" ->
      """WITH tok AS (SELECT source, doc_id, unnest(string_split(text,' ')) AS tok
        |             FROM documents)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
        |round(count(*) * 1.0 / count(DISTINCT doc_id), 6) AS avg_tokens,
        |round(count(DISTINCT tok) * 1.0 / count(*), 6) AS ttr
        |FROM tok GROUP BY source ORDER BY source""".stripMargin.replaceAll("\\s+", " "),

    // Binary string ordering on both engines makes a<b identical pair keys.
    "q_source_overlap" ->
      """WITH tok AS (SELECT source, string_split(text,' ') AS t FROM documents),
        |g AS (SELECT DISTINCT source, array_to_string(t[i:i+7],' ') AS gram
        |      FROM tok, unnest(range(1, len(t)-6)) AS u(i) WHERE len(t) >= 8),
        |p AS (SELECT a.source AS source_a, b.source AS source_b
        |      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS shared_ngrams
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\\s+", " "),

    "q_anonymize" ->
      """SELECT event_id, sha256(CAST(user_id AS VARCHAR)) AS pseudonym, event_type
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_k_anonymity" ->
      """SELECT event_type, least(CAST(floor(value / 25) AS BIGINT), 4) AS band,
        |epoch_ns(ts) // 3600000000000 % 24 AS hour,
        |CAST(count(*) AS BIGINT) AS class_size,
        |CAST(count(DISTINCT user_id) AS BIGINT) AS l_div,
        |(count(*) >= 5 AND count(DISTINCT user_id) >= 3) AS keep
        |FROM events GROUP BY 1, 2, 3 ORDER BY event_type, band, hour""".stripMargin
        .replaceAll("\\s+", " "),

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin.replaceAll("\\s+", " "),

    "q_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
        |round(quantile_cont(l_extendedprice, 0.75), 4) AS q75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\\s+", " "),

    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |TRUE AS ok50, TRUE AS ok95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\\s+", " "),

    "q_feature_prep" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 11 <> 0 THEN value END AS value
        |  FROM events),
        |s AS (
        |  SELECT event_type, round(avg(value), 6) AS mean_v,
        |    avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM e GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  coalesce(round(value, 6), mean_v) AS value_imp,
        |  CASE WHEN sd > 0 THEN round((value - mu) / sd, 6) + 0 END AS value_z,
        |  CAST(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS event_type_click,
        |  CAST(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END AS BIGINT) AS event_type_error,
        |  CAST(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS event_type_purchase,
        |  CAST(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END AS BIGINT) AS event_type_signup,
        |  CAST(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END AS BIGINT) AS event_type_view
        |FROM e JOIN s ON e.event_type = s.event_type
        |ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_histogram_eq" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.25), 6) AS e1,
        |    round(quantile_cont(l_extendedprice, 0.50), 6) AS e2,
        |    round(quantile_cont(l_extendedprice, 0.75), 6) AS e3
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  CAST((CASE WHEN l_extendedprice > e1 THEN 1 ELSE 0 END)
        |     + (CASE WHEN l_extendedprice > e2 THEN 1 ELSE 0 END)
        |     + (CASE WHEN l_extendedprice > e3 THEN 1 ELSE 0 END) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  round(min(l_extendedprice), 6) AS min_v,
        |  round(max(l_extendedprice), 6) AS max_v
        |FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\\s+", " "),

    "q_winsorize" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.05), 6) AS qlo,
        |    round(quantile_cont(l_extendedprice, 0.95), 6) AS qhi
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l.l_returnflag,
        |  round(least(greatest(l_extendedprice, qlo), qhi), 6) AS l_extendedprice_w
        |FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replaceAll("\\s+", " "),

    "q_column_profile" ->
      """SELECT * FROM (
        |SELECT 'o_orderstatus' AS col_name, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
        |CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
        |CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE) FROM orders)
        |ORDER BY col_name""".stripMargin.replaceAll("\\s+", " "),

    "q_balance_classes" ->
      """WITH r AS (SELECT doc_id, lang,
        |row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn FROM documents),
        |m AS (SELECT min(cnt) AS mn FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang))
        |SELECT doc_id, lang FROM r, m WHERE rn <= mn ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(max(n) AS BIGINT) AS n_rows,
        |CAST(max(c) AS BIGINT) AS max_cnt, round(avg(c), 6) AS avg_cnt,
        |round(-sum((c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))), 6) AS entropy_bits
        |FROM c, t""".stripMargin.replaceAll("\\s+", " "),

    "q_mix_sources" ->
      """WITH r AS (SELECT doc_id, source,
        |row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn FROM documents),
        |c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
        |q AS (SELECT source, CAST(floor(
        |(CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 0.75 ELSE 0.25 END) * cnt) AS BIGINT) AS quota
        |FROM c)
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE rn <= quota ORDER BY r.doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_source_cap" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn FROM documents)
        |SELECT doc_id, source, n_chars FROM r WHERE rn <= 15 ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, CAST(floor(sqrt(n * 1000000.0)) AS BIGINT) AS wt FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(wt) AS BIGINT) AS tw FROM w),
        |g AS (SELECT lang, n, least(n, (CAST(floor(tn * 0.5) AS BIGINT) * wt) // tw) AS tgt FROM w, t),
        |h AS (SELECT lang, CASE WHEN tgt >= n THEN 'g'
        |ELSE lpad(lower(hex(CAST(floor(CAST(tgt AS DOUBLE) / n * 4294967296.0) AS BIGINT))), 8, '0')
        |END AS cut FROM g)
        |SELECT d.doc_id, d.lang FROM documents d JOIN h USING (lang)
        |WHERE substring(md5(d.text), 1, 8) < h.cut ORDER BY d.doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_weighted_sample" ->
      """WITH w AS (SELECT event_type, event_id,
        |pow((('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT) / 4294967296.0,
        |1.0 / value) AS k
        |FROM events WHERE value > 0),
        |r AS (SELECT event_type, event_id,
        |row_number() OVER (PARTITION BY event_type ORDER BY k DESC, event_id) AS rk FROM w)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id FROM r
        |WHERE rk <= 10 ORDER BY event_type, rk""".stripMargin.replaceAll("\\s+", " "),

    "q_filter_cascade" ->
      """WITH s AS (SELECT len(string_split(text, ' ')) AS n_tok, n_chars FROM documents),
        |st AS (SELECT CASE WHEN NOT (n_tok >= 30) THEN 1
        |  WHEN NOT (n_tok <= 2000) THEN 2
        |  WHEN NOT (n_chars >= 200) THEN 3 ELSE 0 END AS stage FROM s),
        |c AS (SELECT stage, count(*) AS n FROM st GROUP BY stage),
        |t AS (SELECT count(*) AS total FROM st),
        |d AS (SELECT * FROM (VALUES (1, 'min_tokens'), (2, 'max_tokens'),
        |  (3, 'min_chars')) AS v(stage, filter))
        |SELECT CAST(d.stage AS BIGINT) AS stage, d.filter,
        |  coalesce(c.n, 0) AS dropped,
        |  CAST(t.total - sum(coalesce(c.n, 0)) OVER (ORDER BY d.stage
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS remaining
        |FROM d LEFT JOIN c USING (stage) CROSS JOIN t
        |ORDER BY stage""".stripMargin.replaceAll("\\s+", " "),

    // the oracle IS the naive global greedy cumsum — the operator's bucketed
    // two-level plan must select exactly the same documents
    "q_token_budget" ->
      """WITH s AS (SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.3
        |    + len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) * 0.4
        |    + len(list_filter(string_split(text, ' '),
        |        x -> list_contains(['the','a','of','to','and','in','is','on'], x))) * 1.0
        |      / len(string_split(text, ' ')) * 0.3, 6) AS quality
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens, quality,
        |  sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM s)
        |SELECT doc_id, n_tokens, quality FROM c WHERE cum <= 8000
        |ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    // re-derives the full DSIR pipeline: hashed-unigram fit over the token
    // stream, add-one-smoothed log-ratios quantized to int64 (the exactness
    // contract the Spark side also honors), hash-Gumbel key, top-100
    "q_dsir_sample" ->
      """WITH tok AS (SELECT doc_id, lang = 'en' AS is_tgt,
        |  CAST(concat('0x', substring(md5(w), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)),
        |counts AS (SELECT b, count(*) AS raw_n,
        |  sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt_n FROM tok GROUP BY b),
        |tot AS (SELECT sum(raw_n) AS raw_tot, sum(tgt_n) AS tgt_tot FROM counts),
        |ratios AS (SELECT b, CAST(round((ln((tgt_n + 1) / (tgt_tot + 256))
        |  - ln((raw_n + 1) / (raw_tot + 256))) * 1000000) AS BIGINT) AS lr_l
        |  FROM counts, tot),
        |scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(lr_l) AS BIGINT) AS logw_l
        |  FROM tok JOIN ratios USING (b) GROUP BY doc_id),
        |keyed AS (SELECT doc_id, n_tokens, logw_l / 1000000.0 AS logw,
        |  logw_l + CAST(round(-ln(-ln((CAST(concat('0x',
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
        |    / 4294967296.0)) * 1000000) AS BIGINT) AS key_l FROM scored)
        |SELECT doc_id, n_tokens, logw, key_l FROM keyed
        |ORDER BY key_l DESC, doc_id LIMIT 100""".stripMargin.replaceAll("\\s+", " "),

    "q_upsert" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |changes AS (
        |  SELECT c_custkey, 'upd:' || c_name AS c_name, c_acctbal + 1000 AS c_acctbal
        |  FROM base WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_name, c_acctbal FROM base WHERE c_custkey % 7 = 0)
        |SELECT coalesce(ch.c_custkey, b.c_custkey) AS c_custkey,
        |CASE WHEN ch.c_custkey IS NOT NULL THEN ch.c_name ELSE b.c_name END AS c_name,
        |round(CASE WHEN ch.c_custkey IS NOT NULL THEN ch.c_acctbal ELSE b.c_acctbal END, 2) AS c_acctbal
        |FROM base b FULL JOIN changes ch ON b.c_custkey = ch.c_custkey
        |ORDER BY c_custkey""".stripMargin.replaceAll("\\s+", " "),

    "q_snapshot_diff" ->
      """WITH o AS (SELECT event_id, user_id, event_type, value FROM events
        |           WHERE event_id % 7 <> 0),
        |n AS (SELECT event_id, user_id, event_type,
        |        CASE WHEN event_id % 11 = 0 THEN value + 1 ELSE value END AS value
        |      FROM events WHERE event_id % 5 <> 0),
        |d AS (SELECT coalesce(o.event_id, n.event_id) AS event_id,
        |  CASE WHEN o.event_id IS NULL THEN 'added'
        |       WHEN n.event_id IS NULL THEN 'removed'
        |       WHEN o.user_id <> n.user_id OR o.event_type <> n.event_type
        |            OR o.value <> n.value THEN 'changed'
        |  END AS change_type
        |FROM o FULL JOIN n ON o.event_id = n.event_id)
        |SELECT event_id, change_type FROM d WHERE change_type IS NOT NULL
        |ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    // The oracle re-derives the canonical string per (page, variant)
    // closed-form — variants 0-3 all canonicalize to the http form with
    // sorted params and no tracking/port/www/slash noise; variant 4 keeps
    // its https scheme and stays a separate group.
    "q_url_dedup" ->
      """WITH c AS (SELECT event_id,
        |  CASE WHEN (event_id // 50) % 5 = 4
        |    THEN 'https://example.com/p' || (event_id % 50) || '?a=1&b=2'
        |    ELSE 'http://example.com/p' || (event_id % 50) || '?a=1&b=2'
        |  END AS canon_url FROM events),
        |g AS (SELECT canon_url, min(event_id) AS keeper_id,
        |  CAST(count(*) AS BIGINT) AS n_copies FROM c GROUP BY 1)
        |SELECT c.event_id, c.canon_url, g.keeper_id, g.n_copies,
        |  c.event_id <> g.keeper_id AS is_dup
        |FROM c JOIN g USING (canon_url) ORDER BY c.event_id""".stripMargin
        .replaceAll("\\s+", " "),

    "q_cdc_apply" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |changes AS (
        |  SELECT c_custkey, 'v1:' || c_name AS c_name, c_acctbal + 100 AS c_acctbal,
        |    1 AS seq, 'U' AS op FROM base WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal, 2, 'D' FROM base WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'v3:' || c_name, c_acctbal + 300, 3, 'U'
        |  FROM base WHERE c_custkey % 15 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_name, c_acctbal, 4, 'I'
        |  FROM base WHERE c_custkey % 7 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        |    FROM changes) WHERE rn = 1)
        |SELECT coalesce(l.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN l.c_custkey IS NOT NULL THEN l.c_name ELSE b.c_name END AS c_name,
        |  round(CASE WHEN l.c_custkey IS NOT NULL THEN l.c_acctbal ELSE b.c_acctbal END, 2) AS c_acctbal
        |FROM base b FULL JOIN latest l ON b.c_custkey = l.c_custkey
        |WHERE l.c_custkey IS NULL OR l.op <> 'D'
        |ORDER BY c_custkey""".stripMargin.replaceAll("\\s+", " "),

    "q_resample_fill" ->
      """WITH h AS (SELECT user_id, epoch_ns(ts) // 3600000000000 AS bucket,
        |count(*) AS n, avg(value) AS v FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, unnest(generate_series(min(bucket), max(bucket))) AS bucket
        |FROM h GROUP BY user_id)
        |SELECT user_id, bucket, CAST(coalesce(h.n, 0) AS BIGINT) AS n,
        |round(last_value(h.v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_fill
        |FROM s LEFT JOIN h USING (user_id, bucket)
        |ORDER BY user_id, bucket""".stripMargin.replaceAll("\\s+", " "),

    "q_bitwise_funcs" ->
      """SELECT event_id,
        |event_id & 255 AS b_and,
        |event_id | 4096 AS b_or,
        |xor(event_id, user_id) AS b_xor,
        |event_id << 2 AS b_shl,
        |event_id >> 1 AS b_shr,
        |CAST(bit_count(event_id) AS BIGINT) AS b_pop
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " ")
  )
}
