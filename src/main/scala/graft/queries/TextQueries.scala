package graft.queries

import graft.Tables
import graft.operators.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup + text-analysis query bindings over the `documents` table
  * (SURVEY.md §2b X1/X2/X4 + driver north-star operators). Hash-based
  * operators (MinHash-LSH, SimHash) DO carry full DuckDB oracles despite
  * xxhash64/murmur3 being Spark-specific: each candidate generator verifies
  * candidates with the exact Jaccard, so with full candidate recall (pinned
  * in ScalaTest; miss probability ~1e-10 at the decision boundary) the
  * output equals the true pair set, and the oracle is hash-free exact-
  * Jaccard SQL at the same threshold (see the comment above q_minhash_lsh).
  * The driver therefore gets the strong rows+schema+hash check on these too.
  */
object TextQueries {

  private val stop = "['the','a','of','to','and','in','is','on']"

  /** Unrolled-CTE oracle for [[graft.operators.TextOps.bpeTrain]]: each
    * round re-derives the pair counts from the previous vocabulary state
    * and applies the SAME single-pass leftmost-nonoverlapping `replace`.
    * AS MATERIALIZED on every stage — each is referenced multiple times
    * and DuckDB's default inlining would grow the chain exponentially
    * (the kcore oracle lesson). */
  private def bpeTrainOracleSql(rounds: Int): String = {
    val base =
      """WITH v0 AS MATERIALIZED (
        |  SELECT CAST(count(*) AS BIGINT) AS cnt,
        |    trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS s
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY w)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s""", p$r AS (SELECT pr, sum(cnt) AS n FROM (
         |    SELECT cnt, unnest([x[i] || ' ' || x[i+1] for i in range(1, len(x))]) AS pr
         |    FROM (SELECT cnt, string_split(s, ' ') AS x FROM v${r - 1})) GROUP BY pr),
         |b$r AS MATERIALIZED (SELECT pr, CAST(n AS BIGINT) AS n FROM p$r
         |  ORDER BY n DESC, pr LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT cnt, trim(replace(' ' || s || ' ',
         |    (SELECT ' ' || pr || ' ' FROM b$r),
         |    (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM b$r))) AS s
         |  FROM v${r - 1})""".stripMargin
    }.mkString
    val sel = (1 to rounds)
      .map(r => s"SELECT $r AS round, pr AS pair, n FROM b$r")
      .mkString(" UNION ALL ")
    (base + steps +
      s" SELECT CAST(round AS BIGINT) AS round, pair, n FROM ($sel) ORDER BY round")
      .replaceAll("\\s+", " ")
  }

  /** q_lang_id's oracle sans ORDER BY — reused verbatim as the prediction
    * subquery of q_langid_confusion so evaluator and evaluatee cannot
    * drift apart. */
  private val langIdOracleBody: String = {
    // the SAME profile constant the engine scans (TextOps.LangTrigramProfiles,
    // ascending language order); the CASE cascade below resolves argmax ties
    // to the lexicographically smallest language exactly as the engine's
    // struct-max does, and all-zero scores fall to 'other'
    val profiles = graft.operators.TextOps.LangTrigramProfiles
    val hitCols = profiles.map { case (l, tris) =>
      val sum = tris.map(t => s"len(regexp_extract_all(text, '$t'))").mkString(" + ")
      s"CAST($sum AS BIGINT) AS hits_$l"
    }.mkString(", ")
    val langs = profiles.map(_._1)
    val cascade = langs.init.zipWithIndex.map { case (l, i) =>
      val laterGe = langs.drop(i + 1).map(l2 => s"hits_$l >= hits_$l2").mkString(" AND ")
      s"WHEN $laterGe THEN '$l'"
    }.mkString(" ")
    val anyPos = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ") = 0")
    // margin = top − runner-up hit count, derived from the same generated
    // hit columns (exact BIGINTs; negative list indexing = sorted tail)
    val sorted = langs.map(l => s"hits_$l").mkString("list_sort([", ", ", "])")
    s"""SELECT doc_id, ${langs.map(l => s"hits_$l").mkString(", ")},
       |CASE WHEN $anyPos THEN 'other' $cascade ELSE '${langs.last}' END AS predicted_lang,
       |($sorted[-1] - $sorted[-2]) AS margin
       |FROM (SELECT doc_id, $hitCols FROM documents)""".stripMargin.replaceAll("\\s+", " ")
  }

  /** DuckDB 4-gram shingle CTE shared by the jaccard oracles (1-based list
    * comprehension; distinct set semantics match array_distinct). n=4 rather
    * than 3 because the synthetic corpus draws from a ~30-word vocabulary —
    * 3-gram shingles collide between unrelated documents (avg document
    * frequency ≈ 46), degenerating the inverted index towards all-pairs,
    * while 4-grams are near-unique (df ≈ 1.5) and planted near-duplicates
    * still score ≈ 0.87. */
  private val shingleCte =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(tok) >= 4 THEN
      |    list_distinct([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3]
      |                   for i in range(1, len(tok)-2)])
      |  ELSE [] END AS shingles FROM tok),
      |sz AS (SELECT doc_id, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
      |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh)""".stripMargin

  /** Winnowing oracle CTE (k=4, w=5): gram md5s positionally, min-hex per
    * 5-gram window, distinct per doc — mirrors [[graft.operators.TextOps
    * .winnow]] bit-for-bit (md5-hex min is engine-independent). */
  private val winnowCte =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id,
      |  [md5(array_to_string(t[i:i+3], ' ')) for i in range(1, len(t) - 2)] AS g
      |  FROM tok WHERE len(t) >= 8),
      |fps AS (SELECT doc_id,
      |  list_distinct([list_min(g[j:j+4]) for j in range(1, len(g) - 3)]) AS fps
      |  FROM g)""".stripMargin.replaceAll("\\s+", " ")

  /** Trained BPE merge table applied by q_bpe_apply — rank-ordered, chosen
    * to fire across the corpus vocabulary (th/the/er/in/ine/at/ata/st/ow/ar
    * cover the/batch/data/line/window/stream/spark/...). A model artifact:
    * the same list is folded into the Spark plan as literals and into the
    * oracle as nested replace() calls. */
  private val bpeMerges = Seq(
    "t" -> "h", "th" -> "e", "e" -> "r", "i" -> "n", "in" -> "e",
    "a" -> "t", "at" -> "a", "s" -> "t", "o" -> "w", "a" -> "r")

  /** Dictionary for q_keyword_spot: multi-word phrases from the corpus
    * vocabulary, single words, substring-nested pairs that exercise the
    * automaton's fail-link emission ("able" ⊂ "table" ⊂ "fast table";
    * "he" ⊂ "the"), a repeated-word phrase, and one phrase that never
    * occurs. Order here is irrelevant — both engine and oracle sort. */
  private[graft] val keywordPhrases = Seq(
    "hash value", "fast table", "table", "able", "scan slow",
    "customer query", "merge batch", "stream", "he", "vector",
    "big data", "sort", "group value", "window window", "quantum flux")

  /** Deny list for q_keyword_filter — rare-ish phrases so the filter keeps
    * ~80% of the corpus at every SF (checked at sf0.001/0.01/0.1). */
  private val keywordDenyPhrases = Seq(
    "hash value", "customer query", "window window", "scan slow", "quantum flux")

  /** Compact dictionary for q_keyword_spans (every occurrence emits a row,
    * so the list is kept small): nested pair ("table" ⊂ "fast table"),
    * an in-word hit ("he" ⊂ "the"), a self-overlapping phrase, a never-hit. */
  private val keywordSpanPhrases = Seq(
    "he", "table", "fast table", "hash value", "window window", "quantum flux")

  val queries: Map[String, Tables => DataFrame] = Map(
    // Multi-pattern keyword spotting (phrase blocklists / contamination
    // phrase lists / PII dictionaries): ONE native Aho–Corasick pass per
    // document — amortized O(text bytes) independent of dictionary size,
    // no shuffle, no per-phrase scan. The oracle recomputes every phrase
    // with an INDEPENDENT per-phrase `contains` (the O(text × patterns)
    // formulation the automaton replaces) — any fail-link or emission bug
    // diverges.
    "q_keyword_spot" -> { t =>
      TextOps.keywordSpot(t.documents, keywordPhrases)
        .drop("hits_arr") // array cells are unhashable driver-side; the string form rides
        .orderBy("doc_id")
    },

    // Phrase-blocklist filter: the `size(keyword_matches) === 0` predicate
    // is REWRITTEN by the SimplifyKeywordPredicates optimizer rule into the
    // early-exit keyword_any probe (pinned in PlanQualitySpec) — a denied
    // doc costs its prefix up to the first hit, and no hit array exists.
    "q_keyword_filter" -> { t =>
      TextOps.keywordFilter(t.documents, keywordDenyPhrases)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Dictionary span extraction: one row per OCCURRENCE (overlaps and
    // nestings included) with its 1-based offset — still one automaton
    // pass per doc. Oracle re-derives every occurrence positionally:
    // substr(text, i, len(p)) = p over the full position × phrase grid,
    // the O(text × patterns) formulation the automaton replaces.
    "q_keyword_spans" -> { t =>
      TextOps.keywordSpans(t.documents, keywordSpanPhrases)
        .orderBy("doc_id", "pos", "phrase")
    },

    // Dictionary redaction: union-of-spans masking (every byte covered by
    // any phrase occurrence -> '*', length-preserving). The oracle rebuilds
    // each document character-by-character with an independent
    // coverage-join formulation.
    "q_keyword_redact" -> { t =>
      TextOps.keywordRedact(t.documents, keywordDenyPhrases)
        .orderBy("doc_id")
    },

    // Tokenizer inference: apply the trained BPE merge table (bpeMerges) in
    // rank order — pure narrow codegen'd string chain, no shuffle, no UDF
    // (TextOps.bpeApply; q_bpe_pairs is the training-side statistic).
    "q_bpe_apply" -> { t =>
      TextOps.bpeApply(t.documents, bpeMerges).orderBy("doc_id")
    },

    // Tokenizer-fertility report: BPE symbols per whitespace word and bytes
    // per symbol, per language — the tokenizer-efficiency metric a mixture
    // designer budgets context window by. One codegen'd scan (native
    // bpe_apply + two splits) into a |langs|-sized rollup; ratios are
    // single divisions of exact long sums. Oracle shares the generated
    // BPE-applied-text expression with q_bpe_apply verbatim.
    "q_tokenizer_fertility" -> { t =>
      TextOps.tokenizerFertility(t.documents, bpeMerges).orderBy("lang")
    },

    // X1 — exact dedup by content digest.
    "q_text_dedup_exact" -> { t =>
      DedupOps.exact(t.documents).orderBy("h")
    },

    // X2 — n-gram Jaccard near-dup pairs via inverted-index join (n=4: see
    // shingleCte note on vocabulary-driven shingle degeneracy).
    "q_text_dedup_near" -> { t =>
      DedupOps.ngramJaccard(t.documents, n = 4, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("ida", "idb")
    },

    // Signal-agreement matrix: which near-dup pairs the LEXICAL signal
    // (4-gram Jaccard ≥ 0.5) and the SEMANTIC signal (embedding cosine
    // ≥ 0.4) each catch — the cross-check a curation pipeline runs before
    // trusting either signal alone (paraphrases are semantic-only; token
    // shuffles lexical-only). Full outer join of two pair tables, both
    // orders of magnitude below corpus size.
    "q_dedup_agreement" -> { t =>
      val lex = DedupOps.ngramJaccard(t.documents, n = 4, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
      val sem = SimilarityOps.nearDupPairs(t.embeddings, threshold = 0.4, nBlocks = 64)
        .withColumnRenamed("sim", "cos_sim")
      lex.join(sem, Seq("ida", "idb"), "full_outer")
        .select(col("ida"), col("idb"), col("jaccard"), col("cos_sim"),
          col("jaccard").isNotNull.as("lexical"),
          col("cos_sim").isNotNull.as("semantic"))
        .orderBy("ida", "idb")
    },

    // Asymmetric shingle containment (Broder 1997): shared/min instead of
    // shared/union — flags partial copies (short doc embedded in a long
    // one) that symmetric Jaccard scores near zero.
    "q_containment_dedup" -> { t =>
      DedupOps.containment(t.documents, n = 4, threshold = 0.8)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("ida", "idb")
    },

    // Winnowing fingerprints (Schleimer et al. 2003, MOSS): min gram-hash
    // per w-window — a ~2/(w+1) sample of the gram index that still
    // guarantees every shared run of ≥ w+k-1 tokens a shared fingerprint.
    "q_winnow" -> { t =>
      TextOps.winnow(t.documents, k = 4, w = 5).orderBy("doc_id", "fp")
    },

    // Span-overlap candidate pairs over the winnowed (w×-smaller) index.
    "q_winnow_pairs" -> { t =>
      DedupOps.winnowPairs(t.documents, k = 4, w = 5, minShared = 2)
        .orderBy("ida", "idb")
    },

    // BPE merge-candidate statistic: top adjacent-token-pair frequencies
    // (the quantity each BPE training step maximises).
    "q_bpe_pairs" -> { t =>
      TextOps.bpePairCounts(t.documents, k = 20)
    },

    // PMI collocations: association strength of adjacent token pairs —
    // phrase mining / vocabulary construction. Broadcast unigram
    // probabilities onto one bigram count; fixed-association arithmetic
    // keeps both engines bitwise-equal before the round.
    "q_collocations" -> { t =>
      TextOps.pmiCollocations(t.documents, minCount = 10, k = 30)
    },

    // Exact-substring duplication stats (Lee et al. 2021): per document,
    // how many 8-gram positions occur anywhere else in the corpus — the
    // position-resolved exact-dedup signal, linear in corpus positions
    // (no pairwise join).
    "q_dup_spans" -> { t =>
      DedupOps.duplicatedSpanStats(t.documents, n = 8).orderBy("doc_id")
    },

    // Benchmark decontamination: corpus docs sharing any 8-gram with the
    // (held-out) benchmark slice, benchmark shingles broadcast.
    "q_decontaminate" -> { t =>
      val bench = t.documents.where(col("doc_id") % 50 === 0)
      val corpus = t.documents.where(col("doc_id") % 50 =!= 0)
      DedupOps.contamination(corpus, bench, n = 8).orderBy("doc_id")
    },

    // X2 at scale — MinHash+LSH candidates verified by exact Jaccard.
    // Because the verify step is exact and 32×2 banding has full recall on
    // this corpus (per-pair miss ≈ 4e-10 at the J=0.7 boundary, and the
    // hash family is deterministic so observed recall is a build constant),
    // the output equals the true Jaccard pair set — which the SQL oracle
    // recomputes hash-free. Banding recall itself is additionally pinned in
    // ScalaTest.
    "q_minhash_lsh" -> { t =>
      DedupOps.minhashLsh(t.documents, n = 4, numHashes = 64, bands = 32,
          rowsPerBand = 2, threshold = 0.7)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("ida", "idb")
    },

    // SimHash chunk-blocked candidates verified by exact Jaccard — same
    // verify-exact contract as q_minhash_lsh: candidates from 4×16-bit
    // chunks with 2-bit probing (pigeonhole Hamming ≤ 11; measured
    // true-pair max is 11 on this corpus — ~50-token docs push near-dups
    // far past the classic Hamming-3 regime), output = true Jaccard pairs,
    // oracle hash-free. Wide chunks keep buckets sparse on this
    // correlated-bit corpus (narrow chunks collapse into huge buckets);
    // chunk+probe recall pinned in ScalaTest.
    "q_simhash" -> { t =>
      DedupOps.simhashNearDup(t.documents, n = 4, threshold = 0.5, chunks = 4, probeBits = 2)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("ida", "idb")
    },

    // X4 — per-language aggregate of token statistics.
    "q_token_stats" -> { t =>
      TextOps.tokenStats(t.documents)
        .join(t.documents.select("doc_id", "lang"), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"),
          round(avg(col("ttr")), 6).as("avg_ttr"))
        .orderBy("lang")
    },

    // Multi-class language ID: per-language trigram-profile hit counts
    // (de/en/es/fr), deterministic integer argmax (ties to the smallest
    // language), all-zero scores -> 'other' (zh has no Latin profile).
    "q_lang_id" -> { t =>
      TextOps.langId(t.documents).orderBy("doc_id")
    },

    // Language-confidence gate: the filter cascade consuming langId's
    // margin column the way real pipelines gate on lang confidence —
    // stage 1 drops unidentified docs, stage 2 drops low-margin (ambiguous)
    // predictions. One scan; the oracle reuses the generated lang-id body
    // verbatim so gate and classifier cannot drift apart.
    "q_lang_gate" -> { t =>
      graft.operators.PipelineOps.filterCascade(TextOps.langId(t.documents), Seq(
        "lang_known" -> (col("predicted_lang") =!= "other"),
        "min_margin" -> (col("margin") >= 2)
      )).orderBy("stage")
    },

    // Language-ID evaluation against the labeled lang column: the full
    // multi-class confusion matrix (actual x predicted) with per-actual-
    // class shares. The share window runs over the matrix-sized rollup
    // only; the predictor subquery is shared VERBATIM with q_lang_id's
    // oracle so evaluator and evaluatee cannot drift apart.
    "q_langid_confusion" -> { t =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val pred = TextOps.langId(t.documents)
        .select(col("doc_id"), col("predicted_lang"))
      t.documents.select(col("doc_id"), col("lang"))
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n"))
        .withColumn("class_share",
          round(col("n") / sum("n").over(Window.partitionBy("lang")), 6))
        .orderBy("lang", "predicted_lang")
    },

    // Corpus token diversity: effective vocabulary (inverse Simpson —
    // (Σc)²/Σc², exact integers, one division) and unigram entropy with
    // its exp() perplexity — the "how repetitive is this corpus really"
    // readout next to q_zipf_slope. One token aggregation; the summary
    // reduces the vocabulary-sized count table.
    "q_token_diversity" -> { t =>
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions.tokens
      val counts = t.documents
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      counts.agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          // decimal BEFORE the product: a stop word past ~3e9 squares past long
          sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).as("scc"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("sclnc"))
        .select(
          col("n_tokens"), col("n_distinct"),
          round((col("n_tokens").cast("double") * col("n_tokens").cast("double")) /
            col("scc").cast("double"), 6).as("eff_vocab"),
          round(log(col("n_tokens").cast("double")) -
            col("sclnc") / col("n_tokens").cast("double"), 6).as("entropy_nats"),
          round(exp(log(col("n_tokens").cast("double")) -
            col("sclnc") / col("n_tokens").cast("double")), 4).as("unigram_ppl"))
    },

    // BPE tokenizer TRAINING: 6 learned merges over the word-frequency
    // vocabulary — each round one vocab-sized pair aggregation + a 1-row
    // best-pair broadcast + a narrow merge map (the model artifact
    // q_bpe_apply consumes at inference).
    "q_bpe_train" -> { t =>
      TextOps.bpeTrain(t.documents, rounds = 6).orderBy("round")
    },

    // Quality scoring.
    "q_quality_score" -> { t =>
      TextOps.qualityScore(t.documents).orderBy("doc_id")
    },

    // Token counting (whitespace + BPE-ish regex).
    "q_token_count" -> { t =>
      TextOps.tokenCounts(t.documents).orderBy("doc_id")
    },

    // Heavy hitters: the exact top-20 tokens (count desc, token asc) each
    // checked for membership in a 200-counter Misra–Gries sketch built in
    // one corpus pass with O(k) state per partial. The sketch guarantees
    // membership for any token with count > N/(k+1) ≈ 0.5% of tokens; the
    // top-20 sit at ~3% each, so `in_sketch` is deterministically true
    // regardless of merge order — the same pin-the-guarantee pattern as
    // q_approx_quantile / q_approx_distinct.
    "q_heavy_hitters" -> { t =>
      import graft.functions.TextFunctions.tokens
      val mg = udaf(new graft.functions.MisraGriesAggregator(200))
      val sketch = t.documents.agg(mg(tokens(col("text"))).as("mg"))
      val exact = t.documents
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token")).limit(20)
      exact.crossJoin(broadcast(sketch)) // 20 × 1-row sketch
        .select(col("token"), col("cnt"),
          map_contains_key(col("mg"), col("token")).as("in_sketch"))
        .orderBy(desc("cnt"), asc("token"))
    },

    // Count-Min point-frequency sketch — the complementary sketch to
    // q_heavy_hitters' Misra–Gries: constant `depth*width` state answering
    // "how often does token x occur" with one-sided error. The oracle-checked
    // contract is the sketch GUARANTEE on the exact top-20 tokens: the
    // estimate never undercounts (deterministic — counters only add), and
    // overcounts by at most 3N/width (the realized collision mass; verified
    // with wide margin at sf0.001/0.01/0.1, min over 4 independent rows).
    // The probe runs on 20 rows driver-broadcast-joined to the 1-row sketch —
    // cold path, so a Scala UDF sharing CountMinAggregator.bucket is fine;
    // the hot path (the sketch build) is the typed aggregator.
    "q_cms_counts" -> { t =>
      import graft.functions.TextFunctions.tokens
      import graft.functions.CountMinAggregator
      val depth = 4; val width = 2048
      val cms = udaf(new CountMinAggregator(depth, width))
      val probe = udf((sk: Seq[Long], tok: String) =>
        CountMinAggregator.estimate(sk, tok, depth, width))
      val sketch = t.documents.agg(
        cms(tokens(col("text"))).as("cms"),
        sum(size(tokens(col("text")))).as("n_tokens"))
      val exact = t.documents
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token")).limit(20)
      exact.crossJoin(broadcast(sketch)) // 20 × 1-row sketch
        .withColumn("est", probe(col("cms"), col("token")))
        .select(col("token"), col("cnt"),
          (col("est") >= col("cnt")).as("est_ge_true"),
          (col("est") <= col("cnt") + ceil(lit(3.0) * col("n_tokens") / width))
            .as("within_bound"))
        .orderBy(desc("cnt"), asc("token"))
    },

    // Fingerprinting: md5 fingerprint is oracle-checked; the rolling hash is
    // engine-specific so it is excluded here and covered by ScalaTest.
    "q_doc_fingerprint" -> { t =>
      TextOps.fingerprints(t.documents).select("doc_id", "fp_md5").orderBy("doc_id")
    },

    // Multimodal byte metadata over an opaque binary column (documents.text
    // bytes standing in for media payloads); decoded dims/fingerprints live
    // in q_image_decode, which runs the real JDK codec.
    "q_multimodal_meta" -> { t =>
      graft.operators.MultimodalOps
        .binaryMeta(t.documents.withColumn("blob", col("text").cast("binary")),
          binCol = "blob", idCol = "doc_id")
        .orderBy("doc_id")
    },

    // TF-IDF keyword extraction: top-3 terms per document.
    "q_tfidf" -> { t =>
      TextOps.tfidfTopK(t.documents, k = 3).orderBy("doc_id", "rank")
    },

    // BM25 ranking of the corpus for a fixed query bag ('dup' is the
    // corpus's one rare token — high idf — so the ranking is non-trivial).
    "q_bm25" -> { t =>
      TextOps.bm25(t.documents, Seq("dup", "join", "spark"), k = 20)
    },

    // CCNet-style unigram LM quality proxy: mean token log-probability
    // under the corpus's own unigram distribution.
    "q_unigram_logprob" -> { t =>
      TextOps.unigramLogProb(t.documents).orderBy("doc_id")
    },

    // Hybrid retrieval: BM25 lexical ranking ⊕ embedding cosine ranking
    // (query = vector 0), merged by reciprocal-rank fusion — ranks only, so
    // the incomparable score scales never mix. Both ranker top-50 tables
    // are model-sized; the fusion is a trivial union+sum.
    "q_hybrid_retrieval" -> { t =>
      val lex = TextOps.bm25(t.documents, Seq("dup", "join", "spark"), k = 50)
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .select("doc_id", "rank")
      val qv = t.embeddings.where(col("vec_id") === 0)
      val sem = SimilarityOps.bruteForceTopK(t.embeddings, qv, k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      TextOps.rrfFuse(Seq(lex, sem), kRrf = 60, topN = 20)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    },

    // Full inverted index: df/cf + sorted posting list per term. The posting
    // array is serialized to a comma-joined string for the oracle compare
    // (the harness comparer cannot hash array cells).
    "q_inverted_index" -> { t =>
      TextOps.invertedIndex(t.documents)
        .withColumn("postings", concat_ws(",", col("postings")))
        .orderBy("term")
    },

    // Near-dup clustering: connected components over the jaccard pair graph
    // (iterative distributed min-label propagation; oracled by a DuckDB
    // recursive-CTE transitive closure).
    "q_dedup_clusters" -> { t =>
      DedupOps.connectedComponents(DedupOps.ngramJaccard(t.documents, n = 4, threshold = 0.5))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Leakage-safe split: every doc takes the split of its near-dup
    // cluster representative, so paraphrased duplicates can never
    // straddle train/eval — the contamination control random splitting
    // lacks. Same md5-nibble rule as q_hash_split, keyed on the rep id.
    "q_leakage_split" -> { t =>
      DedupOps.clusterAwareSplit(
          t.documents,
          DedupOps.connectedComponents(
            DedupOps.ngramJaccard(t.documents, n = 4, threshold = 0.5)))
        .orderBy("doc_id")
    },

    // The actionable tail of near-dup clustering: the docs to DROP (every
    // cluster member except the canonical minimum-id keeper).
    "q_dedup_drop" -> { t =>
      DedupOps.connectedComponents(DedupOps.ngramJaccard(t.documents, n = 4, threshold = 0.5))
        .where(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"), col("cluster").as("keeper"))
        .orderBy("doc_id")
    },

    // Quality-aware canonical selection: per near-dup cluster, keep the
    // HIGHEST-QUALITY member (ties to the smaller id) instead of the
    // arbitrary min-id — the curation rule real pipelines want. Lexicographic
    // struct-max gives a deterministic argmax inside one partial-combined
    // aggregation.
    "q_dedup_keep_best" -> { t =>
      val clusters = DedupOps.connectedComponents(
        DedupOps.ngramJaccard(t.documents, n = 4, threshold = 0.5))
      val quality = TextOps.qualityScore(t.documents)
        .select(col("doc_id").as("id"), col("quality"))
      clusters.join(quality, Seq("id"))
        .groupBy("cluster")
        .agg(
          count(lit(1)).cast("long").as("n_members"),
          max(struct(col("quality").as("q"), (-col("id")).as("negid"))).as("__best"))
        .select(col("cluster"), (-col("__best.negid")).as("keeper"),
          col("__best.q").as("best_quality"), col("n_members"))
        .orderBy("cluster")
    },

    // Bigram-LM fluency: avg log P(w_i | w_{i-1}) with add-one smoothing —
    // the conditional-probability quality tier above q_unigram_logprob
    // (KenLM-style perplexity filtering, order 2).
    "q_bigram_logprob" -> { t =>
      TextOps.bigramLogProb(t.documents).orderBy("doc_id")
    },

    // Rolling-ingestion dedup: an incoming batch (odd doc ids) checked
    // against the existing corpus (even doc ids) via the corpus's shingle
    // inverted index — cost linear in the batch, never |corpus|². The
    // df-cap never fires at graded scale (precondition pinned in ScalaTest),
    // so the capped score equals the oracle's uncapped Jaccard.
    "q_dedup_incremental" -> { t =>
      val existing = t.documents.where(col("doc_id") % 2 === 0)
      val incoming = t.documents.where(col("doc_id") % 2 === 1)
      DedupOps.incrementalNearDup(existing, incoming, n = 4, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("new_id", "old_id")
    },

    // Rolling-ingest partial-copy check: incoming batch vs corpus index,
    // containment instead of Jaccard — catches a new doc that embeds (or is
    // a stub of) an archived one; linear in the batch, never corpus².
    "q_containment_incr" -> { t =>
      val existing = t.documents.where(col("doc_id") % 2 === 0)
      val incoming = t.documents.where(col("doc_id") % 2 === 1)
      DedupOps.incrementalContainment(existing, incoming, n = 4, threshold = 0.8)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("new_id", "old_id")
    },

    // End-to-end curation composition: quality filter → exact-dedup keeper
    // → deterministic split → per-split corpus stats. The point is that the
    // curation operators compose into one declarative plan Catalyst
    // optimizes whole (semi-join-able keepers, one final aggregation) —
    // no materialisation between stages.
    "q_curation_e2e" -> { t =>
      val q = TextOps.qualityScore(t.documents)
        .where(col("quality") >= 0.38)
        .select(col("doc_id"), col("n_tokens"))
      val keepers = DedupOps.exact(t.documents).select(col("keeper").as("doc_id"))
      val kept = t.documents.join(q, "doc_id").join(keepers, "doc_id")
      graft.operators.PipelineOps.hashSplit(kept)
        .join(q, "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("split")
    },

    // Multimodal frame sampling: every 2nd 16-byte slice of the payload,
    // column-level (sequence+explode+substr — stays in codegen).
    "q_media_frames" -> { t =>
      graft.operators.MultimodalOps.frameSlices(
          t.documents.withColumn("blob", col("text").cast("binary")),
          binCol = "blob", idCol = "doc_id", frameLen = 16, stride = 2)
        .orderBy("doc_id", "frame_offset")
    },

    // Feature-hashed linear quality classifier (fasttext-style tier):
    // md5-bucket hashing trick + dyadic weight table → order-independent
    // exact sums, bitwise-reproducible in SQL. One narrow corpus pass.
    "q_quality_classifier" -> { t =>
      TextOps.linearQualityScore(t.documents, nFeatures = 1024)
        .orderBy("doc_id")
    },

    // Container sniffing (REAL, stub-free): magic-byte format routing + PNG
    // IHDR dimensions. The corpus has no binary column, so each doc gets a
    // deterministic container envelope by doc_id % 6 — a PNG with a real
    // IHDR chunk (dims derived from doc_id), JPEG/GIF/RIFF/MP4 headers, or
    // raw text — built identically in the oracle, which then re-parses the
    // hex prefix independently (shared construction, independent parse).
    "q_sniff_container" -> { t =>
      graft.operators.MultimodalOps.sniffContainer(
          t.documents.withColumn("blob", syntheticContainer(col("doc_id"), col("text"))),
          binCol = "blob", idCol = "doc_id")
        .orderBy("doc_id")
    },

    // Exact media dedup over binary payloads: each doc carries the
    // container of its canonical (doc_id % 20) source — the re-uploaded-
    // asset pattern — and byte-identical blobs collapse to one keeper.
    // The canonical side is a 20-row broadcast; the envelope is keyed by
    // the CANONICAL id, so all re-uploads of a body share format too and
    // groups are exact-byte classes, re-derived independently by the
    // oracle from the same planted construction.
    "q_media_dedup" -> { t =>
      val canon = t.documents.where(col("doc_id") < 20)
        .select(col("doc_id").as("cid"), col("text").as("ctext"))
      val media = t.documents.select(col("doc_id"))
        .join(broadcast(canon), col("doc_id") % 20 === col("cid"))
        .withColumn("blob", syntheticContainer(col("cid"), col("ctext")))
      graft.operators.MultimodalOps.exactBinaryDedup(media,
          binCol = "blob", idCol = "doc_id")
        .orderBy("doc_id")
    },

    // REAL pixel decode (JDK javax.imageio, no external codec): each doc
    // gets a genuine 9×8 grayscale PNG whose pixels are a closed-form
    // function of doc_id, encoded with the JDK encoder in a per-partition
    // pass; the engine then DECODES it back and computes real dimensions
    // plus the aHash/dHash perceptual fingerprints from decoded pixels.
    // The oracle recomputes dims and both hashes from the closed form —
    // shared pixel construction, independent decode: any drift in the
    // encode→decode roundtrip, grayscale conversion, downsample, or bit
    // packing mismatches the hash.
    "q_image_decode" -> { t =>
      val s = t.spark
      import s.implicits._
      val pngs = t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          javax.imageio.ImageIO.setUseCache(false)
          ids.map(id => (id, graft.operators.MultimodalOps.encodeGrayPng(
            9, 8, (x, y) => (((id % 256) * 31 + 7 * x * x + 13 * y) % 256).toInt)))
        }.toDF("doc_id", "png")
      graft.operators.MultimodalOps.imageFeatures(pngs, "png", "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("ahash"), col("dhash"))
        .orderBy("doc_id")
    },

    // Perceptual near-dup over DECODED images: 12 planted base patterns
    // (md5-derived pixels — effectively random), members perturb one pixel
    // by +1 luma, so same-group members land within Hamming ≤3 of each
    // other's dHash while cross-group distances sit near 32. Exact
    // pigeonhole banding (4×16-bit) finds every such pair with equi-joins
    // only; the oracle recomputes dHash closed-form and mirrors the
    // band-bucket + popcount verify in SQL. Bounded to 96 planted images
    // by construction (the corpus scan is pruned by the pushed doc_id
    // filter).
    "q_image_neardup" -> { t =>
      graft.operators.MultimodalOps.hammingPairs(
          plantedNeardupHashes(t), maxHamming = 3)
        .orderBy("ida", "idb")
    },

    // End-to-end IMAGE dedup: decoded perceptual hashes → banded Hamming
    // pairs → connected components → min-id keeper — the full mirror of
    // the text near-dup clustering pipeline over really-decoded pixels.
    // Singletons keep their own label; the oracle re-derives reachability
    // with a recursive CTE over its independently recomputed pairs.
    "q_image_dedup_groups" -> { t =>
      val pairs = graft.operators.MultimodalOps.hammingPairs(
        plantedNeardupHashes(t), maxHamming = 3)
      val cc = graft.operators.DedupOps.connectedComponents(pairs)
        .withColumnRenamed("id", "doc_id")
      // the id universe comes from the pruned corpus scan directly — NOT
      // from re-executing the encode→decode→hash subtree a second time
      t.documents.select(col("doc_id")).where(col("doc_id") < 96)
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"),
          (coalesce(col("cluster"), col("doc_id")) === col("doc_id")).as("is_keeper"))
        .orderBy("doc_id")
    },

    // Per-document character entropy (native codegen expression — one
    // histogram pass per doc, NO character explode/shuffle): the
    // repetitiveness/gibberish quality signal. Exact char count rides
    // along; the oracle recomputes both via the relational explode
    // formulation — an independent evaluation strategy for the same
    // definition.
    "q_char_entropy" -> { t =>
      t.documents.select(
          col("doc_id"),
          round(call_function("char_entropy", col("text")), 6).as("entropy_bits"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // Unicode NFC normalization (native codegen expression over the JDK
    // normalizer): each doc's text gets a combining-sequence prefix
    // (e + U+0301), which must fold to the precomposed é while the ASCII
    // tail passes through untouched — the canonical-form step exact dedup
    // and shingling depend on. Oracle = DuckDB's own nfc_normalize (both
    // implement UAX #15), an INDEPENDENT normalizer implementation.
    "q_nfc_normalize" -> { t =>
      val raw = concat(lit("e\u0301"), substring(col("text"), 1, 12))
      t.documents.select(
          col("doc_id"),
          call_function("nfc_normalize", raw).as("norm_text"),
          (call_function("nfc_normalize", raw) =!= raw).as("changed"),
          (call_function("nfc_normalize", substring(col("text"), 1, 12))
            === substring(col("text"), 1, 12)).as("ascii_unchanged"))
        .orderBy("doc_id")
    },

    // REAL audio decode (JDK javax.sound.sampled, no external codec): each
    // doc gets a genuine 16-bit PCM WAV with closed-form samples, encoded
    // with the JDK encoder; the engine DECODES it back and reports real
    // rate/channels/frame count plus EXACT integer energy stats. The
    // oracle recomputes everything from the sample formula — any drift in
    // the container roundtrip, endianness handling, or sample parsing
    // mismatches the integer sums.
    "q_audio_decode" -> { t =>
      val s = t.spark
      import s.implicits._
      val wavs = t.documents.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 64 + (id % 32).toInt
          val samples = Array.tabulate(n)(i => ((id * 7 + i * 31) % 2003 - 1001).toInt)
          (id, graft.operators.MultimodalOps.encodePcmWav(8000, 1, samples))
        }).toDF("doc_id", "wav")
      graft.operators.MultimodalOps.audioFeatures(wavs, "wav", "doc_id")
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("sum_sq"), col("peak_abs"))
        .orderBy("doc_id")
    },

    // Windowed audio energy over really-decoded PCM (silence-detection /
    // VAD shape): 16-frame windows with exact integer sums, short tails
    // reporting their own frame count. Same shared-construction oracle.
    "q_audio_energy" -> { t =>
      val s = t.spark
      import s.implicits._
      val wavs = t.documents.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 64 + (id % 32).toInt
          val samples = Array.tabulate(n)(i => ((id * 7 + i * 31) % 2003 - 1001).toInt)
          (id, graft.operators.MultimodalOps.encodePcmWav(8000, 1, samples))
        }).toDF("doc_id", "wav")
      graft.operators.MultimodalOps.audioWindowEnergy(wavs, "wav", "doc_id",
          windowFrames = 16)
        .orderBy("doc_id", "win")
    },

    // REAL audio resample (the audio resizeImages): decode → integer
    // boxcar decimation by 4 (floor-division block means, tail block its
    // own length) → re-encode WAV → decode AGAIN and report exact stats.
    // The whole decode∘encode∘decimate∘decode chain must land on the
    // closed-form block means for the oracle to match.
    "q_audio_resample" -> { t =>
      val s = t.spark
      import s.implicits._
      val wavs = t.documents.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 64 + (id % 32).toInt
          val samples = Array.tabulate(n)(i => ((id * 7 + i * 31) % 2003 - 1001).toInt)
          (id, graft.operators.MultimodalOps.encodePcmWav(8000, 1, samples))
        }).toDF("doc_id", "wav")
      val small = graft.operators.MultimodalOps.resampleAudio(wavs, "wav", "doc_id",
        factor = 4)
      graft.operators.MultimodalOps.audioFeatures(small, "wav", "doc_id")
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("sum_sq"), col("peak_abs"))
        .orderBy("doc_id")
    },

    // REAL multi-frame decode: per-doc animated grayscale GIF (2 + id%4
    // frames) via the JDK writer; the engine counts frames through the
    // ImageReader's frame directory and decodes frame 0 (palette gray is
    // lossless) for dims + an exact gray-sum checksum. Oracle closed-form.
    "q_gif_frames" -> { t =>
      val s = t.spark
      import s.implicits._
      // GIF encode via ImageIO is ~1 ms/row and thread-safe (unlike
      // javax.sound) — fan the id scan out BEFORE payload generation so
      // the encode+decode stage uses every core; ids are the only thing
      // exchanged (payloads never shuffle), and fanOut is a provable
      // no-op once the corpus scan has native parallelism.
      val gifs = graft.operators.ScaleOps.fanOut(
          t.documents.select(col("doc_id"))).as[Long]
        .mapPartitions { ids =>
          javax.imageio.ImageIO.setUseCache(false)
          ids.map { id =>
            (id, graft.operators.MultimodalOps.encodeGrayGifFrames(7, 5,
              frames = 2 + (id % 4).toInt,
              pixel = (x, y, f) => ((id % 199).toInt + x * 20 + y * 10 + f * 40) % 256))
          }
        }.toDF("doc_id", "gif")
      graft.operators.MultimodalOps.frameSummary(gifs, "gif", "doc_id")
        .orderBy("doc_id")
    },

    // Perceptual AUDIO near-dup: 96 real WAVs in 12 groups — each group one
    // md5-derived 65-span level envelope, member m gain-scaling every sample
    // by (m+1) (exact integer scaling preserves span-energy ORDER, so the
    // envelope signature is gain-invariant by construction) and member 7
    // additionally bumping span 0's level by +1 (a genuine near-miss,
    // Hamming ≤ 1). The engine ENCODES, really DECODES, fingerprints with
    // the windowed-energy-envelope hash, and pairs via the same pigeonhole
    // banding as images; the oracle recomputes the signature closed-form
    // from the level ordering and mirrors the band join in SQL.
    "q_audio_neardup" -> { t =>
      val s = t.spark
      import s.implicits._
      val wavs = t.documents.select(col("doc_id")).where(col("doc_id") < 96).as[Long]
        .mapPartitions { ids =>
          val md = java.security.MessageDigest.getInstance("MD5")
          ids.map { id =>
            val g = id % 12
            val m = (id / 12).toInt
            // 260 samples = 4 per span: span w = i*65/260 = i/4
            val samples = Array.tabulate(260) { i =>
              val w = i / 4
              val lvl = 1 + (md.digest(s"a:$g:$w".getBytes("UTF-8"))(0) & 0xFF) +
                (if (m == 7 && w == 0) 1 else 0)
              lvl * (m + 1)
            }
            (id, graft.operators.MultimodalOps.encodePcmWav(8000, 1, samples))
          }
        }.toDF("doc_id", "wav")
      val fps = graft.operators.MultimodalOps.audioFingerprints(wavs, "wav", "doc_id")
        .select(col("doc_id").as("id"), col("afp").as("h"))
      graft.operators.MultimodalOps.hammingPairs(fps, maxHamming = 3)
        .orderBy("ida", "idb")
    },

    // TRIM/SHIFT-robust audio near-dup (the transform q_audio_neardup's
    // relative-span envelope dies on): 96 real WAVs in 12 groups — group g
    // is one md5-derived 80-window level sequence; member m gain-scales by
    // (m+1) AND prepends (m·7 % 13) samples of leading silence — an
    // ARBITRARY offset, deliberately not a window multiple — and member 7
    // additionally bumps window 5's level (near-miss). The engine ENCODES,
    // really DECODES, strips silence (so windowing anchors at the content
    // onset — exact invariance to any-offset silence trims), fingerprints
    // with overlapping window-sign shingles (absolute 4-sample windows,
    // 16-bit shingles) and pairs by shingle-set containment ≥ 0.5 —
    // trimmed+gain-scaled copies share the whole content-shingle set while
    // unrelated clips share ~0. The oracle re-derives the STRIPPED
    // windows, signs, shingles and the containment join in SQL: silence
    // never appears in it at all, which IS the invariance proof.
    "q_audio_neardup_shift" -> { t =>
      val s = t.spark
      import s.implicits._
      val wavs = t.documents.select(col("doc_id")).where(col("doc_id") < 96).as[Long]
        .mapPartitions { ids =>
          val md = java.security.MessageDigest.getInstance("MD5")
          ids.map { id =>
            val g = id % 12
            val m = (id / 12).toInt
            val silence = Array.fill(m * 7 % 13)(0)
            val content = Array.tabulate(320) { i =>
              val w = i / 4
              val lvl = 1 + (md.digest(s"s:$g:$w".getBytes("UTF-8"))(0) & 0xFF) +
                (if (m == 7 && w == 5) 1 else 0)
              lvl * (m + 1)
            }
            (id, graft.operators.MultimodalOps.encodePcmWav(8000, 1, silence ++ content))
          }
        }.toDF("doc_id", "wav")
      val fps = graft.operators.MultimodalOps.audioShingleFingerprints(
        wavs, "wav", "doc_id", windowSamples = 4, shingleBits = 16)
      graft.operators.MultimodalOps.shingleContainmentPairs(fps, minContainment = 0.5,
          idCol = "doc_id")
        .orderBy("ida", "idb")
    },

    // ANIMATION near-dup over per-frame perceptual hashes: 96 real animated
    // GIFs in 12 groups (2-4 frames each, md5-derived pixels; member m bumps
    // one pixel by +1 luma in EVERY frame — the image-plant perturbation,
    // per frame). One single-reader walk hashes every frame; near-dups must
    // match on frame COUNT and every aligned frame's dHash within Hamming 3
    // (frame alignment rides the band join key). The oracle recomputes every
    // frame's dHash closed-form and re-derives the full-series match in SQL.
    "q_gif_neardup" -> { t =>
      val s = t.spark
      import s.implicits._
      val gifs = t.documents.select(col("doc_id")).where(col("doc_id") < 96).as[Long]
        .mapPartitions { ids =>
          javax.imageio.ImageIO.setUseCache(false)
          val md = java.security.MessageDigest.getInstance("MD5")
          ids.map { id =>
            val g = id % 12
            val m = (id / 12).toInt
            (id, graft.operators.MultimodalOps.encodeGrayGifFrames(9, 8,
              frames = 2 + (g % 3).toInt,
              pixel = (x, y, f) => {
                val base = md.digest(s"v:$g:$f:$x:$y".getBytes("UTF-8"))(0) & 0xFF
                val bump = if (x == m % 9 && y == (m / 9) % 8) 1 else 0
                (base + bump) % 256
              }))
          }
        }.toDF("doc_id", "gif")
      val fh = graft.operators.MultimodalOps.frameHashes(gifs, "gif", "doc_id")
      graft.operators.MultimodalOps.animationNearDup(fh, maxHamming = 3)
        .orderBy("ida", "idb")
    },

    // Frame-RATE-robust animation near-dup (the transform q_gif_neardup's
    // aligned-index join dies on): 96 real animated GIFs in 12 groups —
    // group g is one md5-derived 8-frame animation; odd members re-encode
    // at HALF the frame rate (every 2nd source frame, 4 frames), member 7
    // bumps one pixel per frame (near-miss). Each series normalizes to 4
    // keyframe SLOTS at relative positions (slot q → frame ⌊q·nf/4⌋ —
    // exactly the same source frame for both rates since 4 | 8), then the
    // slot-aligned band join matches every slot within Hamming 3 — so
    // rate-halved copies pair with full-rate originals, which the
    // equal-frame-count q_gif_neardup can never emit. Oracle recomputes
    // the 4 sampled frames' dHashes closed-form and mirrors the rollup.
    "q_gif_neardup_rate" -> { t =>
      val s = t.spark
      import s.implicits._
      val gifs = t.documents.select(col("doc_id")).where(col("doc_id") < 96).as[Long]
        .mapPartitions { ids =>
          javax.imageio.ImageIO.setUseCache(false)
          val md = java.security.MessageDigest.getInstance("MD5")
          ids.map { id =>
            val g = id % 12
            val m = (id / 12).toInt
            val d = 1 + m % 2 // frame-decimation factor: odd members at half rate
            (id, graft.operators.MultimodalOps.encodeGrayGifFrames(9, 8,
              frames = 8 / d,
              pixel = (x, y, f) => {
                // pixels keyed on the SOURCE frame index f·d, so the
                // decimated copy shows the same content where it samples
                val base = md.digest(s"r:$g:${f * d}:$x:$y".getBytes("UTF-8"))(0) & 0xFF
                val bump = if (m == 7 && x == 2 && y == 3) 1 else 0
                (base + bump) % 256
              }))
          }
        }.toDF("doc_id", "gif")
      val fh = graft.operators.MultimodalOps.frameHashes(gifs, "gif", "doc_id")
      graft.operators.MultimodalOps.animationNearDupNormalized(fh, slots = 4,
          maxHamming = 3)
        .orderBy("ida", "idb")
    },

    // Tokenizer-coverage diagnostic: OOV rate per document against the
    // corpus's own top-50 token vocabulary (ties lexicographic — a total
    // order, so the vocab is a deterministic constant the oracle
    // recomputes). Vocab is bounded model metadata and broadcasts.
    "q_oov_rate" -> { t =>
      TextOps.oovRate(t.documents, vocabSize = 50).orderBy("doc_id")
    },

    // Marginal-contribution curve: fraction of each doc's distinct 3-grams
    // first seen in this doc (lowest doc_id wins). Gram-keyed min-id index
    // + join back — both shuffles on the gram key, nothing broadcast.
    "q_ngram_novelty" -> { t =>
      TextOps.ngramNovelty(t.documents, n = 3).orderBy("doc_id")
    },

    // Corpus-diversity health metric: least-squares slope of log(freq) on
    // log(rank) over the top-100 tokens (Zipf exponent). Rank table is
    // bounded top-k; the regression runs over k rows only.
    "q_zipf_slope" -> { t =>
      TextOps.zipfSlope(t.documents, k = 100)
    },

    // Flesch reading-ease + FK grade per document: exact integer
    // word/sentence/syllable counts (vowel-group heuristic, per-word ≥1
    // clamp), each score one fixed expression — a pure codegen'd
    // projection, no shuffle.
    "q_readability" -> { t =>
      TextOps.readability(t.documents).orderBy("doc_id")
    },

    // Corpus concentration over provenance: Gini + HHI + dominant-source
    // share from the |sources|-row rollup; every term an exact integer
    // sum, one division each.
    "q_source_gini" -> { t =>
      TextOps.sourceConcentration(t.documents)
    },

    // Dataset card: the one-row corpus health summary a release ships with
    // (datasheets-for-datasets tier) — volume, provenance/lang diversity,
    // exact-dup rate, short-doc rate, dominant language share, length
    // quantiles. ONE corpus scan carries every distinct aggregate (Expand
    // multi-distinct plan) + one vocabulary-free lang rollup; the 1-row
    // summaries meet in broadcast crossJoins. Ratios are single divisions
    // of exact integers (deterministic); the length quantiles use the
    // exact `percentile` aggregate — its value-buffering merge is safe
    // here only because n_chars has bounded cardinality; swap for
    // QuantileOps.exactQuantiles when the value column is unbounded.
    "q_dataset_card" -> { t =>
      import graft.functions.TextFunctions.tokens
      val d = t.documents
      val base = d.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(size(tokens(col("text"))).cast("long")).as("total_tokens"),
        sum(when(size(tokens(col("text"))) < lit(20), 1L).otherwise(0L)).as("n_short"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup"),
        percentile(col("n_chars"), lit(0.5)).as("chars_p50"),
        percentile(col("n_chars"), lit(0.95)).as("chars_p95"))
      val topLang = d.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang")).limit(1)
        .select(col("lang").as("top_lang"), col("c").as("top_lang_docs"))
      base.crossJoin(broadcast(topLang))
        .select(
          col("n_docs"), col("n_sources"), col("n_langs"), col("total_tokens"),
          round(col("total_tokens") / col("n_docs"), 6).as("mean_doc_tokens"),
          round(col("n_dup") / col("n_docs"), 6).as("dup_rate"),
          round(col("n_short") / col("n_docs"), 6).as("short_rate"),
          col("top_lang"),
          round(col("top_lang_docs") / col("n_docs"), 6).as("top_lang_share"),
          round(col("chars_p50"), 6).as("chars_p50"),
          round(col("chars_p95"), 6).as("chars_p95"))
    }
  )

  /** Signed-64-bit power-of-two literal for generated hash-packing oracles:
    * bit 63 is the sign bit, so its weight is the Long.MinValue literal and
    * the generated sum reproduces Java's two's-complement packing. */
  private def bitPow(k: Int): String =
    if (k == 63) "(-9223372036854775807 - 1)" else (1L << k).toString

  /** q_image_decode oracle, generated: the 9×8 pixel raster as one column
    * per cell (closed form of the pattern the Spark side encodes into a
    * real PNG), the 8×8 area-average downsample (column 7 averages source
    * columns 7+8 — the only multi-pixel box for 9→8), integer mean, and
    * the aHash/dHash bit packings as 64-term CASE sums. The engine's path
    * runs ImageIO encode→decode→luma→downsample→pack over real bytes; any
    * divergence anywhere in that chain mismatches these closed forms. */
  private val imageDecodeOracle: String = {
    def c(x: Int, y: Int) = s"c${x}_$y"
    val pxCols = (for (y <- 0 until 8; x <- 0 until 9) yield
      s"((doc_id % 256) * 31 + ${7 * x * x + 13 * y}) % 256 AS ${c(x, y)}").mkString(", ")
    def d(i: Int, y: Int) = if (i < 7) c(i, y) else s"((${c(7, y)} + ${c(8, y)}) // 2)"
    val dsCols = (for (y <- 0 until 8; i <- 0 until 8) yield
      s"${d(i, y)} AS d${i}_$y").mkString(", ")
    val meanExpr = "(" +
      (for (y <- 0 until 8; i <- 0 until 8) yield s"d${i}_$y").mkString(" + ") + ") // 64"
    val ahash = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN d${x}_$y > mean THEN ${bitPow(y * 8 + x)} ELSE 0 END").mkString(" + ")
    val dhash = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN ${c(x + 1, y)} > ${c(x, y)} THEN ${bitPow(y * 8 + x)} ELSE 0 END")
      .mkString(" + ")
    s"WITH px AS (SELECT doc_id, $pxCols FROM documents), " +
      s"ds AS (SELECT doc_id, $dsCols, ($dhash) AS dhash FROM px), " +
      s"mn AS (SELECT *, $meanExpr AS mean FROM ds) " +
      "SELECT doc_id, 9 AS width, 8 AS height, " +
      s"($ahash) AS ahash, dhash FROM mn ORDER BY doc_id"
  }

  /** The ONE engine-side construction of the planted near-dup images
    * (shared by q_image_neardup and q_image_dedup_groups, exactly as
    * [[imageHashCte]] is the one oracle-side pixel formula — the two must
    * stay in lockstep, so neither side may fork): 96 real PNGs in 12
    * md5-pattern groups, member m bumping one pixel by +1 luma; encoded,
    * REALLY decoded, and reduced to (id, dhash). */
  private def plantedNeardupHashes(t: graft.Tables): org.apache.spark.sql.DataFrame = {
    val s = t.spark
    import s.implicits._
    val imgs = t.documents.select(col("doc_id")).where(col("doc_id") < 96).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { id =>
          val g = id % 12
          val m = (id / 12).toInt
          (id, graft.operators.MultimodalOps.encodeGrayPng(9, 8, (x, y) => {
            val base = md.digest(s"g:$g:$x:$y".getBytes("UTF-8"))(0) & 0xFF
            val bump = if (x == m % 9 && y == (m / 9) % 8) 1 else 0
            (base + bump) % 256
          }))
        }
      }.toDF("doc_id", "png")
    graft.operators.MultimodalOps.imageFeatures(imgs, "png", "doc_id")
      .select(col("doc_id").as("id"), col("dhash").as("h"))
  }

  /** Shared CTE prefix for the planted-image oracles: closed-form
    * md5-derived pixels (matching the bytes the Spark side encodes),
    * dHash packing, and the band table for the pigeonhole join. */
  private def imageHashCte(recursive: Boolean): String = {
    def p(x: Int, y: Int) =
      s"(('0x' || substr(md5('g:' || (doc_id % 12) || ':$x:$y'), 1, 2))::UBIGINT + " +
        s"CASE WHEN (doc_id // 12) % 9 = $x AND ((doc_id // 12) // 9) % 8 = $y " +
        "THEN 1 ELSE 0 END) % 256"
    val pxCols = (for (y <- 0 until 8; x <- 0 until 9) yield
      s"${p(x, y)} AS c${x}_$y").mkString(", ")
    val dhash = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN c${x + 1}_$y > c${x}_$y THEN ${bitPow(y * 8 + x)} ELSE 0 END")
      .mkString(" + ")
    s"WITH ${if (recursive) "RECURSIVE " else ""}px AS " +
      s"(SELECT doc_id, $pxCols FROM documents WHERE doc_id < 96), " +
      s"h AS (SELECT doc_id AS id, ($dhash) AS h FROM px), " +
      "b AS (SELECT id, h, band, (h >> (band * 16)) & 65535 AS bv FROM h " +
      "CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) bands)"
  }

  /** q_image_neardup oracle: the SAME band-bucket candidate join +
    * full-popcount verify the engine runs — re-derived in SQL, so the
    * banding's exactness (pigeonhole at Hamming ≤ 3 over 4×16-bit bands)
    * is itself cross-checked. */
  private val imageNeardupOracle: String =
    imageHashCte(recursive = false) + " " +
      "SELECT DISTINCT a.id AS ida, c.id AS idb, bit_count(xor(a.h, c.h)) AS hamming " +
      "FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv AND a.id < c.id " +
      "WHERE bit_count(xor(a.h, c.h)) <= 3 ORDER BY ida, idb"

  /** q_image_dedup_groups oracle: transitive closure over the verified
    * near-dup pairs (recursive CTE — DuckDB's independent reachability),
    * min-id cluster labels, singletons self-labelled. */
  private val imageDedupGroupsOracle: String =
    imageHashCte(recursive = true) + """,
      |pr AS (
      |  SELECT DISTINCT a.id AS ida, c.id AS idb
      |  FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv AND a.id < c.id
      |  WHERE bit_count(xor(a.h, c.h)) <= 3),
      |edges AS (SELECT ida AS src, idb AS dst FROM pr
      |  UNION SELECT idb, ida FROM pr),
      |closure AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT c2.id, e.dst AS r FROM closure c2 JOIN edges e ON e.src = c2.r),
      |lab AS (SELECT id, min(r) AS cluster FROM closure GROUP BY id)
      |SELECT h.id AS doc_id, coalesce(lab.cluster, h.id) AS cluster,
      |  coalesce(lab.cluster, h.id) = h.id AS is_keeper
      |FROM h LEFT JOIN lab ON lab.id = h.id
      |ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " ")

  /** q_audio_neardup oracle: the engine's windowed-energy-envelope bit k
    * compares span energies E(k+1) > E(k); with 4 samples per span at level
    * lvl·(m+1) that is 4·lvl(k+1)²·(m+1)² > 4·lvl(k)²·(m+1)² ⟺
    * lvl(k+1) > lvl(k) (positive levels) — so the closed form reduces to
    * the md5 level ordering, gain-invariance PROVEN by the reduction
    * itself. Band join + popcount mirror [[imageNeardupOracle]]. */
  private val audioNeardupOracle: String = {
    def lvl(w: Int) =
      s"(('0x' || substr(md5('a:' || (doc_id % 12) || ':$w'), 1, 2))::UBIGINT + 1" +
        (if (w == 0) " + CASE WHEN doc_id // 12 = 7 THEN 1 ELSE 0 END)" else ")")
    val lvlCols = (0 to 64).map(w => s"${lvl(w)} AS l$w").mkString(", ")
    val h = (0 until 64).map(k =>
      s"CASE WHEN l${k + 1} > l$k THEN ${bitPow(k)} ELSE 0 END").mkString(" + ")
    s"WITH lv AS (SELECT doc_id, $lvlCols FROM documents WHERE doc_id < 96), " +
      s"h AS (SELECT doc_id AS id, ($h) AS h FROM lv), " +
      "b AS (SELECT id, h, band, (h >> (band * 16)) & 65535 AS bv FROM h " +
      "CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) bands) " +
      "SELECT DISTINCT a.id AS ida, c.id AS idb, bit_count(xor(a.h, c.h)) AS hamming " +
      "FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv AND a.id < c.id " +
      "WHERE bit_count(xor(a.h, c.h)) <= 3 ORDER BY ida, idb"
  }

  /** q_audio_neardup_shift oracle: the engine strips silence before
    * windowing, so the planted silence prefix NEVER APPEARS here — the
    * oracle's windows are the bare 80 content windows for every member,
    * which is itself the proof of any-offset trim invariance. Window w's
    * value is closed-form lvl·gain, E(w) = 4·val(w)², and val ≥ 0 reduces
    * the energy-sign to val(w+1) > val(w) (gain invariance BY the
    * reduction); signs, 16-bit shingles (one self-join packing 16
    * consecutive signs), distinct sets, and the containment join all
    * re-derive in SQL. */
  private val audioNeardupShiftOracle: String =
    """WITH mm AS (SELECT doc_id, doc_id % 12 AS g, doc_id // 12 AS m
      |  FROM documents WHERE doc_id < 96),
      |win AS (SELECT doc_id, g, m, unnest(range(0, 80)) AS w FROM mm),
      |lv AS (SELECT doc_id, w,
      |    (('0x' || substr(md5('s:' || g || ':' || w), 1, 2))::UBIGINT::BIGINT
      |      + 1 + CASE WHEN m = 7 AND w = 5 THEN 1 ELSE 0 END) * (m + 1) AS val
      |  FROM win),
      |sg AS (SELECT a.doc_id, a.w AS j,
      |    CASE WHEN b.val > a.val THEN 1 ELSE 0 END AS s
      |  FROM lv a JOIN lv b ON b.doc_id = a.doc_id AND b.w = a.w + 1),
      |sh AS (SELECT a.doc_id, a.j, sum(b.s * (1::BIGINT << (b.j - a.j))) AS v
      |  FROM sg a JOIN sg b ON b.doc_id = a.doc_id
      |    AND b.j >= a.j AND b.j <= a.j + 15
      |  GROUP BY a.doc_id, a.j HAVING count(*) = 16),
      |ds AS (SELECT DISTINCT doc_id, v FROM sh),
      |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY doc_id),
      |pr AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
      |    CAST(count(*) AS BIGINT) AS n_common
      |  FROM ds a JOIN ds b ON a.v = b.v AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT ida, idb, n_common,
      |  round(CAST(n_common AS DOUBLE) / least(na.n, nb.n), 6) AS containment
      |FROM pr JOIN n na ON na.doc_id = ida JOIN n nb ON nb.doc_id = idb
      |WHERE CAST(n_common AS DOUBLE) / least(na.n, nb.n) >= 0.5
      |ORDER BY ida, idb""".stripMargin.replaceAll("\\s+", " ")

  /** q_gif_neardup_rate oracle: every member samples the SAME four source
    * frames (slot q → source frame 2q, for both full- and half-rate
    * members — the 4 | 8 invariance the engine relies on), so the oracle
    * recomputes those frames' dHashes closed-form, mirrors the slot-aligned
    * band join, and requires all 4 slots matched; frame counts are derived
    * from the member's decimation factor, reported but not required equal. */
  private val gifNeardupRateOracle: String = {
    def p(x: Int, y: Int) =
      s"(('0x' || substr(md5('r:' || (doc_id % 12) || ':' || (2 * slot) || ':$x:$y'), 1, 2))::UBIGINT + " +
        s"CASE WHEN doc_id // 12 = 7 AND $x = 2 AND $y = 3 THEN 1 ELSE 0 END) % 256"
    val pxCols = (for (y <- 0 until 8; x <- 0 until 9) yield
      s"${p(x, y)} AS c${x}_$y").mkString(", ")
    val dhash = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN c${x + 1}_$y > c${x}_$y THEN ${bitPow(y * 8 + x)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH sl AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS slot
       |  FROM documents WHERE doc_id < 96),
       |px AS (SELECT doc_id, slot, $pxCols FROM sl),
       |h AS (SELECT doc_id AS id, slot, ($dhash) AS h FROM px),
       |b AS (SELECT id, slot, h, band, (h >> (band * 16)) & 65535 AS bv FROM h
       |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) bands),
       |pr AS (SELECT DISTINCT a.id AS ida, c.id AS idb, a.slot,
       |    bit_count(xor(a.h, c.h)) AS hd
       |  FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv
       |    AND a.slot = c.slot AND a.id < c.id
       |  WHERE bit_count(xor(a.h, c.h)) <= 3),
       |agg AS (SELECT ida, idb, count(*) AS n_matched, max(hd) AS max_hamming
       |  FROM pr GROUP BY ida, idb),
       |nf AS (SELECT doc_id,
       |    CAST(CASE WHEN (doc_id // 12) % 2 = 1 THEN 4 ELSE 8 END AS BIGINT) AS nf
       |  FROM documents WHERE doc_id < 96)
       |SELECT agg.ida, agg.idb, na.nf AS n_frames_a, nb.nf AS n_frames_b,
       |  agg.max_hamming
       |FROM agg JOIN nf na ON na.doc_id = agg.ida JOIN nf nb ON nb.doc_id = agg.idb
       |WHERE agg.n_matched = 4 ORDER BY ida, idb""".stripMargin
      .replaceAll("\\s+", " ")
  }

  /** q_gif_neardup oracle: per-(doc, frame) closed-form pixels → dHash →
    * frame-aligned band join → full-series rollup requiring every frame
    * matched on BOTH sides' frame counts — the SQL re-derivation of
    * [[MultimodalOps.animationNearDup]] over independently recomputed
    * hashes. */
  private val gifNeardupOracle: String = {
    def p(x: Int, y: Int) =
      s"(('0x' || substr(md5('v:' || (doc_id % 12) || ':' || f || ':$x:$y'), 1, 2))::UBIGINT + " +
        s"CASE WHEN (doc_id // 12) % 9 = $x AND ((doc_id // 12) // 9) % 8 = $y " +
        "THEN 1 ELSE 0 END) % 256"
    val pxCols = (for (y <- 0 until 8; x <- 0 until 9) yield
      s"${p(x, y)} AS c${x}_$y").mkString(", ")
    val dhash = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN c${x + 1}_$y > c${x}_$y THEN ${bitPow(y * 8 + x)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH fr AS (SELECT doc_id, unnest(range(0, 2 + (doc_id % 12) % 3)) AS f
       |  FROM documents WHERE doc_id < 96),
       |px AS (SELECT doc_id, f, $pxCols FROM fr),
       |h AS (SELECT doc_id AS id, f, ($dhash) AS h FROM px),
       |b AS (SELECT id, f, h, band, (h >> (band * 16)) & 65535 AS bv FROM h
       |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) bands),
       |pr AS (SELECT DISTINCT a.id AS ida, c.id AS idb, a.f,
       |    bit_count(xor(a.h, c.h)) AS hd
       |  FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv
       |    AND a.f = c.f AND a.id < c.id
       |  WHERE bit_count(xor(a.h, c.h)) <= 3),
       |n AS (SELECT id, count(*) AS nf FROM h GROUP BY id),
       |agg AS (SELECT ida, idb, count(*) AS n_matched, max(hd) AS max_hamming
       |  FROM pr GROUP BY ida, idb)
       |SELECT agg.ida, agg.idb, na.nf AS n_frames, agg.max_hamming
       |FROM agg JOIN n na ON na.id = agg.ida JOIN n nb ON nb.id = agg.idb
       |WHERE agg.n_matched = na.nf AND agg.n_matched = nb.nf
       |ORDER BY ida, idb""".stripMargin.replaceAll("\\s+", " ")
  }

  /** Deterministic container envelope for [[MultimodalOps.sniffContainer]]'s
    * declared query: doc_id % 6 selects PNG (with a genuine IHDR carrying
    * width 16 + id%1024, height 16 + 3·id%1024), JPEG, GIF, RIFF, MP4, or
    * bare text. Mirrored literally by the DuckDB oracle. */
  private def syntheticContainer(id: org.apache.spark.sql.Column,
                                 text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def be4(v: org.apache.spark.sql.Column) = unhex(lpad(hex(v), 8, "0"))
    val body = text.cast("binary")
    val png = concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be4(lit(16) + id % 1024), be4(lit(16) + (id * 3) % 1024),
      unhex(lit("0806000000")), body)
    when(id % 6 === 0, png)
      .when(id % 6 === 1, concat(unhex(lit("FFD8FFE0")), body))
      .when(id % 6 === 2, concat(lit("GIF89a").cast("binary"), body))
      .when(id % 6 === 3, concat(lit("RIFF").cast("binary"), body))
      .when(id % 6 === 4, concat(unhex(lit("00000020")), lit("ftypisom").cast("binary"), body))
      .otherwise(body)
  }

  /** The BPE-applied-text SQL expression, generated from the same bpeMerges
    * artifact the engine folds into its plan: char symbolization via RE2
    * ('g' flag — DuckDB replaces first-only by default), then the merge
    * chain as nested literal replace() calls. Shared by the q_bpe_apply and
    * q_tokenizer_fertility oracles so applier and metric cannot drift. */
  private val bpeCleanSql: String = {
    // SEP-wrapped words + boundary-anchored patterns, mirroring the engine
    val base =
      "regexp_replace(regexp_replace(text, '(\\S)', '\\1·', 'g'), '(^| )', '\\1·', 'g')"
    val merged = bpeMerges.foldLeft(base) { case (acc, (a, b)) =>
      s"replace($acc, '·${a}·${b}·', '·${a}${b}·')"
    }
    s"regexp_replace(regexp_replace($merged, '·( |$$)', '\\1', 'g'), '(^| )·', '\\1', 'g')"
  }

  private val bpeApplyOracle: String =
    s"SELECT doc_id, bpe_text, CAST(len(string_split_regex(bpe_text, '[ ·]')) AS BIGINT)" +
      s" AS n_symbols FROM (SELECT doc_id, $bpeCleanSql AS bpe_text FROM documents)" +
      " ORDER BY doc_id"

  /** q_tokenizer_fertility oracle: per-doc symbol/word/byte counts from the
    * shared [[bpeCleanSql]] expression, rolled up per language; each ratio
    * is one division of exact BIGINT sums. */
  private val tokenizerFertilityOracle: String =
    s"""WITH d AS (SELECT lang,
       |    CAST(len(string_split_regex($bpeCleanSql, '[ ·]')) AS BIGINT) AS n_symbols,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  round(CAST(sum(n_symbols) AS DOUBLE) / sum(n_words), 6) AS fertility,
       |  round(CAST(sum(n_bytes) AS DOUBLE) / sum(n_symbols), 6) AS bytes_per_symbol
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\\s+", " ")

  val oracles: Map[String, String] = Map(
    // Independent evaluation strategy: one `contains` branch per phrase
    // (exactly the naive formulation the Aho–Corasick kernel replaces),
    // then a sorted string_agg per doc; zero-hit docs ride via LEFT JOIN.
    "q_keyword_spot" -> {
      val branches = keywordPhrases.sorted.map(p =>
        s"SELECT doc_id, '$p' AS hit FROM documents WHERE contains(text, '$p')")
        .mkString(" UNION ALL ")
      s"WITH hits AS ($branches), " +
        "agg AS (SELECT doc_id, string_agg(hit, ',' ORDER BY hit) AS hits, " +
        "count(*) AS n_hits FROM hits GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.hits, '') AS hits, " +
        "coalesce(a.n_hits, 0) AS n_hits " +
        "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"
    },

    // Independent evaluation strategy: the full position × phrase grid,
    // one substr comparison per cell. DuckDB's `i` is a CHARACTER index
    // while the engine reports BYTE offsets — identical on this corpus
    // (ASCII-only); the byte semantics themselves are pinned on multibyte
    // text in KeywordScanSpec.
    "q_keyword_spans" -> {
      val vals = keywordSpanPhrases.sorted.map(p => s"('$p')").mkString(", ")
      "WITH pos AS (SELECT doc_id, text, " +
        "unnest(range(1, length(text) + 1)) AS i FROM documents), " +
        s"pats(p) AS (VALUES $vals) " +
        "SELECT doc_id, i AS pos, p AS phrase FROM pos CROSS JOIN pats " +
        "WHERE substr(text, i, length(p)) = p ORDER BY doc_id, pos, phrase"
    },

    // Independent evaluation strategy: positional coverage join, then a
    // per-character CASE rebuild of the masked string. The rebuild LEFT
    // JOINs from `documents` so a (hypothetical) empty-text doc still
    // emits its row, as the engine does. DuckDB's positions are CHARACTER
    // indices while the engine masks BYTES — identical on this corpus
    // (ASCII-only, asserted by the multibyte pin in KeywordScanSpec being
    // the place where byte semantics are exercised instead).
    "q_keyword_redact" -> {
      val vals = keywordDenyPhrases.sorted.map(p => s"('$p')").mkString(", ")
      "WITH pos AS (SELECT doc_id, text, " +
        "unnest(range(1, length(text) + 1)) AS i FROM documents), " +
        s"pats(p) AS (VALUES $vals), " +
        "occ AS (SELECT doc_id, i AS s, i + length(p) - 1 AS e " +
        "FROM pos CROSS JOIN pats WHERE substr(text, i, length(p)) = p), " +
        "cov AS (SELECT DISTINCT pos.doc_id, pos.i " +
        "FROM pos JOIN occ ON pos.doc_id = occ.doc_id AND pos.i BETWEEN occ.s AND occ.e), " +
        "built AS (SELECT pos.doc_id, string_agg(" +
        "CASE WHEN cov.i IS NOT NULL THEN '*' ELSE substr(pos.text, pos.i, 1) END, " +
        "'' ORDER BY pos.i) AS masked " +
        "FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.i = cov.i " +
        "GROUP BY pos.doc_id) " +
        "SELECT d.doc_id, coalesce(b.masked, d.text) AS masked " +
        "FROM documents d LEFT JOIN built b ON d.doc_id = b.doc_id " +
        "ORDER BY d.doc_id"
    },

    // Independent evaluation strategy: an OR of per-phrase `contains`.
    "q_keyword_filter" -> {
      val anyHit = keywordDenyPhrases.sorted
        .map(p => s"contains(text, '$p')").mkString(" OR ")
      s"SELECT doc_id, n_chars FROM documents WHERE NOT ($anyHit) ORDER BY doc_id"
    },

    "q_bpe_apply" -> bpeApplyOracle,
    "q_text_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\\s+", " "),

    "q_text_dedup_near" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ida, idb,
        |  round(shared * 1.0 / (na.n + nb.n - shared), 6) AS jaccard
        |FROM cand
        |JOIN sz na ON na.doc_id = ida
        |JOIN sz nb ON nb.doc_id = idb
        |WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    // Both signals rebuilt hash-free, then FULL JOINed on the pair key.
    "q_dedup_agreement" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |lex AS (
        |  SELECT ida, idb, round(shared * 1.0 / (na.n + nb.n - shared), 6) AS jaccard
        |  FROM cand
        |  JOIN sz na ON na.doc_id = ida
        |  JOIN sz nb ON nb.doc_id = idb
        |  WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5),
        |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |      FROM embeddings),
        |nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |sem AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |    round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos_sim
        |  FROM nv a JOIN nv b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4)
        |SELECT coalesce(lex.ida, sem.ida) AS ida, coalesce(lex.idb, sem.idb) AS idb,
        |  lex.jaccard, sem.cos_sim,
        |  lex.ida IS NOT NULL AS lexical, sem.ida IS NOT NULL AS semantic
        |FROM lex FULL JOIN sem ON lex.ida = sem.ida AND lex.idb = sem.idb
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    "q_containment_dedup" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ida, idb,
        |  round(shared * 1.0 / least(na.n, nb.n), 6) AS containment
        |FROM cand
        |JOIN sz na ON na.doc_id = ida
        |JOIN sz nb ON nb.doc_id = idb
        |WHERE shared * 1.0 / least(na.n, nb.n) >= 0.8
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    "q_winnow" ->
      (winnowCte +
        " SELECT doc_id, unnest(fps) AS fp FROM fps ORDER BY doc_id, fp"),

    "q_winnow_pairs" ->
      (winnowCte + """,
        |wex AS (SELECT doc_id, unnest(fps) AS fp FROM fps)
        |SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared_fps
        |FROM wex a JOIN wex b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    // The LSH/blocked candidate generators verify candidates with the EXACT
    // Jaccard, so with full candidate recall (pinned in ScalaTest; miss
    // probability ~1e-10 at the decision boundary and the hash families are
    // deterministic) their output is the true pair set — the oracle is the
    // same hash-free exact-Jaccard SQL, at each query's threshold.
    "q_minhash_lsh" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ida, idb,
        |  round(shared * 1.0 / (na.n + nb.n - shared), 6) AS jaccard
        |FROM cand
        |JOIN sz na ON na.doc_id = ida
        |JOIN sz nb ON nb.doc_id = idb
        |WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.7
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    "q_simhash" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ida, idb,
        |  round(shared * 1.0 / (na.n + nb.n - shared), 6) AS jaccard
        |FROM cand
        |JOIN sz na ON na.doc_id = ida
        |JOIN sz nb ON nb.doc_id = idb
        |WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5
        |ORDER BY ida, idb""".stripMargin).replaceAll("\\s+", " "),

    // bigram keys travel as the joined "w1 w2" string (tokens are
    // space-split, so the concatenation is collision-free); arithmetic is
    // (c12+1)/(c1+V) in double on both engines, averaged per doc.
    "q_bigram_logprob" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
        |  FROM tk WHERE len(t) >= 2),
        |pw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM p),
        |c12 AS (SELECT bg, count(*) AS c12 FROM pw GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pw GROUP BY w1),
        |vv AS (SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents))
        |SELECT pw.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln((c12.c12 + 1) * 1.0 / (c1.c1 + vv.v))), 6) AS avg_logprob
        |FROM pw JOIN c12 USING (bg) JOIN c1 USING (w1) CROSS JOIN vv
        |GROUP BY pw.doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_dedup_incremental" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT b.doc_id AS new_id, a.doc_id AS old_id, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2)
        |SELECT new_id, old_id,
        |  round(shared * 1.0 / (ni.n + ne.n - shared), 6) AS jaccard
        |FROM cand
        |JOIN sz ni ON ni.doc_id = new_id
        |JOIN sz ne ON ne.doc_id = old_id
        |WHERE shared * 1.0 / (ni.n + ne.n - shared) >= 0.5
        |ORDER BY new_id, old_id""".stripMargin).replaceAll("\\s+", " "),

    "q_containment_incr" ->
      (shingleCte + """,
        |cand AS (
        |  SELECT b.doc_id AS new_id, a.doc_id AS old_id, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2)
        |SELECT new_id, old_id,
        |  round(shared * 1.0 / least(ni.n, ne.n), 6) AS containment
        |FROM cand
        |JOIN sz ni ON ni.doc_id = new_id
        |JOIN sz ne ON ne.doc_id = old_id
        |WHERE shared * 1.0 / least(ni.n, ne.n) >= 0.8
        |ORDER BY new_id, old_id""".stripMargin).replaceAll("\\s+", " "),

    "q_unigram_logprob" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |cnt AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
        |tot AS (SELECT sum(cnt) AS total FROM cnt)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |round(sum(tf.tf * ln(cnt.cnt * 1.0 / tot.total)) / sum(tf.tf), 6) AS avg_logprob
        |FROM tf JOIN cnt ON tf.term = cnt.term CROSS JOIN tot
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_hybrid_retrieval" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok IN ('dup', 'join', 'spark') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl FROM documents),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents),
        |c AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |    (tf.tf * (1.2 + 1.0)) /
        |    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS contrib
        |  FROM tf JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |lexs AS (SELECT doc_id, round(sum(contrib), 6) AS score FROM c GROUP BY doc_id),
        |lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |  AS BIGINT) AS rank FROM lexs),
        |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |sems AS (SELECT x.vec_id AS doc_id,
        |  list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS sim
        |  FROM n q JOIN n x ON x.vec_id <> q.vec_id WHERE q.vec_id = 0),
        |semr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
        |  AS BIGINT) AS rank FROM sems),
        |u AS (
        |  SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS co
        |  FROM lexr WHERE rank <= 50
        |  UNION ALL
        |  SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS co
        |  FROM semr WHERE rank <= 50)
        |SELECT doc_id, round(sum(co), 6) AS rrf_score,
        |CAST(count(*) AS BIGINT) AS n_rankers
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin.replaceAll("\\s+", " "),

    "q_bpe_pairs" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT unnest(t[1:len(t)-1]) AS lhs, unnest(t[2:len(t)]) AS rhs
        |      FROM tok WHERE len(t) >= 2)
        |SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY 1, 2
        |ORDER BY cnt DESC, lhs, rhs LIMIT 20""".stripMargin.replaceAll("\\s+", " "),

    // NB DuckDB log() is base-10; ln() matches Spark's log().
    "q_collocations" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
        |ut AS (SELECT CAST(sum(c) AS DOUBLE) AS tt FROM uc),
        |pc AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab FROM
        |       (SELECT unnest(t[1:len(t)-1]) AS lhs, unnest(t[2:len(t)]) AS rhs
        |        FROM tok WHERE len(t) >= 2) GROUP BY 1, 2),
        |pt AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS bt FROM pc)
        |SELECT pc.lhs, pc.rhs, pc.c_ab,
        |  round(ln(((CAST(pc.c_ab AS DOUBLE) * tt) * tt) / ((bt * a.c) * b.c)), 6) AS pmi
        |FROM pc
        |JOIN uc a ON a.w = pc.lhs
        |JOIN uc b ON b.w = pc.rhs
        |CROSS JOIN ut CROSS JOIN pt
        |WHERE pc.c_ab >= 10
        |ORDER BY pmi DESC, pc.lhs, pc.rhs LIMIT 30""".stripMargin.replaceAll("\\s+", " "),

    "q_dup_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, [array_to_string(t[i:i+7], ' ') for i in range(1, len(t)-6)] AS ss
        |       FROM tok WHERE len(t) >= 8),
        |pos AS (SELECT doc_id, unnest(ss) AS g FROM sh),
        |cnt AS (SELECT g, count(*) AS cnt FROM pos GROUP BY g),
        |j AS (SELECT doc_id, CASE WHEN cnt > 1 THEN 1 ELSE 0 END AS dup
        |      FROM pos JOIN cnt USING (g))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_positions,
        |CAST(sum(dup) AS BIGINT) AS dup_positions,
        |round(CAST(sum(dup) AS BIGINT) * 1.0 / count(*), 6) AS dup_ratio
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, [array_to_string(t[i:i+7], ' ') for i in range(1, len(t)-6)] AS ss
        |       FROM tok WHERE len(t) >= 8),
        |ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
        |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 50 = 0)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM ex e JOIN bench b USING (s)
        |WHERE e.doc_id % 50 <> 0
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
        |round(avg(len(list_distinct(string_split(text, ' '))) * 1.0 /
        |          len(string_split(text, ' '))), 6) AS avg_ttr
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\\s+", " "),

    "q_bpe_train" -> bpeTrainOracleSql(rounds = 6),

    // eff_vocab = (Σc)²/Σc² (exact integers); entropy in the rearranged
    // form ln N − Σc·ln c / N so both engines sum the same per-type terms.
    "q_token_diversity" ->
      """WITH c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    sum(CAST(c AS HUGEINT) * c) AS scc,
        |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclnc
        |  FROM c)
        |SELECT n_tokens, n_distinct,
        |  round(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)
        |    / CAST(scc AS DOUBLE), 6) AS eff_vocab,
        |  round(ln(CAST(n_tokens AS DOUBLE)) - sclnc / CAST(n_tokens AS DOUBLE), 6)
        |    AS entropy_nats,
        |  round(exp(ln(CAST(n_tokens AS DOUBLE)) - sclnc / CAST(n_tokens AS DOUBLE)), 4)
        |    AS unigram_ppl
        |FROM a""".stripMargin.replaceAll("\\s+", " "),

    "q_lang_id" -> (langIdOracleBody + " ORDER BY doc_id"),

    // The gate consumes the SAME generated predictor body, then mirrors the
    // filterCascade rollup (first-failing-stage, cumulative remaining).
    "q_lang_gate" ->
      s"""WITH p AS ($langIdOracleBody),
         |st AS (SELECT CASE WHEN NOT (predicted_lang != 'other') THEN 1
         |  WHEN NOT (margin >= 2) THEN 2 ELSE 0 END AS stage FROM p),
         |c AS (SELECT stage, count(*) AS n FROM st GROUP BY stage),
         |t AS (SELECT count(*) AS total FROM st),
         |d AS (SELECT * FROM (VALUES (1, 'lang_known'), (2, 'min_margin'))
         |  AS v(stage, filter))
         |SELECT CAST(d.stage AS BIGINT) AS stage, d.filter,
         |  coalesce(c.n, 0) AS dropped,
         |  CAST(t.total - sum(coalesce(c.n, 0)) OVER (ORDER BY d.stage
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS remaining
         |FROM d LEFT JOIN c USING (stage) CROSS JOIN t
         |ORDER BY stage""".stripMargin.replaceAll("\\s+", " "),

    // The prediction subquery IS the q_lang_id oracle; shares divide
    // exact counts inside each actual-language partition (10-row matrix).
    "q_langid_confusion" ->
      s"""WITH p AS ($langIdOracleBody)
         |SELECT d.lang, p.predicted_lang, CAST(count(*) AS BIGINT) AS n,
         |  round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY d.lang), 6)
         |    AS class_share
         |FROM documents d JOIN p USING (doc_id)
         |GROUP BY d.lang, p.predicted_lang
         |ORDER BY d.lang, p.predicted_lang""".stripMargin.replaceAll("\\s+", " "),

    "q_quality_score" ->
      s"""SELECT doc_id, n_tokens, round(ttr, 6) AS ttr, round(stop_ratio, 6) AS stop_ratio,
         |round(least(n_tokens / 100.0, 1.0) * 0.3 + ttr * 0.4 + stop_ratio * 0.3, 6) AS quality
         |FROM (
         |  SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) AS ttr,
         |  len(list_filter(string_split(text, ' '), x -> list_contains($stop, x))) * 1.0 /
         |    len(string_split(text, ' ')) AS stop_ratio
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_token_count" ->
      """SELECT doc_id,
        |len(string_split(text, ' ')) AS ws_tokens,
        |len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token)
        |SELECT token, cnt, true AS in_sketch FROM cnt
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin.replaceAll("\\s+", " "),

    "q_cms_counts" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token)
        |SELECT token, cnt, true AS est_ge_true, true AS within_bound FROM cnt
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin.replaceAll("\\s+", " "),

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        |md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |octet_length(CAST(text AS BLOB)) AS byte_len,
        |md5(text) AS digest,
        |upper(hex(substr(text, 1, 8))) AS header_hex
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, score, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
        |  FROM s)
        |SELECT doc_id, rank, term, score FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin.replaceAll("\\s+", " "),

    "q_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok IN ('dup', 'join', 'spark') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl FROM documents),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents),
        |c AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |    (tf.tf * (1.2 + 1.0)) /
        |    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS contrib
        |  FROM tf JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
        |SELECT doc_id, round(sum(contrib), 6) AS score FROM c GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin.replaceAll("\\s+", " "),

    "q_inverted_index" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2)
        |SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
        |array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        |FROM tf GROUP BY term ORDER BY term""".stripMargin.replaceAll("\\s+", " "),

    "q_dedup_clusters" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pr AS (
        |  SELECT ida, idb FROM cand
        |  JOIN sz na ON na.doc_id = ida
        |  JOIN sz nb ON nb.doc_id = idb
        |  WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5),
        |edges AS (SELECT ida AS src, idb AS dst FROM pr
        |  UNION SELECT idb, ida FROM pr),
        |closure AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst AS r FROM closure c JOIN edges e ON e.src = c.r)
        |SELECT id AS doc_id, min(r) AS cluster FROM closure GROUP BY id
        |ORDER BY doc_id""".stripMargin).replaceAll("\\s+", " "),

    // CC closure as in q_dedup_clusters, then the hashSplit nibble rule
    // keyed on the representative id string (singletons represent
    // themselves via the left join).
    "q_leakage_split" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pr AS (
        |  SELECT ida, idb FROM cand
        |  JOIN sz na ON na.doc_id = ida
        |  JOIN sz nb ON nb.doc_id = idb
        |  WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5),
        |edges AS (SELECT ida AS src, idb AS dst FROM pr
        |  UNION SELECT idb, ida FROM pr),
        |closure AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst AS r FROM closure c JOIN edges e ON e.src = c.r),
        |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM closure GROUP BY id),
        |rep AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster_rep
        |  FROM documents d LEFT JOIN cl USING (doc_id))
        |SELECT doc_id, cluster_rep,
        |  CASE WHEN substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 1) IN ('c', 'd')
        |    THEN 'valid'
        |  WHEN substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 1) IN ('e', 'f')
        |    THEN 'test'
        |  ELSE 'train' END AS split
        |FROM rep ORDER BY doc_id""".stripMargin).replaceAll("\\s+", " "),

    "q_dedup_drop" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pr AS (
        |  SELECT ida, idb FROM cand
        |  JOIN sz na ON na.doc_id = ida
        |  JOIN sz nb ON nb.doc_id = idb
        |  WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5),
        |edges AS (SELECT ida AS src, idb AS dst FROM pr
        |  UNION SELECT idb, ida FROM pr),
        |closure AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst AS r FROM closure c JOIN edges e ON e.src = c.r)
        |SELECT id AS doc_id, min(r) AS keeper FROM closure GROUP BY id
        |HAVING min(r) <> id ORDER BY doc_id""".stripMargin).replaceAll("\\s+", " "),

    "q_dedup_keep_best" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        |cand AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pr AS (
        |  SELECT ida, idb FROM cand
        |  JOIN sz na ON na.doc_id = ida
        |  JOIN sz nb ON nb.doc_id = idb
        |  WHERE shared * 1.0 / (na.n + nb.n - shared) >= 0.5),
        |edges AS (SELECT ida AS src, idb AS dst FROM pr
        |  UNION SELECT idb, ida FROM pr),
        |closure AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT c.id, e.dst AS r FROM closure c JOIN edges e ON e.src = c.r),
        |cl AS (SELECT id, min(r) AS cluster FROM closure GROUP BY id),
        |q AS (
        |  SELECT doc_id AS id,
        |    round(least(len(t) / 100.0, 1.0) * 0.3 +
        |      (len(list_distinct(t)) * 1.0 / len(t)) * 0.4 +
        |      (len(list_filter(t, x -> list_contains($stop, x))) * 1.0 / len(t)) * 0.3,
        |      6) AS quality
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |r AS (
        |  SELECT cl.cluster, cl.id, q.quality,
        |    row_number() OVER (PARTITION BY cl.cluster
        |      ORDER BY q.quality DESC, cl.id) AS rn,
        |    count(*) OVER (PARTITION BY cl.cluster) AS n_members
        |  FROM cl JOIN q USING (id))
        |SELECT cluster, id AS keeper, quality AS best_quality,
        |CAST(n_members AS BIGINT) AS n_members
        |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin).replaceAll("\\s+", " "),

    "q_curation_e2e" ->
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
         |q AS (
         |  SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
         |    round(least(len(t) / 100.0, 1.0) * 0.3 +
         |      (len(list_distinct(t)) * 1.0 / len(t)) * 0.4 +
         |      (len(list_filter(t, x -> list_contains($stop, x))) * 1.0 / len(t)) * 0.3,
         |      6) AS quality
         |  FROM tok),
         |keeper AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |kept AS (
         |  SELECT q.doc_id, q.text, q.n_tokens FROM q
         |  JOIN keeper USING (doc_id) WHERE quality >= 0.38),
         |s AS (
         |  SELECT n_tokens,
         |    CASE WHEN substring(md5(text), 1, 1) IN ('c','d') THEN 'valid'
         |         WHEN substring(md5(text), 1, 1) IN ('e','f') THEN 'test'
         |         ELSE 'train' END AS split
         |  FROM kept)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM s GROUP BY split ORDER BY split""".stripMargin.replaceAll("\\s+", " "),

    "q_media_frames" ->
      """WITH b AS (
        |  SELECT doc_id, upper(hex(CAST(text AS BLOB))) AS h,
        |    octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, h, unnest(range(0, n - 16 + 1, 32)) AS frame_offset
        |  FROM b WHERE n >= 16)
        |SELECT doc_id, frame_offset,
        |  substring(h, 2 * frame_offset + 1, 32) AS frame_hex
        |FROM o ORDER BY doc_id, frame_offset""".stripMargin.replaceAll("\\s+", " "),

    // Identical dyadic weight literals + the same md5-bucket hash; dyadic
    // sums are exact hence order-independent, so scores agree bitwise.
    "q_quality_classifier" -> {
      val ws = TextOps.classifierWeights(1024).mkString(",")
      ("""WITH w AS (SELECT [""" + ws + """] AS ws),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(list_sum(list_transform(toks, tok ->
        |    ws[(CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % 1024) + 1]))
        |    / greatest(len(toks), 1), 6) AS score,
        |  round(list_sum(list_transform(toks, tok ->
        |    ws[(CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % 1024) + 1]))
        |    / greatest(len(toks), 1), 6) >= 0.0 AS keep
        |FROM t, w ORDER BY doc_id""").stripMargin.replaceAll("\\s+", " ")
    },

    // Mirrors syntheticContainer literally (shared construction), then
    // re-parses the 24-byte hex prefix with independent SQL (format
    // dispatch + big-endian IHDR ints) — the parse, not the plant, is
    // what the query under test computes.
    "q_sniff_container" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN unhex('89504E470D0A1A0A0000000D49484452')
        |        || unhex(lpad(hex(16 + doc_id % 1024), 8, '0'))
        |        || unhex(lpad(hex(16 + (doc_id * 3) % 1024), 8, '0'))
        |        || unhex('0806000000') || CAST(text AS BLOB)
        |      WHEN 1 THEN unhex('FFD8FFE0') || CAST(text AS BLOB)
        |      WHEN 2 THEN CAST('GIF89a' AS BLOB) || CAST(text AS BLOB)
        |      WHEN 3 THEN CAST('RIFF' AS BLOB) || CAST(text AS BLOB)
        |      WHEN 4 THEN unhex('00000020') || CAST('ftypisom' AS BLOB) || CAST(text AS BLOB)
        |      ELSE CAST(text AS BLOB) END AS blob
        |  FROM documents),
        |h AS (SELECT doc_id, left(upper(hex(blob)), 48) AS hx FROM b),
        |f AS (SELECT doc_id, hx,
        |  CASE WHEN left(hx, 16) = '89504E470D0A1A0A' THEN 'png'
        |       WHEN left(hx, 6) = 'FFD8FF' THEN 'jpeg'
        |       WHEN left(hx, 9) = '474946383' THEN 'gif'
        |       WHEN left(hx, 8) = '52494646' THEN 'riff'
        |       WHEN substring(hx, 9, 8) = '66747970' THEN 'mp4'
        |       ELSE 'unknown' END AS format
        |  FROM h)
        |SELECT doc_id, format,
        |  CASE WHEN format = 'png'
        |    THEN CAST(concat('0x', substring(hx, 33, 8)) AS BIGINT) END AS png_width,
        |  CASE WHEN format = 'png'
        |    THEN CAST(concat('0x', substring(hx, 41, 8)) AS BIGINT) END AS png_height
        |FROM f ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    // Same planted construction (canonical-id envelope over canonical
    // text), hashed as md5-over-uppercase-hex — the engine-portable blob
    // digest — then byte-identity groups via min/count per digest.
    "q_media_dedup" ->
      """WITH c AS (SELECT doc_id AS cid, text AS ctext FROM documents WHERE doc_id < 20),
        |b AS (
        |  SELECT d.doc_id,
        |    CASE c.cid % 6
        |      WHEN 0 THEN unhex('89504E470D0A1A0A0000000D49484452')
        |        || unhex(lpad(hex(16 + c.cid % 1024), 8, '0'))
        |        || unhex(lpad(hex(16 + (c.cid * 3) % 1024), 8, '0'))
        |        || unhex('0806000000') || CAST(c.ctext AS BLOB)
        |      WHEN 1 THEN unhex('FFD8FFE0') || CAST(c.ctext AS BLOB)
        |      WHEN 2 THEN CAST('GIF89a' AS BLOB) || CAST(c.ctext AS BLOB)
        |      WHEN 3 THEN CAST('RIFF' AS BLOB) || CAST(c.ctext AS BLOB)
        |      WHEN 4 THEN unhex('00000020') || CAST('ftypisom' AS BLOB) || CAST(c.ctext AS BLOB)
        |      ELSE CAST(c.ctext AS BLOB) END AS blob
        |  FROM documents d JOIN c ON d.doc_id % 20 = c.cid),
        |h AS (SELECT doc_id, md5(upper(hex(blob))) AS content_hash FROM b),
        |g AS (SELECT content_hash, min(doc_id) AS keeper_id,
        |  CAST(count(*) AS BIGINT) AS n_copies FROM h GROUP BY 1)
        |SELECT h.doc_id, h.content_hash, g.keeper_id, g.n_copies,
        |  h.doc_id <> g.keeper_id AS is_dup
        |FROM h JOIN g USING (content_hash) ORDER BY h.doc_id""".stripMargin.replaceAll("\\s+", " "),

    // The engine ENCODES a real PNG per doc, DECODES it with the JDK codec,
    // and hashes decoded pixels; the oracle recomputes dims + both hashes
    // from the closed-form pixel pattern — generated SQL, one column per
    // raster cell (the bpeApplyOracle precedent for built oracles).
    "q_image_decode" -> imageDecodeOracle,
    "q_image_neardup" -> imageNeardupOracle,
    "q_image_dedup_groups" -> imageDedupGroupsOracle,

    // Independent evaluation strategy: the oracle computes the same
    // definition via character explode + two-level aggregation.
    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, i, 1) AS c
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) + 1)) AS i FROM documents)),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY 1)
        |SELECT doc_id,
        |  round(-sum((k / CAST(n AS DOUBLE)) * log2(k / CAST(n AS DOUBLE))), 6) + 0
        |    AS entropy_bits,
        |  CAST(max(n) AS BIGINT) AS n_chars
        |FROM cnt JOIN tot USING (doc_id)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_nfc_normalize" ->
      """SELECT doc_id,
        |nfc_normalize('e' || chr(769) || substr(text, 1, 12)) AS norm_text,
        |nfc_normalize('e' || chr(769) || substr(text, 1, 12))
        |  <> ('e' || chr(769) || substr(text, 1, 12)) AS changed,
        |nfc_normalize(substr(text, 1, 12)) = substr(text, 1, 12) AS ascii_unchanged
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    // The engine ENCODES a real WAV per doc and DECODES it with the JDK
    // codec; the oracle recomputes frame counts and exact integer energy
    // stats from the closed-form sample formula.
    "q_audio_decode" ->
      """WITH f AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM f),
        |v AS (SELECT doc_id, n, (doc_id * 7 + i * 31) % 2003 - 1001 AS smp FROM s)
        |SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(max(n) AS BIGINT) AS n_frames,
        |  CAST(sum(smp * smp) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(smp)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_audio_energy" ->
      """WITH f AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, n)) AS i FROM f),
        |v AS (SELECT doc_id, i // 16 AS win,
        |  (doc_id * 7 + i * 31) % 2003 - 1001 AS smp FROM s)
        |SELECT doc_id, CAST(win AS BIGINT) AS win,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(smp * smp) AS BIGINT) AS sum_sq
        |FROM v GROUP BY doc_id, win ORDER BY doc_id, win""".stripMargin.replaceAll("\\s+", " "),

    // Decimated samples are truncating-division block means of the
    // closed-form plant (DuckDB // truncates toward zero exactly like
    // Java long division — PROBED: (-3)//2 = -1); stats over them mirror
    // the engine's second decode.
    "q_audio_resample" ->
      """WITH f AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM f),
        |v AS (SELECT doc_id, i // 4 AS blk,
        |  (doc_id * 7 + i * 31) % 2003 - 1001 AS smp FROM s),
        |d AS (SELECT doc_id, blk, sum(smp) // count(*) AS o FROM v GROUP BY 1, 2)
        |SELECT doc_id, 2000 AS sample_rate, 1 AS channels,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(o * o) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(o)) AS BIGINT) AS peak_abs
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    // Frame directory + frame-0 raster recomputed from the closed form the
    // engine encoded (palette gray roundtrips losslessly).
    "q_gif_frames" ->
      """WITH gy AS (SELECT doc_id, unnest(range(0, 5)) AS y FROM documents),
        |gx AS (SELECT doc_id, y, unnest(range(0, 7)) AS x FROM gy)
        |SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n_frames,
        |  7 AS width, 5 AS height,
        |  CAST(sum((doc_id % 199 + x * 20 + y * 10) % 256) AS BIGINT) AS f0_gray_sum
        |FROM gx GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_audio_neardup" -> audioNeardupOracle,
    "q_audio_neardup_shift" -> audioNeardupShiftOracle,
    "q_gif_neardup_rate" -> gifNeardupRateOracle,
    "q_tokenizer_fertility" -> tokenizerFertilityOracle,

    "q_gif_neardup" -> gifNeardupOracle,

    // Vocab = top-50 tokens by count, ties lexicographic — the same total
    // order the engine fits, so membership is deterministic.
    "q_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        |vocab AS (SELECT tok FROM cnt ORDER BY cnt DESC, tok ASC LIMIT 50)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS oov_rate
        |FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin.replaceAll("\\s+", " "),

    // First occurrence = min doc_id per distinct 3-gram; novelty = share of
    // a doc's distinct grams it introduced.
    "q_ngram_novelty" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 3 THEN
        |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                   for i in range(1, len(t)-1)])
        |  ELSE [] END AS grams FROM tok),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
        |f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN g.doc_id = f.first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN g.doc_id = f.first_id THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
        |    AS novelty_rate
        |FROM g JOIN f ON g.gram = f.gram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin.replaceAll("\\s+", " "),

    // Zipf slope over the top-100 token frequencies: x = ln(rank),
    // y = ln(cnt); rank order among equal counts is irrelevant (same y),
    // so the regression is deterministic. `+ 0` normalizes DuckDB's -0.0.
    "q_zipf_slope" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        |top AS (SELECT cnt FROM cnt ORDER BY cnt DESC, tok ASC LIMIT 100),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC) AS DOUBLE)) AS x,
        |  ln(CAST(cnt AS DOUBLE)) AS y FROM top)
        |SELECT CAST(count(*) AS BIGINT) AS n_ranks,
        |  round(covar_pop(y, x) / var_pop(x), 6) + 0 AS slope,
        |  round(avg(y) - covar_pop(y, x) / var_pop(x) * avg(x), 6) + 0 AS intercept
        |FROM r""".stripMargin.replaceAll("\\s+", " "),

    // Same split/regex conventions as the engine (whitespace split keeps
    // empties; per-word ≥1 syllable clamp); scores are fixed expressions
    // of exact integers, `+ 0` folds -0.0 on the two signable scores.
    "q_readability" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
        |    AS n_sentences,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS BIGINT)
        |    AS n_syllables,
        |  round(CAST(len(string_split(text, ' ')) AS DOUBLE)
        |    / greatest(1, len(regexp_extract_all(text, '[.!?]+'))), 6)
        |    AS words_per_sentence,
        |  round(CAST(list_sum(list_transform(string_split(text, ' '),
        |      w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 6) AS syllables_per_word,
        |  round(206.835
        |    - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
        |      / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
        |    - 84.6 * (CAST(list_sum(list_transform(string_split(text, ' '),
        |        w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS DOUBLE)
        |      / len(string_split(text, ' '))), 6) + 0 AS flesch_ease,
        |  round(0.39 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
        |      / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
        |    + 11.8 * (CAST(list_sum(list_transform(string_split(text, ' '),
        |        w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS DOUBLE)
        |      / len(string_split(text, ' ')))
        |    - 15.59, 6) + 0 AS fk_grade
        |FROM documents
        |WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
        |ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    // Ascending (count, source) ranking, NULLS FIRST to match Spark's
    // default null ordering; every term an exact integer sum.
    "q_source_gini" ->
      """WITH c AS (
        |  SELECT source AS s, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |r AS (SELECT c,
        |  CAST(row_number() OVER (ORDER BY c, s NULLS FIRST) AS BIGINT) AS i
        |  FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(c) AS BIGINT) AS n_docs,
        |  sum(CAST(i AS HUGEINT) * c) AS sic,
        |  sum(CAST(c AS HUGEINT) * c) AS scc,
        |  CAST(max(c) AS BIGINT) AS cmax FROM r)
        |SELECT n_sources, n_docs,
        |  round(CAST(2 * sic - (n_sources + 1) * n_docs AS DOUBLE)
        |    / (n_sources * n_docs), 6) AS gini,
        |  round(CAST(scc AS DOUBLE) / (CAST(n_docs AS DOUBLE) * n_docs), 6) AS hhi,
        |  round(CAST(cmax AS DOUBLE) / n_docs, 6) AS top_share
        |FROM a""".stripMargin.replaceAll("\\s+", " "),

    // Every ratio is one division of exact integers; sums CAST to BIGINT so
    // DuckDB's HUGEINT sums don't drift to float driver-side. The length
    // quantiles rely on the q_median/q_percentiles interpolation parity.
    "q_dataset_card" ->
      """WITH b AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |    CAST(sum(CASE WHEN len(string_split(text, ' ')) < 20 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_short,
        |    CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup,
        |    quantile_cont(n_chars, 0.5) AS chars_p50,
        |    quantile_cont(n_chars, 0.95) AS chars_p95
        |  FROM documents),
        |tl AS (SELECT lang AS top_lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1 ORDER BY c DESC, top_lang LIMIT 1)
        |SELECT n_docs, n_sources, n_langs, total_tokens,
        |  round(CAST(total_tokens AS DOUBLE) / n_docs, 6) AS mean_doc_tokens,
        |  round(CAST(n_dup AS DOUBLE) / n_docs, 6) AS dup_rate,
        |  round(CAST(n_short AS DOUBLE) / n_docs, 6) AS short_rate,
        |  top_lang,
        |  round(CAST(c AS DOUBLE) / n_docs, 6) AS top_lang_share,
        |  round(chars_p50, 6) AS chars_p50,
        |  round(chars_p95, 6) AS chars_p95
        |FROM b, tl""".stripMargin.replaceAll("\\s+", " ")
  )
}
