package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All single-pass,
  * shuffle-free per-document transforms (narrow dependencies) — at 100 TB
  * these run map-side at scan parallelism; only the optional per-language
  * aggregations shuffle.
  */
object TextOps {

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
  }

  /** Character trigrams typical of English text — a tiny profile of the
    * n-gram-frequency method real language identifiers use. */
  val EnglishTrigrams: Seq[String] = Seq("the", "ing", "ion", "ent", "er ", " th")

  /** N-gram + stopword language scoring: English function-word ratio and a
    * character-trigram profile hit count, combined into a binary en/other
    * call. On the synthetic corpus every document shares one vocabulary, so
    * the score mechanism (not the labels) is what's exercised; with real
    * per-language profiles the same plan applies. */
  def langId(docs: DataFrame, threshold: Double = 0.05,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val ratio = vocabCount(toks, EnglishStopwords).cast("double") / nTok
    val trigramHits = EnglishTrigrams
      .map(t => size(regexp_extract_all(col(textCol), lit(t), lit(0))))
      .reduce(_ + _).cast("long")
    // trigram hits normalised per token so long docs don't dominate
    val trigramRate = trigramHits.cast("double") / nTok
    docs.select(
      col(idCol),
      round(ratio, 6).as("en_ratio"),
      trigramHits.as("en_trigram_hits"),
      when(ratio >= threshold || trigramRate >= 0.5, "en").otherwise("other")
        .as("predicted_lang"))
  }

  /** Composite quality score from length, lexical diversity, and stopword
    * density — the usual cheap pre-filter before expensive pipeline stages. */
  def qualityScore(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = vocabCount(toks, EnglishStopwords).cast("double") / nTok
    val lenScore = least(nTok / 100.0, lit(1.0))
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      round(ttr, 6).as("ttr"),
      round(stopRatio, 6).as("stop_ratio"),
      round(lenScore * 0.3 + ttr * 0.4 + stopRatio * 0.3, 6).as("quality"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenisation. */
  def tokenCounts(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpePattern), lit(0))).cast("long").as("bpe_tokens"))

  /** Content fingerprints: md5 of normalised text (oracle-checkable) plus an
    * order-sensitive rolling token hash (engine-specific, test-covered). */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      fingerprint(col(textCol)).as("fp_md5"),
      rollingHash(tokens(normalized(col(textCol)))).as("fp_rolling"))
}
