package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main for the keyword-scan tier (dev tool): the
  * Aho–Corasick expressions vs the built-in formulations they replace, at
  * dictionary sizes where the asymptotic difference shows. Vocabulary is
  * the testdata corpus's own word list, so generated phrases really occur.
  */
object ProfileKeyword {

  private val vocab = Seq(
    "agg", "row", "scan", "slow", "fast", "table", "value", "part", "hash",
    "merge", "batch", "spark", "window", "order", "data", "column", "join",
    "small", "line", "customer", "query", "big", "the", "sort", "group",
    "stream", "vector", "filter", "key")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val docs = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .documents.select("doc_id", "text").cache()
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      // min-of-2 like Bench: first run pays codegen/JIT
      val runs = Seq.fill(2) {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, n) = runs.minBy(_._1)
      println(f"[profile] $name%-42s $sec%8.2f s  (out=$n)")
    }

    // bigram cross product: 29^2 + 29 = 870 phrases, most occur in-corpus
    val bigDict = (for (a <- vocab; b <- vocab) yield s"$a $b") ++ vocab
    // the PRODUCTION q_keyword_spot dictionary, referenced so the 15-phrase
    // profile always measures what the declared query runs
    val smallDict = graft.queries.TextQueries.keywordPhrases

    // worst case for the naive probes: phrases that NEVER occur, so no
    // formulation can early-exit on a hit — per-phrase contains must try
    // all 870 phrases per doc, the alternation NFA scans with 870 branches
    val missDict = (for (a <- vocab; b <- vocab) yield s"${a}x ${b}q") ++ vocab.map(_ + "zz")

    for ((dict, label) <- Seq((smallDict, "15"), (bigDict, "870"), (missDict, "870miss"))) {
      val arr = dict.distinct.sorted.toArray
      val lits = lit(arr)
      // existence probe: automaton early-exit vs per-phrase contains-fold vs
      // one regex alternation (rlike compiles the | NFA once per plan too —
      // the comparison is match-time cost, not setup)
      time(s"any/$label: keyword_any")(
        docs.where(call_function("keyword_any", col("text"), lits)).count())
      time(s"any/$label: exists(contains) HOF")(
        docs.where(exists(lits, p => col("text").contains(p))).count())
      time(s"any/$label: rlike alternation")(
        docs.where(col("text").rlike(arr.map(java.util.regex.Pattern.quote).mkString("|"))).count())
      // full hit-set: automaton vs per-phrase filter HOF
      time(s"spot/$label: keyword_matches")(
        docs.select(size(call_function("keyword_matches", col("text"), lits)).as("n"))
          .agg(sum("n")).first().getLong(0))
      time(s"spot/$label: filter(contains) HOF")(
        docs.select(size(filter(lits, p => col("text").contains(p))).as("n"))
          .agg(sum("n")).first().getLong(0))
    }
    spark.stop()
  }
}
