package graft.operators

import graft.SparkSpec
import graft.plans.AhoCorasick
import org.apache.spark.sql.functions._

/** Pins the native Aho–Corasick keyword scan: classic dictionary-matching
  * cases, fail-link emission, UTF-8 byte-boundary safety, randomized parity
  * with the naive per-phrase `contains` formulation, and the codegen path
  * through a DataFrame. */
class KeywordScanSpec extends SparkSpec {

  test("classic Aho–Corasick dictionary: ushers") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    // 'she' ends at position 4, whose fail chain emits 'he'; 'hers' ends at 6
    assert(ac.matched("ushers") === Seq("he", "hers", "she"))
    assert(ac.matched("his her") === Seq("he", "his"))
    assert(ac.matched("xyz") === Seq.empty)
  }

  test("fail-link transition across pattern boundaries") {
    val ac = AhoCorasick.build(Seq("ab", "bc"))
    // after matching 'ab' the automaton must slide to the 'b' prefix state
    // and still catch 'bc' starting inside the previous match
    assert(ac.matched("abc") === Seq("ab", "bc"))
  }

  test("nested substrings all emit") {
    val ac = AhoCorasick.build(Seq("able", "table", "fast table"))
    assert(ac.matched("a fast table scan") === Seq("able", "fast table", "table"))
    assert(ac.matched("enable") === Seq("able"))
  }

  test("repeated matches dedup; duplicate patterns collapse") {
    val ac = AhoCorasick.build(Seq("aa", "aa", "a"))
    assert(ac.patterns.toSeq === Seq("a", "aa"))
    // overlapping occurrences of 'aa' at every position — one hit each
    assert(ac.matched("aaaa") === Seq("a", "aa"))
  }

  test("UTF-8 byte matching is code-point-boundary safe") {
    val ac = AhoCorasick.build(Seq("é", "café", "©"))
    // é = C3 A9, © = C2 A9: the shared continuation byte A9 must not let ©
    // match inside é
    assert(ac.matched("café au lait") === Seq("café", "é"))
    assert(ac.matched("plain ascii") === Seq.empty)
  }

  test("empty or blank dictionaries are rejected") {
    intercept[IllegalArgumentException](AhoCorasick.build(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("ok", "")))
  }

  test("randomized parity with the naive per-phrase contains formulation") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc "
    def randStr(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 0 until 60) {
      val patterns = Seq.fill(1 + rnd.nextInt(8))(randStr(1 + rnd.nextInt(4))).distinct
      val ac = AhoCorasick.build(patterns)
      for (_ <- 0 until 20) {
        val text = randStr(rnd.nextInt(30))
        val naive = patterns.filter(text.contains).sorted
        assert(ac.matched(text) === naive, s"round=$round text='$text' pats=$patterns")
      }
    }
  }

  test("codegen path through a DataFrame matches the automaton; null text -> null") {
    val s = spark
    import s.implicits._
    val pats = Array("he", "she", "hers", "café")
    val df = Seq(Some("ushers"), Some("a café"), Some("zzz"), None)
      .toDF("t")
      .select(col("t"),
        call_function("keyword_matches", col("t"), lit(pats)).as("m"))
    val got = df.collect().map(r => (r.getAs[String]("t"), Option(r.getSeq[String](1))))
    assert(got.toSeq === Seq(
      ("ushers", Some(Seq("he", "hers", "she"))),
      ("a café", Some(Seq("café"))),
      ("zzz", Some(Seq.empty[String])),
      (null, None)))
  }

  test("non-foldable pattern argument is rejected at analysis time") {
    val s = spark
    import s.implicits._
    val df = Seq(("abc", Seq("a"))).toDF("t", "p")
    val e = intercept[Exception] {
      df.select(call_function("keyword_matches", col("t"), col("p"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }

  test("matchesAny agrees with matched.nonEmpty, including early-exit cases") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc "
    def randStr(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 40) {
      val patterns = Seq.fill(1 + rnd.nextInt(6))(randStr(1 + rnd.nextInt(3))).distinct
      val ac = AhoCorasick.build(patterns)
      for (_ <- 0 until 20) {
        val text = randStr(rnd.nextInt(25))
        assert(ac.matchesAny(org.apache.spark.unsafe.types.UTF8String.fromString(text))
          === ac.matched(text).nonEmpty, s"text='$text' pats=$patterns")
      }
    }
  }

  test("keywordFilter keeps exactly the docs with zero deny hits (rewrite parity)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "clean text with nothing bad"),
      (2L, "mentions a hash value midway"),
      (3L, "customer query arrives"),
      (4L, "also clean")).toDF("doc_id", "text")
    val kept = TextOps.keywordFilter(docs, Seq("hash value", "customer query"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L))
    // null text: size(null)=null -> keyword_any null -> filter drops, both paths
    val withNull = docs.union(Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val kept2 = TextOps.keywordFilter(withNull, Seq("hash value", "customer query"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq === Seq(1L, 4L)) // null-text row dropped by both paths
  }

  test("keywordSpot emits sorted joined hits and counts, one row per doc") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the fast table scan"),
      (2L, "nothing relevant here at all"), // 'he' hits inside 'here'
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextOps.keywordSpot(docs, Seq("fast table", "table", "able", "he"))
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    val r1 = out(0)
    assert(r1.getAs[String]("hits") === "able,fast table,he,table")
    assert(r1.getAs[Long]("n_hits") === 4L)
    assert(out(1).getAs[String]("hits") === "he")
    assert(out(2).getAs[String]("hits") === "")
    assert(out(2).getAs[Long]("n_hits") === 0L)
  }
}
