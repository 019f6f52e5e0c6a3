package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's NDJSON chunk-reassembly contract
  * (reference spec/lib/ndjson_spec.rb:8-153, FIXTURES.md §A.2): table-driven
  * chunk sequences → expected parsed lines, plus the chunk-split invariance
  * property over randomised chunkings.
  */
class NdjsonBufferSpec extends AnyFunSuite {

  private def parseAll(chunks: Seq[String]): Seq[String] = {
    val b = new NdjsonBuffer
    chunks.flatMap(b.feed)
  }

  val cases: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("whole line", Seq("{\"a\":\"0\"}\n"), Seq("{\"a\":\"0\"}")),
    ("4-way split token",
      Seq("{\"a\":", "\"0\", ", "\"b\":", "\"1\"}\n"), Seq("{\"a\":\"0\", \"b\":\"1\"}")),
    ("truncated head dropped",
      Seq(":\"0\"}\n", "{\"b\":\"1\"}\n"), Seq("{\"b\":\"1\"}")),
    ("head and tail truncated",
      Seq("\"a\":\"0\"}\n{\"b\":\"1\"", "}\n"), Seq("{\"b\":\"1\"}")),
    ("multi incomplete",
      Seq("{\"a\":", "\"0\"", "}\n{\"b\":\"1\"}\n"), Seq("{\"a\":\"0\"}", "{\"b\":\"1\"}")),
    ("blank chunk between",
      Seq("{\"a\":\"0\"}\n{\"b\":\"1\"}\n", "", "{\"c\":\"2\"}\n"),
      Seq("{\"a\":\"0\"}", "{\"b\":\"1\"}", "{\"c\":\"2\"}")),
    ("mixed complete and incomplete",
      Seq("\"a\":\"0\"}\n{\"b\":\"1\"}\n{\"c\":", "\"2\"}\n{\"d\":\"3\"}\n"),
      Seq("{\"b\":\"1\"}", "{\"c\":\"2\"}", "{\"d\":\"3\"}")),
    ("split pair", Seq("{\"a\":", "\"0\"}\n"), Seq("{\"a\":\"0\"}")),
    ("heartbeats", Seq("{}", "\n{}\n", "{}\n"), Seq("{}", "{}", "{}")),
    ("lone newline", Seq("{}", "\n"), Seq("{}")))

  cases.foreach { case (name, chunks, expected) =>
    test(s"reassembly: $name") {
      assert(parseAll(chunks) == expected)
    }
  }

  test("trailing bytes after last newline are carried, never emitted") {
    val b = new NdjsonBuffer
    assert(b.feed("{\"a\":1}\n{\"b\":") == Seq("{\"a\":1}"))
    assert(b.pending == "{\"b\":")
    assert(b.feed("2}\n") == Seq("{\"b\":2}"))
    assert(b.pending.isEmpty)
  }

  test("multi-byte UTF-8 char split across a chunk boundary survives") {
    val line = """{"msg":"café 中文 ok"}"""
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // cut at every byte position: some cuts land inside the 2- and 3-byte
    // UTF-8 sequences; decoding per-chunk would yield replacement chars
    (1 until bytes.length).foreach { cut =>
      val b = new NdjsonBuffer
      val head = b.feedBytes(bytes, cut)
      val tail = b.feedBytes(java.util.Arrays.copyOfRange(bytes, cut, bytes.length),
        bytes.length - cut)
      assert(head ++ tail == Seq(line), s"cut=$cut")
    }
  }

  test("property: any byte-level chunking of UTF-8 NDJSON parses identically") {
    (1 to 200).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val doc = (0 to rnd.nextInt(8))
        .map(_ => s"""{"k":"é${rnd.nextInt(50)}中"}""")
        .mkString("", "\n", "\n")
      val bytes = doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val cuts = (0 until rnd.nextInt(6)).map(_ => rnd.nextInt(bytes.length + 1))
      val bounds = (Seq(0, bytes.length) ++ cuts).distinct.sorted
      val b = new NdjsonBuffer
      val got = bounds.zip(bounds.tail).flatMap { case (s, e) =>
        b.feedBytes(java.util.Arrays.copyOfRange(bytes, s, e), e - s)
      }
      assert(got == parseAll(Seq(doc)), s"seed=$seed bounds=$bounds")
    }
  }

  test("newline-less stream bounds the carry and drops the oversized record") {
    val b = new NdjsonBuffer(maxLineBytes = 32)
    // 3 × 20 bytes, no newline: carry is dropped once it crosses 32 bytes
    assert(b.feed("x" * 20).isEmpty)
    assert(b.feed("x" * 20).isEmpty)
    assert(b.pending.isEmpty) // capped, not 40 bytes
    assert(b.feed("x" * 20).isEmpty)
    // the record's eventual tail (through its newline) is still discarded,
    // and parsing resumes cleanly on the next line
    assert(b.feed("tail\"}\n{\"ok\":1}\n") == Seq("{\"ok\":1}"))
    assert(b.pending.isEmpty)
  }

  test("carry cap leaves records at or under the limit untouched") {
    val b = new NdjsonBuffer(maxLineBytes = 64)
    val line = """{"k":"0123456789012345678901234567890123456789"}"""
    assert(b.feed(line.substring(0, 30)).isEmpty)
    assert(b.feed(line.substring(30) + "\n") == Seq(line))
  }

  test("property: any chunking of a valid NDJSON string parses identically") {
    (1 to 200).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val doc = (0 to rnd.nextInt(8))
        .map(_ => s"""{"k":${rnd.nextInt(50)}}""")
        .mkString("", "\n", "\n")
      val cuts = (0 until rnd.nextInt(6)).map(_ => rnd.nextInt(doc.length + 1))
      val bounds = (Seq(0, doc.length) ++ cuts).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (s, e) => doc.substring(s, e) }
      assert(parseAll(chunks) == parseAll(Seq(doc)), s"seed=$seed chunks=$chunks")
    }
  }
}
