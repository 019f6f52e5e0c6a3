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

  /** The captured real-stream specimen (reference
    * spec/fixtures/nomad/stream_a_1.txt, byte-copied to test resources): a
    * genuine readpartial capture from a live Nomad event stream, one chunk
    * per file line. Chunk 1 is the TAIL of a frame whose head the capture
    * missed (its trailing newline is the frame's real terminator); chunk 2
    * opens the `{"Index":6104,...}` allocation frame but ends mid-string
    * (`"Message":"Building Task` — its file newline is the capture tool's
    * separator, NOT stream data); chunk 3 is that frame's remainder
    * (`Directory",...]}`) through the real terminating newline. So the
    * reconstructed stream is [tail-of-frame-A]\n[frame-B]\n with frame B =
    * line2 ++ line3 — verified: only that concatenation parses. The
    * synthetic table cases above model this shape; this pins it on the
    * real capture bytes. */
  private lazy val streamA1Lines: Seq[String] = {
    val in = getClass.getResourceAsStream("/nomad/stream_a_1.txt")
    val bytes = try in.readAllBytes() finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq.init
  }

  private def streamA1Reconstructed: String = {
    val Seq(l1, l2, l3) = streamA1Lines
    l1 + "\n" + l2 + l3 + "\n"
  }

  test("captured fixture stream_a_1: tail chunk drops, split frame reassembles") {
    val Seq(l1, l2, l3) = streamA1Lines
    assert(Seq(l1, l2, l3).map(_.length) == Seq(3361, 6337, 3177))
    val b = new NdjsonBuffer(maxLineBytes = 1 << 20)
    // chunk 1: a complete line that is only the tail of frame A → the
    // reference's rescue-drop (lib/ndjson.rb:27-32) discards it
    assert(b.feed(l1 + "\n").isEmpty)
    // chunk 2 ends mid-string inside frame B: nothing completes, the whole
    // chunk is carried
    assert(b.feed(l2).isEmpty)
    assert(b.pending == l2)
    // chunk 3 completes frame B — the one whole event in the capture
    val out = b.feed(l3 + "\n")
    assert(out == Seq(l2 + l3))
    assert(b.pending.isEmpty)
    val frame = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out.head)
    assert(frame.get("Index").asLong == 6104L)
    assert(frame.get("Events").get(0).get("Topic").asText == "Allocation")
    assert(frame.get("Events").get(0).get("Type").asText == "AllocationUpdated")
    assert(frame.get("Events").get(0).get("Key").asText ==
      "f956c030-6323-ff77-2b44-2801996c7698")
  }

  test("captured fixture stream_a_1: chunk-split invariance on the reconstructed stream") {
    val bytes = streamA1Reconstructed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val whole = {
      val b = new NdjsonBuffer(maxLineBytes = 1 << 20)
      b.feedBytes(bytes, bytes.length)
    }
    assert(whole.size == 1, "exactly one whole frame survives the capture")
    // readpartial-sized cuts (512 B to 4 KB) and adversarial 1-byte offsets
    Seq(1, 511, 512, 1024, 3361, 3362, 4096).foreach { sz =>
      val b = new NdjsonBuffer(maxLineBytes = 1 << 20)
      val got = bytes.grouped(sz).toSeq.flatMap(c => b.feedBytes(c, c.length))
      assert(got == whole, s"chunk size $sz diverged on the captured stream")
    }
  }
}
