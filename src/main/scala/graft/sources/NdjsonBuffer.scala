package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import java.nio.charset.StandardCharsets

/** Incremental NDJSON chunk reassembler — the semantics of the reference's
  * `NDJSON#parse_partial` (reference lib/ndjson.rb:10-35):
  *
  *  - input arrives as arbitrary byte chunks (`readpartial` boundaries can
  *    split a JSON object anywhere, including mid-token);
  *  - the text after the last `\n` is carried over to the next chunk, never
  *    emitted (lib/ndjson.rb:20-23);
  *  - complete lines that fail to parse (e.g. the truncated head of a stream
  *    joined mid-line) are silently dropped (lib/ndjson.rb:31-33) — the
  *    central error-tolerance contract;
  *  - blank lines are dropped; the bare `{}` heartbeat is a valid frame.
  *
  * The carry is held as BYTES, not text: `readpartial` boundaries can also
  * split a multi-byte UTF-8 character, and decoding each chunk independently
  * would turn the split character into replacement chars (corrupting the line
  * or making it drop as invalid JSON). `\n` (0x0A) never occurs inside a
  * UTF-8 multi-byte sequence (continuation bytes are ≥ 0x80), so splitting on
  * the byte is safe; decode happens only on complete lines.
  *
  * Mutable per-connection state, driver-side only (it backs the source's
  * chunk loop, not an executor path).
  */
final class NdjsonBuffer {
  private var carry: Array[Byte] = Array.emptyByteArray
  private val mapper = new ObjectMapper()

  private def isValidJson(s: String): Boolean =
    try {
      val p = mapper.createParser(s)
      p.readValueAsTree()
      // a truncated head like `:"0"}` or `"a":"0"}` starts with a valid
      // token — require the parser to consume the whole line
      p.nextToken() == null
    } catch { case _: Exception => false }

  /** Feed one raw byte chunk (the first `len` bytes); returns the complete,
    * valid JSON lines it completed. */
  def feedBytes(chunk: Array[Byte], len: Int): Seq[String] = {
    val buf = new Array[Byte](carry.length + len)
    System.arraycopy(carry, 0, buf, 0, carry.length)
    System.arraycopy(chunk, 0, buf, carry.length, len)
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < buf.length) {
      if (buf(i) == '\n') {
        val line = new String(buf, start, i - start, StandardCharsets.UTF_8).trim
        if (line.nonEmpty && isValidJson(line)) out += line
        start = i + 1
      }
      i += 1
    }
    // text after the last '\n' is carried over, never emitted
    // (lib/ndjson.rb:20-23) — a chunk ending in '\n' leaves an empty carry.
    carry = java.util.Arrays.copyOfRange(buf, start, buf.length)
    out.result()
  }

  /** Feed one text chunk (tests / pre-decoded input). */
  def feed(chunk: String): Seq[String] = {
    val b = chunk.getBytes(StandardCharsets.UTF_8)
    feedBytes(b, b.length)
  }

  /** Text currently carried (incomplete trailing record; lossy if the carry
    * ends mid-character — inspection only, never re-fed). */
  def pending: String = new String(carry, StandardCharsets.UTF_8)
}
