package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

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
  * Mutable per-connection state, driver-side only (it backs the source's
  * chunk loop, not an executor path).
  */
final class NdjsonBuffer {
  private var carry: String = ""
  private val mapper = new ObjectMapper()

  private def isValidJson(s: String): Boolean =
    try {
      val p = mapper.createParser(s)
      p.readValueAsTree()
      // a truncated head like `:"0"}` or `"a":"0"}` starts with a valid
      // token — require the parser to consume the whole line
      p.nextToken() == null
    } catch { case _: Exception => false }

  /** Feed one chunk; returns the complete, valid JSON lines it completed. */
  def feed(chunk: String): Seq[String] = {
    val buf = carry + chunk
    // -1 keeps trailing empty strings, so a chunk ending in '\n' yields an
    // empty carry — same as Ruby's split("\n", -1).
    val parts = buf.split("\n", -1)
    carry = parts.last
    parts.dropRight(1).toSeq
      .map(_.trim)
      .filter(_.nonEmpty)
      .filter(isValidJson)
  }

  /** Bytes currently carried (incomplete trailing record). */
  def pending: String = carry
}
