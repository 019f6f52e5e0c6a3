package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One stage observation in a keyed event stream. */
case class StageEvent(key: String, ts: Long, stage: String)

/** A completed three-stage pattern for a key: the anchor (first-stage) time
  * and the times the second and third stages attached. */
case class PatternMatch(key: String, t1: Long, t2: Long, t3: Long)

/** Streaming sequence detection (CEP-lite): emit a match whenever the
  * stages `s1 → s2 → s3` occur for a key in strict time order within
  * `windowNs` of the anchor — the streaming form of the batch funnel
  * (RelationalQueries `q_funnel`), but per-occurrence and overlapping:
  * every `s1` opens its own pending window, so two interleaved sequences
  * both match (skip-till-next-match semantics, oldest-first attachment).
  *
  * State per key is a `ListState` of pending partials (anchor ts, optional
  * s2 ts), pruned two ways: partials expire once an arriving event's time
  * passes `anchor + windowNs`, and the list is capped at `maxPending`
  * (oldest dropped) so adversarial anchor floods can't grow state — the
  * usual bounded-state requirement at 100 TB stream scale. Batch rows are
  * folded in (ts, stage) order and the list is rewritten once per (key,
  * batch), so state-store traffic is O(pending), not O(rows).
  *
  * Completed matches are emitted in completion order; a partial is consumed
  * by its completion (no double-emission on replay — state is transactional
  * with the batch).
  */
class PatternMatchProcessor(s1: String, s2: String, s3: String,
                            windowNs: Long, maxPending: Int)
    extends StatefulProcessor[String, StageEvent, PatternMatch] {

  // (anchor ts, s2 ts or -1)
  @transient private var pending: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getListState[(Long, Long)](
      "pending", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[StageEvent],
                               timerValues: TimerValues): Iterator[PatternMatch] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    pending.get().foreach(buf += _)
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
    rows.toVector.sortBy(e => (e.ts, e.stage)).foreach { e =>
      // expire anchors whose window has passed
      buf.filterInPlace { case (t1, _) => e.ts <= t1 + windowNs }
      e.stage match {
        case `s1` =>
          buf += ((e.ts, -1L))
          if (buf.length > maxPending) buf.remove(0) // cap: drop oldest
        case `s2` =>
          // oldest partial still awaiting s2, strictly earlier than e
          val i = buf.indexWhere { case (t1, t2) => t2 < 0 && t1 < e.ts }
          if (i >= 0) buf(i) = (buf(i)._1, e.ts)
        case `s3` =>
          val i = buf.indexWhere { case (_, t2) => t2 >= 0 && t2 < e.ts }
          if (i >= 0) {
            val (t1, t2) = buf.remove(i)
            out += PatternMatch(key, t1, t2, e.ts)
          }
        case _ => () // unrelated stage
      }
    }
    pending.clear()
    if (buf.nonEmpty) pending.appendList(buf.toArray)
    out.iterator
  }
}

object PatternMatchProcessor {

  /** Detect `stages(0) → stages(1) → stages(2)` within `windowNs` per key. */
  def detect(events: Dataset[StageEvent], stages: Seq[String], windowNs: Long,
             maxPending: Int = 64): Dataset[PatternMatch] = {
    require(stages.length == 3, s"exactly three stages expected, got $stages")
    require(windowNs > 0 && maxPending > 0, "windowNs and maxPending must be positive")
    implicit val enc = Encoders.product[PatternMatch]
    events
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(
        new PatternMatchProcessor(stages(0), stages(1), stages(2), windowNs, maxPending),
        TimeMode.None(), OutputMode.Append())
  }
}
