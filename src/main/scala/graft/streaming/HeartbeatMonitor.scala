package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One heartbeat observation per source. */
case class Heartbeat(source: String, atMs: Long)

/** Liveness verdict emitted by the monitor: `stale = true` means the source
  * missed its deadline. */
case class Liveness(source: String, stale: Boolean, lastBeatMs: Long)

/** T1 — heartbeat liveness as *stateful stream logic* (the in-plan
  * alternative to the driver-side [[Watchdog]] listener, SURVEY §2a T1):
  * `flatMapGroupsWithState` with `ProcessingTimeTimeout` keyed by heartbeat
  * source. Every observed beat arms a timeout `thresholdMs` out; if no beat
  * arrives before it fires, Spark invokes the function with
  * `state.hasTimedOut` and a stale verdict is emitted downstream (where a
  * `foreachBatch` sink can page / stop the query — the reference `exit 1`s,
  * app.rb:93-99).
  *
  * Caveat shared with the reference's design (SURVEY §7.4.6): processing-time
  * timeouts only fire when *some* micro-batch runs, so a completely silent
  * cluster still needs the listener-based watchdog; in practice the `{}`
  * heartbeats themselves keep batches flowing.
  */
object HeartbeatMonitor {

  def monitor(beats: Dataset[Heartbeat], thresholdMs: Long): Dataset[Liveness] = {
    implicit val livenessEnc = Encoders.product[Liveness]
    implicit val longEnc = Encoders.scalaLong
    beats
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[Long, Liveness](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (source: String, rows: Iterator[Heartbeat], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.getOption.getOrElse(0L)
            state.remove()
            Iterator.single(Liveness(source, stale = true, last))
          } else {
            val latest = rows.map(_.atMs).foldLeft(state.getOption.getOrElse(0L))(math.max)
            state.update(latest)
            state.setTimeoutDuration(thresholdMs)
            Iterator.single(Liveness(source, stale = false, latest))
          }
      }
  }
}
