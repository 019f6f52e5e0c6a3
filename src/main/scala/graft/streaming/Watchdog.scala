package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.atomic.AtomicLong

/** T1 — heartbeat liveness watchdog (reference app.rb:48-49, 87-104): the
  * reference runs a 1 Hz thread that kills the process if no heartbeat
  * arrived within a threshold.
  *
  * Spark fires no micro-batch on a silent stream, so liveness cannot be
  * data-driven (SURVEY §7.4.6); this is a [[StreamingQueryListener]] on the
  * driver clock instead: every progress event with non-zero input refreshes
  * the beat; a monitor thread invokes `onStale` (e.g. `query.stop()`) when
  * the threshold lapses.
  */
final class Watchdog(thresholdMs: Long, onStale: () => Unit,
                     clock: () => Long = () => System.currentTimeMillis())
    extends StreamingQueryListener {

  private val lastBeat = new AtomicLong(clock())
  @volatile private var running = true

  /** Millis since the last observed heartbeat. */
  def staleness: Long = clock() - lastBeat.get()

  def beat(): Unit = lastBeat.set(clock())

  override def onQueryStarted(event: QueryStartedEvent): Unit = beat()
  override def onQueryProgress(event: QueryProgressEvent): Unit =
    if (event.progress.numInputRows > 0) beat()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    running = false

  /** 1 Hz monitor thread (app.rb:101). Daemon — dies with the driver. */
  def start(): Thread = {
    val t = new Thread(() => {
      while (running) {
        if (staleness > thresholdMs) { running = false; onStale() }
        else Thread.sleep(1000)
      }
    }, "graft-watchdog")
    t.setDaemon(true)
    t.start()
    t
  }

  def stop(): Unit = running = false
}
