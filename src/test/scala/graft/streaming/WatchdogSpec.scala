package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** T1 liveness semantics on a fake clock (reference app.rb:87-104). */
class WatchdogSpec extends AnyFunSuite {

  test("staleness tracks the fake clock and beat() resets it") {
    var now = 0L
    val wd = new Watchdog(5000, () => (), () => now)
    assert(wd.staleness == 0)
    now = 3000
    assert(wd.staleness == 3000)
    wd.beat()
    assert(wd.staleness == 0)
  }

  test("monitor fires onStale once the threshold lapses") {
    @volatile var fired = false
    @volatile var now = 0L
    val wd = new Watchdog(500, () => fired = true, () => now)
    val t = wd.start()
    now = 10000
    t.join(5000)
    assert(fired)
  }
}
