package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** The cross-JVM run-once claim (r15 "what's missing #3"): N racers on
  * one (job, token) unit see exactly one winner; completed units stay
  * claimed; a new token (the rebuild target advanced) is a fresh unit;
  * a crashed winner's stale claim is taken over. */
class MaintenanceFenceSpec extends AnyFunSuite {

  test("N concurrent claimants on one unit: exactly one winner") {
    val dir = graft.TempDirs.scratch("graft-fence").toString
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        if (MaintenanceFence.claim(dir, "mv-rebuild-m", "v3")) wins.incrementAndGet()
      }, s"claimant-$i")
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1, s"${wins.get()} claimants won the same unit")
    // the unit stays claimed — a late third gateway skips too
    assert(!MaintenanceFence.claim(dir, "mv-rebuild-m", "v3"))
  }

  test("a new token is a fresh unit; other jobs are independent") {
    val dir = graft.TempDirs.scratch("graft-fence2").toString
    assert(MaintenanceFence.claim(dir, "mv-rebuild-m", "v1"))
    assert(!MaintenanceFence.claim(dir, "mv-rebuild-m", "v1"))
    assert(MaintenanceFence.claim(dir, "mv-rebuild-m", "v2"),
      "an advanced rebuild target must be claimable")
    assert(MaintenanceFence.claim(dir, "ann-reseed-x", "v1"),
      "claims must be scoped per job")
  }

  test("a SLOW-but-alive winner is not usurped: withClaim heartbeats " +
    "the claim past staleMs, so staleness means crashed, not slow") {
    val dir = graft.TempDirs.scratch("graft-fence4").toString
    val usurped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val done = MaintenanceFence.withClaim(dir, "rebuild", "v1",
        staleMs = 500L) {
      // the rebuild legitimately outlasts staleMs several times over;
      // rival claimants keep reading the heartbeat as liveness
      (0 until 3).foreach { _ =>
        Thread.sleep(500)
        if (MaintenanceFence.claim(dir, "rebuild", "v1", staleMs = 500L))
          usurped.set(true)
      }
      "ok"
    }
    assert(done.contains("ok"))
    assert(!usurped.get(), "a live winner's claim was taken over mid-flight")
    // a FAILED body releases its claim so a retry can run immediately
    intercept[RuntimeException] {
      MaintenanceFence.withClaim(dir, "rebuild", "v2") {
        throw new RuntimeException("boom")
      }
    }
    assert(MaintenanceFence.withClaim(dir, "rebuild", "v2")("retry")
      .contains("retry"))
    // …and a loser gets None while the unit stays claimed
    assert(MaintenanceFence.withClaim(dir, "rebuild", "v2")("late").isEmpty)
  }

  test("a crashed winner's stale claim is taken over; release() frees " +
    "a unit explicitly") {
    val dir = graft.TempDirs.scratch("graft-fence3").toString
    assert(MaintenanceFence.claim(dir, "job", "t"))
    Thread.sleep(20)
    assert(!MaintenanceFence.claim(dir, "job", "t", staleMs = 60_000L))
    assert(MaintenanceFence.claim(dir, "job", "t", staleMs = 1L),
      "a stale claim (crashed winner) must be reclaimable")
    MaintenanceFence.release(dir, "job", "t")
    assert(MaintenanceFence.claim(dir, "job", "t"))
  }
}
