package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays the RECORDED sentinel blocks of past bench captures against
  * the round-10 gate (no Spark involved — the gate is pure). The
  * round-8 and round-9 driver captures were both contended (293.8 s /
  * 249.8 s vs clean same-code runs of ~170-194 s) yet stamped
  * `valid:true` by the gates of their day; these tests pin that the
  * current gate rejects BOTH recorded contention shapes while keeping
  * every recorded clean capture valid. The numbers are verbatim from
  * the committed BENCH_r09.json / BENCH_LAST.json artifacts. */
class BenchGateSpec extends AnyFunSuite {

  test("round-9 driver capture (BENCH_r09.json, 293.8s contended) stamps invalid") {
    // start was itself slow (1.12 s vs 0.26-0.42 steady state), which
    // hid the 0.611 s mid-run contention sample behind drift 0.545
    val r = BenchGate.evaluate(
      startSec = 1.121900082,
      midSecs = Seq(0.384994913, 0.611476269, 0.366507494, 0.33484667,
        0.343801058),
      endSec = 0.339470749,
      stealPct = 0.06977234401349072,
      otherBusyPct = 0.09805477686985761,
      loadMax = 9.29638671875, nCpus = 32)
    assert(!r.valid)
    assert(r.maxDrift > BenchGate.MaxDriftBound,
      s"0.611/0.335 must read as drift ${r.maxDrift} > 1.5")
  }

  test("round-9 closing capture (191.7s clean) stays valid") {
    val r = BenchGate.evaluate(
      startSec = 0.955601112,
      midSecs = Seq(0.4235, 0.3308, 0.318, 0.3062, 0.3349),
      endSec = 0.407966028,
      stealPct = 0.1061308239289631,
      otherBusyPct = 0.2934350052788172,
      loadMax = 5.36083984375, nCpus = 32)
    assert(r.valid, s"maxDrift ${r.maxDrift}, min ${r.minSample}")
  }

  test("round-9 judge 193.8s clean re-run stays valid") {
    val r = BenchGate.evaluate(
      startSec = 0.956145716,
      midSecs = Seq(0.393, 0.313, 0.335, 0.295, 0.374),
      endSec = 0.26400184,
      stealPct = 0.024692892111178553,
      otherBusyPct = 0.13674179411277243,
      loadMax = 3.3525390625, nCpus = 32)
    assert(r.valid, s"maxDrift ${r.maxDrift}, min ${r.minSample}")
  }

  test("a uniformly slow boot fails the absolute band even at drift 1.0") {
    // the failure mode no ratio can see: hypervisor/frequency-level
    // degradation slowing EVERY sample equally
    val r = BenchGate.evaluate(0.9, Seq(0.8, 0.82, 0.81), 0.8,
      stealPct = 0.1, otherBusyPct = 0.1, loadMax = 2.0, nCpus = 32)
    assert(!r.valid)
    assert(r.maxDrift <= BenchGate.MaxDriftBound) // only the band catches it
    assert(r.minSample >= BenchGate.DefaultQ1BandSec)
  }

  test("unmeasurable signals (-1) do not veto; loadavg is the fallback only") {
    val clean = BenchGate.evaluate(0.95, Seq(0.3, 0.32), 0.31,
      stealPct = -1.0, otherBusyPct = -1.0, loadMax = 10.0, nCpus = 32)
    assert(clean.valid) // loadMax 10 < 16 = cpus/2
    val loaded = BenchGate.evaluate(0.95, Seq(0.3, 0.32), 0.31,
      stealPct = -1.0, otherBusyPct = -1.0, loadMax = 20.0, nCpus = 32)
    assert(!loaded.valid) // other_busy unmeasurable -> loadavg ceiling applies
    val measured = BenchGate.evaluate(0.95, Seq(0.3, 0.32), 0.31,
      stealPct = 0.1, otherBusyPct = 1.6, loadMax = 20.0, nCpus = 32)
    assert(measured.valid) // measured other_busy clears loadavg (self-load)
  }
}
