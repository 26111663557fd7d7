package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention evidence ([[LoadMarkers]]) — the r15
  * self-adjudication seam. The markers must be LIVE on this machine (a
  * -1 across the board would make `check_bench_regression.py`'s refusal
  * logic vacuously pass old-style), and the other-load arithmetic the
  * gate thresholds on must behave at its edges. The refusal logic itself
  * is exercised by `tools/check_bench_regression.py --self-test`
  * (run_gates.sh gate 0) against synthetic contended/clean runs.
  */
class LoadMarkersSpec extends AnyFunSuite {

  test("loadavg reads a live non-negative value on this machine") {
    val la = LoadMarkers.loadAvg()
    assert(la >= 0.0, s"loadavg unavailable: $la")
  }

  test("jvm count sees at least this JVM") {
    assert(LoadMarkers.jvmCount() >= 1)
  }

  test("process CPU time is live and monotonic") {
    val c0 = LoadMarkers.procCpuSec()
    assert(c0 > 0.0, s"process CPU unavailable: $c0")
    // burn a little CPU so the counter must advance
    var x = 0L
    var i = 0
    while (i < 20000000) { x ^= i; i += 1 }
    assert(x != Long.MinValue) // keep the loop un-eliminable
    assert(LoadMarkers.procCpuSec() >= c0)
  }
}
