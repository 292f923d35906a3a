package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the window-factor drift rule (r13 verdict #7): a slow compounding
  * uniform regression must alarm even though each individual run stays
  * under the 1.4 `window_regressed` bar, while host noise and recovering
  * runs must not. */
class BenchWindowSpec extends AnyFunSuite {

  test("compounding uniform regression under the 1.4 bar alarms") {
    // 1.25x/round compounding — the exact scenario the verdict names —
    // with every factor comfortably below 1.4 for the first rounds
    assert(BenchWindow.drift(Seq(1.0, 1.1), 1.25))
    assert(BenchWindow.drift(Seq(1.1, 1.25), 1.38))
  }

  test("a monotone but tiny rise (host noise) does not alarm") {
    assert(!BenchWindow.drift(Seq(1.00, 1.02), 1.05))
    assert(!BenchWindow.drift(Seq(1.10, 1.12), 1.16))
  }

  test("one fast run inside the suffix resets the alarm") {
    // drop in the middle breaks monotonicity
    assert(!BenchWindow.drift(Seq(1.0, 1.3), 1.2))
    // fast run at the suffix start: rise measured from IT, not the peak
    assert(!BenchWindow.drift(Seq(1.3, 1.0), 1.1))
  }

  test("needs a full DriftRuns-deep history") {
    assert(!BenchWindow.drift(Seq.empty, 2.0))
    assert(!BenchWindow.drift(Seq(1.0), 1.5))
  }

  test("the FULL rising suffix is considered, not a fixed 3-run tail") {
    // ancient slow era followed by a recovered, re-rising window: the
    // suffix (1.0, 1.1, 1.2) rises 1.2x >= 1.15 -> alarms regardless of
    // the old prefix
    assert(BenchWindow.drift(Seq(2.0, 1.0, 1.1), 1.2))
    // slow compounding (~4%/run): every 3-run slice stays under 1.15,
    // but the full suffix crosses it — the case a fixed tail misses
    // FOREVER (r14 review); this is the rule's reason to exist
    assert(BenchWindow.drift(Seq(1.0, 1.04, 1.08, 1.12), 1.17))
    // same series cut before the cumulative bar: quiet
    assert(!BenchWindow.drift(Seq(1.0, 1.04), 1.08))
    // the pre-r14 fixed-tail rule called this quiet (last-3 rise only
    // 1.083x); the full suffix 1.0 -> 1.3 is real drift
    assert(BenchWindow.drift(Seq(1.0, 1.2, 1.25), 1.3))
  }

  test("flat history plus one noisy window is not a multi-run rise") {
    // equality is not a rise: a strictly-flat era followed by a single
    // in-variance window must not read as sustained drift
    assert(!BenchWindow.drift(Seq(1.0, 1.0), 1.16))
    assert(!BenchWindow.drift(Seq(1.2, 1.2, 1.2), 1.38))
  }

  test("history round-trips through the sidecar JSONL") {
    val f = java.io.File.createTempFile("wf_hist", ".jsonl")
    f.deleteOnExit()
    f.delete()
    assert(BenchWindow.loadHistory(f).isEmpty)
    BenchWindow.appendHistory(f, 1.156, 63.4)
    BenchWindow.appendHistory(f, 1.2, 65.0)
    assert(BenchWindow.loadHistory(f) === Seq(1.156, 1.2))
  }
}
