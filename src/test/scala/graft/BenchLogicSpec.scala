package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic pins for the bench's self-retry adjudication — no
  * SparkSession needed. The rule these pin caused a real round-11
  * review finding: an errored retry must never replace a successful
  * first pass with its fast-fail time.
  */
class BenchLogicSpec extends AnyFunSuite {

  test("needsRetry trips only past 1.5x of max(baseline, floor), on success, with a baseline") {
    // over threshold: 1.0s baseline → trigger at 1.5s
    assert(Bench.needsRetry(1.51, None, Some(1.0)))
    assert(!Bench.needsRetry(1.49, None, Some(1.0)))
    // sub-floor baselines use the 0.25s floor: trigger at 0.375s
    assert(Bench.needsRetry(0.40, None, Some(0.01)))
    assert(!Bench.needsRetry(0.35, None, Some(0.01)))
    // an errored first pass is not retried (its time is meaningless)
    assert(!Bench.needsRetry(99.0, Some("boom"), Some(1.0)))
    // no baseline entry → no retry (the bench never depends on the file)
    assert(!Bench.needsRetry(99.0, None, None))
  }

  test("adjudicateRetry: errored retry keeps the valid first pass; successful retry reports the min") {
    // the round-11 review finding: first pass 1.6s valid, retry
    // fast-fails at 0.1s — the result must be (1.6, no error), never
    // (0.1, error)
    assert(Bench.adjudicateRetry(1.6, 0.1, Some("transient")) == (1.6, None))
    // successful retry: min of the two passes, whichever side it is
    assert(Bench.adjudicateRetry(1.6, 0.9, None) == (0.9, None))
    assert(Bench.adjudicateRetry(0.8, 1.2, None) == (0.8, None))
  }

  test("needsAdjudication trips past 1.3x of max(baseline, floor), on success, with a baseline") {
    // 1.0s pin → trigger at 1.3s (below the 1.5x retry on purpose)
    assert(Bench.needsAdjudication(1.31, None, Some(1.0)))
    assert(!Bench.needsAdjudication(1.29, None, Some(1.0)))
    // sub-floor pins use the 0.25s floor: trigger at 0.325s
    assert(Bench.needsAdjudication(0.33, None, Some(0.01)))
    assert(!Bench.needsAdjudication(0.32, None, Some(0.01)))
    // an errored reading is not adjudicated; no pin → no adjudication
    assert(!Bench.needsAdjudication(99.0, Some("boom"), Some(1.0)))
    assert(!Bench.needsAdjudication(99.0, None, None))
  }

  test("adjudicateFinal: min over sweep + successful quiet runs; errored runs contribute nothing") {
    assert(Bench.adjudicateFinal(2.26,
      Seq((1.0, None), (1.05, None), (1.2, None))) == 1.0)
    // sweep reading can itself be the min
    assert(Bench.adjudicateFinal(0.9, Seq((1.0, None), (1.1, None))) == 0.9)
    // an errored quiet run's fast-fail time never enters the min
    assert(Bench.adjudicateFinal(2.0,
      Seq((0.1, Some("boom")), (1.5, None))) == 1.5)
    // all quiet runs errored → the sweep reading stands
    assert(Bench.adjudicateFinal(2.0,
      Seq((0.1, Some("a")), (0.2, Some("b")))) == 2.0)
  }

  test("adjudicatedArtifactValue: sweep + every run auditable, errored runs marked, min judged") {
    val v = Bench.adjudicatedArtifactValue(2.26,
      Seq((1.0, None), (0.1, Some("boom: stage 3"))))
    assert(v ==
      """{"sweep":2.26,"runs":[1.0,"adj_error: boom: stage 3"],"min":1.0}""",
      v)
    // error strings bounded and JSON-escaped
    val long = Bench.adjudicatedArtifactValue(1.0, Seq((0.1, Some("x" * 999))))
    assert(long.length < 300, long)
    val quoted = Bench.adjudicatedArtifactValue(1.0, Seq((0.1, Some("a\"b"))))
    assert(quoted.contains("a\\\"b"), quoted)
  }

  test("canaryRatio: current/pin; absent or degenerate pin disables normalization") {
    assert(Bench.canaryRatio(1.15, Some(1.0)).contains(1.15))
    assert(Bench.canaryRatio(0.9, Some(1.2)).exists(r =>
      math.abs(r - 0.75) < 1e-12))
    // no pin / zero / negative pin → None, never a division or a
    // fabricated 1.0
    assert(Bench.canaryRatio(1.0, None).isEmpty)
    assert(Bench.canaryRatio(1.0, Some(0.0)).isEmpty)
    assert(Bench.canaryRatio(1.0, Some(-1.0)).isEmpty)
  }

  test("normalizeRatios divides the ambient common mode out of every gate ratio") {
    // the r17 regime: a uniformly 15% hotter box inflates every raw
    // ratio together; normalized readings recover ~1.0x
    val raw = Seq("a" -> 1.15, "b" -> 1.38, "c" -> 2.3)
    val norm = Bench.normalizeRatios(raw, 1.15).toMap
    assert(math.abs(norm("a") - 1.0) < 1e-12)
    assert(math.abs(norm("b") - 1.2) < 1e-12)
    assert(math.abs(norm("c") - 2.0) < 1e-12)
    // a genuinely slow query stays visibly slow after normalization —
    // the canary must never mask a real regression
    assert(norm("c") > 1.9)
    // degenerate divisor refuses loudly rather than inverting signs
    intercept[IllegalArgumentException] {
      Bench.normalizeRatios(raw, 0.0)
    }
  }

  test("retryArtifactValue: errored retry's fast-fail time is marked, never a bare measurement") {
    // clean retry: plain two-element array, both passes auditable
    assert(Bench.retryArtifactValue(1.6, 0.9, None) == "[1.6,0.9]")
    // errored retry (the round-12 ADVICE item): the fast-fail 0.1s
    // carries its error string so no reader mistakes it for a pass
    val marked = Bench.retryArtifactValue(1.6, 0.1, Some("boom: stage 3"))
    assert(marked == "[1.6,0.1,\"retry_error: boom: stage 3\"]", marked)
    // error strings are bounded and JSON-escaped
    val long = Bench.retryArtifactValue(1.0, 0.1, Some("x" * 999))
    assert(long.length < 300 && long.endsWith("\"]"), long)
    val quoted = Bench.retryArtifactValue(1.0, 0.1, Some("a\"b"))
    assert(quoted.contains("a\\\"b"), quoted)
  }

  test("dispersionReport: p90/p50 + slow-side outliers; alarm on either; silent under 5 samples") {
    // the r18 failure mode: a quiet sweep (p50 ~0.95) with ONE query
    // at 2.23x its pin while the canary read FAST — the outlier leg
    // must flag it even though p90/p50 stays in band
    val quietButOneHot = Seq(
      "a" -> 0.9, "b" -> 0.95, "c" -> 1.0, "d" -> 1.05, "e" -> 0.92,
      "f" -> 0.97, "g" -> 1.1, "h" -> 0.88, "i" -> 1.02, "s23" -> 2.23)
    val Some((spread1, out1, alarm1)) = Bench.dispersionReport(quietButOneHot)
    assert(alarm1 && out1.map(_._1) == Seq("s23"),
      s"outlier leg missed the hot query: $out1 (spread $spread1)")
    // a uniformly quiet sweep: no alarm, no outliers
    val quiet = Seq("a" -> 0.9, "b" -> 0.95, "c" -> 1.0, "d" -> 1.05,
      "e" -> 0.92, "f" -> 0.97, "g" -> 1.1, "h" -> 0.88)
    val Some((_, out2, alarm2)) = Bench.dispersionReport(quiet)
    assert(!alarm2 && out2.isEmpty, s"false alarm on a quiet sweep: $out2")
    // a uniformly HOT sweep (every ratio ~1.8): the canary's job, not
    // this alarm's — outliers need r > outlierFactor*p50, and the
    // spread stays flat
    val hotCommon = Seq("a" -> 1.7, "b" -> 1.75, "c" -> 1.8, "d" -> 1.85,
      "e" -> 1.72, "f" -> 1.77, "g" -> 1.9, "h" -> 1.68)
    val Some((_, out3, alarm3)) = Bench.dispersionReport(hotCommon)
    assert(!alarm3 && out3.isEmpty,
      s"dispersion alarm fired on a common-mode-hot sweep: $out3")
    // wide spread without a single >1.5x-of-p50 point past 1.0 still
    // alarms via the band leg
    val spreadWide = Seq("a" -> 0.5, "b" -> 0.55, "c" -> 0.6, "d" -> 0.9,
      "e" -> 0.95, "f" -> 0.6, "g" -> 0.58, "h" -> 0.92)
    val Some((sp4, _, alarm4)) = Bench.dispersionReport(spreadWide)
    assert(alarm4 && sp4 > Bench.dispersionBand, s"band leg missed: $sp4")
    // bounded-sample silence: percentile spread over 4 ratios is noise
    assert(Bench.dispersionReport(quiet.take(4)).isEmpty)
  }
}
