package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays RECORDED bench captures against the round-12 gate (no
  * Spark involved — the gate is pure). The q1-ratio family it replaces
  * failed in both directions in round 10: the driver's contended
  * 277.2 s capture passed (13.5× single-query inflation landed between
  * the q1 samples) while the judge's genuinely clean 193.79 s run
  * failed (q1 run-to-run noise alone reads ratio ~1.5). These tests
  * pin that the current gate classifies BOTH of those captures
  * correctly, plus the round-11 driver capture (contended in the
  * events/profile family). Numbers are verbatim from the committed
  * artifacts: BENCH_LAST.json at commits 19818bb (round-10 judge
  * clean), b63e748 (round-11 driver), BENCH_r10.json's sentinel, and
  * the round-10 VERDICT's solo re-times; references are
  * BENCH_ANCHORS.json's medians of the two committed clean captures. */
class BenchGateSpec extends AnyFunSuite {

  /** BENCH_ANCHORS.json medians (round-9 judge 193.82 s + round-10
    * judge 193.79 s clean captures) for the ten anchors. */
  private val refs = Map(
    "q1_agg" -> 0.209314, "q2_filter_pushdown" -> 0.260666,
    "q9_distinct_agg" -> 0.223936, "text_stats" -> 0.132903,
    "text_lm_score" -> 0.14561, "events_hourly_counts" -> 0.379637,
    "events_props_agg" -> 0.251324, "profile_categories" -> 0.329469,
    "multimodal_decode" -> 0.212841, "sample_stratified" -> 0.337741,
    // non-anchor refs used by the solo-candidate pick below
    "dedup_semantic_probe" -> 0.890937, "dedup_simhash" -> 2.966323,
    "dedup_semantic" -> 2.806363, "profile_correlation" -> 1.967487)

  test("round-10 judge clean capture (193.79s) stamps VALID — the old gate's false reject") {
    // anchor in-run times verbatim from 19818bb:BENCH_LAST.json; every
    // one within 1.1x of its reference
    val inRun = Map(
      "q1_agg" -> 0.20131619, "q2_filter_pushdown" -> 0.250813672,
      "q9_distinct_agg" -> 0.21108241, "text_stats" -> 0.137316884,
      "text_lm_score" -> 0.147215989, "events_hourly_counts" -> 0.370030212,
      "events_props_agg" -> 0.249151201, "profile_categories" -> 0.328465772,
      "multimodal_decode" -> 0.214555146, "sample_stratified" -> 0.303894308,
      "dedup_semantic_probe" -> 0.914, "dedup_simhash" -> 2.933,
      "dedup_semantic" -> 2.94, "profile_correlation" -> 1.93)
    // a clean run has nothing over 2x its reference -> nothing is
    // re-timed, so solo JIT asymmetry can never false-reject it
    val solo = BenchGate.soloCandidates(inRun, refs).map(n =>
      BenchGate.SoloCheck(n, inRun(n), inRun(n)))
    assert(solo.isEmpty)
    val r = BenchGate.evaluate(inRun, refs, solo,
      // q1 samples verbatim: start 0.955, min 0.274 — the OLD gate read
      // 0.413/0.274 = 1.506 > 1.5 and stamped this clean capture invalid
      q1Samples = Seq(0.954680777, 0.382057069, 0.356397628, 0.413383794,
        0.331089966, 0.321176445, 0.274424465),
      stealPct = 0.0982, otherBusyPct = 0.2332,
      loadMax = 2.503, nCpus = 32)
    assert(r.valid, s"anchorsOver=${r.anchorsOver} solo=${r.soloDisagree} min=${r.minSample}")
    assert(r.anchorsOver == 0)
  }

  test("round-10 driver capture (277.2s contended) stamps INVALID via solo disagreement — the old gate's false accept") {
    // Its q1 sentinel block passed the old gate (max_drift 1.48, steal
    // 1.50%, other_busy 1.51%) while dedup_semantic_probe ran 13.5x its
    // clean time — the contention landed entirely between q1 samples.
    // In-run vs solo values verbatim from the round-10 VERDICT's
    // measured re-times of the three most-inflated queries.
    val inRun = Map(
      "dedup_semantic_probe" -> 12.27, "dedup_simhash" -> 17.56,
      "dedup_semantic" -> 14.91, "profile_correlation" -> 5.70)
    val candidates = BenchGate.soloCandidates(inRun, refs)
    assert(candidates.toSet == Set("dedup_semantic_probe", "dedup_simhash",
      "dedup_semantic"), s"picked $candidates") // top-3 by inflation
    val solo = Seq(
      BenchGate.SoloCheck("dedup_semantic_probe", 12.27, 0.91),
      BenchGate.SoloCheck("dedup_simhash", 17.56, 2.93),
      BenchGate.SoloCheck("dedup_semantic", 14.91, 2.94))
    val r = BenchGate.evaluate(inRun, refs, solo,
      q1Samples = Seq(1.033336266, 0.358356125, 0.349595604, 0.432050338,
        0.327154719, 0.373809586, 0.291615549),
      stealPct = 1.4968, otherBusyPct = 1.5082,
      loadMax = 8.425, nCpus = 32)
    assert(!r.valid)
    assert(r.soloDisagree == 3)
  }

  test("round-11 driver capture (234.6s contended) stamps INVALID via anchors") {
    // anchor in-run times verbatim from b63e748:BENCH_LAST.json — the
    // events/profile family inflated 3.8-7.3x while q1 stayed clean
    val inRun = Map(
      "q1_agg" -> 0.203031725, "q2_filter_pushdown" -> 0.253572541,
      "q9_distinct_agg" -> 0.245525589, "text_stats" -> 0.123571605,
      "text_lm_score" -> 0.137296823, "events_hourly_counts" -> 1.427797023,
      "events_props_agg" -> 1.382799123, "profile_categories" -> 2.40255233,
      "multimodal_decode" -> 0.224395729, "sample_stratified" -> 0.325421648)
    val r = BenchGate.evaluate(inRun, refs, soloChecks = Nil,
      q1Samples = Seq(0.947497414, 1.447496974, 0.514484496, 0.320865912,
        0.325301419, 0.309771073, 0.316204386),
      stealPct = 0.0226, otherBusyPct = 0.1016,
      loadMax = 8.897, nCpus = 32)
    assert(!r.valid)
    assert(r.anchorsOver == 3, // events_hourly_counts, events_props_agg, profile_categories
      r.anchors.filter(_.over).map(_.name).mkString(","))
  }

  test("a uniformly slow boot fails the absolute q1 band even with agreeing anchors") {
    // the failure mode no ratio can see: hypervisor/frequency-level
    // degradation slowing EVERY sample (and every reference-relative
    // anchor... if refs were also captured degraded) equally
    val r = BenchGate.evaluate(Map.empty, Map.empty, Nil,
      q1Samples = Seq(0.9, 0.8, 0.82, 0.81, 0.8),
      stealPct = 0.1, otherBusyPct = 0.1, loadMax = 2.0, nCpus = 32)
    assert(!r.valid)
    assert(r.minSample >= BenchGate.DefaultQ1BandSec)
  }

  test("unmeasurable signals (-1) do not veto; loadavg is the fallback only") {
    val q1 = Seq(0.95, 0.3, 0.32, 0.31)
    val clean = BenchGate.evaluate(Map.empty, Map.empty, Nil, q1,
      stealPct = -1.0, otherBusyPct = -1.0, loadMax = 10.0, nCpus = 32)
    assert(clean.valid) // loadMax 10 < 16 = cpus/2; no refs -> anchors unmeasurable
    val loaded = BenchGate.evaluate(Map.empty, Map.empty, Nil, q1,
      stealPct = -1.0, otherBusyPct = -1.0, loadMax = 20.0, nCpus = 32)
    assert(!loaded.valid) // other_busy unmeasurable -> loadavg ceiling applies
    val measured = BenchGate.evaluate(Map.empty, Map.empty, Nil, q1,
      stealPct = 0.1, otherBusyPct = 1.6, loadMax = 20.0, nCpus = 32)
    assert(measured.valid) // measured other_busy clears loadavg (self-load)
  }

  test("one anchor over 2x does not invalidate (declared changes move single queries)") {
    val inRun = Map("q1_agg" -> 0.55, "text_stats" -> 0.13) // q1 2.6x (declared change)
    val r = BenchGate.evaluate(inRun, refs, Nil,
      q1Samples = Seq(0.6, 0.45, 0.44),
      stealPct = 0.1, otherBusyPct = 0.2, loadMax = 2.0, nCpus = 32)
    assert(r.valid)
    assert(r.anchorsOver == 1)
  }

  test("soloCandidates: suspicion-driven — only queries over 2x their ref; none without refs") {
    val someRefs = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val inRun = Map("a" -> 5.0, "b" -> 1.2, "c" -> 2.5, "d" -> 99.0,
      "q1_agg" -> 99.0) // d has no ref; anchors never picked
    assert(BenchGate.soloCandidates(inRun, someRefs) == Seq("a", "c"))
    assert(BenchGate.soloCandidates(inRun, Map.empty).isEmpty)
  }

  test("solo disagreement needs the absolute gap too — sub-second JIT asymmetry never trips it") {
    assert(!BenchGate.SoloCheck("cheap", 0.9, 0.3).disagree) // 3x but 0.6s gap
    assert(BenchGate.SoloCheck("heavy", 12.27, 0.91).disagree)
  }
}
