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

  // ---------------------------------------------------------------------
  // Round-17 replay suite: FULL recorded r16 captures (committed verbatim
  // under src/test/resources/captures/, one JSON line each, exactly as
  // Bench wrote them) re-evaluated against the round-16 reference medians
  // (refs_r16.json — a frozen snapshot of BENCH_ANCHORS.json as of r16,
  // so later anchor refreshes can never move these pinned decisions).
  // The headline case: the round-16 judge's 378.7 s soft-contended
  // capture (steal 3.3%) passed the round-12 gate because every anchor
  // is sub-second and the solo re-times ran inside the same sustained
  // phase — the round-17 mid-weight-anchor and heavy-tail arms must
  // stamp it INVALID while every recorded gate-valid capture stays
  // valid.
  // ---------------------------------------------------------------------

  /** Parse a committed capture (the exact JSON line Bench.main wrote)
    * into the inputs BenchGate.evaluate takes. */
  private def loadCapture(resource: String): (Map[String, Double], Seq[BenchGate.SoloCheck], Seq[Double], Double, Double, Double) = {
    import org.json4s._
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/captures/$resource"), "UTF-8")
    val json = try org.json4s.jackson.JsonMethods.parse(src.mkString) finally src.close()
    def num(v: JValue): Double = v match {
      case JDouble(d) => d; case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble; case JLong(l) => l.toDouble
      case _ => -1.0
    }
    val queries = (json \ "queries") match {
      case JObject(fs) => fs.map { case (k, v) => k -> num(v) }.toMap
      case _ => Map.empty[String, Double]
    }
    val solo = (json \ "gate" \ "solo_checks") match {
      case JArray(items) => items.map { it =>
        BenchGate.SoloCheck(
          (it \ "name").values.toString,
          num(it \ "in_run"), num(it \ "solo"))
      }
      case _ => Nil
    }
    val sentinel = json \ "sentinel"
    val mids = (sentinel \ "mid_samples") match {
      case JArray(items) => items.map(it => num(it \ "sec"))
      case _ => Nil
    }
    val q1Samples = num(sentinel \ "start_sec") +: mids :+ num(sentinel \ "end_sec")
    (queries, solo, q1Samples, num(sentinel \ "cpu_steal_pct"),
      num(sentinel \ "other_busy_pct"), num(sentinel \ "proc_loadavg_max"))
  }

  /** The frozen r16 reference medians the replayed decisions were (and
    * stay) judged against. */
  private lazy val r16Refs: Map[String, Double] = {
    import org.json4s._
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/captures/refs_r16.json"), "UTF-8")
    val json = try org.json4s.jackson.JsonMethods.parse(src.mkString) finally src.close()
    (json \ "refs") match {
      case JObject(fs) => fs.collect {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
      }.toMap
      case _ => Map.empty
    }
  }

  private def replay(resource: String): BenchGate.Result = {
    val (inRun, solo, q1, steal, other, loadMax) = loadCapture(resource)
    BenchGate.evaluate(inRun, r16Refs, solo, q1, steal, other, loadMax, nCpus = 32)
  }

  test("r16 judge 378.7s soft-contended capture now stamps INVALID — via BOTH new arms") {
    val r = replay("r16_judge_contended_378.json")
    assert(!r.valid)
    // heavy-tail arm: steal 3.33% > 2 and 16 non-anchor queries over
    // 2.5x (the old gate saw anchors_over 1, solo_disagree 0)
    assert(r.heavyTailOver >= BenchGate.HeavyTailCountLimit,
      s"heavyTailOver=${r.heavyTailOver}")
    // mid-anchor arm: all three mid-weights ran 3.7-6.7x their refs
    assert(r.midAnchorsOver >= BenchGate.MidAnchorOverLimit,
      r.midAnchors.map(a => f"${a.name}=${a.ratio}%.2f").mkString(","))
    // and the old arms alone still would NOT have caught it
    assert(r.anchorsOver < BenchGate.AnchorOverLimit)
    assert(r.soloDisagree == 0)
  }

  test("r16 storm capture (360s, steal 5.4%) stays INVALID — old and new arms agree") {
    val r = replay("r16_runF_storm_360.json")
    assert(!r.valid)
    assert(r.anchorsOver >= BenchGate.AnchorOverLimit) // the old gate already caught it
    assert(r.heavyTailOver >= BenchGate.HeavyTailCountLimit) // the new arm agrees
  }

  test("every recorded r16 gate-valid capture stays VALID under the round-17 arms") {
    val validCaptures = Seq(
      "r16_runB_valid_222.json", // builder morning pair (steal 0.09/0.12%)
      "r16_runC_valid_217.json",
      "r16_runD_valid_253.json", // builder late pair (steal 0.85/1.06% -
      "r16_runE_valid_258.json", //   moderate co-tenant phases the gate certified)
      "r16_runG_valid_254.json", // builder closing capture (the committed BENCH_r16 reference)
      "r16_judge_clean_268.json") // judge's clean confirming re-run (steal 0.26%)
    for (c <- validCaptures) {
      val r = replay(c)
      assert(r.valid, s"$c: anchorsOver=${r.anchorsOver} midOver=${r.midAnchorsOver} " +
        s"heavyTail=${r.heavyTailOver} solo=${r.soloDisagree} min=${r.minSample}")
      assert(r.midAnchorsOver == 0,
        s"$c mids: " + r.midAnchors.map(a => f"${a.name}=${a.ratio}%.2f").mkString(","))
    }
  }

  test("heavy-tail cross-check needs BOTH halves: steal alone or breadth alone never vetoes") {
    // breadth without steal: a declared code change moved 6 queries 3x
    // but the hypervisor withheld nothing
    val refs6 = (1 to 8).map(i => s"q$i" -> 1.0).toMap
    val moved = (1 to 6).map(i => s"q$i" -> 3.0).toMap ++ Map("q7" -> 1.0, "q8" -> 1.1)
    val noSteal = BenchGate.evaluate(moved, refs6, Nil,
      q1Samples = Seq(0.4, 0.3, 0.31), stealPct = 0.3, otherBusyPct = 0.5,
      loadMax = 2.0, nCpus = 32)
    assert(noSteal.valid && noSteal.heavyTailOver == 6)
    // steal without breadth: a brief 3% steal blip that left the tail flat
    val flat = (1 to 8).map(i => s"q$i" -> 1.05).toMap
    val stealOnly = BenchGate.evaluate(flat, refs6, Nil,
      q1Samples = Seq(0.4, 0.3, 0.31), stealPct = 3.0, otherBusyPct = 3.1,
      loadMax = 2.0, nCpus = 32)
    assert(stealOnly.valid && stealOnly.heavyTailOver == 0)
    // both together: invalid
    val both = BenchGate.evaluate(moved ++ Map("q7" -> 1.0, "q8" -> 1.1), refs6, Nil,
      q1Samples = Seq(0.4, 0.3, 0.31), stealPct = 3.0, otherBusyPct = 3.1,
      loadMax = 2.0, nCpus = 32)
    assert(!both.valid)
  }

  test("one mid-anchor over 3x does not invalidate (declared changes move single queries)") {
    val inRun = Map("store_delete_where" -> 20.0, "text_nb_train" -> 3.6,
      "text_substring_index_build" -> 1.6)
    val r = BenchGate.evaluate(inRun, r16Refs, Nil,
      q1Samples = Seq(0.4, 0.3, 0.31), stealPct = 0.1, otherBusyPct = 0.2,
      loadMax = 2.0, nCpus = 32)
    assert(r.valid)
    assert(r.midAnchorsOver == 1)
  }

  test("mid-anchors are excluded from solo-candidate picks (judged by their own band)") {
    val refs = Map("store_delete_where" -> 1.0, "other" -> 1.0)
    val inRun = Map("store_delete_where" -> 9.0, "other" -> 9.0)
    assert(BenchGate.soloCandidates(inRun, refs) == Seq("other"))
  }
}
