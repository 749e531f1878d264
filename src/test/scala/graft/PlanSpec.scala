package graft

/** Physical-plan invariants for the shipped queries (the properties
  * PLANS.md documents). These are the load-bearing scale guarantees —
  * pushdown, pruning, broadcast dims, top-k without a global sort, no
  * cartesian candidate generation — asserted so a refactor that
  * silently degrades a plan fails CI, not the 100 TB run. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q2: both predicates and the column pruning reach the parquet scan") {
    val p = plan("q2_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p.linesIterator.take(5).mkString("\n"))
    assert(p.contains("l_returnflag"), "expected pushed filter on l_returnflag")
  }

  test("q3: dimension joins broadcast, fact side streams") {
    assert(plan("q3_join_agg").contains("BroadcastHashJoin"))
  }

  test("q4: top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q4_topk").contains("TakeOrderedAndProject"))
  }

  test("no shipped dedup/similarity plan contains a cartesian product") {
    for (q <- Seq("dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "dedup_embedding_cosine", "ann_lsh_topk")) {
      assert(!plan(q).contains("CartesianProduct"),
        s"$q plans a cartesian product")
    }
  }

  test("ann queries broadcast the query side") {
    assert(plan("ann_bruteforce_topk").contains("Broadcast"))
    assert(plan("ann_lsh_topk").contains("Broadcast"))
  }

  test("decontamination broadcasts the benchmark side (train side never shuffles)") {
    assert(plan("text_contamination").contains("BroadcastHashJoin"))
  }

  test("dedup index probe: candidate id filter reaches the shingle item scan") {
    // build once into the per-SF store, then inspect the probe's plan
    val p = plan("dedup_index_probe")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("bm25 search: term predicate pushed to postings scan, terms broadcast") {
    SparkEntry.queries("text_bm25_build")(spark, dir).count() // persist index
    val p = plan("text_bm25_search")
    assert(p.contains("Broadcast"), "query-term probe should broadcast")
    assert(!p.contains("CartesianProduct"))
    // the split's whole point: the search scan is pruned by the term
    // IN-predicate against the term-indexed postings item
    assert(p.contains("PushedFilters: [In(term"),
      s"expected term IN pushdown in postings scan:\n$p")
  }

  test("range join plans as equi-join on bucket ids, never nested loop") {
    val p = plan("events_range_attrib")
    assert(!p.contains("BroadcastNestedLoop"), "range join degenerated to nested loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("nb classify: class stats broadcast, no cartesian, argmax is a combinable min_by") {
    val p = plan("text_nb_classify")
    assert(!p.contains("CartesianProduct"),
      "the docs x classes frame must broadcast, never cartesian")
    assert(p.contains("Broadcast"), "class stats should broadcast")
    // the per-doc argmax must be a partially-aggregated min_by keyed by
    // doc (map-side combine; the old row_number window paid a full sort
    // shuffle of docs x classes and a single-pass rank) — and no window
    // may remain in the plan at all
    assert(p.contains("min_by"),
      s"argmax should plan as a min_by aggregate:\n$p")
    assert(p.contains("partial_min_by"),
      "the argmax aggregation lost its map-side partial combine")
    assert(!p.contains("windowspecdefinition"),
      "classify should no longer plan a window for the argmax")
  }

  test("curation pipeline: one window exchange, no cartesian, single rollup") {
    val p = plan("pipeline_curation")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("profiler: single aggregate pass, no joins") {
    val p = plan("profile_orders")
    assert(!p.contains("Join"), "profiler should be join-free")
    assert(!p.contains("CartesianProduct"))
  }

  test("ivf search: probe-list filter reaches the stored assignment scan") {
    // the split's whole point — search reads only the probed lists'
    // row groups of the cid-indexed persisted index
    SparkEntry.queries("ann_ivf_build")(spark, dir).count() // persist index
    val p = plan("ann_ivf_search")
    assert(p.contains("cid"), "expected cid probe filter in the search plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("edit-distance join: segment-filter equi-joins, never nested loop") {
    val p = plan("dedup_edit_distance")
    assert(!p.contains("BroadcastNestedLoop"),
      "segment filter degenerated to nested loop")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("hamming index probe: batch key list prunes the persisted chunk scan") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup => _, _}
    // force the localization path (plan-stats threshold 0 = always)
    SparkEntry.queries("dedup_hamming_index_build")(spark, dir).count()
    val c = graft.queries.PipelineQueries.hammingIndexCollection(spark, dir)
    val idx = DedupIndex.HammingIndex.load(c, "img")
    val batch = Multimodal.imageAHash(Multimodal.imageTable(
      spark.range(40, 44).toDF("doc_id"), rich = true))
    val p = DedupIndex.probeHammingIndex(idx, batch, idCol = "media_id",
        hashCol = "ahash", localizeBytes = 0L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(key") || p.contains("In(key,"),
      s"expected key IN pushdown in chunk scan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("hash kernels run inside whole-stage codegen (no fallback)") {
    // MinHashBands/ShingleSet generate static kernel calls; a
    // regression to CodegenFallback (or a Janino error in the
    // generated call) would drop the banding projection out of
    // WholeStageCodegen. AQE finalizes the plan only on execution, so
    // run the query first and inspect the final plan.
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    df.collect() // count() would execute a different (agg) plan
    val p = df.queryExecution.executedPlan.toString
    // compact plan strings mark WholeStageCodegen subtrees with "*(n)";
    // the banding Generate (posexplode over the minhash band array)
    // must carry the marker — a regression to CodegenFallback drops
    // exactly that stage out of codegen
    val bandedInCodegen = p.linesIterator.exists(l =>
      l.contains("*(") && (l.contains("Generate") || l.contains("posexplode")))
    assert(bandedInCodegen,
      "banding stage fell out of whole-stage codegen:\n" +
        p.linesIterator.filter(_.contains("Generate")).mkString("\n"))
  }

  test("round-5 operators: no cartesian products, per-row ops stay join-free") {
    // corpus-scale ops must never degenerate to nested-loop pairs
    for (q <- Seq("text_line_dedup", "text_lm_score", "dedup_select_canonical",
        "pipeline_pretrain", "events_ohlc", "events_ffill", "text_chunk",
        "profile_skew", "events_rate_anomaly", "sample_temperature")) {
      assert(!plan(q).contains("CartesianProduct"), s"$q plans a cartesian product")
    }
    // chunking is pure per-row work: the only plausible join would be a
    // planner regression
    assert(!plan("text_chunk").contains("Join"), "text_chunk grew a join")
    // OHLC is one aggregate family — no join anywhere in the plan
    assert(!plan("events_ohlc").contains("Join"), "events_ohlc grew a join")
  }

  test("promoted text kernels compile under Janino and match interpreted eval") {
    // The struct/array kernels (TextStats, RepetitionStats,
    // MarkerCounts, WinnowFingerprint/Set) generate static Kernels
    // calls. UnsafeProjection.create would CATCH a Janino error and
    // silently fall back to interpreted eval; GenerateUnsafeProjection
    // throws instead — so this test fails loudly if the generated call
    // has a type mismatch, and then cross-checks codegen output against
    // the interpreted path bit-for-bit.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.expressions._

    val toks = ArrayData.toArrayData(
      "the cat sat on the mat the cat sat on a hat".split(" ").map(UTF8String.fromString))
    val child = BoundReference(0, ArrayType(StringType, containsNull = true), nullable = true)
    val exprs = Seq(
      TextStats(child, Seq("the", "on", "a")),
      RepetitionStats(child),
      MarkerCounts(child, Seq(Seq("the", "a"), Seq("le", "la"), Seq("der", "die"))),
      WinnowFingerprint(child, 3, 4),
      WinnowFingerprintSet(child, 3, 4),
      NGrams(child, 2),
      TokenChunks(child, 4, 3))
    val input = InternalRow(toks)
    for (e <- exprs) {
      val gen = GenerateUnsafeProjection.generate(Seq(e)) // throws on Janino failure
      val out = gen(input)
      assert(!out.isNullAt(0), s"${e.getClass.getSimpleName}: codegen returned null")
      e.dataType match {
        case s: StructType =>
          val g = out.getStruct(0, s.size)
          val ev = e.eval(input).asInstanceOf[InternalRow]
          for ((f, idx) <- s.fields.zipWithIndex)
            assert(g.get(idx, f.dataType) === ev.get(idx, f.dataType),
              s"${e.getClass.getSimpleName}.${f.name}: codegen != eval")
        case a: ArrayType =>
          val g = out.getArray(0).toObjectArray(a.elementType).toSeq
          val ev = e.eval(input).asInstanceOf[ArrayData].toObjectArray(a.elementType).toSeq
          assert(g === ev, s"${e.getClass.getSimpleName}: codegen != eval")
        case other => fail(s"unexpected result type $other")
      }
    }
  }
}
