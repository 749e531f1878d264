package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators._
import graft.store.MemoryOptimizer

/** Unit-level checks of the pipeline operators (the end-to-end oracle
  * checks live in SparkEntry/Verify). */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  test("exact dedup collapses identical texts keeping min id") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("shingles + jaccard behave on short and normal texts") {
    val df = Seq(("a b c d e", "a b c d x")).toDF("t1", "t2")
    val j = df.select(Dedup.jaccard(Dedup.shingles(col("t1")), Dedup.shingles(col("t2"))))
      .head().getDouble(0)
    // shingles t1: {abc,bcd,cde}, t2: {abc,bcd,cdx} -> 2/4
    assert(math.abs(j - 0.5) < 1e-9)
    val short = Seq(("ab", "ab")).toDF("t1", "t2")
    assert(short.select(Dedup.jaccard(Dedup.shingles(col("t1")), Dedup.shingles(col("t2"))))
      .head().getDouble(0) == 1.0)
  }

  test("minhash LSH finds a planted near-dup and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val near = base + " extra"
    val other = "completely different words describing some unrelated subject entirely here now"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash hamming distance small for near-dups, large for unrelated") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val df = Seq((base, base + " extra", "totally different unrelated content words here"))
      .toDF("a", "b", "c")
    val r = df.select(
      Dedup.hamming64(Dedup.simhash(col("a")), Dedup.simhash(col("b"))).as("near"),
      Dedup.hamming64(Dedup.simhash(col("a")), Dedup.simhash(col("c"))).as("far")).head()
    assert(r.getAs[Number](0).longValue() < r.getAs[Number](1).longValue())
  }

  test("leakage-free split keeps every near-dup cluster in one split") {
    // 300 docs; pairs chain 0-1-2 (one cluster), 10-11, and 20-21-22-23
    val docs = (0L until 300L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val out = Sampling.leakageFreeSplit(docs, pairs,
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      .select($"doc_id", $"cluster", $"split").as[(Long, Long, String)].collect()
    assert(out.length == 300)
    val byDoc = out.map(r => r._1 -> r).toMap
    // cluster members share cluster id AND split — the leakage invariant
    for (group <- Seq(Seq(0L, 1L, 2L), Seq(10L, 11L), Seq(20L, 21L, 22L, 23L))) {
      assert(group.map(byDoc(_)._2).distinct.size == 1, s"cluster ids differ in $group")
      assert(group.map(byDoc(_)._3).distinct.size == 1, s"splits differ in $group")
    }
    // singletons cluster as themselves; every doc gets exactly one split
    assert(byDoc(100L)._2 == 100L)
    assert(out.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    val nTrain = out.count(_._3 == "train")
    assert(nTrain > 150 && nTrain < 270, s"train got $nTrain of 300 at 0.7")
    // deterministic across runs; single-split edge assigns everything
    val again = Sampling.leakageFreeSplit(docs, pairs,
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    assert(again == out.map(r => (r._1, r._3)).toSet)
    val one = Sampling.leakageFreeSplit(docs, pairs, Seq("all" -> 1.0))
      .select($"split").distinct().as[String].collect().toSeq
    assert(one == Seq("all"))
  }

  test("hash sampling is deterministic, stratified, and append-stable") {
    val d = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "stratum")
    val s1 = Sampling.stratifiedHashSample(d, "stratum", "doc_id",
      Map("a" -> 0.5), default = 0.1).select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedHashSample(d, "stratum", "doc_id",
      Map("a" -> 0.5), default = 0.1).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same inputs must give the identical sample")
    // membership is a pure row property: sampling a subset agrees
    val sub = Sampling.hashSample(d.filter($"doc_id" < 100), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val full = Sampling.hashSample(d, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(sub == full.filter(_ < 100))
    // fractions land in the right ballpark
    val nA = s1.count(_ % 2 == 0); val nB = s1.count(_ % 2 == 1)
    assert(nA > 175 && nA < 325, s"stratum a kept $nA of 500 at 0.5")
    assert(nB > 10 && nB < 110, s"stratum b kept $nB of 500 at 0.1")
  }

  test("cross-corpus overlap counts shared distinct n-grams") {
    val train = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated words here now")).toDF("doc_id", "text")
    val eval_ = Seq((10L, "beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val r = Dedup.crossCorpusOverlap(train, eval_, n = 3, minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // train doc 1 shares 3-grams "beta gamma delta", "gamma delta epsilon",
    // "delta epsilon zeta" with the eval doc; doc 2 shares none
    assert(r == Seq((1L, 10L, 3L)), s"got $r")
  }

  test("connected components: chains collapse transitively, min-id labels") {
    // 1-2, 2-3 (chain), 5-6, isolated pair 8-9, plus a 4-cycle 10-11-12-13
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("id_a", "id_b")
    // both execution paths must agree: driver union-find (default for
    // small edge lists) and the distributed min-label loop (forced)
    for (localCap <- Seq(1000000, 0)) {
      val cc = Dedup.connectedComponents(pairs, maxLocalEdges = localCap)
        .as[(Long, Long)].collect().toMap
      assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L, s"chain($localCap): $cc")
      assert(cc(5L) == 5L && cc(6L) == 5L)
      assert(cc(8L) == 8L && cc(9L) == 8L)
      assert(Seq(10L, 11L, 12L, 13L).forall(cc(_) == 10L), s"cycle($localCap): $cc")
      assert(Dedup.connectedComponents(pairs.limit(0), maxLocalEdges = localCap).isEmpty)
    }
  }

  test("simhash multi-index finds exactly the plain-pigeonhole pair set") {
    // HmSearch-style 1-bit-variant probing (radius >= 4 default) is a
    // pure candidate-generation change: the hamming predicate in the
    // join makes both schemes emit exactly the hamming<=radius pairs,
    // so their outputs must be identical — the multi-index just gets
    // there with 2^16 chunk keys instead of 2^9.
    val docs = sf("documents").select($"doc_id", $"text")
    val w = split($"text", " ")
    val aug = docs.unionByName(docs.filter($"doc_id" < 30)
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1))))
    def pairs(multi: Boolean) =
      Dedup.simhashPairs(aug, radius = 6, useMultiIndex = Some(multi))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val m = pairs(multi = true)
    val p = pairs(multi = false)
    assert(m == p, s"multi-only=${m -- p} plain-only=${p -- m}")
    assert(m.nonEmpty)
  }

  test("simhash128 multi-index finds exactly the plain-pigeonhole pair set") {
    // same equivalence as the 64-bit test, over the two-long signature
    // and its boundary-safe chunk layout: the hamming predicate in the
    // join makes both candidate schemes emit exactly the hamming<=15
    // pairs, so outputs must be identical — the multi-index just gets
    // there with 16-bit chunk keys instead of plain pigeonhole's 8-bit.
    val docs = sf("documents").select($"doc_id", $"text")
    val w = split($"text", " ")
    val aug = docs.unionByName(docs.filter($"doc_id" < 30)
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1))))
    def pairs(multi: Boolean) =
      Dedup.simhashPairs128(aug, radius = 15, useMultiIndex = Some(multi))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val m = pairs(multi = true)
    val p = pairs(multi = false)
    assert(m == p, s"multi-only=${m -- p} plain-only=${p -- m}")
    assert(m.nonEmpty)
  }

  test("simhash128 radius 15 covers the documented fraction of true jaccard pairs") {
    // The dedup_simhash CONTRACT (PLANS.md): a fixed 15-bit search
    // radius over the 128-bit signature recovers all but a residual
    // tail of the exact-Jaccard(>= 0.5) pair set — minhash is the
    // recall-guaranteed operator, simhash trades that tail for the
    // banded-bucket cost profile. This pins the measured coverage so
    // the documented trade can't silently rot: at the sf0.1 probe it
    // was 309/311; here the same fixture shape at test scale.
    val docs = sf("documents").select($"doc_id", $"text")
    val w = split($"text", " ")
    val aug = docs.unionByName(docs.filter($"doc_id" < 50)
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1))))
    val truePairs = Dedup.ngramJaccardPairs(aug, threshold = 0.5, k = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val simPairs = Dedup.simhashPairs128(aug, radius = 15)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val covered = truePairs.intersect(simPairs).size
    assert(truePairs.size >= 50, s"fixture too small: ${truePairs.size} true pairs")
    assert(covered.toDouble / truePairs.size >= 0.93,
      s"radius-15 coverage regressed: $covered/${truePairs.size}")
  }

  test("simhash128 distance separates near-dups from unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val df = Seq((base, base + " extra", "totally different unrelated content words here"))
      .toDF("a", "b", "c")
    val r = df.select(
      Dedup.hamming128(Dedup.simhash128(col("a")), Dedup.simhash128(col("b"))).as("near"),
      Dedup.hamming128(Dedup.simhash128(col("a")), Dedup.simhash128(col("c"))).as("far")).head()
    assert(r.getAs[Number](0).longValue() < r.getAs[Number](1).longValue())
  }

  test("distributed components at forced scale: converge within diameter bound") {
    // 800 disjoint 6-node chains (4000 edges) through the FORCED
    // distributed min-label path. Diameter 5 ⇒ labels settle in 5
    // propagation rounds + 1 no-change round; maxIter = 7 proves the
    // empirical round bound (the loop throws past maxIter), and the
    // labels must equal the driver union-find path's exactly.
    val chainEdges = (0 until 800).flatMap { c =>
      val base = c * 10L
      (0 until 5).map(i => (base + i, base + i + 1))
    }.toDF("id_a", "id_b")
    val dist = Dedup.connectedComponents(chainEdges, maxIter = 7, maxLocalEdges = 0)
      .as[(Long, Long)].collect().toMap
    val local = Dedup.connectedComponents(chainEdges)
      .as[(Long, Long)].collect().toMap
    assert(dist == local, "distributed labels must equal union-find labels")
    assert(dist.size == 4800 && dist.values.toSet.size == 800)
    assert((0 until 800).forall(c => dist(c * 10L + 5) == c * 10L))
    // and the convergence guard FIRES (rather than silently splitting
    // clusters) when a component's diameter exceeds the round budget
    val path = (0 until 39).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 5, maxLocalEdges = 0)
    }
  }

  test("vector ops: dot/norm/cosine") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(2.0f, 0.0f)))
      .toDF("x", "y", "x2")
    val r = df.select(
      VectorOps.dot(col("x"), col("y")),
      VectorOps.cosine(col("x"), col("x2")),
      VectorOps.norm(col("x2"))).head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
  }

  test("brute-force top-k ranks an identical vector first") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 10L)
    val top = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy("rank").select("nbr_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("IVF top-k finds the identical vector through its probed list") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i % 4) 1.0f else 0.01f * i))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 39L)
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, nlist = 8, nprobe = 4)
      .orderBy("rank").select("nbr_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rank").select("nbr_id").as[Long].collect().toSeq
    // nearest neighbor (rank 1) must survive probing
    assert(ivf.head == exact.head, s"ivf=$ivf exact=$exact")
    assert(ivf.size == 3)
  }

  test("embedding cosine dedup: banded LSH finds the same pairs as exhaustive") {
    val e = sf("embeddings").select($"vec_id", $"embedding")
    // near-identical copies with non-uniform scaling (cosine < 1)
    val aug = e.unionByName(e.filter($"vec_id" < 20)
      .withColumn("vec_id", $"vec_id" + 100000L)
      .withColumn("embedding",
        zip_with($"embedding", sequence(lit(0), size($"embedding") - 1),
          (x, i) => x.cast("double") * (lit(1.0) + (i % 5).cast("double") / 100.0))))
    def pairs(ex: Boolean) =
      Dedup.embeddingCosinePairs(aug, threshold = 0.9, exhaustive = ex)
        .as[(Long, Long)].collect().toSet
    val lsh = pairs(ex = false)
    val exact = pairs(ex = true)
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, spurious ${lsh -- exact}")
    assert(exact.nonEmpty)
  }

  test("IVF with k-means quantizer reaches mean recall@5 >= 0.9") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 10)
    val ivf = Similarity.ivfTopK(e, q, k = 5, nlist = 16, nprobe = 8, kmeansIters = 3)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = bf.map { case (_, s) => s.count(ivf.contains).toDouble / s.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 = $mean")
  }

  test("IVF index persists through the store and searches identically") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 5)
    val idx = Similarity.buildIvfIndex(e, nlist = 8, kmeansIters = 2)
    val direct = Similarity.ivfSearch(idx, q, k = 3, nprobe = 4)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val c = tempCollection("ivf_index")
    idx.save(c, "emb")
    val loaded = Similarity.IvfIndex.load(c, "emb")
    val viaStore = Similarity.ivfSearch(loaded, q, k = 3, nprobe = 4)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(viaStore == direct)
    assert(direct.nonEmpty)
    // probed-list pushdown: the persisted scan carries a cid filter
    val plan = Similarity.ivfSearch(loaded, q, k = 3, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cid"), "expected cid probe filter in the plan")
    cleanup(c)
  }

  test("bm25 index append: incremental equals full rebuild") {
    val docs = sf("documents").select($"doc_id", $"text")
    val part1 = docs.filter($"doc_id" % 5 =!= 0)
    val part2 = docs.filter($"doc_id" % 5 === 0)
    val c = tempCollection("bm25_append")
    Search.buildAndSaveBm25Index(part1, c, "bm25")
    val appended = Search.appendToBm25Index(part2, c, "bm25")
    val full = Search.buildBm25Index(docs)
    assert(appended.nDocs == full.nDocs && appended.sumDl == full.sumDl)
    val at = appended.terms.as[(String, Long, Long)].collect().toSet
    val ft = full.terms.as[(String, Long, Long)].collect().toSet
    assert(at == ft, s"merged dictionary diverged: only-appended=${at -- ft} only-full=${ft -- at}")
    // search through the appended index scores identically to a fresh
    // full build (df/dl/stats all merged correctly)
    val qt = full.terms.orderBy($"cnt".desc, $"term").limit(3)
      .select($"term").as[String].collect().toSeq
      .zipWithIndex.map { case (t, _) => (0L, t) }.toDF("query_id", "term")
    val sa = Search.bm25SearchTopK(appended, qt, k = 10).collect().map(_.toSeq).toSet
    val sf_ = Search.bm25SearchTopK(full, qt, k = 10).collect().map(_.toSeq).toSet
    assert(sa == sf_ && sa.nonEmpty)
    cleanup(c)
  }

  test("ivf/ivfpq index append: frozen quantizer, appended vectors searchable") {
    val e = sf("embeddings")
    val part1 = e.filter($"vec_id" % 4 =!= 0)
    val part2 = e.filter($"vec_id" % 4 === 0)
    // exact copies of two APPENDED vectors as probes: the originals
    // must come back at rank 1 with cosine 1.0
    val q = part2.filter($"vec_id" < 8).withColumn("vec_id", $"vec_id" + 100000)

    val c = tempCollection("ivf_append")
    Similarity.buildIvfIndex(part1, nlist = 8, kmeansIters = 2).save(c, "emb")
    val idx = Similarity.appendToIvfIndex(part2, c, "emb")
    // append ≡ frozen-quantizer assignment of the full set
    val expect = Similarity.assignToCentroids(e, idx.centroids)
      .select($"nbr_id", $"cid").as[(Long, Long)].collect().toMap
    val got = idx.assigned.select($"nbr_id", $"cid").as[(Long, Long)].collect().toMap
    assert(got == expect)
    val top = Similarity.ivfSearch(idx, q, k = 1, nprobe = 8).collect()
    assert(top.nonEmpty && top.forall(r =>
      r.getAs[Long]("nbr_id") == r.getAs[Long]("query_id") - 100000 &&
        r.getAs[Double]("cos") == 1.0), top.mkString(","))
    cleanup(c)

    val c2 = tempCollection("ivfpq_append")
    Similarity.buildIvfPqIndex(part1, nlist = 8, kmeansIters = 1,
      m = 8, ksub = 16, pqIters = 1, residual = true).save(c2, "ivfpq")
    val idx2 = Similarity.appendToIvfPqIndex(part2, c2, "ivfpq")
    val top2 = Similarity.ivfPqSearch(idx2, q, k = 1, nprobe = 8, rerank = 64)
      .collect()
    assert(top2.nonEmpty && top2.forall(r =>
      r.getAs[Long]("nbr_id") == r.getAs[Long]("query_id") - 100000 &&
        r.getAs[Double]("cos") == 1.0), top2.mkString(","))
    cleanup(c2)
  }

  test("packShards: doc joins the pack where its first token lands") {
    import graft.operators.Sampling
    // one shard, known md5 order; 3 docs of 5 tokens, context 8:
    // cum 5, 10, 15 -> starts at 0, 5, 10 -> packs 0, 0, 1
    val docs = Seq((0L, "a b c d e"), (8L, "f g h i j"), (16L, "k l m n o"))
      .toDF("doc_id", "text") // all ≡ 0 mod 8 -> same shard
    val out = Sampling.packShards(docs, nShards = 8, contextTokens = 8)
    assert(out.select("shard").distinct().count() == 1)
    val byOrder = out.orderBy("pack", "doc_id")
      .select("pack", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(byOrder.map(_._2).forall(_ == 5))
    assert(byOrder.map(_._1).sorted == Seq(0L, 0L, 1L))
  }

  test("video frame sampler seeks the right frames and flags bad containers") {
    val ids = Seq(3L, 4L).toDF("id")
    val vids = Multimodal.videoTable(ids, width = 4, height = 2, nFrames = 10, fps = 5)
    val sampled = Multimodal.sampleFrames(vids, every = 4)
      .select("media_id", "frame_idx", "n_frames").as[(Long, Int, Int)]
      .collect().toSet
    // frames 0, 4, 8 of 10 for each id
    assert(sampled == Set((3L, 0, 10), (3L, 4, 10), (3L, 8, 10),
      (4L, 0, 10), (4L, 4, 10), (4L, 8, 10)))
    // corrupt containers yield the sentinel row, not a crash: bad
    // magic, payload shorter than the header, truncated frame data
    val gvid = "GVID".getBytes("US-ASCII")
    val truncated = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(gvid).putInt(4).putInt(2).putInt(10).putInt(5).array()
    val junk = Seq(
      (9L, Array[Byte](1, 2, 3, 4, 5)),
      (10L, Array[Byte](1, 2)),
      (11L, truncated)).toDF("media_id", "payload")
    val bad = Multimodal.sampleFrames(junk, every = 2)
      .select("frame_idx").as[Int].collect().toSeq
    assert(bad == Seq(-1, -1, -1))
  }

  test("range join matches points to intervals exactly once, no nested loop") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val points = Seq((1L, ts(5)), (2L, ts(15)), (3L, ts(45)), (4L, ts(59)))
      .toDF("pid", "ts")
    // interval B spans several buckets — the match must still be unique
    val intervals = Seq(("A", ts(0), ts(10)), ("B", ts(4), ts(50)))
      .toDF("iid", "w_start", "w_end")
    val joined = RangeJoin.pointInInterval(points, intervals,
      "ts", "w_start", "w_end", bucketWidth = 300L) // 5-min buckets
    val got = joined.select("pid", "iid").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "A"), (1L, "B"), (2L, "B"), (3L, "B")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "range join must stay an equi-join")
  }

  test("range join rejects runaway intervals and drops inverted ones") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq((1L, ts("2024-01-01 00:05:00"))).toDF("pid", "ts")
    // inverted interval (end < start) is dropped, not exploded
    val inverted = Seq(("X", ts("2024-01-01 01:00:00"), ts("2024-01-01 00:00:00")))
      .toDF("iid", "w_start", "w_end")
    assert(RangeJoin.pointInInterval(points, inverted,
      "ts", "w_start", "w_end", bucketWidth = 60L).count() == 0)
    // a sentinel far-future end date fails fast instead of OOMing
    val runaway = Seq(("Y", ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("iid", "w_start", "w_end")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, runaway,
        "ts", "w_start", "w_end", bucketWidth = 60L).count()
    }
    assert(ex.getMessage.contains("spans more than") ||
      Option(ex.getCause).exists(_.getMessage.contains("spans more than")))
  }

  test("PQ codebook stays dense when clusters empty (duplicate seeds)") {
    // seeds 0-3 are IDENTICAL vectors: on iteration 1 the tie-break
    // drains three of the four codes — the codebook must keep all
    // (sub, code) rows (empty clusters retain their previous centroid)
    // or the flattened ADC LUT stride corrupts
    val corpus = ((0 until 4).map(i => (i.toLong, Array.fill(8)(1.0f))) ++
      (4 until 40).map(i => (i.toLong, Array.tabulate(8)(j => (i * 7 + j * 3) % 5 - 2f))))
      .toDF("vec_id", "embedding")
    val idx = Similarity.buildPqIndex(corpus, m = 4, ksub = 4, iters = 2)
    assert(idx.codebooks.count() == 4L * 4L, "codebook must stay dense m×ksub")
    val q = corpus.filter($"vec_id" === 20L)
    val res = Similarity.pqSearch(idx, q, k = 3, rerank = 16)
      .select("nbr_id").as[Long].collect()
    assert(res.length == 3)
  }

  test("range join with equi keys scopes matches to the key") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val points = Seq((1L, 7L, ts(5)), (2L, 8L, ts(5))).toDF("pid", "user_id", "ts")
    val intervals = Seq((7L, ts(0), ts(10))).toDF("user_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "w_start", "w_end",
        equiKeys = Seq("user_id"), bucketWidth = 600L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("BM25 ranks the term-dense short doc first and respects idf") {
    val docs = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark engine with lots of extra padding words here making it much longer overall"),
      (3L, "unrelated text about other things"),
      (4L, "common common common common")).toDF("doc_id", "text")
    val q = Seq((0L, "spark"), (0L, "engine")).toDF("query_id", "term")
    val out = Search.bm25TopK(docs, q, k = 3).orderBy("rank")
      .select("doc_id", "n_terms").as[(Long, Long)].collect().toSeq
    // doc 1: high tf, short → first; doc 2 matches both terms too
    assert(out.map(_._1).take(2) == Seq(1L, 2L), s"got $out")
    assert(out.forall(_._2 <= 2))
    // doc 3/4 never match
    assert(!out.map(_._1).contains(3L) && !out.map(_._1).contains(4L))
  }

  test("BM25 topTerms picks most frequent non-stopwords deterministically") {
    val docs = Seq(
      (1L, "alpha beta the gamma alpha"),
      (2L, "alpha beta of beta")).toDF("doc_id", "text")
    val terms = Search.topTerms(docs, 2, Seq("the", "of"))
      .orderBy("r").select("term").as[String].collect().toSeq
    assert(terms == Seq("alpha", "beta")) // 3 alphas, 3 betas — tie → lexicographic
  }

  test("PQ ADC + exact re-rank reaches mean recall@5 >= 0.9") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 10)
    val idx = Similarity.buildPqIndex(e, m = 8, ksub = 16, iters = 3)
    val pq = Similarity.pqSearch(idx, q, k = 5, rerank = 128)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = bf.map { case (_, s) => s.count(pq.contains).toDouble / s.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 = $mean")
  }

  test("PQ index persists through the store and searches identically") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 5)
    val idx = Similarity.buildPqIndex(e, m = 8, ksub = 16, iters = 2)
    assert(idx.codes.select(size($"codes")).head().getInt(0) == 8)
    val direct = Similarity.pqSearch(idx, q, k = 3, rerank = 64)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val c = tempCollection("pq_index")
    idx.save(c, "emb")
    val loaded = Similarity.PqIndex.load(c, "emb")
    assert(loaded.m == idx.m && loaded.ksub == idx.ksub)
    val viaStore = Similarity.pqSearch(loaded, q, k = 3, rerank = 64)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(viaStore == direct)
    assert(direct.nonEmpty)
    cleanup(c)
  }

  test("IVF-PQ search stays in probed lists and reaches mean recall@5 >= 0.8") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 10)
    val idx = Similarity.buildIvfPqIndex(e, nlist = 16, kmeansIters = 2,
      m = 8, ksub = 32, pqIters = 2)
    val res = Similarity.ivfPqSearch(idx, q, k = 5, nprobe = 8)
    val got = res.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = bf.map { case (_, s) => s.count(got.contains).toDouble / s.size }
    val mean = recalls.sum / recalls.size
    // compounded loss: coarse probing (IVF) × code quantization (PQ)
    assert(mean >= 0.8, s"mean recall@5 = $mean")
  }

  test("residual IVF-PQ: ADC tracks true similarity at least as well as raw codes") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 10)
    def recall(residual: Boolean): Double = {
      val idx = Similarity.buildIvfPqIndex(e, nlist = 16, kmeansIters = 2,
        m = 8, ksub = 16, pqIters = 2, residual = residual)
      assert(idx.residual == residual)
      // small rerank ⇒ recall is dominated by ADC fidelity, which is
      // what residual encoding improves
      val got = Similarity.ivfPqSearch(idx, q, k = 5, nprobe = 16, rerank = 24)
        .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
      val bf = Similarity.bruteForceTopK(e, q, k = 5)
        .select("query_id", "nbr_id").as[(Long, Long)].collect().groupBy(_._1)
      val rs = bf.map { case (_, s) => s.count(got.contains).toDouble / s.size }
      rs.sum / rs.size
    }
    val raw = recall(residual = false)
    val res = recall(residual = true)
    assert(res >= raw - 0.05, s"residual=$res raw=$raw") // at worst comparable
    assert(res >= 0.5, s"residual ADC recall collapsed: $res")
  }

  test("residual IVF-PQ roundtrips the residual flag through the store") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 5)
    val idx = Similarity.buildIvfPqIndex(e, nlist = 8, kmeansIters = 1,
      m = 8, ksub = 16, pqIters = 1, residual = true)
    val direct = Similarity.ivfPqSearch(idx, q, k = 3, nprobe = 4, rerank = 64)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val c = tempCollection("ivfpq_res")
    idx.save(c, "emb")
    val loaded = Similarity.IvfPqIndex.load(c, "emb")
    assert(loaded.residual)
    val viaStore = Similarity.ivfPqSearch(loaded, q, k = 3, nprobe = 4, rerank = 64)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(viaStore == direct)
    cleanup(c)
  }

  test("IVF-PQ index persists through the store with cid pruning") {
    val e = sf("embeddings")
    val q = e.filter($"vec_id" < 5)
    val idx = Similarity.buildIvfPqIndex(e, nlist = 8, kmeansIters = 1,
      m = 8, ksub = 16, pqIters = 1)
    val direct = Similarity.ivfPqSearch(idx, q, k = 3, nprobe = 4, rerank = 64)
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val c = tempCollection("ivfpq_index")
    idx.save(c, "emb")
    val loaded = Similarity.IvfPqIndex.load(c, "emb")
    assert(loaded.m == idx.m && loaded.ksub == idx.ksub)
    val viaStore = Similarity.ivfPqSearch(loaded, q, k = 3, nprobe = 4, rerank = 64)
    val viaStoreSet = viaStore
      .select("query_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(viaStoreSet == direct)
    assert(direct.nonEmpty)
    // probed-list pushdown reaches the persisted codes scan
    val plan = Similarity.ivfPqSearch(loaded, q, k = 3, nprobe = 4, rerank = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cid"), "expected cid probe filter in the plan")
    cleanup(c)
  }

  test("multi-band LSH retrieves every near-dup neighbor at sized bits") {
    // LSH's honest regime: neighbors with a real density gap (cos ≥
    // 0.9), not the top-5 of uniform-random vectors (cos ≈ 0.4, no gap
    // — only degenerate constants "work" there). Sized bits must stay
    // non-degenerate AND surface every planted near-copy at rank 1.
    val e = sf("embeddings").select($"vec_id", $"embedding")
    val aug = e.unionByName(e.filter($"vec_id" < 20)
      .withColumn("vec_id", $"vec_id" + 100000L)
      .withColumn("embedding",
        zip_with($"embedding", sequence(lit(0), size($"embedding") - 1),
          (x, i) => x.cast("double") * (lit(1.0) + (i % 5).cast("double") / 100.0))))
    val bits = Similarity.sizedBits(aug)
    assert(bits >= 6, s"sized bits degenerate: $bits")
    val q = e.filter($"vec_id" < 10)
    val top1 = Similarity.lshTopK(aug, q, k = 5)
      .filter($"rank" === 1).select("query_id", "nbr_id")
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { id =>
      assert(top1.get(id).contains(id + 100000L),
        s"query $id: expected near-copy ${id + 100000L} at rank 1, got ${top1.get(id)}")
    }
  }

  test("winnow fingerprint: gram count, determinism, shift resistance") {
    val df = Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"),
      (3L, "zero one two three four five six seven")).toDF("doc_id", "text")
    val r = df.select($"doc_id", TextAnalysis.winnowFingerprint($"text").as("w"))
      .select($"doc_id", $"w.n_grams", $"w.n_fp", $"w.fp_sum")
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect()
    assert(r(0)._2 == 3) // 7 tokens, k=5 -> 3 grams
    assert((r(0)._3, r(0)._4) == (r(1)._3, r(1)._4), "identical docs must collide")
    assert(r(2)._2 == 4) // 8 tokens -> 4 grams
  }

  test("profiler: approx quantiles track exact within tolerance") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def grab(approx: Boolean) =
      Profiler.numericProfile(li, Seq("l_quantity", "l_extendedprice"), approx)
        .orderBy("column").select("column", "p50", "p95")
        .as[(String, Double, Double)].collect()
    val exact = grab(approx = false)
    val appr = grab(approx = true)
    exact.zip(appr).foreach { case ((c, e50, e95), (_, a50, a95)) =>
      assert(math.abs(a50 - e50) <= math.max(1e-6, math.abs(e50) * 0.01), s"$c p50")
      assert(math.abs(a95 - e95) <= math.max(1e-6, math.abs(e95) * 0.01), s"$c p95")
    }
    val full = Profiler.numericProfile(li, Seq("l_quantity")).head()
    assert(full.getAs[Long]("n") > 0 && full.getAs[Long]("n_null") == 0L)
  }

  test("categorical profile: mode tie-break and approx-distinct variant") {
    val df = Seq(("a", "x"), ("b", "x"), ("b", "y"), (null, "y"))
      .toDF("c1", "c2")
    val r = Profiler.categoricalProfile(df, Seq("c1", "c2"))
      .orderBy("column").collect()
    val c1 = r(0); val c2 = r(1)
    assert(c1.getAs[Long]("n") == 3 && c1.getAs[Long]("n_null") == 1)
    assert(c1.getAs[Long]("n_distinct") == 2)
    assert(c1.getAs[String]("top_value") == "b" && c1.getAs[Long]("top_count") == 2)
    // tie between x and y (2 each) → larger value wins deterministically
    assert(c2.getAs[String]("top_value") == "y" && c2.getAs[Long]("top_count") == 2)
    val approx = Profiler.categoricalProfile(df, Seq("c1"), approxDistinct = true)
      .head().getAs[Long]("n_distinct")
    assert(approx == 2) // HLL exact at this cardinality
  }

  test("histogram: clamped edge bins, widths, total count") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 150.0).toDF("v")
    val h = Profiler.histogram(df, "v", bins = 10, lo = 0.0, hi = 100.0)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"))).toMap
    assert(h(0L) == 3)          // -5 clamps in, 0.0 and 9.9
    assert(h(1L) == 1 && h(5L) == 1)
    assert(h(9L) == 2)          // 99.9 and clamped 150
    assert(h.values.sum == 7)
  }

  test("text analysis: tokens, quality bounds, langid, fingerprint stability") {
    val df = Seq(
      ("The cat sat on the mat, and it was happy.", "en-ish"),
      ("", "empty")).toDF("text", "tag")
    val r = TextAnalysis.stats(df, "text").filter($"tag" === "en-ish").head()
    assert(r.getAs[Int]("n_tokens") == 10)
    val q = r.getAs[Double]("quality")
    assert(q >= 0.0 && q <= 1.0)
    assert(df.filter($"tag" === "empty").select(TextAnalysis.tokenCount($"text"))
      .head().getInt(0) == 0)

    val lang = Seq("the cat and the dog is here", "der hund ist nicht mit der katze",
      "el perro es un animal que corre", "le chat est dans la maison",
      "il cane è anche nel giardino perché questo è essere",
      "você não está aqui mas isso também é como sempre",
      "het huis is niet groot maar deze tuin heeft een boom",
      "これは日本語のテキストです", "한국어로 작성된 문서입니다",
      "этот документ написан на русском языке", "这是一个中文文档")
      .toDF("text").select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(lang == Seq("en", "de", "es", "fr", "it", "pt", "nl", "ja", "ko", "ru", "zh"), lang.toString)

    val fps = Seq("Hello, World!", "hello world", "HELLO  world.")
      .toDF("text").select(TextAnalysis.fingerprint($"text")).as[String].collect().toSeq
    assert(fps.distinct.size == 1, "case/punct/space variants must collide")
  }

  test("as-of join picks most recent right row at or before left time") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, t("2024-01-01 10:00:00")),
      (2L, 7L, t("2024-01-01 12:00:00")),
      (3L, 8L, t("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 7L, t("2024-01-01 09:30:00")),
      (101L, 7L, t("2024-01-01 11:00:00")),
      (102L, 8L, t("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
        Map("event_id" -> "right_id"))
      .orderBy("event_id").select("event_id", "right_id").as[(Long, Option[Long])]
      .collect().toSeq
    assert(out == Seq((1L, Some(100L)), (2L, Some(101L)), (3L, Some(102L))))
  }

  test("as-of join: salted output equals unsalted under key skew") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val left = ((1 to 300).map(i => (i.toLong, 7L, t(i % 59))) ++
      Seq((1001L, 8L, t(5)))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 7L, t(1)), (101L, 7L, t(40)), (102L, 8L, t(1)))
      .toDF("event_id", "user_id", "ts")
    def run(s: Int) = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
        Map("event_id" -> "rid"), saltBuckets = s)
      .select("event_id", "rid").as[(Long, Option[Long])].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(run(8) == run(1))
  }

  test("sessionize splits on gaps > threshold") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 5L, "click", 1.0, "{}"),
      (2L, t("2024-01-01 10:10:00"), 5L, "view", 1.0, "{}"),
      (3L, t("2024-01-01 11:30:00"), 5L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Events.sessionize(ev, 30).orderBy("event_id")
      .select("session_seq").as[Long].collect().toSeq
    assert(s == Seq(1L, 1L, 2L))
  }

  test("funnel: ordering constraint counts only post-stage events") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, t("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, t("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (3L, t("2024-01-01 10:10:00"), 1L, "purchase", 1.0),
      // user 2: click BEFORE first view → stage 2 not reached
      (4L, t("2024-01-01 09:00:00"), 2L, "click", 1.0),
      (5L, t("2024-01-01 10:00:00"), 2L, "view", 1.0),
      // user 3: view only
      (6L, t("2024-01-01 10:00:00"), 3L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val f = Events.funnel(ev, Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(f == Map("01_view" -> 3L, "02_click" -> 1L, "03_purchase" -> 1L), s"$f")
  }

  test("multimodal: meta-only projection and fake decode shape") {
    val docs = Seq((1L, "abc"), (2L, "defghij")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    val meta = Multimodal.metaOnly(media).orderBy("media_id").collect()
    assert(meta.map(_.getInt(2)).toSeq == Seq(3, 7))
    val feats = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(feats.forall(_.getAs[Seq[Double]]("feature").size == 8))
    val sampled = Multimodal.samplePayload(media, 2).orderBy("media_id").collect()
    assert(sampled.map(_.getAs[Int]("sampled_len")).toSeq == Seq(2, 4))
  }

  test("real image codec: PNG round-trip is bit-exact, resize rescales") {
    val ids = Seq(3L, 17L).toDF("media_id")
    val media = Multimodal.imageTable(ids, width = 16, height = 12)
    // payloads are real PNGs (magic bytes)
    val png = media.orderBy("media_id").head().getAs[Array[Byte]]("payload")
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val dec = Multimodal.decodeImage(media).orderBy("media_id").collect()
    dec.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 16 && r.getInt(2) == 12)
      // closed-form channel mean from the fixture's pixel formula
      val expR = (for (y <- 0 until 12; x <- 0 until 16)
        yield (id * 7 + x * 3 + y * 5) % 256).sum.toDouble / 192.0
      assert(math.abs(r.getDouble(3) - expR) < 1e-9, s"mean_r of $id")
    }
    val small = Multimodal.resizeImages(media, 8, 6)
    val rdec = Multimodal.decodeImage(small).orderBy("media_id").collect()
    assert(rdec.forall(r => r.getInt(1) == 8 && r.getInt(2) == 6))
  }

  test("repetition signals: distinct ratio, modal bigram, dup trigrams") {
    val df = Seq(
      (1L, "a b a b a b"),          // heavy repetition
      (2L, "one two three four"),   // no repetition
      (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df).orderBy("doc_id").collect()
    // doc 1: 6 tokens, 2 distinct; bigrams: "a b"×3, "b a"×2 → top 3/5;
    // trigrams: "a b a"×2, "b a b"×2 → 4/4 positions duplicated
    assert(r(0).getAs[Int]("n_tokens") == 6)
    assert(math.abs(r(0).getAs[Double]("distinct_ratio") - 2.0 / 6) < 1e-6)
    assert(math.abs(r(0).getAs[Double]("top_bigram_share") - 3.0 / 5) < 1e-6)
    assert(math.abs(r(0).getAs[Double]("dup_trigram_share") - 1.0) < 1e-6)
    assert(r(1).getAs[Double]("distinct_ratio") == 1.0)
    assert(r(1).getAs[Double]("dup_trigram_share") == 0.0)
    assert(r(2).getAs[Int]("n_tokens") == 0 && r(2).getAs[Double]("distinct_ratio") == 0.0)
  }

  test("real audio codec: WAV round-trip via javax.sound matches formula") {
    val ids = Seq(5L).toDF("media_id")
    val media = Multimodal.audioTable(ids, nSamples = 64, sampleRate = 8000)
    val wav = media.head().getAs[Array[Byte]]("payload")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val r = Multimodal.decodeAudio(media).head()
    assert(r.getAs[Long]("n_samples") == 64)
    assert(r.getAs[Int]("channels") == 1 && r.getAs[Int]("sample_rate") == 8000)
    val expected = (0 until 64).map(i => ((5L * 31 + i * 17) % 65536) - 32768)
    assert(r.getAs[Long]("sum_abs") == expected.map(math.abs).sum)
    assert(r.getAs[Int]("min_s") == expected.min && r.getAs[Int]("max_s") == expected.max)
  }

  test("graft functions are callable from pure SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f), "a b c d")).toDF("id", "v1", "v2", "text")
      .createOrReplaceTempView("gf_probe")
    val r = spark.sql(
      """SELECT graft_cosine(v1, v2) AS cos,
        |       graft_simhash(split(text, ' ')) AS sh,
        |       graft_winnow_fp(split(text, ' '), 2, 2).n_grams AS ng,
        |       size(graft_winnow_fp_set(split(text, ' '), 2, 2)) AS nfp,
        |       graft_repetition(split(text, ' ')).n_distinct AS nd,
        |       graft_pq_adc(array(1, 0), array(0.5D, 1.5D, 2.5D, 3.5D), 2) AS adc,
        |       graft_interleave_bits(array(2L, 1L), 2) AS z,
        |       size(graft_ngrams(split(text, ' '), 2)) AS nbg,
        |       graft_token_chunks(split(text, ' '), 3, 2) AS chunks
        |FROM gf_probe""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Long]("ng") == 3L) // 4 tokens, k=2 -> 3 grams
    assert(r.getAs[Int]("nfp") >= 1) // set kernel emits the selected minima
    assert(r.getAs[Int]("nd") == 4)
    // lut stride 2: codes (1,0) -> lut[0*2+1] + lut[1*2+0] = 1.5 + 2.5
    assert(math.abs(r.getAs[Double]("adc") - 4.0) < 1e-12)
    assert(r.getAs[Long]("z") == 6L) // (2,1): bit1 dim0 -> pos2, bit0 dim1 -> pos1
    assert(r.getAs[Int]("nbg") == 3) // non-distinct bigrams of 4 tokens
    // "a b c d" size 3 stride 2: [a b c], [c d] (stop-at-end)
    assert(r.getSeq[String](r.fieldIndex("chunks")) == Seq("a b c", "c d"))
    // registration is idempotent
    graft.functions.GraftFunctions.register(spark)
  }

  test("graft_period maps index values to storage period keys across layouts") {
    graft.functions.GraftFunctions.register(spark)
    Seq(
      (java.sql.Timestamp.valueOf("1997-03-31 23:59:59"), "1997-03-31", "1997-03", "1997-Q1", "1997"),
      (java.sql.Timestamp.valueOf("2024-02-29 00:00:00"), "2024-02-29", "2024-02", "2024-Q1", "2024"),
      (java.sql.Timestamp.valueOf("2000-10-01 00:00:00"), "2000-10-01", "2000-10", "2000-Q4", "2000"),
      (java.sql.Timestamp.valueOf("0099-07-04 12:00:00"), "0099-07-04", "0099-07", "0099-Q3", "0099")
    ).toDF("ts", "d", "m", "q", "y").createOrReplaceTempView("gp_probe")
    val bad = spark.sql(
      """SELECT * FROM gp_probe
        |WHERE graft_period(ts, 'daily')     <> d
        |   OR graft_period(ts, 'monthly')   <> m
        |   OR graft_period(ts, 'quarterly') <> q
        |   OR graft_period(ts, 'yearly')    <> y""".stripMargin).count()
    assert(bad == 0L)
    // period keys match what the store actually lays out: group counts
    // by graft_period == per-period dir row counts
    val c = tempCollection("gp_layout")
    c.write("item", sampleData, monthlyLayout = true)
    val item = c.path.resolve("item")
    val byFn = c.item("item").data
      .selectExpr("graft_period(index, 'monthly') AS p")
      .groupBy("p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byDir = item.resolve("data").listDirs
      .filter(_.startsWith(graft.store.Collection.MonthCol + "="))
      .map { d =>
        val p = d.stripPrefix(graft.store.Collection.MonthCol + "=")
        p -> spark.read.parquet(item.resolve("data").resolve(d).toString).count()
      }.toMap
    assert(byFn == byDir, s"fn=$byFn dirs=$byDir")
    intercept[Exception](spark.sql("SELECT graft_period(timestamp'2024-01-01', 'weekly')").collect())
    cleanup(c)
  }

  test("memory optimizer downcasts within observed ranges") {
    val df = Seq((1L, 100000L, 1.5)).toDF("tiny", "medium", "dbl")
    val out = MemoryOptimizer.shrinkTypes(df)
    assert(out.schema("tiny").dataType.typeName == "byte")
    assert(out.schema("medium").dataType.typeName == "integer")
    assert(out.schema("dbl").dataType.typeName == "float")
  }

  test("zorder: interleave kernel bit placement, cluster shrinks per-file spans on BOTH columns") {
    // kernel: bit i of dim j -> position i*d + j
    val z = Seq((Array(1L, 1L), Array(2L, 1L), Array(3L, 0L)))
      .toDF("a", "b", "c")
      .select(
        graft.functions.expressions.interleave_bits(col("a"), 2).as("za"),
        graft.functions.expressions.interleave_bits(col("b"), 2).as("zb"),
        graft.functions.expressions.interleave_bits(col("c"), 2).as("zc"))
      .head()
    assert(z.getLong(0) == 3L) // (1,1): bits at pos 0 and 1
    assert(z.getLong(1) == 6L) // (2,1): pos 2 (bit1 of dim0) + pos 1 (bit0 of dim1)
    assert(z.getLong(2) == 5L) // (3,0): pos 0 + pos 2

    val li = sf("lineitem").select($"l_partkey", $"l_suppkey", $"l_orderkey")
    def fileSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
      df.write.mode("overwrite").parquet(dir)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"l_partkey") - min($"l_partkey")).cast("double").as("ps"),
          (max($"l_suppkey") - min($"l_suppkey")).cast("double").as("ss"))
        .agg(avg($"ps"), avg($"ss")).head()
      graft.store.FsOps.deleteRecursively(java.nio.file.Paths.get(dir))
      (spans.getDouble(0), spans.getDouble(1))
    }
    // 16 curve partitions = 4 top-bit splits = 2 per dimension, so each
    // file should cover ~1/4 of each column's range (8 would give only
    // ONE partkey split — span ~ half, exactly at the assert boundary)
    val (zp, zs) = fileSpans(ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"),
      bits = 16, npartitions = Some(16)))
    val (np_, ns) = fileSpans(li.repartition(16)) // natural: round-robin files
    // the round-robin layout gives every file ~the full value range;
    // the curve layout must shrink the average span on BOTH columns
    assert(zp < np_ / 2, s"partkey span $zp not < half of natural $np_")
    assert(zs < ns / 2, s"suppkey span $zs not < half of natural $ns")
  }

  test("store zorder rebalance: data intact, clustering recorded, files span-shrunk") {
    val c = tempCollection("zorder_item")
    val li = sf("lineitem").select($"l_partkey", $"l_suppkey", $"l_orderkey")
    c.write("li", li, indexCols = Seq("l_orderkey"))
    c.rebalanceZOrder("li", Seq("l_partkey", "l_suppkey"), npartitions = Some(16))
    // layout-only rewrite: content identical
    assert(c.item("li").data.count() == li.count())
    assert(c.metadata("li").get("_zorder_cols")
      .exists(j => graft.store.Meta.unjv(j) == "l_partkey,l_suppkey"))
    // files cluster on BOTH non-index columns (span far below full range)
    val dataDir = c.path.resolve("li").resolve(graft.store.Item.DataDir)
    val spans = spark.read.parquet(dataDir.toString)
      .groupBy(input_file_name())
      .agg((max($"l_partkey") - min($"l_partkey")).cast("double").as("ps"),
        (max($"l_suppkey") - min($"l_suppkey")).cast("double").as("ss"))
      .agg(avg($"ps"), avg($"ss")).head()
    val full = li.agg(
      (max($"l_partkey") - min($"l_partkey")).cast("double"),
      (max($"l_suppkey") - min($"l_suppkey")).cast("double")).head()
    assert(spans.getDouble(0) < full.getDouble(0) / 2)
    assert(spans.getDouble(1) < full.getDouble(1) / 2)
    cleanup(c)
  }

  test("image aHash: payload copies hash identically, pigeonhole finds them at radius 0") {
    val ids = (0L until 10L).toDF("doc_id")
    val originals = Multimodal.imageTable(ids, rich = true)
    val copies = Multimodal.imageTable((0L until 3L).toDF("doc_id"), rich = true)
      .withColumn("media_id", $"media_id" + 100000)
    val hashes = Multimodal.imageAHash(originals.unionByName(copies))
    // copies carry the ORIGINAL payload -> identical hash
    val byId = hashes.as[(Long, Long)].collect().toMap
    assert((0L until 3L).forall(i => byId(i) == byId(i + 100000)))
    val pairs = Dedup.hammingPairs(hashes, radius = 0,
        idCol = "media_id", hashCol = "ahash")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0L until 3L).forall(i => pairs.contains((i, i + 100000))), pairs.toString)
  }

  test("audio fingerprint: half-gain copies stay within Hamming 3 of originals") {
    val ids = (0L until 10L).toDF("doc_id")
    val originals = Multimodal.audioTable(ids, rich = true)
    val halved = Multimodal.attenuateAudio(
        Multimodal.audioTable((0L until 4L).toDF("doc_id"), rich = true))
      .withColumn("media_id", $"media_id" + 100000)
    val hashes = Multimodal.audioFingerprint(originals.unionByName(halved))
    val pairs = Dedup.hammingPairs(hashes, radius = 3,
        idCol = "media_id", hashCol = "afp")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0L until 4L).forall(i => pairs.contains((i, i + 100000))), pairs.toString)
    // distinct clips are ~32 bits apart — none should collide at radius 3
    assert(pairs.forall { case (a, b) => b - a == 100000 }, pairs.toString)
    // corrupt payload -> sentinel hash 0, no task failure
    val corrupt = originals.limit(1)
      .withColumn("payload", lit(Array[Byte](9, 9, 9)))
    val h = Multimodal.audioFingerprint(corrupt).select("afp").as[Long].collect()
    assert(h.sameElements(Array(0L)))
  }

  test("video fingerprint: brightness-shifted copies stay within Hamming 3; corrupt container hashes to 0") {
    val ids = (0L until 6L).toDF("doc_id")
    val originals = Multimodal.videoTable(ids)
    val shifted = Multimodal.shiftVideoChannels(
        Multimodal.videoTable((0L until 3L).toDF("doc_id")), delta = 1)
      .withColumn("media_id", $"media_id" + 100000)
    val hashes = Multimodal.videoFingerprint(originals.unionByName(shifted))
    val pairs = Dedup.hammingPairs(hashes, radius = 3,
        idCol = "media_id", hashCol = "vfp")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0L until 3L).forall(i => pairs.contains((i, i + 100000))), pairs.toString)
    // corrupt payload -> sentinel hash 0, no task failure
    val corrupt = originals.limit(1)
      .withColumn("payload", lit(Array[Byte](1, 2, 3)))
    val h = Multimodal.videoFingerprint(corrupt).select("vfp")
      .as[Long].collect()
    assert(h.sameElements(Array(0L)))
  }

  test("edit-distance pairs: deletions, insertions, substitutions found; far strings excluded") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over"),
      (2L, "the quick brown fox jump over"),   // deletion (dist 1)
      (3L, "the quick brown foxx jumps over"), // insertion (dist 1)
      (4L, "the quick brawn fox jumps ovir"),  // 2 substitutions (dist 2)
      (5L, "a completely different sentence"),
      (6L, "xx quick brown fox jumps overxx")  // dist 4 from id 1 — excluded
    ).toDF("id", "text")
    val got = Dedup.editDistancePairs(rows, maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 1L)), got.toString)
    assert(got.contains((1L, 3L, 1L)), got.toString)
    assert(got.contains((1L, 4L, 2L)), got.toString)
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L || a == 6L || b == 6L },
      got.toString)
  }

  test("substring duplication: shared chunk found, boilerplate df-cap suppresses pairs") {
    val chunk = "the quick brown fox jumps over the lazy dog near the riverbank every morning"
    val boiler = "this document is provided as is without warranty of any kind"
    val rows = Seq(
      (1L, s"alpha beta gamma $chunk delta epsilon"),
      (2L, s"one two three four five six $chunk seven eight"),
      (3L, "completely unrelated words about cooking pasta with tomatoes and basil leaves today"),
      (4L, s"intro text $boiler closing text one"),
      (5L, s"other opening $boiler different ending two"),
      (6L, s"third preamble $boiler third ending three")
    ).toDF("doc_id", "text")
    // chunk-sharing pair found at minShared 3
    val got = Dedup.substringDuplicationPairs(rows, minShared = 3, maxDocFreq = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), got.toString)
    assert(!got.exists { case (a, b) => a == 3L || b == 3L }, got.toString)
    // boilerplate cap: fps shared by all three boiler docs die at maxDocFreq 2,
    // so 4/5/6 pair only if they share NON-boiler fingerprints (they don't)
    val capped = Dedup.substringDuplicationPairs(rows, minShared = 3, maxDocFreq = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists { case (a, b) => a >= 4L && b >= 4L && b <= 6L },
      capped.toString)
    assert(capped.contains((1L, 2L)), capped.toString)
  }

  test("profile sidecars: persisted partials merge to the full-scan profile") {
    val o = sf("orders")
    val cols = Seq("o_totalprice", "o_custkey")
    val c = tempCollection("profile_sidecar")
    for (i <- 0 until 3)
      Profiler.profileToItem(o.filter($"o_orderkey" % 3 === i), cols, c, s"slice_$i")
    val merged = Profiler.mergedItemProfile(c, (0 until 3).map(i => s"slice_$i"))
      .orderBy("column").collect().map(_.toSeq)
    // reference: one partial over the WHOLE table, merged (n=1 merge is
    // the identity), must agree with the slice merge on every stat
    val direct = Profiler.mergeNumericProfiles(
        Profiler.partialNumericProfile(o, cols))
      .orderBy("column").collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq, s"merged=$merged direct=$direct")
    assert(merged.length == 2)
    cleanup(c)
  }

  test("minhash index probe: batch dedups against persisted corpus, both verify paths agree") {
    val docs = sf("documents").select($"doc_id", $"text")
    val c = tempCollection("minhash_index")
    DedupIndex.buildAndSaveMinhashIndex(docs, c, "mh")
    val idx = DedupIndex.MinhashIndex.load(c, "mh")
    // batch = near-dup copies of 5 corpus docs (last word dropped) plus
    // two exact copies of each other (a within-batch pair)
    val w = split($"text", " ")
    val near = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1)))
    val batch = near.unionByName(
      near.filter($"doc_id" === 100000L).withColumn("doc_id", lit(200000L)))
    val got = DedupIndex.probeMinhashIndex(idx, batch, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every near-copy pairs with its original; the two batch copies pair
    // with each other (and 200000 also pairs with original 0)
    assert((0L until 5L).forall(i => got.contains((i, i + 100000))), got.toString)
    assert(got.contains((100000L, 200000L)) && got.contains((0L, 200000L)), got.toString)
    // the oracle equivalence: one-shot within-corpus LSH over the union,
    // restricted to batch-side pairs, must equal the probe result
    val expect = Dedup.minhashLshPairs(docs.unionByName(batch), threshold = 0.8)
      .filter($"id_b" >= 100000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expect, s"only-probe=${got -- expect} only-lsh=${expect -- got}")
    // all three verify paths agree: stats-adaptive default (join at
    // this scale), forced IN-localization, and forced join fallback
    val viaLocalized = DedupIndex.probeMinhashIndex(idx, batch, threshold = 0.8,
      localizeBytes = 0).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaLocalized == got)
    val viaJoin = DedupIndex.probeMinhashIndex(idx, batch, threshold = 0.8,
      maxProbeIds = 0, localizeBytes = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaJoin == got)
    cleanup(c)
  }

  test("semantic probe: new batch dedups against persisted IVF corpus index") {
    val e = sf("embeddings")
    val c = tempCollection("semantic_probe")
    Similarity.buildIvfIndex(e, nlist = 8, kmeansIters = 2).save(c, "emb")
    val idx = Similarity.IvfIndex.load(c, "emb")
    // batch: exact copies of 5 corpus vectors -> cos 1.0 pairs to their
    // originals; high threshold keeps unrelated corpus vectors out
    val batch = e.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 100000)
    val pairs = Dedup.semanticProbePairs(idx, batch, threshold = 0.999, nprobe = 8)
      .select("indexed_id", "new_id", "cos").as[(Long, Long, Double)].collect()
    assert(pairs.length == 5, pairs.mkString(","))
    assert(pairs.forall { case (i, n, cos) => n == i + 100000 && cos == 1.0 },
      pairs.mkString(","))
    cleanup(c)
  }

  test("semantic dedup: cluster-bounded pairs match exhaustive, drop list keeps min id") {
    val e = sf("embeddings")
    // planted exact copies of 6 vectors -> cosine 1.0 pairs
    val aug = e.unionByName(e.filter($"vec_id" < 6)
      .withColumn("vec_id", $"vec_id" + 100000))
    val pairs = Dedup.semanticDedupPairs(aug, threshold = 0.95,
        nClusters = 8, nassign = 2, kmeansIters = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exhaustive = Dedup.embeddingCosinePairs(aug, threshold = 0.95,
        exhaustive = true).as[(Long, Long)].collect().toSet
    assert(pairs == exhaustive,
      s"only-sem=${pairs -- exhaustive} only-exh=${exhaustive -- pairs}")
    assert((0L until 6L).forall(i => pairs.contains((i, i + 100000))))
    val drops = Dedup.semanticDedup(aug, threshold = 0.95,
        nClusters = 8, nassign = 2, kmeansIters = 2)
      .as[(Long, Long)].collect().toSet
    // every planted copy is dropped in favor of its original
    assert((0L until 6L).forall(i => drops.contains((i + 100000, i))), drops.toString)
  }

  test("hamming index: probe equals from-scratch pairs, append equals rebuild") {
    val corpusMedia = Multimodal.imageTable((0L until 10L).toDF("doc_id"), rich = true)
    val corpus = Multimodal.imageAHash(corpusMedia)
    val c = tempCollection("hamming_index")
    DedupIndex.buildAndSaveHammingIndex(corpus, c, "img", radius = 2,
      idCol = "media_id", hashCol = "ahash")
    val idx = DedupIndex.HammingIndex.load(c, "img")
    // batch: 3 fresh images + 2 payload copies of indexed ones
    val fresh = Multimodal.imageTable((10L until 13L).toDF("doc_id"), rich = true)
    val copies = Multimodal.imageTable((0L until 2L).toDF("doc_id"), rich = true)
      .withColumn("media_id", $"media_id" + 100000)
    val batch = Multimodal.imageAHash(fresh.unionByName(copies))
    val got = DedupIndex.probeHammingIndex(idx, batch,
        idCol = "media_id", hashCol = "ahash")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    // oracle: from-scratch pairs over corpus ∪ batch, batch-side only
    val batchIds = batch.select("media_id").as[Long].collect().toSet
    val allPairs: Set[(Long, Long, Long)] =
      Dedup.hammingPairs(corpus.unionByName(batch), radius = 2,
          idCol = "media_id", hashCol = "ahash")
        .as[(Long, Long, Long)].collect().toSet
    val all = allPairs.filter(p => batchIds.contains(p._1) || batchIds.contains(p._2))
    assert(got == all, s"probe diverged: ${(got -- all).take(3)} / ${(all -- got).take(3)}")
    assert((0L until 2L).forall(i => got.contains((i, i + 100000, 0L))), got.toString)
    // append survivors (the fresh images), then a rebuild must agree
    val freshHashes = Multimodal.imageAHash(fresh)
    DedupIndex.appendToHammingIndex(freshHashes, c, "img",
      idCol = "media_id", hashCol = "ahash")
    val appended = DedupIndex.HammingIndex.load(c, "img")
    val c2 = tempCollection("hamming_rebuild")
    DedupIndex.buildAndSaveHammingIndex(
      Multimodal.imageAHash(corpusMedia.unionByName(fresh)), c2, "img",
      radius = 2, idCol = "media_id", hashCol = "ahash")
    val rebuilt = DedupIndex.HammingIndex.load(c2, "img")
    val ar = appended.chunkRows.select("id", "h", "chunk", "key")
      .as[(Long, Long, Int, Long)].collect().toSet
    val rr = rebuilt.chunkRows.select("id", "h", "chunk", "key")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(ar == rr, s"chunk rows diverged: ${(ar -- rr).take(3)} / ${(rr -- ar).take(3)}")
    cleanup(c); cleanup(c2)
  }

  test("winnow index: probe matches one-shot cross pairs, append indexes new docs") {
    val docs = sf("documents").select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" < 60)
    val c = tempCollection("winnow_index")
    DedupIndex.buildAndSaveWinnowIndex(corpus, c, "wf")
    val idx = DedupIndex.WinnowIndex.load(c, "wf")
    // batch: prefix excerpts of docs 0..3
    val batch = docs.filter($"doc_id" < 4)
      .select(($"doc_id" + 100000).as("doc_id"),
        expr("substring(text, 1, (length(text)*3) div 5)").as("text"))
    val got = DedupIndex.probeWinnowIndex(idx, batch, minShared = 3)
      .select("id_a", "id_b", "n_shared").as[(Long, Long, Long)].collect().toSet
    // one-shot oracle: cross pairs of corpus ∪ batch, batch-side only
    val oneShot: Set[(Long, Long, Long)] =
      Dedup.substringDuplicationPairs(corpus.unionByName(batch), minShared = 3)
        .as[(Long, Long, Long)].collect().toSet
    val cross = oneShot.filter(p => p._2 >= 100000 && p._1 < 100000)
    // the one-shot caps df over corpus∪batch; with a small batch of
    // excerpts the capped sets coincide, so cross pairs must agree
    assert(got == cross, s"probe diverged: ${(got -- cross).take(3)} / ${(cross -- got).take(3)}")
    assert(got.exists { case (a, b, _) => a == 0L && b == 100000L }, got.toString)
    // append: new docs' fingerprints land; a later probe sees them
    DedupIndex.appendToWinnowIndex(
      docs.filter($"doc_id" >= 60 && $"doc_id" < 70), c, "wf")
    val idx2 = DedupIndex.WinnowIndex.load(c, "wf")
    val probe2 = DedupIndex.probeWinnowIndex(idx2,
        docs.filter($"doc_id" === 65L)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"),
        minShared = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probe2.contains((65L, 200065L)), probe2.toString)
    cleanup(c)
  }

  test("minhash index load fails loudly when the LSH-shape metadata is missing") {
    val c = tempCollection("minhash_badmeta")
    // an item written outside the index API has no banding metadata —
    // probing with guessed parameters would silently find nothing, so
    // load must refuse instead
    c.write("mh__bands", Seq((0, 0L, 1L)).toDF("band", "bh", "id"),
      indexCols = Seq("band"))
    c.write("mh__shingles", Seq((1L, Seq("a b c"))).toDF("id", "sh"),
      indexCols = Seq("id"))
    val e = intercept[IllegalStateException] {
      DedupIndex.MinhashIndex.load(c, "mh")
    }
    assert(e.getMessage.contains("minhash"), e.getMessage)
    cleanup(c)
  }

  test("minhash index append: incremental equals full rebuild, probe sees appended docs") {
    val docs = sf("documents").select($"doc_id", $"text")
    val part1 = docs.filter($"doc_id" % 5 =!= 0)
    val part2 = docs.filter($"doc_id" % 5 === 0)
    val c = tempCollection("minhash_append")
    DedupIndex.buildAndSaveMinhashIndex(part1, c, "mh")
    val appended = DedupIndex.appendToMinhashIndex(part2, c, "mh")
    val full = DedupIndex.buildMinhashIndex(docs)
    val ab = appended.bands.as[(Long, Int, Long)].collect().toSet
    val fb = full.bands.as[(Long, Int, Long)].collect().toSet
    assert(ab == fb, s"band rows diverged: ${(ab -- fb).take(3)} / ${(fb -- ab).take(3)}")
    assert(appended.shingles.count() == docs.count())
    // a probe against the appended index finds a dup of an APPENDED doc
    val probe = docs.filter($"doc_id" === 5L).withColumn("doc_id", lit(300000L))
    val got = DedupIndex.probeMinhashIndex(appended, probe, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((5L, 300000L)), got.toString)
    // COMPACTION (the Lucene merge analogue): appends accumulate
    // generations/files; the store's rebalance re-lays each index item
    // and the probe must see identical pairs through the compacted index
    val nBandRows = appended.bands.count() // before the swap invalidates this plan
    c.rebalance("mh__bands", npartitions = Some(1))
    c.rebalance("mh__shingles", npartitions = Some(1))
    val compacted = DedupIndex.MinhashIndex.load(c, "mh")
    val got2 = DedupIndex.probeMinhashIndex(compacted, probe, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got2 == got)
    assert(compacted.bands.count() == nBandRows)
    cleanup(c)
  }

  test("line dedup: boilerplate lines removed, docs reassembled in order") {
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"$boiler. alpha beta gamma. the end"),
      (2L, s"$boiler. delta epsilon zeta"),
      (3L, "unique content only here"),
      (4L, s"repeated inside. repeated inside. $boiler")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df).orderBy($"doc_id").collect()
    // the boilerplate line appears in 3 distinct docs -> dropped everywhere,
    // surviving lines rejoin in original order
    assert(out(0).getAs[String]("text") == "alpha beta gamma. the end")
    assert(out(0).getAs[Long]("n_lines") == 3 && out(0).getAs[Long]("n_kept") == 2)
    assert(out(1).getAs[String]("text") == "delta epsilon zeta")
    assert(out(2).getAs[String]("text") == "unique content only here")
    // in-document repetition is kept — between-document operator by contract
    assert(out(3).getAs[String]("text") == "repeated inside. repeated inside")
    // a doc that is ONLY boilerplate comes back empty, not dropped
    val o2 = Dedup.lineDedup(Seq((9L, boiler), (10L, boiler)).toDF("doc_id", "text"))
      .orderBy($"doc_id").collect()
    assert(o2.forall(r => r.getAs[String]("text") == "" && r.getAs[Long]("n_kept") == 0L))
  }

  test("correlation matrix: perfect, inverse, and degenerate pairs") {
    val df = Seq(
      (1.0, 2.0, 5.0, 7.0),
      (2.0, 4.0, 4.0, 7.0),
      (3.0, 6.0, 3.0, 7.0),
      (4.0, 8.0, 2.0, 7.0)).toDF("a", "b", "c", "k")
    val out = Profiler.correlationMatrix(df, Seq("a", "b", "c", "k"))
      .orderBy($"col_x", $"col_y").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out(("a", "b")) == 1.0)   // b = 2a
    assert(out(("a", "c")) == -1.0)  // c = 6 - a
    assert(out(("a", "k")) == 0.0)   // constant column -> zero-denominator guard
    assert(out(("b", "c")) == -1.0)
    // null rows are excluded matrix-wide (complete-case)
    val withNull = df.unionByName(Seq((9.0, 9.0, 9.0, 7.0)).toDF("a", "b", "c", "k"))
      .withColumn("c", when($"a" === 9.0, lit(null: java.lang.Double)).otherwise($"c"))
    val n = Profiler.correlationMatrix(withNull, Seq("a", "b", "c"))
      .select($"n").head().getLong(0)
    assert(n == 4L)
  }

  test("ohlc resample and forward fill: bucket math, tie-break, gap carry") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // hour 0: open=1 (earliest), close=3 (latest), high=9, low=1
      (1L, t("2024-01-01 00:05:00"), "a", 1.0),
      (2L, t("2024-01-01 00:20:00"), "a", 9.0),
      (3L, t("2024-01-01 00:50:00"), "a", 3.0),
      // hour 2 (hour 1 is a gap): single row
      (4L, t("2024-01-01 02:10:00"), "a", 7.0),
      // same-ts tie in hour 0 for key b: event_id decides open/close
      (5L, t("2024-01-01 00:30:00"), "b", 4.0),
      (6L, t("2024-01-01 00:30:00"), "b", 6.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val o = TimeSeries.ohlc(df, 3600, Seq("event_type"))
      .orderBy($"event_type", $"bucket_start_s").collect()
    assert(o(0).getAs[Double]("open") == 1.0 && o(0).getAs[Double]("close") == 3.0)
    assert(o(0).getAs[Double]("high") == 9.0 && o(0).getAs[Double]("low") == 1.0)
    assert(o(0).getAs[Double]("volume") == 13.0 && o(0).getAs[Long]("n") == 3L)
    assert(o(2).getAs[Double]("open") == 4.0 && o(2).getAs[Double]("close") == 6.0)
    val f = TimeSeries.resampleFfill(df, 3600, Seq("event_type"))
      .filter($"event_type" === "a")
      .orderBy($"bucket_start_s").collect()
    // grid spans hours 0..2; hour 1 carries hour 0's LAST value (3.0)
    assert(f.length == 3)
    assert(f(0).getAs[Double]("value") == 3.0 && !f(0).getAs[Boolean]("filled"))
    assert(f(1).getAs[Double]("value") == 3.0 && f(1).getAs[Boolean]("filled"))
    assert(f(2).getAs[Double]("value") == 7.0 && !f(2).getAs[Boolean]("filled"))
  }

  test("token chunking: stop-at-end rule, overlap, and full coverage") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, size = 8, stride = 4)
      .orderBy($"doc_id", $"chunk_idx").collect()
    // doc 1 (10 tokens): [w1..w8), then the final chunk reaches the end
    // at start 4 -> exactly 2 chunks, no redundant third
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.length == 2)
    assert(d1(0).getAs[String]("chunk") == (1 to 8).map("w" + _).mkString(" "))
    assert(d1(1).getAs[String]("chunk") == (5 to 10).map("w" + _).mkString(" "))
    assert(d1.map(_.getAs[Int]("n_tokens")).toSeq == Seq(8, 6))
    // doc 2 (2 tokens <= size): exactly one whole-doc chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk") == "short doc")
  }

  test("key skew: ratio math, modal tie-break to larger key, null keys ignored") {
    val df = Seq(Some(1L), Some(1L), Some(2L), None, Some(7L)).toDF("k")
    val out = Profiler.keySkew(df, Seq("k")).collect().head
    // keys: 1→2, 2→1, 7→1 (null dropped): n=4, d=3, top=(2, "1"), skew=2*3/4
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("n_distinct") == 3L)
    assert(out.getAs[String]("top_key") == "1" && out.getAs[Long]("top_count") == 2L)
    assert(out.getAs[Double]("skew") == 1.5)
    // tie-break: equal counts -> LARGER key string wins
    val tie = Profiler.keySkew(Seq(1L, 2L).toDF("k"), Seq("k")).collect().head
    assert(tie.getAs[String]("top_key") == "2")
  }

  test("rate anomalies: flags only windows beyond the z threshold") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 11 calm hours of 10 events + one 60-event spike
    val rows = (0 until 12).flatMap { h =>
      val n = if (h == 6) 60 else 10
      (0 until n).map(i => (java.sql.Timestamp.from(base.plusSeconds(h * 3600L + i)), 1.0))
    }
    val df = rows.toDF("ts", "value")
    val out = Events.rateAnomalies(df, "1 hour", threshold = 2.0).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n") == 60L)
    assert(out.head.getAs[Double]("z") > 2.0)
  }

  test("select canonical keeps the best-scored member per cluster, singletons survive") {
    val docs = Seq(
      (1L, 30.0), (2L, 50.0), (3L, 50.0), // one cluster: 3 wins on score, tie -> min id between 2/3
      (7L, 10.0),                         // singleton
      (8L, 5.0), (9L, 1.0)                // second cluster: 8 wins
    ).toDF("doc_id", "s")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.selectCanonical(docs, pairs, $"s")
      .orderBy($"cluster").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 3L), (7L, 7L, 1L), (8L, 8L, 2L)))
  }

  test("bigram LM: persisted append equals full rebuild, scores agree") {
    val docs = sf("documents").select($"doc_id", $"text")
    val part1 = docs.filter($"doc_id" % 5 =!= 0)
    val part2 = docs.filter($"doc_id" % 5 === 0)
    val c = tempCollection("lm_append")
    LanguageModel.buildAndSaveBigramLm(part1, c, "lm")
    val appended = LanguageModel.appendToLm(part2, c, "lm")
    val full = LanguageModel.buildBigramLm(docs)
    assert(appended.totalTokens == full.totalTokens && appended.vocab == full.vocab)
    // merged dictionaries (including the re-derived denormalized
    // cnt_w1) must equal a from-scratch fit on the union corpus
    val ab = appended.bigrams.as[(String, Long, Long)].collect().toSet
    val fb = full.bigrams.as[(String, Long, Long)].collect().toSet
    assert(ab == fb, s"merged bigrams diverged: only-appended=${(ab -- fb).take(3)} only-full=${(fb -- ab).take(3)}")
    val probe = docs.filter($"doc_id" < 20)
    val sa = LanguageModel.scoreDocs(appended, probe).collect().map(_.toSeq).toSet
    val sfull = LanguageModel.scoreDocs(full, probe).collect().map(_.toSeq).toSet
    assert(sa == sfull && sa.nonEmpty)
    cleanup(c)
  }

  test("bigram LM: known bigrams beat the OOV backoff floor; short-doc sentinel") {
    val corpus = sf("documents").select($"doc_id", $"text")
    val lm = LanguageModel.buildBigramLm(corpus)
    // a known bigram scores p = cnt_bg/cnt_w1 ≥ 1/cnt_w1; two OOV
    // tokens score the absolute backoff floor 0.4·1/(T+V). The former
    // is strictly larger for any corpus (cnt_w1 ≤ T < (T+V)/0.4), so
    // the ordering is a guarantee of the model, not of the data.
    val topBg = lm.bigrams.orderBy($"cnt".desc, $"bg").head().getString(0)
    val probe = Seq((1L, topBg), (2L, "zzzqxj zzzqxk"), (3L, "word"))
      .toDF("doc_id", "text")
    val out = LanguageModel.scoreDocs(lm, probe).orderBy($"doc_id").collect()
    assert(out(0).getAs[Double]("nll") < out(1).getAs[Double]("nll"),
      s"expected known-bigram < OOV floor: ${out.mkString(", ")}")
    // single-token doc: kept with the documented sentinel
    assert(out(2).getAs[Long]("n_bigrams") == 0L && out(2).getAs[Double]("nll") == 0.0)
  }
}
