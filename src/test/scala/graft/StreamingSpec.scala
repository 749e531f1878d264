package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.FsOps
import graft.streaming.StreamAppend

/** Structured Streaming ingestion (SURVEY §2.16 upgrade path of M3). */
class StreamingSpec extends SparkSpec {

  test("streaming foreachBatch append lands all rows in the item") {
    val c = tempCollection("stream_append")
    val src = Files.createTempDirectory("graft_stream_src")
    import spark.implicits._
    val data = (1 to 50).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), i.toDouble)
    }.toDF("event_id", "index", "value")
    data.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(data.schema).parquet(s"$src/in")
    val writer = StreamAppend.intoItem(stream, c, "ev")
      .option("checkpointLocation", s"$src/ckpt")
    StreamAppend.runToCompletion(writer)

    assert(c.item("ev").data.count() == 50)
    // re-running the stream from a fresh checkpoint re-delivers the same
    // batch; index-dedup append keeps the item idempotent
    val writer2 = StreamAppend.intoItem(stream, c, "ev")
      .option("checkpointLocation", s"$src/ckpt2")
    StreamAppend.runToCompletion(writer2)
    assert(c.item("ev").data.count() == 50)

    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming BM25 maintenance: batch appends equal full rebuild, re-delivery safe") {
    import graft.operators.Search
    val c = tempCollection("stream_bm25")
    val src = Files.createTempDirectory("graft_stream_bm25")
    import spark.implicits._
    val docs = sf("documents").select($"doc_id", $"text")
    val part1 = docs.filter($"doc_id" < 30)
    val part2 = docs.filter($"doc_id" >= 30 && $"doc_id" < 60)
    part1.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(part1.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoBm25Index(stream, c, "bm25")
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")                                    // batch 0: initial build
    part2.write.mode("append").parquet(s"$src/in")
    run("ckpt")                                    // batch 1: incremental append

    val loaded = Search.Bm25Index.load(c, "bm25")
    val full = Search.buildBm25Index(part1.unionByName(part2))
    assert(loaded.nDocs == full.nDocs && loaded.sumDl == full.sumDl)
    val lt = loaded.terms.as[(String, Long, Long)].collect().toSet
    val ft = full.terms.as[(String, Long, Long)].collect().toSet
    assert(lt == ft, s"only-streamed=${lt -- ft} only-full=${ft -- lt}")

    // a FRESH checkpoint re-delivers everything as epoch 0; the
    // recorded epoch watermark makes the sink skip it — no double
    // counting (the non-idempotent-append hazard intoItem doesn't have)
    run("ckpt2")
    val again = Search.Bm25Index.load(c, "bm25")
    assert(again.nDocs == full.nDocs && again.sumDl == full.sumDl)
    assert(again.terms.as[(String, Long, Long)].collect().toSet == ft)

    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming IVF ingest: frozen quantizer appends, re-delivery safe, searchable") {
    import graft.operators.Similarity
    val c = tempCollection("stream_ivf")
    val src = Files.createTempDirectory("graft_stream_ivf")
    import spark.implicits._
    val e = sf("embeddings").select($"vec_id", $"embedding")
    val part1 = e.filter($"vec_id" < 300)
    val part2 = e.filter($"vec_id" >= 300 && $"vec_id" < 340)
    part1.write.mode("overwrite").parquet(s"$src/in")
    val stream = spark.readStream.schema(part1.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoIvfIndex(stream, c, "emb", nlist = 8, kmeansIters = 2)
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    assert(Similarity.IvfIndex.load(c, "emb").assigned.count() == 300L)
    part2.write.mode("append").parquet(s"$src/in")
    run("ckpt")
    val idx = Similarity.IvfIndex.load(c, "emb")
    assert(idx.assigned.count() == 340L)
    // batch-2 appends used the FROZEN batch-1 quantizer
    val expect = Similarity.assignToCentroids(part2, idx.centroids)
      .select($"nbr_id", $"cid").as[(Long, Long)].collect().toMap
    val got = idx.assigned.filter($"nbr_id" >= 300)
      .select($"nbr_id", $"cid").as[(Long, Long)].collect().toMap
    assert(got == expect)
    // an exact copy of an APPENDED vector comes back at rank 1
    val probe = part2.limit(1).withColumn("vec_id", $"vec_id" + 100000)
    val top = Similarity.ivfSearch(idx, probe, k = 1, nprobe = 8).head()
    assert(top.getAs[Long]("nbr_id") == top.getAs[Long]("query_id") - 100000)
    // fresh checkpoint re-delivers both epochs: the watermark skips them
    run("ckpt2")
    assert(Similarity.IvfIndex.load(c, "emb").assigned.count() == 340L)
    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming LM gate: high-perplexity docs dropped, re-delivery idempotent") {
    import graft.operators.LanguageModel
    val c = tempCollection("stream_lm_gate")
    val src = Files.createTempDirectory("graft_stream_lm")
    import spark.implicits._
    val corpus = sf("documents").select($"doc_id", $"text")
    val lm = LanguageModel.buildAndSaveBigramLm(corpus, c, "lm")
    // probes with a GUARANTEED nll ordering: a known corpus bigram vs
    // pure-OOV backoff floor (see OperatorsSpec); gate at the midpoint
    val topBg = lm.bigrams.orderBy($"cnt".desc, $"bg").head().getString(0)
    val probes = Seq((9001L, topBg), (9002L, "zzzqxj zzzqxk")).toDF("doc_id", "text")
    val scored = LanguageModel.scoreDocs(LanguageModel.BigramLm.load(c, "lm"), probes)
      .orderBy($"doc_id").select($"nll").as[Double].collect()
    val gate = (scored(0) + scored(1)) / 2.0
    probes.write.mode("overwrite").parquet(s"$src/in")
    val stream = spark.readStream.schema(probes.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoLmGate(stream, c, "lm", "clean_docs", maxNll = gate)
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    val ids = c.item("clean_docs").data.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(9001L), s"gate kept wrong docs: $ids")
    // fresh checkpoint re-delivers the batch; KeepLast of identical
    // survivor rows is a no-op — stateless-score idempotency
    run("ckpt2")
    assert(c.item("clean_docs").data.count() == 1L)
    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming NB gate: off-class docs dropped, survivors carry pred, re-delivery idempotent") {
    import graft.operators.TextClassifier
    val c = tempCollection("stream_nb_gate")
    val src = Files.createTempDirectory("graft_stream_nb")
    import spark.implicits._
    // train a model with real signal (the synthetic corpus labels are
    // noise by construction, so the gate trains on its own fixture)
    TextClassifier.train(Seq(
      ("the quick brown fox", "en"), ("the lazy brown dog", "en"),
      ("der schnelle braune hund", "de"), ("der faule braune hund", "de"))
      .toDF("text", "lab"), "text", "lab").save(c, "nb")
    val probes = Seq((9001L, "the quick dog"), (9002L, "der schnelle hund"))
      .toDF("doc_id", "text")
    probes.write.mode("overwrite").parquet(s"$src/in")
    val stream = spark.readStream.schema(probes.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoNbGate(stream, c, "nb", "en_docs", keepLabels = Seq("en"))
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    val rows = c.item("en_docs").data.select($"doc_id", $"pred")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((9001L, "en")), s"gate kept wrong docs: $rows")
    // fresh checkpoint re-delivers the batch; KeepLast of identical
    // survivor rows is a no-op — stateless-score idempotency
    run("ckpt2")
    assert(c.item("en_docs").data.count() == 1L)
    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming deduped ingest: survivors index incrementally, re-delivery safe") {
    import graft.operators.DedupIndex
    val c = tempCollection("stream_minhash")
    val src = Files.createTempDirectory("graft_stream_minhash")
    import spark.implicits._
    val docs = sf("documents").select($"doc_id", $"text")
    // batch 0: 30 docs incl. one internal exact copy (id 500 copies id 0)
    val part1 = docs.filter($"doc_id" < 30).unionByName(
      docs.filter($"doc_id" === 0L).withColumn("doc_id", lit(500L)))
    // batch 1: 10 fresh docs + a near-copy of an INDEXED doc (drop last word)
    val w = split($"text", " ")
    val nearOf3 = docs.filter($"doc_id" === 3L)
      .withColumn("doc_id", lit(600L))
      .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1)))
    val part2 = docs.filter($"doc_id" >= 30 && $"doc_id" < 40).unionByName(nearOf3)
    part1.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(part1.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoMinhashIndex(stream, c, "mh", threshold = 0.8)
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    // docs 8 and 12 are NATURAL near-dups in the testdata (j≈0.97):
    // 12 dies to 8 in the first batch's self-dedup, like the copy 500→0
    val ids1 = DedupIndex.MinhashIndex.load(c, "mh").shingles
      .select($"id").as[Long].collect().toSet
    assert(ids1 == (0L until 30L).toSet - 12L, s"batch-0 survivors wrong: $ids1")
    part2.write.mode("append").parquet(s"$src/in")
    run("ckpt")
    val ids2 = DedupIndex.MinhashIndex.load(c, "mh").shingles
      .select($"id").as[Long].collect().toSet
    // 600 (near-dup of indexed doc 3) dropped; 30..39 indexed
    assert(ids2 == (0L until 40L).toSet - 12L, s"batch-1 survivors wrong: $ids2")
    // fresh checkpoint re-delivers everything as epoch 0/1 — the epoch
    // watermark skips both batches, no duplicate shingle/band rows
    run("ckpt2")
    val idx = DedupIndex.MinhashIndex.load(c, "mh")
    assert(idx.shingles.count() == 39L)
    assert(idx.bands.count() == 39L * 16)

    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming media ingest: hamming index drops matched fingerprints, re-delivery safe") {
    import graft.operators.{DedupIndex, Multimodal}
    val c = tempCollection("stream_hamming")
    val src = Files.createTempDirectory("graft_stream_hamming")
    import spark.implicits._
    def hashesOf(ids: Seq[Long], as: Map[Long, Long] = Map.empty): org.apache.spark.sql.DataFrame = {
      val h = Multimodal.imageAHash(Multimodal.imageTable(ids.toDF("doc_id"), rich = true))
      as.foldLeft(h) { case (df, (from, to)) =>
        df.withColumn("media_id",
          when($"media_id" === from, lit(to)).otherwise($"media_id"))
      }
    }
    // batch 0: images 0..9 + an exact copy (id 500 carries image 0's hash)
    val part1 = hashesOf(0L until 10L).unionByName(hashesOf(Seq(0L), Map(0L -> 500L)))
    part1.write.mode("overwrite").parquet(s"$src/in")
    val stream = spark.readStream.schema(part1.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoHammingIndex(stream, c, "img", radius = 0,
          idCol = "media_id", hashCol = "ahash")
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    def indexedIds(): Set[Long] = DedupIndex.HammingIndex.load(c, "img")
      .chunkRows.select($"id").distinct().as[Long].collect().toSet
    assert(indexedIds() == (0L until 10L).toSet, indexedIds().toString)
    // batch 1: fresh images 10..14 + a copy of INDEXED image 3 (id 600)
    hashesOf(10L until 15L).unionByName(hashesOf(Seq(3L), Map(3L -> 600L)))
      .write.mode("append").parquet(s"$src/in")
    run("ckpt")
    assert(indexedIds() == (0L until 15L).toSet, indexedIds().toString)
    // fresh checkpoint re-delivers both batches; epoch watermark skips
    run("ckpt2")
    val rows = DedupIndex.HammingIndex.load(c, "img").chunkRows.count()
    assert(rows == 15L, s"chunk rows after re-delivery: $rows")

    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming substring gate: overlapping docs dropped against persisted winnow index") {
    import graft.operators.DedupIndex
    val c = tempCollection("stream_winnow")
    val src = Files.createTempDirectory("graft_stream_winnow")
    import spark.implicits._
    val docs = sf("documents").select($"doc_id", $"text")
    val excerpt = expr("substring(text, 1, (length(text)*3) div 5)")
    // batch 0: docs 0..29 + a 60%-excerpt of doc 0 under id 500
    val part1 = docs.filter($"doc_id" < 30).unionByName(
      docs.filter($"doc_id" === 0L)
        .select(lit(500L).as("doc_id"), excerpt.as("text")))
    part1.write.mode("overwrite").parquet(s"$src/in")
    val stream = spark.readStream.schema(part1.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.intoWinnowIndex(stream, c, "wf", minShared = 3)
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    def indexedIds(): Set[Long] = DedupIndex.WinnowIndex.load(c, "wf")
      .fps.select($"id").distinct().as[Long].collect().toSet
    val ids1 = indexedIds()
    assert(ids1.contains(0L) && !ids1.contains(500L), ids1.toString)
    // batch 1: fresh docs 30..34 + a 60%-excerpt of INDEXED doc 3 (id 600)
    docs.filter($"doc_id" >= 30 && $"doc_id" < 35).unionByName(
        docs.filter($"doc_id" === 3L)
          .select(lit(600L).as("doc_id"), excerpt.as("text")))
      .write.mode("append").parquet(s"$src/in")
    run("ckpt")
    val ids2 = indexedIds()
    assert(!ids2.contains(600L), ids2.toString)
    assert((30L until 35L).exists(ids2.contains), ids2.toString)
    assert(ids1.subsetOf(ids2))
    // fresh checkpoint re-delivers both batches; epoch watermark skips
    val rowsBefore = DedupIndex.WinnowIndex.load(c, "wf").fps.count()
    run("ckpt2")
    assert(DedupIndex.WinnowIndex.load(c, "wf").fps.count() == rowsBefore)

    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("streaming IVF search: persisted index serves each batch, results idempotent") {
    import graft.operators.Similarity
    val c = tempCollection("stream_ivf")
    val src = Files.createTempDirectory("graft_stream_ivf")
    import spark.implicits._
    val e = sf("embeddings")
    Similarity.buildIvfIndex(e, nlist = 8, kmeansIters = 2).save(c, "emb")
    // queries are exact copies of corpus vectors -> known top-1
    val q1 = e.filter($"vec_id" < 4).withColumn("vec_id", $"vec_id" + 1000)
    q1.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(q1.schema).parquet(s"$src/in")
    def run(ckpt: String): Unit = StreamAppend.runToCompletion(
      StreamAppend.searchIvfStream(stream, c, "emb", "results", k = 3, nprobe = 8)
        .option("checkpointLocation", s"$src/$ckpt"))
    run("ckpt")
    val r1 = c.item("results").data
    assert(r1.count() == 4 * 3)
    val top1 = r1.filter($"rank" === 1)
      .select($"query_id", $"nbr_id", $"cos").as[(Long, Long, Double)].collect()
    assert(top1.length == 4 && top1.forall { case (q, n, cos) =>
      n == q - 1000 && cos == 1.0 }, top1.mkString(","))
    // batch 2 appends two more queries
    e.filter($"vec_id" >= 4 && $"vec_id" < 6).withColumn("vec_id", $"vec_id" + 1000)
      .write.mode("append").parquet(s"$src/in")
    run("ckpt")
    assert(c.item("results").data.count() == 6 * 3)
    // fresh checkpoint re-delivers everything; KeepLast on the
    // (query_id, rank) index overwrites in place — no duplicates
    run("ckpt2")
    assert(c.item("results").data.count() == 6 * 3)

    FsOps.deleteRecursively(src)
    cleanup(c)
  }

  test("stream-static bucketized range join attributes streamed points") {
    // RangeJoin is a pure equi-join + filter, so it composes with a
    // streaming points side against static intervals (stream-static
    // equi-joins are supported; a nested-loop range join would not be)
    val src = Files.createTempDirectory("graft_stream_range")
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val pts = Seq(
      (1L, t("2024-01-01 00:05:00")),
      (2L, t("2024-01-01 00:25:00")),
      (3L, t("2024-01-01 02:00:00"))).toDF("pid", "ts")
    pts.write.mode("overwrite").parquet(s"$src/in")
    val intervals = Seq(("W", t("2024-01-01 00:00:00"), t("2024-01-01 00:30:00")))
      .toDF("iid", "w_start", "w_end")

    val stream = spark.readStream.schema(pts.schema).parquet(s"$src/in")
    val joined = graft.operators.RangeJoin.pointInInterval(
      stream, intervals, "ts", "w_start", "w_end", bucketWidth = 900L)
    val q = joined.writeStream.format("memory").queryName("range_attrib")
      .option("checkpointLocation", s"$src/ckpt").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("range_attrib").select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    FsOps.deleteRecursively(src)
  }

  test("streaming content dedup drops in-horizon duplicate documents") {
    val src = Files.createTempDirectory("graft_stream_dedup")
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val docs = Seq(
      (1L, t("2024-01-01 10:00:00"), "alpha beta gamma"),
      (2L, t("2024-01-01 10:01:00"), "alpha beta gamma"), // dup of 1
      (3L, t("2024-01-01 10:02:00"), "different text entirely"),
      (4L, t("2024-01-01 10:03:00"), "alpha beta gamma")  // dup of 1
    ).toDF("doc_id", "ts", "text")
    docs.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$src/in")
    val q = StreamAppend.dedupStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_out").select("text").as[String].collect().toSeq
    assert(out.size == 2, s"got $out")
    assert(out.toSet == Set("alpha beta gamma", "different text entirely"))
    FsOps.deleteRecursively(src)
  }

  test("streaming near-dup pairs equal batch minhashLshPairs on bounded input") {
    val src = Files.createTempDirectory("graft_stream_neardup")
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val near = base + " extra"
    val other = "completely different words describing some unrelated subject entirely here now"
    val docs = Seq(
      (1L, t("2024-01-01 10:00:00"), base),
      (2L, t("2024-01-01 10:05:00"), near),   // near-dup of 1
      (3L, t("2024-01-01 10:10:00"), other),
      (4L, t("2024-01-01 10:15:00"), base),   // exact dup of 1, near 2
      // watermark sentinel so all dedup state flushes
      (99L, t("2024-01-03 00:00:00"), "zz yy xx ww vv uu tt ss rr qq pp oo")
    ).toDF("doc_id", "ts", "text")
    docs.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$src/in")
    val q = StreamAppend.nearDupPairsStream(stream, threshold = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("neardup_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("neardup_out")
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.Dedup.minhashLshPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
    assert(streamed.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    FsOps.deleteRecursively(src)
  }

  test("stateful streaming sessionization closes sessions on gap timeout") {
    import graft.streaming.{SessionEvent, StreamAppend => SA}
    val src = Files.createTempDirectory("graft_stream_sess")
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 5: two sessions (gap > 30min); user 6: one session
    val data = Seq(
      SessionEvent(1L, t("2024-01-01 10:00:00"), 5L, 1.0),
      SessionEvent(2L, t("2024-01-01 10:10:00"), 5L, 2.0),
      SessionEvent(3L, t("2024-01-01 12:00:00"), 5L, 4.0),
      SessionEvent(4L, t("2024-01-01 10:05:00"), 6L, 8.0),
      // late sentinel far in the future advances the watermark so all
      // real sessions time out and emit
      SessionEvent(99L, t("2024-01-02 00:00:00"), 999L, 0.0)
    ).toDF.as[SessionEvent]
    data.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(data.schema).parquet(s"$src/in").as[SessionEvent]
    val q = SA.sessionizeStream(stream, 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("sess_out")
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.contains((5L, 2L, 3.0)), s"first session of user 5: $out")
    assert(out.contains((5L, 1L, 4.0)), s"second session of user 5: $out")
    assert(out.contains((6L, 1L, 8.0)), s"user 6 session: $out")
    FsOps.deleteRecursively(src)
  }

  test("streaming windowed counts on bounded input match batch semantics") {
    val src = Files.createTempDirectory("graft_stream_win")
    import spark.implicits._
    val data = (0 until 100).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 25}%02d:10:00"),
        if (i % 2 == 0) "a" else "b", 1.0)
    }.toDF("event_id", "ts", "event_type", "value")
    data.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(data.schema).parquet(s"$src/in")
    val q = StreamAppend.windowedCounts(stream, "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("win_out")
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n").collect().toSeq
    val batch = graft.operators.Events.tumblingCounts(data, "1 hour")
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n").collect().toSeq
    assert(streamed == batch)

    FsOps.deleteRecursively(src)
  }

  test("streaming OHLC on bounded input equals the batch resample") {
    val src = Files.createTempDirectory("graft_stream_ohlc")
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val data = (0 until 120).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-01 ${i / 30}%02d:${i % 30 + 10}%02d:00"),
        if (i % 2 == 0) "a" else "b", rng.nextInt(100).toDouble)
    }.toDF("event_id", "ts", "event_type", "value")
    data.write.mode("overwrite").parquet(s"$src/in")

    val stream = spark.readStream.schema(data.schema).parquet(s"$src/in")
    val q = StreamAppend.ohlcStream(stream, widthSeconds = 3600)
      .writeStream.outputMode("complete").format("memory").queryName("ohlc_out").start()
    q.processAllAvailable(); q.stop()

    val cols = Seq("event_type", "bucket_start_s", "open", "high", "low", "close", "n", "volume")
    val streamed = spark.table("ohlc_out")
      .orderBy("event_type", "bucket_start_s")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    val batch = graft.operators.TimeSeries.ohlc(data, 3600, Seq("event_type"))
      .orderBy("event_type", "bucket_start_s")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.nonEmpty)

    FsOps.deleteRecursively(src)
  }
}
