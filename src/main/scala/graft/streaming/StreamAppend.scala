package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.store.{Collection, DuplicateHandling}

/** Input/state/output records for streaming sessionization. */
final case class SessionEvent(event_id: Long, ts: java.sql.Timestamp,
                              user_id: Long, value: Double)
final case class SessionState(start: Long, end: Long, n: Long, total: Double)
final case class SessionSummary(user_id: Long, session_start_ms: Long,
                                session_end_ms: Long, n_events: Long, total_value: Double)

/** Structured Streaming ingestion into a collection item.
  *
  * The reference's "streaming" is pull-based chunk iteration
  * (append_stream, collection.py:677-751); its true-streaming upgrade
  * path (SURVEY §2.16) is exactly this: a `writeStream.foreachBatch`
  * sink that funnels each micro-batch through the SAME append pipeline
  * (anti-join dedup → union → range repartition → atomic swap), so
  * batch and streaming ingestion have identical semantics.
  *
  * Watermark + dropDuplicatesWithinWatermark replace the anti-join for
  * *within-stream* duplicates; the per-batch append still dedups
  * against the *stored* item. Exactly-once: foreachBatch may re-deliver
  * a batch on recovery — the index-dedup append makes re-delivery
  * idempotent (KeepLast of identical rows is a no-op), which is the
  * standard idempotent-sink recipe.
  */
object StreamAppend {

  /** Attach a streaming DataFrame to an item. Caller starts/stops the
    * returned writer. */
  def intoItem(stream: DataFrame,
               collection: Collection,
               item: String,
               indexCols: Seq[String] = Seq(Collection.DefaultIndex),
               handling: DuplicateHandling = DuplicateHandling.KeepLast,
               watermarkCol: Option[String] = None,
               watermarkDelay: String = "10 minutes"): DataStreamWriter[Row] = {
    val deduped = watermarkCol match {
      case Some(c) => stream.withWatermark(c, watermarkDelay)
        .dropDuplicatesWithinWatermark(indexCols.head, indexCols.tail: _*)
      case None => stream
    }
    deduped.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (!collection.hasItem(item)) collection.write(item, batch, indexCols)
          else collection.append(item, batch, handling)
        }
      }
  }

  /** Event-time tumbling-window aggregation with watermarking — the
    * streaming twin of Events.tumblingCounts (same output schema, so
    * the batch oracle validates the streaming semantics on bounded
    * input). */
  def windowedCounts(stream: DataFrame,
                     width: String = "1 hour",
                     watermarkDelay: String = "30 minutes"): DataFrame =
    stream.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,4)")).cast("double"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("total_value"))

  /** Streaming OHLC — the batch twin is TimeSeries.ohlc with the same
    * bucket arithmetic and (ts, tie) open/close selection, so a
    * streaming ingest and a batch backfill produce identical bars.
    * min_by/max_by are declarative aggregates, fully incremental under
    * watermarked append mode — no custom state needed. */
  def ohlcStream(stream: DataFrame,
                 widthSeconds: Long = 3600,
                 keyCols: Seq[String] = Seq("event_type"),
                 watermarkDelay: String = "30 minutes",
                 tieCol: String = "event_id"): DataFrame = {
    val bucket = expr(
      s"((unix_micros(`ts`) div 1000000) div ${widthSeconds}L) * ${widthSeconds}L")
      .as("bucket_start_s")
    val ord = struct(col("ts"), col(tieCol))
    stream.withWatermark("ts", watermarkDelay)
      .groupBy((keyCols.map(col) :+ window(col("ts"), s"$widthSeconds seconds").as("__w") :+ bucket): _*)
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,4)")).cast("double"), 2).as("volume"))
      .drop("__w")
  }

  /** Streaming gap-sessionization with custom state
    * (`flatMapGroupsWithState` + event-time timeout): per user, events
    * accumulate into an open session; when the watermark passes the
    * session's gap horizon the session closes and one summary row is
    * emitted. The batch twin is Events.sessionStats — same shape of
    * output, incremental computation.
    *
    * State per key is O(1) (bounds, count, sum — not the events), so
    * state store size scales with ACTIVE users, not history. */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[SessionEvent],
                       gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    def fn(userId: Long, evs: Iterator[SessionEvent],
           state: GroupState[SessionState]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionSummary(userId, s.start, s.end, s.n, s.total))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[SessionSummary]
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.ts.getTime - s.end <= gapMs =>
              cur = Some(SessionState(s.start, e.ts.getTime, s.n + 1, s.total + e.value))
            case Some(s) =>
              closed ::= SessionSummary(userId, s.start, s.end, s.n, s.total)
              cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value))
            case None =>
              cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** Streaming exact content-dedup — the streaming twin of
    * `Dedup.exact` for a continuously-arriving document stream: each
    * document is fingerprinted (128-bit md5 of the text, so state holds
    * a hash instead of MB-sized payloads) and later copies within the
    * watermark horizon are dropped. State size is bounded by the
    * horizon; at 100 TB/day the horizon IS the dedup window contract,
    * and historical dedup stays with the batch operators. */
  def dedupStream(stream: DataFrame,
                  textCol: String = "text",
                  tsCol: String = "ts",
                  watermarkDelay: String = "1 hour"): DataFrame =
    stream.withColumn("__fp", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming NEAR-dup detection — the streaming twin of
    * `Dedup.minhashLshPairs`: banded MinHash signatures feed a
    * stream-stream self-join on (band, band-hash) within the watermark
    * horizon, candidates pay the exact shingle-Jaccard verification,
    * and multi-band hits collapse via dropDuplicatesWithinWatermark on
    * the pair key. Emits (id_a, id_b, ts, jaccard) for every pair of
    * in-horizon documents with jaccard ≥ threshold — on bounded input,
    * exactly the batch operator's pair set (StreamingSpec proves it).
    *
    * State economics: the join state holds each doc's banded keys AND
    * its shingle set for the horizon (the verification needs it — at
    * 100 TB/day the shingle set would instead be re-fetched from the
    * store at verify time, trading state size for a point lookup);
    * band keys are uniform 64-bit hashes, so the join state shards
    * evenly. State is bounded by the watermark horizon on BOTH sides
    * of the join — the time-interval predicate is what lets the state
    * store evict. */
  def nearDupPairsStream(stream: DataFrame,
                         threshold: Double,
                         numHashes: Int = 64,
                         bands: Int = 16,
                         shingleK: Int = 3,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         tsCol: String = "ts",
                         watermarkDelay: String = "1 hour"): DataFrame = {
    import graft.operators.Dedup
    val banded = stream.select(col(idCol).as("id"), col(tsCol).as("ts"),
        Dedup.shingles(col(textCol), shingleK).as("sh"))
      .select(col("id"), col("ts"), col("sh"),
        posexplode(graft.functions.expressions.minhash_bands(
          col("sh"), numHashes, bands)).as(Seq("band", "bh")))
    val a = banded.withWatermark("ts", watermarkDelay).alias("a")
    val b = banded.withWatermark("ts", watermarkDelay).alias("b")
    a.join(b, expr(
        s"""a.band = b.band AND a.bh = b.bh AND a.id < b.id AND
           |b.ts BETWEEN a.ts - INTERVAL $watermarkDelay
           |         AND a.ts + INTERVAL $watermarkDelay""".stripMargin))
      .withColumn("jaccard", Dedup.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("jaccard") >= threshold)
      // keep a.ts AS the event-time attribute: its watermark carries
      // through the join, so the pair-dedup below is a second stateful
      // operator on the same watermark (re-defining one is disallowed)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.ts").as("ts"), round(col("jaccard"), 6).as("jaccard"))
      .dropDuplicatesWithinWatermark("id_a", "id_b")
  }

  /** Streaming SEARCH-INDEX maintenance — each micro-batch of newly
    * arrived documents incrementally appends to a persisted BM25 index
    * (`Search.appendToBm25Index`: postings append + dictionary merge +
    * corpus-stat update, O(batch + dictionary) per batch; analyzer
    * frozen). Searches between batches read a consistent snapshot
    * through the store's atomic generations.
    *
    * Exactly-once: unlike `intoItem` (whose index-dedup append makes
    * re-delivery a no-op), a BM25 append is NOT naturally idempotent —
    * re-delivering a batch would double-count postings and df. The
    * sink therefore records the last applied epoch id in the
    * dictionary item's metadata IN the same atomic write as the merge,
    * and skips any batch at or below it — the standard transactional
    * foreachBatch recipe. */
  def intoBm25Index(stream: DataFrame,
                    collection: Collection,
                    name: String,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataStreamWriter[Row] = {
    import graft.operators.Search
    def lastApplied(): Long =
      collection.metadata(s"${name}__terms").get("bm25_stream_batch") match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case _ => -1L
      }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          if (!collection.hasItem(s"${name}__terms")) {
            Search.buildAndSaveBm25Index(batch, collection, name,
              textCol = textCol, idCol = idCol,
              extraMetadata = Map("bm25_stream_batch" -> batchId))
            ()
          } else if (batchId > lastApplied()) {
            Search.appendToBm25Index(batch, collection, name, textCol, idCol,
              extraMetadata = Map("bm25_stream_batch" -> batchId))
            ()
          }
          // else: re-delivered batch already folded in — skip
        }
      }
  }

  /** Streaming DEDUPED INGEST — the continuous-corpus-construction
    * loop a 100 TB training-data pipeline runs: each micro-batch is
    * near-dup-probed against the PERSISTED MinHash index
    * ([[graft.operators.DedupIndex.probeMinhashIndex]] — O(batch +
    * candidates), the corpus is never re-read), matched docs are
    * dropped (a batch doc dies to any indexed near-dup, or to a
    * smaller-id near-dup within its own batch — the same deterministic
    * keep-rule as `pipelineCuration`), and ONLY the survivors append to
    * the index, in O(batch). Unlike the in-horizon
    * [[nearDupPairsStream]], the dedup window here is the WHOLE
    * accumulated corpus — state lives in the store, not the state
    * store, so there is no watermark-horizon contract to trade away.
    *
    * Exactly-once: the epoch watermark rides a tiny `name__epoch` item
    * rewritten (atomic rename) AFTER the appends — the same
    * last-write-carries-the-epoch recipe as [[intoBm25Index]], with the
    * same residual window (a crash between the first append and the
    * epoch write re-delivers the batch; band-row duplicates are
    * candidate-level only — `probeMinhashIndex` distincts candidates —
    * and shingle-row duplicates are prevented by the epoch skip). */
  def intoMinhashIndex(stream: DataFrame,
                       collection: Collection,
                       name: String,
                       threshold: Double,
                       numHashes: Int = 64,
                       numBands: Int = 16,
                       shingleK: Int = 3,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataStreamWriter[Row] = {
    import graft.operators.DedupIndex
    def lastApplied(): Long =
      if (!collection.hasItem(s"${name}__epoch")) -1L
      else collection.metadata(s"${name}__epoch").get("minhash_stream_batch") match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case _ => -1L
      }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        def writeEpoch(): Unit =
          collection.write(s"${name}__epoch", Seq(batchId).toDF("batch_id"),
            indexCols = Seq("batch_id"),
            metadata = Map("minhash_stream_batch" -> batchId), overwrite = true)
        if (!batch.isEmpty && batchId > lastApplied()) {
          if (!collection.hasItem(s"${name}__shingles")) {
            // first batch: self-dedup (shared gate rule), then build
            val survivors = DedupIndex.minhashSelfSurvivors(batch, threshold,
              numHashes, numBands, shingleK, textCol, idCol)
            DedupIndex.buildAndSaveMinhashIndex(survivors, collection, name,
              numHashes, numBands, shingleK, textCol, idCol)
            ()
          } else {
            val idx = DedupIndex.MinhashIndex.load(collection, name)
            // shared gate decision — the batch replay query
            // stream_minhash_gate runs this exact function, so the
            // sink's drop rule is anchored to the DuckDB oracle
            val (surv, retained) = DedupIndex.minhashGateSurvivors(
              idx, batch, threshold, textCol, idCol)
            val survivors = surv
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            if (!survivors.isEmpty)
              DedupIndex.appendToMinhashIndex(survivors, collection, name,
                textCol, idCol)
            survivors.unpersist(blocking = false)
            // per-batch cache turnover: the probe's batch-lifetime
            // caches die with the batch, not with the stream
            retained.foreach(_.unpersist(blocking = false))
          }
          writeEpoch()
        }
      }
  }

  /** Streaming substring-overlap gate over a PERSISTED winnow index —
    * the contamination/excerpt filter as an ingest sink: each
    * micro-batch is winnowed once and probed against the df-capped
    * corpus fingerprints; batch docs sharing ≥ `minShared`
    * fingerprints with ANY indexed doc are dropped, survivors' rows
    * append in O(batch), and the epoch watermark makes re-delivery
    * exactly-once. First batch: in-batch substring self-dedup (larger
    * id dies), then build. Note the asymmetry with the MinHash sink:
    * the probe emits batch×corpus pairs only, so in-batch overlap is
    * handled by the one-shot operator per batch. */
  def intoWinnowIndex(stream: DataFrame,
                      collection: Collection,
                      name: String,
                      minShared: Int = 5,
                      maxDocFreq: Int = 50,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataStreamWriter[Row] = {
    import graft.operators.{Dedup, DedupIndex}
    def lastApplied(): Long =
      if (!collection.hasItem(s"${name}__epoch")) -1L
      else collection.metadata(s"${name}__epoch").get("winnow_stream_batch") match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case _ => -1L
      }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        def writeEpoch(): Unit =
          collection.write(s"${name}__epoch", Seq(batchId).toDF("batch_id"),
            indexCols = Seq("batch_id"),
            metadata = Map("winnow_stream_batch" -> batchId), overwrite = true)
        if (!batch.isEmpty && batchId > lastApplied()) {
          if (!collection.hasItem(s"${name}__wfps")) {
            val pairs = Dedup.substringDuplicationPairs(batch, minShared,
              maxDocFreq, idCol = idCol, textCol = textCol)
            val drops = pairs.select(col("id_b").as("drop_id")).distinct()
            val survivors = batch.join(drops,
              batch(idCol) === drops("drop_id"), "left_anti")
            DedupIndex.buildAndSaveWinnowIndex(survivors, collection, name,
              maxDocFreq, textCol = textCol, idCol = idCol)
            ()
          } else {
            val idx = DedupIndex.WinnowIndex.load(collection, name)
            // cross pairs: the batch side dies whichever end it is
            val cross = DedupIndex.probeWinnowIndex(idx, batch, minShared,
              textCol, idCol)
            val bIds = batch.select(col(idCol).as("bid"))
            val crossDrops = cross
              .join(bIds.select(col("bid").as("id_a"), lit(true).as("a_new")),
                Seq("id_a"), "left")
              .select(when(col("a_new").isNotNull, col("id_a"))
                .otherwise(col("id_b")).as("drop_id"))
            // in-batch pairs: larger id dies
            val selfDrops = Dedup.substringDuplicationPairs(batch, minShared,
                maxDocFreq, idCol = idCol, textCol = textCol)
              .select(col("id_b").as("drop_id"))
            val drops = crossDrops.unionByName(selfDrops).distinct()
            val survivors = batch.join(drops,
              batch(idCol) === drops("drop_id"), "left_anti")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            if (!survivors.isEmpty)
              DedupIndex.appendToWinnowIndex(survivors, collection, name,
                textCol, idCol)
            survivors.unpersist(blocking = false)
          }
          writeEpoch()
        }
      }
  }

  /** Streaming deduped MEDIA ingest over a PERSISTED Hamming
    * fingerprint index — [[intoMinhashIndex]]'s contract for any
    * 64-bit signature stream (image aHash, audio band-energy, video
    * temporal+spatial): each micro-batch probes the persisted chunk
    * index (corpus never re-fingerprinted), drops matched rows
    * (batch-batch pair → larger id dies; batch-corpus pair → the batch
    * side dies), appends survivors in O(batch), and advances the
    * transactional epoch watermark so re-delivered batches are
    * skipped — exactly-once despite the non-idempotent KeepAll
    * append. The first batch self-dedups with the batch operator and
    * builds the index. */
  def intoHammingIndex(stream: DataFrame,
                       collection: Collection,
                       name: String,
                       radius: Int,
                       idCol: String = "id",
                       hashCol: String = "h"): DataStreamWriter[Row] = {
    import graft.operators.DedupIndex
    def lastApplied(): Long =
      if (!collection.hasItem(s"${name}__epoch")) -1L
      else collection.metadata(s"${name}__epoch").get("hamming_stream_batch") match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case _ => -1L
      }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        def writeEpoch(): Unit =
          collection.write(s"${name}__epoch", Seq(batchId).toDF("batch_id"),
            indexCols = Seq("batch_id"),
            metadata = Map("hamming_stream_batch" -> batchId), overwrite = true)
        if (!batch.isEmpty && batchId > lastApplied()) {
          if (!collection.hasItem(s"${name}__hchunks")) {
            val pairs = graft.operators.Dedup.hammingPairs(batch, radius,
              idCol, hashCol)
            val drops = pairs.select(col("id_b").as("drop_id")).distinct()
            val survivors = batch.join(drops,
              batch(idCol) === drops("drop_id"), "left_anti")
            DedupIndex.buildAndSaveHammingIndex(survivors, collection, name,
              radius, idCol, hashCol)
            ()
          } else {
            val idx = DedupIndex.HammingIndex.load(collection, name)
            val pairs = DedupIndex.probeHammingIndex(idx, batch,
              idCol = idCol, hashCol = hashCol)
            val bIds = batch.select(col(idCol).as("bid"))
            val drops = pairs
              .join(bIds.select(col("bid").as("id_a"), lit(true).as("a_new")),
                Seq("id_a"), "left")
              .join(bIds.select(col("bid").as("id_b"), lit(true).as("b_new")),
                Seq("id_b"), "left")
              .select(when(col("a_new").isNotNull && col("b_new").isNotNull,
                  greatest(col("id_a"), col("id_b")))
                .when(col("a_new").isNotNull, col("id_a"))
                .otherwise(col("id_b")).as("drop_id"))
              .distinct()
            val survivors = batch.join(drops,
              batch(idCol) === drops("drop_id"), "left_anti")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            if (!survivors.isEmpty)
              DedupIndex.appendToHammingIndex(survivors, collection, name,
                idCol, hashCol)
            survivors.unpersist(blocking = false)
          }
          writeEpoch()
        }
      }
  }

  /** Streaming ANN SEARCH over a PERSISTED IVF index — continuous
    * vector-similarity serving (the query-side twin of the index-
    * maintenance sinks): each micro-batch of query vectors runs
    * [[graft.operators.Similarity.ivfSearch]] against the store-loaded
    * index — coarse probe localized per batch, `cid IN` row-group
    * pruning, exact ranking inside probed lists only — and the top-k
    * results land in `outItem` via an index-deduped KeepLast append on
    * (query_id, rank): re-delivered batches overwrite their own rows,
    * so the sink is idempotent without an epoch watermark (the
    * intoItem contract, not the BM25 one). The index is re-loaded per
    * batch, so searches always see the latest atomic store generation
    * (appendToIvfIndex can run concurrently). */
  def searchIvfStream(stream: DataFrame,
                      collection: Collection,
                      indexName: String,
                      outItem: String,
                      k: Int,
                      nprobe: Int = 4,
                      vecCol: String = "embedding",
                      idCol: String = "vec_id"): DataStreamWriter[Row] = {
    import graft.operators.Similarity
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val idx = Similarity.IvfIndex.load(collection, indexName)
          val res = Similarity.ivfSearch(idx, batch, k, nprobe, vecCol, idCol)
          if (!collection.hasItem(outItem))
            collection.write(outItem, res, indexCols = Seq("query_id", "rank"))
          else
            collection.append(outItem, res,
              graft.store.DuplicateHandling.KeepLast)
        }
      }
  }

  /** Streaming embedding ingest into a PERSISTED IVF index — the
    * vector-side twin of intoBm25Index: the first batch fits the
    * coarse quantizer and persists the index; every later batch is
    * assigned under the FROZEN quantizer and appended to the
    * cid-indexed item in O(batch) (`Similarity.appendToIvfIndex`, the
    * FAISS add() contract — a quantizer refit is an offline rebuild).
    * Searches between batches (`searchIvfStream` or batch `ivfSearch`)
    * read a consistent snapshot through the store's atomic
    * generations. KeepAll assignment appends are NOT idempotent, so
    * the sink records the applied epoch in a tiny item rewritten after
    * each append and skips re-delivered batches. */
  def intoIvfIndex(stream: DataFrame,
                   collection: Collection,
                   name: String,
                   nlist: Int = 16,
                   kmeansIters: Int = 2,
                   vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataStreamWriter[Row] = {
    import graft.operators.Similarity
    def lastApplied(): Long =
      if (!collection.hasItem(s"${name}__ivf_epoch")) -1L
      else collection.metadata(s"${name}__ivf_epoch").get("ivf_stream_batch") match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case _ => -1L
      }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        def writeEpoch(): Unit =
          collection.write(s"${name}__ivf_epoch", Seq(batchId).toDF("batch_id"),
            indexCols = Seq("batch_id"),
            metadata = Map("ivf_stream_batch" -> batchId), overwrite = true)
        if (!batch.isEmpty && batchId > lastApplied()) {
          if (!collection.hasItem(s"${name}__centroids"))
            Similarity.buildIvfIndex(batch, nlist, kmeansIters,
              vecCol = vecCol, idCol = idCol).save(collection, name)
          else
            Similarity.appendToIvfIndex(batch, collection, name, vecCol, idCol)
          writeEpoch()
        }
      }
  }

  /** Streaming perplexity gate over a PERSISTED bigram LM — the
    * quality filter as an ingest sink: each micro-batch is scored
    * against the frozen model (two vocabulary-sized dictionary joins,
    * LanguageModel.scoreDocs), documents whose avg negative
    * ln-likelihood exceeds `maxNll` are dropped, and survivors append
    * through the index-dedup item path. The model is LOADED per batch,
    * never refit — refitting is an offline `appendToLm` job, exactly
    * like the ANN/BM25 sinks' frozen-index contract. Scoring is
    * stateless and deterministic, so re-delivery idempotency needs no
    * epoch watermark: KeepLast of identical survivor rows is a no-op.
    * Documents with no bigram (nll 0) pass — length filtering is a
    * different rule's job. */
  def intoLmGate(stream: DataFrame,
                 collection: Collection,
                 lmName: String,
                 item: String,
                 maxNll: Double,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataStreamWriter[Row] = {
    import graft.operators.LanguageModel
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val lm = LanguageModel.BigramLm.load(collection, lmName)
          val keep = LanguageModel.scoreDocs(lm, batch, textCol, idCol)
            .filter(col("nll") <= maxNll)
            .select(col(idCol))
          val survivors = batch.join(keep, Seq(idCol), "left_semi")
          if (!survivors.isEmpty) {
            if (!collection.hasItem(item))
              collection.write(item, survivors, indexCols = Seq(idCol))
            else collection.append(item, survivors, DuplicateHandling.KeepLast)
          }
        }
      }
  }

  /** Streaming class gate over a PERSISTED Naive Bayes model — the
    * trained-filter counterpart of [[intoLmGate]]: each micro-batch is
    * classified against the frozen model ([[TextClassifier.classify]]:
    * one trigram explode + one skinny model join + exact-decimal
    * argmax), documents whose predicted label is outside `keepLabels`
    * are dropped, and survivors append WITH their `pred` column
    * through the index-dedup item path. The model is LOADED per batch,
    * never refit — refitting is an offline [[TextClassifier.append]]
    * job, the frozen-index contract every sink here shares. Scoring is
    * stateless and deterministic, so re-delivery idempotency needs no
    * epoch watermark: KeepLast of identical survivor rows is a no-op. */
  def intoNbGate(stream: DataFrame,
                 collection: Collection,
                 modelName: String,
                 item: String,
                 keepLabels: Seq[String],
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataStreamWriter[Row] = {
    import graft.operators.TextClassifier
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val m = TextClassifier.NaiveBayes.load(collection, modelName)
          val preds = TextClassifier.classify(batch, m, idCol, textCol)
            .filter(col("pred").isin(keepLabels: _*))
          val survivors = batch.join(preds, Seq(idCol))
          if (!survivors.isEmpty) {
            if (!collection.hasItem(item))
              collection.write(item, survivors, indexCols = Seq(idCol))
            else collection.append(item, survivors, DuplicateHandling.KeepLast)
          }
        }
      }
  }

  /** Run a bounded streaming job to completion (test/driver helper). */
  def runToCompletion(writer: DataStreamWriter[Row]): Unit = {
    val q: StreamingQuery = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
