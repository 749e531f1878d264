package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.store._

/** Streaming SOURCE over a graft item (`spark.readStream.format("graft")`):
  * period-granular incremental consumption driven by the sidecar's
  * generation stamps. The scale contract under test: a batch serves the
  * period DELTA between offsets (new periods whole, rewrites only under
  * ignoreChanges), backfill is admission-controlled in chronological
  * period steps, and a second run resumes from the checkpoint serving
  * only what arrived since. */
class GraftStreamingSourceSpec extends SparkSpec {

  private def frame(startDay: String, days: Int) = {
    import spark.implicits._
    val start = java.time.LocalDate.parse(startDay)
    (0 until days).map { i =>
      (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), i.toDouble)
    }.toDF("index", "value")
  }

  /** Drain one Trigger.AvailableNow run into a parquet sink dir and
    * return (rows now in the sink, number of non-empty batches added). */
  private def drain(itemPath: String, sinkDir: String, ckpt: String,
                    extraOptions: Map[String, String] = Map.empty): Long = {
    var reader = spark.readStream.format("graft")
    extraOptions.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(itemPath)
      .writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0)
  }

  test("incremental consumption: first run serves the item, resumed run serves only new periods") {
    val c = tempCollection("stream_src")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_src_out")
    val sink = s"$work/sink"; val ckpt = s"$work/ckpt"
    drain(item, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 60)
    // new period arrives; the resumed stream serves ONLY it
    c.append("item", frame("2024-03-01", 10))
    drain(item, sink, ckpt)
    val all = spark.read.parquet(sink)
    assert(all.count() == 70)
    // nothing new → third run adds nothing
    drain(item, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 70)
    // content parity with the item itself
    assert(all.orderBy("index").collect().toSeq ==
      c.item("item").data.orderBy("index").collect().toSeq)
    cleanup(c)
  }

  test("a rewritten period fails by default and re-serves whole under ignoreChanges") {
    val c = tempCollection("stream_chg")
    c.write("item", frame("2024-01-01", 40), monthlyLayout = true) // jan + feb(9d)
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_chg_out")
    drain(item, s"$work/sink", s"$work/ckpt")
    // same-period append REWRITES february in place
    c.append("item", frame("2024-02-15", 5))
    val e = intercept[StreamingQueryException](drain(item, s"$work/sink", s"$work/ckpt"))
    assert(e.getMessage.contains("ignoreChanges") || Option(e.getCause).exists(
      c => String.valueOf(c.getMessage).contains("ignoreChanges")))
    // with ignoreChanges the rewritten period re-serves WHOLE (period-level
    // replay: downstream sees feb twice — once per generation)
    drain(item, s"$work/sink", s"$work/ckpt", Map("ignoreChanges" -> "true"))
    val sunk = spark.read.parquet(s"$work/sink")
    val febNow = c.item("item").data
      .filter(col("index") >= lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))).count()
    assert(sunk.count() == 40 + febNow)
    cleanup(c)
  }

  test("maxPeriodsPerTrigger backfills in chronological bounded batches") {
    val c = tempCollection("stream_cap")
    c.write("item", frame("2024-01-01", 120), monthlyLayout = true) // 4 periods
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_cap_out")
    val batches = drain(item, s"$work/sink", s"$work/ckpt",
      Map("maxPeriodsPerTrigger" -> "1"))
    assert(batches == 4, s"4 periods at 1/trigger must drain in 4 batches, got $batches")
    assert(spark.read.parquet(s"$work/sink").count() == 120)
    cleanup(c)
  }

  test("startingOffsets=latest skips the existing item and serves only arrivals") {
    val c = tempCollection("stream_latest")
    c.write("item", frame("2024-01-01", 31), monthlyLayout = true)
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_latest_out")
    val opts = Map("startingOffsets" -> "latest")
    drain(item, s"$work/sink", s"$work/ckpt", opts)
    // a no-data batch may still emit an empty part file — rows are the contract
    assert(spark.read.parquet(s"$work/sink").count() == 0,
      "latest must serve nothing pre-existing")
    c.append("item", frame("2024-02-01", 5))
    drain(item, s"$work/sink", s"$work/ckpt", opts)
    assert(spark.read.parquet(s"$work/sink").count() == 5)
    cleanup(c)
  }

  test("flat items stream as one generation; deletes need ignoreDeletes") {
    val c = tempCollection("stream_flat")
    c.write("flat", frame("2024-01-01", 20))
    val item = c.path.resolve("flat").toString
    val work = java.nio.file.Files.createTempDirectory("stream_flat_out")
    drain(item, s"$work/sink", s"$work/ckpt")
    assert(spark.read.parquet(s"$work/sink").count() == 20)
    // any flat commit is a rewrite → ignoreChanges required
    c.append("flat", frame("2024-01-25", 3))
    intercept[StreamingQueryException](drain(item, s"$work/sink", s"$work/ckpt"))
    drain(item, s"$work/sink", s"$work/ckpt", Map("ignoreChanges" -> "true"))
    assert(spark.read.parquet(s"$work/sink").count() == 20 + 23)
    // dropped period on a monthly item: expiry needs ignoreDeletes
    val c2 = tempCollection("stream_del")
    c2.write("m", frame("2024-01-01", 60), monthlyLayout = true)
    val item2 = c2.path.resolve("m").toString
    val work2 = java.nio.file.Files.createTempDirectory("stream_del_out")
    drain(item2, s"$work2/sink", s"$work2/ckpt")
    c2.expireBefore("m", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")) // jan dies
    intercept[StreamingQueryException](drain(item2, s"$work2/sink", s"$work2/ckpt"))
    val n = drain(item2, s"$work2/sink", s"$work2/ckpt", Map("ignoreDeletes" -> "true"))
    assert(spark.read.parquet(s"$work2/sink").count() == 60, "a delete serves nothing new")
    cleanup(c); cleanup(c2)
  }

  test("the source is layout-agnostic: daily periods stream the same way") {
    val c = tempCollection("stream_daily")
    import spark.implicits._
    val df = frame("2024-01-01", 6)
    c.write("item", df, indexCols = Seq("index"), timeLayout = Some("daily"))
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_daily_out")
    drain(item, s"$work/sink", s"$work/ckpt")
    assert(spark.read.parquet(s"$work/sink").count() == 6)
    c.append("item", frame("2024-01-07", 2)) // two fresh day-periods
    val batches = drain(item, s"$work/sink", s"$work/ckpt",
      Map("maxPeriodsPerTrigger" -> "1"))
    assert(batches == 2, s"two new day dirs at 1/trigger = 2 batches, got $batches")
    assert(spark.read.parquet(s"$work/sink").count() == 8)
    cleanup(c)
  }

  test("startingSnapshot begins at a manifest cut, agreeing exactly with the batch CDC read") {
    val c = tempCollection("stream_from_snap")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    c.createSnapshot(Some("cut"), manifest = Some(true))
    c.append("item", frame("2024-03-01", 10)) // post-cut arrival
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_from_snap_out")
    val opts = Map("startingSnapshot" -> "cut")
    drain(item, s"$work/sink", s"$work/ckpt", opts)
    val streamed = spark.read.parquet(s"$work/sink")
    assert(streamed.count() == 10, "must serve only the post-cut period")
    // bootstrap-with-batch + tail-with-stream: identical delta
    val batchDelta = spark.read.format("graft").option("changesSince", "cut").load(item)
    assert(streamed.orderBy("index").collect().toSeq ==
      batchDelta.orderBy("index").collect().toSeq)
    // the checkpointed stream keeps tailing normally from there
    c.append("item", frame("2024-04-01", 4))
    drain(item, s"$work/sink", s"$work/ckpt", opts)
    assert(spark.read.parquet(s"$work/sink").count() == 14)
    // dir snapshots pin no generations: typed refusal
    c.createSnapshot(Some("dcut"), manifest = Some(false))
    val work2 = java.nio.file.Files.createTempDirectory("stream_from_snap2")
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").option("startingSnapshot", "dcut")
        .load(item).writeStream.format("parquet").option("path", s"$work2/sink")
        .option("checkpointLocation", s"$work2/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("MANIFEST")), messages(e).mkString(" | "))
    cleanup(c)
  }

  test("startingTimestamp anchors at the latest manifest <= t, the catalog's TIMESTAMP AS OF rule") {
    val c = tempCollection("stream_from_ts")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    c.createSnapshot(Some("cut"), manifest = Some(true))
    Thread.sleep(1100) // manifest stamps are second-granular
    val afterCut = java.time.Instant.now()
    c.append("item", frame("2024-03-01", 10)) // post-cut arrival
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_from_ts_out")
    // a timestamp after the cut resolves to the cut's manifest: the
    // stream serves exactly the post-cut delta, like startingSnapshot
    drain(item, s"$work/sink", s"$work/ckpt",
      Map("startingTimestamp" -> afterCut.toString))
    assert(spark.read.parquet(s"$work/sink").count() == 10)
    // the UTC date-time spelling parses too
    val work2 = java.nio.file.Files.createTempDirectory("stream_from_ts2")
    val local = java.time.LocalDateTime.ofInstant(afterCut, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    drain(item, s"$work2/sink", s"$work2/ckpt", Map("startingTimestamp" -> local))
    assert(spark.read.parquet(s"$work2/sink").count() == 10)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    // no manifest predates t: typed (never a silent whole-item replay)
    val work3 = java.nio.file.Files.createTempDirectory("stream_from_ts3")
    val e1 = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("startingTimestamp", "2001-01-01T00:00:00Z")
        .load(item).writeStream.format("parquet").option("path", s"$work3/sink")
        .option("checkpointLocation", s"$work3/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(messages(e1).exists(_.contains("no manifest snapshot")), messages(e1).mkString(" | "))
    // unparseable timestamp and mutually-exclusive options: typed
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("graft").option("startingTimestamp", "not-a-time")
        .load(item).writeStream.format("parquet").option("path", s"$work3/sink2")
        .option("checkpointLocation", s"$work3/ckpt2")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(messages(e2).exists(_.contains("ISO-8601")), messages(e2).mkString(" | "))
    val e3 = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("startingTimestamp", afterCut.toString)
        .option("startingSnapshot", "cut")
        .load(item).writeStream.format("parquet").option("path", s"$work3/sink3")
        .option("checkpointLocation", s"$work3/ckpt3")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(messages(e3).exists(_.contains("mutually exclusive")), messages(e3).mkString(" | "))
    cleanup(c)
  }

  test("startingTimestamp at a live instant needs NO snapshot: commit-log anchor") {
    val c = tempCollection("stream_ts_live")
    c.write("item", frame("2024-01-01", 31), monthlyLayout = true)
    assert(store.Snapshots.userManifestStamps(c.path).isEmpty)
    val t = java.time.Instant.now() // state at t IS the live state
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_ts_live_out")
    // round 8 refused this outright (no manifest predates t); the commit
    // log proves the write generation is current → anchor at live pins:
    // the stream starts quiet...
    drain(item, s"$work/sink", s"$work/ckpt", Map("startingTimestamp" -> t.toString))
    assert(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$work/sink")) ||
      spark.read.parquet(s"$work/sink").count() == 0)
    // ...and tails exactly what arrives after t
    c.append("item", frame("2024-02-01", 5))
    drain(item, s"$work/sink", s"$work/ckpt", Map("startingTimestamp" -> t.toString))
    assert(spark.read.parquet(s"$work/sink").count() == 5)
    cleanup(c)
  }

  test("cross-shape startingSnapshot (layout converted since the cut) serves the whole item") {
    val c = tempCollection("stream_xshape")
    c.write("item", frame("2024-01-01", 40)) // flat at the cut
    c.createSnapshot(Some("cut"), manifest = Some(true))
    c.convertLayout("item", timeLayout = Some("monthly")) // pins flat, live time-layout
    c.append("item", frame("2024-03-01", 5))
    val item = c.path.resolve("item").toString
    val work = java.nio.file.Files.createTempDirectory("stream_xshape_out")
    // the conversion rewrote every row → everything changed since the
    // cut: the stream serves the whole live item as "added" (exactly
    // what the batch CDC read serves), instead of failing on the
    // flat-pin vs period-offset shape mismatch
    drain(item, s"$work/sink", s"$work/ckpt", Map("startingSnapshot" -> "cut"))
    val streamed = spark.read.parquet(s"$work/sink")
    assert(streamed.count() == 45, s"whole live item expected, got ${streamed.count()}")
    val batchDelta = spark.read.format("graft").option("changesSince", "cut").load(item)
    assert(streamed.orderBy("index").collect().toSeq ==
      batchDelta.orderBy("index").collect().toSeq)
    cleanup(c)
  }

  test("a replayed batch serves the offset's RETAINED generation after an in-place rewrite") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.datasources.FilePartition
    val c = tempCollection("stream_replay")
    c.write("item", frame("2024-01-01", 40), monthlyLayout = true) // jan(31) + feb(9)
    val item = c.path.resolve("item").toString
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", item))
    val table = graft.sources.GraftTable.resolve(opts)
    val scan = table.newScanBuilder(opts).build()
    val stream = scan.toMicroBatchStream("unused_ckpt")
      .asInstanceOf[graft.sources.GraftMicroBatchStream]
    // the batch a first run would plan: everything up to the current cut
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
    // a manifest pins the cut, then february is REWRITTEN in place —
    // the commit retains feb@old-gen because the pin references it
    c.createSnapshot(Some("anchor"), manifest = Some(true))
    c.append("item", frame("2024-02-15", 5))
    assert(c.item("item").data.count() == 45)
    // replaying (start, end] — e.g. after a crash before the sink
    // committed — must serve the 40 rows the offset named, NOT the 45
    // now in the live dirs: february resolves to the retained dir
    def servedFiles(parts: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      parts.collect { case fp: FilePartition => fp.files.map(_.filePath.toString) }.flatten
    val files = servedFiles(stream.planInputPartitions(start, end))
    assert(files.exists(_.contains(graft.store.Snapshots.RetainedDir)),
      s"rewritten feb must serve from the retained generation, got:\n${files.mkString("\n")}")
    assert(spark.read.parquet(files.toIndexedSeq: _*).count() == 40,
      "replay must be byte-identical to the original batch")
    // the live tail still streams the rewrite normally (ignoreChanges)
    val opts2 = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", item, "ignoreChanges", "true"))
    val s2 = graft.sources.GraftTable.resolve(opts2)
      .newScanBuilder(opts2).build().toMicroBatchStream("unused_ckpt2")
      .asInstanceOf[graft.sources.GraftMicroBatchStream]
    val next = s2.latestOffset(end, ReadLimit.allAvailable())
    val nextFiles = servedFiles(s2.planInputPartitions(end, next))
    assert(spark.read.parquet(nextFiles.toIndexedSeq: _*).count() == 14,
      "the changed-period batch serves live february whole")
    // flat items retain the same way: pinned old generation replays exact
    val cf = tempCollection("stream_replay_flat")
    cf.write("flat", frame("2024-01-01", 20))
    val fitem = cf.path.resolve("flat").toString
    val fopts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", fitem))
    val fs = graft.sources.GraftTable.resolve(fopts)
      .newScanBuilder(fopts).build().toMicroBatchStream("unused_ckpt3")
      .asInstanceOf[graft.sources.GraftMicroBatchStream]
    val f0 = fs.initialOffset(); val f1 = fs.latestOffset(f0, ReadLimit.allAvailable())
    cf.createSnapshot(Some("anchor"), manifest = Some(true))
    cf.append("flat", frame("2024-01-25", 3)) // flat rewrite, old gen retained
    val ffiles = servedFiles(fs.planInputPartitions(f0, f1))
    assert(ffiles.exists(_.contains(graft.store.Snapshots.RetainedDir)), ffiles.mkString("\n"))
    assert(spark.read.parquet(ffiles.toIndexedSeq: _*).count() == 20)
    cleanup(c); cleanup(cf)
  }

  test("replay of a RETAINED generation is never pruned by the LIVE period stats") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.functions.col
    val c = tempCollection("stream_replay_stats")
    // january values 0..30; declared stats on `value` so non-index
    // predicates prune periods
    c.write("item", frame("2024-01-01", 31), monthlyLayout = true,
      statsColumns = Seq("value"))
    val item = c.path.resolve("item").toString
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", item))
    val builder = graft.sources.GraftTable.resolve(opts).newScanBuilder(opts)
    builder.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("value", 20.0)))
    val stream = builder.build().toMicroBatchStream("unused_ckpt")
      .asInstanceOf[graft.sources.GraftMicroBatchStream]
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
    // pin the cut, then rewrite january so its LIVE stats ([0,19])
    // EXCLUDE the filter range the offset's rows satisfy
    c.createSnapshot(Some("anchor"), manifest = Some(true))
    c.deleteWhere("item", col("value") >= 20.0)
    assert(c.item("item").data.count() == 20)
    // the crash replay of (start, end] must serve the RETAINED january
    // (values 0..30) — pruning it by the rewrite's bounds would silently
    // lose the 11 rows the original batch delivered
    val parts = stream.planInputPartitions(start, end)
    val files = parts.collect {
      case fp: FilePartition => fp.files.map(_.filePath.toString)
    }.flatten
    assert(files.nonEmpty, "replayed period must not be stats-pruned away")
    assert(files.exists(_.contains(graft.store.Snapshots.RetainedDir)), files.mkString("\n"))
    val replayed = spark.read.parquet(files.toIndexedSeq: _*)
    assert(replayed.filter(col("value") >= 20.0).count() == 11,
      "replay must deliver the offset's matching rows")
    cleanup(c)
  }

  test("snapshot-pinned reads refuse streaming with a typed error") {
    val c = tempCollection("stream_snap")
    c.write("item", frame("2024-01-01", 10), monthlyLayout = true)
    c.createSnapshot(Some("v1"), manifest = Some(true))
    val work = java.nio.file.Files.createTempDirectory("stream_snap_out")
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").option("snapshot", "v1")
        .load(c.path.resolve("item").toString)
        .writeStream.format("parquet").option("path", s"$work/sink")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("immutable")), messages(e).mkString(" | "))
    cleanup(c)
  }
}
