package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

import graft.store._

/** Batch CDC: `spark.read.format("graft").option("changesSince",
  * "<manifest snapshot>")` serves the period delta between a snapshot's
  * pinned generations and the live sidecar — new periods whole,
  * rewritten periods whole (period-granular replay), removed periods
  * nothing, all decided from driver-side metadata with the scan's roots
  * narrowed BEFORE any listing. */
class GraftChangesSpec extends SparkSpec {

  private def frame(startDay: String, days: Int, tag: String = "r") = {
    import spark.implicits._
    val start = java.time.LocalDate.parse(startDay)
    (0 until days).map { i =>
      (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), i.toDouble, s"$tag$i")
    }.toDF("index", "value", "tag")
  }

  private def changes(c: Collection, item: String, snap: String) =
    spark.read.format("graft").option("changesSince", snap)
      .load(c.path.resolve(item).toString)

  private def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst {
      case b: BatchScanExec => b.scan match {
        case g: graft.sources.GraftScan => g.parquet
        case p: ParquetScan             => p
      }
    }.map(_.fileIndex.rootPaths.map(_.toString))
      .getOrElse(fail("no V2 scan in plan:\n" + plan))
  }

  test("changesSinceTimestamp anchors CDC at an instant via the commit log") {
    val c = tempCollection("cdc_ts")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    Thread.sleep(1100) // the date-time spelling below truncates to seconds
    val t = java.time.Instant.now() // live at t, NO snapshot anywhere
    assert(Snapshots.userManifestStamps(c.path).isEmpty)
    // nothing changed since t: the empty delta with the item's schema
    def deltaAt(ts: String) = spark.read.format("graft")
      .option("changesSinceTimestamp", ts)
      .load(c.path.resolve("item").toString)
    val quiet = deltaAt(t.toString)
    assert(quiet.count() == 0)
    assert(quiet.schema.fieldNames.toSeq == Seq("index", "value", "tag"))
    // post-t arrivals serve exactly like changesSince a snapshot at t
    c.append("item", frame("2024-03-01", 10, tag = "new"))
    val delta = deltaAt(t.toString)
    val roots = scanRoots(delta)
    assert(roots.size == 1 && roots.head.endsWith("=2024-03"), roots)
    assert(delta.count() == 10)
    // the UTC date-time spelling parses; a rewritten unpinned instant
    // refuses with the honest error; the options are mutually exclusive
    val local = java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(deltaAt(local).count() == 10)
    // an instant whose DATA is gone still anchors CDC: the delta only
    // needs the generation map at t, reconstructed from the commit log
    // (TIMESTAMP AS OF would refuse here — it must serve the bytes)
    val writeAt = History.entriesOf(Meta.read(c.path.resolve("item"))).head.at
    assert(deltaAt(writeAt.toString).count() == 10)
    // pre-log instants with no manifest refuse typed
    val gone = intercept[GraftError](deltaAt("2000-01-01T00:00:00Z").count())
    assert(gone.getMessage.contains("no manifest snapshot predates"), gone.getMessage)
    val both = intercept[GraftError](spark.read.format("graft")
      .option("changesSinceTimestamp", t.toString).option("changesSince", "x")
      .load(c.path.resolve("item").toString).count())
    assert(both.getMessage.contains("mutually exclusive"), both.getMessage)
    cleanup(c)
  }

  test("changesSince serves exactly the new and rewritten periods of a monthly item") {
    val c = tempCollection("cdc_monthly")
    c.write("item", frame("2024-01-01", 90), monthlyLayout = true) // jan feb mar
    c.createSnapshot(Some("cut"), manifest = Some(true))
    // rewrite march in place (same-period append) + add april
    c.append("item", frame("2024-03-05", 3, tag = "x"),
      duplicateHandling = DuplicateHandling.KeepAll)
    c.append("item", frame("2024-04-01", 10, tag = "new"))
    val delta = changes(c, "item", "cut")
    val roots = scanRoots(delta)
    assert(roots.size == 2, s"expected mar+apr roots, got $roots")
    assert(roots.exists(_.endsWith("=2024-03")) && roots.exists(_.endsWith("=2024-04")))
    // march re-serves whole (30 original — 90 days from Jan 1 over leap
    // Feb end at Mar 30 — + 3 replayed), april is new
    assert(delta.count() == 30 + 3 + 10)
    assert(!delta.columns.contains(Collection.MonthCol))
    // pushed predicates prune the changed set further: april only
    val aprOnly = delta.filter(col("index") >= lit(java.sql.Timestamp.valueOf("2024-04-01 00:00:00")))
    assert(scanRoots(aprOnly).size == 1)
    assert(aprOnly.count() == 10)
    cleanup(c)
  }

  test("unchanged item yields an empty frame with the item's schema") {
    val c = tempCollection("cdc_unchanged")
    c.write("m", frame("2024-01-01", 40), monthlyLayout = true)
    c.write("f", frame("2024-01-01", 10))
    c.createSnapshot(Some("cut"), manifest = Some(true))
    for (item <- Seq("m", "f")) {
      val delta = changes(c, item, "cut")
      assert(delta.schema == c.item(item).data.schema, s"$item schema")
      assert(delta.count() == 0, s"$item should have no changes")
    }
    cleanup(c)
  }

  test("flat item rewrite serves the whole item; removed periods contribute nothing") {
    val c = tempCollection("cdc_flat")
    c.write("f", frame("2024-01-01", 10))
    c.write("m", frame("2024-01-01", 90), monthlyLayout = true)
    c.createSnapshot(Some("cut"), manifest = Some(true))
    c.append("f", frame("2024-02-01", 5, tag = "n")) // flat append = full rewrite
    assert(changes(c, "f", "cut").count() == 15)
    // expire january: a REMOVED period, nothing to serve, no error
    c.expireBefore("m", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(changes(c, "m", "cut").count() == 0)
    cleanup(c)
  }

  test("layout conversion since the cut serves the whole live item") {
    val c = tempCollection("cdc_convert")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    c.createSnapshot(Some("cut"), manifest = Some(true))
    c.convertLayout("item", None) // monthly -> flat: every row rewritten
    val delta = changes(c, "item", "cut")
    assert(delta.count() == 60)
    cleanup(c)
  }

  test("typed refusals: dir snapshot, missing snapshot, option conflict, writes") {
    val c = tempCollection("cdc_errors")
    c.write("item", frame("2024-01-01", 10))
    c.createSnapshot(Some("dircut"), manifest = Some(false))
    val e1 = intercept[GraftError](changes(c, "item", "dircut").count())
    assert(e1.getMessage.contains("MANIFEST"))
    intercept[SnapshotNotFoundError](changes(c, "item", "ghost").count())
    val e3 = intercept[GraftError] {
      spark.read.format("graft").option("changesSince", "dircut")
        .option("snapshot", "dircut").load(c.path.resolve("item").toString).count()
    }
    assert(e3.getMessage.contains("mutually exclusive"))
    c.createSnapshot(Some("mcut"), manifest = Some(true))
    c.append("item", frame("2024-02-01", 5))
    val e4 = intercept[Exception] {
      frame("2024-03-01", 2).write.format("graft").mode("append")
        .option("changesSince", "mcut").save(c.path.resolve("item").toString)
    }
    assert(e4.getMessage.contains("immutable"))
    cleanup(c)
  }

  test("changesSinceTimestamp stays EXACT past the sidecar cap (spill-merged reconstruction)") {
    val c = tempCollection("cdc_ts_spill")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    // 300 metadata-only commits push the write entry into the spill —
    // a sidecar-only reconstruction then loses jan/feb's stamps and
    // the delta degrades to re-serving the whole item
    for (i <- 1 to 300) c.setItemProperties("item", Map("k" -> s"v$i"))
    Thread.sleep(1100)
    val t = java.time.Instant.now()
    Thread.sleep(5)
    c.append("item", frame("2024-03-01", 5)) // march only
    val delta = spark.read.format("graft")
      .option("changesSinceTimestamp", t.toString)
      .load(c.path.resolve("item").toString)
    assert(delta.count() == 5, s"delta must be exactly March, got ${delta.count()}")
    cleanup(c)
  }
}
