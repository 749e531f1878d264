package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.store._

/** Store/collection/item lifecycle — mirrors reference tests
  * test_store.py, test_collection.py, test_write_read.py. */
class StoreSpec extends SparkSpec {

  test("write/read roundtrip preserves rows and schema") {
    val c = tempCollection("roundtrip")
    val df = sampleData
    c.write("item", df)
    val back = c.item("item").data
    assert(back.schema.fieldNames.sorted.sameElements(df.schema.fieldNames.sorted))
    assert(back.count() == 100)
    assert(back.orderBy("index").collect().map(_.getDouble(1)).toSeq ==
      df.orderBy("index").collect().map(_.getDouble(1)).toSeq)
    cleanup(c)
  }

  test("write without overwrite on existing item raises ItemExistsError") {
    val c = tempCollection("exists")
    c.write("item", sampleData)
    intercept[ItemExistsError] { c.write("item", sampleData) }
    c.write("item", sampleData.limit(10), overwrite = true)
    assert(c.item("item").data.count() == 10)
    cleanup(c)
  }

  test("filters and column projection are applied; index survives projection") {
    val c = tempCollection("proj")
    c.write("item", sampleData)
    val it = c.item("item",
      filters = Seq(Filters.Pred("category", "==", "A")),
      columns = Seq("value1"))
    assert(it.data.columns.toSet == Set("index", "value1"))
    val n = it.data.count()
    assert(n > 0 && n < 100)
    cleanup(c)
  }

  test("filter pushdown reaches the parquet scan") {
    val c = tempCollection("pushdown")
    c.write("item", sampleData)
    val it = c.item("item", filters = Seq(Filters.Pred("value1", ">", 0.0)))
    val plan = it.data.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("value1"),
      s"expected pushed filter in plan:\n$plan")
    cleanup(c)
  }

  test("head/tail/index/lastIndex") {
    val c = tempCollection("headtail")
    c.write("item", sampleData)
    val it = c.item("item")
    assert(it.head(5).count() == 5)
    val tailIdx = it.tail(3).collect().map(_.getTimestamp(0)).toSeq
    assert(tailIdx.last.toString.startsWith("2024-04-09"))
    assert(it.index.columns.toSeq == Seq("index"))
    assert(it.lastIndex.get.toString.startsWith("2024-04-09"))
    cleanup(c)
  }

  test("listItems with metadata equality AND-match, excluding _updated") {
    val c = tempCollection("meta")
    c.write("a", sampleData, metadata = Map("source" -> "api", "type" -> "raw"))
    c.write("b", sampleData, metadata = Map("source" -> "file", "type" -> "raw"))
    assert(c.listItems(Map("source" -> "api")) == Set("a"))
    assert(c.listItems(Map("type" -> "raw")) == Set("a", "b"))
    assert(c.listItems(Map("source" -> "api", "type" -> "raw")) == Set("a"))
    assert(c.listItems(Map("source" -> "nope")).isEmpty)
    cleanup(c)
  }

  test("delete item / recreate after delete") {
    val c = tempCollection("delete")
    c.write("item", sampleData)
    assert(c.deleteItem("item"))
    assert(!c.hasItem("item"))
    c.write("item", sampleData.limit(7))   // recreate (test_edge_cases.py:152-167)
    assert(c.item("item").data.count() == 7)
    cleanup(c)
  }

  test("metadata TTL cache serves cached value and clears on mutation") {
    val c = tempCollection("ttl")
    c.write("item", sampleData, metadata = Map("v" -> 1))
    val m1 = c.metadata("item")
    assert(Meta.unjv(m1("v")) == 1L)
    c.write("item", sampleData, metadata = Map("v" -> 2), overwrite = true)
    assert(Meta.unjv(c.metadata("item")("v")) == 2L) // commit invalidates
    cleanup(c)
  }

  test("epochdate stores temporal index as int64 nanos") {
    val c = tempCollection("epoch")
    c.write("item", sampleData, epochdate = true)
    val schema = c.item("item").data.schema
    assert(schema("index").dataType.typeName == "long")
    cleanup(c)
  }

  test("MultiIndex: several index columns round-trip with metadata") {
    import spark.implicits._
    val c = tempCollection("multi")
    val df = Seq(("A", 1, 1.0), ("A", 2, 2.0), ("B", 1, 3.0))
      .toDF("category", "seq", "value")
    c.write("item", df, indexCols = Seq("category", "seq"))
    val it = c.item("item")
    assert(it.indexCols == Seq("category", "seq"))
    assert(it.data.count() == 3)
    cleanup(c)
  }

  test("store listing / collection listing / deletion") {
    val root = java.nio.file.Files.createTempDirectory("graft_stores")
    val store = GraftStore(spark, "s1", root)
    store.collection("c1"); store.collection("c2")
    assert(GraftStore.listStores(root) == Seq("s1"))
    assert(store.listCollections().toSet == Set("c1", "c2"))
    store.deleteCollection("c2")
    assert(store.listCollections() == Seq("c1"))
    GraftStore.deleteStores(root)
    assert(GraftStore.listStores(root).isEmpty)
  }

  test("batch write + batch read with failure -> None") {
    val c = tempCollection("batch")
    c.writeBatch(Seq("x" -> sampleData.limit(5), "y" -> sampleData.limit(6)))
    val out = c.readBatch(Seq("x", "y", "missing"))
    assert(out("x").get.count() == 5)
    assert(out("y").get.count() == 6)
    assert(out("missing").isEmpty)
    cleanup(c)
  }

  test("csv source roundtrip with index rename") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    sampleData.withColumnRenamed("index", "ts")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/data")
    val back = Sources.readCsv(spark, s"$dir/data", indexCol = Some("ts"))
    assert(back.columns.contains("index"))
    assert(back.count() == 100)
    FsOps.deleteRecursively(dir)
  }

  test("jsonl sink/source roundtrip: shard count, deterministic membership, schema DDL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val docs = (0 until 50).map(i => (i.toLong, s"text $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    Sources.writeJsonl(docs, s"$dir/out", nShards = 4, shardBy = Some("doc_id"))
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .count(_.getFileName.toString.startsWith("part-"))
    assert(parts == 4)
    // schema-DDL read skips inference and restores types
    val back = Sources.readJsonl(spark, s"$dir/out",
      Some("doc_id BIGINT, text STRING, source STRING"))
    assert(back.count() == 50)
    assert(back.schema("doc_id").dataType.typeName == "long")
    assert(back.select($"doc_id").as[Long].collect().toSet == (0L until 50L).toSet)
    // deterministic membership: same shardBy -> identical per-file id sets
    Sources.writeJsonl(docs, s"$dir/out2", nShards = 4, shardBy = Some("doc_id"))
    import org.apache.spark.sql.functions.{collect_list, input_file_name}
    val s1 = spark.read.json(s"$dir/out").withColumn("f", input_file_name())
      .groupBy("f").agg(collect_list("doc_id").as("ids")).collect()
      .map(_.getSeq[Long](1).toSet).toSet
    val s2 = spark.read.json(s"$dir/out2").withColumn("f", input_file_name())
      .groupBy("f").agg(collect_list("doc_id").as("ids")).collect()
      .map(_.getSeq[Long](1).toSet).toSet
    assert(s1 == s2)
    FsOps.deleteRecursively(dir)
  }

  test("chunked read yields bounded batches") {
    val chunks = Sources.readInChunks(sampleData, 30).toSeq
    assert(chunks.map(_.size).sum == 100)
    assert(chunks.forall(_.size <= 30))
  }

  test("importPystore migrates a reference-layout store verbatim") {
    import spark.implicits._
    // synthesize the Python reference's on-disk layout: flat parquet
    // part-files inside the item dir + pystore_metadata.json
    val srcRoot = Files.createTempDirectory("pystore_src")
    val itemDir = srcRoot.resolve("prices").resolve("AAPL")
    Files.createDirectories(itemDir)
    val df = (0 until 40).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"), i * 1.5)
    }.toDF("index", "close")
    df.coalesce(1).write.mode("overwrite").parquet(itemDir.toString)
    // drop Spark's _SUCCESS etc. is fine; add the reference sidecar
    Files.writeString(itemDir.resolve("pystore_metadata.json"),
      """{"source": "broker-x", "_updated": "2020-01-01 00:00:00.000000"}""")

    val c = tempCollection("import")
    val store = new GraftStore(spark, c.path.parent)
    val imported = store.importPystore(srcRoot)
    assert(imported == Seq("prices/AAPL"))
    val item = store.collection("prices").item("AAPL")
    assert(item.data.count() == 40)
    assert(Meta.unjv(item.metadata("source")) == "broker-x")
    // _updated re-stamped by the graft write, not copied
    assert(Meta.unjv(item.metadata("_updated")) != "2020-01-01 00:00:00.000000")
    FsOps.deleteRecursively(srcRoot)
    cleanup(c)
  }

  test("exportPystore writes the reference layout; importing it back is content-identical") {
    import spark.implicits._
    // the interop's missing half: importPystore brings a reference
    // store IN, exportPystoreItem hands data BACK in the exact shape
    // stock pystore 1.0.1 reads — flat part.N.parquet files (dask's
    // to_parquet naming) + pystore_metadata.json (utils.py:99-107)
    val c = tempCollection("export")
    val store = new GraftStore(spark, c.path.parent)
    val coll = c.name
    val df = (0 until 60).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"), i * 1.5)
    }.toDF("index", "close")
    c.write("AAPL", df, indexCols = Seq("index"),
      metadata = Map("source" -> "broker-x", "quality" -> "gold"))
    val dest = Files.createTempDirectory("pystore_dest").resolve("datastore")
    val exported = store.exportPystore(dest)
    assert(exported == Seq(s"$coll/AAPL"))
    // the reference's on-disk shape, and NOTHING else (no engine
    // sidecars, no staging residue pystore would trip over)
    val itemDir = dest.resolve(coll).resolve("AAPL")
    val files = FsOps.listFiles(itemDir)
    assert(files.contains("pystore_metadata.json"), files.mkString(","))
    val parts = files.filter(_ != "pystore_metadata.json")
    assert(parts.nonEmpty && parts.forall(_.matches("""part\.\d+\.parquet""")),
      files.mkString(","))
    assert(FsOps.listDirs(itemDir).isEmpty, "no subdirs in a reference item dir")
    assert(!FsOps.listDirs(itemDir.getParent).exists(_.startsWith("__export_tmp")))
    val json = Files.readString(itemDir.resolve("pystore_metadata.json"))
    assert(json.contains(""""source":"broker-x"""") && json.contains("gold"), json)
    // _updated restamped in the reference's own UTC format — pystore's
    // read_metadata must parse it, and no internal `_` key leaks
    assert(json.contains("\"_updated\":\"2"), json)
    assert("\"_updated\":\"\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{6}\"".r
      .findFirstIn(json).isDefined, json)
    assert(!json.contains("_generation") && !json.contains("_index_names"), json)
    // roundtrip: import the export into a SECOND store — content identity
    val store2 = new GraftStore(spark,
      SPath.local(Files.createTempDirectory("pystore_back")))
    assert(store2.importPystore(dest) == Seq(s"$coll/AAPL"))
    val back = store2.collection(coll).item("AAPL")
    assert(back.data.select($"index", $"close").collect().toSet
      == df.collect().toSet, "exported+reimported content must be identical")
    assert(Meta.unjv(back.metadata("source")) == "broker-x")
    assert(Meta.unjv(back.metadata("quality")) == "gold")
    // a non-empty destination refuses without overwrite, replaces with
    val e = intercept[ValidationError](
      c.exportPystoreItem("AAPL", itemDir, overwrite = false))
    assert(e.getMessage.contains("overwrite"), e.getMessage)
    assert(c.exportPystoreItem("AAPL", itemDir, overwrite = true) > 0)
    FsOps.deleteRecursively(dest.getParent)
    cleanup(c)
  }

  test("exportPystore snapshots=true writes frozen cuts in the reference's _snapshots shape") {
    import spark.implicits._
    val c = tempCollection("export_snap")
    val store = new GraftStore(spark, c.path.parent)
    val coll = c.name
    // minute-granular unique indices: the post-cut append must ADD
    // rows, not KeepLast-replace same-index ones
    def rows(from: Int, until: Int) = (from until until).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        i * 1.0)
    }.toDF("index", "value")
    c.write("AAPL", rows(0, 30), indexCols = Seq("index"),
      metadata = Map("stage" -> "pre-cut"))
    // one manifest snapshot and one dir snapshot — snapshotItems and
    // the pinned export must serve both kinds
    c.createSnapshot(Some("cutm"), manifest = Some(true))
    c.createSnapshot(Some("cutd"))
    c.append("AAPL", rows(30, 50))
    c.setItemProperties("AAPL", Map("stage" -> "post-cut"))
    assert(c.snapshotItems("cutm") == Seq("AAPL"))
    assert(c.snapshotItems("cutd") == Seq("AAPL"))
    intercept[SnapshotNotFoundError](c.snapshotItems("nope"))
    val dest = Files.createTempDirectory("pystore_snapdest").resolve("ds")
    val exported = store.exportPystore(dest, snapshots = true)
    assert(exported.toSet == Set(s"$coll/AAPL",
      s"$coll/_snapshots/cutd/AAPL", s"$coll/_snapshots/cutm/AAPL"), exported)
    // the live export carries the post-append rows; each snapshot
    // export carries the 30 rows and the metadata FROZEN at its cut
    assert(spark.read.parquet(
      dest.resolve(coll).resolve("AAPL").resolve("*.parquet").toString)
      .count() == 50)
    for (s <- Seq("cutm", "cutd")) {
      val snapDir = dest.resolve(coll).resolve("_snapshots").resolve(s).resolve("AAPL")
      val files = FsOps.listFiles(snapDir)
      assert(files.contains("pystore_metadata.json") &&
        files.exists(_.matches("""part\.\d+\.parquet""")), s"$s: $files")
      assert(spark.read.parquet(snapDir.resolve("*.parquet").toString)
        .count() == 30, s)
      val json = Files.readString(snapDir.resolve("pystore_metadata.json"))
      assert(json.contains(""""stage":"pre-cut""""), s"$s: $json")
    }
    assert(Files.readString(dest.resolve(coll).resolve("AAPL")
      .resolve("pystore_metadata.json")).contains(""""stage":"post-cut""""))
    // full-history roundtrip: importing the export with snapshots=true
    // restores each cut as a graft directory snapshot — pinned rows and
    // frozen metadata served by the normal snapshot read path
    val store3 = new GraftStore(spark,
      SPath.local(Files.createTempDirectory("pystore_snapback")))
    val imported = store3.importPystore(dest, indexCols = Seq("index"),
      snapshots = true)
    assert(imported.toSet == exported.toSet, imported)
    val c3 = store3.collection(coll)
    assert(c3.item("AAPL").data.count() == 50)
    assert(c3.listSnapshots().toSet == Set("cutd", "cutm"))
    for (s <- Seq("cutm", "cutd")) {
      val snapIt = c3.item("AAPL", snapshot = Some(s))
      assert(snapIt.data.count() == 30, s)
      assert(Meta.unjv(snapIt.metadata("stage")) == "pre-cut", s)
    }
    // a second import of an existing snapshot refuses without overwrite
    val e2 = intercept[ValidationError](c3.importPystoreSnapshot(
      dest.resolve(coll).resolve("_snapshots").resolve("cutm"), "cutm",
      indexCols = Seq("index")))
    assert(e2.getMessage.contains("overwrite"), e2.getMessage)
    assert(c3.importPystoreSnapshot(
      dest.resolve(coll).resolve("_snapshots").resolve("cutm"), "cutm",
      indexCols = Seq("index"), overwrite = true) == Seq("AAPL"))
    assert(c3.item("AAPL", snapshot = Some("cutm")).data.count() == 30)
    // no hidden import temps or staging left anywhere
    assert(!c3.path.listDirs.exists(_.startsWith("__import_tmp_")))
    assert(!c3.path.resolve(GraftStore.SnapshotsDir).listDirs
      .exists(_.startsWith(".tmp_")))
    FsOps.deleteRecursively(dest.getParent)
    cleanup(c)
  }

  test("export racing a live writer serves one committed generation, never a torn mix") {
    // the export's read is conflict-retried and generation-checked: a
    // commit swapping the data dir mid-scan (torn read) or landing
    // between the sidecar read and the scan re-runs the attempt, so
    // every export the race produces must be a committed PREFIX of the
    // append sequence — row counts only ever land on batch boundaries
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import spark.implicits._
    val c = tempCollection("export_race")
    def batch(k: Int) = (0 until 100)
      .map(i => (k * 100 + i, k.toDouble)).toDF("index", "value")
    c.write("it", batch(0), indexCols = Seq("index"))
    val pool = Executors.newFixedThreadPool(1)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writer = Collection.at(spark, c.path)
    val fw = Future { for (k <- 1 to 5) writer.append("it", batch(k)) }
    val dest = Files.createTempDirectory("pystore_race")
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (!fw.isCompleted) {
      c.exportPystoreItem("it", dest.resolve("it"), overwrite = true)
      counts += spark.read.parquet(dest.resolve("it").resolve("*.parquet").toString)
        .count()
    }
    Await.result(fw, 300.seconds)
    pool.shutdown()
    c.exportPystoreItem("it", dest.resolve("it"), overwrite = true)
    counts += spark.read.parquet(dest.resolve("it").resolve("*.parquet").toString)
      .count()
    val boundaries = (1 to 6).map(_ * 100L).toSet
    assert(counts.forall(boundaries.contains),
      s"every export must land on a committed batch boundary: $counts")
    assert(counts.last == 600L, "the post-race export must serve the final state")
    assert(counts.nonEmpty && counts.toSet.size >= 1)
    FsOps.deleteRecursively(dest)
    cleanup(c)
  }

  test("export retries through the atomicSwap window instead of failing typed") {
    // atomicSwap has a window between its two renames where the data
    // dir does not exist; an export planning its scan there sees
    // PATH_NOT_FOUND, which Item types as the torn-item repair
    // pointer. For this healthy race the retry classifier must treat
    // it as a torn read and re-attempt — the repair pointer is for
    // CRASHED items (whose generation never moves, so the attempt cap
    // still surfaces it). Deterministic: the writer is parked INSIDE
    // the window on a latch while the export runs.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import spark.implicits._
    val c = tempCollection("export_midswap")
    def batch(k: Int) = (0 until 50)
      .map(i => (k * 50 + i, k.toDouble)).toDF("index", "value")
    c.write("it", batch(0), indexCols = Seq("index"))
    val inWindow = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    StoreFs.swapSeamHook = t =>
      if (t.contains("export_midswap")) {
        inWindow.countDown()
        release.await(30, TimeUnit.SECONDS); ()
      }
    val pool = Executors.newFixedThreadPool(1)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writer = Collection.at(spark, c.path)
    val retriesBefore = Collection.conflictRetries.get()
    try {
      val fw = Future { writer.append("it", batch(1)) }
      assert(inWindow.await(60, TimeUnit.SECONDS), "writer never reached the window")
      // the data dir is ABSENT right now; un-park the writer shortly so
      // the export's retry loop (quadratic backoff) finds the new state
      new Thread(() => { Thread.sleep(1500); release.countDown() }).start()
      val dest = Files.createTempDirectory("pystore_midswap")
      c.exportPystoreItem("it", dest.resolve("it")) // must NOT throw
      Await.result(fw, 60.seconds)
      assert(spark.read.parquet(dest.resolve("it").resolve("*.parquet").toString)
        .count() == 100, "the export must serve the post-swap committed state")
      assert(Collection.conflictRetries.get() > retriesBefore,
        "the export must have gone through the retry loop, not timing luck")
      FsOps.deleteRecursively(dest)
    } finally {
      release.countDown()
      StoreFs.swapSeamHook = _ => ()
      pool.shutdown()
    }
    cleanup(c)
  }

  test("snapshot export refuses a commit racing its scan and re-serves the frozen cut") {
    // a manifest pin whose generation is still LIVE resolves to the
    // live data dir; a commit landing between the pin resolution and
    // the scan swaps that dir silently (no torn read — the new files
    // are right there), so without the generation fence the export
    // would write POST-cut rows under the frozen pre-cut sidecar. The
    // fence refuses the attempt; the retry re-resolves the pin, which
    // now points at the retained pre-commit generation.
    import spark.implicits._
    val c = tempCollection("export_snap_race")
    def batch(k: Int) = (0 until 30)
      .map(i => (k * 30 + i, k.toDouble)).toDF("index", "value")
    c.write("it", batch(0), indexCols = Seq("index"))
    c.createSnapshot(Some("cut"), manifest = Some(true))
    val other = Collection.at(spark, c.path)
    @volatile var injected = false
    Collection.commitSeamHook = name =>
      if (name == "export_scan:it" && !injected) {
        injected = true
        other.append("it", batch(1)) // lands between resolution and scan
      }
    val dest = Files.createTempDirectory("pystore_snaprace")
    try c.exportPystoreItem("it", dest.resolve("it"), snapshot = Some("cut"))
    finally Collection.commitSeamHook = _ => ()
    assert(injected, "the racing commit must have fired")
    assert(spark.read.parquet(dest.resolve("it").resolve("*.parquet").toString)
      .count() == 30, "the export must serve the frozen cut, not post-cut rows")
    assert(c.item("it").data.count() == 60, "the racing commit itself survives")
    FsOps.deleteRecursively(dest)
    cleanup(c)
  }

  test("snapshot import overwrite replaces a native manifest snapshot completely") {
    // replacing a MANIFEST snapshot must drop its stale manifest too:
    // leaving it would keep phantom items in the replaced snapshot's
    // listing and leak every retained generation only it pinned. And
    // an empty/typo'd source must refuse BEFORE anything destructive.
    import spark.implicits._
    val c = tempCollection("import_snap_replace")
    def one(tag: Int) = Seq((tag, tag.toDouble)).toDF("index", "value")
    c.write("a", one(1), indexCols = Seq("index"))
    c.write("b", one(2), indexCols = Seq("index"))
    c.createSnapshot(Some("cut"), manifest = Some(true))
    assert(c.snapshotItems("cut").toSet == Set("a", "b"))
    // a reference snapshot containing ONLY item a
    val src = Files.createTempDirectory("pystore_replace_src")
    c.exportPystoreItem("a", src.resolve("a"), snapshot = Some("cut"))
    // empty source refuses typed, and the real snapshot is untouched
    val empty = Files.createTempDirectory("pystore_replace_empty")
    val e = intercept[ValidationError](
      c.importPystoreSnapshot(empty, "cut", overwrite = true))
    assert(e.getMessage.contains("no item directories"), e.getMessage)
    assert(c.snapshotItems("cut").toSet == Set("a", "b"),
      "a refused import must not touch the existing snapshot")
    // the real replace: manifest dropped, phantom item gone
    assert(c.importPystoreSnapshot(src, "cut",
      indexCols = Seq("index"), overwrite = true) == Seq("a"))
    assert(c.snapshotItems("cut") == Seq("a"),
      "the stale manifest must not keep phantom items in the listing")
    assert(c.item("a", snapshot = Some("cut")).data.count() == 1)
    intercept[GraftError](c.item("b", snapshot = Some("cut")).data.count())
    FsOps.deleteRecursively(src); FsOps.deleteRecursively(empty)
    cleanup(c)
  }

  test("vacuum restores a replaced snapshot stranded in its crash aside") {
    // a snapshot-import overwrite killed between its two publish
    // renames leaves .tmp_old_<snap>_<tag> as the ONLY copy of the
    // replaced cut — vacuum must rename it back, not sweep it; with
    // the snapshot present (publish completed) the aside is debris
    import spark.implicits._
    val c = tempCollection("vac_aside")
    c.write("it", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    c.createSnapshot(Some("cut")) // dir snapshot
    val snaps = c.path.resolve(GraftStore.SnapshotsDir)
    // simulate the crash window: dst renamed aside, publish never landed
    c.path.fs.rename(snaps.resolve("cut").raw,
      snaps.resolve(".tmp_old_cut_abcd1234").raw)
    intercept[GraftError](c.item("it", snapshot = Some("cut")))
    val out = c.vacuum()
    assert(out.contains("restored_snapshot:cut"), out.mkString(","))
    assert(c.item("it", snapshot = Some("cut")).data.count() == 1,
      "the restored snapshot must serve")
    // post-publish debris: snapshot present -> the aside is swept
    snaps.resolve(".tmp_old_cut_deadbeef").mkdirs()
    val out2 = c.vacuum()
    assert(out2.contains("dead_staging:.tmp_old_cut_deadbeef"), out2.mkString(","))
    assert(c.item("it", snapshot = Some("cut")).data.count() == 1)
    cleanup(c)
  }

  test("exporting an immutable snapshot never fences against live commits") {
    // a dir snapshot is a physical copy: commits to the same-named
    // live item are irrelevant, and fencing on the live generation
    // would refuse every attempt under a sustained writer until the
    // retry budget failed the export of perfectly immutable bytes
    import spark.implicits._
    val c = tempCollection("export_immutable")
    def batch(k: Int) = (0 until 20)
      .map(i => (k * 20 + i, k.toDouble)).toDF("index", "value")
    c.write("it", batch(0), indexCols = Seq("index"))
    c.createSnapshot(Some("cut")) // dir snapshot — fully immutable
    @volatile var injected = false
    val other = Collection.at(spark, c.path)
    Collection.commitSeamHook = name =>
      if (name == "export_scan:it" && !injected) {
        injected = true
        other.append("it", batch(1)) // live commit mid-export
      }
    val retriesBefore = Collection.conflictRetries.get()
    val dest = Files.createTempDirectory("pystore_immut")
    try c.exportPystoreItem("it", dest.resolve("it"), snapshot = Some("cut"))
    finally Collection.commitSeamHook = _ => ()
    assert(injected)
    assert(Collection.conflictRetries.get() == retriesBefore,
      "an immutable-source export must not consume fence retries")
    assert(spark.read.parquet(dest.resolve("it").resolve("*.parquet").toString)
      .count() == 20, "the export serves the pinned cut")
    FsOps.deleteRecursively(dest)
    cleanup(c)
  }

  test("whole-store import tolerates a legitimately empty reference snapshot") {
    // stock pystore snapshots an empty collection as an empty copytree;
    // a whole-store migration must carry it, not abort midway
    import spark.implicits._
    val c = tempCollection("import_empty_snap")
    val src = Files.createTempDirectory("pystore_empty_src").resolve("ds")
    val itemDir = src.resolve("c2").resolve("item")
    Files.createDirectories(itemDir)
    Seq((1, 1.0)).toDF("index", "value").coalesce(1)
      .write.mode("overwrite").parquet(itemDir.toString)
    Files.writeString(itemDir.resolve("pystore_metadata.json"), "{}")
    Files.createDirectories(src.resolve("c2").resolve("_snapshots").resolve("empty"))
    val store = new GraftStore(spark, c.path.parent)
    val imported = store.importPystore(src, snapshots = true)
    assert(imported == Seq("c2/item"), imported)
    assert(store.collection("c2").listSnapshots() == Seq("empty"),
      "the empty snapshot must exist after migration")
    assert(store.collection("c2").snapshotItems("empty").isEmpty)
    FsOps.deleteRecursively(src.getParent)
    cleanup(c)
  }

  test("item.profile reports per-column stats over the pruned scan") {
    val c = tempCollection("profile")
    c.write("item", sampleData)
    val r = c.item("item").profile(Seq("value1", "value2"))
      .orderBy("column").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("value1", "value2"))
    assert(r.forall(_.getAs[Long]("n") == 100L))
    assert(r.forall(_.getAs[Long]("n_null") == 0L))
    val v1 = r(0)
    assert(v1.getAs[Double]("min") <= v1.getAs[Double]("p50"))
    assert(v1.getAs[Double]("p50") <= v1.getAs[Double]("p95"))
    assert(v1.getAs[Double]("p95") <= v1.getAs[Double]("max"))
    cleanup(c)
  }

  test("describeItems lists layouts/files/stats; compaction policy triggers on fragmentation") {
    import spark.implicits._
    val c = tempCollection("describe")
    val ts = (0 until 40).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"), i.toDouble))
      .toDF("index", "value")
    c.write("flat", ts, indexCols = Seq("index"))
    c.write("laid", ts, indexCols = Seq("index"), monthlyLayout = true)
    val d = c.describeItems().collect().map(r => r.getString(0) -> r).toMap
    assert(d("flat").getAs[String]("layout") == "flat" && d("flat").getAs[Int]("n_periods") == 0)
    assert(d("laid").getAs[String]("layout") == "monthly" && d("laid").getAs[Int]("n_periods") == 1)
    assert(d("flat").getAs[Long]("rows_estimate") == 40L)
    assert(d("flat").getAs[Int]("n_files") >= 1)
    // fragment deliberately, then let the policy decide
    c.rebalance("flat", npartitions = Some(4))
    val frag = c.describeItems().collect().find(_.getString(0) == "flat").get.getAs[Int]("n_files")
    assert(frag >= 4)
    assert(!c.compactIfFragmented("flat", maxFiles = 10))      // under threshold: no-op
    assert(c.compactIfFragmented("flat", maxFiles = 2, Some(1))) // over: re-lays
    val after = c.describeItems().collect().find(_.getString(0) == "flat").get.getAs[Int]("n_files")
    assert(after < frag)
    assert(c.item("flat").data.count() == 40L)
    cleanup(c)
  }
}
