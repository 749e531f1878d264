package graft

import org.apache.spark.sql.Row

import graft.store._

/** `CALL graft.system.<proc>(...)` — the SQL maintenance surface.
  * Every procedure delegates to the Collection method the Scala tests
  * already cover in depth; these tests pin the SQL plumbing: name/arg
  * binding (positional + named + defaults), result schemas, typed
  * failures, and that the effects land in the store. */
class GraftProcedureSpec extends SparkSpec {

  private def frame(startDay: String, days: Int) = {
    import spark.implicits._
    val start = java.time.LocalDate.parse(startDay)
    (0 until days).map { i =>
      (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), i.toDouble, s"r$i")
    }.toDF("index", "value", "tag")
  }

  private def registerCatalog(name: String, c: Collection): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", c.path.parent.toString)
  }

  private def periods(c: Collection, item: String): Seq[String] =
    c.path.resolve(item).resolve(Item.DataDir).listDirs
      .filter(_.startsWith(Collection.MonthCol + "="))
      .map(_.stripPrefix(Collection.MonthCol + "=")).sorted

  test("SHOW PROCEDURES lists the system namespace; DESCRIBE works") {
    val c = tempCollection("proc_show")
    registerCatalog("pcat0", c)
    val names = spark.sql("SHOW PROCEDURES IN pcat0.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    for (p <- Seq("create_snapshot", "expire_before", "compact", "vacuum",
                  "convert_layout", "zorder", "rebalance", "list_snapshots",
                  "delete_snapshot", "expire_snapshots", "list_changes",
                  "rollback_to", "analyze", "multiprocess", "break_item_locks"))
      assert(names.contains(p), s"missing procedure $p in $names")
    val desc = spark.sql("DESCRIBE PROCEDURE pcat0.system.expire_before")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("expire_before"))
    cleanup(c)
  }

  test("snapshot lifecycle through CALL: create (named arg), list, time travel, delete") {
    val c = tempCollection("proc_snap")
    c.write("item", frame("2024-01-01", 10))
    registerCatalog("pcat1", c)
    val created = spark.sql(
      "CALL pcat1.system.create_snapshot(collection => 'c', name => 'eod')")
    assert(created.columns.toSeq == Seq("snapshot"))
    assert(created.collect().toSeq == Seq(Row("eod")))
    // the cut is a real snapshot: append afterwards, time travel sees 10 rows
    c.append("item", frame("2024-01-11", 5))
    assert(spark.sql("SELECT count(*) c FROM pcat1.c.item").head.getLong(0) == 15)
    assert(spark.sql("SELECT count(*) c FROM pcat1.c.item VERSION AS OF 'eod'")
      .head.getLong(0) == 10)
    assert(spark.sql("CALL pcat1.system.list_snapshots('c')")
      .collect().map(_.getString(0)).toSeq == Seq("eod"))
    assert(spark.sql("CALL pcat1.system.delete_snapshot('c', 'eod')")
      .head.getBoolean(0))
    assert(spark.sql("CALL pcat1.system.list_snapshots('c')").count() == 0)
    cleanup(c)
  }

  test("expire_before drops whole periods by name and reports counts") {
    val c = tempCollection("proc_expire")
    c.write("item", frame("2024-01-01", 90), monthlyLayout = true)
    registerCatalog("pcat2", c)
    val res = spark.sql(
      "CALL pcat2.system.expire_before('c', 'item', TIMESTAMP '2024-02-15 00:00:00')")
    assert(res.columns.toSeq == Seq("removed_periods", "boundary_rows_deleted"))
    val r = res.head
    assert(r.getInt(0) == 1)  // january removed whole
    assert(r.getLong(1) == 14L) // feb 1..14 deleted from the boundary period
    assert(periods(c, "item") == Seq("2024-02", "2024-03"))
    assert(c.item("item").data.count() == 90 - 31 - 14)
    cleanup(c)
  }

  test("compact is threshold-gated; rebalance returns the new file count") {
    val c = tempCollection("proc_compact")
    c.write("item", frame("2024-01-01", 40), npartitions = Some(8)) // 8 files
    registerCatalog("pcat3", c)
    assert(!spark.sql("CALL pcat3.system.compact('c', 'item', max_files => 1000)")
      .head.getBoolean(0)) // under threshold: no-op
    assert(spark.sql("CALL pcat3.system.compact('c', 'item', 4)").head.getBoolean(0))
    val files = spark.sql("CALL pcat3.system.rebalance('c', 'item', 2)").head.getInt(0)
    assert(files == 2)
    assert(c.item("item").data.count() == 40)
    cleanup(c)
  }

  test("convert_layout roundtrips flat -> monthly -> flat with identical content") {
    val c = tempCollection("proc_convert")
    c.write("item", frame("2024-01-01", 60))
    registerCatalog("pcat4", c)
    val before = c.item("item").data.orderBy("index").collect().toSeq
    assert(spark.sql("CALL pcat4.system.convert_layout('c', 'item', layout => 'monthly')")
      .head.getString(0) == "monthly")
    assert(periods(c, "item") == Seq("2024-01", "2024-02"))
    assert(spark.sql("CALL pcat4.system.convert_layout('c', 'item')")
      .head.getString(0) == "flat") // layout defaults to 'flat'
    assert(periods(c, "item").isEmpty)
    assert(c.item("item").data.orderBy("index").collect().toSeq == before)
    cleanup(c)
  }

  test("zorder runs on flat items and surfaces the typed time-layout rejection") {
    val c = tempCollection("proc_zorder")
    val twoNumeric = frame("2024-01-01", 40)
      .withColumn("value2", org.apache.spark.sql.functions.col("value") * 2)
    c.write("flat", twoNumeric)
    c.write("monthly", frame("2024-01-01", 40), monthlyLayout = true)
    registerCatalog("pcat5", c)
    assert(spark.sql("CALL pcat5.system.zorder('c', 'flat', 'value, value2')")
      .head.getBoolean(0))
    assert(c.item("flat").data.count() == 40)
    val e = intercept[Exception](
      spark.sql("CALL pcat5.system.zorder('c', 'monthly', 'value')").collect())
    assert(e.getMessage.contains("time layout"))
    cleanup(c)
  }

  test("list_changes classifies the period delta vs a manifest snapshot") {
    val c = tempCollection("proc_changes")
    c.write("m", frame("2024-01-01", 90), monthlyLayout = true) // jan feb mar
    c.write("f", frame("2024-01-01", 10))
    registerCatalog("pcat7", c)
    spark.sql("CALL pcat7.system.create_snapshot('c', 'cut', true)")
    c.append("m", frame("2024-03-05", 2))             // rewrite 2024-03 in place
    c.append("m", frame("2024-04-01", 5))             // new period
    c.expireBefore("m", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")) // drop jan
    val delta = spark.sql("CALL pcat7.system.list_changes('c', 'm', 'cut')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(delta == Seq("2024-01" -> "removed", "2024-03" -> "rewritten",
      "2024-04" -> "added"))
    // untouched flat item: empty; after a rewrite: the whole-item key
    assert(spark.sql("CALL pcat7.system.list_changes('c', 'f', 'cut')").count() == 0)
    c.append("f", frame("2024-02-01", 3))
    assert(spark.sql("CALL pcat7.system.list_changes('c', 'f', 'cut')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq("__item" -> "rewritten"))
    cleanup(c)
  }

  test("analyze declares stats post-hoc and reads start pruning on them") {
    import org.apache.spark.sql.functions.col
    val c = tempCollection("proc_analyze")
    // born WITHOUT stats columns: value is period-correlated (i/1.0
    // grows daily), so post-analyze bounds can prune by month
    c.write("m", frame("2024-01-01", 90), monthlyLayout = true)
    registerCatalog("pcat9", c)
    def prunedReadRows(): Long =
      c.item("m", filters = Seq(graft.store.Filters.Pred("value", ">=", 75.0)))
        .data.count()
    assert(prunedReadRows() == 15) // correct either way (days 75..89)
    val n = spark.sql("CALL pcat9.system.analyze('c', 'm', 'value')").head.getInt(0)
    assert(n == 3, s"expected stats on 3 periods, got $n")
    // the stats landed in the sidecar and are SQL-visible
    val bounds = spark.sql(
      "SELECT period, min_value, max_value FROM pcat9.c.`m$stats` WHERE column = 'value'")
      .collect().map(r => r.getString(0) -> (r.getString(1).toDouble, r.getString(2).toDouble))
      .toMap
    assert(bounds.keySet == Set("2024-01", "2024-02", "2024-03"))
    assert(bounds("2024-01") == (0.0, 30.0) && bounds("2024-03") == (60.0, 89.0))
    assert(prunedReadRows() == 15) // same answer through the pruned path
    // appends keep the map fresh without re-analyzing
    c.append("m", frame("2024-04-01", 5))
    assert(spark.sql(
      "SELECT count(*) FROM pcat9.c.`m$stats` WHERE column = 'value'")
      .head.getLong(0) == 4)
    // '' clears the declaration and the map
    assert(spark.sql("CALL pcat9.system.analyze('c', 'm', '')").head.getInt(0) == 0)
    assert(spark.sql("SELECT count(*) FROM pcat9.c.`m$stats`").head.getLong(0) == 0)
    // typed: flat items have no periods to prune; unknown columns
    c.write("flat", frame("2024-01-01", 10))
    val e1 = intercept[Exception](
      spark.sql("CALL pcat9.system.analyze('c', 'flat', 'value')").collect())
    assert(e1.getMessage.contains("flat item"))
    val e2 = intercept[Exception](
      spark.sql("CALL pcat9.system.analyze('c', 'm', 'nope')").collect())
    assert(e2.getMessage.contains("not in item schema"))
    cleanup(c)
  }

  test("rollback_to restores the collection to a savepoint: multi-statement SQL undo") {
    val c = tempCollection("proc_rollback")
    c.write("m", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    c.write("f", frame("2024-01-01", 10))
    c.write("gone", frame("2024-01-01", 5))
    registerCatalog("pcat8", c)
    val before =
      c.item("m").data.orderBy("index").collect().toSeq ->
        c.item("f").data.orderBy("index").collect().toSeq
    spark.sql("CALL pcat8.system.create_snapshot('c', 'sp', true)")

    // a multi-statement SQL session mutates the collection every way
    // the engine allows: append (new period + rewrite), DML delete,
    // item birth, item death — then one CALL undoes the lot
    spark.sql("INSERT INTO pcat8.c.m SELECT * FROM pcat8.c.f") // rewrites jan
    c.append("m", frame("2024-03-01", 5))                      // adds a period
    spark.sql("DELETE FROM pcat8.c.f WHERE value >= 5")
    c.write("born", frame("2024-02-01", 3))
    c.deleteItem("gone")

    val actions = spark.sql("CALL pcat8.system.rollback_to('c', 'sp')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(actions == Seq("born" -> "removed", "f" -> "restored",
      "gone" -> "restored", "m" -> "restored"))
    assert(c.listItems() == Set("m", "f", "gone"))
    assert(c.item("m").data.orderBy("index").collect().toSeq == before._1)
    assert(c.item("f").data.orderBy("index").collect().toSeq == before._2)
    assert(c.item("gone").data.count() == 5)
    assert(periods(c, "m") == Seq("2024-01", "2024-02"))
    // savepoint kept by default → repeatable: mutate again, roll back again
    spark.sql("DELETE FROM pcat8.c.f WHERE value < 5")
    val second = spark.sql("CALL pcat8.system.rollback_to('c', 'sp')")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(second("f") == "restored")
    assert(second("m") == "unchanged") // untouched since the first restore
    assert(c.item("f").data.orderBy("index").collect().toSeq == before._2)
    // item-scoped restore: only the named item moves, the rest stay put
    spark.sql("DELETE FROM pcat8.c.f WHERE value < 5")
    c.append("m", frame("2024-03-01", 5))
    val scoped = spark.sql("CALL pcat8.system.rollback_to('c', 'sp', item => 'f')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(scoped == Seq("f" -> "restored"))
    assert(c.item("f").data.orderBy("index").collect().toSeq == before._2)
    assert(periods(c, "m") == Seq("2024-01", "2024-02", "2024-03")) // untouched
    // a partial restore cannot drop the savepoint; unknown names are typos
    val ep = intercept[Exception](spark.sql(
      "CALL pcat8.system.rollback_to('c', 'sp', keep_snapshot => false, item => 'f')")
      .collect())
    assert(ep.getMessage.contains("partial rollback"))
    val eu = intercept[Exception](spark.sql(
      "CALL pcat8.system.rollback_to('c', 'sp', item => 'nope')").collect())
    assert(eu.getMessage.contains("neither pinned"))
    spark.sql("CALL pcat8.system.rollback_to('c', 'sp')") // back to the cut
    // keep_snapshot => false drops the savepoint after restoring
    spark.sql("CALL pcat8.system.rollback_to('c', 'sp', keep_snapshot => false)")
    assert(!c.listSnapshots().contains("sp"))
    // typed error: dir snapshots are frozen reads, not savepoints
    c.createSnapshot(Some("dirsnap"), manifest = Some(false))
    val e = intercept[Exception](
      spark.sql("CALL pcat8.system.rollback_to('c', 'dirsnap')").collect())
    assert(e.getMessage.contains("manifest snapshot"))
    cleanup(c)
  }

  test("expire_snapshots drops aged manifests, GCs their retained generations") {
    val c = tempCollection("proc_expire_snaps")
    c.write("it", frame("2024-01-01", 10))
    registerCatalog("pexp", c)
    spark.sql("CALL pexp.system.create_snapshot('c', 'old', manifest => true)")
    // rewrite so 'old' pins a RETAINED generation (GC observable)
    c.write("it", frame("2024-01-01", 12), overwrite = true)
    Thread.sleep(1100) // manifest stamps are µs but keep a clear gap
    val cut = java.time.Instant.now()
    spark.sql("CALL pexp.system.create_snapshot('c', 'fresh', manifest => true)")
    c.createSnapshot(Some("adir"), manifest = Some(false)) // stampless dir
    val retained = c.path.resolve(store.GraftStore.SnapshotsDir).resolve(".retained")
    assert(retained.isDir, "the rewrite must have retained the pinned generation")
    // dry run reports, deletes nothing
    val dry = spark.sql("CALL pexp.system.expire_snapshots('c', " +
      s"timestamp'${java.sql.Timestamp.from(cut)}', dry_run => true)")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(dry == Map("old" -> "would_expire", "fresh" -> "kept",
      "adir" -> "kept_no_stamp"), dry)
    assert(c.listSnapshots().toSet == Set("old", "fresh", "adir"))
    // real run: 'old' dies, its retained generation is GC'd, rest stay
    val real = spark.sql("CALL pexp.system.expire_snapshots('c', " +
      s"timestamp'${java.sql.Timestamp.from(cut)}')")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(real == Map("old" -> "expired", "fresh" -> "kept",
      "adir" -> "kept_no_stamp"), real)
    assert(c.listSnapshots().toSet == Set("fresh", "adir"))
    assert(!retained.isDir || retained.listDirs.isEmpty,
      "the expired snapshot's retained generation must be GC'd")
    // the surviving snapshot still serves
    assert(spark.sql("SELECT count(*) AS n FROM pexp.c.it VERSION AS OF 'fresh'")
      .head().getLong(0) == 12)
    cleanup(c)
  }

  test("vacuum reclaims crash debris and reports it; typed errors for bad names") {
    val c = tempCollection("proc_vacuum")
    c.write("item", frame("2024-01-01", 5))
    c.path.resolve("__backup_zzz").mkdirs()
    registerCatalog("pcat6", c)
    val reclaimed = spark.sql("CALL pcat6.system.vacuum('c')")
      .collect().map(_.getString(0)).toSeq
    assert(reclaimed.contains("__backup_zzz"))
    assert(!c.path.resolve("__backup_zzz").isDir)
    // missing collection: typed, and nothing created as a side effect
    val e1 = intercept[Exception](spark.sql("CALL pcat6.system.vacuum('nope')").collect())
    assert(e1.getMessage.contains("does not exist"))
    assert(!c.path.parent.resolve("nope").isDir)
    // unknown procedure: typed with the available list (Spark wraps
    // loadProcedure failures in FAILED_TO_LOAD_ROUTINE — check the chain)
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e2 = intercept[Exception](spark.sql("CALL pcat6.system.frobnicate('c')").collect())
    assert(chain(e2).contains("unknown graft procedure"))
    // wrong namespace: typed pointer to system
    val e3 = intercept[Exception](spark.sql("CALL pcat6.other.vacuum('c')").collect())
    assert(chain(e3).contains("system"))
    cleanup(c)
  }

  test("multiprocess mode + stale-lock admin over CALL") {
    import org.apache.spark.sql.functions._
    val c = tempCollection("proc_mp")
    import spark.implicits._
    c.write("item", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    registerCatalog("pcatmp", c)
    assert(spark.sql("CALL pcatmp.system.multiprocess('c', true)")
      .head.getBoolean(0))
    // the marker is DURABLE — a fresh Collection (another process's
    // view) reads the mode on
    assert(Collection.at(spark, c.path).multiprocessEnabled)
    // a leaked lock (crashed writer): vacuum refuses, the admin CALL clears
    c.path.resolve(Collection.ItemLockPrefix + "item").mkdirs()
    val ev = intercept[Exception](
      spark.sql("CALL pcatmp.system.vacuum('c')").collect())
    assert(Iterator.iterate(ev: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ").contains("breakItemLocks"))
    val cleared = spark.sql("CALL pcatmp.system.break_item_locks('c')")
      .collect().map(_.getString(0)).toSeq
    assert(cleared == Seq(Collection.ItemLockPrefix + "item"), cleared.mkString(","))
    spark.sql("CALL pcatmp.system.vacuum('c')").collect() // no longer refuses
    assert(!spark.sql("CALL pcatmp.system.multiprocess('c', false)")
      .head.getBoolean(0))
    assert(!Collection.at(spark, c.path).multiprocessEnabled)
    cleanup(c)
  }

  test("pystore interop over CALL: export then import round-trips, snapshots included") {
    val c = tempCollection("proc_pystore")
    c.write("item", frame("2024-01-01", 10))
    c.createSnapshot(Some("cut"), manifest = Some(true))
    c.append("item", frame("2024-02-01", 5))
    registerCatalog("pio", c)
    val dest = java.nio.file.Files.createTempDirectory("proc_pystore_dest")
      .resolve("ds").toString
    val exported = spark.sql(
      s"CALL pio.system.export_pystore('$dest', snapshots => true)")
      .collect().map(_.getString(0)).toSet
    assert(exported == Set("c/item", "c/_snapshots/cut/item"), exported)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dest, "c", "item", "pystore_metadata.json")))
    // import the export into a SECOND catalog/store
    val back = tempCollection("proc_pystore_back")
    registerCatalog("pio2", back)
    val imported = spark.sql(
      s"CALL pio2.system.import_pystore('$dest', snapshots => true)")
      .collect().map(_.getString(0)).toSet
    assert(imported == exported, imported)
    assert(spark.sql("SELECT count(*) AS n FROM pio2.c.item").head.getLong(0) == 15)
    assert(spark.sql("SELECT count(*) AS n FROM pio2.c.item VERSION AS OF 'cut'")
      .head.getLong(0) == 10, "the migrated snapshot must serve over SQL time travel")
    FsOps.deleteRecursively(java.nio.file.Paths.get(dest).getParent)
    cleanup(c); cleanup(back)
  }
}
