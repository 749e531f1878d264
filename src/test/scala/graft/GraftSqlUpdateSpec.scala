package graft

import org.apache.spark.sql.functions._

import graft.store._

/** SQL row-level operations (group-based copy-on-write with periods as
  * the group): UPDATE, MERGE INTO, and non-translatable DELETE through
  * `GraftRowLevelOperation`. The scale claims under test: only the
  * periods the predicate can touch are rewritten (untouched period
  * dirs keep their exact file sets), rows moved across periods merge
  * into their destination, and flat items fall back to a whole-item
  * swap. */
class GraftSqlUpdateSpec extends SparkSpec {

  private def frame(startDay: String, days: Int, tagPrefix: String = "r") = {
    import spark.implicits._
    val start = java.time.LocalDate.parse(startDay)
    (0 until days).map { i =>
      (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), i.toDouble, s"$tagPrefix$i")
    }.toDF("index", "value", "tag")
  }

  private def registerCatalog(name: String, c: Collection): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", c.path.parent.toString)
  }

  private def periodFiles(c: Collection, item: String, period: String): Set[String] = {
    val dir = c.path.resolve(item).resolve(Item.DataDir)
      .resolve(s"${Collection.MonthCol}=$period")
    if (!dir.isDir) Set.empty
    else c.path.fs.listFiles(dir.raw).filterNot(_.startsWith("_")).toSet
  }

  test("UPDATE rewrites only the periods the predicate touches") {
    val c = tempCollection("sql_upd")
    c.write("item", frame("2024-01-01", 90), monthlyLayout = true)
    registerCatalog("ucat1", c)
    val janBefore = periodFiles(c, "item", "2024-01")
    val febBefore = periodFiles(c, "item", "2024-02")
    assert(janBefore.nonEmpty && febBefore.nonEmpty)
    spark.sql("UPDATE ucat1.c.item SET value = value + 1000.0 " +
      "WHERE index >= TIMESTAMP '2024-03-01 00:00:00'")
    val got = c.item("item").data.orderBy("index").collect()
    assert(got.length == 90)
    assert(got.count(_.getDouble(1) >= 1000.0) == 30) // march days only (jan 31 + feb 29 + mar 30 = 90)
    assert(got.take(60).forall(_.getDouble(1) < 1000.0))
    // untouched periods kept their EXACT file sets — the COW scan and
    // write never visited january or february
    assert(periodFiles(c, "item", "2024-01") == janBefore,
      "january must not be rewritten by a march-only UPDATE")
    assert(periodFiles(c, "item", "2024-02") == febBefore)
    assert(periodFiles(c, "item", "2024-03") != Set.empty)
    cleanup(c)
  }

  test("MERGE INTO runtime-narrows the replaced groups to the source's periods") {
    val c = tempCollection("sql_merge_rgf")
    c.write("item", frame("2024-01-01", 90), monthlyLayout = true)
    registerCatalog("ucatrgf", c)
    val janBefore = periodFiles(c, "item", "2024-01")
    val marBefore = periodFiles(c, "item", "2024-03")
    // MERGE's join condition is never statically translatable → before
    // runtime group filtering this was a FULL-ITEM copy-on-write. The
    // matching-rows subquery narrows the replaced groups to february
    // (the matched rows) at execution; the may insert lands through the
    // merge-in arm without may ever being scanned.
    spark.range(0, 4).select(
      expr("CASE WHEN id < 3 THEN timestamp'2024-02-10 00:00:00' + " +
        "make_interval(0,0,0,CAST(id AS INT),0,0,0) " +
        "ELSE timestamp'2024-05-05 00:00:00' END").as("ts"),
      (col("id") + 5000.0).as("newval"))
      .createOrReplaceTempView("merge_rgf_src")
    spark.sql("""MERGE INTO ucatrgf.c.item t USING merge_rgf_src s
      |ON t.index = s.ts
      |WHEN MATCHED THEN UPDATE SET t.value = s.newval
      |WHEN NOT MATCHED THEN INSERT (index, value, tag) VALUES (s.ts, s.newval, 'ins')""".stripMargin)
    val got = c.item("item").data
    assert(got.count() == 91) // 90 + the may insert
    assert(got.filter(col("value") >= 5000.0).count() == 4)
    assert(got.filter(col("tag") === "ins").count() == 1)
    assert(periodFiles(c, "item", "2024-01") == janBefore,
      "MERGE matching february only must not rewrite january (runtime group filter)")
    assert(periodFiles(c, "item", "2024-03") == marBefore,
      "MERGE matching february only must not rewrite march")
    assert(periodFiles(c, "item", "2024-05").nonEmpty, "the insert's period must exist")
    cleanup(c)
  }

  test("UPDATE that moves rows across periods merges them into the destination") {
    val c = tempCollection("sql_upd_move")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    registerCatalog("ucat2", c)
    // move the first 5 january days forward one (leap) year: they
    // leave 2024-01 (scanned) and land in 2025-01 (unscanned,
    // nonexistent)
    spark.sql("UPDATE ucat2.c.item SET index = index + INTERVAL 366 DAYS " +
      "WHERE index < TIMESTAMP '2024-01-06 00:00:00'")
    val got = c.item("item").data
    assert(got.count() == 60)
    assert(got.filter(col("index") >= lit(java.sql.Timestamp.valueOf("2024-12-30 00:00:00")))
      .count() == 5)
    val dirs = c.path.resolve("item").resolve(Item.DataDir).listDirs
      .filter(_.startsWith(Collection.MonthCol + "="))
    assert(dirs.map(_.stripPrefix(Collection.MonthCol + "=")).sorted ==
      Seq("2024-01", "2024-02", "2025-01"))
    cleanup(c)
  }

  test("UPDATE moving rows INTO a populated unscanned period keeps its existing rows") {
    val c = tempCollection("sql_upd_merge")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    registerCatalog("ucat3", c)
    // jan 1..5 move into february (unscanned but populated): february's
    // existing 29 days must survive the merge
    spark.sql("UPDATE ucat3.c.item SET index = index + INTERVAL 31 DAYS " +
      "WHERE index < TIMESTAMP '2024-01-06 00:00:00'")
    val got = c.item("item").data
    assert(got.count() == 60)
    val feb = got.filter(col("index") >= lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    assert(feb.count() == 29 + 5)
    cleanup(c)
  }

  test("UPDATE on a flat item swaps the whole item") {
    val c = tempCollection("sql_upd_flat")
    c.write("item", frame("2024-01-01", 20))
    registerCatalog("ucat4", c)
    spark.sql("UPDATE ucat4.c.item SET tag = concat(tag, '!') WHERE value < 5.0")
    val got = c.item("item").data.orderBy("index").collect()
    assert(got.length == 20)
    assert(got.take(5).forall(_.getString(2).endsWith("!")))
    assert(got.drop(5).forall(!_.getString(2).endsWith("!")))
    cleanup(c)
  }

  test("MERGE INTO applies matched updates and not-matched inserts") {
    val c = tempCollection("sql_merge")
    c.write("item", frame("2024-01-01", 31), monthlyLayout = true)
    registerCatalog("ucat5", c)
    frame("2024-01-25", 14, tagPrefix = "m").createOrReplaceTempView("merge_src")
    spark.sql("""
      |MERGE INTO ucat5.c.item t USING merge_src s ON t.index = s.index
      |WHEN MATCHED THEN UPDATE SET t.value = s.value + 500.0, t.tag = s.tag
      |WHEN NOT MATCHED THEN INSERT *
      |""".stripMargin)
    val got = c.item("item").data.orderBy("index").collect()
    assert(got.length == 38) // 31 jan + 7 new feb days
    val jan25 = got.find(_.getTimestamp(0).toString.startsWith("2024-01-25")).get
    assert(jan25.getString(2) == "m0" && jan25.getDouble(1) == 500.0)
    assert(got.head.getString(2) == "r0") // untouched rows survive
    val dirs = c.path.resolve("item").resolve(Item.DataDir).listDirs
      .filter(_.startsWith(Collection.MonthCol + "="))
    assert(dirs.size == 2, s"jan+feb expected, got $dirs")
    cleanup(c)
  }

  test("non-translatable DELETE predicates now execute through the COW path") {
    val c = tempCollection("sql_del_cow")
    c.write("item", frame("2024-01-01", 40), monthlyLayout = true)
    registerCatalog("ucat6", c)
    // value + 1 = N is not a translatable source filter — previously an
    // analysis error, now a group-based replace
    spark.sql("DELETE FROM ucat6.c.item WHERE value + 1.0 = 3.0")
    val got = c.item("item").data
    assert(got.count() == 39)
    assert(got.filter(col("value") === 2.0).count() == 0)
    cleanup(c)
  }

  test("a manifest snapshot taken before an UPDATE still serves the pre-update rows") {
    val c = tempCollection("sql_upd_snap")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    c.createSnapshot(Some("cut"), manifest = Some(true))
    registerCatalog("ucat7", c)
    spark.sql("UPDATE ucat7.c.item SET value = -1.0 " +
      "WHERE index >= TIMESTAMP '2024-02-01 00:00:00'")
    // live sees the update, the pinned cut does not: the COW publish
    // retained february's pinned generation instead of destroying it
    assert(c.item("item").data.filter(col("value") === -1.0).count() == 29)
    val pinned = c.item("item", snapshot = Some("cut")).data
    assert(pinned.filter(col("value") === -1.0).count() == 0)
    assert(pinned.count() == 60)
    cleanup(c)
  }

  test("UPDATE on a daily layout prunes to the touched day dirs") {
    val c = tempCollection("sql_upd_daily")
    import spark.implicits._
    val df = (0 until 10).flatMap { d =>
      (0 until 4).map { h =>
        (java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2024-03-01")
          .plusDays(d).atStartOfDay().plusHours(h * 6)), d * 10.0 + h, s"d$d-h$h")
      }
    }.toDF("index", "value", "tag")
    c.write("item", df, timeLayout = Some("daily"))
    registerCatalog("ucat8", c)
    val d0Before = periodFiles(c, "item", "2024-03-01")
    spark.sql("UPDATE ucat8.c.item SET value = 999.0 " +
      "WHERE index >= TIMESTAMP '2024-03-05 00:00:00' " +
      "AND index < TIMESTAMP '2024-03-06 00:00:00'")
    assert(c.item("item").data.filter(col("value") === 999.0).count() == 4)
    assert(periodFiles(c, "item", "2024-03-01") == d0Before,
      "day dirs outside the predicate must not be rewritten")
    cleanup(c)
  }

  test("UPDATE matching nothing leaves every period untouched") {
    val c = tempCollection("sql_upd_noop")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    registerCatalog("ucat9", c)
    val jan = periodFiles(c, "item", "2024-01")
    val feb = periodFiles(c, "item", "2024-02")
    // pruning bounds the scan to zero periods: nothing staged, nothing swapped
    spark.sql("UPDATE ucat9.c.item SET value = -1.0 " +
      "WHERE index >= TIMESTAMP '2030-01-01 00:00:00'")
    assert(periodFiles(c, "item", "2024-01") == jan)
    assert(periodFiles(c, "item", "2024-02") == feb)
    assert(c.item("item").data.filter(col("value") === -1.0).count() == 0)
    // no stray staging dirs
    assert(!c.path.listDirs.exists(_.startsWith("__cow_")))
    cleanup(c)
  }

  test("an unboundable predicate widens to a full-item COW, still correct") {
    val c = tempCollection("sql_upd_wide")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    registerCatalog("ucat10", c)
    // tag is not the index and carries no period stats: every period scans
    spark.sql("UPDATE ucat10.c.item SET value = 777.0 WHERE tag = 'r45'")
    val got = c.item("item").data
    assert(got.filter(col("value") === 777.0).count() == 1)
    assert(got.count() == 60)
    val dirs = c.path.resolve("item").resolve(Item.DataDir).listDirs
      .filter(_.startsWith(Collection.MonthCol + "="))
    assert(dirs.size == 2) // both periods rewritten, none lost
    cleanup(c)
  }

  test("a row-level COW publish refuses when its scan generation is stale (cross-writer fence)") {
    // the staged replacement rows were derived from the generation the
    // group scan ran against; a commit landing since makes them stale —
    // publishing would clobber that commit's rows, so the publish
    // refuses typed (the fence SQL row ops pass via scanGen)
    import spark.implicits._
    val c = tempCollection("cow_fence")
    c.write("it", Seq((1, 1.0), (2, 2.0)).toDF("index", "value"),
      indexCols = Seq("index"))
    val gen0 = Snapshots.generationOf(Meta.read(c.path.resolve("it")))
    val staging = c.path.resolve("__cow_it_fence")
    c.item("it").data.write.parquet(staging.toString) // flat staging shape
    c.append("it", Seq((3, 3.0)).toDF("index", "value")) // moves the generation
    val e = intercept[ConcurrentWriteError](
      c.replaceCowStaged("it", staging, None, "update", expectedGen = Some(gen0)))
    assert(e.getMessage.contains("another writer"), e.getMessage)
    assert(c.item("it").data.count() == 3,
      "the refused publish must leave the item untouched")
    // with the CURRENT generation the same publish lands
    val gen1 = Snapshots.generationOf(Meta.read(c.path.resolve("it")))
    val staging2 = c.path.resolve("__cow_it_fence2")
    c.item("it").data.filter(col("index") =!= 2).write.parquet(staging2.toString)
    c.replaceCowStaged("it", staging2, None, "update", expectedGen = Some(gen1))
    assert(c.item("it").data.count() == 2)
    cleanup(c)
  }

  test("row-level ops refuse snapshot-pinned tables and tz-mismatched layouts") {
    val c = tempCollection("sql_upd_refuse")
    c.write("item", frame("2024-01-01", 10), monthlyLayout = true)
    c.createSnapshot(Some("v1"))
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", c.path.resolve("item").toString, "snapshot", "v1"))
    val t = graft.sources.GraftTable.resolve(opts)
    intercept[GraftError] {
      t.newRowLevelOperationBuilder(new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
        override def command() = org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE
        override def options() = org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      })
    }
    cleanup(c)
  }
}
