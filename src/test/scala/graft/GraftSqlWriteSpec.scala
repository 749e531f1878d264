package graft

import org.apache.spark.sql.functions._

import graft.store._

/** SQL write surface (V1Write fallback through the typed Collection
  * API): `INSERT INTO` = append with duplicate handling, `INSERT
  * OVERWRITE` = truncating rewrite preserving the item's structural
  * config, plus the typed refusals (snapshot pins, codec-marked
  * overwrite, unknown duplicates option). */
class GraftSqlWriteSpec extends SparkSpec {

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

  test("INSERT INTO appends with KeepLast semantics, same as the Scala API") {
    val c = tempCollection("sql_ins")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true)
    registerCatalog("wcat1", c)
    // days 31..89 overlap days 31..59 of the stored frame: KeepLast
    // keeps the incoming row for every collided index value
    frame("2024-02-01", 59, tagPrefix = "n").createOrReplaceTempView("incoming")
    spark.sql("INSERT INTO wcat1.c.item SELECT * FROM incoming")
    val got = c.item("item").data.orderBy("index").collect()
    assert(got.length == 90) // jan 1 .. mar 30, one row per day
    // collided range serves the incoming batch's rows
    val feb1 = got.find(_.getTimestamp(0).toString.startsWith("2024-02-01")).get
    assert(feb1.getString(2) == "n0", s"KeepLast must keep the incoming row, got $feb1")
    // pre-existing non-collided rows survive
    assert(got.head.getString(2) == "r0")
    cleanup(c)
  }

  test("writer API append honors the duplicates option (keep_all, error)") {
    val c = tempCollection("sql_opt")
    c.write("item", frame("2024-01-01", 10))
    val path = c.path.resolve("item").toString
    frame("2024-01-05", 10, tagPrefix = "n").write.format("graft")
      .option("duplicates", "keep_all").mode("append").save(path)
    assert(c.item("item").data.count() == 20) // nothing dropped
    val e = intercept[DataIntegrityError] {
      frame("2024-01-05", 3).write.format("graft")
        .option("duplicates", "error").mode("append").save(path)
    }
    assert(e.getMessage.contains("duplicate"))
    val bad = intercept[ValidationError] {
      frame("2024-01-05", 3).write.format("graft")
        .option("duplicates", "bogus").mode("append").save(path)
    }
    assert(bad.getMessage.contains("unknown duplicates option"))
    cleanup(c)
  }

  test("INSERT OVERWRITE truncate-rewrites preserving layout and index config") {
    val c = tempCollection("sql_ovw")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true,
      statsColumns = Seq("value"))
    registerCatalog("wcat2", c)
    frame("2025-06-01", 40, tagPrefix = "o").createOrReplaceTempView("replacement")
    spark.sql("INSERT OVERWRITE wcat2.c.item SELECT * FROM replacement")
    val item = c.item("item")
    assert(item.data.count() == 40)
    assert(item.data.orderBy("index").head().getString(2) == "o0")
    // structural config survived the truncate: still monthly, stats col kept
    assert(item.metadata.get("_layout").map(Meta.unjv) == Some("monthly"))
    assert(item.metadata.get("_stats_cols").map(Meta.unjv) == Some(Seq("value")))
    val dirs = c.path.resolve("item").resolve(Item.DataDir).listDirs
      .filter(_.startsWith(Collection.MonthCol + "="))
    assert(dirs.size == 2, s"jun+jul period dirs expected, got $dirs") // 40 days from jun 1
    cleanup(c)
  }

  test("mode(overwrite) through the path-based writer truncates too") {
    val c = tempCollection("sql_ovw2")
    c.write("item", frame("2024-01-01", 20))
    frame("2024-05-01", 5, tagPrefix = "x").write.format("graft")
      .mode("overwrite").save(c.path.resolve("item").toString)
    assert(c.item("item").data.count() == 5)
    cleanup(c)
  }

  test("snapshot-pinned tables refuse writes") {
    val c = tempCollection("sql_snap")
    c.write("item", frame("2024-01-01", 20))
    c.createSnapshot(Some("v1"))
    val e = intercept[GraftError] {
      frame("2024-02-01", 5).write.format("graft")
        .option("snapshot", "v1").mode("append")
        .save(c.path.resolve("item").toString)
    }
    assert(e.getMessage.contains("immutable"))
    cleanup(c)
  }

  test("codec-marked items refuse INSERT OVERWRITE but accept append") {
    val c = tempCollection("sql_codec")
    c.write("item", frame("2024-01-01", 10), epochdate = true)
    val path = c.path.resolve("item").toString
    val t = spark.read.format("graft").load(path)
    // encoded schema: epoch-nanos long index — append in that rep works
    assert(t.schema("index").dataType == org.apache.spark.sql.types.LongType)
    val shifted = t.withColumn("index", col("index") + expr("86400000000000 * 30"))
    shifted.write.format("graft").mode("append").save(path)
    assert(c.item("item").data.count() == 20)
    val e = intercept[ValidationError] {
      shifted.write.format("graft").mode("overwrite").save(path)
    }
    assert(e.getMessage.contains("_epochdate"))
    cleanup(c)
  }

  test("DELETE FROM removes matching rows through the pruned deleteWhere path") {
    val c = tempCollection("sql_del")
    c.write("item", frame("2024-01-01", 90), monthlyLayout = true)
    registerCatalog("wdel1", c)
    // index range: only march rows qualify — the discovery scan prunes
    // to the march period (the Scala-path pruning MonthlyLayoutSpec
    // plan-asserts; here we prove the SQL surface reaches it)
    spark.sql("DELETE FROM wdel1.c.item WHERE index >= TIMESTAMP '2024-03-01 00:00:00'")
    val left = c.item("item").data
    assert(left.count() == 60) // jan + feb survive
    assert(left.agg(max(col("index"))).head().getTimestamp(0).toString.startsWith("2024-02-29"))
    // period dir for march is gone outright (emptied periods are removed)
    val dirs = c.path.resolve("item").resolve(Item.DataDir).listDirs
      .filter(_.startsWith(Collection.MonthCol + "="))
    assert(dirs.size == 2, s"only jan+feb period dirs expected, got $dirs")
    // compound predicate with OR / string ops translates too
    spark.sql("DELETE FROM wdel1.c.item WHERE tag = 'r0' OR tag LIKE 'r1%'")
    assert(c.item("item").data.count() == 60 - 1 - 11) // r0, r1, r10..r19
    cleanup(c)
  }

  test("TRUNCATE TABLE empties the item through delete-all") {
    val c = tempCollection("sql_trunc")
    c.write("item", frame("2024-01-01", 40), monthlyLayout = true)
    registerCatalog("wdel2", c)
    spark.sql("TRUNCATE TABLE wdel2.c.item")
    assert(c.item("item").data.count() == 0)
    // structural config survives — a later append re-populates in layout
    assert(c.item("item").metadata.get("_layout").map(Meta.unjv) == Some("monthly"))
    cleanup(c)
  }

  test("snapshot-pinned tables refuse DELETE") {
    val c = tempCollection("sql_del_snap")
    c.write("item", frame("2024-01-01", 10))
    c.createSnapshot(Some("v1"))
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", c.path.resolve("item").toString, "snapshot", "v1"))
    val t = graft.sources.GraftTable.resolve(opts)
    val fs: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("value", 1.0))
    assert(!t.canDeleteWhere(fs),
      "snapshot-pinned table must refuse DELETE at analysis")
    intercept[GraftError] {
      t.deleteWhere(Array.empty[org.apache.spark.sql.sources.Filter])
    }
    cleanup(c)
  }

  test("SHOW TBLPROPERTIES serves the item sidecar metadata") {
    val c = tempCollection("sql_props")
    c.write("item", frame("2024-01-01", 10), monthlyLayout = true,
      metadata = Map("source" -> "api"))
    registerCatalog("wprop", c)
    val props = spark.sql("SHOW TBLPROPERTIES wprop.c.item")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("_layout") == Some("monthly"))
    assert(props.get("source") == Some("api"))
    assert(props.get("index_names").exists(_.contains("index")))
    // bulky machine keys stay out of the SQL surface
    assert(!props.contains("schema_json_encoded") && !props.contains("_period_stats"))
    cleanup(c)
  }

  test("catalog DDL stays refused with a typed message") {
    val c = tempCollection("sql_ddl")
    c.write("item", frame("2024-01-01", 5))
    registerCatalog("wcat3", c)
    val e = intercept[UnsupportedOperationException] {
      spark.sql("DROP TABLE wcat3.c.item")
    }
    assert(e.getMessage.contains("data operation"))
    cleanup(c)
  }
}
