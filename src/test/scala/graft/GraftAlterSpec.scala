package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store._

/** Metadata-only schema widening: `ALTER TABLE ... ADD COLUMNS` /
  * `Collection.addColumns` (one sidecar write, zero data files), the
  * declared-schema read pin that makes mixed file generations read
  * correctly, `SET/UNSET TBLPROPERTIES`, and the evolved-append sidecar
  * schema refresh. */
class GraftAlterSpec extends SparkSpec {

  private def frame(startDay: String, days: Int) = {
    import spark.implicits._
    val start = java.time.LocalDate.parse(startDay)
    (0 until days).map { i =>
      (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), i.toDouble)
    }.toDF("index", "value")
  }

  private def registerCatalog(name: String, c: Collection): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", c.path.parent.toString)
  }

  private def dataFiles(c: Collection, item: String): Set[String] =
    c.path.fs.listFilesRecursively(c.path.resolve(item).resolve(Item.DataDir).raw)
      .filter(_.endsWith(".parquet")).toSet

  test("ADD COLUMNS is metadata-only; old rows read NULL, new appends fill it") {
    val c = tempCollection("alter_add")
    c.write("item", frame("2024-01-01", 60), monthlyLayout = true) // jan feb
    val filesBefore = dataFiles(c, "item")
    registerCatalog("acat1", c)
    spark.sql("ALTER TABLE acat1.c.item ADD COLUMNS (score DOUBLE, tag STRING)")
    // zero data files changed — the lakehouse metadata-only contract
    assert(dataFiles(c, "item") == filesBefore)
    // both read paths serve the widened schema, old rows as NULLs
    val viaApi = c.item("item").data
    assert(viaApi.columns.toSeq == Seq("index", "value", "score", "tag"))
    assert(viaApi.filter(col("score").isNotNull).count() == 0)
    val viaSql = spark.sql("SELECT * FROM acat1.c.item")
    assert(viaSql.columns.toSeq == Seq("index", "value", "score", "tag"))
    assert(viaSql.count() == 60)
    // a post-ALTER append carries the column: mixed file generations
    // read correctly against the declared pin
    import spark.implicits._
    val withCol = (0 until 10).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i).atStartOfDay()),
        i.toDouble, i * 1.5, s"t$i")
    }.toDF("index", "value", "score", "tag")
    c.append("item", withCol)
    val all = c.item("item").data
    assert(all.count() == 70)
    assert(all.filter(col("score").isNotNull).count() == 10)
    assert(all.filter(col("tag") === "t3").count() == 1)
    // index-period pruning still works through the pinned read
    assert(all.filter(col("index") >= lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .count() == 10)
    cleanup(c)
  }

  test("ADD COLUMNS typed refusals: collisions, non-nullable, reserved, drops, positions") {
    val c = tempCollection("alter_refuse")
    c.write("item", frame("2024-01-01", 10))
    registerCatalog("acat2", c)
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE acat2.c.item ADD COLUMNS (VALUE DOUBLE)"))
    assert(dup.getMessage.contains("already exists"))
    val nn = intercept[ValidationError](
      c.addColumns("item", Seq(StructField("x", DoubleType, nullable = false))))
    assert(nn.getMessage.contains("nullable"))
    val res = intercept[ValidationError](
      c.addColumns("item", Seq(StructField("__month", StringType))))
    assert(res.getMessage.contains("reserved"))
    val drop = intercept[Exception](
      spark.sql("ALTER TABLE acat2.c.item DROP COLUMN value"))
    assert(drop.getMessage.contains("migration"))
    val ren = intercept[Exception](
      spark.sql("ALTER TABLE acat2.c.item RENAME COLUMN value TO v2"))
    assert(ren.getMessage.contains("migration"))
    val pos = intercept[Exception](
      spark.sql("ALTER TABLE acat2.c.item ADD COLUMNS (z DOUBLE FIRST)"))
    assert(pos.getMessage.contains("FIRST/AFTER"))
    cleanup(c)
  }

  test("SET/UNSET TBLPROPERTIES updates user metadata; structural keys refuse") {
    val c = tempCollection("alter_props")
    c.write("item", frame("2024-01-01", 5), metadata = Map("team" -> "ops"))
    registerCatalog("acat3", c)
    // ('owner' is a Spark-reserved table property — parser refuses it)
    spark.sql("ALTER TABLE acat3.c.item SET TBLPROPERTIES ('source' = 'nyse', 'team' = 'data')")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES acat3.c.item").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("source").contains("nyse"))
    assert(props().get("team").contains("data"))
    // metadata equality search (P3) sees the SQL-set property
    assert(c.listItems(Map("source" -> "nyse")).contains("item"))
    spark.sql("ALTER TABLE acat3.c.item UNSET TBLPROPERTIES ('source')")
    assert(!props().contains("source"))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE acat3.c.item SET TBLPROPERTIES ('_layout' = 'daily')"))
    assert(e.getMessage.contains("structural"))
    cleanup(c)
  }

  test("an evolved append refreshes the declared schemas (SQL readers see the new column)") {
    val c = tempCollection("alter_evolve")
    c.write("item", frame("2024-01-01", 10))
    import spark.implicits._
    val widened = (0 until 5).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(i).atStartOfDay()),
        i.toDouble, s"n$i")
    }.toDF("index", "value", "note")
    c.append("item", widened, evolution = Some(graft.evolution.EvolutionStrategy.AddOnly))
    registerCatalog("acat4", c)
    // before the fix the V2 table served the stale pre-evolution sidecar
    // schema and the new column was invisible to SQL
    val viaSql = spark.sql("SELECT * FROM acat4.c.item")
    assert(viaSql.columns.toSeq == Seq("index", "value", "note"))
    assert(viaSql.filter(col("note").isNotNull).count() == 5)
    assert(c.item("item").data.columns.contains("note"))
    cleanup(c)
  }
}
