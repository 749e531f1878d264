package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store._

/** Edge cases — mirrors reference tests/test_edge_cases.py:15-167. */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  test("empty frame roundtrips with schema, 0 rows") {
    val c = tempCollection("empty")
    val df = Seq.empty[(java.sql.Timestamp, Double)].toDF("index", "value")
    c.write("item", df)
    val back = c.item("item").data
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSet == Set("index", "value"))
    cleanup(c)
  }

  test("store root path containing spaces works") {
    val root = java.nio.file.Files.createTempDirectory("graft space dir")
    val c = GraftStore(spark, "s", root).collection("c")
    c.write("item", sampleData.limit(5))
    assert(c.item("item").data.count() == 5)
    FsOps.deleteRecursively(root)
  }

  test("1000-char column name survives") {
    val longName = "c" * 1000
    val c = tempCollection("longcol")
    val df = sampleData.withColumnRenamed("value1", longName)
    c.write("item", df)
    assert(c.item("item").data.columns.contains(longName))
    cleanup(c)
  }

  test("wide frame (300 columns) writes and projects") {
    val c = tempCollection("wide")
    val base = sampleData.limit(3)
    val wide = (0 until 300).foldLeft(base)((d, i) => d.withColumn(s"w$i", lit(i)))
    c.write("item", wide)
    val one = c.item("item", columns = Seq("w42")).data
    assert(one.columns.toSet == Set("index", "w42"))
    assert(one.count() == 3)
    cleanup(c)
  }

  test("non-datetime integer index with duplicates keeps all rows") {
    val c = tempCollection("intdup")
    val df = Seq((1, "a"), (1, "b"), (2, "c"), (2, "d")).toDF("index", "v")
    c.write("item", df)
    assert(c.item("item").data.count() == 4)
    cleanup(c)
  }

  test("custom index name is preserved through write/append/read") {
    val c = tempCollection("customidx")
    val df = sampleData.withColumnRenamed("index", "custom_index_name")
    c.write("item", df, indexCols = Seq("custom_index_name"))
    assert(c.item("item").indexCols == Seq("custom_index_name"))
    c.append("item", df.limit(3))
    assert(c.item("item").indexCols == Seq("custom_index_name"))
    cleanup(c)
  }

  test("special characters in item names") {
    val c = tempCollection("specialname")
    for (name <- Seq("item-with-dash", "item_with_underscore", "item.with.dots")) {
      c.write(name, sampleData.limit(2))
      assert(c.item(name).data.count() == 2)
    }
    assert(c.items.size == 3)
    cleanup(c)
  }

  test("registerViews exposes items to spark.sql") {
    val c = tempCollection("views")
    c.write("prices", sampleData)
    val views = c.registerViews("g_")
    assert(views == Seq("g_prices"))
    val n = spark.sql("SELECT count(*) FROM g_prices WHERE category = 'A'").head().getLong(0)
    assert(n > 0 && n < 100)
    cleanup(c)
  }

  test("frame without an index column gets a synthesized default index") {
    val c = tempCollection("autoindex")
    val df = Seq(1.5, 2.5, 3.5).toDF("value")
    c.write("item", df)
    val back = c.item("item").data
    assert(back.columns.toSet == Set("index", "value"))
    assert(back.select("index").distinct().count() == 3)
    cleanup(c)
  }

  test("metadata with nested values persists verbatim") {
    val c = tempCollection("nestedmeta")
    c.write("item", sampleData.limit(2), metadata = Map(
      "tags" -> Seq("equity", "US", "tech"),
      "ratio" -> 0.25,
      "nested" -> Map("k" -> "v")))
    val m = c.metadata("item")
    assert(Meta.unjv(m("tags")) == Seq("equity", "US", "tech"))
    assert(Meta.unjv(m("ratio")) == 0.25)
    assert(Meta.unjv(m("nested")) == Map("k" -> "v"))
    cleanup(c)
  }

  test("unknown time layout is rejected with a clear error") {
    val c = tempCollection("badlayout")
    val e = intercept[ValidationError] {
      c.write("item", sampleData, timeLayout = Some("weekly"))
    }
    assert(e.getMessage.contains("weekly"))
    cleanup(c)
  }

  test("unrecognized dtype hint is ignored; categorical cap errors") {
    val c = tempCollection("badhint")
    val df = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("index", "s")
    // unknown hint: write succeeds, no marker recorded for the column
    c.write("item", df, dtypeHints = Map("s" -> "complex128"))
    val info = c.metadata("item").get("_type_info")
    assert(info.forall(j => !Codecs.markersFromMeta(j).contains("s")))
    // categorical hint on a high-cardinality column trips the cap
    val big = (0 until 10050).map(i => (i.toLong, s"u$i")).toDF("index", "s")
    val e = intercept[IllegalArgumentException] {
      graft.store.Codecs.autoDispatch(big, Map.empty,
        Map("s" -> "category"), "UTC") match { case (d, _) => d.collect() }
    }
    assert(e.getMessage.contains("distinct"))
    cleanup(c)
  }

  test("bm25 with no matching terms returns empty, not an error") {
    import graft.operators.Search
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val q = Seq((0L, "zzz_nonexistent")).toDF("query_id", "term")
    assert(Search.bm25TopK(docs, q, k = 5).count() == 0)
  }

  test("PQ build rejects a subspace count that does not divide the dim") {
    import graft.operators.Similarity
    val e = Seq((1L, Array.fill(10)(1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.buildPqIndex(e, m = 3, ksub = 2, iters = 0)
    }
    assert(ex.getMessage.contains("must divide"))
  }

  test("range join with an empty interval side returns empty") {
    import graft.operators.RangeJoin
    val pts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("pid", "ts")
    val ivs = Seq.empty[(String, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("iid", "w_start", "w_end")
    assert(RangeJoin.pointInInterval(pts, ivs, "ts", "w_start", "w_end").count() == 0)
  }

  test("winnow fingerprint and text stats behave on empty and 1-token docs") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val r = df.select($"doc_id",
        TextAnalysis.winnowFingerprint($"text").as("w"),
        TextAnalysis.tokenCount($"text").as("nt"),
        TextAnalysis.langId($"text").as("lang"))
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[org.apache.spark.sql.Row]("w").getAs[Long]("n_grams") == 1)
    assert(r(0).getAs[Int]("nt") == 0)
    assert(r(0).getAs[String]("lang") == "und")
    assert(r(1).getAs[Int]("nt") == 1)
  }

  test("degenerate inputs fail fast with typed messages, not NPEs") {
    import graft.operators.{LanguageModel, Profiler, Events}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](LanguageModel.buildBigramLm(emptyDocs))
    assert(e1.getMessage.contains("empty corpus"))
    val allNull = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "x")
      .withColumn("y", $"x")
    val e2 = intercept[IllegalArgumentException](
      Profiler.correlationMatrix(allNull, Seq("x", "y")))
    assert(e2.getMessage.contains("no complete rows"))
    val oneWindow = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("event_id", "ts", "value")
    val e3 = intercept[IllegalArgumentException](Events.rateAnomalies(oneWindow))
    assert(e3.getMessage.contains("at least two windows"))
    // empty input: same typed message, not an NPE from the null sums
    val noWindows = oneWindow.filter(lit(false))
    val e3b = intercept[IllegalArgumentException](Events.rateAnomalies(noWindows))
    assert(e3b.getMessage.contains("at least two windows"))
    // empty line-dedup input: empty output, no failure
    assert(graft.operators.Dedup.lineDedup(emptyDocs).isEmpty)
  }

  test("a torn item (sidecar without data) reads as a typed repair pointer, not a raw path error") {
    import spark.implicits._
    val c = tempCollection("torn_item")
    c.write("it", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    // simulate an unrepaired crash artifact: the data dir vanished, the
    // sidecar survived (no backup, no retained copy -> vacuum cannot
    // restore it either, but the error must say what to try)
    c.path.resolve("it").resolve(Item.DataDir).deleteRecursively()
    val e = intercept[GraftError](c.item("it").data.count())
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    assert(e.getMessage.contains("it"), e.getMessage)
    cleanup(c)
  }
}
