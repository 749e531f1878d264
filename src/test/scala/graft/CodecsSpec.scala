package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store._

/** Codec layer + layout rebalance — mirrors reference complex-type
  * roundtrips (tests/test_multiindex.py:153-247,
  * tests/test_pr77_features.py:119-249) and rebalancing
  * (tests/test_performance.py). */
class CodecsSpec extends SparkSpec {

  import spark.implicits._

  test("type markers survive the sidecar roundtrip") {
    val markers = Map(
      "td" -> Codecs.TypeMarker("timedelta", Map("unit" -> "ns")),
      "p" -> Codecs.TypeMarker("period", Map("freq" -> "M")),
      "cat" -> Codecs.TypeMarker("categorical",
        Map("categories" -> Seq("A", "B", "C", "D"), "ordered" -> true)))
    val back = Codecs.markersFromMeta(Codecs.markersToMeta(markers))
    assert(back.keySet == markers.keySet)
    assert(back("td").kind == "timedelta")
    assert(back("p").params("freq") == "M")
    assert(back("cat").params("ordered") == true)
    assert(back("cat").params("categories") == Seq("A", "B", "C", "D"))
  }

  test("period freq fixup ME->M (reference dataframe.py:258-263)") {
    assert(Codecs.normalizeFreq("ME") == "M")
    assert(Codecs.normalizeFreq("QE") == "Q")
    assert(Codecs.normalizeFreq("W") == "W")
  }

  test("interval encodes as struct with closedness marker") {
    val df = Seq((0.0, 1.0), (1.0, 2.0)).toDF("lo", "hi")
    val (c, m) = Codecs.encodeInterval(col("lo"), col("hi"), "right")
    val out = df.select(c.as("iv"))
    assert(out.schema("iv").dataType.isInstanceOf[StructType])
    assert(m.params("closed") == "right")
    assert(out.select("iv.left").as[Double].collect().toSeq == Seq(0.0, 1.0))
  }

  test("timezone marker restores presentation tz on read") {
    val c = tempCollection("tz")
    val utc = Seq(java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
      .toDF("index")
    c.write("item", utc,
      typeMarkers = Map("index" -> Codecs.TypeMarker("timestamp_tz",
        Map("timezone" -> "America/New_York"))))
    val restored = c.item("item").dataRestored.head().getTimestamp(0)
    // 12:00 UTC == 08:00 New York wall clock in June (EDT)
    assert(restored.toString.startsWith("2024-06-01 08:00:00"))
    cleanup(c)
  }

  test("epochdate item restores a timestamp index via dataRestored") {
    val c = tempCollection("epoch_restore")
    c.write("item", sampleData, epochdate = true)
    val it = c.item("item")
    assert(it.data.schema("index").dataType == LongType)
    assert(it.dataRestored.schema("index").dataType == TimestampType)
    val restored = it.dataRestored.orderBy("index").head().getTimestamp(0)
    assert(restored.toString.startsWith("2024-01-01"))
    cleanup(c)
  }

  test("complex numbers as struct(re, im)") {
    val df = Seq((1.0, -2.0)).toDF("re", "im")
    val (c, _) = Codecs.encodeComplex(col("re"), col("im"))
    val r = df.select(c.as("z")).select("z.re", "z.im").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == -2.0)
  }

  test("rebalance rewrites layout and records it in metadata") {
    val c = tempCollection("rebalance")
    c.write("item", sampleData, npartitions = Some(7))
    assert(Meta.unjv(c.metadata("item")("_partitions")) == 7L)
    val n = c.rebalance("item", npartitions = Some(2))
    assert(n == 2)
    c.clearMetadataCache()
    assert(Meta.unjv(c.metadata("item")("_partitions")) == 2L)
    assert(c.item("item").data.count() == 100)
    // auto rebalance also works
    c.rebalance("item")
    assert(c.item("item").data.count() == 100)
    cleanup(c)
  }

  test("nested arrays/maps/structs are native - no JSON cell hack needed") {
    val c = tempCollection("nested")
    val df = Seq(
      (1L, Seq(1, 2), Map("a" -> 1), (1, "x")),
      (2L, Seq(3, 4, 5), Map("b" -> 2, "c" -> 3), (2, "y")))
      .toDF("index", "xs", "m", "s")
    c.write("item", df)
    val back = c.item("item").data.orderBy("index")
    assert(back.schema("xs").dataType.isInstanceOf[ArrayType])
    assert(back.schema("m").dataType.isInstanceOf[MapType])
    assert(back.schema("s").dataType.isInstanceOf[StructType])
    assert(back.select("xs").as[Seq[Int]].collect().toSeq == Seq(Seq(1, 2), Seq(3, 4, 5)))
    cleanup(c)
  }

  test("auto tz marker is recorded at the write edge (no caller hint)") {
    val c = tempCollection("autotz")
    val df = Seq((0L, java.sql.Timestamp.valueOf("2024-06-01 12:00:00"), 1.5))
      .toDF("index", "ts", "v")
    c.write("item", df)
    val m = Codecs.markersFromMeta(c.metadata("item")("_type_info"))
    assert(m("ts").kind == "timestamp_tz")
    assert(m("ts").params("timezone") == "UTC")
    // UTC restore is the identity on the stored instant
    assert(c.item("item").dataRestored.select("ts").head().getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
    cleanup(c)
  }

  test("dtype hints drive codecs through the store API (pr77 parity)") {
    val c = tempCollection("hints")
    val df = Seq(
      (0L, 3600000000000L, "2024-01", "B"),
      (1L, 7200000000000L, "2024-02", "A")).toDF("index", "td", "p", "cat")
    c.write("item", df, dtypeHints = Map(
      "td" -> "timedelta64[ns]", "p" -> "period[ME]", "cat" -> "category:ordered"))
    val m = Codecs.markersFromMeta(c.metadata("item")("_type_info"))
    assert(m("td").kind == "timedelta" && m("td").params("unit") == "ns")
    assert(m("p").kind == "period" && m("p").params("freq") == "M")
    assert(m("cat").kind == "categorical" && m("cat").params("ordered") == true)
    assert(m("cat").params("categories") == Seq("A", "B"))
    val back = c.item("item").data.orderBy("index")
    assert(back.schema("td").dataType == LongType)
    assert(back.schema("p").dataType == StringType)
    assert(back.select("cat").as[String].collect().toSeq == Seq("B", "A"))
    cleanup(c)
  }
}
