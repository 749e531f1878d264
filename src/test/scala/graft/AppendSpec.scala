package graft

import org.apache.spark.sql.functions._

import graft.store._

/** Append semantics — mirrors reference tests/test_append.py:14-234. */
class AppendSpec extends SparkSpec {

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, day).atStartOfDay())

  private def frame(days: Range, value: Double) = {
    import spark.implicits._
    days.map(d => (ts(d), value)).toDF("index", "value")
  }

  test("append to missing item raises ItemNotFoundError") {
    val c = tempCollection("append_missing")
    intercept[ItemNotFoundError] { c.append("nope", frame(1 to 3, 1.0)) }
    cleanup(c)
  }

  test("empty append is a no-op") {
    val c = tempCollection("append_empty")
    c.write("item", frame(1 to 5, 1.0))
    c.append("item", frame(1 to 5, 1.0).limit(0))
    assert(c.item("item").data.count() == 5)
    cleanup(c)
  }

  test("keep_last: new rows win on index collision") {
    val c = tempCollection("keep_last")
    c.write("item", frame(1 to 10, 1.0))
    c.append("item", frame(5 to 12, 2.0), DuplicateHandling.KeepLast)
    val out = c.item("item").data.orderBy("index").collect()
    assert(out.length == 12)
    assert(out.take(4).forall(_.getDouble(1) == 1.0))   // days 1-4 original
    assert(out.drop(4).forall(_.getDouble(1) == 2.0))   // days 5-12 new
    cleanup(c)
  }

  test("keep_first: existing rows win on index collision") {
    val c = tempCollection("keep_first")
    c.write("item", frame(1 to 10, 1.0))
    c.append("item", frame(5 to 12, 2.0), DuplicateHandling.KeepFirst)
    val out = c.item("item").data.orderBy("index").collect()
    assert(out.length == 12)
    assert(out.take(10).forall(_.getDouble(1) == 1.0))  // days 1-10 original
    assert(out.drop(10).forall(_.getDouble(1) == 2.0))  // days 11-12 new only
    cleanup(c)
  }

  test("keep_all keeps collided rows; identical full rows still collapse (#69)") {
    val c = tempCollection("keep_all")
    c.write("item", frame(1 to 5, 1.0))
    // days 1-3 identical to stored rows -> collapse; days 4-5 new value -> both kept
    c.append("item", frame(1 to 3, 1.0).unionByName(frame(4 to 5, 9.0)),
      DuplicateHandling.KeepAll)
    val out = c.item("item").data
    assert(out.count() == 7)
    assert(out.filter(col("value") === 9.0).count() == 2)
    cleanup(c)
  }

  test("error strategy raises on overlap, passes when disjoint") {
    val c = tempCollection("error_strategy")
    c.write("item", frame(1 to 5, 1.0))
    intercept[DataIntegrityError] {
      c.append("item", frame(5 to 6, 2.0), DuplicateHandling.ErrorOnDuplicate)
    }
    c.append("item", frame(6 to 8, 2.0), DuplicateHandling.ErrorOnDuplicate)
    assert(c.item("item").data.count() == 8)
    cleanup(c)
  }

  test("schema mismatch raises unless evolution enabled") {
    import spark.implicits._
    val c = tempCollection("schema_mismatch")
    c.write("item", frame(1 to 5, 1.0))
    val extra = Seq((ts(6), 1.0, "x")).toDF("index", "value", "note")
    intercept[SchemaValidationError] { c.append("item", extra) }
    c.append("item", extra, evolution = Some(graft.evolution.EvolutionStrategy.AddOnly))
    val out = c.item("item").data
    assert(out.columns.contains("note"))
    assert(out.filter(col("note").isNull).count() == 5)
    cleanup(c)
  }

  test("appended item stays globally sorted on disk by index") {
    val c = tempCollection("sorted")
    c.write("item", frame(1 to 20, 1.0))
    c.append("item", frame(21 to 25, 2.0))
    // read WITHOUT sorting: row order = file order = range-partitioned order
    val idx = c.item("item").data.collect().map(_.getTimestamp(0).getTime).toSeq
    assert(idx == idx.sorted, "on-disk order should be globally index-sorted")
    cleanup(c)
  }

  test("append preserves user metadata") {
    val c = tempCollection("meta_preserve")
    c.write("item", frame(1 to 5, 1.0), metadata = Map("source" -> "api"))
    c.append("item", frame(6 to 7, 1.0))
    assert(Meta.unjv(c.metadata("item")("source")) == "api")
    cleanup(c)
  }

  test("appendStream accumulates chunks; first chunk creates the item") {
    val c = tempCollection("append_stream")
    val chunks = Iterator(frame(1 to 3, 1.0), frame(4 to 6, 1.0), frame(7 to 9, 1.0))
    val total = c.appendStream("item", chunks)
    assert(total == 9)
    assert(c.item("item").data.count() == 9)
    cleanup(c)
  }
}
