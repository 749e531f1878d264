package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.evolution._
import graft.store._

/** Snapshots (reference tests/test_snapshots.py) and schema evolution
  * (tests/test_pr77_features.py:462-525, test_phase4_features.py:193-274). */
class SnapshotEvolutionSpec extends SparkSpec {

  test("snapshot isolates point-in-time state; live item moves on") {
    val c = tempCollection("snap_iso")
    c.write("item", sampleData.limit(50))
    val snap = c.createSnapshot(Some("v1"))
    c.write("item", sampleData, overwrite = true)
    assert(c.item("item").data.count() == 100)
    assert(c.item("item", snapshot = Some(snap)).data.count() == 50)
    cleanup(c)
  }

  test("snapshot names are sanitized; auto names are generated") {
    val c = tempCollection("snap_name")
    c.write("item", sampleData.limit(5))
    assert(c.createSnapshot(Some("my snap!/v1")) == "my_snap__v1")
    val auto = c.createSnapshot(None)
    assert(auto.nonEmpty && c.listSnapshots().contains(auto))
    cleanup(c)
  }

  test("delete_snapshot of missing snapshot returns true (lenient quirk)") {
    val c = tempCollection("snap_lenient")
    assert(c.deleteSnapshot("never_existed"))
    cleanup(c)
  }

  test("snapshot read of missing snapshot/item raises typed errors") {
    val c = tempCollection("snap_err")
    c.write("item", sampleData.limit(5))
    intercept[SnapshotNotFoundError] { c.item("item", snapshot = Some("nope")) }
    val snap = c.createSnapshot(Some("s1"))
    intercept[ItemNotFoundError] { c.item("other", snapshot = Some(snap)) }
    cleanup(c)
  }

  test("deleteSnapshots clears all") {
    val c = tempCollection("snap_clear")
    c.write("item", sampleData.limit(5))
    c.createSnapshot(Some("a")); c.createSnapshot(Some("b"))
    assert(c.listSnapshots().size == 2)
    c.deleteSnapshots()
    assert(c.listSnapshots().isEmpty)
    cleanup(c)
  }

  test("schema diff detects adds/removes/retypes/reorder") {
    val a = StructType(Seq(StructField("x", IntegerType), StructField("y", DoubleType)))
    val b = StructType(Seq(StructField("y", DoubleType), StructField("x", LongType),
      StructField("z", StringType)))
    val d = SchemaEvolution.diff(a, b)
    assert(d.added.map(_.name) == Seq("z"))
    assert(d.removed.isEmpty)
    assert(d.retyped == Seq(("x", IntegerType, LongType)))
    assert(d.reordered)
  }

  test("strategy validation: STRICT rejects, ADD_ONLY allows adds only, COMPATIBLE widens") {
    val base = StructType(Seq(StructField("x", IntegerType)))
    val widened = StructType(Seq(StructField("x", LongType)))
    val added = StructType(Seq(StructField("x", IntegerType), StructField("y", DoubleType)))
    val removed = StructType(Seq.empty[StructField])

    def v(n: StructType, s: EvolutionStrategy) =
      SchemaEvolution.validate(SchemaEvolution.diff(base, n), s)

    assert(v(added, EvolutionStrategy.Strict).isDefined)
    assert(v(added, EvolutionStrategy.AddOnly).isEmpty)
    assert(v(widened, EvolutionStrategy.AddOnly).isDefined)
    assert(v(widened, EvolutionStrategy.Compatible).isEmpty)
    assert(v(removed, EvolutionStrategy.Compatible).isDefined)
    assert(v(removed, EvolutionStrategy.Flexible).isEmpty)
  }

  test("widening whitelist matches the COMPATIBLE set") {
    import SchemaEvolution.canWiden
    assert(canWiden(IntegerType, LongType))
    assert(canWiden(FloatType, DoubleType))
    assert(canWiden(LongType, DoubleType))
    assert(canWiden(IntegerType, StringType))
    assert(!canWiden(LongType, IntegerType))
    assert(!canWiden(DoubleType, FloatType))
  }

  test("evolveLogicalSchema preserves logical types of legacy pre-encode sidecars") {
    import org.json4s.JString
    val logical = StructType(Seq(
      StructField("index", TimestampType), StructField("v", DoubleType)))
    val newEncoded = StructType(Seq(
      StructField("index", LongType),       // epochdate-encoded on disk
      StructField("v", DoubleType),
      StructField("added", StringType)))
    // legacy sidecar: schema_json only, no schema_json_encoded
    val legacyMeta = Map[String, org.json4s.JValue](
      "schema_json" -> JString(logical.json))
    val out = Collection.evolveLogicalSchema(legacyMeta, newEncoded)
    // pre-existing columns keep their recorded DECODED contract;
    // the added column takes the encoded type (no codec recorded)
    assert(out.fields.find(_.name == "index").get.dataType == TimestampType)
    assert(out.fields.find(_.name == "v").get.dataType == DoubleType)
    assert(out.fields.find(_.name == "added").get.dataType == StringType)
    // modern sidecar: encoded comparison still governs — a column whose
    // ENCODED type changed takes the new encoded type
    val modernMeta = Map[String, org.json4s.JValue](
      "schema_json" -> JString(logical.json),
      "schema_json_encoded" -> JString(StructType(Seq(
        StructField("index", LongType), StructField("v", FloatType))).json))
    val out2 = Collection.evolveLogicalSchema(modernMeta, newEncoded)
    assert(out2.fields.find(_.name == "index").get.dataType == TimestampType)
    assert(out2.fields.find(_.name == "v").get.dataType == DoubleType) // widened: encoded type wins
  }

  test("legacy sidecar: a WIDENED column takes the new encoded type, codec shapes stay") {
    import org.json4s.JString
    val logical = StructType(Seq(
      StructField("index", TimestampType), // codec shape: encoded as Long
      StructField("n", IntegerType)))      // plain narrow numeric
    val legacyMeta = Map[String, org.json4s.JValue](
      "schema_json" -> JString(logical.json))
    // an append legitimately widened n to Long: keeping the recorded
    // Int would declare Int over Long parquet data and truncate pinned
    // reads — the widened encoded type must win
    val widened = StructType(Seq(
      StructField("index", LongType), StructField("n", LongType)))
    val out = Collection.evolveLogicalSchema(legacyMeta, widened)
    assert(out.fields.find(_.name == "index").get.dataType == TimestampType,
      "codec-shaped column (Timestamp recorded, Long encoded) must keep its logical type")
    assert(out.fields.find(_.name == "n").get.dataType == LongType,
      "a plain numeric widening must follow the data, not the stale narrow record")
    // widening TO string is the codec shape, not a data widening: keep
    val strEnc = StructType(Seq(
      StructField("index", LongType), StructField("n", StringType)))
    val out2 = Collection.evolveLogicalSchema(legacyMeta, strEnc)
    assert(out2.fields.find(_.name == "n").get.dataType == IntegerType)
  }

  test("migration registry applies stepwise paths") {
    import spark.implicits._
    val reg = new SchemaEvolution.MigrationRegistry
    reg.register(1, 2)(_.withColumnRenamed("old", "mid"))
    reg.register(2, 3)(_.withColumnRenamed("mid", "new"))
    val out = reg.migrate(Seq(1, 2).toDF("old"), 1, 3)
    assert(out.columns.toSeq == Seq("new"))
    intercept[SchemaValidationError] { reg.migrate(Seq(1).toDF("old"), 3, 5) }
  }
}
