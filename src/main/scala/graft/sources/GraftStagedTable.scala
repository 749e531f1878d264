package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DateType, StructType, TimestampNTZType, TimestampType}

import graft.store.{Collection, GraftError, GraftStore, SPath, ValidationError}

object GraftStagedTable {

  /** Which SQL verb staged this table — decides the exists/overwrite
    * contract of the eventual [[Collection.write]]. */
  private[sources] sealed trait Mode
  private[sources] case object Create extends Mode          // CTAS
  private[sources] case object Replace extends Mode         // RTAS (must exist)
  private[sources] case object CreateOrReplace extends Mode // CREATE OR REPLACE ... AS SELECT

  /** Structural TBLPROPERTIES the CTAS write pipeline consumes (every
    * other non-reserved property becomes user metadata on the item,
    * same as the Scala API's `metadata` argument). */
  private[sources] val IndexProp = "index"
  private[sources] val LayoutProp = "layout"
  private[sources] val SaltProp = "salt"
  private[sources] val StatsProp = "stats_cols"
  private[sources] val NPartsProp = "npartitions"
  private[sources] val StructuralProps = Set(IndexProp, LayoutProp, SaltProp, StatsProp, NPartsProp)

  /** Spark-reserved table properties that must not leak into user
    * metadata (TableCatalog.PROP_* plus the `option.` prefix). */
  private[sources] val ReservedProps =
    Set("provider", "location", "comment", "owner", "external",
      "is_managed_location", "transient_lastDdlTime")

  private[sources] def isReserved(k: String): Boolean =
    ReservedProps.contains(k.toLowerCase) || k.startsWith("option.")

  /** `PARTITIONED BY (days(ts) | months(ts) | years(ts))` → graft time
    * layout + index column. The quarterly layout has no Spark transform
    * function — reach it via TBLPROPERTIES('layout'='quarterly'). */
  private[sources] val TransformLayouts = Map(
    "days" -> "daily", "months" -> "monthly", "years" -> "yearly")
}

/** The structural-TBLPROPERTIES parser shared by every catalog verb
  * that births or re-births an item (CTAS/RTAS via [[GraftStagedTable]],
  * bare `CREATE TABLE` via [[GraftCatalog.createTable]]): one place maps
  * SQL table config — `index`, `layout`, `salt`, `stats_cols`,
  * `npartitions`, `PARTITIONED BY` transforms — onto the typed
  * [[graft.store.Collection.write]] arguments, validating EAGERLY so a
  * bad property fails at analysis, not mid-write. */
private[sources] final class GraftTableConfig(
    querySchema: StructType,
    partitions: Array[Transform],
    tblProperties: util.Map[String, String]) {

  import GraftStagedTable._

  private def prop(key: String): Option[String] =
    tblProperties.asScala.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  // ---- eager config parse: bad properties fail at ANALYSIS, not mid-write

  prop("provider").map(_.toLowerCase).foreach { p =>
    // graft stores snappy parquet; accept the plain-parquet spelling a
    // default-provider session sends, refuse anything else loudly
    if (p != "graft" && p != "parquet")
      throw new GraftError(
        s"CREATE TABLE ... AS SELECT in a graft catalog writes graft items; " +
          s"USING $p is not supported (use USING graft, or omit USING)")
  }

  private val (transformLayout, transformIndex): (Option[String], Option[String]) = {
    if (partitions.length > 1)
      throw new ValidationError(
        "graft items take at most one time-partition transform: " +
          s"PARTITIONED BY (${partitions.mkString(", ")})")
    partitions.headOption match {
      case None => (None, None)
      case Some(t) =>
        val layout = TransformLayouts.getOrElse(t.name().toLowerCase,
          throw new ValidationError(
            s"unsupported partition transform '${t.name()}': graft time layouts map " +
              "from days()/months()/years() (quarterly via TBLPROPERTIES('layout'='quarterly')); " +
              "identity/bucket partitioning is not a graft concept"))
        val refs = t.references()
        if (refs.length != 1)
          throw new ValidationError(s"partition transform ${t.name()} needs exactly one column")
        (Some(layout), Some(refs(0).fieldNames().mkString(".")))
    }
  }

  val layoutOpt: Option[String] = {
    val fromProp = prop(LayoutProp).map(_.trim.toLowerCase)
      .filterNot(_ == "flat")
    fromProp.foreach { l =>
      if (!Collection.TimeLayouts.contains(l))
        throw new ValidationError(
          s"unknown layout '$l' (supported: flat, ${Collection.TimeLayouts.mkString(", ")})")
    }
    (fromProp, transformLayout) match {
      case (Some(a), Some(b)) if a != b =>
        throw new ValidationError(
          s"TBLPROPERTIES layout='$a' conflicts with PARTITIONED BY transform → '$b'")
      case (a, b) => a.orElse(b)
    }
  }

  val indexCols: Seq[String] = {
    val explicit = prop(IndexProp)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(transformIndex.map(Seq(_)))
    explicit match {
      case Some(cols) =>
        val missing = cols.filterNot(querySchema.fieldNames.contains)
        if (missing.nonEmpty)
          throw new ValidationError(
            s"index column(s) not in the SELECT output: ${missing.mkString(",")} " +
              s"(query columns: ${querySchema.fieldNames.mkString(",")})")
        transformIndex.foreach { ti =>
          if (!cols.contains(ti))
            throw new ValidationError(
              s"PARTITIONED BY column '$ti' must be (one of) the index column(s) ${cols.mkString(",")}")
        }
        cols
      case None =>
        // the Scala write's defaulting, plus the first-time-column rule:
        // a time-series engine's natural index is the first temporal col
        if (querySchema.fieldNames.contains(Collection.DefaultIndex))
          Seq(Collection.DefaultIndex)
        else querySchema.fields
          .find(f => f.dataType == TimestampType || f.dataType == TimestampNTZType ||
            f.dataType == DateType)
          .map(f => Seq(f.name))
          .getOrElse(Seq(Collection.DefaultIndex)) // synthesized dense RangeIndex
    }
  }

  layoutOpt.foreach { l =>
    val head = indexCols.head
    querySchema.fields.find(_.name == head).foreach { f =>
      if (f.dataType != TimestampType && f.dataType != TimestampNTZType &&
          f.dataType != DateType)
        throw new ValidationError(
          s"layout '$l' partitions by time, but index column '$head' is " +
            s"${f.dataType.simpleString}: declare a timestamp/date index " +
            s"(TBLPROPERTIES('index'='<col>'))")
    }
  }

  val salt: Int =
    prop(SaltProp).map(_.trim.toInt).getOrElse(1)
  val statsCols: Seq[String] =
    prop(StatsProp)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  val npartitions: Option[Int] =
    prop(NPartsProp).map(_.trim.toInt)
  val userMeta: Map[String, Any] =
    tblProperties.asScala.toMap
      .filterNot { case (k, _) => StructuralProps.contains(k.toLowerCase) || isReserved(k) }

}

/** The CTAS/RTAS bridge: `CREATE TABLE cat.coll.item USING graft
  * TBLPROPERTIES(index='ts', layout='monthly') AS SELECT ...` maps to
  * [[graft.store.Collection.write]] — item birth IS a data write in
  * graft (reference collection.py:316-350), so the one SQL verb that
  * carries data gets the full typed pipeline: validation, index
  * defaulting, layout partitioning, atomic commit, sidecar metadata.
  * Bare `CREATE TABLE` (schema, no data) stays refused by the catalog.
  *
  * Write config comes from TBLPROPERTIES and/or `PARTITIONED BY`:
  *  - `index`      — comma-separated index column(s). Default: a column
  *    named `index` if the query has one, else the first
  *    timestamp/date column, else a synthesized dense RangeIndex
  *    (exactly the Scala write's defaulting).
  *  - `layout`     — daily/monthly/quarterly/yearly (default flat);
  *    `PARTITIONED BY (days|months|years(col))` implies both the
  *    layout and the index column and must agree with the properties.
  *  - `salt`       — per-period writer salt; `stats_cols` — per-period
  *    pruning stats; `npartitions` — flat-layout partition override.
  *  - every other non-reserved property → user metadata on the item.
  *
  * Commit protocol: the data write itself is atomic (tmp dir + rename
  * inside `Collection.write`); [[commitStagedChanges]] only releases
  * the pre-state pin. [[abortStagedChanges]] removes a created item
  * when the surrounding CTAS failed after the write landed, and for a
  * REPLACE over an existing item restores the PRE-write state: the
  * write pinned it in an internal `__txn_` manifest first (the T1
  * transaction mechanism — commit retention keeps the pinned
  * generation, restore renames it back, vacuum reclaims a crashed
  * pin), so a failed statement never keeps its replacement. */
final class GraftStagedTable private[sources] (
    spark: SparkSession,
    collectionPath: SPath,
    itemName: String,
    querySchema: StructType,
    partitions: Array[Transform],
    tblProperties: util.Map[String, String],
    mode: GraftStagedTable.Mode)
    extends StagedTable with SupportsWrite {

  import GraftStagedTable._

  private val cfg = new GraftTableConfig(querySchema, partitions, tblProperties)
  import cfg.{indexCols, layoutOpt, npartitions, salt, statsCols, userMeta}

  @volatile private var written = false

  // whether the target existed when the statement staged: a failed
  // CREATE OR REPLACE on a NONEXISTENT item must clean up its creation
  // like plain CREATE does (for an existing target the overwrite has
  // already swapped atomically — nothing to unwind)
  private val existedAtStage: Boolean =
    collectionPath.resolve(itemName).resolve(graft.store.Item.DataDir).isDir

  // --------------------------------------------------------- Table surface

  override def name(): String = s"graft.`${collectionPath.resolve(itemName)}`"
  override def schema(): StructType = querySchema
  override def partitioning(): Array[Transform] = partitions
  override def properties(): util.Map[String, String] = tblProperties
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** CTAS writes arrive as AppendData, RTAS as OverwriteByExpression
    * (truncate) — both verbs mean the same one-shot write here, the
    * mode decides the exists/overwrite contract. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation = new InsertableRelation {
          override def insert(data: DataFrame, overwrite: Boolean): Unit = doWrite(data)
        }
      }
    }

  // REPLACE over an existing item pins the pre-write state in an
  // internal `__txn_` manifest (the T1 transaction's own mechanism, so
  // vacuum reclaims a crashed one): the overwrite's commit then retains
  // the pinned generation by rename, and a failed statement's abort
  // restores it — a failed RTAS no longer keeps the replacement
  @volatile private var preReplacePin: Option[String] = None

  private def doWrite(data: DataFrame): Unit = {
    // collections are born on first use, like the Scala store.collection
    collectionPath.resolve(GraftStore.SnapshotsDir).mkdirs()
    val coll = Collection.at(spark, collectionPath)
    if (mode != GraftStagedTable.Create && existedAtStage && preReplacePin.isEmpty) {
      val pin = s"__txn_rtas_${System.nanoTime()}"
      graft.store.Snapshots.createManifest(collectionPath, pin, Seq(itemName))
      preReplacePin = Some(pin)
    }
    coll.write(itemName, data,
      indexCols = indexCols,
      metadata = userMeta,
      npartitions = npartitions,
      overwrite = mode != GraftStagedTable.Create,
      timeLayout = layoutOpt,
      monthlySalt = salt,
      statsColumns = statsCols)
    coll.clearMetadataCache(Some(itemName))
    written = true
  }

  /** A commit with no write means a SCHEMA-ONLY `REPLACE TABLE` (Spark
    * routes plain REPLACE through the staging catalog too) — refuse it
    * the same way bare CREATE is refused, BEFORE the old item would be
    * silently left in place under a statement that promised to replace
    * it. CTAS/RTAS always write (a zero-row SELECT still inserts). */
  override def commitStagedChanges(): Unit = {
    if (!written)
      throw new GraftError(
        "schema-only REPLACE TABLE is not supported: item state is data in " +
          "graft — use REPLACE TABLE ... AS SELECT")
    preReplacePin.foreach(dropPin) // success: release the pre-state pin
  }

  override def abortStagedChanges(): Unit = preReplacePin match {
    case Some(pin) =>
      // failed REPLACE: rename the pre-state back. Runs whether or not
      // the write landed (`written`) — the pin exists from write START,
      // and a write that failed before committing makes the restore a
      // no-op (generations still match); either way the pin must not
      // leak (a stale internal manifest would retain an extra
      // generation on every later overwrite until vacuum)
      val coll = Collection.at(spark, collectionPath)
      coll.withCommitLock {
        graft.store.Snapshots.restoreFromManifest(collectionPath, pin, itemName)
      }
      dropPin(pin)
      coll.clearMetadataCache(Some(itemName))
    case None if written && (mode == GraftStagedTable.Create ||
        (mode == GraftStagedTable.CreateOrReplace && !existedAtStage)) =>
      // failed CREATE (or C-OR-R on a fresh name): remove the birth
      val coll = Collection.at(spark, collectionPath)
      coll.deleteItem(itemName)
      coll.clearMetadataCache(Some(itemName))
    case None => ()
  }

  private def dropPin(pin: String): Unit =
    graft.store.Snapshots.releasePin(collectionPath, pin)
}
