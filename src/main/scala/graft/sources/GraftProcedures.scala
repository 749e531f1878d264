package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.store.{Collection, GraftError, GraftStore, SPath}

/** SQL maintenance surface — `CALL graft.system.<proc>(...)`.
  *
  * The catalog plugin makes items *readable/writable* from SQL; this
  * makes them *operable*: every store-maintenance verb the Scala API
  * has (snapshots, retention expiry, compaction, layout conversion,
  * z-order, vacuum) becomes a stored procedure on the same catalog, so
  * a SQL-only user can run the full operational lifecycle —
  *
  * {{{
  *   CALL graft.system.create_snapshot(collection => 'prices', name => 'eod')
  *   CALL graft.system.expire_before('prices', 'ticks', TIMESTAMP'2020-01-01')
  *   CALL graft.system.compact('prices', 'ticks', max_files => 100)
  *   CALL graft.system.convert_layout('prices', 'ticks', layout => 'monthly')
  *   CALL graft.system.vacuum('prices')
  *   SHOW PROCEDURES IN graft.system
  * }}}
  *
  * Each procedure delegates to the corresponding [[Collection]] method
  * — the SAME code path the Scala API runs, so atomic commits, snapshot
  * retention, typed validation errors, and the snapshot/commit
  * coordination lock all hold identically. Results come back as one
  * small driver-side result set ([[LocalScan]]); the heavy lifting
  * (a rebalance's partitioned rewrite, an expiry's boundary-period
  * scan) is a distributed Spark job exactly as in the Scala path.
  *
  * Scale note: procedures add no execution machinery of their own —
  * `expire_before` on a 100 TB monthly item still removes whole
  * periods by directory name and rewrites only the boundary period.
  * The driver-side result rows are O(periods touched), never O(data).
  *
  * Reference: pystore exposes these verbs only as Python methods
  * (collection.py: create_snapshot 522, delete_snapshot 550,
  * list_snapshots 545; no SQL surface exists there at all) — this is
  * beyond-parity surface area, mirroring the `CALL` convention of
  * modern lakehouse table formats.
  */
private[sources] object GraftProcedures {

  import ProcedureParameter.in

  /** One procedure: declared params, fixed result schema, driver body.
    * Bodies receive the store (rooted at the catalog's `root`) and the
    * coerced argument row (parameter order). */
  private final case class ProcDef(
      name: String,
      description: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      body: (GraftStore, InternalRow) => Seq[InternalRow])

  // ------------------------------------------------------- helpers

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
  private def optStr(r: InternalRow, i: Int): Option[String] =
    if (r.isNullAt(i)) None else Some(str(r, i))
  private def optInt(r: InternalRow, i: Int): Option[Int] =
    if (r.isNullAt(i)) None else Some(r.getInt(i))
  private def optBool(r: InternalRow, i: Int): Option[Boolean] =
    if (r.isNullAt(i)) None else Some(r.getBoolean(i))

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.map {
      case s: String => UTF8String.fromString(s)
      case other     => other.asInstanceOf[AnyRef]
    }.toArray[Any])

  /** Procedures operate on EXISTING collections only — `collection()`
    * on the store would create the snapshots dir as a side effect, so
    * a typo'd name must fail typed instead. */
  private def existing(store: GraftStore, coll: String): Collection = {
    if (!store.path.resolve(coll).isDir)
      throw new GraftError(
        s"collection '$coll' does not exist in store '${store.path.raw}'")
    store.collection(coll)
  }

  // ------------------------------------------------------- procedures

  private val defs: Seq[ProcDef] = Seq(
    ProcDef(
      "create_snapshot",
      "Consistent point-in-time snapshot of a collection (all items)",
      Array(
        in("collection", StringType).build(),
        in("name", StringType).defaultValue("NULL")
          .comment("snapshot name; generated if NULL").build(),
        in("manifest", BooleanType).defaultValue("NULL")
          .comment("force manifest (true) / dir (false) snapshot; backend default if NULL")
          .build()),
      StructType(Seq(StructField("snapshot", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        Seq(row(c.createSnapshot(optStr(args, 1), optBool(args, 2))))
      }),

    ProcDef(
      "delete_snapshot",
      "Delete a named snapshot (lenient on missing names, per reference)",
      Array(in("collection", StringType).build(), in("name", StringType).build()),
      StructType(Seq(StructField("deleted", BooleanType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        Seq(row(Boolean.box(c.deleteSnapshot(str(args, 1)))))
      }),

    ProcDef(
      "expire_snapshots",
      "Age-based retention: drop manifest snapshots created before the " +
        "cutoff; newly-unreferenced retained generations GC'd in one sweep",
      Array(
        in("collection", StringType).build(),
        in("older_than", TimestampType).build(),
        in("dry_run", BooleanType).defaultValue("false")
          .comment("report what would expire without deleting").build()),
      StructType(Seq(
        StructField("snapshot", StringType, nullable = false),
        StructField("created_at", TimestampType, nullable = true),
        StructField("action", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cutoff = DateTimeUtils.microsToInstant(args.getLong(1))
        c.expireSnapshots(cutoff,
          dryRun = optBool(args, 2).getOrElse(false)).map {
          case (snap, at, action) => row(snap,
            at.map(i => Long.box(DateTimeUtils.instantToMicros(i))).orNull,
            action)
        }
      }),

    ProcDef(
      "list_snapshots",
      "List snapshot names of a collection (one row per snapshot)",
      Array(in("collection", StringType).build()),
      StructType(Seq(StructField("snapshot", StringType, nullable = false))),
      (store, args) =>
        existing(store, str(args, 0)).listSnapshots().map(row(_))),

    ProcDef(
      "expire_before",
      "Retention expiry: drop rows with index < cutoff; whole periods removed by name",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cutoff", TimestampType).build()),
      StructType(Seq(
        StructField("removed_periods", IntegerType, nullable = false),
        StructField("boundary_rows_deleted", LongType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val res = c.expireBefore(str(args, 1),
          DateTimeUtils.toJavaTimestamp(args.getLong(2)))
        Seq(row(Int.box(res.removedPeriods.size), Long.box(res.boundaryDeleted)))
      }),

    ProcDef(
      "compact",
      "Compact an item iff its file count exceeds max_files (no-op otherwise)",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("max_files", IntegerType).build(),
        in("npartitions", IntegerType).defaultValue("NULL")
          .comment("target partition count for the rewrite (flat items only)").build()),
      StructType(Seq(StructField("compacted", BooleanType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        Seq(row(Boolean.box(
          c.compactIfFragmented(str(args, 1), args.getInt(2), optInt(args, 3)))))
      }),

    ProcDef(
      "rebalance",
      "Rewrite an item into balanced partitions (time layouts re-lay through their periods)",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("npartitions", IntegerType).defaultValue("NULL").build()),
      StructType(Seq(StructField("files", IntegerType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        Seq(row(Int.box(c.rebalance(str(args, 1), optInt(args, 2)))))
      }),

    ProcDef(
      "zorder",
      "Z-order a flat item on the given columns (comma-separated) for multi-column skipping",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cols", StringType).comment("comma-separated column names").build(),
        in("bits", IntegerType).defaultValue("16").build()),
      StructType(Seq(StructField("done", BooleanType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cols = str(args, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        c.rebalanceZOrder(str(args, 1), cols, args.getInt(3))
        Seq(row(Boolean.box(true)))
      }),

    ProcDef(
      "convert_layout",
      "Convert an item between flat and time layouts in place (atomic, metadata preserved)",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("layout", StringType).defaultValue("'flat'")
          .comment("flat | daily | monthly | quarterly | yearly").build(),
        in("monthly_salt", IntegerType).defaultValue("1").build()),
      StructType(Seq(StructField("layout", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val target = str(args, 2)
        c.convertLayout(str(args, 1),
          if (target == "flat") None else Some(target), args.getInt(3))
        Seq(row(target))
      }),

    ProcDef(
      "list_changes",
      "Periods changed since a manifest snapshot: added | rewritten | removed " +
        "(flat items report the whole item under the reserved '__item' key)",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("snapshot", StringType).build()),
      StructType(Seq(
        StructField("period", StringType, nullable = false),
        StructField("change", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val item = str(args, 1); val snap = str(args, 2)
        graft.store.Snapshots.requireUserSnapshotName(snap)
        val itemPath = c.path.resolve(item)
        if (!itemPath.resolve(graft.store.Item.DataDir).isDir)
          throw new GraftError(s"item '$item' does not exist in collection '${str(args, 0)}'")
        val pins = graft.store.Snapshots.manifestPins(c.path, snap, item).getOrElse(
          throw new GraftError(
            s"list_changes requires a manifest snapshot containing item '$item'; " +
              s"'$snap' is missing, a directory snapshot, or lacks the item"))
        val liveMeta = graft.store.Meta.read(itemPath)
        val liveIsTime = liveMeta.get("_layout")
          .map(j => graft.store.Meta.unjv(j).toString)
          .exists(Collection.TimeLayouts.contains)
        graft.store.Snapshots.classifyChanges(pins, liveMeta, liveIsTime)
          .map { case (p, kind) => row(p, kind) }
      }),

    ProcDef(
      "analyze",
      "Declare per-period pruning stats columns on an existing time-layout item " +
        "and backfill them with one pruned column scan (empty cols clears)",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cols", StringType)
          .comment("comma-separated stats columns; '' clears the declaration")
          .build()),
      StructType(Seq(StructField("periods_with_stats", IntegerType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cols = str(args, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Seq(row(Int.box(c.analyzeItem(str(args, 1), cols))))
      }),

    ProcDef(
      "rollback_to",
      "Restore a collection to the state pinned by a manifest snapshot " +
        "(savepoint rollback); items created after the cut are removed",
      Array(
        in("collection", StringType).build(),
        in("snapshot", StringType).build(),
        in("keep_snapshot", BooleanType).defaultValue("true")
          .comment("keep the savepoint for repeated rollback; false drops it after restore")
          .build(),
        in("item", StringType).defaultValue("NULL")
          .comment("restore only this item (partial restore keeps the savepoint)")
          .build()),
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("action", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        c.rollbackTo(str(args, 1),
            keepSnapshot = optBool(args, 2).getOrElse(true),
            items = optStr(args, 3).toSeq)
          .toSeq.sortBy(_._1).map { case (it, action) => row(it, action) }
      }),

    ProcDef(
      "vacuum",
      "Reclaim crashed tmp/backup/staging dirs and stale transaction pins",
      Array(in("collection", StringType).build()),
      StructType(Seq(StructField("reclaimed", StringType, nullable = false))),
      (store, args) =>
        existing(store, str(args, 0)).vacuum().map(row(_))),

    ProcDef(
      "multiprocess",
      "Switch a collection's cross-process writer protection (durable " +
        "marker: every process opening it takes per-item locks + fenced " +
        "commits); enable BEFORE starting concurrent writer processes",
      Array(
        in("collection", StringType).build(),
        in("enabled", BooleanType).build()),
      StructType(Seq(StructField("multiprocess", BooleanType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        if (args.getBoolean(1)) c.enableMultiprocess() else c.disableMultiprocess()
        Seq(row(Boolean.box(c.multiprocessEnabled)))
      }),

    ProcDef(
      "break_item_locks",
      "ADMIN: clear per-item writer locks leaked by crashed multiprocess " +
        "writers (the crash itself is repaired by vacuum); run only when " +
        "no writer process is live",
      Array(in("collection", StringType).build()),
      StructType(Seq(StructField("cleared", StringType, nullable = false))),
      (store, args) =>
        existing(store, str(args, 0)).breakItemLocks().map(row(_))),

    ProcDef(
      "build_bloom_index",
      "Build (or rebuild) a per-file bloom data-skipping index on the " +
        "given columns; equality/IN reads then skip files whose bloom " +
        "says definitely-absent. Any later commit silently retires it " +
        "until the next build",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cols", StringType).comment("comma-separated column names").build(),
        in("fpp", DoubleType).defaultValue("0.01").build(),
        in("expected_items_per_file", LongType).defaultValue("100000").build()),
      StructType(Seq(StructField("indexed", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cols = str(args, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        c.buildBloomIndex(str(args, 1), cols, args.getDouble(3), args.getLong(4))
        cols.map(row(_))
      }),

    ProcDef(
      "drop_bloom_index",
      "Drop bloom index sidecars from an item ('' or NULL cols = every " +
        "indexed column); returns the columns whose index was removed",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cols", StringType).defaultValue("NULL")
          .comment("comma-separated column names; NULL/'' drops all").build()),
      StructType(Seq(StructField("dropped", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cols = optStr(args, 2).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        c.dropBloomIndex(str(args, 1), cols).map(row(_))
      }),

    ProcDef(
      "build_file_stats_index",
      "Build (or rebuild) a per-file MIN/MAX data-skipping index on " +
        "the given columns — the range complement to the bloom index; " +
        "range/equality reads then skip files whose interval cannot " +
        "hold a match. Any later commit silently retires it (partial " +
        "commits refresh it) until the next build",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cols", StringType).comment("comma-separated column names").build()),
      StructType(Seq(StructField("indexed", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cols = str(args, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        c.buildFileStatsIndex(str(args, 1), cols)
        cols.map(row(_))
      }),

    ProcDef(
      "drop_file_stats_index",
      "Drop file-stats index sidecars from an item ('' or NULL cols = " +
        "every indexed column); returns the columns whose index was removed",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build(),
        in("cols", StringType).defaultValue("NULL")
          .comment("comma-separated column names; NULL/'' drops all").build()),
      StructType(Seq(StructField("dropped", StringType, nullable = false))),
      (store, args) => {
        val c = existing(store, str(args, 0))
        val cols = optStr(args, 2).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        c.dropFileStatsIndex(str(args, 1), cols).map(row(_))
      }),

    ProcDef(
      "advise_indexes",
      "Skip-index advisor: measures per-file interval separation, " +
        "cardinality shape, and null fraction on the item's CURRENT " +
        "layout, and classifies each supported column as " +
        "filestats / bloom / none with the reason; advisory only — " +
        "builds nothing",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build()),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("advice", StringType, nullable = false),
        StructField("file_overlap", DoubleType, nullable = false),
        StructField("distinct_ratio", DoubleType, nullable = false),
        StructField("null_frac", DoubleType, nullable = false),
        StructField("reason", StringType, nullable = false))),
      (store, args) =>
        existing(store, str(args, 0)).adviseIndexes(str(args, 1)).map(a =>
          row(a.column, a.advice, Double.box(a.fileOverlap),
            Double.box(a.distinctRatio), Double.box(a.nullFrac), a.reason))),

    ProcDef(
      "rebuild_indexes",
      "Rebuild every skip-index sidecar present on an item (bloom AND " +
        "file-stats) from its own recorded knobs, keyed to the current " +
        "committed generation — the re-arm after maintenance rewrites " +
        "(rebalance / z-order / convert_layout / overwrite), which " +
        "retire the indexes by moving the generation; returns the " +
        "rebuilt columns",
      Array(
        in("collection", StringType).build(),
        in("item", StringType).build()),
      StructType(Seq(StructField("rebuilt", StringType, nullable = false))),
      (store, args) =>
        existing(store, str(args, 0)).rebuildIndexes(str(args, 1)).map(row(_))),

    ProcDef(
      "export_pystore",
      "Export the whole store in the pystore reference on-disk layout " +
        "(part.N.parquet + pystore_metadata.json per item; snapshots " +
        "optionally in _snapshots/<name>/<item>) so stock pystore 1.0.1 " +
        "can open it",
      Array(
        in("dest", StringType).comment("local destination datastore dir").build(),
        in("overwrite", BooleanType).defaultValue("false").build(),
        in("snapshots", BooleanType).defaultValue("false")
          .comment("also export every snapshot's frozen cut").build()),
      StructType(Seq(StructField("exported", StringType, nullable = false))),
      (store, args) =>
        store.exportPystore(java.nio.file.Paths.get(str(args, 0)),
          optBool(args, 1).getOrElse(false), optBool(args, 2).getOrElse(false))
          .map(row(_))),

    ProcDef(
      "import_pystore",
      "Import a pystore reference-layout store (every collection/item, " +
        "snapshots optionally as native directory snapshots)",
      Array(
        in("src", StringType).comment("local source datastore dir").build(),
        in("index_col", StringType).defaultValue("NULL")
          .comment("index column; default 'index' (synthesized when absent)")
          .build(),
        in("overwrite", BooleanType).defaultValue("false").build(),
        in("snapshots", BooleanType).defaultValue("false")
          .comment("also import _snapshots/<name> copytrees").build()),
      StructType(Seq(StructField("imported", StringType, nullable = false))),
      (store, args) =>
        store.importPystore(java.nio.file.Paths.get(str(args, 0)),
          optStr(args, 1).map(Seq(_)).getOrElse(Seq(Collection.DefaultIndex)),
          optBool(args, 2).getOrElse(false), optBool(args, 3).getOrElse(false))
          .map(row(_)))
  )

  private val byName: Map[String, ProcDef] = defs.map(d => d.name -> d).toMap

  def names: Seq[String] = defs.map(_.name)

  def load(name: String, storePath: SPath): Option[UnboundProcedure] =
    byName.get(name).map(new GraftProcedure(_, storePath))

  /** Unbound+bound in one: binding is trivial because every parameter
    * is declared IN with a fixed Catalyst type — Spark's
    * ProcedureArgumentCoercion casts arguments to these types and
    * BindProcedures reorders named arguments, so `call` always sees
    * the declared positional layout. */
  private final class GraftProcedure(d: ProcDef, storePath: SPath)
      extends UnboundProcedure with BoundProcedure {

    override def name(): String = d.name
    override def description(): String = d.description
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = d.params
    // mutates store state; must never be re-invoked speculatively
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = new GraftStore(SparkSession.active, storePath)
      val out = d.body(store, input).toArray
      util.Collections.singletonList[Scan](
        new ProcedureResultScan(d.resultSchema, out)).iterator()
    }
  }

  private final class ProcedureResultScan(schema: StructType,
                                          out: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = schema
    override def description(): String = s"GraftProcedureResult${schema.simpleString}"
  }
}
