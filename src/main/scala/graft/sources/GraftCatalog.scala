package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, StagedTable, StagingTableCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.{Collection, GraftError, GraftStore, HadoopFs, Item, NioFs, SPath}

/** Catalog plugin — the store as a SQL catalog, no per-item DDL.
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/mystore")
  *
  *   SHOW NAMESPACES IN graft                  -- collections
  *   SHOW TABLES IN graft.prices               -- items
  *   SELECT * FROM graft.prices.aapl WHERE index >= '2024-03-01'
  *   SELECT * FROM graft.prices.aapl VERSION AS OF 'eod_2024_03_01'
  * }}}
  *
  * Namespaces are collections, tables are items; `loadTable` serves the
  * same [[GraftTable]] the `graft` format resolves, so filter pushdown,
  * column pruning, and period-directory pruning are identical whether
  * the item was reached by path or by name. `VERSION AS OF` maps the
  * version string to a graft snapshot (dir or manifest — the pinned
  * periods flow through the scan's path selection).
  *
  * Scale note: catalog calls are driver-side directory listings only
  * (one `listDirs` per SHOW; `loadTable` reads one sidecar). Nothing
  * touches data files until a scan builds, so a 100k-item store costs
  * a SQL user exactly what it costs the Scala API user.
  *
  * DML works: `INSERT INTO graft.coll.item SELECT ...` routes through
  * the table's V1Write fallback into [[graft.store.Collection.append]]
  * (validation, duplicate handling, atomic commit — see
  * [[GraftWriteBuilder]]), and `INSERT OVERWRITE` truncate-rewrites via
  * `Collection.write`. The DDL lifecycle is complete as of round 9:
  * `CREATE TABLE` (bare → empty typed item, or AS SELECT through
  * [[GraftStagedTable]]), `DROP TABLE` → `Collection.deleteItem` with
  * pin retention, `ALTER TABLE ... RENAME TO` → `Collection.renameItem`
  * (refused while manifest-pinned), `CREATE/DROP NAMESPACE` →
  * collection birth/delete, plus the three METADATA-SAFE alters:
  * `ADD COLUMNS`, `DROP COLUMN(S)` (one sidecar write, zero data
  * files — see [[alterTable]]) and `SET/UNSET TBLPROPERTIES` (user
  * metadata only). Still refused typed: column renames/retypes (graft
  * maps columns by name — those need a rewriting migration) and
  * schema-only `REPLACE TABLE` (a statement that promises to replace
  * data must carry data).
  *
  * Transaction boundary: every SQL statement (INSERT / UPDATE / MERGE /
  * DELETE / CTAS / CALL) commits atomically PER STATEMENT, per item —
  * the same atomic-commit protocol the Scala API uses. There is no
  * cross-statement SQL transaction: a failed statement never rolls back
  * an earlier one (pinned by spec). Multi-statement atomicity is the
  * Scala `Collection.transaction` (T1) — queue several mutations, one
  * rollback point — which SQL sessions can reach by snapshotting first
  * (`CALL system.create_snapshot`) and restoring on failure.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {

  private var catalogName: String = _
  private var storePath: SPath = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val root = Option(options.get("root")).getOrElse(
      throw new GraftError(
        s"graft catalog '$name' requires spark.sql.catalog.$name.root=<store dir>"))
    val fs =
      if (root.contains(":/"))
        new HadoopFs(SparkSession.active.sessionState.newHadoopConf())
      else NioFs
    storePath = SPath(fs, root)
    if (!storePath.isDir)
      throw new GraftError(s"graft catalog root '$root' is not a directory")
  }

  override def name(): String = catalogName

  // ------------------------------------------------- namespaces = collections

  override def listNamespaces(): Array[Array[String]] =
    storePath.listDirs.filterNot(_ == GraftStore.SnapshotsDir)
      .sorted.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && collectionDir(namespace(0)).isDir

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  // ------------------------------------------------------- tables = items

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    // same visibility rule as Collection.items: hide the snapshots dir
    // and "__"-internal dirs (retained generations, txn pins)
    collectionDir(namespace(0)).listDirs
      .filterNot(d => d == GraftStore.SnapshotsDir || d.startsWith("__"))
      .sorted.map(Identifier.of(namespace, _)).toArray
  }

  /** Metadata projections (`item$periods`, ...) of a live item EXIST —
    * SELECT serves them, so existence checks must agree (DROP reaches
    * [[dropTable]]'s typed projection refusal instead of NOT_FOUND). */
  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && (
      itemDir(ident).resolve(Item.DataDir).isDir ||
        GraftMetadataTables.parse(ident.name).exists { case (item, _) =>
          collectionDir(ident.namespace.head).resolve(item)
            .resolve(Item.DataDir).isDir
        })

  override def loadTable(ident: Identifier): Table =
    load(ident, snapshot = None)

  /** `VERSION AS OF '<snapshot>'` — version strings are snapshot names.
    * Internal pin manifests (`__`-prefixed: transaction / RTAS) are
    * mid-statement state, hidden from listings and timestamp travel —
    * resolving them by name would expose it and race its release. */
  override def loadTable(ident: Identifier, version: String): Table = {
    graft.store.Snapshots.requireUserSnapshotName(version)
    load(ident, snapshot = Some(version))
  }

  /** `TIMESTAMP AS OF t` — EXACT resolution against the item's commit
    * log ([[graft.store.History]]; one entry per atomic commit, so the
    * state at t is the latest commit stamped ≤ t):
    *  - that commit's generation is still the LIVE one → serve the live
    *    table (no snapshot needed at all — `TIMESTAMP AS OF now` always
    *    works);
    *  - it was rewritten since → serve the latest USER manifest created
    *    while it was current (its pins are exactly the state at t);
    *  - no such manifest → refuse with the honest error naming what a
    *    snapshot before the rewriting commit would have kept.
    * Items whose log starts after t (pre-log writes, capped-out old
    * entries) fall back to the round-8 approximation: the latest
    * manifest whose CREATION stamp is ≤ t. `timestamp` arrives in
    * microseconds since the epoch per the V2 time-travel contract. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    val t = java.time.Instant.EPOCH.plus(timestamp, java.time.temporal.ChronoUnit.MICROS)
    graft.store.Snapshots.resolveAsOf(
        collectionDir(ident.namespace.head), ident.name, t) match {
      case graft.store.Snapshots.AsOfLive => load(ident, snapshot = None)
      case graft.store.Snapshots.AsOfSnapshot(snap) =>
        load(ident, snapshot = Some(snap))
    }
  }

  private def load(ident: Identifier, snapshot: Option[String]): Table = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    // `item$periods` / `item$stats` / `item$snapshots` — sidecar-backed
    // metadata tables (zero data listed or read); see GraftMetadataTables
    GraftMetadataTables.parse(ident.name) match {
      case Some((itemName, kind)) =>
        if (snapshot.isDefined)
          throw new GraftError(
            "metadata tables reflect LIVE state and do not support time travel " +
              s"(query the live table: SELECT * FROM ...`$itemName$$$kind`)")
        return GraftMetadataTables.load(collectionDir(ident.namespace.head), itemName, kind)
      case None =>
    }
    val item = itemDir(ident)
    // snapshot reads resolve even when the live item is gone (a manifest
    // outlives deletion until its pins are GC'd), so gate existence on
    // the live dir only for live loads
    if (snapshot.isEmpty && !item.resolve(Item.DataDir).isDir)
      throw new NoSuchTableException(ident)
    try GraftTable.resolveItem(SparkSession.active, item, snapshot)
    catch {
      case _: graft.store.ItemNotFoundError => throw new NoSuchTableException(ident)
    }
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  // ------------------------------------- procedures: maintenance via CALL

  /** Maintenance verbs live in the reserved `system` namespace (it can
    * never collide with a collection: `system` may exist as a
    * collection for tables, but procedure and table resolution are
    * separate paths). See [[GraftProcedures]]. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!ident.namespace.sameElements(Array("system")))
      throw new GraftError(
        s"graft procedures live in the 'system' namespace: " +
          s"CALL $catalogName.system.${ident.name}(...); got namespace " +
          s"'${ident.namespace.mkString(".")}'")
    GraftProcedures.load(ident.name, storePath).getOrElse(
      throw new GraftError(
        s"unknown graft procedure '${ident.name}' " +
          s"(available: ${GraftProcedures.names.mkString(", ")})"))
  }

  private def collectionDir(coll: String): SPath = storePath.resolve(coll)
  private def itemDir(ident: Identifier): SPath =
    collectionDir(ident.namespace.head).resolve(ident.name)

  // ------------------------------------- DDL: the full item lifecycle

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog does not support $op: use the typed Scala API for " +
        "structural changes it maps to. The SQL lifecycle covers CREATE " +
        "TABLE (empty or AS SELECT), INSERT, UPDATE, MERGE, DELETE, " +
        "TRUNCATE, DROP TABLE, RENAME, and CALL system.* maintenance")

  /** Bare `CREATE TABLE` (schema, no data) — an EMPTY typed item: the
    * declared schema, index, layout, and TBLPROPERTIES go through the
    * same [[graft.store.Collection.write]] pipeline CTAS uses (one
    * [[GraftTableConfig]] parses both), with a zero-row frame. The item
    * is immediately INSERT-able; reads serve the empty frame from the
    * sidecar-declared schema. The reference births items only with data
    * (collection.py:316-350) — this closes the migration-script shape
    * `CREATE TABLE` + `INSERT` that convention would otherwise break. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    requireNonMetadataName(ident.name)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val cfg = new GraftTableConfig(schema, partitions, properties)
    val spark = SparkSession.active
    val coll = collectionOf(ident)
    coll.write(ident.name,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      indexCols = cfg.indexCols,
      metadata = cfg.userMeta,
      npartitions = cfg.npartitions,
      timeLayout = cfg.layoutOpt,
      monthlySalt = cfg.salt,
      statsColumns = cfg.statsCols)
    coll.clearMetadataCache(Some(ident.name))
    loadTable(ident)
  }

  /** `DROP TABLE` → [[graft.store.Collection.deleteItem]] (reference
    * collection.py:158-171: delete_item is first-class) — WITH the
    * commit paths' pin retention: an item pinned by a manifest snapshot
    * has its pinned generations renamed into the retained area first,
    * so `VERSION AS OF` and rollback keep working after the drop.
    * Returns false when the table doesn't exist (the `IF EXISTS`
    * contract). */
  override def dropTable(ident: Identifier): Boolean = {
    if (ident.namespace.length != 1) return false
    GraftMetadataTables.parse(ident.name).foreach { case (itemName, kind) =>
      throw new GraftError(
        s"'${ident.name}' is the '$$$kind' metadata-table projection of item " +
          s"'$itemName', not an item — DROP the item itself")
    }
    if (!tableExists(ident)) return false
    val coll = collectionOf(ident)
    coll.deleteItem(ident.name)
    coll.clearMetadataCache(Some(ident.name))
    true
  }

  /** `ALTER TABLE ... RENAME TO` → [[graft.store.Collection.renameItem]]
    * — one directory rename; manifest snapshots FOLLOW it (their item
    * entries re-key, so `VERSION AS OF` and rollback resolve the
    * pre-rename generations under the new name; see renameItem). Cross-
    * collection moves are refused: collections are physical directories
    * and a cross-namespace rename is a data migration, not a rename. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (oldIdent.namespace.length != 1 || !tableExists(oldIdent))
      throw new NoSuchTableException(oldIdent)
    if (!newIdent.namespace.sameElements(oldIdent.namespace))
      throw new GraftError(
        s"RENAME cannot move '${oldIdent.name}' from collection " +
          s"'${oldIdent.namespace.mkString(".")}' to " +
          s"'${newIdent.namespace.mkString(".")}': collections are physical " +
          "directories — CREATE TABLE ... AS SELECT into the target instead")
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    requireNonMetadataName(newIdent.name)
    val coll = collectionOf(oldIdent)
    coll.renameItem(oldIdent.name, newIdent.name)
    coll.clearMetadataCache(None)
  }

  private def requireNonMetadataName(name: String): Unit =
    GraftMetadataTables.parse(name).foreach { case (_, kind) =>
      throw new GraftError(
        s"item name '$name' collides with the reserved metadata-table " +
          s"suffix '$$$kind' (${GraftMetadataTables.Kinds.toSeq.sorted.mkString(", ")}); " +
          "pick a name without a '$<kind>' suffix")
    }

  private def collectionOf(ident: Identifier): Collection = {
    // collections are born on first use, like the Scala store.collection
    collectionDir(ident.namespace.head).resolve(GraftStore.SnapshotsDir).mkdirs()
    Collection.at(SparkSession.active, collectionDir(ident.namespace.head))
  }

  // ----------------------------- CTAS / RTAS: the staged write pipeline

  /** `CREATE TABLE ... AS SELECT` — the one DDL verb that CARRIES DATA,
    * so it maps to the typed write pipeline ([[GraftStagedTable]] →
    * `Collection.write`) instead of being refused like schema-only DDL.
    * `REPLACE ... AS SELECT` is the overwrite arm. Spark routes CTAS
    * here (and never to [[createTable]]) because the catalog stages. */
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    requireNonMetadataName(ident.name) // before exists: a projection
                                       // "existing" must not read as a
                                       // name collision
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    staged(ident, schema, partitions, properties, GraftStagedTable.Create)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable = {
    requireNonMetadataName(ident.name)
    if (ident.namespace.length != 1 || !tableExists(ident))
      throw new NoSuchTableException(ident)
    staged(ident, schema, partitions, properties, GraftStagedTable.Replace)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): StagedTable = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    requireNonMetadataName(ident.name)
    staged(ident, schema, partitions, properties, GraftStagedTable.CreateOrReplace)
  }

  private def staged(ident: Identifier, schema: StructType,
                     partitions: Array[Transform],
                     properties: util.Map[String, String],
                     mode: GraftStagedTable.Mode): StagedTable = {
    // a `$`-suffixed name would be shadowed by the metadata-table
    // resolution in load() forever after — the item could be written
    // but never read back from SQL. Refuse at analysis.
    GraftMetadataTables.parse(ident.name).foreach { case (_, kind) =>
      throw new GraftError(
        s"item name '${ident.name}' collides with the reserved metadata-table " +
          s"suffix '$$$kind' (${GraftMetadataTables.Kinds.toSeq.sorted.mkString(", ")}); " +
          "pick a name without a '$<kind>' suffix")
    }
    new GraftStagedTable(SparkSession.active, collectionDir(ident.namespace.head),
      ident.name, schema, partitions, properties, mode)
  }

  /** `ALTER TABLE ... ADD COLUMNS` — metadata-only widening through
    * [[graft.store.Collection.addColumns]] (one sidecar write, zero
    * data files touched; existing rows read as typed NULLs) —
    * `ALTER TABLE ... DROP COLUMN(S)` — metadata-only masking through
    * [[graft.store.Collection.dropColumns]] (the dropped name leaves
    * the declared schema in one sidecar write; the bytes are never
    * requested again; re-adding the name later pays a one-time purge
    * rewrite so it returns fresh, see there) — and `SET/UNSET
    * TBLPROPERTIES` — user-metadata updates through
    * [[graft.store.Collection.setItemProperties]] (structural keys
    * refused) — and `RENAME COLUMN`, a STAGED ATOMIC REWRITE through
    * [[graft.store.Collection.renameColumn]] (graft maps columns by
    * NAME, so a rename must rewrite every part-file footer; the E5
    * migration machinery + one atomic commit). Retype/reorder refuse
    * typed: those need a user-written rewriting migration
    * (`SchemaEvolution.MigrationRegistry`), not DDL. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val sets = changes.collect { case s: TableChange.SetProperty => s }
    val unsets = changes.collect { case u: TableChange.RemoveProperty => u }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (adds.size + drops.size + sets.size + unsets.size + renames.size
        != changes.size) {
      val other = changes.filterNot(c => c.isInstanceOf[TableChange.AddColumn] ||
        c.isInstanceOf[TableChange.DeleteColumn] ||
        c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty] ||
        c.isInstanceOf[TableChange.RenameColumn]).head
      readOnly(s"ALTER TABLE ${other.getClass.getSimpleName} " +
        "(ADD COLUMNS, DROP COLUMN and SET/UNSET TBLPROPERTIES are " +
        "metadata-only; RENAME COLUMN is a staged atomic rewrite; " +
        "retypes/reorders need a rewriting migration)")
    }
    renames.foreach { r =>
      if (r.fieldNames.length != 1)
        throw new GraftError(
          s"ALTER TABLE RENAME COLUMN: only top-level columns can be " +
            s"renamed, got nested '${r.fieldNames.mkString(".")}'")
    }
    drops.foreach { d =>
      if (d.fieldNames.length != 1)
        throw new GraftError(
          s"ALTER TABLE DROP COLUMN: only top-level columns can be dropped, " +
            s"got nested '${d.fieldNames.mkString(".")}'")
    }
    adds.foreach { a =>
      if (a.fieldNames.length != 1)
        throw new GraftError(
          s"ALTER TABLE ADD COLUMNS: only top-level columns can be added, " +
            s"got nested '${a.fieldNames.mkString(".")}'")
      if (a.position() != null)
        throw new GraftError(
          "ALTER TABLE ADD COLUMNS: FIRST/AFTER positions are not supported " +
            "(added columns append at the end of the schema)")
      if (a.defaultValue() != null)
        throw new GraftError(
          "ALTER TABLE ADD COLUMNS: DEFAULT values are not supported " +
            "(existing rows read the added column as NULL)")
    }
    val coll = Collection.at(SparkSession.active,
      collectionDir(ident.namespace.head))
    if (adds.nonEmpty)
      coll.addColumns(ident.name, adds.map(a => org.apache.spark.sql.types
        .StructField(a.fieldNames()(0), a.dataType(), a.isNullable())))
    if (drops.nonEmpty)
      // `DROP COLUMN IF EXISTS` names pass through as LENIENT: absence
      // is decided inside dropColumns, under the same locked meta read
      // that applies the mask (an existence pre-check out here would
      // race a concurrent DDL and cost a table load per name)
      coll.dropColumns(ident.name, drops.map(_.fieldNames()(0)),
        lenient = drops.filter(_.ifExists()).map(_.fieldNames()(0)).toSet)
    if (sets.nonEmpty || unsets.nonEmpty)
      coll.setItemProperties(ident.name,
        sets.map(s => s.property() -> s.value()).toMap,
        unsets.map(_.property()))
    // last: a rename rewrites data, so metadata-only changes in the
    // same statement land first and ride the rewrite
    renames.foreach(r =>
      coll.renameColumn(ident.name, r.fieldNames()(0), r.newName()))
    loadTable(ident)
  }
  /** `CREATE NAMESPACE` → `store.collection()` — one directory (plus
    * the `_snapshots` dir), the same birth the Scala API performs.
    * Namespace properties are refused (collections carry no metadata;
    * Spark-reserved keys like `comment`/`owner` are ignored). */
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespace.length != 1)
      throw new GraftError(
        s"graft namespaces are single-level collections, got " +
          s"'${namespace.mkString(".")}'")
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NamespaceAlreadyExistsException(namespace)
    val user = {
      import scala.jdk.CollectionConverters._
      metadata.asScala.keys.filterNot(k =>
        Set("comment", "owner", "location").contains(k.toLowerCase))
    }
    if (user.nonEmpty)
      throw new GraftError(
        s"graft collections carry no namespace properties (got " +
          s"${user.toSeq.sorted.mkString(", ")}); put metadata on items " +
          "via TBLPROPERTIES")
    collectionDir(namespace(0)).resolve(GraftStore.SnapshotsDir).mkdirs()
  }

  /** `DROP NAMESPACE` → `store.deleteCollection()`. Without CASCADE the
    * collection must hold no items (snapshots alone don't block — they
    * die with the collection, like the Scala delete). */
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    if (!cascade && listTables(namespace).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace)
    collectionDir(namespace(0)).deleteRecursively()
    true
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    readOnly("ALTER NAMESPACE (collections carry no namespace properties)")
}
