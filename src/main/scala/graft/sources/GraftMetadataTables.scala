package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.store.{Collection, GraftError, GraftStore, Item, Meta, SPath, Snapshots}

/** Metadata tables — `SELECT * FROM cat.coll.item$<kind>` — the
  * lakehouse-convention introspection surface (Iceberg's
  * `table$snapshots`, Delta's DESCRIBE DETAIL): item state as queryable
  * SQL rows, computed ENTIRELY from sidecar/manifest metadata. No data
  * file is listed or read at any item size — a `$periods` query on a
  * 100 TB item is one small JSON read.
  *
  *  - `item$periods`   — (period, generation): the live period →
  *    generation map that drives CDC, streaming offsets and time
  *    travel; flat items report the whole item under the reserved
  *    `__item` key (the CDC convention).
  *  - `item$stats`     — (period, column, min_value, max_value): the
  *    per-period pruning stats the partial-commit paths maintain —
  *    the zero-data answer to "which months would this predicate
  *    scan?". Bounds are rendered as strings (numeric/temporal stats
  *    record doubles, string stats record lexicographic bounds).
  *  - `item$snapshots` — (snapshot, kind, created_at): collection
  *    snapshots visible from this item; manifest snapshots carry their
  *    UTC creation stamp (the `TIMESTAMP AS OF` anchor), dir snapshots
  *    a null stamp.
  *  - `item$detail`    — one-row summary (layout, index, period count,
  *    generation, last-update stamp): the `DESCRIBE DETAIL` convention.
  *  - `item$history`   — (op, generation, periods, committed_at): the
  *    per-item commit log ([[graft.store.History]], one row per atomic
  *    commit, newest last) — the `DESCRIBE HISTORY` convention and the
  *    anchor for snapshot-free `TIMESTAMP AS OF`. Serves the FULL
  *    horizon: entries the sidecar cap evicted are merged back from
  *    the item's spill area (read only when the sidecar is at cap).
  *  - `item$bloom`     — (column, current, fpp, expected_items_per_file,
  *    num_files): bloom data-skipping index state per indexed column;
  *    `current = false` means a commit retired it (reads stay correct,
  *    unpruned) until the next build or incremental refresh.
  *  - `item$filestats` — (column, current, num_files, null_aware,
  *    total_nulls): the per-file
  *    MIN/MAX data-skipping index's state, same currency contract.
  *
  * Reference: pystore exposes metadata only as Python dicts
  * (collection.py:116-147); this is beyond-parity surface following
  * the modern table-format convention.
  */
private[sources] object GraftMetadataTables {

  // single source of truth with the write-path name guard
  val Kinds: Set[String] = Collection.ReservedItemSuffixes

  /** Split `name$kind`; None when the name has no metadata suffix. */
  def parse(name: String): Option[(String, String)] = {
    val i = name.lastIndexOf('$')
    if (i <= 0 || i == name.length - 1) None
    else {
      val kind = name.substring(i + 1).toLowerCase
      if (Kinds.contains(kind)) Some((name.substring(0, i), kind)) else None
    }
  }

  private def str(s: String): UTF8String = UTF8String.fromString(s)

  def load(collectionPath: SPath, itemName: String, kind: String): Table = {
    val itemPath = collectionPath.resolve(itemName)
    def requireItem(): Map[String, org.json4s.JsonAST.JValue] = {
      if (!itemPath.resolve(Item.DataDir).isDir)
        throw new GraftError(
          s"metadata table: item '$itemName' does not exist in " +
            s"collection '${collectionPath.name}'")
      Meta.read(itemPath)
    }
    kind match {
      case "periods" =>
        val meta = requireItem()
        val pg = Snapshots.periodGensOf(meta)
        val rows =
          if (pg.nonEmpty)
            pg.toSeq.sortBy(_._1).map { case (p, g) =>
              new GenericInternalRow(Array[Any](str(p), g))
            }
          else Seq(new GenericInternalRow(
            Array[Any](str(Snapshots.WholeItemKey), Snapshots.generationOf(meta))))
        new MetaTable(s"$itemName$$periods", StructType(Seq(
          StructField("period", StringType, nullable = false),
          StructField("generation", LongType, nullable = false))), rows)

      case "stats" =>
        val meta = requireItem()
        val rows = Collection.periodStatsOf(meta).toSeq.sortBy(_._1).flatMap {
          case (period, cols) => cols.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
            new GenericInternalRow(Array[Any](
              str(period), str(c), str(String.valueOf(mn)), str(String.valueOf(mx))))
          }
        }
        new MetaTable(s"$itemName$$stats", StructType(Seq(
          StructField("period", StringType, nullable = false),
          StructField("column", StringType, nullable = false),
          StructField("min_value", StringType, nullable = false),
          StructField("max_value", StringType, nullable = false))), rows)

      case "snapshots" =>
        requireItem() // anchor the listing to a real item, typed otherwise
        val dirSnaps = collectionPath.resolve(GraftStore.SnapshotsDir).listDirs
          .filterNot(_.startsWith(".")).filterNot(_.startsWith("__"))
        val manifests = Snapshots.listManifests(collectionPath)
          .filterNot(_.startsWith("__"))
        val rows =
          (manifests.map { s =>
            val created = Snapshots.manifestCreatedAt(collectionPath, s)
              .map(i => Long.box(i.getEpochSecond * 1000000L + i.getNano / 1000))
              .orNull
            new GenericInternalRow(Array[Any](str(s), str("manifest"), created))
          } ++ dirSnaps.filterNot(manifests.contains).map { s =>
            new GenericInternalRow(Array[Any](str(s), str("dir"), null))
          }).sortBy(_.getUTF8String(0).toString)
        new MetaTable(s"$itemName$$snapshots", StructType(Seq(
          StructField("snapshot", StringType, nullable = false),
          StructField("kind", StringType, nullable = false),
          StructField("created_at", TimestampType, nullable = true))), rows)

      case "detail" =>
        // DESCRIBE DETAIL-style one-row summary (Delta convention)
        val meta = requireItem()
        val layout = meta.get("_layout").map(j => Meta.unjv(j).toString)
          .filter(Collection.TimeLayouts.contains)
        val index = meta.get("index_names").map(j => Meta.unjv(j) match {
          case s: Seq[_] => s.mkString(",")
          case v => String.valueOf(v)
        }).getOrElse(Collection.DefaultIndex)
        val pg = Snapshots.periodGensOf(meta)
        val updated = meta.get("_updated").map(j => Meta.unjv(j).toString).orNull
        val row = new GenericInternalRow(Array[Any](
          str(itemName),
          str(layout.getOrElse("flat")),
          str(index),
          if (pg.nonEmpty) pg.size.toLong else 1L,
          Snapshots.generationOf(meta),
          if (updated == null) null else str(updated)))
        new MetaTable(s"$itemName$$detail", StructType(Seq(
          StructField("item", StringType, nullable = false),
          StructField("layout", StringType, nullable = false),
          StructField("index", StringType, nullable = false),
          StructField("num_periods", LongType, nullable = false),
          StructField("generation", LongType, nullable = false),
          StructField("updated_at", StringType, nullable = true))), Seq(row))

      case "history" =>
        val meta = requireItem()
        // The sidecar log is CAPPED; a high-churn item evicts its
        // oldest entries to the spill area. DESCRIBE HISTORY must not
        // silently truncate the horizon, so merge the spill in — but
        // only when the sidecar is at its cap (eviction can't have
        // happened below it), so ordinary items pay zero extra reads.
        val sidecarLog = graft.store.History.entriesOf(meta)
        val log =
          if (sidecarLog.size < graft.store.History.MaxEntries) sidecarLog
          else graft.store.History.fullLog(itemPath, sidecarLog)
        val rows = log.map { e =>
          new GenericInternalRow(Array[Any](
            str(e.op),
            e.gen,
            if (e.periods.isEmpty) null else str(e.periods.mkString(",")),
            e.at.getEpochSecond * 1000000L + e.at.getNano / 1000L))
        }
        new MetaTable(s"$itemName$$history", StructType(Seq(
          StructField("op", StringType, nullable = false),
          StructField("generation", LongType, nullable = false),
          StructField("periods", StringType, nullable = true),
          StructField("committed_at", TimestampType, nullable = false))), rows)

      case "bloom" =>
        // bloom data-skipping index state: one row per indexed column;
        // `current` says whether the index's generation matches the
        // item's committed one (false = retired — readable but unpruned
        // until the next build or incremental refresh). num_shards is 0
        // for the single-document layout, else the shard-document count
        // of the auto-sharded layout (BloomIndex.SingleDocMaxBytes).
        // last_parse_ms/parsed_bytes report what the most recent COLD
        // document parses cost the driver (summed over shards) — the
        // planning-time number whose probe evidence justified sharding;
        // sustained growth now means a HOT shard (more splits), never a
        // format ceiling.
        val meta = requireItem()
        val committed = Snapshots.generationOf(meta)
        val rows = graft.store.BloomIndex.sidecarStates(itemPath).map {
          case (c, gen, fpp, expected, n, shards) =>
            val (ms, bytes) = graft.store.BloomIndex
              .lastParseCost(itemPath, c).getOrElse((-1L, -1L))
            new GenericInternalRow(Array[Any](
              str(c), gen == committed, fpp, expected, n.toLong,
              shards.toLong, ms, bytes))
        }
        new MetaTable(s"$itemName$$bloom", StructType(Seq(
          StructField("column", StringType, nullable = false),
          StructField("current", BooleanType, nullable = false),
          StructField("fpp", DoubleType, nullable = false),
          StructField("expected_items_per_file", LongType, nullable = false),
          StructField("num_files", LongType, nullable = false),
          StructField("num_shards", LongType, nullable = false),
          StructField("last_parse_ms", LongType, nullable = false),
          StructField("parsed_bytes", LongType, nullable = false))), rows)

      case "filestats" =>
        // min/max data-skipping index state: one row per indexed column
        val meta = requireItem()
        val committed = Snapshots.generationOf(meta)
        val rows = graft.store.FileStatsIndex.sidecarStates(itemPath).map {
          case (c, gen, n, nullAware, totalNulls) =>
            new GenericInternalRow(Array[Any](
              str(c), gen == committed, n.toLong, nullAware, totalNulls))
        }
        new MetaTable(s"$itemName$$filestats", StructType(Seq(
          StructField("column", StringType, nullable = false),
          StructField("current", BooleanType, nullable = false),
          StructField("num_files", LongType, nullable = false),
          StructField("null_aware", BooleanType, nullable = false),
          StructField("total_nulls", LongType, nullable = false))), rows)

      case other => throw new GraftError(
        s"unknown metadata table '$$$other' (supported: ${Kinds.toSeq.sorted.mkString(", ")})")
    }
  }

  /** Read-only driver-side table: the rows were computed from sidecar
    * metadata at load time; LocalScan keeps Spark from planning any
    * distributed work for them. */
  private final class MetaTable(tableName: String, tableSchema: StructType,
                                metaRows: Seq[InternalRow])
      extends Table with SupportsRead {
    private val materialized: Array[InternalRow] = metaRows.toArray
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def rows(): Array[InternalRow] = materialized
          override def readSchema(): StructType = tableSchema
          override def description(): String = s"GraftMetadata($tableName)"
        }
      }
  }
}
