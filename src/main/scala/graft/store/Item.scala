package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.JValue

object Item {
  /** Subdir of the item dir holding the parquet part-files — kept
    * separate from the JSON sidecar so the dataset dir is pure parquet. */
  val DataDir = "data"

  /** Parquet reads surface every column nullable; sidecar-schema
    * fallbacks (emptied items, the V2 table provider) must serve the
    * same shape or unions/comparisons against real reads break. */
  private[graft] def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: org.apache.spark.sql.types.StructType =>
      org.apache.spark.sql.types.StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }
}

/** A stored item: a lazy DataFrame over one Parquet dataset directory
  * plus its JSON metadata sidecar (reference: pystore/item.py:36-100).
  *
  * `data` is the analogue of the reference's lazy Dask handle
  * (item.py:64-65) — a declarative plan with the filters/columns folded
  * in, so Catalyst pushes the predicates and pruning into the Parquet
  * scan. Materialization only happens at normal Spark actions; there is
  * no eager `to_pandas` copy (SURVEY §3.2).
  */
final class Item private[store] (
    val spark: SparkSession,
    val collectionPath: SPath,
    val name: String,
    val snapshot: Option[String],
    filters: Seq[Filters.Pred],
    columns: Seq[String]) {

  /** Resolved item location + (for manifest snapshots) the sidecar
    * frozen at snapshot time: a snapshot name resolves to a physical
    * snapshot dir (link/copy snapshots and legacy-frozen items), or
    * through the manifest — flat items to the live dir (generation
    * unchanged) / retained generation dir, time-layout items to one
    * parquet dir per pinned period (live or retained per period). */
  private val resolved: (SPath, Option[Snapshots.Resolved]) = snapshot match {
    case None => (collectionPath.resolve(name), None)
    case Some(snap) =>
      Snapshots.requireUserSnapshotName(snap)
      val snapDir = collectionPath.resolve(GraftStore.SnapshotsDir).resolve(snap)
      val hasManifest = Snapshots.manifestExists(collectionPath, snap)
      if (!snapDir.isDir && !hasManifest)
        throw new SnapshotNotFoundError(s"snapshot '$snap' does not exist")
      val dirItem = snapDir.resolve(name)
      if (dirItem.isDir) (dirItem, None)
      else Snapshots.resolveManifestItem(collectionPath, snap, name) match {
        case Some(r: Snapshots.FlatResolved) => (r.dir, Some(r))
        case Some(r: Snapshots.PeriodResolved) =>
          (collectionPath.resolve(name), Some(r))
        case None =>
          throw new ItemNotFoundError(s"item '$name' not found in snapshot '$snap'")
      }
  }

  val path: SPath = resolved._1

  private def periodResolved: Option[Snapshots.PeriodResolved] =
    resolved._2.collect { case p: Snapshots.PeriodResolved => p }

  periodResolved match {
    case Some(p) =>
      p.periodDirs.find(!_._2.isDir).foreach { case (period, d) =>
        throw new StorageError(
          s"snapshot period '$period' of item '$name' missing at $d")
      }
    case None =>
      if (!path.isDir)
        throw new ItemNotFoundError(s"item '$name' does not exist")
  }

  lazy val metadata: Map[String, JValue] =
    resolved._2.map(_.sidecar).getOrElse(Meta.read(path))

  /** Whether this read resolves (any of) the LIVE item's directories.
    * A live read, or a manifest pin whose generation is still current
    * (no retained copy exists until something replaces it), can race a
    * concurrent commit's swap and must be generation-fenced by callers
    * that need one-committed-state semantics (export). A read fully
    * resolved to a physical snapshot dir or to `.retained` generation
    * dirs is immutable — fencing it against the live generation would
    * spuriously refuse under a sustained writer. */
  private[graft] def touchesLiveDir: Boolean =
    snapshot.isEmpty || (resolved._2 match {
      case None => false // physical dir snapshot — re-rooted copy
      case Some(r) =>
        val liveRoot = collectionPath.resolve(name).raw
        def live(p: SPath) = p.raw == liveRoot || p.raw.startsWith(liveRoot + "/")
        r match {
          case f: Snapshots.FlatResolved   => live(f.dir)
          case p: Snapshots.PeriodResolved => p.periodDirs.exists(d => live(d._2))
        }
    })

  /** Index column names recorded at write (default Seq("index")). */
  def indexCols: Seq[String] = metadata.get("index_names") match {
    case Some(j) => Meta.unjv(j) match {
      case xs: Seq[_] if xs.nonEmpty => xs.map(_.toString)
      case _ => Seq(Collection.DefaultIndex)
    }
    case None => Seq(Collection.DefaultIndex)
  }

  private def timeLayout: Option[String] =
    metadata.get("_layout").map(j => Meta.unjv(j).toString)
      .filter(Collection.TimeLayouts.contains)

  /** Zone the period keys were derived in at write time (sidecar);
    * falls back to the reading session's zone for items written before
    * the zone was recorded. */
  private def layoutZone: java.time.ZoneId =
    java.time.ZoneId.of(
      metadata.get("_layout_tz").map(j => Meta.unjv(j).toString)
        .getOrElse(spark.sessionState.conf.sessionLocalTimeZone))

  private def isMonthly: Boolean = timeLayout.isDefined

  /** For time-layout items, translate index-column time predicates
    * into predicates on the hidden period partition column so Catalyst
    * partition pruning skips whole period DIRECTORIES (string compare
    * works because every period key format is zero-padded and
    * lexically ordered). */
  private def monthPruning: Option[org.apache.spark.sql.Column] = {
    val layout = timeLayout.getOrElse(return None)
    val mc = col(Collection.MonthCol)
    val preds = filters.filter(_.column == indexCols.head).flatMap { p =>
      Collection.periodOfValue(layout, p.value, layoutZone).map { m =>
        p.op match {
          case "==" | "="        => mc === m
          case ">" | ">="        => mc >= m
          case "<" | "<="        => mc <= m
          case _                 => lit(true)
        }
      }
    }
    preds.reduceOption(_ && _)
  }

  /** Period dirs of a manifest-snapshot time item, pruned DRIVER-side
    * by the same index-time predicates `monthPruning` derives — with
    * per-period paths, partition pruning becomes path selection. */
  private def prunedPeriodDirs(pr: Snapshots.PeriodResolved): Seq[(String, SPath)] = {
    val all = pr.periodDirs
    val layout = timeLayout.getOrElse(return all)
    val constraints = filters.filter(_.column == indexCols.head).flatMap { pred =>
      Collection.periodOfValue(layout, pred.value, layoutZone).map(m => (pred.op, m))
    }
    val kept = all.filter { case (p, _) =>
      constraints.forall {
        case ("==" | "=", m) => p == m
        case (">" | ">=", m) => p >= m
        case ("<" | "<=", m) => p <= m
        case _               => true
      }
    }
    // over-pruned to nothing → read everything; the row filters below
    // still produce the correct (empty) result with the right schema
    if (kept.isEmpty) all else kept
  }

  /** The lazy, pushdown-planned scan, plus whether the emptied-item
    * fallback had to serve the legacy PRE-encode `schema_json` (older
    * sidecars only): that schema is already in decoded/logical types,
    * so [[dataRestored]] must skip marker inversion for it. */
  private lazy val dataWithFallbackKind: (DataFrame, Boolean) = {
    var preEncodeFallback = false
    val base = periodResolved match {
      case Some(pr) =>
        // manifest time-layout snapshot: union of live + retained
        // period dirs (no partition column — pruning happened above).
        // The read is pinned to the sidecar schema FROZEN IN THE
        // MANIFEST, same as the live branch below: a pin can mix
        // generations (live dirs evolved after the cut, retained dirs
        // from before it), and footer inference over that mix would
        // resolve an arbitrary file's shape. The frozen sidecar is the
        // snapshot's declared contract — identical to what the SQL
        // `VERSION AS OF` path serves via GraftTable.fromMeta.
        val frozen: Option[org.apache.spark.sql.types.StructType] =
          pr.sidecar.get("schema_json_encoded").collect {
            case org.json4s.JString(sj) =>
              Item.asNullable(org.apache.spark.sql.types.DataType.fromJson(sj))
                .asInstanceOf[org.apache.spark.sql.types.StructType]
          }
        val reader = frozen.fold(spark.read)(spark.read.schema)
        val keptPairs = prunedPeriodDirs(pr)
        // skip-index pruning for the pinned file set: a LIVE-root
        // sidecar recorded at EXACTLY the pin's generation describes
        // exactly these files — live dirs for untouched periods,
        // retained dirs (whole-dir renames, names preserved) for the
        // rest. Keys are built from the PAIR's period name because a
        // retained dir's on-disk path no longer carries `__month=`.
        val pinKept: Option[Seq[String]] = frozen.flatMap { enc =>
          // one LIST of the live item root answers "any skip index on
          // the predicate columns?" before any per-column sidecar stat
          // — the overwhelmingly common no-index case stays one call
          if (!SkipIndexes.anyIndexed(Seq(collectionPath.resolve(name)),
              filters.map(_.column).distinct)) None
          else {
            lazy val fileMap = SkipIndexes.pinnedFileMap(keptPairs)
            SkipIndexes.prunedKeys(
              collectionPath.resolve(name), () => fileMap.keys.toSeq,
              filters, pr.sidecar, enc,
              Some(Snapshots.generationOf(pr.sidecar)))
              .map(_.flatMap(fileMap.get))
          }
        }
        pinKept match {
          case Some(files) if files.isEmpty =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], frozen.get)
          case Some(files) => reader.parquet(files: _*)
          case None        => reader.parquet(keptPairs.map(_._2.toString): _*)
        }
      case None =>
        val dataDir = path.resolve(Item.DataDir)
        // The sidecar's ENCODED schema (when present) is authoritative
        // and pins the read: mixed part-file generations (a column
        // ALTER-added or evolution-appended after older files were
        // written) all read against the declared shape, with absent
        // columns null-filled per file by the parquet reader — no
        // mergeSchema multi-footer pass, and ALTER ADD COLUMN stays a
        // pure metadata operation. The period partition column is
        // pinned to STRING (period keys are zero-padded and lexically
        // chronological, so string pruning compares correctly in every
        // layout). Legacy pre-encode sidecars keep footer inference.
        val declared: Option[org.apache.spark.sql.types.StructType] =
          metadata.get("schema_json_encoded").collect {
            case org.json4s.JString(sj) =>
              Item.asNullable(org.apache.spark.sql.types.DataType.fromJson(sj))
                .asInstanceOf[org.apache.spark.sql.types.StructType]
          }
        try {
          val reader = declared match {
            case Some(enc) =>
              val readSchema =
                if (!isMonthly) enc
                else org.apache.spark.sql.types.StructType(enc.fields :+
                  org.apache.spark.sql.types.StructField(
                    Collection.MonthCol, org.apache.spark.sql.types.StringType))
              spark.read.schema(readSchema)
            case None => spark.read
          }
          // Skip-index file pruning (BloomIndex + FileStatsIndex):
          // equality predicates drop files whose bloom says
          // definitely-absent; range/equality predicates drop files
          // whose min/max interval can't hold a match — driver-side
          // path selection, same class as the period-dir pruning
          // above, and the two INTERSECT. Applies only when an index
          // is generation-current; anything uncertain reads the whole
          // dir exactly as before. Declared-schema items only (the
          // literal must hash/order against the stored type).
          val bloomKept: Option[Seq[String]] = declared.flatMap { enc =>
            // one LIST per sidecar root (the item root; plus the live
            // root for a snapshot read) answers "any skip index on the
            // predicate columns?" BEFORE any per-column sidecar stat —
            // almost every item has no index, and this runs on every
            // filtered read
            val sidecarRoots = path +:
              (if (snapshot.isEmpty) Nil
               else Seq(collectionPath.resolve(name)))
            if (!SkipIndexes.anyIndexed(
                sidecarRoots, filters.map(_.column).distinct)) None
            else {
              // one listing serves BOTH prune attempts: the orElse
              // fallback would otherwise re-LIST the same dataDir
              // (None can mean "consulted a sidecar but didn't shrink",
              // not only "no usable sidecar")
              val once = SkipIndexes.listOnce(dataDir)
              SkipIndexes.prunedKeys(path, once, filters, metadata, enc,
                  generation = None)
                .orElse {
                  // pinned read (dir snapshot / retained flat dir):
                  // retention and snapshots never carry the index
                  // sidecars aside, but the LIVE item root's sidecar
                  // applies iff recorded at EXACTLY the pin's frozen
                  // generation — it then describes exactly these files
                  // (whole-dir renames / hardlinks preserve names)
                  if (snapshot.isEmpty) None
                  else SkipIndexes.prunedKeys(
                    collectionPath.resolve(name), once, filters, metadata,
                    enc, Some(Snapshots.generationOf(metadata)))
                }
            }
          }
          bloomKept match {
            case Some(kept) if kept.isEmpty =>
              // every file is definitely value-free: zero-file scan
              // with the typed shape (MonthCol never surfaces, so the
              // monthly post-processing below has nothing to do)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                declared.get)
            case other =>
              val raw = other match {
                case Some(kept) =>
                  // basePath keeps the period partition column derivable
                  // from the explicit file paths on time-layout items
                  reader.option("basePath", dataDir.toString)
                    .parquet(kept.map(f => dataDir.resolve(f).toString): _*)
                case None => reader.parquet(dataDir.toString)
              }
              if (!isMonthly) raw
              else monthPruning.fold(raw)(raw.filter).drop(Collection.MonthCol)
          }
        } catch {
          // a deleteWhere/expiry can legitimately empty EVERY period of
          // a time-layout item: zero files means nothing to infer a
          // schema from, but the sidecar recorded it — serve the typed
          // empty frame. Catch-then-fallback keeps the happy path free
          // of an extra recursive listing (which object stores charge
          // for at item scale).
          // a sidecar with NO data directory is a torn item (an
          // interrupted operation on a crashed process) — name the
          // repair instead of surfacing a raw path error
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" && metadata.nonEmpty =>
            throw new GraftError(
              s"item '$name' has a metadata sidecar but no data directory — " +
                "an interrupted operation left it torn; run " +
                "Collection.vacuum() (SQL: CALL <catalog>.system.vacuum) " +
                s"to repair, then retry (${e.getMessage})")
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
            // prefer the ENCODED schema (what the part-files held — the
            // same types a non-empty read serves, so restoration below
            // behaves identically); legacy sidecars recorded only the
            // pre-encode logical schema — serve it but flag that
            // restoration must be skipped (its types are already decoded)
            val encoded = metadata.get("schema_json_encoded")
            val legacy = metadata.get("schema_json")
            encoded.orElse { preEncodeFallback = legacy.isDefined; legacy } match {
              case Some(org.json4s.JString(sj)) =>
                spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  Item.asNullable(org.apache.spark.sql.types.DataType.fromJson(sj))
                    .asInstanceOf[org.apache.spark.sql.types.StructType])
              case _ => throw e
            }
        }
    }
    val filtered = Filters.toColumn(filters).fold(base)(base.filter)
    val projected =
      if (columns.isEmpty) filtered
      else {
        // Projection always retains the index columns, like the reference
        // (the pandas index survives column selection).
        val keep = (indexCols ++ columns).distinct.filter(filtered.columns.contains)
        filtered.select(keep.map(col): _*)
      }
    (projected, preEncodeFallback)
  }

  /** The lazy, pushdown-planned scan. */
  lazy val data: DataFrame = dataWithFallbackKind._1

  /** First n rows in index order (reference item.py:96-98). */
  def head(n: Int = 5): DataFrame =
    data.orderBy(indexCols.map(col): _*).limit(n)

  /** Last n rows in index order (reference item.py:99-100). Planned as
    * TakeOrderedAndProject on the reversed sort — no full sort. */
  def tail(n: Int = 5): DataFrame =
    data.orderBy(indexCols.map(c => col(c).desc): _*).limit(n)
      .orderBy(indexCols.map(col): _*)

  /** Index-only scan (reference collection.py:149-156). Column pruning
    * means the Parquet reader touches only the index column's pages. */
  def index: DataFrame = data.select(indexCols.map(col): _*)

  /** The frame with read-side type restoration applied: epochdate
    * int64-ns indexes come back as (µs-truncated) timestamps, and any
    * `_type_info` markers are inverted (tz restore etc.). Replaces the
    * reference's read-side datetime HEURISTIC (item.py:82-93 guesses
    * from value magnitudes) with metadata-driven determinism. */
  lazy val dataRestored: DataFrame =
    // legacy pre-encode fallback schema is already in decoded types:
    // inverting epochdate/_type_info markers on it would double-decode
    if (dataWithFallbackKind._2) data
    else {
      val epoch = metadata.get("_epochdate").exists(j => Meta.unjv(j) == true)
      val base =
        if (!epoch) data
        else indexCols.foldLeft(data) { (d, c) =>
          if (d.schema(c).dataType == org.apache.spark.sql.types.LongType)
            d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
          else d
        }
      metadata.get("_type_info") match {
        case Some(j) => Codecs.restore(base, Codecs.markersFromMeta(j))
        case None    => base
      }
    }

  /** Per-column data-card stats over this item (count/nulls/min/max/
    * sum/p50/p95) — `graft.operators.Profiler` against the item's lazy,
    * pruned scan. `approx = true` swaps exact percentiles for the
    * single-pass GK sketch (the at-scale default). */
  def profile(cols: Seq[String], approx: Boolean = false): DataFrame =
    graft.operators.Profiler.numericProfile(data, cols, approx)

  /** Categorical data-card stats (count/nulls/distinct/bounds/mode)
    * over the item's pruned scan; `approxDistinct = true` is the HLL
    * at-scale default. */
  def profileCategorical(cols: Seq[String],
                         approxDistinct: Boolean = false): DataFrame =
    graft.operators.Profiler.categoricalProfile(data, cols, approxDistinct)

  /** Max index value — replaces the reference's repr-string parsing hack
    * for `last=True` (collection.py:153-156) with a real aggregate. */
  def lastIndex: Option[Any] = {
    val row = data.agg(max(col(indexCols.head))).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }
}
