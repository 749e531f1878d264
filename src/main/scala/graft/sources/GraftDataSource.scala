package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, In => CIn, LessThan => CLt, LessThanOrEqual => CLte, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.{Collection, GraftError, HadoopFs, Item, ItemNotFoundError, Meta, NioFs, SPath}

/** DataSource V2 front door — the SQL face of the store.
  *
  * The reference's pitch is "hand the caller a lazy frame for arbitrary
  * downstream computation" (reference pystore/item.py:64-65,
  * README.rst:128); in a Spark-native engine the idiomatic analogue is
  * a `TableProvider`, so items are reachable from ANY Spark surface,
  * not just the Scala `Collection` API:
  *
  * {{{
  *   spark.read.format("graft").load("/store/collection/item")
  *   CREATE TABLE prices USING graft OPTIONS (path '/store/coll/item');
  *   SELECT ... FROM prices WHERE index >= '2024-03-01'
  * }}}
  *
  * Scale design — the same two prunings the Scala read path has, now
  * driven by Catalyst's V2 pushdown instead of caller-supplied tuples:
  *
  *  - **Period pruning as PATH SELECTION**: pushed index-column
  *    predicates map to a period-key interval (period keys are
  *    zero-padded and lexically chronological), and only the surviving
  *    period DIRECTORIES are listed into the file index — on a 100 TB
  *    item a one-month query never even lists the other months' files,
  *    let alone reads them. `_period_stats` intervals additionally
  *    prune on covered non-index numeric columns (absent stats keep
  *    the period — conservative, like the delete path).
  *  - **Parquet pushdown + column pruning**: the scan delegates to
  *    Spark's own vectorized `ParquetScan` (whole-stage codegen, row-
  *    group stat skipping), with pushed filters and the pruned read
  *    schema forwarded — the plan shows `PushedFilters` / `ReadSchema`
  *    exactly like a native parquet read.
  *
  * The hidden `__month` partition column never surfaces: period dirs
  * are passed as independent roots, so SQL users see the item's
  * logical (encoded) schema only.
  *
  * Scope: batch READ (the mutation surface — append semantics,
  * validation, atomic commit — stays behind the typed Scala API where
  * its invariants live; a blind SQL INSERT could not honor them).
  * Snapshots are likewise served by the Scala API (`item(name,
  * snapshot=...)`), not this provider.
  */
final class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.resolve(options).schema()

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    GraftTable.resolve(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object GraftTable {

  /** Resolve the `path` option to an item directory: sidecar metadata,
    * layout, and the ENCODED schema (what the part-files hold — sidecar
    * `schema_json_encoded` when present, else one parquet footer
    * inference). Driver-side metadata only; no data read. */
  private[graft] def resolve(options: CaseInsensitiveStringMap): GraftTable = {
    val spark = SparkSession.active
    val pathOpt = Option(options.get("path")).getOrElse(
      throw new GraftError("graft datasource requires a path option: " +
        "spark.read.format(\"graft\").load(\"<store>/<collection>/<item>\")"))
    val fs = if (pathOpt.contains(":/")) new HadoopFs(spark.sessionState.newHadoopConf())
             else NioFs
    val itemPath = SPath(fs, pathOpt)
    val dataDir = itemPath.resolve(Item.DataDir)
    if (!dataDir.isDir)
      throw new ItemNotFoundError(s"no graft item at $pathOpt (missing ${Item.DataDir}/ dir)")
    val meta = Meta.read(itemPath)
    val layout = meta.get("_layout").map(j => Meta.unjv(j).toString)
      .filter(Collection.TimeLayouts.contains)
    val indexCol = meta.get("index_names").map(Meta.unjv) match {
      case Some(xs: Seq[_]) if xs.nonEmpty => xs.head.toString
      case _ => Collection.DefaultIndex
    }
    val layoutTz = meta.get("_layout_tz").map(j => Meta.unjv(j).toString)
      .getOrElse(spark.sessionState.conf.sessionLocalTimeZone)
    val schema = meta.get("schema_json_encoded") match {
      case Some(org.json4s.JString(sj)) =>
        // parquet reads surface every column nullable; serve the same
        Item.asNullable(DataType.fromJson(sj)).asInstanceOf[StructType]
      case _ =>
        // pre-encoded-sidecar item: infer once from the footers (and
        // drop the hidden partition column a time layout would surface)
        val inferred = spark.read.parquet(dataDir.toString).schema
        StructType(inferred.filterNot(_.name == Collection.MonthCol))
    }
    new GraftTable(spark, itemPath, schema, layout, indexCol,
      java.time.ZoneId.of(layoutTz), Collection.periodStatsOf(meta))
  }
}

final class GraftTable private[sources] (
    spark: SparkSession,
    itemPath: SPath,
    tableSchema: StructType,
    layout: Option[String],
    indexCol: String,
    layoutTz: java.time.ZoneId,
    periodStats: Map[String, Map[String, (Any, Any)]])
    extends Table with SupportsRead {

  override def name(): String = s"graft.`$itemPath`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, itemPath, tableSchema, layout, indexCol,
      layoutTz, periodStats, options)
}

/** V2 scan builder: collects Catalyst's pushed filters + required
  * columns, then builds a vectorized `ParquetScan` over ONLY the period
  * directories the filters can touch. */
final class GraftScanBuilder(
    spark: SparkSession,
    itemPath: SPath,
    tableSchema: StructType,
    layout: Option[String],
    indexCol: String,
    layoutTz: java.time.ZoneId,
    periodStats: Map[String, Map[String, (Any, Any)]],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep the parquet-convertible shapes for row-group skipping; hand
    // EVERYTHING back as residual (row-group stats are approximate, so
    // Spark must re-evaluate post-scan — same contract as native parquet)
    pushed = filters.filter(parquetSupported)
    filters
  }

  private def parquetSupported(f: Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.EqualNullSafe | _: sources.GreaterThan |
         _: sources.GreaterThanOrEqual | _: sources.LessThan |
         _: sources.LessThanOrEqual | _: sources.In | _: sources.IsNull |
         _: sources.IsNotNull | _: sources.StringStartsWith |
         _: sources.StringEndsWith | _: sources.StringContains => true
    case sources.And(l, r) => parquetSupported(l) && parquetSupported(r)
    case sources.Or(l, r)  => parquetSupported(l) && parquetSupported(r)
    case sources.Not(c)    => parquetSupported(c)
    case _ => false
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Translate a pushed source filter to the catalyst shape
    * [[Collection.candidatePeriods]] walks. Only conjunctive
    * range/equality/IN constraints contribute; anything else becomes
    * `true` (no constraint) — the period set only ever
    * over-approximates. `Literal.create` round-trips external values
    * (Timestamp/LocalDateTime/Date/numbers) into the typed literals
    * the walker's period/stats extraction expects. */
  private def toCatalyst(f: Filter): Expression = f match {
    case sources.And(l, r)               => CAnd(toCatalyst(l), toCatalyst(r))
    case sources.EqualTo(a, v)           => CEq(UnresolvedAttribute(a), Literal.create(v))
    case sources.EqualNullSafe(a, v)     => CEq(UnresolvedAttribute(a), Literal.create(v))
    case sources.GreaterThan(a, v)       => CGt(UnresolvedAttribute(a), Literal.create(v))
    case sources.GreaterThanOrEqual(a, v) => CGte(UnresolvedAttribute(a), Literal.create(v))
    case sources.LessThan(a, v)          => CLt(UnresolvedAttribute(a), Literal.create(v))
    case sources.LessThanOrEqual(a, v)   => CLte(UnresolvedAttribute(a), Literal.create(v))
    case sources.In(a, vs) if vs.nonEmpty && !vs.contains(null) =>
      CIn(UnresolvedAttribute(a), vs.toSeq.map(Literal.create(_)))
    case _ => Literal.TrueLiteral
  }

  override def build(): Scan = {
    val dataDir = itemPath.resolve(Item.DataDir)
    // period pruning = path selection: nothing outside the surviving
    // periods is even LISTED into the file index
    val roots: Seq[String] = layout match {
      case None => Seq(dataDir.toString)
      case Some(l) =>
        val all = dataDir.listDirs
          .filter(_.startsWith(Collection.MonthCol + "="))
          .map(_.stripPrefix(Collection.MonthCol + "="))
        val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
        // period keys live in the writer's recorded zone: a mismatched
        // session forfeits pruning (reads stay correct), same rule as
        // the delete discovery scan
        val cands =
          if (layoutTz != java.time.ZoneId.of(sessionTz)) all.sorted
          else {
            val cond = pushed.map(toCatalyst)
              .reduceOption(CAnd(_, _)).getOrElse(Literal.TrueLiteral)
            Collection.candidatePeriods(all, cond, indexCol, l, layoutTz, periodStats)
          }
        cands.map(p => dataDir.resolve(s"${Collection.MonthCol}=$p").toString)
    }
    val fileIndex = new InMemoryFileIndex(
      spark, roots.map(new HPath(_)), options.asScala.toMap, Some(tableSchema))
    ParquetScan(
      spark,
      spark.sessionState.newHadoopConfWithOptions(options.asScala.toMap),
      fileIndex,
      dataSchema = tableSchema,
      readDataSchema = required,
      readPartitionSchema = new StructType(),
      pushedFilters = pushed,
      options = options)
  }
}
