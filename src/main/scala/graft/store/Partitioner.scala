package graft.store

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, DateType, LongType}

/** Physical-layout policy: how many output files / how rows are
  * distributed across them.
  *
  * Mirrors the reference's two strategies (pystore/partition.py):
  *  - size-based: `ceil(bytes / 128MB)` clamped to [1, maxPartitions]
  *    (partition.py:38-81; 128 MB target, min 32 / max 512 MB,
  *    config.py:25-26) — the same 128 MB that Spark's
  *    `spark.sql.files.maxPartitionBytes` defaults to, so write-side
  *    and read-side split sizes agree.
  *  - time-based: monthly (<1y span), quarterly (<3y), yearly
  *    (partition.py:84-172), picked automatically for datetime-indexed
  *    data with >10k rows (collection.py:272-301), falling back to
  *    size-based when it would exceed maxPartitions.
  *
  * Spark realization: `repartitionByRange(n, col(index))` +
  * `sortWithinPartitions(index)` — one shuffle that yields globally
  * range-ordered output like Dask divisions (SURVEY §2.7 D3), so every
  * part-file covers a disjoint index range and Parquet row-group
  * min/max stats give O(files-touched) time-range scans.
  *
  * Scale note (100 TB): range partitioning keeps time-locality so a
  * day/month query prunes to a few files; `repartitionByRange` samples
  * the index to compute balanced boundaries, which also absorbs skew.
  * At cluster scale the same policy applies per item with n in the
  * thousands; nothing here is driver-bound except the tiny size
  * estimate.
  */
object Partitioner {

  val TargetPartitionBytes: Long = 128L * 1024 * 1024
  val MinPartitionBytes: Long = 32L * 1024 * 1024
  val MaxPartitionBytes: Long = 512L * 1024 * 1024
  val MaxPartitions: Int = 100
  val TimePartitionMinRows: Long = 10000L

  sealed trait Strategy { def name: String }
  case object SizeBased extends Strategy { val name = "size" }
  case object TimeBased extends Strategy { val name = "time" }

  /** Estimated in-memory/serialized size of the frame WITHOUT
    * materializing it (the reference computes `memory_usage(deep)` which
    * forces a full compute — collection.py:438-445; we use Catalyst plan
    * statistics instead, which derive from file sizes + filter
    * selectivity).
    */
  def estimatedBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong

  def sizeBasedCount(bytes: Long): Int = {
    val n = math.ceil(bytes.toDouble / TargetPartitionBytes).toInt
    math.min(math.max(n, 1), MaxPartitions)
  }

  /** Index statistics driving the layout decision. Tracked in the item
    * metadata sidecar so APPEND can decide its layout from
    * driver-side arithmetic (old stats ⊕ new-batch stats) instead of
    * executing the combined dedup plan twice — at 100 TB the combined
    * plan is a full anti-join of the item, so a pre-pass over it doubles
    * the append cost. */
  final case class IndexStats(rows: Long, minMs: Option[Long], maxMs: Option[Long]) {
    def merge(other: IndexStats): IndexStats = IndexStats(
      rows + other.rows,
      (minMs ++ other.minMs).reduceOption(_ min _),
      (maxMs ++ other.maxMs).reduceOption(_ max _))
  }

  def isTemporal(df: DataFrame, indexCol: String): Boolean =
    df.schema.find(_.name == indexCol).exists { f =>
      f.dataType == TimestampType || f.dataType == TimestampNTZType ||
        f.dataType == DateType
    }

  /** Epoch millis from any temporal JVM value Spark hands back
    * (TIMESTAMP → java.sql.Timestamp, TIMESTAMP_NTZ → LocalDateTime,
    * DATE → java.sql.Date / LocalDate); NTZ wall time read as UTC. */
  def toEpochMs(v: Any): Long = v match {
    case t: java.sql.Timestamp          => t.getTime
    case ldt: java.time.LocalDateTime   => ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case d: java.sql.Date               => d.getTime
    case ld: java.time.LocalDate        => ld.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    case i: java.time.Instant           => i.toEpochMilli
    case other => throw new IllegalArgumentException(s"not a temporal value: $other")
  }

  /** One aggregate job: count + index min/max (input-only scan). */
  def computeStats(df: DataFrame, indexCol: String): IndexStats = {
    if (!isTemporal(df, indexCol)) IndexStats(df.count(), None, None)
    else {
      val row = df.agg(F.count(F.lit(1)), F.min(F.col(indexCol)), F.max(F.col(indexCol))).head()
      val lo = if (row.isNullAt(1)) None else Some(toEpochMs(row.get(1)))
      val hi = if (row.isNullAt(2)) None else Some(toEpochMs(row.get(2)))
      IndexStats(row.getLong(0), lo, hi)
    }
  }

  /** Partition count for the time strategy from the index span:
    * monthly if < 1 year, quarterly if < 3 years, else yearly
    * (reference partition.py:117-141). None if the index span is
    * unknown or the count would exceed MaxPartitions (fallback to
    * size-based, as the reference does at partition.py:143-151).
    */
  def timeBasedCount(stats: IndexStats): Option[Int] =
    if (stats.rows <= TimePartitionMinRows) None
    else (stats.minMs, stats.maxMs) match {
      case (Some(lo), Some(hi)) =>
        val spanDays = (hi - lo).toDouble / 86400000.0
        val n =
          if (spanDays < 365) math.ceil(spanDays / 30.0).toInt          // monthly
          else if (spanDays < 3 * 365) math.ceil(spanDays / 91.0).toInt // quarterly
          else math.ceil(spanDays / 365.0).toInt                        // yearly
        val clamped = math.max(n, 1)
        if (clamped > MaxPartitions) None else Some(clamped)
      case _ => None
    }

  /** Auto strategy (reference collection.py:272-301): time-series data
    * above the row threshold → time-based; otherwise size-based.
    * `bytes` comes from Catalyst plan statistics — no execution. */
  def decide(bytes: Long, stats: IndexStats): (Int, Strategy) =
    timeBasedCount(stats) match {
      case Some(n) => (n, TimeBased)
      case None    => (sizeBasedCount(bytes), SizeBased)
    }

  /** Apply a chosen layout: range-partition on the index and sort
    * within partitions so the on-disk files are globally index-ordered.
    */
  def apply(df: DataFrame, indexCols: Seq[String], n: Int): DataFrame = {
    val sortable = indexCols.filter(c => df.columns.contains(c))
    if (sortable.isEmpty) df.repartition(n)
    else df.repartitionByRange(n, sortable.map(F.col): _*)
      .sortWithinPartitions(sortable.map(F.col): _*)
  }
}
