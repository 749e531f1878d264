package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join.
  *
  * Spark has no native range-join optimization: a join whose ONLY
  * predicate is `start ≤ ts ≤ end` plans as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) work and a broadcast of a whole side, the
  * classic at-scale killer. The standard fix (used by every
  * range-join-capable engine) is binning: quantize time into
  * fixed-width buckets, explode each interval to the buckets it covers,
  * map each point to its single bucket, equi-join on the bucket id, and
  * apply the exact range predicate after. Each (point, interval) match
  * surfaces exactly once — a point lives in exactly one bucket — so no
  * dedup pass is needed. Shuffle volume: |points| + Σ⌈span/width⌉ rows
  * with uniform keys; pick `bucketWidth` near the typical interval span
  * so intervals explode to ~2 buckets.
  *
  * With `equiKeys` (e.g. user-scoped intervals) the bucket id simply
  * extends the key — the join stays an equi-join either way, and AQE
  * handles residual skew.
  */
object RangeJoin {

  /** Inner-join `points` rows (timestamp `tsCol`) to `intervals` rows
    * ([`startCol`, `endCol`] inclusive), optionally also matching on
    * `equiKeys`. Timestamp columns must be TimestampType; `bucketWidth`
    * is in seconds. */
  def pointInInterval(points: DataFrame,
                      intervals: DataFrame,
                      tsCol: String,
                      startCol: String,
                      endCol: String,
                      equiKeys: Seq[String] = Nil,
                      bucketWidth: Long = 3600L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = bucketWidth * 1000000L // µs
    val p = points.withColumn("__bucket", floor(unix_micros(col(tsCol)) / w))
    val i = intervals.withColumn("__bucket", explode(sequence(
      floor(unix_micros(col(startCol)) / w),
      floor(unix_micros(col(endCol)) / w))))
    p.join(i, Seq("__bucket") ++ equiKeys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
