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
    * is in seconds. An interval spanning more than
    * `maxBucketsPerInterval` buckets fails fast with a clear message
    * (a sentinel end date like 9999-12-31 would otherwise explode to
    * billions of bucket rows per interval — raise the cap or widen
    * `bucketWidth` for legitimately long intervals); inverted
    * (end < start) intervals are dropped, matching the empty range
    * predicate they represent. */
  def pointInInterval(points: DataFrame,
                      intervals: DataFrame,
                      tsCol: String,
                      startCol: String,
                      endCol: String,
                      equiKeys: Seq[String] = Nil,
                      bucketWidth: Long = 3600L,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val w = bucketWidth * 1000000L // µs
    val p = points.withColumn("__bucket", floor(unix_micros(col(tsCol)) / w))
    val b0 = floor(unix_micros(col(startCol)) / w)
    val b1 = floor(unix_micros(col(endCol)) / w)
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(
        when(b1 - b0 < lit(maxBucketsPerInterval.toLong), sequence(b0, b1))
          .otherwise(raise_error(concat(
            lit(s"range join: interval spans more than $maxBucketsPerInterval " +
              s"buckets at bucketWidth=${bucketWidth}s — widen bucketWidth or " +
              "raise maxBucketsPerInterval ("),
            col(startCol).cast("string"), lit(" .. "),
            col(endCol).cast("string"), lit(")"))))))
    p.join(i, Seq("__bucket") ++ equiKeys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
