package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling — the reference's home domain (pystore
  * stores market/TS frames; its users' first query after read is a
  * pandas `resample()`). Batch-distributed equivalents:
  *
  *  - [[ohlc]]: downsample to fixed buckets with
  *    open/high/low/close/volume — one groupBy on (key, bucket), all
  *    aggregates map-side combinable (`min_by`/`max_by` carry the
  *    (ts, tiebreak) struct, so open/close are exact row values, not
  *    interpolations).
  *  - [[resampleFfill]]: regularize to a fixed grid and
  *    forward-fill gaps (`resample().ffill()`): the observation grid
  *    is generated per key from that key's own span (sequence +
  *    explode — no driver materialization), observations join on the
  *    bucket, and the carried value is one `last(_, ignoreNulls)`
  *    window per key ordered by grid time. One shuffle on the key.
  *
  * Determinism: open/close tie-break on a unique secondary column;
  * sums run in DECIMAL then round — both engine-replicable (the
  * DuckDB oracles replicate bucket arithmetic, arg_min/arg_max with
  * composite ordering, and the fill window).
  */
object TimeSeries {

  /** Epoch-seconds bucket start via pure integer arithmetic. */
  private def bucketExpr(tsCol: String, widthSeconds: Long): Column =
    expr(s"((unix_micros(`$tsCol`) div 1000000) div ${widthSeconds}L) * ${widthSeconds}L")

  /** OHLC downsample: per (keyCols, bucket of `width` seconds):
    * open/close = value at the earliest/latest (ts, tieCol) row,
    * high/low = max/min, n = rows, volume = decimal-exact sum rounded
    * to 2. Bucket = epoch-µs INTEGER division (doubles cannot hold
    * epoch-µs exactly; truncating int division is engine-identical on
    * positive epochs), no session-tz dependence. */
  def ohlc(df: DataFrame,
           widthSeconds: Long,
           keyCols: Seq[String] = Nil,
           tsCol: String = "ts",
           valueCol: String = "value",
           tieCol: String = "event_id"): DataFrame = {
    require(widthSeconds > 0)
    val bucket = bucketExpr(tsCol, widthSeconds).as("bucket_start_s")
    val ord = struct(col(tsCol), col(tieCol))
    df.groupBy((keyCols.map(col) :+ bucket): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(38,4)")).cast("double"), 2).as("volume"))
  }

  /** Regular-grid forward fill: per key, generate the bucket grid
    * spanning that key's own [min, max] observation range, attach the
    * LAST observation in each bucket (deterministic via the (ts,
    * tieCol) ordering), and carry values forward across empty buckets.
    * Grid rows that precede a key's first observation cannot occur by
    * construction (the grid starts at the key's min). Emits
    * (keyCols, bucket_start_s, value, filled) where `filled` marks
    * carried rows. */
  def resampleFfill(df: DataFrame,
                    widthSeconds: Long,
                    keyCols: Seq[String],
                    tsCol: String = "ts",
                    valueCol: String = "value",
                    tieCol: String = "event_id"): DataFrame = {
    require(widthSeconds > 0 && keyCols.nonEmpty)
    val w = lit(widthSeconds)
    // last observation per (key, bucket): max_by on the unique (ts, tie)
    val perBucket = df
      .groupBy((keyCols.map(col) :+ bucketExpr(tsCol, widthSeconds).as("bucket_start_s")): _*)
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("obs"))
    // per-key grid from the key's own span — executor-side sequence
    val span = perBucket.groupBy(keyCols.map(col): _*)
      .agg(min(col("bucket_start_s")).as("lo"), max(col("bucket_start_s")).as("hi"))
    val grid = span.select(
      (keyCols.map(col) :+
        explode(sequence(col("lo"), col("hi"), w)).as("bucket_start_s")): _*)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("bucket_start_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(perBucket, keyCols :+ "bucket_start_s", "left")
      .withColumn("value", last(col("obs"), ignoreNulls = true).over(win))
      .withColumn("filled", col("obs").isNull)
      .drop("obs")
  }
}
