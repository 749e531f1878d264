package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props JSON).
  * The Structured Streaming versions of these live in graft.streaming;
  * these batch forms define the semantics the streaming path must match.
  */
object Events {

  /** Gap-based sessionization: a new session starts when a user's gap
    * to the previous event exceeds `gapMinutes`. Classic two-window
    * cumulative-sum — one shuffle on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
    flagged
      .withColumn("session_seq", sum(col("__new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new_session")
  }

  /** Session-level rollup: bounds, event count, total value. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,4)")).cast("double"), 2).as("total_value"))

  /** Tumbling event-time window aggregation (batch semantics of the
    * streaming windowed count). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,4)")).cast("double"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** JSON props extraction — schema-on-read over the props column. */
  def withProps(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
}
