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

  /** Event-rate anomaly detection — the pipeline-monitoring pass
    * ("which hours saw an abnormal event rate"): tumbling-window event
    * counts, a global z-score per window against the sample
    * mean/stddev of all window counts, and the windows at
    * |z| ≥ threshold. Moments are exact integer sums (Σc, Σc² —
    * order-free, engine-identical); mean, std, and z run in
    * fixed-order double arithmetic, with z ROUNDED before the
    * threshold filter so membership is stable. Plan: one window-count
    * aggregation, one driver-sized moments row, one stateless pass for
    * z — all shuffles on the window key. */
  def rateAnomalies(events: DataFrame,
                    width: String = "1 hour",
                    threshold: Double = 2.0): DataFrame = {
    val counts = events
      .groupBy(window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))
    val m = counts.agg(count(lit(1)).as("k"), sum(col("n")).as("sx"),
      sum(col("n") * col("n")).as("sxx")).head()
    val k = m.getLong(0).toDouble
    // check k FIRST: sum over zero rows is null, so reading sx/sxx on
    // an empty input would NPE before the typed message
    require(k > 1.0, "rateAnomalies needs at least two windows")
    val sx = m.getLong(1).toDouble
    val sxx = m.getLong(2).toDouble
    val mean = sx / k
    val std = math.sqrt((k * sxx - sx * sx) / (k * (k - 1.0)))
    require(std > 0.0, "rateAnomalies: all window counts identical (std = 0)")
    counts
      .withColumn("z", round((col("n").cast("double") - lit(mean)) / lit(std), 6))
      .filter(abs(col("z")) >= threshold)
      .select(col("window_start"), col("n"), col("z"))
  }

  /** JSON props extraction — schema-on-read over the props column. */
  def withProps(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))

  /** Ordered funnel: per user, stage i counts only if some stage-i
    * event occurs at or after the user's first qualifying stage-(i−1)
    * event (earliest-completion semantics — the standard product
    * funnel). One (filter → per-user min → join) hop per stage, every
    * shuffle on user_id so the exchanges line up; the per-stage frames
    * stay skinny (user_id, ts). Emits (stage, n_users) with stages
    * numbered for stable ordering. */
  def funnel(events: DataFrame,
             stages: Seq[String],
             userCol: String = "user_id",
             tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val perStage = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val base = events.filter(col(typeCol) === stage)
          .select(col(userCol).as("u"), col(tsCol).as("t"))
        val qualified = prev match {
          case None => base
          case Some(p) => base.join(p.select(col("u"), col("t").as("__pt")), Seq("u"))
            .filter(col("t") >= col("__pt")).drop("__pt")
        }
        Some(qualified.groupBy(col("u")).agg(min(col("t")).as("t")))
    }.flatten
    perStage.zip(stages.zipWithIndex).map { case (df, (stage, i)) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(f"${i + 1}%02d_$stage").as("stage"), col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("stage"))
  }

  /** COHORT RETENTION matrix: users grouped by first-active week
    * (Monday-truncated), each cohort's share of users still active k
    * weeks later. The product-analytics staple, shaped for scale:
    * events collapse FIRST to distinct (user, week) — the only
    * event-volume scan; everything after runs on user-weeks. The
    * first-event groupBy, the cohort join, and the per-user distinct
    * all shuffle on user_id (one co-partitioned exchange reused), and
    * the final rollup is per (cohort, offset) — output is
    * weeks², driver-trivial. */
  def retentionCohorts(events: DataFrame,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val weeks = events.select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).as("w"))
      .distinct()
    val firsts = weeks.groupBy(col("user_id")).agg(min(col("w")).as("cohort"))
    val sizes = firsts.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    weeks.join(firsts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("w"), col("cohort")) / lit(7)).cast("long"))
      .groupBy(col("cohort"), col("week_offset"))
      // weeks is distinct (user, week) by construction, so each user
      // contributes one row per offset: plain count ≡ count_distinct
      // without the two-phase distinct aggregate
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("week_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
  }
}
