package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Events}

/** Event-stream operator queries over the `events` table.
  *
  * The driver's testdata has shipped `ts` in two physical shapes
  * across generations: TIMESTAMP(NANOS) (which Spark can only read as
  * int64 via `spark.sql.legacy.parquet.nanosAsLong` — the path from
  * SURVEY §7.4.1) and TIMESTAMP(MICROS) without UTC adjustment (which
  * reads as TIMESTAMP_NTZ). [[normalizeTs]] accepts either and lands
  * on µs-precision TimestampType; with the session pinned to UTC
  * (Verify/Bench/SparkSpec all set it) both conversions are
  * value-identical to DuckDB's naive read of the same file, and the
  * oracle's date_trunc('microseconds', ts) truncates identically.
  */
object EventQueries {

  /** Land `ts` on µs TimestampType from any of its physical shapes. */
  private[queries] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // int64 epoch-nanos (nanosAsLong read of TIMESTAMP(NANOS)).
      // `div` (integer division) — `/` would promote to DOUBLE, whose
      // 52-bit mantissa rounds epoch-nanos (~1.7e18) by whole µs.
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // µs wall-clock: reinterpret in the session zone (pinned UTC).
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(Tables.t(s, dir, "events"))
  }

  def sessionStats(s: SparkSession, dir: String): DataFrame =
    Events.sessionStats(events(s, dir), gapMinutes = 30)
      .orderBy(col("user_id"), col("session_seq"))

  val sessionStatsSql: String =
    """WITH e AS (SELECT event_id, user_id, value,
      |             date_trunc('microseconds', ts) AS ts FROM events),
      |lagged AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |           FROM e),
      |flagged AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |                           THEN 1 ELSE 0 END AS new_session FROM lagged),
      |sessions AS (SELECT *, CAST(sum(new_session) OVER (
      |               PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM flagged)
      |SELECT user_id, session_seq,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE), 2) AS total_value
      |FROM sessions
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Events.tumblingCounts(events(s, dir), "1 hour")
      .orderBy(col("window_start"), col("event_type"))

  val hourlyCountsSql: String =
    """SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS window_start,
      |  event_type, count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Event-rate anomalies: hourly z-scores against the global
    * mean/std of hourly counts, |z| ≥ 2 emitted. Exact integer
    * moments + fixed-order double formula + round-before-filter make
    * the flagged set engine-replicable. */
  def rateAnomaly(s: SparkSession, dir: String): DataFrame =
    Events.rateAnomalies(events(s, dir), "1 hour", threshold = 2.0)
      .orderBy(col("window_start"))

  val rateAnomalySql: String =
    """WITH c AS (SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS w,
      |             CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS sx,
      |             CAST(sum(n*n) AS BIGINT) AS sxx FROM c),
      |z AS (SELECT w, n,
      |    round((CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(k AS DOUBLE)) /
      |      sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))), 6) AS z
      |  FROM c CROSS JOIN m)
      |SELECT w AS window_start, n, z FROM z
      |WHERE abs(z) >= 2.0
      |ORDER BY window_start""".stripMargin

  /** OHLC downsample per event_type (the reference's home domain —
    * the pandas resample('1h').ohlc() a pystore user runs first).
    * Open/close tie-break on (ts, event_id); bucket arithmetic is
    * integer epoch division in both engines. */
  def ohlcResample(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.ohlc(events(s, dir), widthSeconds = 3600,
        keyCols = Seq("event_type"))
      .orderBy(col("event_type"), col("bucket_start_s"))

  val ohlcResampleSql: String =
    """WITH e AS (SELECT event_id, event_type, value,
      |    date_trunc('microseconds', ts) AS ts,
      |    ((epoch_us(date_trunc('microseconds', ts)) // 1000000) // 3600) * 3600 AS b
      |  FROM events),
      |o AS (SELECT event_type, b, value,
      |    row_number() OVER (PARTITION BY event_type, b ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, b ORDER BY ts DESC, event_id DESC) AS rn_z
      |  FROM e),
      |oc AS (SELECT event_type, b,
      |    max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |    max(CASE WHEN rn_z = 1 THEN value END) AS close
      |  FROM o GROUP BY 1, 2),
      |hl AS (SELECT event_type, b, max(value) AS high, min(value) AS low,
      |    CAST(count(*) AS BIGINT) AS n,
      |    round(CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE), 2) AS volume
      |  FROM e GROUP BY 1, 2)
      |SELECT event_type, b AS bucket_start_s, open, high, low, close, n, volume
      |FROM oc JOIN hl USING (event_type, b)
      |ORDER BY event_type, bucket_start_s""".stripMargin

  /** Regular-grid forward fill per event_type (resample().ffill()):
    * each key's grid spans its own observation range; carried rows are
    * flagged. The oracle replicates the grid generation, the
    * last-observation choice, and the IGNORE NULLS carry. */
  def ffillResample(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.resampleFfill(events(s, dir), widthSeconds = 3600,
        keyCols = Seq("event_type"))
      .orderBy(col("event_type"), col("bucket_start_s"))

  val ffillResampleSql: String =
    """WITH e AS (SELECT event_id, event_type, value,
      |    date_trunc('microseconds', ts) AS ts,
      |    ((epoch_us(date_trunc('microseconds', ts)) // 1000000) // 3600) * 3600 AS b
      |  FROM events),
      |last_obs AS (SELECT event_type, b, value AS obs FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_type, b
      |      ORDER BY ts DESC, event_id DESC) AS rn FROM e) t
      |  WHERE rn = 1),
      |span AS (SELECT event_type, min(b) AS lo, max(b) AS hi
      |         FROM last_obs GROUP BY 1),
      |grid AS (SELECT event_type, unnest(range(lo, hi + 3600, 3600)) AS b FROM span),
      |joined AS (SELECT g.event_type, g.b, o.obs
      |           FROM grid g LEFT JOIN last_obs o USING (event_type, b))
      |SELECT event_type, b AS bucket_start_s,
      |  last_value(obs IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY b
      |    ROWS UNBOUNDED PRECEDING) AS value,
      |  obs IS NULL AS filled
      |FROM joined
      |ORDER BY event_type, bucket_start_s""".stripMargin

  /** Grouped value quantiles per event type — the profiler's grouped
    * form (dashboard percentiles). Exact `percentile` (array form, one
    * buffer per group) with the same DuckDB quantile_cont parity the
    * flat profile queries established. */
  def valueQuantiles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("p"))
      .select(col("event_type"), col("n"),
        round(element_at(col("p"), 1).cast("double"), 6).as("p50"),
        round(element_at(col("p"), 2).cast("double"), 6).as("p95"),
        round(element_at(col("p"), 3).cast("double"), 6).as("p99"))
      .orderBy(col("event_type"))

  val valueQuantilesSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95,
      |  round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** As-of join: each click event matched with the user's most recent
    * purchase at or before it (point-in-time-correct feature lookup). */
  def asofClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asOf(clicks, purchases, key = "user_id",
        leftTime = "ts", rightTime = "ts",
        rightCols = Map("event_id" -> "purchase_event_id"))
      .select(col("event_id"), col("purchase_event_id"))
      .orderBy(col("event_id"))
  }

  val asofClickPurchaseSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             date_trunc('microseconds', ts) AS ts FROM events),
      |c AS (SELECT * FROM e WHERE event_type = 'click'),
      |p AS (SELECT * FROM e WHERE event_type = 'purchase')
      |SELECT c.event_id, p.event_id AS purchase_event_id
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  /** JSON props extraction + per-key aggregation (schema-on-read). */
  def propsAgg(s: SparkSession, dir: String): DataFrame =
    Events.withProps(events(s, dir))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        round(avg(col("k").cast("decimal(38,6)")).cast("double"), 4).as("avg_k"))
      .orderBy(col("event_type"))

  val propsAggSql: String =
    """SELECT event_type,
      |  count(CAST(props->>'$.k' AS INTEGER)) AS n_with_k,
      |  round(CAST(avg(CAST(CAST(props->>'$.k' AS INTEGER) AS DECIMAL(38,6))) AS DOUBLE), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** ns-fidelity storage roundtrip (SURVEY §7.4.1): the ns-precision
    * event stream is stored with its int64-nanos index INTACT (no
    * truncation on disk) plus an `epoch_ns` type marker; the read edge
    * restores µs timestamps deterministically from metadata — not from
    * the reference's value-magnitude guessing (item.py:82-93). */
  def nsRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Tables.t(s, dir, "events")
    // The marker path under test stores int64 epoch-nanos verbatim; a
    // µs-shaped testdata generation reconstructs them losslessly
    // (µs × 1000) so the epoch_ns restore edge still gets exercised.
    val withNs =
      if (src.schema("ts").dataType == LongType) src
      else normalizeTs(src).withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    val raw = withNs
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_verify", "ns_roundtrip")
    graft.store.FsOps.deleteRecursively(root)
    java.nio.file.Files.createDirectories(root)
    val c = graft.store.GraftStore(s, "store", root).collection("col")
    c.write("ev", raw, indexCols = Seq("ts"),
      typeMarkers = Map("ts" -> graft.store.Codecs.TypeMarker("epoch_ns")))
    c.item("ev").dataRestored.orderBy(col("event_id"))
  }

  val nsRoundtripSql: String =
    """SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Product funnel view → click → purchase with earliest-completion
    * ordering; per-stage user counts, oracle-replicated with the same
    * chained min/join CTEs. */
  def funnel(s: SparkSession, dir: String): DataFrame =
    Events.funnel(events(s, dir), Seq("view", "click", "purchase"))

  val funnelSql: String =
    """WITH e AS (SELECT user_id, event_type,
      |             date_trunc('microseconds', ts) AS ts FROM events),
      |s1 AS (SELECT user_id, min(ts) AS t FROM e
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e
      |       JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
      |       WHERE e.event_type = 'click' GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e
      |       JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
      |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT '01_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
      |UNION ALL
      |SELECT '02_click', CAST(count(*) AS BIGINT) FROM s2
      |UNION ALL
      |SELECT '03_purchase', CAST(count(*) AS BIGINT) FROM s3
      |ORDER BY stage""".stripMargin

  /** Surge-window attribution — a PURE range join (no equi key): surge
    * windows are the 30 minutes after the first click of any hour with
    * ≥ 6 clicks; every purchase (any user) inside a window attributes
    * to it. No-equi-key interval joins plan as BroadcastNestedLoopJoin
    * in stock Spark — O(n·m); `RangeJoin.pointInInterval` bucketizes
    * (30-min buckets ⇒ each window covers ≤ 2) so the plan is a plain
    * shuffled equi-join on bucket ids at any scale. */
  def rangeAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val surge = e.filter(col("event_type") === "click")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_clicks"), min(col("ts")).as("w_start"))
      .filter(col("n_clicks") >= 6)
      .withColumn("w_end", col("w_start") + expr("INTERVAL 30 MINUTES"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("ts"), col("value"))
    graft.operators.RangeJoin.pointInInterval(purchases, surge,
        "ts", "w_start", "w_end", bucketWidth = 1800L)
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(38,4)")).cast("double"), 2).as("total_value"))
      .orderBy(col("hour"))
  }

  val rangeAttributionSql: String =
    """WITH e AS (SELECT event_type, value,
      |             date_trunc('microseconds', ts) AS ts FROM events),
      |surge AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n_clicks,
      |            min(ts) AS w_start
      |          FROM e WHERE event_type = 'click' GROUP BY 1),
      |w AS (SELECT hour, w_start, w_start + INTERVAL 30 MINUTE AS w_end
      |      FROM surge WHERE n_clicks >= 6),
      |p AS (SELECT ts, value FROM e WHERE event_type = 'purchase')
      |SELECT hour, CAST(count(*) AS BIGINT) AS n_purchases,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE), 2) AS total_value
      |FROM w JOIN p ON p.ts >= w.w_start AND p.ts <= w.w_end
      |GROUP BY hour
      |ORDER BY hour""".stripMargin

  /** Weekly cohort retention — first-active-week cohorts × week
    * offsets, fraction of the cohort active at each offset. The oracle
    * recomputes the matrix from scratch (same Monday week-trunc, same
    * integer week arithmetic). */
  def retention(s: SparkSession, dir: String): DataFrame =
    Events.retentionCohorts(events(s, dir))
      .orderBy(col("cohort"), col("week_offset"))

  val retentionSql: String =
    """WITH e AS (SELECT user_id,
      |    date_trunc('week', date_trunc('microseconds', ts)) AS w
      |  FROM events GROUP BY 1, 2),
      |f AS (SELECT user_id, min(w) AS cohort FROM e GROUP BY 1),
      |sizes AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY 1),
      |act AS (SELECT cohort,
      |    CAST(date_diff('day', cohort, w) // 7 AS BIGINT) AS week_offset,
      |    count(DISTINCT e.user_id) AS n_active
      |  FROM e JOIN f USING (user_id) GROUP BY 1, 2)
      |SELECT cohort, week_offset, n_active, n_cohort,
      |  round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
      |FROM act JOIN sizes USING (cohort)
      |ORDER BY cohort, week_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_range_attrib" -> rangeAttribution _,
    "events_funnel" -> funnel _,
    "store_events_ns_roundtrip" -> nsRoundtrip _,
    "events_session_stats" -> sessionStats _,
    "events_hourly_counts" -> hourlyCounts _,
    "events_rate_anomaly" -> rateAnomaly _,
    "events_ohlc" -> ohlcResample _,
    "events_ffill" -> ffillResample _,
    "events_value_quantiles" -> valueQuantiles _,
    "events_asof_click_purchase" -> asofClickPurchase _,
    "events_props_agg" -> propsAgg _,
    "events_retention" -> retention _)

  val oracles: Map[String, String] = Map(
    "events_range_attrib" -> rangeAttributionSql,
    "events_funnel" -> funnelSql,
    "store_events_ns_roundtrip" -> nsRoundtripSql,
    "events_session_stats" -> sessionStatsSql,
    "events_hourly_counts" -> hourlyCountsSql,
    "events_rate_anomaly" -> rateAnomalySql,
    "events_ohlc" -> ohlcResampleSql,
    "events_ffill" -> ffillResampleSql,
    "events_value_quantiles" -> valueQuantilesSql,
    "events_asof_click_purchase" -> asofClickPurchaseSql,
    "events_props_agg" -> propsAggSql,
    "events_retention" -> retentionSql)
}
