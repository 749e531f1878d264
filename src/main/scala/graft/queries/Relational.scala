package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The downstream relational query surface — what reference users get
  * from the lazy Dask handle (reference item.py:64-65, README.rst:128),
  * expressed as native Spark plans over the TESTDATA tables.
  *
  * Numeric discipline for the DuckDB oracle: floating sums are computed
  * in DECIMAL (exact, order-independent) and only then rounded and cast
  * to DOUBLE, so Spark and DuckDB agree bit-for-bit regardless of
  * aggregation order. Every aggregate/computed column carries the SAME
  * alias in the Spark plan and the oracle SQL; every query has a total
  * ORDER BY for deterministic row order.
  *
  * Scale notes are per-query in the Scaladoc.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column, scale: Int = 4) =
    c.cast(DecimalType(38, scale))

  /** Q1-style scan+agg over lineitem: single shuffle on the two group
    * keys; partial (map-side) aggregation halves shuffle volume; scan
    * reads only the 6 referenced columns (column pruning). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum(dec($"l_quantity")).cast(DoubleType), 2).as("sum_qty"),
        round(sum(dec($"l_extendedprice")).cast(DoubleType), 2).as("sum_base_price"),
        round(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)).cast(DoubleType), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 2) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filtered, projected scan — both the predicate and the 5-column
    * projection reach the Parquet reader (PushedFilters + ReadSchema in
    * explain), so row groups outside the date range are skipped via
    * min/max stats. This is the reference's S1+P1+P2 surface. */
  def q2Filter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .filter($"l_returnflag" === "R" &&
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q2FilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join: fact lineitem ⋈ orders shuffles on the fact key once;
    * customer and nation are broadcast (dimension tables stay small at
    * every SF — at 100 TB the fact side scales, the dims don't, so the
    * broadcast stays valid; AQE would pick it from stats anyway, the
    * hint makes it explicit). */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
    val c = Tables.t(s, dir, "customer")
    val n = Tables.t(s, dir, "nation")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        round(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)).cast(DoubleType), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"n_name")
  }

  val q3JoinAggSql: String =
    """SELECT n_name,
      |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-k: planned as TakeOrderedAndProject — each partition keeps a
    * k-heap, the driver merges 32 heaps of 10; no global sort, no
    * shuffle of the full table. */
  def q4TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  val q4TopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Ranking window: first 3 orders per customer. One shuffle on
    * o_custkey; rank tie-broken by key for determinism. */
  def q5Window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  val q5WindowSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Semi join (EXISTS): high-value customers that actually ordered.
    * Build side is the distinct key set only — no payload shuffle. */
  def q6Semi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer").filter($"c_acctbal" > 5000.0)
    val o = Tables.t(s, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  val q6SemiSql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_acctbal > 5000.0
      |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Anti join (NOT EXISTS): customers with no orders — the same plan
    * shape as the store's append dedup (J1). */
  def q7Anti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
    val o = Tables.t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q7AntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Union + distinct over two overlapping slices (U1 + D1 shape).
    * dropDuplicates on the key = one hash-agg shuffle on o_orderkey. */
  def q8UnionDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.t(s, dir, "orders")
    val a = o.filter($"o_totalprice" > 150000.0)
    val b = o.filter($"o_orderpriority" === "1-URGENT")
    a.unionByName(b)
      .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      .dropDuplicates("o_orderkey")
      .orderBy($"o_orderkey")
  }

  val q8UnionDedupSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_totalprice > 150000.0 OR o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin

  /** Exact distinct counting per group — two-level hash aggregate
    * (partial distinct within partitions, final after one shuffle). */
  def q9DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_suppkey")
  }

  val q9DistinctAggSql: String =
    """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY l_suppkey""".stripMargin

  /** Time-bucketed aggregation (the shape month-partitioned items serve
    * from pruned partitions): group on a derived month key. */
  def q10MonthlyAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(dec($"o_totalprice")).cast(DoubleType), 2).as("total"))
      .orderBy($"month")
  }

  val q10MonthlyAggSql: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 2) AS total
      |FROM orders
      |GROUP BY date_trunc('month', o_orderdate)
      |ORDER BY month""".stripMargin

  /** Rolling window over a time-ordered series per key: 7-row moving
    * average of daily order totals per priority class. Exercises
    * rowsBetween analytic frames (SURVEY §2.16). */
  def q11Rolling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.t(s, dir, "orders")
      .groupBy($"o_orderpriority", date_trunc("day", $"o_orderdate").as("day"))
      .agg(sum(dec($"o_totalprice")).as("day_total"))
    val w = Window.partitionBy($"o_orderpriority").orderBy($"day").rowsBetween(-6, 0)
    daily
      .withColumn("avg7", round(avg($"day_total".cast(DoubleType)).over(w), 2))
      .select($"o_orderpriority", $"day", round($"day_total".cast(DoubleType), 2).as("day_total"), $"avg7")
      .orderBy($"o_orderpriority", $"day")
  }

  val q11RollingSql: String =
    """SELECT o_orderpriority, day, round(CAST(day_total AS DOUBLE), 2) AS day_total,
      |  round(avg(CAST(day_total AS DOUBLE)) OVER (
      |    PARTITION BY o_orderpriority ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS avg7
      |FROM (
      |  SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
      |         sum(CAST(o_totalprice AS DECIMAL(38,4))) AS day_total
      |  FROM orders
      |  GROUP BY o_orderpriority, date_trunc('day', o_orderdate)) t
      |ORDER BY o_orderpriority, day""".stripMargin

  /** Hierarchical ROLLUP totals (priority → status → grand total):
    * Spark plans this as a single Expand + hash aggregate — one pass,
    * one shuffle, all grouping levels at once. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(dec($"o_totalprice")).cast(DoubleType), 2).as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  val q12RollupSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_rollup" -> q12Rollup _,
    "q1_agg" -> q1Agg _,
    "q2_filter_pushdown" -> q2Filter _,
    "q3_join_agg" -> q3JoinAgg _,
    "q4_topk" -> q4TopK _,
    "q5_window_rank" -> q5Window _,
    "q6_semi_join" -> q6Semi _,
    "q7_anti_join" -> q7Anti _,
    "q8_union_dedup" -> q8UnionDedup _,
    "q9_distinct_agg" -> q9DistinctAgg _,
    "q10_monthly_agg" -> q10MonthlyAgg _,
    "q11_rolling_window" -> q11Rolling _)

  val oracles: Map[String, String] = Map(
    "q12_rollup" -> q12RollupSql,
    "q1_agg" -> q1AggSql,
    "q2_filter_pushdown" -> q2FilterSql,
    "q3_join_agg" -> q3JoinAggSql,
    "q4_topk" -> q4TopKSql,
    "q5_window_rank" -> q5WindowSql,
    "q6_semi_join" -> q6SemiSql,
    "q7_anti_join" -> q7AntiSql,
    "q8_union_dedup" -> q8UnionDedupSql,
    "q9_distinct_agg" -> q9DistinctAggSql,
    "q10_monthly_agg" -> q10MonthlyAggSql,
    "q11_rolling_window" -> q11RollingSql)
}
