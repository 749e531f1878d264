package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.GraftScan

/** Runtime filtering (dynamic partition pruning) through the graft V2
  * scan: when an item is the fact side of a star join, the dimension's
  * selective filter arrives at runtime as an IN-set on the join key and
  * re-prunes the PERIOD ROOTS — on a 100 TB item a join against "last
  * month's keys" reads one month, without any partition column in the
  * schema. */
class GraftRuntimeFilterSpec extends SparkSpec {

  private def frame(startDay: String, days: Int) = {
    import spark.implicits._
    val start = java.time.LocalDate.parse(startDay)
    (0 until days).map { i =>
      (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), i.toDouble)
    }.toDF("index", "value")
  }

  /** AQE wraps executed stages as leaf QueryStageExec nodes; descend
    * through them to find the (mutable, shared) GraftScan instance. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case _ => Nil
    })

  private def graftScan(df: org.apache.spark.sql.DataFrame): GraftScan = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    nodes.collectFirst { case b: BatchScanExec if b.scan.isInstanceOf[GraftScan] =>
      b.scan.asInstanceOf[GraftScan]
    }.getOrElse(fail("expected a GraftScan in the plan:\n" + df.queryExecution.executedPlan))
  }

  test("a filtered dimension join runtime-prunes period roots on the index column") {
    val c = tempCollection("dpp_index")
    c.write("fact", frame("2024-01-01", 180), monthlyLayout = true) // jan..jun
    import spark.implicits._
    // dimension: one row per day of march AND june, tagged by month; the
    // SELECTIVE dim filter (DPP's trigger) keeps march only. Built from
    // range() so the filter survives as a real Filter node — a local Seq
    // would constant-fold into LocalTableScan and DPP would never fire
    val dim = spark.range(0, 60).select(
      expr("timestamp'2024-03-01 00:00:00' + make_interval(0, 0, 0, " +
        "CAST(CASE WHEN id < 30 THEN id ELSE id + 62 END AS INT), 0, 0, 0)").as("ts"),
      when($"id" < 30, "m3").otherwise("m6").as("label"))
    val fact = spark.read.format("graft").load(c.path.resolve("fact").toString)
    val joined = fact.join(broadcast(dim.filter($"label" === "m3")),
      fact("index") === dim("ts"))
    val rows = joined.collect()
    assert(rows.length == 30)
    val scan = graftScan(joined)
    assert(scan.currentRootCount == 1,
      s"expected the join's runtime IN-set to prune to march only, " +
        s"got ${scan.currentRootCount} roots\n${joined.queryExecution.executedPlan}")
    // and the result matches the unpruned computation
    val expected = dim.filter($"label" === "m3").collect().map(_.getTimestamp(0)).toSet
    assert(rows.map(_.getTimestamp(0)).toSet == expected)
    cleanup(c)
  }

  test("runtime pruning composes with a static index predicate") {
    val c = tempCollection("dpp_static")
    c.write("fact", frame("2024-01-01", 180), monthlyLayout = true)
    import spark.implicits._
    // dim spans feb AND may behind a selective tag filter; the static
    // predicate keeps jan..mar, so the runtime IN-set must land on the
    // INTERSECTION: feb only (range-built: see the first test)
    val dim = spark.range(0, 3).select(
      expr("element_at(array(timestamp'2024-02-10 00:00:00', " +
        "timestamp'2024-05-10 00:00:00', timestamp'2024-05-11 00:00:00'), " +
        "CAST(id + 1 AS INT))").as("ts"),
      when($"id" < 2, "keep").otherwise("drop").as("label"))
    val fact = spark.read.format("graft").load(c.path.resolve("fact").toString)
      .filter(col("index") < lit(java.sql.Timestamp.valueOf("2024-04-01 00:00:00")))
    val joined = fact.join(broadcast(dim.filter($"label" === "keep")),
      fact("index") === dim("ts"))
    assert(joined.collect().map(_.getTimestamp(0)).toSeq ==
      Seq(java.sql.Timestamp.valueOf("2024-02-10 00:00:00")))
    val scan = graftScan(joined)
    assert(scan.currentRootCount == 1,
      s"static jan-mar ∧ runtime {feb,may} must leave 1 root, got ${scan.currentRootCount}")
    cleanup(c)
  }

  test("runtime filters on a _period_stats-covered column prune too") {
    val c = tempCollection("dpp_stats")
    // value == month number (id-shaped LONG: float/double join keys get
    // wrapped in NaN-normalization Spark cannot translate to a V2
    // runtime filter, so they fall back to unpruned — correct, just not
    // accelerated) → per-period stats give disjoint [min,max]
    val df = frame("2024-01-01", 180).withColumn("value", month(col("index")).cast("bigint"))
    c.write("fact", df, monthlyLayout = true, statsColumns = Seq("value"))
    import spark.implicits._
    val dim = spark.range(4, 6).select($"id".as("v"),
      when($"id" === 4, "april").otherwise("may").as("label"))
    val fact = spark.read.format("graft").load(c.path.resolve("fact").toString)
    val joined = fact.join(broadcast(dim.filter($"label" === "april")),
      fact("value") === dim("v"))
    assert(joined.count() == 30)
    val scan = graftScan(joined)
    assert(scan.currentRootCount == 1,
      s"stats-covered join key must prune to april, got ${scan.currentRootCount}\n" +
        joined.queryExecution.executedPlan)
    cleanup(c)
  }

  test("an empty runtime IN-set prunes to zero roots and serves zero rows") {
    val c = tempCollection("dpp_empty")
    c.write("fact", frame("2024-01-01", 60), monthlyLayout = true)
    import spark.implicits._
    val dim = spark.range(0, 5).select(
      expr("timestamp'2030-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0)").as("ts"),
      when($"id" < 0, "keep").otherwise("drop").as("label"))
    val fact = spark.read.format("graft").load(c.path.resolve("fact").toString)
    val joined = fact.join(broadcast(dim.filter($"label" === "keep")),
      fact("index") === dim("ts"))
    assert(joined.collect().isEmpty)
    cleanup(c)
  }

  test("runtime pruning works over a pinned manifest snapshot") {
    val c = tempCollection("dpp_snap")
    c.write("fact", frame("2024-01-01", 90), monthlyLayout = true)
    c.createSnapshot(Some("v1"), manifest = Some(true))
    c.append("fact", frame("2024-02-10", 3)) // rewrites feb AFTER the pin
    import spark.implicits._
    val dim = spark.range(0, 2).select(
      expr("element_at(array(timestamp'2024-02-05 00:00:00', timestamp'2024-03-05 00:00:00'), CAST(id + 1 AS INT))").as("ts"),
      when($"id" === 0, "keep").otherwise("drop").as("label"))
    val snap = spark.read.format("graft").option("snapshot", "v1")
      .load(c.path.resolve("fact").toString)
    val joined = snap.join(broadcast(dim.filter($"label" === "keep")),
      snap("index") === dim("ts"))
    val rows = joined.collect()
    assert(rows.length == 1 &&
      rows.head.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-02-05 00:00:00"))
    val scan = graftScan(joined)
    assert(scan.currentRootCount == 1,
      s"pinned feb generation must be the single runtime-pruned root, got ${scan.currentRootCount}")
    cleanup(c)
  }

  test("flat items offer no runtime filter attributes (no lever, no subquery)") {
    val c = tempCollection("dpp_flat")
    c.write("flat", frame("2024-01-01", 20))
    val fact = spark.read.format("graft").load(c.path.resolve("flat").toString)
    val scan0 = graftScan(fact.filter(col("value") >= 0.0))
    assert(scan0.filterAttributes().isEmpty)
    cleanup(c)
  }
}
