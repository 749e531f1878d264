package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store._
import graft.evolution.EvolutionStrategy

/** End-to-end store-layer scenarios for the DuckDB oracle: each query
  * builds a throwaway store under /tmp, drives the Collection API
  * (write / append with a duplicate strategy / snapshot / evolve), and
  * returns the final item state — whose expected value is expressible
  * as plain SQL over the ORIGINAL testdata tables. This verifies the
  * M1/M2/M7/J1/J2/U1/D1/V1-V3/E1-E4 pipelines (SURVEY §2) by their
  * observable results, not just unit assertions.
  */
object StoreQueries {

  private def freshCollection(s: SparkSession, tag: String): Collection = {
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft_verify", tag)
    FsOps.deleteRecursively(root)
    Files.createDirectories(root)
    GraftStore(s, "store", root).collection("col")
  }

  /** M1+S1+P1+P2: write lineitem as an item indexed on l_shipdate, read
    * back with a filter-tuple predicate + column projection. The filter
    * triples compile to pushed Parquet predicates; the projection keeps
    * the index (like a pandas index survives column selection). */
  def writeRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val col = freshCollection(s, "write_read")
    col.write("li", Tables.t(s, dir, "lineitem"), indexCols = Seq("l_shipdate"))
    col.item("li",
        filters = Seq(Filters.Pred("l_returnflag", "==", "R"),
                      Filters.Pred("l_quantity", ">", 25.0)),
        columns = Seq("l_orderkey", "l_linenumber", "l_quantity"))
      .data
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val writeReadSql: String =
    """SELECT l_shipdate, l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_quantity > 25.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** M2 keep_last (J1 anti-join + U1 union + D1 full-row dedup): the
    * incoming batch re-delivers every 1996+ row with adjusted quantity;
    * keep_last drops the stale originals, so the final state is
    * "original rows before 1996, adjusted rows from 1996 on". */
  def appendKeepLast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val col = freshCollection(s, "append_keep_last")
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    col.write("li", li, indexCols = Seq("l_shipdate"))
    val batch = li.filter($"l_shipdate" >= lit(cutoff))
      .withColumn("l_quantity", $"l_quantity" + 100.0)
    col.append("li", batch, DuplicateHandling.KeepLast)
    col.item("li").data.orderBy($"l_orderkey", $"l_linenumber")
  }

  val appendKeepLastSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |       THEN l_quantity + 100.0 ELSE l_quantity END AS l_quantity,
      |  l_shipdate
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** M2 keep_first: same re-delivery, but existing rows win — the final
    * state is exactly the original table. */
  def appendKeepFirst(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val col = freshCollection(s, "append_keep_first")
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    col.write("li", li, indexCols = Seq("l_shipdate"))
    val batch = li.filter($"l_shipdate" >= lit(cutoff))
      .withColumn("l_quantity", $"l_quantity" + 100.0)
    col.append("li", batch, DuplicateHandling.KeepFirst)
    col.item("li").data.orderBy($"l_orderkey", $"l_linenumber")
  }

  val appendKeepFirstSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** M2 keep_all + the D1 nuance: re-appending IDENTICAL rows collapses
    * (full-row dedup) while modified rows survive alongside the
    * originals (reference regression tests/test_append.py:218-234). The
    * batch re-delivers 1994 rows verbatim (collapse) and 1995 rows
    * modified (+100, both copies kept). */
  def appendKeepAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val col = freshCollection(s, "append_keep_all")
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    col.write("li", li, indexCols = Seq("l_shipdate"))
    val y94 = li.filter(year($"l_shipdate") === 1994)
    val y95 = li.filter(year($"l_shipdate") === 1995)
      .withColumn("l_quantity", $"l_quantity" + 100.0)
    col.append("li", y94.unionByName(y95), DuplicateHandling.KeepAll)
    col.item("li").data.orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
  }

  val appendKeepAllSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, l_quantity + 100.0, l_shipdate
      |FROM lineitem WHERE year(l_shipdate) = 1995
      |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin

  /** Monthly directory layout + PARTIAL append: the item is stored as
    * one directory per month; the keep_last re-delivery of 1996+ rows
    * rewrites only the 1996+ month dirs (partition-pruned read of the
    * stored side). Final state must equal the flat keep_last append —
    * same oracle. Also exercises month-directory pruning on read. */
  def appendMonthly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val col = freshCollection(s, "append_monthly")
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    col.write("li", li, indexCols = Seq("l_shipdate"), monthlyLayout = true)
    // a realistic partial append: one quarter re-delivered — only 3 of
    // ~83 month dirs are read and rewritten
    val batch = li.filter($"l_shipdate" >= lit(lo) && $"l_shipdate" < lit(hi))
      .withColumn("l_quantity", $"l_quantity" + 100.0)
    col.append("li", batch, DuplicateHandling.KeepLast)
    col.item("li").data.orderBy($"l_orderkey", $"l_linenumber")
  }

  val appendMonthlySql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |       THEN l_quantity + 100.0 ELSE l_quantity END AS l_quantity,
      |  l_shipdate
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** V1+V2 snapshot isolation: snapshot taken before an append keeps
    * serving the pre-append state while the live item moves on. */
  /** V1-V3 through the MANIFEST snapshot path (the object-store form —
    * generation pinned in a JSON manifest, the append's copy-on-write
    * retains the pinned data dir by O(1) rename): the snapshot read
    * after the append must surface exactly the pre-append state. */
  def snapshotRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val col = freshCollection(s, "snapshot_read")
    val o = Tables.t(s, dir, "orders")
    col.write("o", o.filter($"o_orderdate" < lit(cutoff)), indexCols = Seq("o_orderdate"))
    val snap = col.createSnapshot(Some("before_append"), manifest = Some(true))
    col.append("o", o.filter($"o_orderdate" >= lit(cutoff)), DuplicateHandling.KeepAll)
    col.item("o", snapshot = Some(snap)).data.orderBy($"o_orderkey")
  }

  val snapshotReadSql: String =
    """SELECT * FROM orders
      |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |ORDER BY o_orderkey""".stripMargin

  /** E1-E4 ADD_ONLY evolution: appending a batch that carries a new
    * column evolves the item schema; pre-existing rows surface NULL for
    * the new column (and evolution bypasses dedup — SURVEY §7.4.6). */
  def evolutionAddColumn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val col = freshCollection(s, "evolution_add")
    val o = Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
    col.write("o", o.filter($"o_orderdate" < lit(cutoff)), indexCols = Seq("o_orderdate"))
    val batch = o.filter($"o_orderdate" >= lit(cutoff))
      .withColumn("priority_score", ($"o_totalprice" / 1000.0))
    col.append("o", batch, evolution = Some(EvolutionStrategy.AddOnly))
    col.item("o").data.orderBy($"o_orderkey")
  }

  val evolutionAddColumnSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderdate,
      |  CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |       THEN o_totalprice / 1000.0 ELSE NULL END AS priority_score
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Targeted deletion (right-to-be-forgotten) through the monthly
    * layout: one predicate delete that rewrites only the months holding
    * matching rows, then a second that empties ENTIRE months (their
    * dirs must disappear, not linger as stale data). The read-back
    * equals the doubly-filtered source table — deletion semantics,
    * partial rewrite, and dir removal all hash-verified. */
  def deleteWhere(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val col = freshCollection(s, "delete_where")
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    col.write("li", li, indexCols = Seq("l_shipdate"), monthlyLayout = true)
    // GDPR-style purge of specific keys: touches many months partially
    col.deleteWhere("li", $"l_orderkey" % 10 === 3)
    // bad-shard removal: wipes every 1994 month dir outright
    col.deleteWhere("li", year($"l_shipdate") === 1994)
    col.item("li").data.orderBy($"l_orderkey", $"l_linenumber")
  }

  val deleteWhereSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE NOT (l_orderkey % 10 = 3) AND NOT (year(l_shipdate) = 1994)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Retention expiry (TTL sweep) through the monthly layout: every
    * period wholly before the cutoff's month is removed by directory
    * NAME (zero rows read); only the boundary month is scanned and
    * rewritten. The mid-month cutoff makes the boundary path do real
    * row-level work. Read-back ≡ index-filtered source. */
  def expireBefore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1995-07-15 00:00:00")
    val col = freshCollection(s, "expire_before")
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    col.write("li", li, indexCols = Seq("l_shipdate"), monthlyLayout = true)
    col.expireBefore("li", cutoff)
    col.item("li").data.orderBy($"l_orderkey", $"l_linenumber")
  }

  val expireBeforeSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-07-15 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Snapshot diff (the data-versioning question "what changed since
    * snapshot S?"): snapshot → append new rows → predicate-delete old
    * rows → diff live vs snapshot. Appended survivors must surface as
    * 'added', deleted pre-snapshot rows as 'removed', rows that were
    * both added and deleted after the snapshot must not appear at all.
    * Exercises manifest-snapshot copy-on-write through BOTH mutation
    * paths (append and deleteWhere). */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val col = freshCollection(s, "snapshot_diff")
    val o = Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
    col.write("o", o.filter($"o_orderdate" < lit(cutoff)), indexCols = Seq("o_orderdate"))
    val snap = col.createSnapshot(Some("v1"), manifest = Some(true))
    col.append("o", o.filter($"o_orderdate" >= lit(cutoff)), DuplicateHandling.KeepAll)
    col.deleteWhere("o", $"o_orderkey" % 100 === 7)
    col.diffSnapshot("o", snap)
      .orderBy($"change", $"o_orderkey")
  }

  val snapshotDiffSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderdate, 'added' AS change
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND NOT (o_orderkey % 100 = 7)
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, o_orderdate, 'removed' AS change
      |FROM orders
      |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderkey % 100 = 7
      |ORDER BY change, o_orderkey""".stripMargin

  /** P3 metadata-equality item search over sidecars (driver-side; the
    * result is the matching items' names — oracle = the literal set). */
  def metadataSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val col = freshCollection(s, "metadata_search")
    val r = Tables.t(s, dir, "region")
    col.write("a", r, indexCols = Seq("r_regionkey"),
      metadata = Map("source" -> "api", "type" -> "raw"))
    col.write("b", r, indexCols = Seq("r_regionkey"),
      metadata = Map("source" -> "file", "type" -> "raw"))
    col.write("c", r, indexCols = Seq("r_regionkey"),
      metadata = Map("source" -> "api", "type" -> "processed"))
    val hits = col.listItems(Map("source" -> "api", "type" -> "raw")).toSeq.sorted
    hits.toDF("item_name").orderBy($"item_name")
  }

  val metadataSearchSql: String = "SELECT 'a' AS item_name"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_write_read" -> writeRead _,
    "store_append_keep_last" -> appendKeepLast _,
    "store_append_keep_first" -> appendKeepFirst _,
    "store_append_keep_all" -> appendKeepAll _,
    "store_append_monthly_partial" -> appendMonthly _,
    "store_delete_where" -> deleteWhere _,
    "store_expire_before" -> expireBefore _,
    "store_snapshot_read" -> snapshotRead _,
    "store_snapshot_diff" -> snapshotDiff _,
    "store_evolution_add_column" -> evolutionAddColumn _,
    "store_metadata_search" -> metadataSearch _)

  val oracles: Map[String, String] = Map(
    "store_write_read" -> writeReadSql,
    "store_append_keep_last" -> appendKeepLastSql,
    "store_append_keep_first" -> appendKeepFirstSql,
    "store_append_keep_all" -> appendKeepAllSql,
    "store_append_monthly_partial" -> appendMonthlySql,
    "store_delete_where" -> deleteWhereSql,
    "store_expire_before" -> expireBeforeSql,
    "store_snapshot_read" -> snapshotReadSql,
    "store_snapshot_diff" -> snapshotDiffSql,
    "store_evolution_add_column" -> evolutionAddColumnSql,
    "store_metadata_search" -> metadataSearchSql)
}
