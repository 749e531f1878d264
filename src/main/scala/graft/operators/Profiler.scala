package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling for data-card / QA reporting over a training
  * corpus: per-column count, null count, min/max, decimal-exact sum,
  * and quantiles — ONE aggregate pass for all columns (map-side
  * partial aggregation; no per-column jobs), melted to one row per
  * column with `stack`.
  *
  * Quantiles: `approx = false` uses exact `percentile` (sort-based —
  * the oracle-checkable form); `approx = true` swaps in
  * `percentile_approx` (single-pass GK sketch, the 100 TB path — same
  * output shape, bounded error instead of a sort).
  */
object Profiler {

  def numericProfile(df: DataFrame,
                     cols: Seq[String],
                     approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    // Column names are interpolated into SQL strings (backticked calls,
    // single-quoted stack labels); a name containing the quoting
    // character would parse wrong or mislabel output.
    cols.foreach { c =>
      require(!c.contains("`") && !c.contains("'"),
        s"numericProfile: column name '$c' contains a quote character")
    }
    // BOTH quantiles from ONE percentile aggregate per column (array
    // form): the exact path's state is a per-partition value buffer
    // merged on a single reducer, so one buffer per column instead of
    // two halves the dominant cost of the query
    def pct(c: String): String =
      if (approx) s"percentile_approx(`$c`, array(0.5D, 0.95D), 10000)"
      else s"percentile(`$c`, array(0.5D, 0.95D))"
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        round(min(col(c)).cast("double"), 6).as(s"min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"max_$c"),
        round(sum(col(c).cast("decimal(38,6)")).cast("double"), 4).as(s"sum_$c"),
        expr(pct(c)).as(s"pcts_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `n_$c`, `null_$c`, `min_$c`, `max_$c`, `sum_$c`, " +
        s"round(cast(element_at(`pcts_$c`, 1) as double), 6), " +
        s"round(cast(element_at(`pcts_$c`, 2) as double), 6)"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) as " +
        "(column, n, n_null, min, max, sum, p50, p95)"))
  }

  /** Pairwise Pearson correlations for a set of numeric columns — the
    * data-card "which signals are redundant" matrix. ONE aggregation
    * pass computes every moment for every pair, then the driver folds
    * the single result row into the n·(n−1)/2 output rows — no
    * per-pair jobs, no second scan, and the only materialization is
    * one row of sums.
    *
    * Determinism contract: inputs are fixed-point scaled
    * (`round(x·10^scale)` — exact for columns with ≤`scale` decimal
    * digits; Pearson is scale-invariant so the result is unchanged),
    * every sum runs in DECIMAL(38,0) (exact integers, order-free), and
    * only the FINAL formula — (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) ·
    * √(n·Σyy − Σy²)) — runs in IEEE doubles with a fixed operation
    * order, rounded to 6. A DuckDB oracle therefore reproduces the
    * hash exactly. Rows where ANY profiled column is null are excluded
    * (complete-case, the standard matrix-consistent choice). */
  def correlationMatrix(df: DataFrame,
                        cols: Seq[String],
                        scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    val f = math.pow(10.0, scale)
    def fx(c: String) =
      round(col(c).cast("double") * f).cast("decimal(38,0)")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.flatMap { c => Seq(
        sum(fx(c)).as(s"s_$c"),
        sum(fx(c) * fx(c)).as(s"ss_$c")) } ++
      pairs.map { case (a, b) => sum(fx(a) * fx(b)).as(s"sp_${a}__$b") }
    val row = complete.agg(aggs.head, aggs.tail: _*).head()
    require(row.getAs[Long]("n") > 0L,
      "correlationMatrix: no complete rows (every row has a null in the profiled columns)")
    val n = row.getAs[Long]("n").toDouble
    def d(name: String): Double = row.getAs[java.math.BigDecimal](name).doubleValue()
    val out = pairs.map { case (a, b) =>
      val (sx, sy) = (d(s"s_$a"), d(s"s_$b"))
      val (sxx, syy, sxy) = (d(s"ss_$a"), d(s"ss_$b"), d(s"sp_${a}__$b"))
      val denom = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      val corr = if (denom == 0.0) 0.0 else (n * sxy - sx * sy) / denom
      (a, b, n.toLong,
        BigDecimal(corr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.toDF("col_x", "col_y", "n", "corr")
  }

  /** Join-key skew diagnostics — the "will this key hot-spot a 100 TB
    * shuffle" data card: per key column, row count, distinct keys, the
    * heaviest key with its count, and the skew factor max/avg (avg =
    * n/d). A factor ≫ 1 is the signal to salt that join key or lean on
    * AQE skew handling BEFORE the production run, which is exactly
    * when this profile is cheap to take. One melted (column, key)
    * rollup — two shuffles total regardless of column count, both over
    * skinny string pairs; modal ties break to the LARGER key string
    * (struct ordering), so the result is deterministic. */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "keySkew needs at least one column")
    cols.foreach { c =>
      require(!c.contains("`") && !c.contains("'"),
        s"keySkew: column name '$c' contains a quote character")
    }
    val melted = df.selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', cast(`$c` as string)").mkString(", ") +
        ") as (col_name, key)")
    melted.filter(col("key").isNotNull)
      .groupBy(col("col_name"), col("key")).agg(count(lit(1)).as("c"))
      .groupBy(col("col_name"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"),
        max(struct(col("c"), col("key"))).as("__top"))
      .select(col("col_name"), col("n"), col("n_distinct"),
        col("__top").getField("key").as("top_key"),
        col("__top").getField("c").as("top_count"),
        round(col("__top").getField("c").cast("double") *
          col("n_distinct").cast("double") / col("n").cast("double"), 6).as("skew"))
  }

  /** Categorical data-card stats, one row per column: count, nulls,
    * distinct count, lexical min/max, and the modal value with its
    * frequency (ties broken by the LARGER value — struct ordering of
    * (count, value) — so the result is deterministic and
    * oracle-pinnable). ONE aggregate pass for all
    * columns; the per-column mode comes from a (column, value) rollup —
    * two shuffles total regardless of column count.
    *
    * `approxDistinct = true` swaps exact distinct counting for HLL
    * (`approx_count_distinct`) — the 100 TB default; exact is kept for
    * the DuckDB hash compare. */
  def categoricalProfile(df: DataFrame,
                         cols: Seq[String],
                         approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "categoricalProfile needs at least one column")
    cols.foreach { c =>
      require(!c.contains("`") && !c.contains("'"),
        s"categoricalProfile: column name '$c' contains a quote character")
    }
    // melt first: (column, value) — a single skinny relation drives
    // every statistic, and value counts get map-side partial aggs
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    val melted = df.select(expr(
      s"stack(${cols.length}, $stackArgs) as (column, value)"))
    val counts = melted.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("column"))
      .agg(
        sum(when(col("value").isNotNull, col("cnt")).otherwise(0L)).as("n"),
        sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        (if (approxDistinct) approx_count_distinct(col("value")).cast("long")
         else count_distinct(col("value"))).as("n_distinct"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        // mode with a deterministic tie-break (highest count, then the
        // LARGER value — struct ordering), so the result is
        // oracle-pinnable; max_by skips rows whose ordering key is null
        max_by(col("value"), when(col("value").isNotNull,
          struct(col("cnt"), col("value")))).as("top_value"),
        max(when(col("value").isNotNull, col("cnt"))).as("top_count"))
      .orderBy(col("column"))
  }

  /** PARTIAL numeric profile — the exactly-mergeable statistics
    * (count, nulls, min, max, decimal sum) of one slice/item/partition
    * of a corpus, one row per column. At 100 TB a dataset profile is
    * never a full re-scan: each ingested item persists its partial
    * profile once ([[profileToItem]] — a few rows), and the corpus
    * profile is [[mergeNumericProfiles]] over the partials — O(items)
    * tiny reads, zero data scans. Merge algebra: n/n_null sum, min
    * min, max max, sums add EXACTLY (decimal(38,6) — no float
    * reordering drift, so merged ≡ full-scan bit-for-bit). Quantiles
    * are deliberately absent: order statistics don't merge exactly —
    * [[numericProfile]]'s GK path is the scan-time answer. min/max
    * round(·,6) commutes with min/max (monotonic), so merged values
    * equal the full-scan profile's. */
  def partialNumericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "partialNumericProfile needs at least one column")
    cols.foreach { c =>
      require(!c.contains("`") && !c.contains("'"),
        s"partialNumericProfile: column name '$c' contains a quote character")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        round(min(col(c)).cast("double"), 6).as(s"min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"max_$c"),
        sum(col(c).cast("decimal(38,6)")).cast("decimal(38,6)").as(s"sum_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `n_$c`, `null_$c`, `min_$c`, `max_$c`, `sum_$c`"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) as " +
        "(column, n, n_null, min, max, sum_part)"))
  }

  /** Merge partial profiles (any union of [[partialNumericProfile]]
    * outputs) into the corpus profile. The decimal partial sums add
    * exactly, so `sum` and the derived `mean` are independent of how
    * the corpus was sliced. */
  def mergeNumericProfiles(partials: DataFrame): DataFrame = {
    val sumD = round(sum(col("sum_part")).cast("double"), 4)
    partials.groupBy(col("column"))
      .agg(sum(col("n")).as("n"),
        sum(col("n_null")).as("n_null"),
        min(col("min")).as("min"),
        max(col("max")).as("max"),
        sumD.as("sum"),
        round(sumD / sum(col("n")).cast("double"), 6).as("mean"))
  }

  /** Persist an item's partial profile through the store (the profile
    * SIDECAR: written once at ingest, read by every later corpus
    * profile instead of the data). */
  def profileToItem(df: DataFrame, cols: Seq[String],
                    c: graft.store.Collection, item: String): Unit =
    c.write(item, partialNumericProfile(df, cols),
      indexCols = Seq("column"), overwrite = true)

  /** Corpus profile from persisted per-item partials — O(items) reads,
    * no data scan. */
  def mergedItemProfile(c: graft.store.Collection,
                        items: Seq[String]): DataFrame =
    mergeNumericProfiles(items.map(i => c.item(i).data)
      .reduce(_.unionByName(_)))

  /** Fixed-bin histogram of a numeric column over [lo, hi): bin i
    * covers [lo + i·w, lo + (i+1)·w). Values outside clamp to the edge
    * bins (the data-card convention). One groupBy on the bin id —
    * map-side combined, one shuffle of ≤ bins rows per task. */
  def histogram(df: DataFrame, c: String, bins: Int,
                lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, "histogram needs bins > 0 and hi > lo")
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(c).cast("double") - lo) / w).cast("long"), lit(0L)), lit(bins - 1L))
    df.filter(col(c).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", round(lit(lo) + col("bin") * w, 6))
      .withColumn("hi", round(lit(lo) + (col("bin") + 1) * w, 6))
      .select(col("bin"), col("lo"), col("hi"), col("n"))
      .orderBy(col("bin"))
  }
}
