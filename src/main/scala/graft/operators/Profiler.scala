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
    def pct(c: String, p: Double): String =
      if (approx) s"percentile_approx(`$c`, $p, 10000)" else s"percentile(`$c`, $p)"
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        round(min(col(c)).cast("double"), 6).as(s"min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"max_$c"),
        round(sum(col(c).cast("decimal(38,6)")).cast("double"), 4).as(s"sum_$c"),
        round(expr(pct(c, 0.5)).cast("double"), 6).as(s"p50_$c"),
        round(expr(pct(c, 0.95)).cast("double"), 6).as(s"p95_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `n_$c`, `null_$c`, `min_$c`, `max_$c`, `sum_$c`, `p50_$c`, `p95_$c`"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) as " +
        "(column, n, n_null, min, max, sum, p50, p95)"))
  }
}
