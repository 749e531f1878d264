package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for each left row, the most recent
  * right row with the same key and right.time <= left.time.
  *
  * Composed from built-ins (preference (a) of the extension ladder —
  * no custom SparkStrategy needed): union both sides tagged, sort by
  * (key, time, side) inside a single window partition per key, and
  * carry the last-seen right row forward with `last(_, ignoreNulls)`.
  * One shuffle on the key, O(n log n) per key — the same plan shape a
  * purpose-built sort-merge as-of operator would produce, but AQE and
  * codegen apply for free.
  *
  * Key skew: `saltBuckets > 1` splits each key's LEFT rows across salt
  * buckets (deterministic hash of the left timestamp) and replicates
  * the right side into every bucket, so a hot key's window partition
  * becomes `saltBuckets` parallel partitions of bounded size instead
  * of one straggler task. Right-side cost is ×salt for every key, so
  * salt selectively (hot-key subsets) or modestly at full width.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side ("most recent as of")
    * @param key         equality key column present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightCols   columns of `right` to surface (renamed as given)
    * @param saltBuckets hot-key fan-out (1 = no salting)
    */
  def asOf(left: DataFrame,
           right: DataFrame,
           key: String,
           leftTime: String,
           rightTime: String,
           rightCols: Map[String, String],
           saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__salt",
        if (saltBuckets == 1) lit(0L)
        else pmod(xxhash64(col(leftTime)), lit(saltBuckets.toLong)))
      .withColumns(rightCols.map { case (_, out) => out -> lit(null) })
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      // every bucket must see ALL right rows of the key
      .withColumn("__salt",
        if (saltBuckets == 1) lit(0L)
        else explode(sequence(lit(0L), lit(saltBuckets - 1L))))
      .withColumns(rightCols.map { case (in, out) => out -> col(in) })
      .select((key +: "__t" +: "__side" +: "__salt" +: rightCols.values.toSeq).map(col): _*)

    val unioned = lTagged.select(
      (lTagged.columns.filterNot(rightCols.values.toSet)).map(col) ++
        rightCols.values.map(col): _*)
      .unionByName(rTagged, allowMissingColumns = true)

    // Right rows sort before left rows at equal timestamps (side 0 < 1),
    // so an exactly-simultaneous right row IS visible to the left row.
    val w = Window.partitionBy(col(key), col("__salt"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightCols.values.foldLeft(unioned) { (d, out) =>
      d.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side", "__salt")
  }
}
