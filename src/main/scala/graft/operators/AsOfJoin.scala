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
  * codegen apply for free. Key-skew at scale is handled the usual way
  * (salt the key, or pre-bucket both sides on it).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side ("most recent as of")
    * @param key       equality key column present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightCols columns of `right` to surface (renamed as given)
    */
  def asOf(left: DataFrame,
           right: DataFrame,
           key: String,
           leftTime: String,
           rightTime: String,
           rightCols: Map[String, String]): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(rightCols.map { case (_, out) => out -> lit(null) })
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumns(rightCols.map { case (in, out) => out -> col(in) })
      .select((key +: "__t" +: "__side" +: rightCols.values.toSeq).map(col): _*)

    val unioned = lTagged.select(
      (lTagged.columns.filterNot(rightCols.values.toSet)).map(col) ++
        rightCols.values.map(col): _*)
      .unionByName(rTagged, allowMissingColumns = true)

    // Right rows sort before left rows at equal timestamps (side 0 < 1),
    // so an exactly-simultaneous right row IS visible to the left row.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightCols.values.foldLeft(unioned) { (d, out) =>
      d.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }
}
