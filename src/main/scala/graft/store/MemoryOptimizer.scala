package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-size optimizer (reference: pystore/memory.py:156-232 / G2):
  * downcast integer/float columns to the narrowest type that holds the
  * observed value range.
  *
  * The reference shrinks pandas memory; here the win is smaller Parquet
  * pages + smaller shuffle rows. One aggregate pass computes min/max of
  * every numeric column (single job, no per-column scans), then the
  * casts are free column expressions. The reference's
  * "low-cardinality → categorical" rule needs no equivalent: Parquet
  * dictionary encoding already does it on disk.
  */
object MemoryOptimizer {

  def shrinkTypes(df: DataFrame): DataFrame = {
    val intCols = df.schema.fields.filter(_.dataType == LongType).map(_.name)
    val dblCols = df.schema.fields.filter(_.dataType == DoubleType).map(_.name)
    if (intCols.isEmpty && dblCols.isEmpty) return df

    val aggs = intCols.flatMap(c => Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))) ++
      dblCols.flatMap(c => Seq(min(abs(col(c))).as(s"__amin_$c"), max(abs(col(c))).as(s"__amax_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val shrunkInts = intCols.foldLeft(df) { (d, c) =>
      val lo = Option(row.getAs[Any](s"__min_$c")).map(_.asInstanceOf[Long]).getOrElse(0L)
      val hi = Option(row.getAs[Any](s"__max_$c")).map(_.asInstanceOf[Long]).getOrElse(0L)
      val target =
        if (lo >= Byte.MinValue && hi <= Byte.MaxValue) Some(ByteType)
        else if (lo >= Short.MinValue && hi <= Short.MaxValue) Some(ShortType)
        else if (lo >= Int.MinValue && hi <= Int.MaxValue) Some(IntegerType)
        else None
      target.fold(d)(t => d.withColumn(c, col(c).cast(t)))
    }
    // float64 → float32 only when magnitudes fit float32's exact-ish
    // range; lossy in general, mirroring the reference's behavior.
    dblCols.foldLeft(shrunkInts) { (d, c) =>
      val amax = Option(row.getAs[Any](s"__amax_$c")).map(_.asInstanceOf[Double]).getOrElse(0.0)
      if (amax < 1e30) d.withColumn(c, col(c).cast(FloatType)) else d
    }
  }

  /** Estimated bytes per row from the schema (driver-side, no scan). */
  def estimatedRowBytes(df: DataFrame): Int =
    df.schema.fields.map(_.dataType.defaultSize).sum
}
