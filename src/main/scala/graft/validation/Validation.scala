package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ValidationError

/** Constraint-checking rules (reference: pystore/validation.py).
  *
  * Design: every data-touching rule contributes *aggregate columns* to a
  * single `df.agg(...)` pass, so validating N rules costs ONE job and
  * ONE scan of the data (the reference runs one pandas pass per rule —
  * validation.py:114-199). Schema-only rules (column existence, dtype)
  * never touch data at all. At 100 TB this is the difference between one
  * full scan and R full scans.
  */
sealed trait Rule {
  def name: String
  /** Schema-level check; None = pass, Some(err) = fail fast, no scan. */
  def schemaCheck(df: DataFrame): Option[String] = None
  /** Aggregate columns to evaluate in the shared single pass; paired
    * with a validator over the computed values. */
  def aggregates(df: DataFrame): Seq[(Column, Any => Option[String])] = Nil
  /** Whole-frame custom check (CustomRule only — may run its own job). */
  def frameCheck(df: DataFrame): Option[String] = None
}

/** R1 (validation.py:51-64). */
final case class ColumnExistsRule(columns: Seq[String]) extends Rule {
  val name = "column_exists"
  override def schemaCheck(df: DataFrame): Option[String] = {
    val missing = columns.filterNot(df.columns.contains)
    if (missing.nonEmpty) Some(s"missing required columns: ${missing.mkString(",")}") else None
  }
}

/** R2 (validation.py:67-101). expected ∈ {float,int,str,timestamp,bool}. */
final case class DataTypeRule(types: Map[String, String]) extends Rule {
  val name = "data_type"
  private def ok(dt: DataType, expected: String): Boolean = expected match {
    case "float"     => dt == DoubleType || dt == FloatType
    case "int"       => dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    case "str"       => dt == StringType
    case "timestamp" => dt == TimestampType || dt == DateType
    case "bool"      => dt == BooleanType
    case _           => false
  }
  override def schemaCheck(df: DataFrame): Option[String] = {
    val bad = types.toSeq.flatMap { case (c, t) =>
      df.schema.find(_.name == c) match {
        case None    => Some(s"$c absent")
        case Some(f) => if (ok(f.dataType, t)) None
                        else Some(s"$c is ${f.dataType.simpleString}, expected $t")
      }
    }
    if (bad.nonEmpty) Some(s"dtype violations: ${bad.mkString("; ")}") else None
  }
}

/** R3 (validation.py:104-145): min/max bounds per column, one aggregate
  * `sum(when(out_of_range,1))` per column — all in the shared pass (A3). */
final case class RangeRule(column: String,
                           min: Option[Double] = None,
                           max: Option[Double] = None) extends Rule {
  val name = s"range($column)"
  override def aggregates(df: DataFrame): Seq[(Column, Any => Option[String])] = {
    if (!df.columns.contains(column)) return Seq((lit(0L), _ => Some(s"$column absent")))
    val c = col(column)
    val oob = (min.map(c < _).toSeq ++ max.map(c > _).toSeq).reduce(_ || _)
    Seq((sum(when(oob, 1L).otherwise(0L)), {
      case n: Long if n > 0 => Some(s"$column: $n value(s) outside [${min.getOrElse("-inf")}, ${max.getOrElse("inf")}]")
      case _                => None
    }))
  }
}

/** R4 (validation.py:148-172): no nulls (A4). */
final case class NoNullRule(columns: Seq[String]) extends Rule {
  val name = "no_null"
  override def aggregates(df: DataFrame): Seq[(Column, Any => Option[String])] =
    columns.filter(df.columns.contains).map { c =>
      (count(when(col(c).isNull, 1)), (v: Any) => v match {
        case n: Long if n > 0 => Some(s"$c: $n null(s)")
        case _                => None
      })
    }
}

/** R5 (validation.py:175-199): column values unique (A5).
  * count(*) vs count(distinct c) in the shared pass — no groupBy job. */
final case class UniqueRule(columns: Seq[String]) extends Rule {
  val name = "unique"
  override def aggregates(df: DataFrame): Seq[(Column, Any => Option[String])] =
    columns.filter(df.columns.contains).map { c =>
      (count(col(c)) - countDistinct(col(c)), (v: Any) => v match {
        case n: Long if n > 0 => Some(s"$c: $n duplicate value(s)")
        case _                => None
      })
    }
}

/** R6 (validation.py:202-215): arbitrary DataFrame => Option[error]. */
final case class CustomRule(name: String, check: DataFrame => Option[String]) extends Rule {
  override def frameCheck(df: DataFrame): Option[String] = check(df)
}

/** A9 (validation.py:318-325): index monotonically non-decreasing.
  * One window pass: any(lag(index) > index). */
final case class SortedIndexRule(indexCol: String) extends Rule {
  val name = "sorted_index"
  override def frameCheck(df: DataFrame): Option[String] = {
    if (!df.columns.contains(indexCol)) return Some(s"$indexCol absent")
    import org.apache.spark.sql.expressions.Window
    // "Is the frame sorted?" is a question about the frame's CURRENT
    // row order, so capture that order first (monotonically increasing
    // ids are ordered within and across partitions in row order), then
    // look for an inversion. Single ordered window partition — exact
    // but single-threaded; fine for validation-sized batches. At scale,
    // compare per-partition [min,max] boundaries instead.
    val w = Window.orderBy(col("__pos"))
    val bad = df.select(col(indexCol))
      .withColumn("__pos", monotonically_increasing_id())
      .withColumn("__prev", lag(col(indexCol), 1).over(w))
      .filter(col("__prev") > col(indexCol)).limit(1).count()
    if (bad > 0) Some(s"$indexCol is not sorted") else None
  }
}

/** A7 (validation.py:351-363): OHLC relationship — one aggregate pass. */
final case class OhlcRule(open: String = "Open", high: String = "High",
                          low: String = "Low", close: String = "Close") extends Rule {
  val name = "ohlc"
  override def aggregates(df: DataFrame): Seq[(Column, Any => Option[String])] = {
    val cols = Seq(open, high, low, close)
    if (!cols.forall(df.columns.contains))
      return Seq((lit(0L), _ => Some(s"OHLC columns missing: ${cols.filterNot(df.columns.contains).mkString(",")}")))
    val h = col(high); val l = col(low); val o = col(open); val c = col(close)
    val bad = h < l || h < o || h < c || l > o || l > c
    Seq((sum(when(bad, 1L).otherwise(0L)), {
      case n: Long if n > 0 => Some(s"$n row(s) violate OHLC relationships")
      case _                => None
    }))
  }
}

/** R7 (validation.py:218-261): ordered rule list; collects ALL failures
  * then raises one ValidationError. Data-touching aggregate rules share
  * one scan. */
final class DataValidator(rules: Seq[Rule], enabled: Boolean = true) {
  def validate(df: DataFrame): Unit = {
    if (!enabled) return
    val schemaErrs = rules.flatMap(r => r.schemaCheck(df).map(e => s"${r.name}: $e"))

    val aggEntries = rules.flatMap { r => r.aggregates(df).map(a => (r.name, a)) }
    val aggErrs =
      if (aggEntries.isEmpty) Nil
      else {
        val row = df.agg(aggEntries.head._2._1, aggEntries.tail.map(_._2._1): _*).head()
        aggEntries.zipWithIndex.flatMap { case ((rn, (_, check)), i) =>
          val v = if (row.isNullAt(i)) 0L else row.get(i)
          check(v).map(e => s"$rn: $e")
        }
      }

    val frameErrs = rules.flatMap(r => r.frameCheck(df).map(e => s"${r.name}: $e"))

    val all = schemaErrs ++ aggErrs ++ frameErrs
    if (all.nonEmpty)
      throw new ValidationError(s"validation failed: ${all.mkString("; ")}", all)
  }
}

object DataValidator {
  def apply(rules: Rule*): DataValidator = new DataValidator(rules)

  /** Prebuilt time-series validator (reference validation.py:301-327 / R8). */
  def timeseries(indexCol: String = "index", valueCols: Seq[String]): DataValidator =
    new DataValidator(Seq(
      ColumnExistsRule(indexCol +: valueCols),
      NoNullRule(valueCols),
      SortedIndexRule(indexCol)))

  /** Prebuilt financial OHLCV validator (reference validation.py:330-371 / R9). */
  def financial(open: String = "Open", high: String = "High", low: String = "Low",
                close: String = "Close", volume: String = "Volume"): DataValidator = {
    val cols = Seq(open, high, low, close, volume)
    new DataValidator(Seq(
      ColumnExistsRule(cols),
      NoNullRule(cols),
      OhlcRule(open, high, low, close)) ++
      cols.map(c => RangeRule(c, min = Some(0.0))))
  }
}
