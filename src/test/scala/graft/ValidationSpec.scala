package graft

import graft.store.ValidationError
import graft.validation._

/** Validation rules — mirrors reference tests/test_pr77_features.py:374-459. */
class ValidationSpec extends SparkSpec {

  import spark.implicits._

  test("passing validator is silent; failing collects ALL errors in one raise") {
    val df = Seq((1.0, 2.0), (3.0, -4.0)).toDF("a", "b")
    DataValidator(ColumnExistsRule(Seq("a", "b"))).validate(df)

    val err = intercept[ValidationError] {
      DataValidator(
        ColumnExistsRule(Seq("a", "missing")),
        RangeRule("b", min = Some(0.0)),
        NoNullRule(Seq("a"))).validate(df)
    }
    assert(err.errors.size == 2) // missing column + range violation; no-null passes
  }

  test("range rule catches out-of-bounds values") {
    val df = Seq(1.0, 5.0, 11.0).toDF("x")
    intercept[ValidationError] {
      DataValidator(RangeRule("x", min = Some(0.0), max = Some(10.0))).validate(df)
    }
    DataValidator(RangeRule("x", min = Some(0.0), max = Some(11.0))).validate(df)
  }

  test("no-null and unique rules") {
    val withNull = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    intercept[ValidationError] { DataValidator(NoNullRule(Seq("x"))).validate(withNull) }
    val dups = Seq(1, 2, 2).toDF("x")
    intercept[ValidationError] { DataValidator(UniqueRule(Seq("x"))).validate(dups) }
    DataValidator(UniqueRule(Seq("x"))).validate(Seq(1, 2, 3).toDF("x"))
  }

  test("dtype rule") {
    val df = Seq((1, "s")).toDF("i", "s")
    DataValidator(DataTypeRule(Map("i" -> "int", "s" -> "str"))).validate(df)
    intercept[ValidationError] {
      DataValidator(DataTypeRule(Map("i" -> "float"))).validate(df)
    }
  }

  test("sorted-index rule") {
    val sorted = Seq(1, 2, 3).toDF("index")
    val unsorted = Seq(1, 3, 2).toDF("index")
    DataValidator(SortedIndexRule("index")).validate(sorted)
    intercept[ValidationError] { DataValidator(SortedIndexRule("index")).validate(unsorted) }
  }

  test("financial validator accepts valid OHLCV, rejects high<low and negatives") {
    val good = Seq((10.0, 12.0, 9.0, 11.0, 100.0)).toDF("Open", "High", "Low", "Close", "Volume")
    DataValidator.financial().validate(good)
    val badOhlc = Seq((10.0, 8.0, 9.0, 11.0, 100.0)).toDF("Open", "High", "Low", "Close", "Volume")
    intercept[ValidationError] { DataValidator.financial().validate(badOhlc) }
    val negative = Seq((10.0, 12.0, 9.0, 11.0, -5.0)).toDF("Open", "High", "Low", "Close", "Volume")
    intercept[ValidationError] { DataValidator.financial().validate(negative) }
  }

  test("custom rule") {
    val df = Seq(1, 2).toDF("x")
    val rule = CustomRule("at_least_3_rows",
      d => if (d.count() < 3) Some("need >= 3 rows") else None)
    intercept[ValidationError] { DataValidator(rule).validate(df) }
  }

  test("validator wired into the write path rejects bad data") {
    val c = tempCollection("validated_write")
    val bad = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), -1.0))
      .toDF("index", "value")
    intercept[ValidationError] {
      c.write("item", bad, validator = Some(DataValidator(RangeRule("value", min = Some(0.0)))))
    }
    assert(!c.hasItem("item"))
    cleanup(c)
  }

  test("duplicate column names rejected at write") {
    val c = tempCollection("dup_cols")
    val df = sampleData.select(org.apache.spark.sql.functions.col("index"),
      org.apache.spark.sql.functions.col("value1"),
      org.apache.spark.sql.functions.col("value1"))
    intercept[ValidationError] { c.write("item", df) }
    cleanup(c)
  }
}
