package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver's verify/bench harness: one parquet
  * dataset per TPC-H-ish table under the given sf dir (TESTDATA.md).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
