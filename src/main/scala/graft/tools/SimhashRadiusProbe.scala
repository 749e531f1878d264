package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Diagnostic (not part of the query surface): measures the Hamming
  * distance distribution of TRUE near-dup pairs (exact n-gram Jaccard
  * ≥ τ via the recall-guaranteed PPJoin operator) under both the 64-
  * and 128-bit SimHash signatures, to size the fixed search radius
  * honestly. See PLANS.md (dedup_simhash). */
object SimhashRadiusProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    val aug = d.unionByName(
      d.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1))))

    val truePairs = Dedup.ngramJaccardPairs(aug, threshold = 0.5, k = 3)
      .select(col("id_a"), col("id_b"))
    val sigs = aug.select(col("doc_id").as("id"),
      Dedup.simhash128(col("text")).as("s128"),
      Dedup.simhash(col("text")).as("s64"))

    val joined = truePairs
      .join(sigs.select(col("id").as("id_a"), col("s128").as("s128_a"), col("s64").as("s64_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("s128").as("s128_b"), col("s64").as("s64_b")), Seq("id_b"))
      .select(
        Dedup.hamming128(col("s128_a"), col("s128_b")).as("h128"),
        Dedup.hamming64(col("s64_a"), col("s64_b")).as("h64"))
      .cache()

    val n = joined.count()
    println(s"TRUE_PAIRS=$n")
    joined.agg(max(col("h128")).as("max_h128"), max(col("h64")).as("max_h64"),
        expr("percentile(h128, array(0.5, 0.9, 0.99, 1.0))").as("h128_pct"),
        expr("percentile(h64, array(0.5, 0.9, 0.99, 1.0))").as("h64_pct"))
      .show(false)
    println("h128 histogram (tail):")
    joined.groupBy(col("h128")).count().orderBy(col("h128").desc).show(30, false)
    println("h64 tail > 6:")
    println(joined.filter(col("h64") > 6).count())
    spark.stop()
  }
}
