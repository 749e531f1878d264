package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{Collection, FsOps, GraftStore}

/** Shared one-per-JVM SparkSession + temp-store helpers for all suites. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def tempCollection(tag: String): Collection = {
    val root = Files.createTempDirectory(s"graft_test_$tag")
    GraftStore(spark, "s", root).collection("c")
  }

  def sf(name: String): DataFrame =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  /** Deterministic 100-row daily time-series frame — mirrors the
    * reference suite's `sample_data` fixture (tests/conftest.py:40-48). */
  def sampleData: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (0 until 100).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()),
        rng.nextGaussian(), rng.nextGaussian() * 100.0, Seq("A", "B", "C")(rng.nextInt(3)))
    }.toDF("index", "value1", "value2", "category")
  }

  def collect2[A, B](df: DataFrame): Seq[(A, B)] =
    df.collect().toSeq.map(r => (r.get(0).asInstanceOf[A], r.get(1).asInstanceOf[B]))

  def cleanup(c: Collection): Unit =
    c.path.parent.parent.deleteRecursively()
}
