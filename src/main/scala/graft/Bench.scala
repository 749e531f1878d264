package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM (codegen compiler, parquet reader, shuffle paths)
    // so per-query timings measure the queries, not first-job startup.
    spark.range(2000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    def timeQuery(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

    // Machine-contention sentinel: a fixed cheap query timed at start and
    // end, plus the OS 1-min load average. A contended capture (the
    // BENCH_r04 failure mode) shows sentinel_end/sentinel_start drift >2x
    // and/or load far above the core count; such a run is invalid and must
    // be re-captured on a quiet machine (see BASELINE.md).
    val loadStart = loadAvg()
    val sentinelStart = timeQuery("q1_agg")

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val sentinelEnd = timeQuery("q1_agg")
    val loadEnd = loadAvg()

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val drift = if (sentinelStart > 0) sentinelEnd / sentinelStart else -1.0
    val sentinel =
      s""""sentinel":{"query":"q1_agg","start_sec":$sentinelStart,"end_sec":$sentinelEnd,""" +
      s""""drift":$drift,"load_avg_start":$loadStart,"load_avg_end":$loadEnd,""" +
      s""""valid":${drift >= 0 && drift <= 2.0}}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$sentinel}"""
    println(line)
    // also persist the full line: the driver captures stdout TAIL only,
    // which truncated 42 of 96 per-query timings in the round-5 capture.
    // Best-effort (overridable dir; never discard a finished capture
    // over an unwritable cwd — stdout already carried the line)
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_LAST.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
