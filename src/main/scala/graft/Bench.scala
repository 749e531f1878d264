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

    // Hypervisor CPU steal — the contention mode the q1 sentinel CANNOT
    // see: a cheap single-shuffle query barely moves under steal while
    // sustained all-core phases inflate 2-5x. /proc/stat's 8th cpu
    // field counts jiffies the hypervisor withheld; the start→end delta
    // as a fraction of total elapsed jiffies is the run's steal share.
    // (total, steal, busy) jiffies: busy = total - idle - iowait — what
    // SOMETHING on the machine was computing. Compared against THIS
    // JVM's own CPU time it yields the other-process share, the signal
    // that sees mid-run contention CONTINUOUSLY (a q1 sentinel can land
    // in calm gaps; the round-8 249.8 s capture passed max_drift ≤ 2
    // with 8x single-query inflation exactly that way).
    def cpuJiffies(): Option[(Long, Long, Long)] =
      try {
        val line = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/stat")).get(0)
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        val idle = (if (f.length > 3) f(3) else 0L) + (if (f.length > 4) f(4) else 0L)
        Some((f.sum, if (f.length > 7) f(7) else 0L, f.sum - idle))
      } catch { case _: Exception => None }
    def processCpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }

    // Machine-contention sentinel: a fixed cheap query timed at start,
    // at the end, AND every `SentinelEvery` queries mid-run, plus the
    // OS 1-min load average sampled alongside. The round-6 driver
    // capture passed a start/end-only sentinel while a sustained
    // mid-run contention phase inflated the all-core queries ~50% — the
    // mid-run samples see exactly that window. A capture is valid only
    // if EVERY sentinel sample stays within 2x of the first.
    val SentinelEvery = 25
    val loadStart = loadAvg()
    val jiffiesStart = cpuJiffies()
    val procCpuStart = processCpuNs()
    val wallStart = System.nanoTime()
    val sentinelStart = timeQuery("q1_agg")
    val midSentinels = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    var loadMax = math.max(loadStart, 0.0)

    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names (exact match)
    // restricting the run — used for the sf1.0 headline-family tier so
    // the scaled capture times the stats-adaptive paths, not all 113.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = names.zipWithIndex.map { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      loadMax = math.max(loadMax, loadAvg())
      if ((i + 1) % SentinelEvery == 0 && i + 1 < names.size) {
        midSentinels += ((i + 1, timeQuery("q1_agg"), loadAvg()))
        loadMax = math.max(loadMax, midSentinels.last._3)
      }
      name -> sec
    }

    val sentinelEnd = timeQuery("q1_agg")
    val loadEnd = loadAvg()
    loadMax = math.max(loadMax, loadEnd)

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val allSentinels = midSentinels.map(_._2).toSeq :+ sentinelEnd
    val drift = if (sentinelStart > 0) sentinelEnd / sentinelStart else -1.0
    val maxDrift =
      if (sentinelStart > 0 && allSentinels.nonEmpty) allSentinels.max / sentinelStart
      else -1.0
    val midJson = midSentinels
      .map { case (at, sec, load) => s"""{"after":$at,"sec":$sec,"load_avg":$load}""" }
      .mkString("[", ",", "]")
    // steal share of the whole capture window; -1 when /proc/stat is
    // unavailable (non-Linux). >10% means the hypervisor withheld a
    // material slice of the machine mid-run — all-core query times are
    // inflated even if every q1 sentinel stayed in band.
    val jiffiesEnd = cpuJiffies()
    val stealPct = (jiffiesStart, jiffiesEnd) match {
      case (Some((t0, s0, _)), Some((t1, s1, _))) if t1 > t0 =>
        (s1 - s0).toDouble / (t1 - t0).toDouble * 100.0
      case _ => -1.0
    }
    // Other-process CPU share of the machine over the WHOLE capture:
    // busy jiffies minus this JVM's own CPU time, as a fraction of
    // elapsed capacity. Clean runs read 1-3% (kernel + sbt overhead); a
    // co-tenant burning cores mid-run shows here even when every q1
    // sample landed in a calm gap. USER_HZ is 100 on every Linux this
    // runs on (sysconf(_SC_CLK_TCK)); /proc/stat jiffies are 10 ms.
    val procCpuEnd = processCpuNs()
    val wallNs = System.nanoTime() - wallStart
    val otherBusyPct = (jiffiesStart, jiffiesEnd) match {
      case (Some((_, _, b0)), Some((_, _, b1)))
          if procCpuStart >= 0 && procCpuEnd >= 0 && wallNs > 0 =>
        val busyNs = (b1 - b0) * 10000000.0 // 10 ms per jiffy
        val otherNs = math.max(0.0, busyNs - (procCpuEnd - procCpuStart))
        otherNs / (wallNs.toDouble * Runtime.getRuntime.availableProcessors()) * 100.0
      case _ => -1.0
    }
    // Validity gate (round 9, tightened after the round-8 contended
    // capture passed): every q1 sample within 1.5x of start (was 2x),
    // hypervisor steal <= 10%, other-process busy share <= 10%. The
    // 1-min load ceiling (cpus/2) applies ONLY when other_busy is
    // unmeasurable: loadavg cannot distinguish the bench's own all-core
    // phases from a co-tenant (a legitimate sf1 capture on 32 cpus read
    // loadavg 19.5 with other_busy 1.6% — self-load, valid), so it is
    // the fallback proxy, not a primary signal. Unmeasurable signals
    // (-1) don't veto: they are absent, not bad.
    val nCpus = Runtime.getRuntime.availableProcessors()
    val isValid = maxDrift >= 0 && maxDrift <= 1.5 &&
      stealPct <= 10.0 && otherBusyPct <= 10.0 &&
      (otherBusyPct >= 0 || loadMax <= nCpus / 2.0)
    val sentinel =
      s""""sentinel":{"query":"q1_agg","start_sec":$sentinelStart,"end_sec":$sentinelEnd,""" +
      s""""drift":$drift,"mid_samples":$midJson,"max_drift":$maxDrift,""" +
      s""""load_avg_start":$loadStart,"load_avg_end":$loadEnd,"proc_loadavg_max":$loadMax,""" +
      s""""cpu_steal_pct":$stealPct,"other_busy_pct":$otherBusyPct,""" +
      s""""valid":$isValid}"""
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
