package graft.tools

import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic (guide §1): per-JOB wall-clock breakdown of one query —
  * how many Spark jobs it launches, how long each runs, and the gaps
  * between them (driver-side work: planning, collects, fs ops).
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     tools/run_main.sh graft.tools.JobProfile ann_ivf_build
  * Prints one line per job (start offset, duration, #stages, #tasks,
  * shuffle bytes) plus the query's total and the summed job time; the
  * difference is driver-side time the jobs don't cover. */
object JobProfile {
  final case class JobRec(id: Int, start: Long, var end: Long = 0L,
                          var stages: Int = 0, var tasks: Int = 0,
                          var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L,
                          var desc: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val r = JobRec(js.jobId, js.time)
        r.stages = js.stageInfos.size
        val site = js.stageInfos.sortBy(-_.stageId).headOption.map(_.name).getOrElse("")
        // the submitting (main) thread is blocked in the action right
        // now — its graft frames name the phase that launched this job
        val graftFrames = Thread.getAllStackTraces.values.asScala
          .flatMap(_.toSeq).filter { e =>
            val c = e.getClassName
            c.startsWith("graft.") && !c.startsWith("graft.tools")
          }.map(e => s"${e.getClassName.stripPrefix("graft.")}.${e.getMethodName}:${e.getLineNumber}")
          .take(4).mkString("<")
        r.desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("") + " @" + site + " | " + graftFrames
        jobs.put(js.jobId, r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId); if (r != null) r.end = je.time
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        // attribute stage totals to the job that owns it (best-effort:
        // local mode runs jobs mostly sequentially)
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val it = jobs.values().iterator()
          var latest: JobRec = null
          while (it.hasNext) { val r = it.next(); if (r.end == 0L && (latest == null || r.start > latest.start)) latest = r }
          if (latest != null) {
            latest.tasks += sc.stageInfo.numTasks
            latest.shuffleRead += m.shuffleReadMetrics.totalBytesRead
            latest.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    }

    for (name <- args; rep <- 1 to reps) {
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = System.currentTimeMillis() - t0
      Thread.sleep(200) // let listener events drain
      spark.sparkContext.removeSparkListener(listener)
      val recs = jobs.values().toArray(Array.empty[JobRec]).sortBy(_.start)
      println(s"=== $name rep$rep rows=$n total=${total}ms jobs=${recs.length}")
      var prevEnd = t0
      var jobSum = 0L
      var gapSum = 0L
      for (r <- recs) {
        val dur = math.max(0L, r.end - r.start)
        val gap = math.max(0L, r.start - prevEnd)
        jobSum += dur; gapSum += gap
        val d = if (r.desc.length > 160) r.desc.take(160) else r.desc
        println(f"  job${r.id}%4d +${r.start - t0}%6dms gap=${gap}%5dms dur=${dur}%6dms stages=${r.stages}%2d tasks=${r.tasks}%4d shW=${r.shuffleWrite}%9d shR=${r.shuffleRead}%9d  $d")
        prevEnd = math.max(prevEnd, r.end)
      }
      val tail = math.max(0L, t0 + total - prevEnd)
      println(f"  SUM jobs=${jobSum}ms gaps=${gapSum}ms tailAfterLastJob=${tail}ms total=${total}ms")
    }
    spark.stop()
  }
}
