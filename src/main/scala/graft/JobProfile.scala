package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-clock attribution of one query's steady-state
  * invocation — where Profile.scala answers "how much", this answers "which
  * job". Runs the regex-selected queries `reps` times in a warmed session
  * and, for the LAST rep of each, prints every Spark job with its duration,
  * stage/task counts and callsite — the receipt that shows WHICH of a DML
  * lifecycle's actions (discovery join, rewrite write, stats scan, …) the
  * per-invocation seconds go to, plus the job-free driver gaps (manifest
  * I/O, commit fsync) as the remainder. Usage:
  *   runMain graft.JobProfile <sfDir> <nameRegex> [reps=3]
  */
object JobProfile {
  private case class JobRec(id: Int, desc: String, started: Long,
                            var ended: Long = -1L, var stages: Int = 0,
                            var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nameFilter = if (args.length > 1) args(1) else ".*"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionEnv.applyMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (recording.get) {
          val d = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs.put(j.jobId, JobRec(j.jobId, d, j.time))
          j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId)
        if (r != null) r.ended = j.time
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(s.stageInfo.stageId, -1)
        val r = jobs.get(jid)
        if (r != null) { r.stages += 1; r.tasks += s.stageInfo.numTasks }
      }
    })

    val qs = SparkEntry.queries.filter(_._1.matches(nameFilter)).toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) =>
      (1 until reps).foreach { _ => fn(spark, sfDir).count() }
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      jobs.clear(); stageToJob.clear()
      recording.set(true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      recording.set(false)
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      println(f"\n===== $name steady-state rep: wall $wall%.3f s =====")
      import scala.jdk.CollectionConverters._
      val rs = jobs.values.asScala.toSeq.sortBy(_.started)
      var prevEnd = -1L
      var jobSum = 0.0
      rs.foreach { r =>
        val dur = (r.ended - r.started) / 1e3
        jobSum += math.max(0.0, dur)
        val gap = if (prevEnd > 0) f"${(r.started - prevEnd) / 1e3}%7.3f" else "      -"
        prevEnd = r.ended
        println(f"  job ${r.id}%4d ${dur}%7.3f s  gap-before $gap s  " +
          f"stages ${r.stages}%2d tasks ${r.tasks}%4d  ${r.desc.take(110)}")
      }
      println(f"  [${rs.size} jobs, job time $jobSum%.3f s, " +
        f"driver/gaps ${wall - jobSum}%.3f s]")
    }
    spark.stop()
  }
}
