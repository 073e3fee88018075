package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-concurrent-attempt gate — the failure mode `spark.speculation`
  * creates: TWO live attempts of the same partition racing to commit, where
  * the loser's output must not reach the sink.
  *
  * A literal speculative copy CANNOT launch under local-cluster: the
  * scheduler hard-excludes a speculative attempt from any host already
  * running one (TaskSetManager.dequeueTaskFromList's hasAttemptOnHost gate),
  * and every local-cluster executor shares this host — verified against the
  * spark-core 4.1.2 bytecode. So this suite runs with speculation ON (the
  * scanner is live; its same-host launches are provably impossible) and
  * manufactures the identical hazard deterministically:
  * `killTaskAttempt(interruptThread = false)` turns attempt 0 into a ZOMBIE
  * — still running, officially dead — while the rescheduled attempt 1
  * commits the batch. The zombie then finishes and writes its duplicate
  * file anyway. Exactly-once must hold at the sink-manifest layer: a batch
  * read serves the committed 20 rows even though MORE rows exist in part-
  * files on disk (the orphan is the pin that the race really happened).
  *
  * Own forked JVM (build.sbt testGrouping): spark.speculation is read once
  * at TaskScheduler init, and a JVM holds one SparkContext.
  */
class SpeculationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  private val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
  private def launcherPresent = new java.io.File(sparkHome, "jars").isDirectory
  private def requireLauncher(): Unit = org.scalatest.Assertions.assume(
    launcherPresent,
    s"SPARK_HOME=$sparkHome has no jars/ dir; local-cluster needs a Spark " +
      "distribution (set SPARK_HOME) - cancelling the speculation group")

  override def beforeAll(): Unit = if (launcherPresent) {
    val classes = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
      .map(p => new java.io.File(p).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens java.base/$p=ALL-UNNAMED").mkString(" ")
    spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-speculation")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", opens)
      // Speculation ON with an aggressive scanner: documents that even a
      // live scanner cannot produce same-host copies (see class doc); the
      // deterministic zombie below supplies the dual-attempt race.
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.speculation.multiplier", "1.5")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var execs = Set.empty[String]
    while (execs.size < 2 && System.nanoTime() < deadline) {
      execs = ClusterProbes.executorIds(spark)
      if (execs.size < 2) Thread.sleep(500)
    }
    assert(execs.size == 2, s"expected 2 executor JVMs, saw $execs")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a zombie attempt races its replacement: sink manifest commits exactly once, duplicate file excluded") {
    requireLauncher()
    import java.nio.file.Files
    val landing = Files.createTempDirectory("graft_spec_landing")
    val out = Files.createTempDirectory("graft_spec_out").toString
    val ckpt = Files.createTempDirectory("graft_spec_ckpt").toString
    Files.write(landing.resolve("shard-000.txt"),
      (1 to 20).map(i => s"doc-$i").mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Kill (WITHOUT interrupting) the first attempt of partition 0 of the
    // 4-task write stage — but only after the zombie's marker file says
    // its drain is past the InterruptibleIterator (the last kill check on
    // its path), so the kill can only ever produce a live zombie, never a
    // clean early death.
    val marker = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_zombie_marker_${System.nanoTime()}").getPath
    val fourTaskStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sc = spark.sparkContext
    val killer = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (s.stageInfo.numTasks == 4) fourTaskStages.add(s.stageInfo.stageId)
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        if (fourTaskStages.contains(t.stageId) && t.taskInfo.index == 0 &&
            t.taskInfo.attemptNumber == 0 && killed.compareAndSet(false, true)) {
          val id = t.taskInfo.taskId
          new Thread(() => {
            val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
            while (!new java.io.File(marker).exists() &&
                   System.nanoTime() < deadline) Thread.sleep(50)
            sc.killTaskAttempt(id, interruptThread = false,
              reason = "graft-injected zombie: duplicate-attempt race")
          }, "graft-zombie-killer").start()
        }
    }
    sc.addSparkListener(killer)
    val s = spark; import s.implicits._
    val src = spark.readStream.format("graft.sources.LinesSource")
      .load(landing.toString)
      .select(col("text")).as[String].repartition(4)
    val q = ClusterProbes.drainThenStall(src, marker)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(killed.get(), "the kill never targeted a task — injection misfired")
      // Committed view: the manifest-gated batch read — exactly once.
      val rows = spark.read.parquet(out).as[String].collect().toSeq
      val want = (1 to 20).map(i => s"doc-$i")
      assert(rows.sorted == want.sortBy(identity),
        s"duplicate attempt leaked into the committed batch: ${rows.size} " +
          s"rows, ${rows.distinct.size} distinct")
      // ≥2 partition-0 attempts ran (zombie + replacement).
      assert(ClusterProbes.perJvmSlowRuns(spark) >= 2L,
        "no duplicate attempt observed — the race never happened")
      // The zombie FINISHES (~6 s stall) and writes its duplicate part-file
      // — on disk but not in the manifest. Poll for it: raw file rows must
      // EXCEED the committed view, proving the sink excluded a real
      // duplicate rather than none ever existing.
      def rawRows(): Long = {
        val parts = new java.io.File(out).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.getPath)
        if (parts.isEmpty) 0L else spark.read.parquet(parts.toIndexedSeq: _*).count()
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var raw = rawRows()
      while (raw <= want.size && System.nanoTime() < deadline) {
        Thread.sleep(500); raw = rawRows()
      }
      assert(raw > want.size,
        s"zombie's duplicate file never appeared (raw=$raw committed=${want.size}) " +
          "— the dual-attempt race was not exercised")
    } finally q.stop()
  }
}
