package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: time a regex-selected subset of SparkEntry.queries N times in
  * one warmed session — separates real per-query cost from JIT/GC noise that
  * single-shot Bench numbers can't. `runMain graft.Profile <sfDir> <regex>
  * [reps=3] [jsonOut]`.
  *
  * With `jsonOut`, the last rep of each query also attributes EXECUTOR-side
  * metrics (task run time, shuffle bytes read/written, spill) via a task-end
  * listener, and one JSON object per query is written to the file — the
  * driver-vs-local bench attributability artifact (PROFILE_r9.json): a
  * driver-side wall number far above the local wall at similar execMs means
  * environment (page cache, CPU contention), while a matching execMs growth
  * means the plan itself got more expensive — a code regression.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nameFilter = if (args.length > 1) args(1) else ".*"
    val reps = if (args.length > 2) args(2).toInt else 3
    val jsonOut = if (args.length > 3) Some(args(3)) else None
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

    // Task-end accumulator: zeroed (by re-reading baselines) around each
    // timed run; the listener bus is drained before every read so trailing
    // events can't leak into the next query's numbers.
    object acc extends SparkListener {
      val runMs = new java.util.concurrent.atomic.AtomicLong(0)
      val gcMs = new java.util.concurrent.atomic.AtomicLong(0)
      val shufRead = new java.util.concurrent.atomic.AtomicLong(0)
      val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
      val spill = new java.util.concurrent.atomic.AtomicLong(0)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        }
      }
      def snapshot(): (Long, Long, Long, Long, Long) = {
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        (runMs.get, gcMs.get, shufRead.get, shufWrite.get, spill.get)
      }
    }
    spark.sparkContext.addSparkListener(acc)

    val qs = SparkEntry.queries.filter(_._1.matches(nameFilter)).toSeq.sortBy(_._1)
    val records = qs.map { case (name, fn) =>
      val walls = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"TIMING $name run$i $w%.2f s")
        w
      }
      // The extra metered reps exist only to feed the JSON artifact — skip
      // them in plain timing mode (r9 review catch: it silently made every
      // query run reps+1 times).
      if (jsonOut.isEmpty) name -> (walls, 0.0, 0L, 0L, 0L, 0L, 0L)
      else {
        // THREE metered reps, keep the one with the least executor run
        // time: executorRunTime includes JVM GC pauses, and a full GC
        // landing inside a single metered rep inflates exec_ms ~3× run to
        // run (measured r13: 3.9 s vs 11.1 s for the same query at the
        // same commit). min-of-N plus the separate gc_ms field makes the
        // artifact attributable; shuffle bytes are identical across reps
        // so the kept rep's bytes are THE bytes.
        val metered = (1 to 3).map { _ =>
          val before = acc.snapshot()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val wMetered = (System.nanoTime() - t0) / 1e9
          val after = acc.snapshot()
          (wMetered, after._1 - before._1, after._2 - before._2,
           after._3 - before._3, after._4 - before._4, after._5 - before._5)
        }
        val best = metered.minBy(_._2)
        name -> (walls, best._1, best._2, best._3, best._4, best._5, best._6)
      }
    }
    jsonOut.foreach { path =>
      val body = records.map { case (name, (walls, wM, ms, gc, sr, sw, sp)) =>
        val ws = walls.map(w => f"$w%.3f").mkString("[", ",", "]")
        f"""  "$name": {"wall": $ws, "wall_metered": $wM%.3f, "exec_ms": $ms, "gc_ms": $gc, "shuffle_read_b": $sr, "shuffle_write_b": $sw, "spill_b": $sp}"""
      }.mkString("{\n", ",\n", s""",\n  "_meta": {"sf": "$sfDir", "cpus": $cpus, "reps": $reps, "metered": "min-of-3 by exec_ms"}\n}\n""")
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PROFILE written to $path")
    }
    spark.stop()
  }
}
