package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BroadcastRangeJoinExec vs the built-in nested-loop spelling: identical
  * result sets on overlapping / nested / duplicate-lo / empty-match / null
  * inputs, plus the plan-shape guarantees (native exec present, no
  * BroadcastNestedLoopJoin, no CartesianProduct).
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val intervals = Seq(
    // (win_id, lo, hi) — overlapping, nested, duplicate lo, empty window
    (1L, 0L, 10L), (2L, 5L, 15L), (3L, 5L, 7L), (4L, 20L, 30L), (5L, 40L, 40L))
  private val points = Seq(
    (100L, 0L), (101L, 5L), (102L, 6L), (103L, 9L), (104L, 10L),
    (105L, 14L), (106L, 25L), (107L, 35L), (108L, 40L))

  private def build = intervals.toDF("win_id", "lo", "hi")
  private def probe = points.toDF("ev_id", "ts")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("ev_id", "win_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the built-in range join exactly (half-open [lo, hi))") {
    val native = GraftOps.broadcastRangeJoin(probe, build, "ts", "lo", "hi")
    val builtin = probe.join(build, col("ts") >= col("lo") && col("ts") < col("hi"))
    assert(pairsOf(native) == pairsOf(builtin))
    // spot-check the semantics corners: ts=10 is OUT of [0,10), ts=40 out
    // of the empty [40,40), ts=5 hits both lo=5 windows and the [0,10) one
    val p = pairsOf(native)
    assert(!p.contains((104L, 1L)) && !p.contains((108L, 5L)))
    assert(p.intersect(Set((101L, 1L), (101L, 2L), (101L, 3L))).size == 3)
  }

  test("null timestamps and null interval bounds drop out (inner-join semantics)") {
    val probeN = (points.map { case (i, t) => (i, Option(t)) } :+ (999L, Option.empty[Long]))
      .toDF("ev_id", "ts")
    val buildN = (intervals.map { case (w, l, h) => (w, Option(l), Option(h)) } :+
      (998L, Option.empty[Long], Option(50L))).toDF("win_id", "lo", "hi")
    val native = GraftOps.broadcastRangeJoin(probeN, buildN, "ts", "lo", "hi")
    val builtin = probeN.join(buildN, col("ts") >= col("lo") && col("ts") < col("hi"))
    assert(pairsOf(native) == pairsOf(builtin))
    assert(!pairsOf(native).exists(p => p._1 == 999L || p._2 == 998L))
  }

  test("empty build side yields an empty result, not a failure") {
    val native = GraftOps.broadcastRangeJoin(
      probe, build.filter(col("win_id") < 0), "ts", "lo", "hi")
    assert(native.count() == 0)
  }

  test("timestamp-typed columns work (long-backed internal representation)") {
    val b = build.select(col("win_id"),
      timestamp_micros(col("lo") * 1000000).as("lo"),
      timestamp_micros(col("hi") * 1000000).as("hi"))
    val p = probe.select(col("ev_id"), timestamp_micros(col("ts") * 1000000).as("ts"))
    val native = GraftOps.broadcastRangeJoin(p, b, "ts", "lo", "hi")
    val builtin = p.join(b, col("ts") >= col("lo") && col("ts") < col("hi"))
    assert(pairsOf(native) == pairsOf(builtin))
  }

  test("plan shape: native exec, no nested loop, no cartesian") {
    val native = GraftOps.broadcastRangeJoin(probe, build, "ts", "lo", "hi")
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), s"native exec missing: $plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("build side goes through BroadcastExchange (accounted, guarded, reusable)") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    // Pin the STATIC planner shape (EnsureRequirements + ReuseExchange):
    // under AQE the same structure lives inside AdaptiveSparkPlanExec — a
    // leaf wrapper that plan traversal cannot descend into.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val native = GraftOps.broadcastRangeJoin(probe, build, "ts", "lo", "hi")
      val one = native.queryExecution.executedPlan
      assert(one.exists {
        case e: BroadcastRangeJoinExec =>
          e.right.isInstanceOf[BroadcastExchangeExec] ||
            e.right.isInstanceOf[ReusedExchangeExec]
        case _ => false
      }, s"no BroadcastExchange under the exec:\n$one")
      // exchange REUSE across plan subtrees: two range joins over the same
      // build relation plan exactly one materialized broadcast — the second
      // is a ReusedExchange. The concrete win over raw executeCollect.
      val both = GraftOps.broadcastRangeJoin(probe, build, "ts", "lo", "hi")
        .unionAll(GraftOps.broadcastRangeJoin(probe, build, "ts", "lo", "hi"))
      val plan2 = both.queryExecution.executedPlan
      val builds = plan2.collect { case e: BroadcastExchangeExec => e }
      val reused = plan2.collect { case e: ReusedExchangeExec => e }
      assert(builds.size == 1 && reused.nonEmpty,
        s"expected 1 build + reuse, got builds=${builds.size} reused=${reused.size}:\n$plan2")
      assert(pairsOf(both).nonEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("composes with Structured Streaming as a stream-static join") {
    // The strategy is session-registered, so IncrementalExecution plans the
    // node per micro-batch like any stream-static broadcast join: the
    // static interval index is rebuilt per batch, no streaming state.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val native = GraftOps.broadcastRangeJoin(
      ms.toDF().toDF("ev_id", "ts"), build, "ts", "lo", "hi")
    val q = native.writeStream.format("memory").queryName("t_range_join")
      .outputMode("append").start()
    try {
      ms.addData(points.take(4)); q.processAllAvailable()
      ms.addData(points.drop(4)); q.processAllAvailable()
      val streamed = pairsOf(spark.table("t_range_join"))
      val batch = pairsOf(
        probe.join(build, col("ts") >= col("lo") && col("ts") < col("hi")))
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("interval index is built once per broadcast, not once per probe task") {
    // The executor-local memo: a 16-partition probe must derive the sorted
    // index exactly once (local mode shares one JVM, so buildCount sees
    // every task's build).
    val before = BroadcastRangeJoinExec.buildCount.get()
    val wideProbe = probe.repartition(16)
    val native = GraftOps.broadcastRangeJoin(wideProbe, build, "ts", "lo", "hi")
    val builtin = wideProbe.join(build, col("ts") >= col("lo") && col("ts") < col("hi"))
    assert(pairsOf(native) == pairsOf(builtin))
    val builds = BroadcastRangeJoinExec.buildCount.get() - before
    assert(builds == 1, s"expected 1 index build for 16 probe tasks, saw $builds")
  }

  test("rejects non-long-backed bound columns at construction") {
    val bad = build.select(col("win_id"), col("lo").cast("string").as("lo"), col("hi"))
    intercept[IllegalArgumentException] {
      GraftOps.broadcastRangeJoin(probe, bad, "ts", "lo", "hi").collect()
    }
  }
}
