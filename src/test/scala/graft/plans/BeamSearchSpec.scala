package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType, FloatType}

/** BeamSearchExec — the broadcast graph-ANN serving operator: traversal
  * semantics vs an independent reference walk, the broadcast-exchange plan
  * guarantee (the whole point of the operator: index via guarded exchange,
  * never a driver collect), the compact-payload schema pin, and the
  * once-per-broadcast executor index memo.
  */
class BeamSearchSpec extends SparkSpec {

  import spark.implicits._

  // Tiny 2-layer graph: 12 nodes on layer 0, nodes {0, 5, 9} also on layer
  // 1. Codes are 4-dim SQ8 byte vectors chosen so scores are distinct
  // enough to exercise ordering and ties break on id.
  private val dim = 4
  private def codeOf(id: Long): Array[Byte] =
    Array.tabulate(dim)(i => (((id + 1) * (i + 3)) % 23 - 11).toByte)

  private val layer0: Map[Long, Seq[Long]] = Map(
    0L -> Seq(1L, 2L, 5L), 1L -> Seq(0L, 3L), 2L -> Seq(0L, 4L, 6L),
    3L -> Seq(1L, 7L), 4L -> Seq(2L, 8L), 5L -> Seq(0L, 6L, 9L),
    6L -> Seq(2L, 5L, 10L), 7L -> Seq(3L, 11L), 8L -> Seq(4L, 9L),
    9L -> Seq(5L, 8L, 10L), 10L -> Seq(6L, 9L, 11L), 11L -> Seq(7L, 10L))
  private val layer1: Map[Long, Seq[Long]] = Map(
    0L -> Seq(5L, 9L), 5L -> Seq(0L, 9L), 9L -> Seq(0L, 5L))

  private val schedule = Seq((1, 1, 1), (0, 3, 2))
  private val entryId = 0L

  private def indexDf = (0L to 11L).map { id =>
    (id, codeOf(id).toSeq,
      Seq(layer0.getOrElse(id, Seq.empty), layer1.getOrElse(id, Seq.empty)))
  }.toDF("vec_id", "q", "adj")

  private def probesDf(ids: Seq[Long]) = ids.map { id =>
    (id, codeOf(id).toSeq, entryId)
  }.toDF("p_id", "pq", "entry_id")

  /** Independent reference walk of the identical beam rule. */
  private def reference(pid: Long): Seq[(Long, Long)] = {
    val pq = codeOf(pid)
    def iscore(id: Long): Long =
      codeOf(id).zip(pq).map { case (a, b) => a.toLong * b.toLong }.sum
    val adjOf: (Int, Long) => Seq[Long] = {
      case (0, id) => layer0.getOrElse(id, Seq.empty)
      case (_, id) => layer1.getOrElse(id, Seq.empty)
    }
    var beam = List(entryId)
    for ((layer, width, hops) <- schedule; _ <- 1 to hops) {
      val cand = (beam ++ beam.flatMap(adjOf(layer, _))).distinct
      beam = cand.sortBy(id => (-iscore(id), id)).take(width)
    }
    beam.map(pid -> _)
  }

  private def run(probeIds: Seq[Long]): Set[(Long, Long)] =
    GraftOps.beamSearch(probesDf(probeIds), indexDf,
        ("p_id", "pq", "entry_id"), ("vec_id", "q", "adj"), schedule)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("traversal matches an independent reference walk for every probe") {
    val got = run(0L to 11L)
    val want = (0L to 11L).flatMap(reference).toSet
    assert(got == want, s"got $got\nwant $want")
  }

  test("plan shape: native exec, index side through BroadcastExchange (guarded), no cartesian") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = GraftOps.beamSearch(probesDf(Seq(1L, 2L)), indexDf,
        ("p_id", "pq", "entry_id"), ("vec_id", "q", "adj"), schedule)
      val plan = df.queryExecution.executedPlan
      assert(plan.exists {
        case e: BeamSearchExec =>
          e.right.isInstanceOf[BroadcastExchangeExec] ||
            e.right.isInstanceOf[ReusedExchangeExec]
        case _ => false
      }, s"no BroadcastExchange under BeamSearchExec:\n$plan")
      assert(!plan.toString.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("broadcast payload is compact: byte codes, no float/double columns") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = GraftOps.beamSearch(probesDf(Seq(1L)), indexDf,
        ("p_id", "pq", "entry_id"), ("vec_id", "q", "adj"), schedule)
      val exec = df.queryExecution.executedPlan
        .collectFirst { case e: BeamSearchExec => e }.get
      val rightTypes = exec.right.schema.fields.map(_.dataType)
      assert(rightTypes.contains(ArrayType(ByteType, containsNull = true)) ||
        rightTypes.contains(ArrayType(ByteType, containsNull = false)),
        s"index codes must be 1-byte SQ8, got ${rightTypes.mkString(", ")}")
      val cat = exec.right.schema.catalogString
      assert(!cat.contains("double") && !cat.contains("float"),
        s"raw float vectors must never ride the serving broadcast: $cat")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("graph index is decoded once per broadcast, not once per probe task") {
    val before = BeamSearchExec.buildCount.get()
    val wide = probesDf(0L to 11L).repartition(16)
    val got = GraftOps.beamSearch(wide, indexDf,
        ("p_id", "pq", "entry_id"), ("vec_id", "q", "adj"), schedule)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L to 11L).flatMap(reference).toSet)
    val builds = BeamSearchExec.buildCount.get() - before
    assert(builds == 1, s"expected 1 index decode for 16 probe tasks, saw $builds")
  }

  test("dangling neighbors and nodes missing from the index are tolerated") {
    // Node 20 appears only as a neighbor (no codes row): it must sink to
    // the bottom of the beam (score MIN), never crash the traversal.
    val idx = indexDf.unionByName(
      Seq((12L, codeOf(12L).toSeq, Seq(Seq(20L), Seq.empty[Long])))
        .toDF("vec_id", "q", "adj"))
    val got = GraftOps.beamSearch(probesDf(Seq(3L)), idx,
        ("p_id", "pq", "entry_id"), ("vec_id", "q", "adj"), schedule)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == reference(3L).toSet)
  }
}
