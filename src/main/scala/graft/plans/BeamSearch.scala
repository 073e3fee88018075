package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension #3 (SURVEY §2 custom-operator ladder,
  * rung (c)): layered greedy beam search over a BROADCAST compact graph
  * index — the ANN graph-serving operator (HNSW-class; Malkov & Yashunin,
  * TPAMI 2018).
  *
  * The index side carries, per corpus node, its SQ8 code vector (1 byte per
  * dim — the FAISS scalar-quantization serving substrate, q199) and its
  * per-layer adjacency lists; the probe side streams. Beam comparisons are
  * the INTEGER code dot product — exact arithmetic, so an oracle can replay
  * the identical traversal — and the caller exact-re-ranks the final beam
  * in full precision (the SQ-then-rerank recipe).
  *
  * Scale shape this operator exists for: the index reaches executors
  * through a real `BroadcastExchangeExec` (planned by EnsureRequirements
  * from the BroadcastDistribution below, like BroadcastRangeJoinExec) —
  * driver-memory accounting, the hard too-large-to-broadcast error instead
  * of a silent OOM, async build, and plan-tree reuse all come with it. No
  * driver-side `collect()` of corpus-sized data anywhere: the per-executor
  * hash index is derived FROM THE BROADCAST VALUE, once per executor
  * (SoftReference memo on the broadcast id, the RangeJoin pattern). At
  * billion-vector scale the same operator runs behind a routing join with
  * the index sharded per executor group; the probe-side code path is
  * unchanged.
  */
case class BeamSearchNode(
    probeId: Expression,
    probeCode: Expression,
    entryId: Expression,
    nodeId: Expression,
    nodeCode: Expression,
    nodeAdj: Expression,
    schedule: Seq[(Int, Int, Int)],
    outProbe: AttributeReference,
    outCand: AttributeReference,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(schedule.nonEmpty, "beamSearch: empty schedule")
  override def output: Seq[Attribute] = Seq(outProbe, outCand)
  // Both output attrs are born here, not consumed from below.
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BeamSearchNode =
    copy(left = newLeft, right = newRight)
}

/** Per-node entry of the executor-local index: SQ8 codes (byte per dim) and
  * adjacency as one long-array per layer (dense, index = layer). Read-only
  * after construction — safe across the executor's task threads.
  */
private[plans] final case class BeamGraphNode(code: Array[Byte], adj: Array[Array[Long]])

case class BeamSearchExec(
    probeId: Expression,
    probeCode: Expression,
    entryId: Expression,
    nodeId: Expression,
    nodeCode: Expression,
    nodeAdj: Expression,
    schedule: Seq[(Int, Int, Int)],
    outProbe: AttributeReference,
    outCand: AttributeReference,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = Seq(outProbe, outCand)

  /** Index side planned as a real BroadcastExchangeExec — see class doc. */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val bcRows = right.executeBroadcast[Array[InternalRow]]()
    val (lOut, rOut) = (left.output, right.output)
    val (pidE, pcodeE, entE) = (probeId, probeCode, entryId)
    val (nidE, ncodeE, nadjE) = (nodeId, nodeCode, nodeAdj)
    val sched = schedule
    val outAttrs = output
    left.execute().mapPartitions({ iter =>
      val idx = BeamSearchExec.indexFor(bcRows.id) {
        val proj = UnsafeProjection.create(Seq(nidE, ncodeE, nadjE), rOut)
        val m = new java.util.HashMap[java.lang.Long, BeamGraphNode](
          bcRows.value.length * 2)
        bcRows.value.foreach { r =>
          val p = proj(r)
          if (!p.isNullAt(0) && !p.isNullAt(1)) {
            val code = p.getArray(1).toByteArray()
            val adj: Array[Array[Long]] =
              if (p.isNullAt(2)) Array.empty
              else {
                val a = p.getArray(2)
                Array.tabulate(a.numElements()) { i =>
                  if (a.isNullAt(i)) Array.empty[Long] else a.getArray(i).toLongArray()
                }
              }
            m.put(p.getLong(0), BeamGraphNode(code, adj))
          }
        }
        m
      }
      val inProj = UnsafeProjection.create(Seq(pidE, pcodeE, entE), lOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val outRow = new GenericInternalRow(2)
      iter.flatMap { probe =>
        val in = inProj(probe)
        val pid = in.getLong(0)
        val pq = in.getArray(1).toByteArray()
        val entry = in.getLong(2)
        // Integer SQ8 dot product — the beam comparator. Exact arithmetic:
        // ties break on id, so the traversal is engine-replayable.
        def iscore(id: Long): Long = {
          val n = idx.get(id)
          if (n == null) Long.MinValue
          else {
            val q = n.code
            // Ragged code arrays (a probe longer than an index node) would
            // otherwise surface as an ArrayIndexOutOfBounds deep inside a
            // task — fail diagnosably instead.
            if (q.length != pq.length) throw new IllegalStateException(
              s"beamSearch: probe $pid code dim ${pq.length} != node $id " +
                s"code dim ${q.length} — index and probes quantized differently")
            var s = 0L; var i = 0
            while (i < pq.length) { s += pq(i).toLong * q(i).toLong; i += 1 }
            s
          }
        }
        var beam = List(entry)
        for ((layer, width, hops) <- sched; _ <- 1 to hops) {
          val cand = (beam ++ beam.flatMap { id =>
            val n = idx.get(id)
            if (n == null || layer >= n.adj.length) Array.empty[Long] else n.adj(layer)
          }).distinct
          beam = cand.sortBy(id => (-iscore(id), id)).take(width)
        }
        beam.map { c =>
          outRow.setLong(0, pid)
          outRow.setLong(1, c)
          outProj(outRow).copy()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BeamSearchExec =
    copy(left = newLeft, right = newRight)
}

object BeamSearchExec {
  // Executor-local memo of the decoded graph index, keyed by broadcast id.
  // SoftReference values (the RangeJoin convention): reclaimable under
  // memory pressure, rebuilt from the broadcast blocks by the next task —
  // the cache trades CPU only, never risks an OOM the uncached path
  // wouldn't. One contract (fixed column roles) per broadcast, so the id
  // alone is a sufficient key.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    java.lang.Long, java.lang.ref.SoftReference[java.util.HashMap[java.lang.Long, BeamGraphNode]]]()
  /** Builds observed by this JVM — lets tests pin one-build-per-broadcast. */
  private[plans] val buildCount = new java.util.concurrent.atomic.AtomicLong(0)

  private[plans] def indexFor(bcId: Long)(
      build: => java.util.HashMap[java.lang.Long, BeamGraphNode])
      : java.util.HashMap[java.lang.Long, BeamGraphNode] = {
    val ref = cache.get(bcId)
    val hit = if (ref != null) ref.get() else null
    if (hit != null) hit
    else {
      // Drop entries whose SoftReference the GC already cleared so a
      // long-lived executor serving many distinct indexes doesn't
      // accumulate dead map slots.
      cache.entrySet().removeIf(e => e.getValue.get() == null)
      // compute() locks per KEY: a rebuild of one index never serializes
      // decodes of a DIFFERENT broadcast on the same executor (tasks of
      // unrelated queries share this JVM-wide cache).
      var built: java.util.HashMap[java.lang.Long, BeamGraphNode] = null
      cache.compute(bcId, (_, prev) => {
        val again = if (prev != null) prev.get() else null
        if (again != null) { built = again; prev }
        else {
          built = build
          buildCount.incrementAndGet()
          new java.lang.ref.SoftReference(built)
        }
      })
      built
    }
  }
}

object BeamSearchStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BeamSearchNode(pid, pcode, ent, nid, ncode, nadj, sched, op, oc, l, r) =>
      BeamSearchExec(pid, pcode, ent, nid, ncode, nadj, sched, op, oc,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
