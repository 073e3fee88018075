package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Whole-operator Catalyst extension #2 (SURVEY §2 custom-operator ladder,
  * rung (c)): broadcast interval join — `probe.ts ∈ [build.lo, build.hi)`
  * with NO equi key.
  *
  * Spark's built-in plan for a pure range predicate is
  * BroadcastNestedLoopJoin: every probe row is compared against EVERY
  * interval — O(n·m) comparisons. This operator sorts the broadcast
  * intervals by `lo` once and binary-searches per probe row, walking down
  * only while a running prefix-max of `hi` can still cover the probe —
  * O(n·(log m + matches)) like a proper interval index. At 100 TB of events
  * against thousands of maintenance/incident windows that is the difference
  * between 10⁹·10⁴ comparisons and 10⁹·14.
  *
  * Same piece layout as TopKPerKey: logical node, physical exec, planner
  * strategy (registered in `GraftExtensions`), `GraftOps` surface. Interval
  * columns must be long-backed (LONG / TIMESTAMP / TIMESTAMP_NTZ), checked
  * at construction.
  */
case class RangeJoinNode(
    probeTs: Expression,
    buildLo: Expression,
    buildHi: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  private def longBacked(t: DataType): Boolean = t match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  require(Seq(probeTs, buildLo, buildHi).forall(e => !e.resolved || longBacked(e.dataType)),
    s"rangeJoin: ts/lo/hi must be LONG or TIMESTAMP, got " +
      s"${Seq(probeTs, buildLo, buildHi).map(_.dataType)}")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

case class BroadcastRangeJoinExec(
    probeTs: Expression,
    buildLo: Expression,
    buildHi: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output

  /** The build side is planned as a real `BroadcastExchangeExec` (inserted
    * by EnsureRequirements from this distribution), not a raw
    * executeCollect: the exchange brings driver-memory accounting, the
    * too-large-to-broadcast guard (hard 8 GB / 512M-row error instead of a
    * silent driver OOM), async build with timeout, and plan-tree reuse —
    * two range joins over the same dimension share ONE broadcast via
    * ReuseExchange.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val bcRows = right.executeBroadcast[Array[InternalRow]]()
    val (lOut, rOut) = (left.output, right.output)
    val (tsE, loE, hiE) = (probeTs, buildLo, buildHi)
    // Driver-side part of the memo key: two range joins sharing one
    // broadcast via ReuseExchange may still index different lo/hi columns.
    val exprKey = 31 * loE.semanticHash() + hiE.semanticHash()
    left.execute().mapPartitions({ iter =>
      // Index — sort by lo + prefix-max of hi — is derived from the
      // broadcast value ONCE PER EXECUTOR (memoized on broadcast id +
      // interval exprs): broadcast.value is already executor-shared, so
      // re-deriving O(m log m) per task would be pure redundancy.
      // maxHi(i) = max(his(0..i)) is the walk-down stop bound: once every
      // interval at or before i ends ≤ ts, none can cover ts.
      val idx = BroadcastRangeJoinExec.indexFor(bcRows.id, exprKey, loE, hiE) {
        val loProj = UnsafeProjection.create(Seq(loE), rOut)
        val hiProj = UnsafeProjection.create(Seq(hiE), rOut)
        val tuples = bcRows.value.flatMap { r =>
          val l = loProj(r)
          if (l.isNullAt(0)) None
          else {
            val lo = l.getLong(0)
            val h = hiProj(r)
            if (h.isNullAt(0)) None else Some((lo, h.getLong(0), r))
          }
        }.sortBy(_._1)
        val maxHi = new Array[Long](tuples.length)
        var m = Long.MinValue
        var j = 0
        while (j < tuples.length) { m = math.max(m, tuples(j)._2); maxHi(j) = m; j += 1 }
        IntervalIndex(tuples.map(_._1), tuples.map(_._2), tuples.map(_._3), maxHi)
      }
      val (los, his, rows) = (idx.los, idx.his, idx.rows)
      val maxHi = idx.maxHi
      val tsProj = UnsafeProjection.create(Seq(tsE), lOut)
      val outProj = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)
      val joined = new JoinedRow
      // rightmost insertion point: #entries with lo <= ts
      def upperBound(v: Long): Int = {
        var lo = 0; var hi = los.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (los(mid) <= v) lo = mid + 1 else hi = mid
        }
        lo
      }
      iter.flatMap { probe =>
        val t = tsProj(probe)
        if (t.isNullAt(0)) Iterator.empty
        else {
          val ts = t.getLong(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          var i = upperBound(ts) - 1
          while (i >= 0 && maxHi(i) > ts) {
            if (his(i) > ts) out += outProj(joined(probe, rows(i))).copy()
            i -= 1
          }
          out.iterator
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** The derived build-side index: intervals sorted by lo, with the prefix-max
  * of hi for the probe walk-down bound. Read-only after construction
  * (plain long arrays + references into the broadcast row array), so safe
  * to share across the executor's task threads.
  */
final case class IntervalIndex(
    los: Array[Long], his: Array[Long], rows: Array[InternalRow], maxHi: Array[Long])

/** Cache entry: the index plus the canonicalized interval expressions it was
  * built from. The map key uses a 32-bit semanticHash of those expressions;
  * the stored expressions make a hash collision detectable (two range joins
  * sharing one broadcast via ReuseExchange but indexing different columns)
  * instead of silently serving the wrong index.
  */
private[plans] final case class CachedIndex(
    lo: Expression, hi: Expression, index: IntervalIndex)

object BroadcastRangeJoinExec {
  // Executor-local memo of the interval index, keyed by (broadcast id,
  // lo/hi semantic hash). SoftReference values: the executor may reclaim an
  // index under memory pressure and the next task rebuilds it — the cache
  // can only trade CPU, never cause an OOM the uncached path wouldn't.
  // Entries die with the executor, like the broadcast blocks they index.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), java.lang.ref.SoftReference[CachedIndex]]()
  /** Builds observed by this JVM — lets tests pin one-build-per-broadcast. */
  private[plans] val buildCount = new java.util.concurrent.atomic.AtomicLong(0)

  // A hit is only reused after a semanticEquals check against the stored
  // canonicalized expressions: the 32-bit exprKey alone could collide across
  // two joins reusing one broadcast, and a collision must cost a rebuild,
  // never wrong join output. A mismatching entry is returned uncached (no
  // replacement) so two colliding joins don't thrash each other's entry.
  private[plans] def indexFor(bcId: Long, exprKey: Int, lo: Expression, hi: Expression)(
      build: => IntervalIndex): IntervalIndex = {
    val key = (bcId, exprKey)
    def matches(c: CachedIndex): Boolean =
      c.lo.semanticEquals(lo) && c.hi.semanticEquals(hi)
    val ref = cache.get(key)
    val hit = if (ref != null) ref.get() else null
    if (hit != null && matches(hit)) hit.index
    else cache.synchronized { // one build per executor, not one per racing task
      val again = cache.get(key)
      val h2 = if (again != null) again.get() else null
      if (h2 != null && matches(h2)) h2.index
      else {
        val built = build
        buildCount.incrementAndGet()
        if (h2 == null) // keep the first owner's entry on hash collision
          cache.put(key, new java.lang.ref.SoftReference(CachedIndex(lo.canonicalized, hi.canonicalized, built)))
        built
      }
    }
  }
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(ts, lo, hi, l, r) =>
      BroadcastRangeJoinExec(ts, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
