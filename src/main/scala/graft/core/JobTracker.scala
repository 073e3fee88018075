package graft.core

import java.util.concurrent.atomic.AtomicReference
import scala.concurrent.{Await, Future, ExecutionContext}
import scala.concurrent.duration.Duration
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job lifecycle + progress introspection — the one place we faithfully mirror
  * the reference's API *shape*, because `getJobState` (stage + percentage) is a
  * genuine observable capability (reference `MapReduceFramework.h:6-27`,
  * `getJobState` `MapReduceFramework.cpp:383-402`).
  *
  * Mapping (SURVEY.md §7 M1.2): Spark stages don't map 1:1 onto
  * MAP/SHUFFLE/REDUCE, so shuffle-map-stage tasks report as MAP, result-stage
  * tasks as REDUCE, and the transition between them as SHUFFLE. Percentage is
  * completed/total tasks of the current phase — monotone within a phase, like
  * the reference's packed-atomic counter (whose +2 overshoot quirk and
  * mid-sort "MAP 100%" reading we deliberately do not replicate, SURVEY.md §2.1).
  */
object JobTracker {

  sealed abstract class Stage(val name: String)
  case object UNDEFINED extends Stage("UNDEFINED")
  case object MAP       extends Stage("MAP")
  case object SHUFFLE   extends Stage("SHUFFLE")
  case object REDUCE    extends Stage("REDUCE")

  /** ≡ reference `JobState{stage, percentage}` (`MapReduceFramework.h:10-13`). */
  final case class JobState(stage: Stage, percentage: Float)

  /** Opaque handle ≡ reference `JobHandle` (`MapReduceFramework.h:6`):
    * async start, poll `getJobState`, idempotent `waitForJob`, `close`.
    */
  final class JobHandle[T] private[JobTracker] (
      spark: SparkSession,
      listener: Listener,
      future: Future[T]) {

    def getJobState: JobState = listener.state.get()

    /** Blocks until the job finishes; idempotent like the reference's
      * first-waiter-joins contract (`MapReduceFramework.cpp:355-381`).
      */
    def waitForJob(): T = Await.result(future, Duration.Inf)

    /** ≡ `closeJobHandle` (`MapReduceFramework.cpp:404-414`): wait + release.
      * The listener is released even when the job failed — user-code errors
      * (reference Y3: the C++ framework exits the process; we surface them
      * as the wait's exception) must not leak a SparkListener per failure.
      */
    def close(): T =
      try waitForJob()
      finally spark.sparkContext.removeSparkListener(listener)
  }

  private final class Listener(group: String) extends SparkListener {
    val state = new AtomicReference[JobState](JobState(UNDEFINED, 0f))
    // stageId -> (isResultStage, totalTasks, completedTasks, startedTasks)
    private val stages = scala.collection.concurrent.TrieMap
      .empty[Int, (Boolean, Int, Int, Int)]
    private val myStages = scala.collection.concurrent.TrieMap.empty[Int, Boolean]
    @volatile private var done = false

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      if (e.properties != null &&
          group == e.properties.getProperty("spark.jobGroup.id")) {
        // last stage in the job's DAG is the result stage (shuffle-readers
        // downstream of every map stage) → REDUCE; all others → MAP.
        val resultId = e.stageInfos.map(_.stageId).max
        e.stageInfos.foreach { si =>
          myStages.put(si.stageId, si.stageId == resultId)
        }
      }
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      myStages.get(e.stageId).foreach { isResult =>
        stages.updateWith(e.stageId) {
          case Some((r, t, c, s)) => Some((r, t, c + 1, s))
          case None               => Some((isResult, 0, 1, 0))
        }
        refresh()
      }

    override def onTaskStart(e: SparkListenerTaskStart): Unit =
      myStages.get(e.stageId).foreach { isResult =>
        stages.updateWith(e.stageId) {
          case Some((r, t, c, s)) => Some((r, t, c, s + 1))
          case None               => Some((isResult, 0, 0, 1))
        }
        refresh()
      }

    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      myStages.get(e.stageInfo.stageId).foreach { isResult =>
        stages.updateWith(e.stageInfo.stageId) {
          case Some((r, _, c, s)) => Some((r, e.stageInfo.numTasks, c, s))
          case None               => Some((isResult, e.stageInfo.numTasks, 0, 0))
        }
        refresh()
      }

    def markDone(): Unit = { done = true; refresh() }

    private def refresh(): Unit = {
      val snap = stages.readOnlySnapshot().values.toSeq
      val (reduceStages, mapStages) = snap.partition(_._1)
      def pct(ss: Seq[(Boolean, Int, Int, Int)], f: ((Boolean, Int, Int, Int)) => Int): Float = {
        val total = ss.map(_._2).sum
        val n = ss.map(f).sum
        if (total <= 0) 0f else math.min(100f, n.toFloat / total * 100f)
      }
      val next =
        if (done) JobState(REDUCE, 100f)
        else if (reduceStages.exists(_._3 > 0))
          JobState(REDUCE, pct(reduceStages, _._3))
        else if (mapStages.nonEmpty && pct(mapStages, _._3) >= 100f)
          // Within-shuffle progress ≙ the reference's pairs-grouped counter
          // (`MapReduceFramework.cpp:192,205`): a reduce task's shuffle fetch
          // begins at task start, so started/total approximates grouping %.
          JobState(SHUFFLE, pct(reduceStages, _._4))
        else if (mapStages.nonEmpty) JobState(MAP, pct(mapStages, _._3))
        else JobState(UNDEFINED, 0f)
      state.set(next)
    }
  }

  /** ≡ `startMapReduceJob` (`MapReduceFramework.cpp:322-353`): kick off the
    * action asynchronously under a dedicated job group and return immediately.
    */
  def start[T](spark: SparkSession, desc: String = "graft-job")(
      action: => T): JobHandle[T] = {
    val group = s"graft-${java.util.UUID.randomUUID()}"
    val listener = new Listener(group)
    spark.sparkContext.addSparkListener(listener)
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fut = Future {
      spark.sparkContext.setJobGroup(group, desc, interruptOnCancel = true)
      try action
      finally {
        spark.sparkContext.clearJobGroup()
        listener.markDone()
      }
    }
    new JobHandle(spark, listener, fut)
  }
}
