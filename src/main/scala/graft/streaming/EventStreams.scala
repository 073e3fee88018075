package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import java.sql.Timestamp

/** Structured-Streaming surface over `events` (SURVEY.md §2.2 "Streaming").
  *
  * Every transformation is a plain DataFrame→DataFrame function, so the SAME
  * code runs in batch (the oracle-checked twins in queries/EventAnalytics)
  * and on an unbounded `readStream` source — the core Structured Streaming
  * contract. State never exceeds the window/session bound + watermark slack,
  * so the streaming plans hold at an arbitrary event rate: aggregations are
  * partial-aggregated per key and windows expire once the watermark passes.
  */
object EventStreams {

  /** The events schema, pinned (Tables.scala rule: schema inference re-reads
    * the data and can drift). `ts` is TIMESTAMP(MICROS) in the current
    * fixture generation, and the STREAMING source requires that generation:
    * a pinned schema is applied to every arriving file as-is, so pre-r8
    * INT64-nanos event fixtures are NOT readable here. (Only the batch path
    * — Tables.events — probes the footer and normalizes older nanos files;
    * a landing directory fed by current producers never contains them.)
    */
  val eventSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Unbounded file-source twin of `Tables.events` (same normalized schema).
    * `path` is a DIRECTORY of event parquet part-files — the deployment
    * shape (a landing directory that producers append files to; Spark's
    * streaming file source rejects a bare file path). The schema is the
    * pinned `eventSchema`, NOT inferred: inference does a batch read of the
    * path, which throws on a still-empty landing directory instead of
    * idling until the first file arrives. `maxFilesPerTrigger=1` keeps
    * micro-batches bounded.
    */
  def readEventStream(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Tumbling 1-hour windows per event type. */
  def tumblingByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
              col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows advancing every 30 minutes (each event lands in
    * exactly two windows).
    */
  def slidingByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Built-in session windows: 30-minute gap per user. Spark semantics: a
    * session ends at last-event-time + gap; an event at exactly
    * session-end starts a NEW session (windows merge only on overlap).
    */
  def sessionByUser(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
              col("session_window.start").as("s_start"),
              col("session_window.end").as("s_end"),
              col("n_events"), col("sum_value"))

  /** Watermarked tumbling counts — the streaming-only variant: events later
    * than `delay` behind the max seen ts are dropped once their window
    * closes. Used by the MemoryStream tests; batch ignores watermarks.
    */
  def tumblingWithWatermark(events: DataFrame, delay: String): DataFrame =
    tumblingByType(events.withWatermark("ts", delay))

  /** `foreachBatch` serving sink: each micro-batch of UPDATED tumbling
    * aggregates is merged into a parquet "serving table" via dynamic
    * partition overwrite, partitioned by (w_start, event_type) — the
    * aggregate's own key — so every updated row REPLACES its partition
    * whole. That makes the sink idempotent: replaying a micro-batch (after
    * a crash between sink commit and checkpoint commit, Structured
    * Streaming's at-least-once window) rewrites the same partitions with
    * the same content instead of duplicating rows — the standard
    * exactly-once recipe for file sinks that can't transact. At scale each
    * micro-batch touches only the partitions it updated; the table serves
    * point lookups without reading the stream's history.
    */
  def serveTumblingCounts(outDir: String): (DataFrame, Long) => Unit = {
    // Returned as the (batch, id) => Unit function so tests and production
    // wire-up share it: .writeStream.outputMode("update").foreachBatch(f).
    (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("w_start", "event_type")
        .parquet(outDir)
  }

  /** Stream-stream interval join: for each click, the same user's purchases
    * within the following hour. In streaming, BOTH sides carry watermarks
    * and the time-bound condition lets Spark expire join state — the only
    * shape under which unbounded stream-stream joins hold memory-stable.
    * In batch it is a plain range join on (user, time interval).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                          col("event_id").as("c_id"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                             col("event_id").as("p_id"), col("value").as("p_value"))
    c.join(p, col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") < col("c_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Hour-BUCKETED batch form of the interval join: same rows as
    * `clickToPurchase`, different plan. The naive range join is an
    * equi-join on user_id with the time window as a post-filter, so one hot
    * user costs O(clicks_u × purchases_u) comparisons in ONE task — the
    * combined-axis skew corpus (hot user × 10× events) measured it at
    * 37 s / 177× baseline for a linear-sized output. Bucketing both sides
    * by ⌊epoch/3600⌋ (purchases into their own and the PREVIOUS bucket —
    * p ∈ [c, c+1h) ⇒ bucket(p) ∈ {bucket(c), bucket(c)+1}, so a click's
    * bucket always appears among the purchase's two, and at most one of
    * them matches ⇒ no duplicate pairs) makes (user, bucket) the equi key:
    * per-task work is bounded by per-hour key density, the hot user spreads
    * over its active hours, and the window filter keeps semantics
    * identical. Buckets come from the FRACTIONAL epoch (cast to double) —
    * second-truncated arithmetic can put a boundary pair two buckets apart.
    * The streaming twin needs no such rewrite: its state store already
    * prunes by watermark, which is time-bucketing in disguise.
    */
  def clickToPurchaseBucketed(clicks: DataFrame, purchases: DataFrame,
      outer: Boolean = false): DataFrame = {
    def bkt(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(ts.cast("double") / 3600d)
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                          col("event_id").as("c_id"))
      .withColumn("c_bkt", bkt(col("c_ts")))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                             col("event_id").as("p_id"), col("value").as("p_value"))
      .withColumn("p_bkt", explode(array(bkt(col("p_ts")), bkt(col("p_ts")) - 1)))
    c.join(p, col("c_user") === col("p_user") &&
              col("c_bkt") === col("p_bkt") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") < col("c_ts") + expr("INTERVAL 1 HOUR"),
           if (outer) "left_outer" else "inner")
      .drop("c_bkt", "p_bkt")
  }

  /** Left-outer stream-stream interval join: every click, with its same-user
    * purchases in the following hour — clicks that never convert surface
    * with NULL purchase columns. In streaming this is the semantics the
    * inner variant can't give: the NULL row is emitted only once the
    * purchase-side watermark passes c_ts + 1h (the click can provably never
    * match), which is exactly the state-cleanup bound, so per-key state
    * stays O(interval) on both sides. In batch the same code is a plain
    * left outer range join.
    */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                          col("event_id").as("c_id"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                             col("event_id").as("p_id"), col("value").as("p_value"))
    c.join(p, col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") < col("c_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
  }

  /** FULL outer stream-stream interval join — both unmatched sides
    * surface: clicks that never convert (NULL purchase columns, emitted
    * once the purchase watermark passes c_ts + 1h) AND purchases with no
    * preceding same-user click (NULL click columns, emitted once the click
    * watermark passes p_ts — a purchase can only match clicks in the hour
    * BEFORE it, so its "provably unmatched" bound is its own timestamp).
    * Same state-cleanup story as the left-outer variant, applied on both
    * sides; per-key state stays O(interval).
    */
  def clickToPurchaseFullOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                          col("event_id").as("c_id"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                             col("event_id").as("p_id"), col("value").as("p_value"))
    c.join(p, col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") < col("c_ts") + expr("INTERVAL 1 HOUR"), "full_outer")
  }

  /** Stream-static enrichment: join the unbounded event stream to a static
    * (bounded) dimension. The static side is broadcast and re-planned per
    * micro-batch — no streaming state at all, so this holds at any event
    * rate; the dim just has to stay broadcast-sized (it's a dimension
    * table — it does). In batch the same code is a plain broadcast join.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"))
      .withColumn("weighted_value", round(col("value") * col("weight"), 2))

  /** Streaming twin of the incremental ingest dedup's exact pass (q148):
    * arriving documents are gated against the STANDING corpus digest set
    * with a stream-static left-anti join — only novel content flows on,
    * and the gate keeps NO stream state (the digest table is the state,
    * maintained by the batch side). Broadcast here; at corpus scale the
    * digest table is bucketed and the join shuffle-free. Combined with
    * `dropDuplicatesWithinWatermark` (q68) for within-stream replays this
    * is the full production ingestion gate.
    */
  def dedupAgainstCorpus(docs: DataFrame, corpusDigests: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .join(broadcast(corpusDigests), Seq("h"), "left_anti")
      .drop("h")

  /** Inline data-quality metrics via `observe`: row count, value sum, and
    * null-props count ride the existing job (no second pass over the data —
    * the accumulators update as rows flow), surfaced per micro-batch in
    * `StreamingQueryProgress.observedMetrics` (batch: via
    * `QueryExecutionListener`). The monitoring surface a production
    * ingestion pipeline alarms on.
    */
  def withQualityMetrics(events: DataFrame): DataFrame =
    events.observe("quality",
      count(lit(1)).as("rows"),
      round(sum("value"), 2).as("value_sum"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"))

  /** Ingestion dedup — at-least-once delivery (replayed files, retried
    * producers) made exactly-once: duplicates of an `event_id` arriving
    * within the watermark horizon are dropped, and state for ids older than
    * the watermark is evicted, so state size is bounded by the delay × event
    * rate rather than the stream's lifetime — the only dedup shape that
    * survives an unbounded stream. Batch twin: plain `dropDuplicates`
    * (q68 in EventAnalytics); duplicate-dropping itself is proven in
    * StreamingSpec with planted dups.
    */
  def dedupEvents(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class PatternEvent(user_id: Long, ts: Timestamp,
                                event_id: Long, event_type: String)
  final case class PatternState(st: Int, funnels: Int, errRun: Int,
                                maxErrRun: Int, n: Int)
  final case class PatternRow(user_id: Long, n_funnels: Int,
                              longest_error_run: Int, n_events: Int)

  /** One CEP transition of q181's machine (greedy non-overlapping
    * view→click→purchase counting + longest error run). SHARED verbatim by
    * the batch reducer (EventAnalytics.eventPattern on runSorted) and the
    * streaming processor below, so stream ≡ batch holds by construction of
    * the transition — StreamingSpec proves it over real micro-batches.
    */
  private[graft] def stepPattern(s: PatternState, t: String): PatternState = {
    val (er, mer) =
      if (t == "error") (s.errRun + 1, math.max(s.maxErrRun, s.errRun + 1))
      else (0, s.maxErrRun)
    val (st2, f2) = s.st match {
      case 0 => (if (t == "view") 1 else 0, s.funnels)
      case 1 => (if (t == "click") 2 else 1, s.funnels)
      case _ => if (t == "purchase") (0, s.funnels + 1) else (2, s.funnels)
    }
    PatternState(st2, f2, er, mer, s.n + 1)
  }

  /** Streaming CEP — q181's unbounded twin (the Flink-CEP class): per user,
    * the O(1) PatternState rides `GroupState` across micro-batches while
    * each batch's rows are folded in (ts, event_id) order. Emits the
    * running totals every batch a user appears in (upsert contract — latest
    * row per user wins, like the sessionize processors). Ordering contract:
    * WITHIN a batch rows are sorted here; ACROSS batches the landing
    * directory's monotone-arrival guarantee (the LinesSource/file-source
    * deployment shape) supplies order — a full out-of-order CEP would
    * buffer events until the watermark instead, at O(window) state.
    */
  def patternStateful(events: Dataset[PatternEvent]): Dataset[PatternRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PatternState, PatternRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val sorted = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
        val s0 = if (state.exists) state.get else PatternState(0, 0, 0, 0, 0)
        val s1 = sorted.foldLeft(s0)((s, e) => stepPattern(s, e.event_type))
        state.update(s1)
        Iterator.single(PatternRow(uid, s1.funnels, s1.maxErrRun, s1.n))
      }
  }
  final case class Session(user_id: Long, s_start: Timestamp, s_end: Timestamp,
                           n_events: Long, sum_value: Double)
  /** Open sessions carried across micro-batches, newest-first is NOT
    * guaranteed — events are re-sorted on every flush.
    */
  final case class SessionState(events: List[(Timestamp, Double)])

  private val gapUs = 30L * 60 * 1000 * 1000

  // µs-exact Timestamp arithmetic: getTime() is millis and silently drops
  // the microsecond fraction, which must survive (session bounds are raw
  // event times).
  private def micros(t: Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  private def toSessions(userId: Long, evs: List[(Timestamp, Double)]): List[Session] = {
    val sorted = evs.sortBy(e => micros(e._1))
    if (sorted.isEmpty) Nil
    else {
      val runs = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (micros(e._1) - micros(acc.head.head._1) >= gapUs) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }
      runs.reverse.map { run =>
        val r = run.reverse
        Session(userId, r.head._1,
          fromMicros(micros(r.last._1) + gapUs),
          r.size.toLong,
          math.rint(r.map(_._2).sum * 100) / 100)
      }
    }
  }

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the typed
    * state API the brief calls for. In streaming, closed sessions emit each
    * micro-batch and open ones ride in `GroupState`; in batch, each group is
    * processed in one call (state never exists). Semantics match
    * `sessionByUser` exactly — proven by StreamingSpec.
    */
  def sessionizeStateful(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val prior = if (state.exists) state.get.events else Nil
        val evs = prior ++ it.map(e => (e.ts, e.value)).toList
        val sessions = toSessions(uid, evs)
        if (sessions.isEmpty) Iterator.empty
        else {
          // keep the newest session open in state (a later batch may extend
          // it); emit the rest as closed. In batch there is no later batch,
          // so everything flushes via the state's final content below.
          val (closed, open) = (sessions.init, sessions.last)
          state.update(SessionState(evs.filter(_._1.getTime >= open.s_start.getTime)))
          closed.iterator ++ Iterator(open)
        }
      }
  }

  /** Spark 4 `transformWithState` sessionization — the arbitrary-state
    * successor to `flatMapGroupsWithState`: typed state primitives on the
    * state store (a `ListState` of open-session events here; the API also
    * offers ValueState/MapState, per-key timers, and TTL). Emission contract
    * matches `sessionizeStateful` — closed sessions plus the current open
    * session each batch, latest row per (user, s_start) wins — so the same
    * StreamingSpec assertion proves stream ≡ batch twin. Streaming runs
    * require the RocksDB state store provider (asserted in the spec);
    * state stays bounded by the open session per user.
    */
  final class SessionProcessor extends StatefulProcessor[Long, Event, Session] {
    @transient private var evs: ListState[(Timestamp, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      evs = getHandle.getListState("evs",
        Encoders.tuple(Encoders.TIMESTAMP, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      val prior = if (evs.exists()) evs.get().toList else Nil
      val all = prior ++ rows.map(e => (e.ts, e.value)).toList
      val sessions = toSessions(uid, all)
      if (sessions.isEmpty) Iterator.empty
      else {
        val open = sessions.last
        evs.put(all.filter(_._1.getTime >= open.s_start.getTime).toArray)
        sessions.iterator
      }
    }
  }

  def sessionizeTws(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Timer-closed sessionization — the exactly-once-emission contract the
    * emit-every-batch processors can't give: sessions separated by a full
    * gap inside the data close immediately; the trailing open session stays
    * in a `ValueState` with an EVENT-TIME timer at its would-be close
    * (s_end = last event + gap). When the watermark passes it, the timer
    * fires, `handleExpiredTimer` emits the session once and clears state.
    * Each session row appears exactly once in the output stream — the shape
    * a downstream incremental sink wants. Timers are re-registered (old one
    * deleted) whenever a new event extends the open session; a session is
    * only emitted from the timer whose expiry matches its close.
    */
  final class SessionTimerProcessor extends StatefulProcessor[Long, Event, Session] {
    @transient private var open: ListState[(Timestamp, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState("open",
        Encoders.tuple(Encoders.TIMESTAMP, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      val prior = if (open.exists()) open.get().toList else Nil
      val all = prior ++ rows.map(e => (e.ts, e.value)).toList
      val sessions = toSessions(uid, all)
      if (sessions.isEmpty) Iterator.empty
      else {
        val last = sessions.last
        open.put(all.filter(_._1.getTime >= last.s_start.getTime).toArray)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(last.s_end.getTime)
        sessions.init.iterator // gap-complete sessions close now, exactly once
      }
    }
    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      val evs = if (open.exists()) open.get().toList else Nil
      toSessions(uid, evs) match {
        case s :: Nil if s.s_end.getTime == expired.getExpiryTimeInMs =>
          open.clear()
          Iterator(s)
        case _ => Iterator.empty // superseded timer: session was extended
      }
    }
  }

  /** q181's WATERMARK-COMPLETE streaming form — the full out-of-order CEP
    * that `patternStateful`'s in-order-across-batches contract dodges:
    * arrivals buffer per user in a `ListState` and fold through the SAME
    * shared transition only once the event-time watermark has passed them
    * (so no earlier event can still arrive — Spark's late-record filter
    * enforces it), in (ts, event_id) order. An event-time timer at the
    * newest buffered timestamp flushes users the watermark overtakes
    * between their input batches. State per user = the O(1) machine plus
    * O(allowed-lateness window) buffered events — the fundamental CEP
    * trade: order tolerance costs a bounded buffer, never the history.
    * Emits running totals on every fold (latest row per user wins, the
    * sessionize emission contract). Boundary note: events tied exactly AT
    * the watermark follow arrival order; a lateness allowance that covers
    * real clock skew keeps ties out of the boundary.
    */
  final class PatternWatermarkProcessor
      extends StatefulProcessor[Long, PatternEvent, PatternRow] {
    @transient private var buf: ListState[(Long, Long, String)] = _
    @transient private var st: org.apache.spark.sql.streaming.ValueState[PatternState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState("buf",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING),
        TTLConfig.NONE)
      st = getHandle.getValueState("st", Encoders.product[PatternState], TTLConfig.NONE)
    }
    private def fold(ready: List[(Long, Long, String)]): PatternState = {
      val s0 = if (st.exists()) st.get() else PatternState(0, 0, 0, 0, 0)
      val s1 = ready.sortBy(e => (e._1, e._2)).foldLeft(s0)((s, e) => stepPattern(s, e._3))
      st.update(s1)
      s1
    }
    override def handleInputRows(uid: Long, rows: Iterator[PatternEvent],
        timers: TimerValues): Iterator[PatternRow] = {
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val all = (if (buf.exists()) buf.get().toList else Nil) ++
        rows.map(e => (micros(e.ts), e.event_id, e.event_type))
      val (ready, pending) = all.partition(_._1 < wmUs)
      val s1 = fold(ready)
      buf.put(pending.toArray)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (pending.nonEmpty)
        getHandle.registerTimer(Math.floorDiv(pending.map(_._1).max, 1000L) + 1)
      Iterator.single(PatternRow(uid, s1.funnels, s1.maxErrRun, s1.n))
    }
    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[PatternRow] = {
      val s1 = fold(if (buf.exists()) buf.get().toList else Nil)
      buf.clear()
      Iterator.single(PatternRow(uid, s1.funnels, s1.maxErrRun, s1.n))
    }
  }

  /** Watermark-buffered CEP over an unbounded PatternEvent stream. */
  def patternWatermarked(events: Dataset[PatternEvent], delay: String): Dataset[PatternRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new PatternWatermarkProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** `sessionizeTimerClosed` requires an event-time watermark on the input
    * (TimeMode.EventTime drives the timers off it).
    */
  def sessionizeTimerClosed(events: Dataset[Event], delay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
