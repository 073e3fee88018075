package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.tables.Tables._

/** Batch twins of the Structured Streaming surface (streaming/EventStreams):
  * the SAME transformation functions applied to the bounded `events` table,
  * so the oracle gate proves the logic that the streaming tests then drive
  * through MemoryStream. Window starts are epoch-aligned in both engines
  * (Spark `window()` and DuckDB `date_trunc`/`time_bucket`).
  */
object EventAnalytics {

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingByType(events(spark, dir))
      .orderBy("w_start", "event_type")

  def sliding(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingByType(events(spark, dir))
      .orderBy("w_start", "event_type")

  def session(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessionByUser(events(spark, dir))
      .orderBy("user_id", "s_start")

  def sessionStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventStreams.Event]
    EventStreams.sessionizeStateful(ds).toDF()
      .orderBy("user_id", "s_start")
  }

  /** Batch twin of the stream-stream interval join: clicks → same-user
    * purchases within the next hour, aggregated per user.
    */
  def clickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    EventStreams.clickToPurchaseBucketed(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("c_id")).as("n_clicks_converted"),
           round(sum("p_value"), 2).as("purchase_value"))
      .orderBy("user_id")
  }

  /** Batch twin of the ingestion dedup (`EventStreams.dedupEvents`): one
    * survivor per event_id, then the per-type profile. The survivor is
    * chosen DETERMINISTICALLY (earliest ts, then event_type/value as total
    * tiebreaks) — `dropDuplicates`' arbitrary pick would make the result
    * partitioning-dependent the moment real duplicates exist, and the
    * streaming variant's first-arrival semantics can't be replayed in
    * batch anyway. `dropDuplicatesWithinWatermark` (bounded state,
    * first-arrival wins) is the streaming side, driven in StreamingSpec.
    */
  def dedupIngest(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id")
      .orderBy(col("ts"), col("event_type"), col("value"))
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** Semi-structured props via Spark 4's native VARIANT type: `props` is
    * parsed ONCE into a variant and the field is extracted with
    * `variant_get` (typed, binary-encoded) instead of re-parsing the JSON
    * string per field — the scan-friendly path for schemaless event
    * payloads at 100 TB. The oracle extracts the same path with DuckDB's
    * JSON functions; values are integers, so typing is exact.
    */
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
           min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("event_type")

  /** Funnel analysis — staged sequential aggregation: the first view per
    * user, the first click AT/after that view, the first purchase at/after
    * that click; `stage` is the depth reached (1–3). Three grouped mins and
    * two joins, all keyed by user_id — one shuffle key end-to-end, so the
    * stages co-partition and at scale this is a single exchange plus
    * map-side work. The classic event-product query the windowed/session
    * surfaces don't cover.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select("user_id", "event_type", "ts")
    def firstAtOrAfter(df: DataFrame, typ: String, lower: DataFrame, lcol: String): DataFrame =
      df.filter(col("event_type") === typ)
        .join(lower, Seq("user_id"))
        .filter(col("ts") >= col(lcol))
        .groupBy("user_id").agg(min("ts").as(s"t_$typ"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = firstAtOrAfter(e, "click", v, "t_view")
    val p = firstAtOrAfter(e, "purchase", c, "t_click")
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
                + when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy("user_id")
  }

  /** Batch twin of the LEFT OUTER stream-stream interval join
    * (`EventStreams.clickToPurchaseOuter`): per-user conversion report
    * where unconverted clicks — the rows only the outer join can see —
    * are counted from the NULL purchase side.
    */
  def clickConversion(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    EventStreams.clickToPurchaseBucketed(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"), outer = true)
      .groupBy(col("c_user").as("user_id"))
      .agg(countDistinct(col("c_id")).as("n_clicks"),
           countDistinct(when(col("p_id").isNotNull, col("c_id"))).as("n_converted"),
           count(when(col("p_id").isNull, 1)).as("n_unconverted"))
      .orderBy("user_id")
  }

  /** q195 — batch twin of the FULL OUTER stream-stream interval join
    * (`EventStreams.clickToPurchaseFullOuter`): the conversion report where
    * BOTH unmatched sides surface — unconverted clicks AND orphan purchases
    * (no same-user click in the preceding hour). Composed scale-safe: the
    * pair+unmatched-click side rides the hour-BUCKETED left outer (the q112
    * skew rewrite), and orphan purchases come from an anti join against the
    * matched purchase ids — a naive full-outer range join would reintroduce
    * the hot-user quadratic the bucketing removed. The oracle replays the
    * semantics as a plain SQL FULL JOIN, so a pass proves the composition
    * IS the full outer join.
    */
  def clickConversionFull(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
    val purchases = e.filter(col("event_type") === "purchase")
    val pairs = EventStreams.clickToPurchaseBucketed(clicks, purchases, outer = true)
    val matched = pairs.filter(col("p_id").isNotNull).select(col("p_id")).distinct()
    val orphans = purchases
      .join(matched, purchases("event_id") === matched("p_id"), "left_anti")
    val aggC = pairs.groupBy(col("c_user").as("user_id"))
      .agg(count(when(col("p_id").isNotNull, 1)).as("n_pairs"),
           count(when(col("p_id").isNull, 1)).as("n_unconverted_clicks"))
    val aggP = orphans.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_orphan_purchases"),
           round(sum("value"), 2).as("orphan_value"))
    aggC.join(aggP, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_unconverted_clicks"), lit(0L)).as("n_unconverted_clicks"),
        coalesce(col("n_orphan_purchases"), lit(0L)).as("n_orphan_purchases"),
        coalesce(col("orphan_value"), lit(0.0)).as("orphan_value"))
      .orderBy("user_id")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    * semantic a plain equi-join silently breaks — rows whose key is NULL
    * (here: a deterministic "missing bucket" derived from the props key)
    * drop out of `=` joins but MATCH each other under `<=>`. The engine
    * still hash-partitions on the key (nulls form one group), so the plan
    * is an ordinary shuffled/broadcast hash join, not a nested loop.
    */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val f = events(spark, dir)
      .select(expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .withColumn("kb",
        when(col("k") % 7 === 0, lit(null)).otherwise(col("k") % 10))
    val dim = f.select("kb").distinct()
      .withColumn("bucket_name",
        concat(lit("b"), coalesce(col("kb").cast("string"), lit("null"))))
    f.join(dim, f("kb") <=> dim("kb"))
      .groupBy("bucket_name")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"))
      .orderBy("bucket_name")
  }

  /** Time-series regularization: hourly per-type activity on a COMPLETE
    * hour spine (sequence over the observed range × the type dimension),
    * missing hours filled — counts with 0, the hourly value-total feature
    * forward-filled from the last observed hour (LOCF via
    * `last(ignoreNulls)` over an unbounded preceding frame; hours before a
    * type's first observation stay NULL on both engines). The featurization
    * step before any ML on event streams: models want a dense, regular
    * grid, not the raw sparse log. The value is rounded BEFORE the fill so
    * both engines propagate identical doubles. Spine and type dimension
    * are broadcast-sized; the only real shuffle is the hourly group-by.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    // The filled feature is the hourly value TOTAL, not the mean: `value`
    // has 2-decimal granularity, so round(sum, 2) merely snaps off binary
    // accumulation noise (~1e-13) and never sits near a rounding boundary —
    // whereas a mean of 2-decimal data lands EXACTLY on 4th-decimal halves
    // (sum/32 etc.), where Spark's BigDecimal HALF_UP and DuckDB's
    // multiply-then-nearbyint legitimately disagree (seen at sf0.1).
    val hourly = e.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
    val spine = e.agg(date_trunc("hour", min("ts")).as("h0"),
                      date_trunc("hour", max("ts")).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
      .rowsBetween(Long.MinValue, 0)
    e.select("event_type").distinct()
      .crossJoin(broadcast(spine))
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sum_v"), ignoreNulls = true).over(w).as("sum_v_ff"))
      .orderBy("event_type", "h")
  }

  /** Changelog (CDC) compaction — latest-wins state per (user_id,
    * event_type): the ingestion op that turns an append-only event log into
    * current state before a training snapshot. One window keyed by the
    * state key; ties broken by event_id so the survivor is deterministic
    * under replay and repartitioning. At scale this is a single hash
    * exchange on the state key, and with the log bucketed by user_id it is
    * exchange-free — same layout argument as q97.
    */
  def cdcCompact(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc, col("value").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts").as("last_ts"), round(col("value"), 2).as("value"))
      .orderBy("user_id", "event_type")
  }

  /** q147 — SCD Type 2 dimension build: the event stream read as change
    * capture on a per-user attribute (the event's type as the tracked
    * state), collapsed to value-change rows and published as a versioned
    * dimension with half-open [valid_from, valid_to) intervals — the
    * warehouse operator that q109's latest-wins compaction is the Type-1
    * degenerate case of. Run-length change detection via `lag`, interval
    * close via `lead`, both over the SAME (user_id | ts, event_id) window:
    * one exchange on user_id serves every step, and (ts, event_id) is a
    * verified-unique total order so neither engine can win a sort tie.
    * At 100 TB the shuffle carries only (user, ts, id, state) — the
    * dimension build never touches payload columns.
    */
  /** q205 — point-in-time (PIT) enrichment against the SCD2 dimension: each
    * event joined to the q147 state version that was valid AT its
    * timestamp (`valid_from <= ts < valid_to`, open current version) — the
    * as-of-correct dimension lookup every warehouse backfill needs (joining
    * today's dim onto yesterday's facts silently time-travels attributes).
    * Spelled as an EQUI-join on user_id with the interval as a residual
    * predicate: the per-user SCD2 dim is events-change-sized, so at 100 TB
    * it is NOT broadcastable — the keyed join shuffles both sides on
    * user_id once and the residual evaluates within the key group, unlike
    * q139's broadcast interval index (bounded build side by contract).
    * Versions partition each user's timeline (v1 starts at the user's
    * first event), so every event lands in exactly ONE version — the
    * conservation the oracle's identical join replays. Integer aggregates
    * (count + event_id sum), no float order games.
    */
  def pitScd2Join(spark: SparkSession, dir: String): DataFrame = {
    val dim = scdType2(spark, dir)
      .select(col("user_id"), col("version"), col("state"),
              col("valid_from"), col("valid_to"))
    val facts = events(spark, dir).select("user_id", "ts", "event_id")
    facts.join(dim, Seq("user_id"))
      .filter(col("valid_from") <= col("ts") &&
              (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy("user_id", "version", "state")
      .agg(count(lit(1)).as("n_events"), sum("event_id").as("sum_eid"))
      .orderBy("user_id", "version")
  }

  def scdType2(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** q181 — event-PATTERN matching: the CEP / MATCH_RECOGNIZE class that
    * Spark SQL has no operator for (Flink CEP's core; in the reference's
    * terms this is a `reduce` whose correctness depends on the per-key SORT
    * the framework guarantees, `MapReduceFramework.cpp:227-231`). Per user,
    * one pass over the TIME-ORDERED event sequence with a 3-state machine
    * counting greedy non-overlapping view→click→purchase completions (gaps
    * allowed — "skip till next row"), plus the longest consecutive error
    * run. Where q94's funnel answers "how deep did each user EVER get",
    * this counts REPEATED completions and within-sequence runs — answers a
    * set-based staged aggregation cannot express.
    *
    * Built on the engine's own secondary-sort primitive
    * (`MapReduce.runSorted`): events shuffle ONCE partitioned by user_id
    * and arrive at the reducer already (ts, event_id)-ordered — no
    * per-group materialization, no window sort, state is O(1) per user.
    * Oracle: greedy-leftmost pattern counting over an ordered sequence IS
    * lazy-quantifier regex matching over the user's event-type string —
    * DuckDB replays with regexp_extract_all over a string_agg.
    */
  def eventPattern(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsus"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    graft.core.MapReduce.runSorted(e)(
      r => Iterator.single((r._1, (r._2, r._3, r._4)))) {
      (user: Long, it: Iterator[(Long, Long, String)]) =>
        // The transition is SHARED with the streaming processor
        // (EventStreams.patternStateful) — stream ≡ batch by construction.
        val s = it.foldLeft(EventStreams.PatternState(0, 0, 0, 0, 0))(
          (acc, ev) => EventStreams.stepPattern(acc, ev._3))
        Iterator.single((user, s.funnels, s.maxErrRun, s.n))
    }.toDF("user_id", "n_funnels", "longest_error_run", "n_events")
      .orderBy("user_id")
  }

  /** q188 — cohort retention matrix: users bucketed by their FIRST-activity
    * week (ISO Monday truncation, identical in both engines), then distinct
    * active users per (cohort, week-offset) — the classic product-analytics
    * report that completes the engine's event quartet (funnel q94,
    * sessionization q51/q52, pattern matching q181, retention here).
    * Shape: one per-user min(ts) aggregation, the cohort table joined back
    * onto events on user_id (at scale the cohort side is the distinct-user
    * table — orders of magnitude smaller than events), one
    * (cohort, offset) count-distinct. The offset-0 row of each cohort is
    * its size (every user is active in their own first week), so retention
    * RATES are derivable without a second pass. Integer arithmetic only.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select("user_id", "ts")
    val cohort = e.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cohort_week"))
    e.join(cohort, "user_id")
      .select(col("cohort_week"), col("user_id"),
        floor(datediff(to_date(col("ts")), to_date(col("cohort_week"))) / 7.0)
          .cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q188_cohort_retention" -> cohortRetention _,
    "q181_event_pattern"   -> eventPattern _,
    "q147_scd2"            -> scdType2 _,
    "q205_pit_scd2_join"   -> pitScd2Join _,
    "q109_cdc_compact"     -> cdcCompact _,
    "q121_gap_fill"        -> gapFill _,
    "q127_join_null_safe"  -> joinNullSafe _,
    "q112_stream_interval_join_outer" -> clickConversion _,
    "q195_stream_interval_join_full" -> clickConversionFull _,
    "q94_funnel"           -> funnel _,
    "q91_variant_json"     -> variantProps _,
    "q49_stream_tumbling"  -> tumbling _,
    "q68_stream_dedup"     -> dedupIngest _,
    "q50_stream_sliding"   -> sliding _,
    "q51_stream_session"   -> session _,
    "q52_stream_sessionize_stateful" -> sessionStateful _,
    "q58_stream_interval_join" -> clickPurchase _,
  )

  // Session oracle: gap >= 30 min starts a new session (Spark merges session
  // windows only on strict overlap, so an event at exactly start+gap is a
  // NEW session); session end = last event + gap.
  // Window tie-break: duplicate timestamps per user DO occur (the sf1
  // replica corpus repeats every event 10x with fresh event_ids), and an
  // un-tie-broken ORDER BY ts lets the cumulative session counter split
  // identical-instant events across two sessions depending on which tie
  // order the engine picked. ORDER BY (ts, event_id) pins it: the lowest
  // id of a duplicate run carries the session boundary, the rest have gap
  // 0 — exactly session_window's merge-on-overlap semantics.
  private val sessionOracle =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |                  value FROM events),
      |lagged AS (SELECT user_id, event_id, ts, value,
      |             CASE WHEN lag(ts) OVER (PARTITION BY user_id
      |                                     ORDER BY ts, event_id) IS NULL
      |                    OR ts - lag(ts) OVER (PARTITION BY user_id
      |                                          ORDER BY ts, event_id)
      |                       >= INTERVAL 30 MINUTE
      |                  THEN 1 ELSE 0 END AS new_s
      |           FROM e),
      |sess AS (SELECT user_id, ts, value,
      |           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                            ROWS UNBOUNDED PRECEDING) AS sid
      |         FROM lagged)
      |SELECT user_id, min(ts) AS s_start,
      |       max(ts) + INTERVAL 30 MINUTE AS s_end,
      |       count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, s_start""".stripMargin

  val oracles: Map[String, String] = Map(
    "q147_scd2" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type AS state FROM events),
        |ch AS (SELECT *, lag(state) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |f AS (SELECT user_id, ts, event_id, state FROM ch
        |      WHERE prev IS NULL OR prev <> state)
        |SELECT user_id,
        |       row_number() OVER w AS version,
        |       state, ts AS valid_from,
        |       lead(ts) OVER w AS valid_to,
        |       lead(ts) OVER w IS NULL AS is_current
        |FROM f
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q205_pit_scd2_join" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type AS state FROM events),
        |ch AS (SELECT *, lag(state) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |f AS (SELECT user_id, ts, event_id, state FROM ch
        |      WHERE prev IS NULL OR prev <> state),
        |dim AS (SELECT user_id,
        |               row_number() OVER w AS version,
        |               state, ts AS valid_from,
        |               lead(ts) OVER w AS valid_to
        |        FROM f
        |        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT d.user_id, d.version, d.state,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(ev.event_id) AS BIGINT) AS sum_eid
        |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |      FROM events) ev
        |JOIN dim d ON ev.user_id = d.user_id
        |          AND d.valid_from <= ev.ts
        |          AND (d.valid_to IS NULL OR ev.ts < d.valid_to)
        |GROUP BY d.user_id, d.version, d.state
        |ORDER BY d.user_id, d.version""".stripMargin,
    "q127_join_null_safe" ->
      """WITH f AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |           FROM events),
        |g AS (SELECT k, CASE WHEN k % 7 = 0 THEN NULL ELSE k % 10 END AS kb FROM f),
        |dim AS (SELECT DISTINCT kb,
        |          'b' || coalesce(CAST(kb AS VARCHAR), 'null') AS bucket_name
        |        FROM g)
        |SELECT bucket_name, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS k_sum
        |FROM g JOIN dim ON g.kb IS NOT DISTINCT FROM dim.kb
        |GROUP BY bucket_name ORDER BY bucket_name""".stripMargin,
    "q121_gap_fill" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |                  count(*) AS n, round(sum(value), 2) AS sum_v
        |           FROM e GROUP BY 1, 2),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |                  date_trunc('hour', max(ts)) AS h1 FROM e),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |          FROM bounds),
        |grid AS (SELECT event_type, h
        |         FROM (SELECT DISTINCT event_type FROM e), spine)
        |SELECT event_type, h, CAST(coalesce(n, 0) AS BIGINT) AS n,
        |       last_value(sum_v IGNORE NULLS) OVER (PARTITION BY event_type
        |         ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_v_ff
        |FROM grid LEFT JOIN hourly USING (event_type, h)
        |ORDER BY event_type, h""".stripMargin,
    "q112_stream_interval_join_outer" ->
      """WITH c AS (SELECT user_id, event_id AS c_id, CAST(ts AS TIMESTAMP) AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.user_id, c.c_id, p.p_id
        |      FROM c LEFT JOIN p ON p.user_id = c.user_id
        |        AND p.p_ts >= c.c_ts AND p.p_ts < c.c_ts + INTERVAL 1 HOUR)
        |SELECT user_id,
        |       CAST(count(DISTINCT c_id) AS BIGINT) AS n_clicks,
        |       CAST(count(DISTINCT CASE WHEN p_id IS NOT NULL THEN c_id END) AS BIGINT) AS n_converted,
        |       CAST(count(CASE WHEN p_id IS NULL THEN 1 END) AS BIGINT) AS n_unconverted
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q195_stream_interval_join_full" ->
      """WITH c AS (SELECT user_id AS cu, event_id AS cid, CAST(ts AS TIMESTAMP) AS cts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS pu, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts, value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT cu, cid, pu, pid, value
        |      FROM c FULL JOIN p ON pu = cu
        |        AND pts >= cts AND pts < cts + INTERVAL 1 HOUR)
        |SELECT coalesce(cu, pu) AS user_id,
        |       CAST(count(CASE WHEN cid IS NOT NULL AND pid IS NOT NULL THEN 1 END) AS BIGINT) AS n_pairs,
        |       CAST(count(CASE WHEN pid IS NULL THEN 1 END) AS BIGINT) AS n_unconverted_clicks,
        |       CAST(count(CASE WHEN cid IS NULL THEN 1 END) AS BIGINT) AS n_orphan_purchases,
        |       round(coalesce(sum(CASE WHEN cid IS NULL THEN value END), 0.0), 2) AS orphan_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q109_cdc_compact" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |                  CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT user_id, event_type, event_id, ts AS last_ts,
        |       round(value, 2) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                  ORDER BY ts DESC, event_id DESC, value DESC) AS rn
        |      FROM e)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q188_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT user_id,
        |             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |      FROM e GROUP BY 1)
        |SELECT cohort_week,
        |       CAST(floor(date_diff('day', CAST(cohort_week AS DATE),
        |                            CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
        |         AS week_offset,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q181_event_pattern" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                  WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
        |                  ELSE 'o' END AS t
        |           FROM events),
        |s AS (SELECT user_id,
        |             string_agg(t, '' ORDER BY ts, event_id) AS seq,
        |             count(*) AS n
        |      FROM e GROUP BY user_id)
        |SELECT user_id,
        |       CAST(len(regexp_extract_all(seq, 'v.*?c.*?p')) AS INT) AS n_funnels,
        |       CAST(coalesce(list_max(list_transform(
        |              regexp_extract_all(seq, 'e+'), x -> len(x))), 0) AS INT)
        |         AS longest_error_run,
        |       CAST(n AS INT) AS n_events
        |FROM s ORDER BY user_id""".stripMargin,
    "q94_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t_view
        |      WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id AND e.ts >= c.t_click
        |      WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT v.user_id,
        |       CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |              + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS stage,
        |       v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q91_variant_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
        |       date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS w_end,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,
    "q50_stream_sliding" ->
      """SELECT w_start, event_type, count(*) AS n
        |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |                     time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |                       - INTERVAL 30 MINUTE]) AS w_start,
        |             event_type
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q68_stream_dedup" ->
      """WITH survivors AS (
        |  SELECT * FROM (
        |    SELECT event_type, value,
        |           row_number() OVER (PARTITION BY event_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_type, value) AS rn
        |    FROM events)
        |  WHERE rn = 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM survivors GROUP BY 1 ORDER BY 1""".stripMargin,
    "q51_stream_session" -> sessionOracle,
    "q52_stream_sessionize_stateful" -> sessionOracle,
    "q58_stream_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |                  CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT c.user_id, count(*) AS n_pairs,
        |       count(DISTINCT c.event_id) AS n_clicks_converted,
        |       round(sum(p.value), 2) AS purchase_value
        |FROM (SELECT * FROM e WHERE event_type = 'click') c
        |JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
  )
}
