package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._

/** Join kinds beyond the core equi/semi/anti/left-outer set (SURVEY.md §2.2
  * join table): right outer, full outer, pure non-equi nested-loop, and as-of.
  * The reference can only express the repartition equi-join pattern (tag +
  * shuffle on key, `PAPERS.md` VLDB'12); everything here is Spark-native.
  */
object Joins {

  /** Right-outer: every nation, with supplier stats where present.
    * Catalyst plans this as a left-outer with sides swapped; the small outer
    * side broadcasts under AQE.
    */
  def joinRight(spark: SparkSession, dir: String): DataFrame =
    supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"), "right_outer")
      .groupBy("n_nationkey", "n_name")
      .agg(count(col("s_suppkey")).as("n_sup"),
           round(coalesce(sum("s_acctbal"), lit(0.0)), 2).as("bal"))
      .orderBy("n_nationkey")

  /** Full-outer: per-nation customer counts ⟗ per-nation supplier counts.
    * Both sides are pre-aggregated (small), keys coalesced for determinism.
    */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val s = supplier(spark, dir).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_sup"))
    c.join(s, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
              coalesce(col("n_cust"), lit(0L)).as("n_cust"),
              coalesce(col("n_sup"), lit(0L)).as("n_sup"))
      .orderBy("nationkey")
  }

  /** Pure theta join (no equi conjunct) → BroadcastNestedLoopJoin. The
    * build side is the top-10 suppliers by balance (TakeOrderedAndProject),
    * so the broadcast is bounded BY CONSTRUCTION at any SF; the probe side
    * streams. A theta join with an unbounded build side would be a
    * cartesian blow-up at 100 TB — that shape is intentionally not offered.
    */
  def joinThetaNl(spark: SparkSession, dir: String): DataFrame = {
    val richSup = supplier(spark, dir)
      .orderBy(col("s_acctbal").desc, col("s_suppkey")).limit(10)
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val c = customer(spark, dir)
    richSup.join(c, col("s_acctbal") < col("c_acctbal") &&
                    col("s_nationkey") =!= col("c_nationkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_richer_cust"))
      .orderBy("s_suppkey")
  }

  /** As-of join via the union+window trick (SURVEY.md §2.2): for each
    * odd-key order, the customer's most recent even-key order at-or-before
    * its date. No built-in as-of in Spark — tag both sides, sort within
    * customer by (date, side), and `last(_, ignoreNulls)` over an unbounded
    * preceding frame carries the latest build-side row forward. One shuffle
    * on the key, codegen'd window — no custom plan node needed.
    *
    * The build side is pre-deduplicated to one row per (custkey, date)
    * (max orderkey) so the match is deterministic on both engines.
    */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val probe = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
              col("o_orderkey").as("a_key"), lit(null).cast("long").as("b_key"),
              lit(null).cast("timestamp").as("b_date"), lit(1).as("side"))
    val build = o.filter(col("o_orderkey") % 2 === 0)
      .groupBy(col("o_custkey").as("custkey"), col("o_orderdate").as("ts"))
      .agg(max("o_orderkey").as("b_key"))
      .select(col("custkey"), col("ts"), lit(null).cast("long").as("a_key"),
              col("b_key"), col("ts").as("b_date"), lit(0).as("side"))
    val w = Window.partitionBy("custkey")
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(build)
      .withColumn("asof_key", last(col("b_key"), ignoreNulls = true).over(w))
      .withColumn("asof_date", last(col("b_date"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("a_key"), col("custkey"), col("ts").as("a_date"),
              col("asof_key"), col("asof_date"))
      .orderBy("a_key")
  }

  /** Manually salted equi-join — the skew survival kit for when BOTH sides
    * are too big to broadcast and one join key is hot (AQE's skew-join split
    * is the first-line tool, but it only fires on post-shuffle partition
    * stats; salting also covers keys that explode later, e.g. after a UDF).
    * Shape: the probe side gets a deterministic per-row salt in [0, S); the
    * other side is replicated S ways via `explode(sequence(...))`; the join
    * key becomes (key, salt), spreading each hot key over S reducers. The
    * oracle is the UNSALTED join + aggregate — proving salted ≡ plain.
    * S=8 here; at 100 TB pick S ≈ hot-key-rows / target-partition-rows.
    */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val l = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        pmod(hash(col("l_partkey"), col("l_linenumber")), lit(salts)).as("salt"))
    val o = orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        explode(sequence(lit(0), lit(salts - 1))).as("salt"))
    // Pin the SHUFFLED hash join (§3.1): the whole point of salting is to
    // spread hot keys over (key, salt) reducers, so the join must keep its
    // shuffle shape. Left to itself, AQE demotes this to a broadcast at
    // bench scale — the driver then serializes the ×S EXPLODED build side
    // into a hashed relation (measured: ~0.7 s single-threaded stall per
    // invocation), which is both slower here and the opposite of the
    // at-scale plan this operator demonstrates.
    l.hint("SHUFFLE_HASH")
      .join(o, col("l_orderkey") === col("o_orderkey") && l("salt") === o("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Pure interval join through the native `BroadcastRangeJoinExec`
    * (graft.plans.RangeJoin): incident blast radius — every event that fell
    * inside any error-hour window, counted per window. No equi key exists,
    * so Spark's built-in plan is a BroadcastNestedLoopJoin comparing every
    * event against every window (O(n·m)); the native operator binary-
    * searches a sorted broadcast interval index (O(n·log m)) — the plan
    * that survives 10⁹ events × 10⁴ windows. RangeJoinSpec proves operator
    * ≡ built-in on adversarial intervals; this query's oracle proves the
    * whole pipeline against DuckDB.
    */
  def rangeJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val windows = ev.filter(col("event_type") === "error")
      .select(date_trunc("hour", col("ts")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr("INTERVAL 1 HOUR"))
    graft.plans.GraftOps.broadcastRangeJoin(ev, windows, "ts", "w_start", "w_end")
      .groupBy("w_start")
      .agg(count(lit(1)).as("n_events"),
           count_distinct(col("user_id")).as("n_users"))
      .orderBy("w_start")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_range_join_native" -> rangeJoinNative _,
    "q31_join_right"    -> joinRight _,
    "q82_join_salted"   -> joinSalted _,
    "q32_join_full"     -> joinFull _,
    "q33_join_theta_nl" -> joinThetaNl _,
    "q34_join_asof"     -> joinAsof _,
  )

  val oracles: Map[String, String] = Map(
    "q139_range_join_native" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |err AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'error'),
        |w AS (SELECT DISTINCT date_trunc('hour', ts) AS w_start FROM err),
        |j AS (SELECT w.w_start, e.event_id, e.user_id
        |      FROM e JOIN w ON e.ts >= w.w_start
        |                   AND e.ts < w.w_start + INTERVAL 1 HOUR)
        |SELECT w_start, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY w_start ORDER BY w_start""".stripMargin,
    // Unsalted formulation: salting must be result-invariant.
    "q82_join_salted" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q31_join_right" ->
      """SELECT n_nationkey, n_name, count(s_suppkey) AS n_sup,
        |       round(coalesce(sum(s_acctbal), 0.0), 2) AS bal
        |FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "q32_join_full" ->
      """SELECT coalesce(ck, sk) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust, coalesce(n_sup, 0) AS n_sup
        |FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS sk, count(*) AS n_sup FROM supplier GROUP BY 1) s
        |  ON ck = sk
        |ORDER BY nationkey""".stripMargin,
    "q33_join_theta_nl" ->
      """SELECT s_suppkey, s_name, count(1) AS n_richer_cust
        |FROM (SELECT * FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 10) s
        |JOIN customer c ON s.s_acctbal < c.c_acctbal AND s.s_nationkey <> c.c_nationkey
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,
    "q34_join_asof" ->
      """SELECT a.o_orderkey AS a_key, a.o_custkey AS custkey,
        |       a.o_orderdate AS a_date, b.b_key AS asof_key, b.ts AS asof_date
        |FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 1) a
        |ASOF LEFT JOIN (SELECT o_custkey AS custkey, o_orderdate AS ts,
        |                       max(o_orderkey) AS b_key
        |                FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1, 2) b
        |  ON a.o_custkey = b.custkey AND a.o_orderdate >= b.ts
        |ORDER BY a_key""".stripMargin,
  )
}
