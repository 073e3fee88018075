package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Plan-shape regressions the 100 TB story depends on: predicates reach the
  * parquet scan (PushedFilters), projections prune the read schema, and the
  * bounded-dim star join broadcasts. A refactor that silently loses one of
  * these still passes the value oracles — only the plan shows it.
  */
class PushdownSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    GraftSqlBridge.executedPlan(df).toString
  }

  test("filter + projection reach the lineitem scan") {
    val q = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = planOf(q)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), plan)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(read.split(",").length == 2, s"expected a 2-column scan, got: $read")
  }

  test("named-parameter binding folds to literals that still push down (q201)") {
    val plan = planOf(graft.queries.Relational.sqlParameterized(spark, sfDir))
    // the bound :qty/:dmin/:dmax must reach the scan as ordinary pushed
    // filters — binding that defeats pushdown would be a silent 100 TB tax.
    // (PushedFilters' toString truncates, so assert the scan-adjacent
    // DataFilters carry the folded literals + the pushdown list is present.)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert("""l_quantity#\d+ < 24\.0""".r.findFirstIn(plan).nonEmpty, plan)
    assert("""l_discount#\d+ >= 0\.05""".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("star join broadcasts the bounded dimensions, not the fact table") {
    val q = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(sum("l_quantity").as("qty"))
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the fact table must stream: no exchange may carry lineitem's scan
    // into a broadcast (nation/customer are the build sides)
    assert(!plan.matches("(?s).*BroadcastExchange[^\\n]*\\n[^\\n]*lineitem.*"), plan)
  }

  test("aggregation is partially applied map-side (partial + final pair)") {
    val q = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("qty"))
    val plan = planOf(q)
    assert("partial_sum".r.findAllIn(plan).nonEmpty, plan)
  }

  test("TPC-H Q5: the date filter reaches the orders scan and the join is broadcast-only at this SF") {
    val plan = planOf(graft.queries.Relational.sqlTpchQ5(spark, sfDir))
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      "at sf0.001 every Q5 join side fits the broadcast threshold; SMJ means a hint/threshold regressed")
  }

  // AQE's toString prints the final plan AND echoes the initial plan —
  // count operators in the final section only.
  private def finalSection(plan: String): String =
    plan.split("== Initial Plan ==")(0)

  test("CDC compaction costs exactly one hash exchange, on the state key") {
    val plan = finalSection(planOf(graft.queries.EventAnalytics.cdcCompact(spark, sfDir)))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange (user_id, event_type), got $exchanges:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"), plan)
  }

  test("TPC-H Q19: the OR-of-ANDs predicate splits into per-table pushed disjunctions") {
    // The whole point of Q19: one disjunctive predicate over two tables
    // must become (a) a pushed part-side disjunction on (p_brand, p_size),
    // (b) a pushed lineitem-side disjunction on l_quantity bounds, and
    // (c) a plain equi-join — NOT a join-then-filter over the raw scans.
    // (Formatted mode: the scan's toString truncates long filter lists.)
    val df = graft.queries.Relational.sqlTpchQ19(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("EqualTo(p_brand,Brand#1)") && plan.contains("Or("), plan)
    assert("PushedFilters[^\\n]*GreaterThanOrEqual\\(l_quantity,1\\.0\\)".r
      .findFirstIn(plan).nonEmpty, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("trailing-30-day window compiles to a value-based RANGE frame, one exchange") {
    val plan = finalSection(planOf(graft.queries.Relational.windowRangeFrame(spark, sfDir)))
    assert(plan.contains("specifiedwindowframe(RangeFrame, -30, currentrow$())"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange on o_custkey, got $exchanges")
  }
}
