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
}
