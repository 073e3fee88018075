package graft.tables

import graft.SparkSpec
import java.nio.file.Files

/** Co-located join via bucketing — the 100 TB shuffle-elimination story:
  * when both join sides are bucketed (and sorted) on the join key with the
  * same bucket count, the sort-merge join reads bucket i against bucket i
  * and the plan contains NO shuffle exchange. Broadcast is disabled inside
  * the test: at production scale neither side fits in memory, and with
  * broadcast on, the tiny test tables would make the assertion vacuous.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.table(spark, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.table(spark, sfDir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = spark.sql(
        "SELECT * FROM lineitem_b JOIN orders_b ON l_orderkey = o_orderkey")
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")

      // and it is still correct
      val l = Tables.table(spark, sfDir, "lineitem")
      val o = Tables.table(spark, sfDir, "orders")
      val expected = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
