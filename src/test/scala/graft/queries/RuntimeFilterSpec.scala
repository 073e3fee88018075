package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Runtime row-level filtering: when a selective dimension filters a big
  * fact join, Spark can inject a bloom filter built from the dim side into
  * the fact scan (InjectRuntimeFilter) — at 100 TB this is the difference
  * between scanning the fact table and scanning the matching slice. Pinned
  * here with fixture-scale thresholds.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim join injects a bloom filter on the fact side") {
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    // force a shuffle join: broadcast joins reuse the build side directly
    // (DPP-style) and skip the bloom path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.tables.Tables.lineitem(spark, sfDir)
        .join(graft.tables.Tables.orders(spark, sfDir)
                .filter(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
        .select((col("l_quantity") * col("o_totalprice")).as("x"))
      assert(q.collect().nonEmpty)
      val plan = GraftSqlBridge.executedPlan(q).toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter in:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
