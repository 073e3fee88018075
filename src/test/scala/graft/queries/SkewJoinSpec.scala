package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** AQE skew-join: the runtime complement to the manual salting queries
  * (q55/q82). With skew thresholds lowered to fixture scale, a hot key on
  * the probe side must make AQE split the skewed partition (`skew=true` on
  * the sort-merge join) — the mechanism that replaces hand-salting on a
  * real cluster, where the skew isn't known until runtime.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    val prev = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // fixture-sized thresholds: any partition > 8 KiB and 2x the median is "skewed"
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 50k rows on ONE key + 1 row on each of 99 others vs a small dim
      // table. No same-key aggregation downstream: AQE declines to split a
      // skewed partition whose clustering a parent still needs (that case
      // wants spark.sql.adaptive.forceOptimizeSkewedJoin).
      val fact = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(1, 100).select(col("id").as("k"), col("id").as("v")))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, "k").select((col("v") + col("w")).as("s"))
      // collect the SAME Dataset we inspect: count() would execute (and
      // finalize) a different AQE plan, leaving this one isFinalPlan=false
      assert(joined.collect().length === 50000 + 99)
      val plan = GraftSqlBridge.executedPlan(joined).toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("q82's salted join keeps its shuffled-hash shape (no AQE broadcast demotion)") {
    // The operator demonstrates salting: spreading a hot key over
    // (key, salt) reducers. That only demonstrates anything if the join
    // KEEPS its shuffle shape — left alone, AQE demotes it to a broadcast
    // at test/bench scale and the driver serializes the xS exploded build
    // side into a hashed relation per invocation. The SHUFFLE_HASH pin is
    // asserted here so a regression cannot silently reintroduce the
    // demotion.
    val df = Joins.joinSalted(spark, sfDir)
    assert(df.collect().nonEmpty)
    val plan = GraftSqlBridge.executedPlan(df).toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the salted join to stay a ShuffledHashJoin:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"salted join was demoted to a broadcast:\n$plan")
  }
}
