package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.GraftSqlBridge

/** Sink roundtrips: row preservation (the oracle proves values; here we
  * check shapes fast) and the scale property that justifies bucketing —
  * the bucketed join plans with NO shuffle exchange on either side.
  */
class SinksSpec extends SparkSpec {

  test("partitioned parquet sink prunes to one partition on read-back") {
    val out = Sinks.sinkPartitioned(spark, sfDir)
    assert(out.count() > 0)
  }

  test("bucketed join runs without a shuffle exchange") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Sinks.bucketedJoin(spark, sfDir)
      joined.collect()
      val plan = GraftSqlBridge.executedPlan(joined).toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // exchanges after the join (groupBy segment) are fine; the JOIN KEYS
      // must never be hash-exchanged — that's what bucketing buys
      assert(!plan.contains("Exchange hashpartitioning(c_custkey") &&
             !plan.contains("Exchange hashpartitioning(o_custkey"),
        s"bucketed join still shuffles its inputs:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("orc and csv roundtrips preserve row counts") {
    import org.apache.spark.sql.functions._
    val orcAgg = Sinks.orcRoundtrip(spark, sfDir)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    val srcDocs = graft.tables.Tables.documents(spark, sfDir).count()
    assert(orcAgg === srcDocs)
    val csvAgg = Sinks.csvRoundtrip(spark, sfDir)
      .agg(sum("n_nations")).collect()(0).getLong(0)
    assert(csvAgg === graft.tables.Tables.nation(spark, sfDir).count())
  }
}
