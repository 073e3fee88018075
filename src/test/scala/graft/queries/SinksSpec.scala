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

  test("xml roundtrip preserves counts and escaped string content exactly") {
    import org.apache.spark.sql.functions._
    val back = Sinks.xmlRoundtrip(spark, sfDir).collect()
    val direct = graft.tables.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("sum_user"),
           min("ts").as("min_ts"), md5(min(col("props"))).as("min_props_md5"))
      .orderBy("event_type").collect()
    // value-identical incl. the md5 over JSON-with-quotes props: XML
    // element-content escaping round-tripped every byte.
    assert(back.toSeq == direct.toSeq)
  }

  test("compaction collapses 64 staged files into a handful and loses nothing") {
    import org.apache.spark.sql.functions._
    val out = Sinks.compaction(spark, sfDir)
    val direct = graft.tables.Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
    assert(out.collect().toSeq == direct.collect().toSeq)
    def parts(d: String) = new java.io.File(d)
      .listFiles().count(f => f.getName.startsWith("part-"))
    val sfx = java.lang.Integer.toHexString(sfDir.hashCode)
    val tmp = sys.props("java.io.tmpdir")
    val staged = parts(s"$tmp/graft_smallfiles_$sfx")
    val compacted = parts(s"$tmp/graft_compacted_$sfx")
    assert(staged == 64, s"staging should fan out to 64 files, got $staged")
    assert(compacted <= 4, s"rebalance left $compacted files (want <= 4)")
  }

  test("MV auto-rewrite: plan reads the MV, not orders; kill-switch restores the base scan") {
    import org.apache.spark.sql.functions._
    val q = Sinks.mvAutoRewrite(spark, sfDir) // materializes + registers
    val plan = GraftSqlBridge.executedPlan(q).toString
    assert(plan.contains("graft_mv_orders_"), s"MV not scanned:\n${plan.take(1500)}")
    assert(!plan.contains("orders.parquet"), s"base table still scanned:\n${plan.take(1500)}")
    // values identical to the base aggregate (the oracle proves vs DuckDB;
    // this pins Spark-vs-Spark with the rewrite disabled)
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try {
      val base = graft.tables.Tables.orders(spark, sfDir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum("o_custkey").as("sum_cust"))
        .orderBy("o_orderpriority")
      val basePlan = GraftSqlBridge.executedPlan(base).toString
      assert(basePlan.contains("orders.parquet"), "kill-switch ignored")
      assert(q.collect().toSeq == base.collect().toSeq)
    } finally spark.conf.set("spark.graft.mv.rewrite", "true")
    // a FILTERED aggregate must NOT match (the MV pre-aggregated all rows)
    val filtered = graft.tables.Tables.orders(spark, sfDir)
      .filter(col("o_custkey") > 100)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("o_custkey").as("s"))
    val fPlan = GraftSqlBridge.executedPlan(filtered).toString
    assert(fPlan.contains("orders.parquet") && !fPlan.contains("graft_mv_orders_"),
      s"filtered aggregate wrongly rewritten:\n${fPlan.take(1500)}")
  }

  test("gzip text staging really writes .gz shards and the read parallelizes") {
    Sinks.gzipTextRoundtrip(spark, sfDir).collect()
    val sfx = java.lang.Integer.toHexString(sfDir.hashCode)
    val files = new java.io.File(sys.props("java.io.tmpdir"), s"graft_gztext_$sfx")
      .listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 8, s"expected 8 shards, got ${files.length}")
    assert(files.forall(_.getName.endsWith(".gz")),
      files.map(_.getName).mkString(","))
  }

  test("corrupt-record ingest quarantines exactly the malformed lines") {
    val r = Sinks.corruptRecordIngest(spark, sfDir).collect()(0)
    val docs = graft.tables.Tables.documents(spark, sfDir).count()
    assert(r.getLong(0) + r.getLong(1) == docs, "good + corrupt must partition the corpus")
    assert(r.getLong(1) > 0, "the corruption rule plants corrupt lines at every SF")
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
