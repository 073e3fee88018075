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

  private def fileState(dir: java.io.File): Map[String, (Long, String)] = {
    def md5Of(f: java.io.File): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(f.toPath))
      d.map(b => f"$b%02x").mkString
    }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(dir).map(f => f.getPath -> (f.length(), md5Of(f))).toMap
  }

  test("q210 MERGE rewrites only touched partitions; untouched files stay byte-identical; emptied partitions vanish") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tgt = new java.io.File(sys.props("java.io.tmpdir"), "graft_spec_merge").getPath
    // parts: a={1,2}, b={3,4}, c={5,6}, d={7} — d will be fully deleted
    Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "b"),
        (5L, 50L, "c"), (6L, 60L, "c"), (7L, 70L, "d"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(tgt)
    spark.catalog.refreshByPath(tgt)
    val before = fileState(new java.io.File(tgt))
    val src = Seq(
      (3L, 31L, "b", "U"),   // in-place update in b
      (5L, 51L, "b", "U"),   // MOVE c -> b
      (7L, 70L, "d", "D"),   // delete the only row of d => d empties
      (8L, 80L, "e", "I"),   // insert into brand-new partition e
      (99L, 99L, "b", "U"),  // unmatched update: ignored
      (1L, 11L, "a", "I"))   // matched insert: ignored (a stays untouched)
      .toDF("k", "v", "p", "_op")
    graft.tables.MergeInto.merge(spark, tgt, src, "k", "p")
    val after = fileState(new java.io.File(tgt))
    // untouched partition a: every file byte-identical
    val aBefore = before.filter(_._1.contains("p=a"))
    assert(aBefore.nonEmpty && aBefore.forall { case (p, s) => after.get(p).contains(s) },
      "partition a was not touched by the merge and must keep its exact files")
    // emptied partition d: directory gone
    assert(!new java.io.File(tgt, "p=d").exists(), "emptied partition dir must be removed")
    // semantic result
    val got = spark.read.parquet(tgt).as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "a"), (2L, 20L, "a"), (3L, 31L, "b"),
      (4L, 40L, "b"), (5L, 51L, "b"), (6L, 60L, "c"), (8L, 80L, "e")), got.toString)
  }

  test("q211 versions are immutable: v1 files byte-identical across the v2 publish, pointer flips, diff counts") {
    import spark.implicits._
    val tbl = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_spec_ttv_${System.nanoTime()}").getPath
    val v1 = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
    assert(graft.tables.Versioned.write(spark, tbl, v1) == 1)
    val v1Files = fileState(new java.io.File(tbl, "v=1"))
    val v2 = Seq((1L, "x"), (2L, "Y2"), (4L, "w")).toDF("k", "s")
    assert(graft.tables.Versioned.write(spark, tbl, v2) == 2)
    assert(graft.tables.Versioned.latestVersion(tbl) == 2)
    assert(fileState(new java.io.File(tbl, "v=1")) == v1Files,
      "published version files must never change")
    val back = graft.tables.Versioned.readAt(spark, tbl, 1)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "x"), (2L, "y"), (3L, "z")))
    assert(graft.tables.Versioned.read(spark, tbl)
      .as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "Y2"), (4L, "w")))
    assert(graft.tables.Versioned.diff(spark, tbl, 1, 2) == (2L, 2L),
      "v1->v2: +{(2,Y2),(4,w)} -{(2,y),(3,z)}")
  }
}
