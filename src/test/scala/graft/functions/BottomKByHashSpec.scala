package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The TypedImperativeAggregate's contract: equal to the window spelling,
  * invariant under partitioning (serialize/merge path), and total below k.
  */
class BottomKByHashSpec extends SparkSpec {

  private def docs = graft.tables.Tables.documents(spark, sfDir)

  private def viaAgg(k: Int, parts: Int): Seq[(String, Long)] =
    docs.repartition(parts)
      .groupBy("lang")
      .agg(BottomKByHash.bottomKByHash(col("doc_id"), k).as("s"))
      .select(col("lang"), explode(col("s")).as("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted

  private def viaWindow(k: Int): Seq[(String, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
  }

  test("equals the row_number window spelling for several k") {
    Seq(1, 3, 5, 17).foreach { k =>
      assert(viaAgg(k, 4) == viaWindow(k), s"k=$k diverged from window spelling")
    }
  }

  test("partition-invariant: serialize/merge across 13 partitions equals 1 partition") {
    assert(viaAgg(5, 13) == viaAgg(5, 1))
  }

  test("groups smaller than k return every id, hash-ordered") {
    import spark.implicits._
    val out = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
      .groupBy("g").agg(BottomKByHash.bottomKByHash(col("id"), 10).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a").toSet == Set(1L, 2L) && out("b") == Seq(3L))
    // order within the array follows (md5, id), not insertion
    val expectedA = Seq(1L, 2L).sortBy(id => (BottomKByHash.md5hex(id), id))
    assert(out("a") == expectedA)
  }

  test("SQL registry spelling returns identical rows to the Column surface") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("bk_docs")
    val sql = spark.sql(
      """SELECT lang, s FROM (
        |  SELECT lang, graft_bottom_k_by_hash(doc_id, 5) AS s
        |  FROM bk_docs GROUP BY lang)""".stripMargin)
      .select(col("lang"), explode(col("s")).as("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(sql == viaAgg(5, 4))
  }

  test("non-long input fails at analysis, not at runtime") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a", 1)).toDF("g", "id").createOrReplaceTempView("bk_ints")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT g, graft_bottom_k_by_hash(id, 3) FROM bk_ints GROUP BY g")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("mismatch")
      || e.getMessage.toLowerCase.contains("bigint"))
  }

  test("md5hex matches Spark's md5() of the decimal string") {
    import spark.implicits._
    val rows = Seq(0L, 7L, 123456789L).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { case (id, h) => assert(BottomKByHash.md5hex(id) == h) }
  }
}
