package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native codegen'd L2SqDist expression against the HOF reference
  * formulation — exact equality (integer arithmetic), SQL registration,
  * null handling, and presence inside whole-stage codegen.
  */
class L2SqDistSpec extends SparkSpec {

  private def quantized = graft.tables.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"),
      expr("transform(cast(embedding as array<double>), " +
           "x -> cast(floor(x * 1e6) as bigint))").as("v"))

  test("native graft_l2sq equals the HOF formulation on quantized embeddings") {
    val v2 = quantized.select(col("vec_id") + 1 as "vec_id", col("v").as("w"))
    val both = quantized.join(v2, "vec_id")
      .select(VectorOps.l2sq(col("v"), col("w")).as("native"),
              VectorOps.l2sqHof(col("v"), col("w")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(both.exists(_.getLong(0) > 0))
  }

  test("SQL spelling graft_l2sq agrees with the Column form") {
    quantized.createOrReplaceTempView("l2q")
    val sql = spark.sql(
      "SELECT vec_id, graft_l2sq(v, v) AS d FROM l2q ORDER BY vec_id").collect()
    assert(sql.nonEmpty && sql.forall(_.getLong(1) == 0L))
  }

  test("null array propagates to null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(VectorOps.l2sq(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("squared-L2 runs inside WholeStageCodegen") {
    val e = quantized.select(VectorOps.l2sq(col("v"), col("v")).as("d"))
    val plan = e.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_l2sq""".r.findFirstIn(plan).isDefined,
      s"graft_l2sq not inside a codegen span:\n$plan")
  }
}
