package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native codegen'd DotProduct expression against the HOF
  * reference formulation — bit-exact equality, null handling, and presence
  * inside whole-stage codegen.
  */
class DotProductSpec extends SparkSpec {

  test("native graft_dot is bit-equal to the HOF formulation on real embeddings") {
    val e = graft.tables.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      VectorOps.dot(col("v"), col("v")).as("native"),
      VectorOps.dotHof(col("v"), col("v")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array propagates to null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("dot product runs inside WholeStageCodegen") {
    val e = graft.tables.Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorOps.dot(col("v"), col("v")).as("d"))
    // `*(n)` before an operator marks its WholeStageCodegen span in the
    // compact plan string — assert graft_dot's Project carries it.
    val plan = e.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      s"graft_dot not inside a codegen span:\n$plan")
  }
}
