package graft.functions

import graft.SparkSpec

/** Unit tests for the typed Aggregator (SURVEY §7 ledger item). */
class CentroidAggregatorSpec extends SparkSpec {

  test("centroid of literal vectors is the element-wise mean") {
    import spark.implicits._
    val ds = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 6.0)),
      (1, Seq(10.0, 0.0))).toDS()
    val out = ds.groupByKey(_._1)
      .agg(CentroidAggregator.centroid[(Int, Seq[Double])](_._2).toColumn.name("c"))
      .collect().toMap
    assert(out(0) == Seq(2.0, 4.0))
    assert(out(1) == Seq(10.0, 0.0))
  }

  test("centroid merge is partition-count invariant") {
    import spark.implicits._
    val vecs = (1 to 97).map(i => (i % 3, Seq(i.toDouble, (i * i).toDouble)))
    def run(parts: Int) = spark.createDataset(vecs).repartition(parts)
      .groupByKey(_._1)
      .agg(CentroidAggregator.centroid[(Int, Seq[Double])](_._2).toColumn.name("c"))
      .collect().toMap
    val a = run(1)
    val b = run(7)
    assert(a.keySet == b.keySet)
    // merge order differs across partitionings → compare to 1e-12, not ==
    a.foreach { case (k, v) =>
      v.zip(b(k)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
  }

}
