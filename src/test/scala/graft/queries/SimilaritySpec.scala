package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** First-principles invariants for the vector-search family on sf0.001 —
  * exact values are the DuckDB oracle's job; these pin the geometry.
  */
class SimilaritySpec extends SparkSpec {

  test("PQ coding: every centroid block codes to itself at distance zero") {
    // vec_id < 16 ARE the codebook (q59/q116 convention) — nearest
    // sub-centroid of a centroid's own block must be itself, exactly.
    val self = Similarity.pqCodes(spark, sfDir)
      .filter(col("vec_id") < 16).collect()
    assert(self.length == 16 * 8)
    self.foreach { r =>
      assert(r.getLong(2) == r.getLong(0),
        s"block ${r.getInt(1)} of centroid ${r.getLong(0)} coded to ${r.getLong(2)}")
      assert(r.getDouble(3) == 0.0)
    }
  }

  test("PQ coding: 8 blocks per vector, codes in [0, 16)") {
    val rows = Similarity.pqCodes(spark, sfDir).collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 8))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 16))
  }

  test("ADC search ranks by table-lookup sums that bound true distance from below-ish: recall floor holds") {
    // ADC approximates squared-L2 by per-block nearest-centroid lookups;
    // on this corpus the approximation must keep a usable share of the true
    // top-5 (a broken code/table join collapses recall to ~0).
    val recalls = Similarity.pqRecall(spark, sfDir).collect().map(_.getDouble(2))
    assert(recalls.length == 10)
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.2, s"mean ADC recall $mean — codes or tables likely broken")
  }
}
