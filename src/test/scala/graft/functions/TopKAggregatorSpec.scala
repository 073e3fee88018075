package graft.functions

import graft.SparkSpec
import graft.queries.Similarity
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Bounded-state top-K: algebraic properties (the merge must be associative
  * and order-insensitive for partial aggregation to be correct) plus
  * end-to-end equivalence with the window-rank formulation.
  */
class TopKAggregatorSpec extends SparkSpec {

  private def checkProp(prop: Prop, minSuccessful: Int = 50): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val agg = TopKAggregator.topK[TopKAggregator.Scored](5)(identity)

  private val scoredGen = for {
    id <- Gen.choose(0L, 50L)
    s <- Gen.choose(0, 100).map(_ / 10.0) // coarse scores force ties
  } yield TopKAggregator.Scored(id, s)

  test("property: result equals sort-and-take regardless of arrival or merge order") {
    checkProp(Prop.forAll(Gen.listOf(scoredGen), Gen.choose(0, 10)) { (xs, cut) =>
      // duplicate (id, score) rows rank separately, exactly as row_number
      // over a window would rank duplicate rows.
      val expected = xs.sortBy(s => (-s.score, s.id)).take(5)
      // arbitrary split into two partials, each reduced in its own order
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      val b1 = l.reverse.foldLeft(agg.zero)(agg.reduce)
      val b2 = r.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(b1, b2)) == expected
    })
  }

  test("property: buffers never exceed k entries") {
    checkProp(Prop.forAll(Gen.listOf(scoredGen)) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce).length <= 5
    })
  }

  test("q74 (bounded-heap aggregation) equals q40 (window rank) row for row") {
    val viaWindow = Similarity.cosineTopK(spark, sfDir).collect().toSeq
    val viaAgg = Similarity.cosineTopKAgg(spark, sfDir).collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
