package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §7 custom-Catalyst ledger): element-wise
  * vector mean. The direct Spark analog of the reference's `client.reduce` —
  * a user-defined aggregation over a key group (reference
  * `MapReduceClient.h:64`) — but with partial aggregation (`reduce`/`merge`)
  * that the reference lacks: map-side combine means only (sum, count) pairs
  * cross the shuffle, not every vector.
  */
object CentroidAggregator {

  /** Mutable running (sum, count); Array for in-place element adds. */
  case class Buf(var sum: Array[Double], var n: Long)

  /** Centroid over `getVec(row)`; generic in the input row type so callers
    * can aggregate straight off a keyed Dataset without reshaping first.
    */
  def centroid[I](getVec: I => Seq[Double]): Aggregator[I, Buf, Seq[Double]] =
    new Aggregator[I, Buf, Seq[Double]] {
      def zero: Buf = Buf(Array.empty, 0L)
      def reduce(b: Buf, row: I): Buf = {
        val v = getVec(row)
        if (b.sum.isEmpty) b.sum = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { b.sum(i) += v(i); i += 1 }
        b.n += 1
        b
      }
      def merge(a: Buf, b: Buf): Buf =
        if (a.sum.isEmpty) b
        else if (b.sum.isEmpty) a
        else {
          var i = 0
          while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
          a.n += b.n
          a
        }
      def finish(b: Buf): Seq[Double] =
        if (b.n == 0) Seq.empty else b.sum.toSeq.map(_ / b.n)
      def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
      def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    }
}
