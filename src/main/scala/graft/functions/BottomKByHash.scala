package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The third rung of the custom-aggregate ladder (after `Aggregator`s like
  * TopK/Centroid): a Catalyst `TypedImperativeAggregate` — arbitrary JVM
  * aggregation state carried as a RAW BINARY buffer through partial
  * aggregation, the API Spark itself uses for sketches
  * (`ApproximatePercentile`, `HllSketchAgg`). In reference terms this is
  * still the `reduce`-side of the pipeline (`MapReduceFramework.cpp:245-266`)
  * — specialized to a bounded combiner that also runs map-side.
  *
  * Semantics: the k ids with the SMALLEST (md5(id), id) rank per group — a
  * deterministic "reservoir" sample: hash order is uniform but reproducible
  * across runs, engines, partitionings, and corpus appends (the q63/q137
  * convention), unlike `reservoir`/`rand()` sampling. Returns the ids
  * sorted by that rank (ascending), so the result is a stable array.
  *
  * State is O(k) per group through every phase: each partial keeps a
  * bounded worst-first heap, `merge` folds two heaps, `serialize` writes
  * k longs — at 100 TB the shuffle carries k ids per (group, partition),
  * never the group's rows.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k > 0, s"bottomKByHash: k must be positive, got $k")

  // max-heap on (md5(id), id): the ROOT is the worst retained candidate.
  private def ord: java.util.Comparator[java.lang.Long] =
    java.util.Comparator
      .comparing((id: java.lang.Long) => BottomKByHash.md5hex(id))
      .thenComparing((id: java.lang.Long) => id)
      .reversed()

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k + 1, ord)

  override def update(
      buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  private def add(buf: java.util.PriorityQueue[java.lang.Long], id: Long): Unit = {
    if (buf.size < k) buf.add(id)
    else if (ord.compare(id, buf.peek()) > 0) { // reversed: "greater" = better
      buf.poll(); buf.add(id)
    }
  }

  override def merge(
      a: java.util.PriorityQueue[java.lang.Long],
      b: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    b.forEach(id => add(a, id))
    a
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = buf.toArray(new Array[java.lang.Long](buf.size))
    java.util.Arrays.sort(arr, ord.reversed()) // best (smallest hash) first
    new GenericArrayData(arr.map(_.longValue()))
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(id => bb.putLong(id))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKByHash =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): BottomKByHash =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKByHash =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_bottom_k_by_hash"
}

object BottomKByHash {
  /** Hex md5 of the id's decimal string — the exact value DuckDB's
    * `md5(CAST(id AS VARCHAR))` produces, so the oracle can mirror the
    * sample row-for-row. MessageDigest is not thread-safe → per-call.
    */
  private[functions] def md5hex(id: java.lang.Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Column surface: `bottomKByHash(col("doc_id"), 5)`. */
  def bottomKByHash(col: Column, k: Int): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(
      BottomKByHash(GraftColumnBridge.expression(col), k).toAggregateExpression())
  }
}
