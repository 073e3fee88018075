package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
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
  * never the group's rows. Each id is hashed EXACTLY ONCE on entry (the
  * heap stores the (hex, id) pair), so an insert costs one MD5 plus
  * O(log k) string compares — never O(log k) digests.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(String, Long)]]
  with ExpectsInputTypes {

  require(k > 0, s"bottomKByHash: k must be positive, got $k")

  import BottomKByHash.ord

  override def createAggregationBuffer(): java.util.PriorityQueue[(String, Long)] =
    new java.util.PriorityQueue[(String, Long)](k + 1, ord)

  override def update(
      buf: java.util.PriorityQueue[(String, Long)],
      input: InternalRow): java.util.PriorityQueue[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      add(buf, (BottomKByHash.md5hex(id), id))
    }
    buf
  }

  private def add(buf: java.util.PriorityQueue[(String, Long)], e: (String, Long)): Unit = {
    if (buf.size < k) buf.add(e)
    else if (ord.compare(e, buf.peek()) > 0) { // reversed: "greater" = better
      buf.poll(); buf.add(e)
    }
  }

  override def merge(
      a: java.util.PriorityQueue[(String, Long)],
      b: java.util.PriorityQueue[(String, Long)]): java.util.PriorityQueue[(String, Long)] = {
    b.forEach(e => add(a, e))
    a
  }

  override def eval(buf: java.util.PriorityQueue[(String, Long)]): Any = {
    val arr = buf.toArray(new Array[(String, Long)](buf.size))
    java.util.Arrays.sort(arr, ord.reversed()) // best (smallest hash) first
    new GenericArrayData(arr.map(_._2))
  }

  override def serialize(buf: java.util.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(e => bb.putLong(e._2))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(String, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val id = bb.getLong
      buf.add((BottomKByHash.md5hex(id), id))
    }
    buf
  }

  // Analysis-time type check (via ExpectsInputTypes): a non-long child
  // (int doc ids, strings) fails with a clear DATATYPE_MISMATCH instead of
  // a runtime ClassCastException in update's asInstanceOf. Covariant
  // Seq[DataType] return — AbstractDataType is private[sql] in Spark 4.
  override def inputTypes: Seq[DataType] = Seq(LongType)
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
  // Max-heap on (md5hex, id): the ROOT is the worst retained candidate.
  // Hoisted — one comparator instance, no per-add allocation; compares are
  // plain string/long compares over the PRE-computed hex.
  private val ord: java.util.Comparator[(String, Long)] =
    new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = b._1.compareTo(a._1) // reversed: ascending-rank b-vs-a
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

  /** Hex md5 of the id's decimal string — the exact value DuckDB's
    * `md5(CAST(id AS VARCHAR))` produces, so the oracle can mirror the
    * sample row-for-row. MessageDigest is not thread-safe → per-call.
    */
  private[functions] def md5hex(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(java.lang.Long.toString(id).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
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

  /** SQL-registry builder: `graft_bottom_k_by_hash(id, 5)`. k must be a
    * foldable integer literal — it sizes the aggregation buffer, which
    * exists before any row is seen.
    */
  private[functions] def fromSql(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_bottom_k_by_hash expects (id, k), got ${exprs.length} args")
    require(exprs(1).foldable, "graft_bottom_k_by_hash: k must be a literal")
    val k = exprs(1).eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
      case other => throw new IllegalArgumentException(
        s"graft_bottom_k_by_hash: k must be integral, got $other")
    }
    BottomKByHash(exprs.head, k)
  }
}
