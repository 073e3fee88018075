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
  * State is O(k) per group through every phase AND allocation-free per row
  * (the r10 GC-band item): the buffer is a max-heap over three PARALLEL
  * PRIMITIVE long arrays — the md5 rank as two unsigned-compared longs
  * (the 128-bit digest big-endian; hex-string order IS unsigned numeric
  * order, hex digits being ASCII-ascending) plus the id. An insert costs
  * one MD5 over a stack buffer (thread-local digest instance — no
  * per-row `getInstance`), long compares, and zero boxing; `serialize`
  * writes k longs, so at 100 TB the shuffle carries k ids per
  * (group, partition), never the group's rows.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKByHash.Buf]
  with ExpectsInputTypes {

  require(k > 0, s"bottomKByHash: k must be positive, got $k")

  import BottomKByHash.Buf

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.insertId(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.absorb(b); a }

  override def eval(buf: Buf): Any = new GenericArrayData(buf.sortedIds)

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.id(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.insertId(bb.getLong); i += 1 }
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

  /** Bounded worst-at-root binary max-heap over parallel primitive arrays.
    * Rank of an id = (h1, h2, id) compared (unsigned, unsigned, signed) —
    * exactly the (md5-hex-string, id) order of the original formulation.
    */
  final class Buf(val k: Int) {
    val h1 = new Array[Long](k)
    val h2 = new Array[Long](k)
    val id = new Array[Long](k)
    var n = 0

    // a > b in rank order (a is WORSE — evicted later)?
    private def gt(a1: Long, a2: Long, ai: Long, i: Int): Boolean = {
      var c = java.lang.Long.compareUnsigned(a1, h1(i))
      if (c == 0) c = java.lang.Long.compareUnsigned(a2, h2(i))
      if (c == 0) c = java.lang.Long.compare(ai, id(i))
      c > 0
    }

    private def swap(i: Int, j: Int): Unit = {
      var t = h1(i); h1(i) = h1(j); h1(j) = t
      t = h2(i); h2(i) = h2(j); h2(j) = t
      t = id(i); id(i) = id(j); id(j) = t
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && gt(h1(l), h2(l), id(l), m)) m = l
        if (r < n && gt(h1(r), h2(r), id(r), m)) m = r
        if (m == i) go = false else { swap(i, m); i = m }
      }
    }

    def insert(a1: Long, a2: Long, ai: Long): Unit =
      if (n < k) {
        h1(n) = a1; h2(n) = a2; id(n) = ai
        var i = n; n += 1
        // sift up (root holds the WORST retained rank)
        while (i > 0 && gt(h1(i), h2(i), id(i), (i - 1) / 2)) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (!gt(a1, a2, ai, 0)) { // better than the worst: replace root
        h1(0) = a1; h2(0) = a2; id(0) = ai
        siftDown(0)
      }

    def insertId(v: Long): Unit = {
      val d = md5digest(v)
      insert(beLong(d, 0), beLong(d, 8), v)
    }

    def absorb(b: Buf): Unit = {
      var i = 0
      while (i < b.n) { insert(b.h1(i), b.h2(i), b.id(i)); i += 1 }
    }

    /** Ids in ascending rank order (best first) — the output contract. */
    def sortedIds: Array[Long] = {
      val idx = Array.range(0, n)
      // insertion sort on rank asc — n ≤ k, runs once per group at eval
      var i = 1
      while (i < n) {
        val x = idx(i); var j = i - 1
        while (j >= 0 && gt(h1(idx(j)), h2(idx(j)), id(idx(j)), x)) {
          idx(j + 1) = idx(j); j -= 1
        }
        idx(j + 1) = x; i += 1
      }
      idx.map(id)
    }
  }

  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 of the id's decimal string — the exact bytes DuckDB's
    * `md5(CAST(id AS VARCHAR))` hashes, so the oracle mirrors the sample
    * row-for-row. Thread-local digest: no per-row getInstance.
    */
  private[functions] def md5digest(id: Long): Array[Byte] = {
    val md = tlMd5.get()
    md.reset()
    md.digest(java.lang.Long.toString(id)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }

  private def beLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Hex md5 of the id's decimal string (spec/reference use). */
  private[functions] def md5hex(id: Long): String = {
    val d = md5digest(id)
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
