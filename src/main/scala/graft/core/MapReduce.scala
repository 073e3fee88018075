package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** The reference engine's entire user-facing compute model, Spark-native.
  *
  * The reference pipeline is `map: (K1,V1) → 0..N (K2,V2)` followed by a
  * sort-shuffle grouping and `reduce: (K2, all V2 of that key) → 0..N (K3,V3)`
  * (reference `MapReduceClient.h:55-65`, pipeline `MapReduceFramework.cpp:210-268`).
  * That is exactly `flatMap → groupByKey → flatMapGroups` on a typed Dataset —
  * with two semantics-preserving upgrades the reference lacks (SURVEY.md §4.2):
  * genuinely parallel user code (the reference serializes map/reduce under a
  * global mutex) and partial aggregation/spill via Spark's shuffle machinery.
  *
  * Multiplicities match the reference contract: `mapF` may emit any number of
  * pairs per input (so filter/explode are expressible), `reduceF` may emit any
  * number of outputs per key-group.
  */
object MapReduce {

  /** Generic MapReduce job: the direct analog of `startMapReduceJob` +
    * `waitForJob` (reference `MapReduceFramework.cpp:322-353`), returning the
    * lazily-evaluated output Dataset instead of mutating a caller-owned vector.
    *
    * Grouping is hash-based (no global sort); groups are identical to the
    * reference's sort-based grouping whenever key equality is consistent with
    * ordering — which the reference itself requires (`is_equal` derives
    * equality from `operator<`, `MapReduceFramework.cpp:163-165`).
    */
  def run[I, K, V, O](input: Dataset[I])(
      mapF: I => IterableOnce[(K, V)])(
      reduceF: (K, Iterator[V]) => IterableOnce[O])(
      implicit ke: Encoder[K], ve: Encoder[V], oe: Encoder[O]): Dataset[O] = {
    implicit val kv: Encoder[(K, V)] = Encoders.tuple(ke, ve)
    input
      .flatMap(mapF(_).iterator)
      .groupByKey(_._1)
      .flatMapGroups((k: K, it: Iterator[(K, V)]) => reduceF(k, it.map(_._2)).iterator)
  }

  /** Sorted-values variant: reproduces the reference's *observable* sort-based
    * shuffle (values of one key arrive ordered — a client could depend on the
    * per-run sort at `MapReduceFramework.cpp:227-231` + global sort `:201-204`).
    *
    * Scalable secondary-sort: repartition by key, sort within partitions by
    * (key, value), then stream maximal equal-key runs — no per-group
    * materialization, no global sort, spillable. This is the
    * `repartitionAndSortWithinPartitions` pattern on the Dataset API.
    */
  def runSorted[I, K, V, O](input: Dataset[I], numPartitions: Option[Int] = None)(
      mapF: I => IterableOnce[(K, V)])(
      reduceF: (K, Iterator[V]) => IterableOnce[O])(
      implicit ke: Encoder[K], ve: Encoder[V], oe: Encoder[O],
      kord: Ordering[K], vord: Ordering[V]): Dataset[O] = {
    implicit val kv: Encoder[(K, V)] = Encoders.tuple(ke, ve)
    val pairs = input.flatMap(mapF(_).iterator)
    val spark = input.sparkSession
    val parts = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    implicit val pairOrd: Ordering[(K, V)] = Ordering.Tuple2(kord, vord)
    val sorted = pairs.rdd
      .map(p => (p, ()))
      .repartitionAndSortWithinPartitions(
        new org.apache.spark.HashPartitioner(parts) {
          override def getPartition(key: Any): Int =
            super.getPartition(key.asInstanceOf[(K, V)]._1)
        })
      .map(_._1)
    spark.createDataset(sorted).mapPartitions { it =>
      new Iterator[O] {
        private val buf = it.buffered
        private var pending: Iterator[O] = Iterator.empty
        private def advance(): Unit = {
          while (!pending.hasNext && buf.hasNext) {
            val k = buf.head._1
            // Buffer one maximal equal-key run (runs are contiguous
            // post-sort) BEFORE calling reduceF: the reference hands reduce
            // a fully materialized group (`MapReduceFramework.cpp:180-196`),
            // and a lazily-consumed iterator would silently read garbage if
            // reduceF returned a view over it (drained after return).
            val run = scala.collection.mutable.ArrayBuffer.empty[V]
            while (buf.hasNext && kord.equiv(buf.head._1, k)) run += buf.next()._2
            pending = reduceF(k, run.iterator).iterator
          }
        }
        def hasNext = { advance(); pending.hasNext }
        def next() = { advance(); pending.next() }
      }
    }
  }

  /** Pure in-memory evaluation of the same (mapF, reduceF) pair — the
    * executable specification used by the property tests (SURVEY.md §5.2):
    * the distributed pipeline must equal this for any input.
    */
  def sequentialSpec[I, K, V, O](input: Seq[I])(
      mapF: I => IterableOnce[(K, V)])(
      reduceF: (K, Iterator[V]) => IterableOnce[O]): Seq[O] =
    input.iterator
      .flatMap(mapF(_).iterator)
      .toSeq
      .groupBy(_._1)
      .iterator
      .flatMap { case (k, kvs) => reduceF(k, kvs.iterator.map(_._2)).iterator }
      .toSeq
}
