package graft.core

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The MapReduce contract (reference `MapReduceClient.h:55-65`): the
  * distributed pipeline must equal sequential in-memory evaluation of the same
  * two functions, for any input, any partitioning, any input order
  * (SURVEY.md §5.2 properties a–c).
  */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  /** Run a ScalaCheck property under ScalaTest (scalatestplus bridge is not
    * in the offline dependency cache, so drive scalacheck directly).
    */
  def checkProp(prop: Prop, minSuccessful: Int = 20): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  /** The reference's own sample fixture (`Sample Client/SampleClient.cpp:74-79`). */
  val sampleStrings = Seq(
    "This string is full of characters",
    "Multithreading is awesome",
    "race conditions are bad")

  def charCount(lines: Seq[String]): Map[String, Long] = {
    val ds = spark.createDataset(lines)
    MapReduce.run(ds)(
      (s: String) => s.toSeq.map(c => (c.toString, 1L)))(
      (k: String, vs: Iterator[Long]) => Iterator((k, vs.sum)))
      .collect().toMap
  }

  test("reference sample fixture: char frequency count") {
    val got = charCount(sampleStrings)
    assert(got.size == 21)                       // 21 distinct chars
    assert(got.values.sum == 81)                 // 81 total chars
    assert(got("s") == 7)
    assert(got(" ") == 10)
    assert(got("T") == 1)
  }

  test("map multiplicity 0..N: filter and explode are expressible") {
    val ds = spark.createDataset(Seq("keep aa", "drop", "keep bb"))
    val out = MapReduce.run(ds)(
      (s: String) => if (s.startsWith("keep")) s.split(" ").map(w => (w, 1)).toSeq else Nil)(
      (k: String, vs: Iterator[Int]) => Iterator((k, vs.size)))
      .collect().toMap
    assert(out == Map("keep" -> 2, "aa" -> 1, "bb" -> 1))
  }

  test("reduce multiplicity 0..N: per-group generation and suppression") {
    val ds = spark.createDataset(Seq(1, 2, 2, 3, 3, 3))
    val out = MapReduce.run(ds)(
      (i: Int) => Iterator((i, i)))(
      (k: Int, vs: Iterator[Int]) => {
        val n = vs.size
        if (n == 1) Nil else Seq.fill(n)((k, n)) // drop singletons, expand rest
      })
      .collect().toSeq.sorted
    assert(out == Seq((2, 2), (2, 2), (3, 3), (3, 3), (3, 3)))
  }

  test("property: pipeline ≡ sequential spec (wordcount shape)") {
    val genLines = Gen.listOf(Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee"))
      .map(_.mkString(" ")))
    checkProp(Prop.forAll(genLines) { lines =>
      val mapF = (s: String) => s.split(" ").filter(_.nonEmpty).map(w => (w, 1L)).toSeq
      val redF = (k: String, vs: Iterator[Long]) => Iterator((k, vs.sum))
      val expected = MapReduce.sequentialSpec(lines)(mapF)(redF).toSet
      val got = MapReduce.run(spark.createDataset(lines))(mapF)(redF).collect().toSet
      got == expected
    })
  }

  test("property: result invariant to partition count and input order") {
    val lines = (1 to 100).map(i => s"w${i % 7} w${i % 13}")
    val mapF = (s: String) => s.split(" ").map(w => (w, 1L)).toSeq
    val redF = (k: String, vs: Iterator[Long]) => Iterator((k, vs.sum))
    val base = MapReduce.run(spark.createDataset(lines))(mapF)(redF).collect().toSet
    for (parts <- Seq(1, 3, 16)) {
      val shuffled = scala.util.Random.shuffle(lines)
      val ds = spark.createDataset(shuffled).repartition(parts)
      assert(MapReduce.run(ds)(mapF)(redF).collect().toSet == base)
    }
  }

  test("runSorted: values arrive sorted within each key-group") {
    val data = Seq(("k1", 5), ("k1", 1), ("k2", 9), ("k1", 3), ("k2", 2))
    val ds = spark.createDataset(data)
    val out = MapReduce.runSorted(ds, Some(3))(
      (p: (String, Int)) => Iterator(p))(
      (k: String, vs: Iterator[Int]) => Iterator((k, vs.toList)))
      .collect().toMap
    assert(out == Map("k1" -> List(1, 3, 5), "k2" -> List(2, 9)))
  }

  test("runSorted: group completeness — each key in exactly one reduce call") {
    val data = (1 to 500).map(i => (i % 17, i))
    val ds = spark.createDataset(data).repartition(8)
    val out = MapReduce.runSorted(ds, Some(4))(
      (p: (Int, Int)) => Iterator(p))(
      (k: Int, vs: Iterator[Int]) => Iterator((k, vs.size)))
      .collect().toSeq
    assert(out.map(_._1).distinct.size == out.size)    // one call per key
    assert(out.toMap.values.sum == 500)                // no value lost
  }

  test("runSorted supports a reducer returning a lazy view (regression: run buffered before reduceF)") {
    val ds = Seq(("a", 3L), ("a", 1L), ("b", 2L), ("a", 2L)).toDS()
    val out = MapReduce.runSorted(ds)(
      r => Iterator((r._1, r._2)))(
      // lazy view over the values iterator — only safe if the run is
      // materialized before reduceF returns control
      (k, vs) => vs.map(v => (k, v)))
      .collect().sorted
    assert(out.toSeq == Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L)))
  }
}
