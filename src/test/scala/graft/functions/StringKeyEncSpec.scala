package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the codegen'd string→surrogate kernels against the driver-side
  * [[graft.tables.KeyEnc]] reference: the manifest records values
  * computed by the Column path (executor, codegen) while pruning probes
  * are computed by KeyEnc (driver) — a single bit of divergence would
  * silently mis-prune.
  */
class StringKeyEncSpec extends SparkSpec {
  import graft.tables.KeyEnc

  private val rnd = new scala.util.Random(20260816L)
  private def randomStrings: Seq[String] = {
    def rs = {
      val n = rnd.nextInt(20)
      (0 until n).map(_ => rnd.nextInt(0xD7FF).toChar).mkString
    }
    Seq("", "a", "K000000000042", "4-NOT SPECIFIED", "züge/рус ネコ",
      "%", "exactly8", "longer-than-eight-bytes") ++
      (0 until 200).map(_ => rs)
  }

  test("prefix/fnv match KeyEnc byte-for-byte on random unicode strings") {
    randomStrings.foreach { s =>
      val u = UTF8String.fromString(s)
      assert(StringKeyEnc.prefix(u) == KeyEnc.encodeString(s), s"prefix($s)")
      assert(StringKeyEnc.fnv(u) == KeyEnc.hashString(s), s"fnv($s)")
    }
  }

  test("the Column path (whole-stage codegen) agrees with eval and KeyEnc; nulls stay null") {
    import spark.implicits._
    val df = (randomStrings.map(Option(_)) :+ None).toDF("s")
    val got = df.select(col("s"),
        StringKeyEnc.prefixCol(col("s")).as("p"),
        StringKeyEnc.fnvCol(col("s")).as("h"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(0)) { assert(r.isNullAt(1) && r.isNullAt(2)) }
      else {
        assert(r.getLong(1) == KeyEnc.encodeString(r.getString(0)))
        assert(r.getLong(2) == KeyEnc.hashString(r.getString(0)))
      }
    }
    // and the expression sits INSIDE a whole-stage codegen span (over a
    // real scan — a LocalTableScan folds the projection driver-side)
    val ranged = spark.range(100).selectExpr("concat('s', id) AS s")
      .select(StringKeyEnc.prefixCol(col("s")).as("p"))
    // the `*(n)` marker is the whole-stage-codegen span in simpleString
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"),
      ranged.queryExecution.executedPlan.toString)
    ranged.collect().zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == KeyEnc.encodeString(s"s$i"))
    }
  }

  test("prefix encoding is monotone: byte order of strings implies order of surrogates") {
    val ss = randomStrings
    for (a <- ss; b <- ss) {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val cmp = java.util.Arrays.compareUnsigned(x, y)
      val (ea, eb) = (KeyEnc.encodeString(a), KeyEnc.encodeString(b))
      if (cmp <= 0) assert(ea <= eb, s"monotonicity broke: '$a' vs '$b'")
    }
  }
}
