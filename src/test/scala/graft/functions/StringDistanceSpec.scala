package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pins the Damerau–Levenshtein UDF against DuckDB's `damerau_levenshtein`
  * (expected values below were computed by DuckDB — the oracle engine) and
  * law-checks the metric properties the full DL distance must satisfy.
  */
class StringDistanceSpec extends SparkSpec {
  import StringDistance.damerauLevenshtein

  private def checkProp(prop: Prop, minSuccessful: Int = 100): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("matches DuckDB damerau_levenshtein on pinned cases") {
    // ("CA","ABC") = 2 is the unrestricted-vs-OSA discriminator: the
    // restricted (optimal-string-alignment) variant would return 3.
    val cases = Seq(
      ("CA", "ABC", 2), ("abcd", "acbd", 1), ("kitten", "sitting", 3),
      ("", "abc", 3), ("ab", "ba", 1), ("abcdef", "abcfed", 2),
      ("a cat", "an act", 2), ("xyxyx", "yxyxy", 2),
      ("bd aa", "aceaebaa", 6), ("dabaed", "", 6), ("ab  eaeed", "", 9),
      ("aeb", "dbea", 3), ("ce baee b", "ae ae", 5),
      ("", "bd edcded", 9), ("cbb b", "e", 5), ("edc ", "ceaaedb", 6))
    cases.foreach { case (a, b, d) =>
      assert(damerauLevenshtein(a, b) == d, s"dl('$a','$b')")
    }
  }

  private val word = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)

  test("metric laws: identity, symmetry, bounded by levenshtein and max-len") {
    checkProp(Prop.forAll(word, word) { (a: String, b: String) =>
      val d = damerauLevenshtein(a, b)
      // DL only adds the transposition move, so it never exceeds plain
      // Levenshtein (commons-text ships with Spark).
      val lev = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b)
      ((d == 0) == (a == b)) && d == damerauLevenshtein(b, a) &&
        d <= math.max(a.length, b.length) && d <= lev
    })
  }

  test("Column form and SQL registration agree with the Scala function") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("CA", "ABC"), ("", ""))
      .toDF("a", "b")
    val rows = df.select(
      StringDistance.dl(col("a"), col("b")).as("c"),
      expr("graft_dl(a, b)").as("s"),
      col("a"), col("b")).collect()
    rows.foreach { r =>
      val exp = damerauLevenshtein(r.getString(2), r.getString(3)).toLong
      assert(r.getLong(0) == exp && r.getLong(1) == exp)
    }
  }

  test("null input yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(df.select(StringDistance.dl(col("a"), col("b"))).collect()(0).isNullAt(0))
  }
}
