package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** True (unrestricted) Damerau–Levenshtein distance, Lowrance & Wagner 1975.
  *
  * This is the engine's scalar-UDF surface (SURVEY.md §2.2 UDF row): the
  * reference's `map` is arbitrary per-row client code (`MapReduceClient.h:57-59`),
  * and the policy here is functions-over-UDFs — a UDF is only justified when
  * the logic is genuinely imperative and has no `functions._` composition.
  * Edit distance with transpositions is that case: Spark ships `levenshtein`
  * but no transposition-aware variant, and the DP needs a mutable
  * last-occurrence table. Used for fuzzy near-dup pairing (q78).
  *
  * Matches DuckDB's `damerau_levenshtein` exactly (verified: 'CA'→'ABC' = 2,
  * i.e. the full alphabet-table algorithm, not the restricted OSA variant
  * which would give 3). Operates on Unicode code points, not UTF-16 units,
  * to agree with DuckDB's character counting on any input.
  */
object StringDistance {

  def damerauLevenshtein(sa: String, sb: String): Int = {
    val a = sa.codePoints.toArray
    val b = sb.codePoints.toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is offset by +1: d(i+1)(j+1) covers prefixes a[0,i) × b[0,j).
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // da(c) = largest row index whose a-char is c, seen so far.
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= n) {
      var db = 0 // largest column j' < j with b(j'-1) == a(i-1)
      j = 1
      while (j <= m) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Column form; registration-free (the udf literal carries the function). */
  val dl: (Column, Column) => Column = {
    val u = udf((x: String, y: String) =>
      if (x == null || y == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(damerauLevenshtein(x, y).toLong))
    (a, b) => u(a, b)
  }
}
