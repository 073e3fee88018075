package graft

/** The driver contract itself: entry smoke (rows > 0 on sf0.001, what the
  * driver checks at t1) and registry hygiene (every oracle key names a real
  * query — a typo'd key would silently verify nothing).
  */
class SparkEntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query has an oracle") {
    // Since r7 even q130's iterative BPE trainer is oracle-checked (the 8
    // rounds unroll into one SQL statement) — no rows-only exceptions remain.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracle: $unoracled")
  }
}
