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

  test("queries without an oracle are the documented exceptions only") {
    // q130: iterative BPE training (argmax + vocab rewrite per round) is not
    // one SQL statement; the driver records its rows-only check and
    // TextAnalysisSpec proves the rules against a reference trainer.
    val documented = Set("q130_bpe_merges")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == documented, s"queries without oracle: $unoracled")
  }
}
