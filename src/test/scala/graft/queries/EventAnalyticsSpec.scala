package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-sequence contracts for the CEP pattern matcher (q181): the
  * oracle gate proves it on the corpus; these pin the state machine's
  * semantics — greedy non-overlap, reset behavior, run counting, and that
  * matching happens in (ts, event_id) order regardless of row order.
  */
class EventAnalyticsSpec extends SparkSpec {

  test("q205 PIT join: versions partition each user's timeline (every event lands exactly once)") {
    val out = EventAnalytics.pitScd2Join(spark, sfDir)
    val assigned = out.agg(sum("n_events")).collect()(0).getLong(0)
    val total = graft.tables.Tables.events(spark, sfDir).count()
    assert(assigned == total,
      s"PIT join assigned $assigned of $total events - validity intervals overlap or leak")
    // version 1 exists for every user that appears at all
    val users = out.select("user_id").distinct().count()
    val v1 = out.filter(col("version") === 1).count()
    assert(users == v1, s"$users users but $v1 version-1 rows")
  }

  test("q181 state machine: greedy non-overlapping funnels, error runs, sort-order independence") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, user: Long, sec: Int, typ: String) =
      (id, new java.sql.Timestamp(base.getTime + sec * 1000L), user, typ, 0.0, "{}")
    // user 1: two clean completions; user 2: doubled stages collapse to ONE
    // greedy match; user 3: wrong order -> zero; user 4: error runs around
    // one completion; user 5: same-second ties broken by event_id.
    val rows = Seq(
      ev(1, 1, 1, "view"), ev(2, 1, 2, "click"), ev(3, 1, 3, "purchase"),
      ev(4, 1, 4, "view"), ev(5, 1, 5, "click"), ev(6, 1, 6, "purchase"),
      ev(10, 2, 1, "view"), ev(11, 2, 2, "view"), ev(12, 2, 3, "click"),
      ev(13, 2, 4, "click"), ev(14, 2, 5, "purchase"), ev(15, 2, 6, "purchase"),
      ev(20, 3, 1, "purchase"), ev(21, 3, 2, "click"), ev(22, 3, 3, "view"),
      ev(30, 4, 1, "error"), ev(31, 4, 2, "error"), ev(32, 4, 3, "error"),
      ev(33, 4, 4, "view"), ev(34, 4, 5, "click"), ev(35, 4, 6, "purchase"),
      ev(36, 4, 7, "error"), ev(37, 4, 8, "error"),
      ev(40, 5, 1, "view"), ev(41, 5, 1, "click"), ev(42, 5, 1, "purchase"))
    val tmp = java.nio.file.Files.createTempDirectory("cep").toString
    // Scrambled write order: only (ts, event_id) may decide the sequence.
    scala.util.Random.shuffle(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventAnalytics.eventPattern(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, 2, 0, 6), (2L, 1, 0, 6), (3L, 0, 0, 3), (4L, 1, 3, 8), (5L, 1, 0, 3)),
      s"got $got")
  }
}
