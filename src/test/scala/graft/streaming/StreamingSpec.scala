package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Drives the EventStreams transformations through real Structured Streaming
  * micro-batches (MemoryStream) and checks stream ≡ batch on the same rows —
  * the contract that lets the oracle-checked batch twins (q49–q52) stand in
  * for the unbounded path.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 10:05:00"), "click", 1.0),
    (ts("2024-01-01 10:20:00"), "view", 2.0),
    (ts("2024-01-01 10:40:00"), "click", 3.0),
    (ts("2024-01-01 11:10:00"), "view", 4.0),
    (ts("2024-01-01 12:05:00"), "click", 5.0),
  )

  test("tumbling window aggregation: stream (2 micro-batches) equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val df = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingByType(df)
      .writeStream.format("memory").queryName("t_tumble").outputMode("complete").start()
    try {
      ms.addData(rows.take(3))
      q.processAllAvailable()
      ms.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("t_tumble").orderBy("w_start", "event_type").collect()
      val batch = EventStreams.tumblingByType(
        rows.toDF("ts", "event_type", "value")).orderBy("w_start", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("watermark drops a late event once the watermark has passed its window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val df = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingWithWatermark(df, "10 minutes")
      .writeStream.format("memory").queryName("t_wm").outputMode("append").start()
    try {
      // batch 1: two events in [10:00,11:00) + an advancer at 12:05
      // → watermark after this batch = 11:55, past the 11:00 window end.
      ms.addData(Seq(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:20:00"), "click", 1.0),
        (ts("2024-01-01 12:05:00"), "view", 1.0)))
      q.processAllAvailable()
      // batch 2: a LATE event for the closed 10:00 window — must be dropped.
      ms.addData(Seq((ts("2024-01-01 10:30:00"), "click", 99.0)))
      q.processAllAvailable()
      // empty batch so the final window state flushes deterministically
      ms.addData(Seq((ts("2024-01-01 13:00:00"), "view", 1.0)))
      q.processAllAvailable()
      val out = spark.table("t_wm")
        .filter(col("w_start") === ts("2024-01-01 10:00:00")).collect()
      assert(out.length == 1, s"expected one closed 10:00 window, got ${out.toSeq}")
      assert(out(0).getAs[Long]("n") == 2, "late event leaked into closed window")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: stream across micro-batches equals batch session_window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Seq(
      EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      EventStreams.Event(1L, ts("2024-01-01 10:10:00"), 2.0),
      EventStreams.Event(1L, ts("2024-01-01 11:00:00"), 3.0), // gap 50min → new session
      EventStreams.Event(2L, ts("2024-01-01 10:00:00"), 4.0),
      EventStreams.Event(1L, ts("2024-01-01 11:20:00"), 5.0), // extends session 2 (batch 2)
      EventStreams.Event(2L, ts("2024-01-01 12:00:00"), 6.0), // new session (batch 2)
    )
    val ms = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionizeStateful(ms.toDS())
      .writeStream.format("memory").queryName("t_sess").outputMode("append").start()
    try {
      ms.addData(evs.take(4))
      q.processAllAvailable()
      ms.addData(evs.drop(4))
      q.processAllAvailable()
      // Streaming emits a session row each time its composition changes
      // (upsert contract): collapse to the final version per (user, start).
      val streamed = spark.table("t_sess").collect()
        .map(r => ((r.getLong(0), r.getTimestamp(1)),
                   (r.getTimestamp(2), r.getLong(3), r.getDouble(4))))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).maxBy(_._2)) }
      val batch = EventStreams.sessionByUser(
          evs.toDS().toDF().withColumnRenamed("user_id", "user_id"))
        .collect()
        .map(r => ((r.getLong(0), r.getTimestamp(1)),
                   (r.getTimestamp(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    } finally q.stop()
  }
}
