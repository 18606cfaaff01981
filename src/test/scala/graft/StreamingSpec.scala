package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Structured Streaming specs via MemoryStream → memory sink (SURVEY.md
  * §2.14 seams: watermark + windowed agg; stateful sessionization). */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("windowed counts aggregate 10-minute buckets under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(4), 10, "click", 2.0),
      Event(3, ts(12), 11, "view", 3.0))
    val q = StreamingOps.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc")
        .selectExpr("event_type", "n", "total_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on >30min gaps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    // user 20: events at minute 0, 10 (one session), then 60 (new session)
    mem.addData(
      Event(1, ts(0), 20, "click", 1.0),
      Event(2, ts(10), 20, "click", 1.0),
      Event(3, ts(60), 20, "click", 1.0))
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val closed = spark.table("sess").as[StreamingOps.SessionUpdate].collect()
      // first session (minutes 0-10, 2 events) must have been closed by the
      // minute-60 event arriving in the same batch
      assert(closed.exists(s =>
        s.user_id == 20 && s.n_events == 2 && s.start_sec == 0 && s.end_sec == 600))
    } finally q.stop()
  }
}
