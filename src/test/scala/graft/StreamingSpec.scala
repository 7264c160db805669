package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Structured Streaming over the events shape: the SAME plan builders the
  * batch oracle checks (q60/q61) run on a MemoryStream with a watermark. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourly windowed agg over a stream (watermark + tumbling window)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyByTypeStream(events, "1 hour")
      .writeStream.format("memory").queryName("hourly_out").outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("hourly_out").orderBy("window_start", "event_type").collect()
      assert(out.length == 2)
      assert(out(0).getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
      assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
      assert(out(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("session window merges on touch, splits strictly after gap (q61 oracle uses >)") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-01-01 10:00:00")), // s1
      (1L, ts("2024-01-01 10:30:00")), // s1 (gap == 30m: sessions touch → merged)
      (1L, ts("2024-01-01 11:00:01")), // s2 (gap > 30m → new session)
      (1L, ts("2024-01-01 11:20:00")), // s2
      (2L, ts("2024-01-01 00:00:00"))  // other user
    ).toDF("user_id", "ts")
    val out = Streams.userSessionStats(batch).orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n_sessions") == 2 && out(0).getAs[Long]("n_events") == 4)
    assert(out(1).getAs[Long]("n_sessions") == 1)
  }
}
