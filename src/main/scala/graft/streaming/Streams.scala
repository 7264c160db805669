package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface over the `events` schema (SURVEY §2.9).
  *
  * The reference has no streaming; the engine exposes Spark's native model:
  * the SAME transformations run on a batch DataFrame (oracle-checkable) or a
  * streaming one (`readStream`) — that unification is the design. Watermarks
  * bound state; the aggregations are partial-agg friendly (map-side combine
  * before the keyed shuffle).
  */
object Streams {

  private def dsum(c: Column, scale: Int) =
    sum(c.cast(DecimalType(27, scale))).cast("double")

  /** Tumbling-window aggregate per event type. Batch and streaming share this
    * plan shape; on a stream add `withWatermark("ts", ...)` upstream. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization per user (session_window, 30 min gap), then
    * per-user session stats. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  def userSessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    userSessions(events, gap)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))

  /** Streaming variant with watermark — used by the streaming spec. */
  def hourlyByTypeStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    hourlyByType(events.withWatermark("ts", watermark))

  /** JSON prop extraction (the `props` column is a JSON string). */
  def withJsonProp(events: DataFrame, key: String, as: String): DataFrame =
    events.withColumn(as, get_json_object(col("props"), s"$$.$key").cast("long"))
}
