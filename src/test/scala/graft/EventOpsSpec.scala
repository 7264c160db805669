package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Semantics for the event-log pack (q108/q109 cover end-to-end values). */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("latestSnapshot: newest wins, tie broken by tieCol, tombstone deletes") {
    val log = Seq(
      (1L, 10L, ts(100), "upsert", 1.0), // superseded
      (1L, 11L, ts(200), "upsert", 2.0), // winner for key 1
      (2L, 20L, ts(100), "upsert", 3.0),
      (2L, 21L, ts(300), "error", 0.0),  // delete wins → key 2 gone
      (3L, 30L, ts(100), "upsert", 4.0),
      (3L, 31L, ts(100), "upsert", 5.0), // same ts → higher event_id wins
      (4L, 40L, ts(100), "error", 0.0),
      (4L, 41L, ts(200), "upsert", 6.0)  // upsert AFTER delete resurrects
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = EventOps.latestSnapshot(log, "user_id", "ts", "event_id",
        "event_type", "error")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 11L, 2.0), (3L, 31L, 5.0), (4L, 41L, 6.0)))
  }

  test("latestSnapshot: rank-1 filter compiles to WindowGroupLimit") {
    // ≥2 rows: InferWindowGroupLimit skips when child.maxRows can't exceed
    // the limit (a 1-row LocalRelation makes the rule a no-op).
    val log = Seq((1L, 10L, ts(1), "u", 0.0), (1L, 11L, ts(2), "u", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val plan = EventOps.latestSnapshot(log, "user_id", "ts", "event_id",
      "event_type", "error").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("funnel: strict ordering — out-of-order conversions don't count") {
    val log = Seq(
      // user 1 completes a→b→c in order
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(30), "c"),
      // user 2: b BEFORE a → stalls at stage 1
      (2L, ts(10), "b"), (2L, ts(20), "a"),
      // user 3: a then b, no c → stage 2
      (3L, ts(10), "a"), (3L, ts(15), "b"),
      // user 4: never does a → counted nowhere
      (4L, ts(10), "b"), (4L, ts(20), "c"),
      // user 5: a at 10, b at 10 (NOT strictly after) → stage 1 only
      (5L, ts(10), "a"), (5L, ts(10), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(log, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "a", 4L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("funnel: later stage uses earliest prior time, not any prior event") {
    // a at 10 and 30; b only at 20 → b is after the EARLIEST a → converts
    val log = Seq((1L, ts(10), "a"), (1L, ts(30), "a"), (1L, ts(20), "b"))
      .toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(log, "user_id", "ts", "event_type", Seq("a", "b"))
      .orderBy("stage").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 1L)))
  }

  test("retentionCohorts: first-week cohorts, distinct users per offset") {
    val wk = 604800L
    val log = Seq(
      (1L, ts(10)), (1L, ts(20)),          // A: cohort 0, twice in week 0
      (1L, ts(2 * wk + 5)),                // A returns in week 2
      (2L, ts(100)),                       // B: cohort 0 only
      (3L, ts(wk + 1)), (3L, ts(2 * wk))   // C: cohort 1, returns week 2
    ).toDF("user_id", "ts")
    val out = EventOps.retentionCohorts(log, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L), (0L, 2L, 1L),          // cohort 0: A+B at offset 0, A at 2
      (1L, 0L, 1L), (1L, 1L, 1L)))         // cohort 1: C at offsets 0 and 1
  }

  test("rollingActives: DAU distinct per day, WAU spans trailing 7 days") {
    val day = 86400L
    val log = Seq(
      (1L, ts(10)), (1L, ts(20)),       // A twice on day 0 → DAU counts once
      (2L, ts(30)),                     // B on day 0
      (1L, ts(3 * day + 5)),            // A again on day 3
      (3L, ts(8 * day + 1))             // C on day 8 — day 0 outside its window
    ).toDF("user_id", "ts")
    val out = EventOps.rollingActives(log, "user_id", "ts")
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // day 0: dau {A,B}; wau window [-6,0] → {A,B}
    // day 3: dau {A}; wau [−3,3] → {A,B}
    // day 8: dau {C}; wau [2,8] → {A (day 3), C}
    assert(out.toSeq == Seq((0L, 2L, 2L), (3L, 1L, 2L), (8L, 1L, 2L)))
  }

  test("resampleDailyFill: gap days get n=0 and carry last_type forward") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L, "signup"),
      (2L, ts("2024-01-01 10:00:00"), 7L, "click"),   // same day, higher id wins
      (3L, ts("2024-01-04 08:00:00"), 7L, "purchase"),
      (4L, ts("2024-01-02 12:00:00"), 9L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.resampleDailyFill(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "day")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01", 2L, "click"),    // within-day winner = max event_id
      (7L, "2024-01-02", 0L, "click"),    // gap: zero count, type carried
      (7L, "2024-01-03", 0L, "click"),
      (7L, "2024-01-04", 1L, "purchase"),
      (9L, "2024-01-02", 1L, "view")))    // single-day span: no padding
  }

  test("mergeIntervals: overlap/touch merge, gaps split, exact block bounds") {
    import spark.implicits._
    val iv = Seq(
      // key 1: [0,10] ∪ [5,20] overlap-merge; [20,30] touches (start 20 is
      // NOT > running max 20) → merges too; [40,50] opens a new block
      (1L, 0L, 10L, 1L), (1L, 5L, 20L, 2L), (1L, 20L, 30L, 3L),
      (1L, 40L, 50L, 4L),
      // key 2: containment — [0,100] swallows [10,20]
      (2L, 0L, 100L, 5L), (2L, 10L, 20L, 6L)
    ).toDF("key", "s", "e", "tie")
    val got = graft.operators.EventOps.mergeIntervals(iv, "key", "s", "e", "tie")
      .orderBy("key", "block")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L, 30L), (1L, 40L, 50L), (2L, 0L, 100L)))
  }

  test("transitionMatrix: per-prev marginal is the window sum (r20 restructure)") {
    // a→b twice, a→c once, b→a once: P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1.
    // Per-user timelines; user 8's single event yields no pair.
    val ev = Seq(
      (1L, ts(1), 7L, "a"), (2L, ts(2), 7L, "b"), (3L, ts(3), 7L, "a"),
      (4L, ts(4), 7L, "c"),
      (5L, ts(1), 9L, "a"), (6L, ts(2), 9L, "b"), (7L, ts(3), 9L, "a"),
      (8L, ts(1), 8L, "x"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.transitionMatrix(ev, "user_id", "ts", "event_type",
        "event_id")
      .orderBy("prev", "cur")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("a", "b", 2L, 2.0 / 3.0), ("a", "c", 1L, 1.0 / 3.0),
      ("b", "a", 2L, 1.0)))
  }
}
