package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** As-of join semantics (inclusive match, latest-wins, null on no-prior). */
class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin: greatest right-time <= left-time per key; inclusive; null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"), // == right time → inclusive match
      (1L, ts("2024-01-01 09:00:00"), "e0"), // before all rights → null
      (2L, ts("2024-01-01 10:00:00"), "e3")  // key with no rights → null
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100),
      (1L, ts("2024-01-01 12:00:00"), 200)
    ).toDF("k", "t", "v")
    val out = Joins.asOfJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .select("name", "v").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out("e1") == Some(100)) // 09:30 is latest ≤ 10:00
    assert(out("e2") == Some(200)) // inclusive: 12:00 matches 12:00
    assert(out("e0") == None)
    assert(out("e3") == None)
  }

  test("rangeJoinBinned matches a direct theta-join; no cartesian in the plan") {
    val points = Seq((1, 5.0), (2, 15.0), (3, 25.0), (4, -3.0), (5, 10.0))
      .toDF("pid", "v")
    val ivs = Seq((10, 0.0, 10.0), (20, 9.0, 26.0), (30, -5.0, -1.0))
      .toDF("iid", "lo", "hi")
    val binned = Joins.rangeJoinBinned(points, "v", ivs, "lo", "hi", binWidth = 7.0)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val direct = points.join(ivs, col("v").between(col("lo"), col("hi")))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(binned == direct && direct.nonEmpty)
    val plan = Joins.rangeJoinBinned(points, "v", ivs, "lo", "hi", 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("blockedLevenshteinPasses: bounded blocks, cross-pass dedup, cap drops hot blocks") {
    // Names: aa-suffix family differs in the last char (caught by the prefix
    // pass); zz-prefix pair differs in the first char (caught by the suffix
    // pass); "far" matches nothing within 2 edits.
    val df = Seq(
      (1L, "aaaa1"), (2L, "aaaa2"), (3L, "aaaa3"),
      (4L, "xbbbb"), (5L, "ybbbb"),
      (6L, "zzzzz")
    ).toDF("id", "name")
    val passes = Seq("substr(s, 1, 4)", "right(s, 4)")
    val out = Joins.blockedLevenshteinPasses(df, "id", "name",
        maxDist = 2, passExprs = passes, maxBlockSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1), (4L, 5L, 1)))

    // Pair found by BOTH passes appears once (distinct across passes).
    val both = Joins.blockedLevenshteinPasses(
        Seq((1L, "abcde"), (2L, "abcde")).toDF("id", "name"),
        "id", "name", 2, passes, 16)
      .collect()
    assert(both.length == 1)

    // Cap: a block larger than maxBlockSize is dropped whole.
    val hot = Joins.blockedLevenshteinPasses(df, "id", "name",
        maxDist = 2, passExprs = Seq("'const'"), maxBlockSize = 2)
    assert(hot.count() == 0)
  }

  test("asOfJoin plan: exactly one exchange (keyed), no cross-product") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1)).toDF("k", "t", "v")
    val df = Joins.asOfJoin(left, right, "k", "k", "t", "t", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.split("Exchange").length - 1 <= 2, plan) // union shuffle only (+AQE reads)
  }
}
