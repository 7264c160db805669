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
