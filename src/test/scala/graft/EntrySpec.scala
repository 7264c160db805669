package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: flagship entry + every declared query runs at sf0.001 and the
  * oracle map only names declared queries. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name:") { assert(n >= 0) }
    }
  }

  test("queries that should produce rows do") {
    // q170 is a true-negative at tiny SFs: the fixture has no duplicate
    // texts below sf0.1, so the phash near-dup pair set is legitimately
    // empty (its positive path is pinned by MultimodalSpec + the sf0.1
    // oracle, which finds exactly the 8 real pairs).
    val mustHaveRows = SparkEntry.queries.keySet -- Set("q170_image_phash")
    mustHaveRows.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sf).count()
      withClue(s"$name:") { assert(n > 0) }
    }
  }
}
