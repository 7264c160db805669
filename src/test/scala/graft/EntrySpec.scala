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
    // q170/q200/q204 are true-negatives at tiny SFs: the fixture has no
    // duplicate texts below sf0.1, so the perceptual near-dup pair sets
    // are legitimately empty (positive paths pinned by MultimodalSpec +
    // the sf0.1 oracle: 8 image pairs, 9 audio pairs, 8 video pairs).
    val mustHaveRows = SparkEntry.queries.keySet --
      Set("q170_image_phash", "q200_audio_fingerprint", "q204_video_dhash")
    mustHaveRows.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sf).count()
      withClue(s"$name:") { assert(n > 0) }
    }
  }

  test("catalog-stateful faces track the fixture dir within one JVM (no cross-fixture pinning)") {
    // The r11-advice bug class: a face that registers session-level state
    // (catalog workspace, snapshot table, cached vocab/index) keyed too
    // coarsely serves the FIRST fixture's data when the same JVM later
    // runs another dir — invisible to the one-dir-per-JVM verify gate.
    // Every stateful face must yield fixture-sized results for BOTH dirs
    // when run back to back.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    val docCounts = dirs.map(d => Tables.load(spark, d, "documents").count())
    assert(docCounts.distinct.size == 2 || docCounts(0) == docCounts(1))
    for (face <- Seq("q187_sql_time_travel", "q189_sql_timestamp_travel",
                     "q195_tokenizer_artifact", "q192_streaming_time_travel",
                     "q188_bpe_kernel_encode")) {
      val ns = dirs.map(d => SparkEntry.queries(face)(spark, d).count())
      // q187/q189: |docs<300| + |docs|; q195/q188: |docs|; q192: 5·|sources|·3
      // — for the doc-count faces the two fixtures must differ when the
      // underlying tables do
      withClue(s"$face: $ns vs docs $docCounts") {
        if (face != "q192_streaming_time_travel")
          assert((ns(0) == ns(1)) == (docCounts(0) == docCounts(1)))
        assert(ns.forall(_ > 0))
      }
    }
  }
}
