package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cms estimate dominates the exact count and is exact without collisions") {
    val terms = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(7)("gamma") ++ Seq("delta")).toDF("term")
    val cms = Sketches.cmsCounts(terms, "term", depth = 4, width = 2048)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(cms, exact.select("term"), "term", 4, 2048)
    val rows = exact.join(est, "term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toMap2
    assert(rows.size == 4)
    rows.foreach { case (t, (ex, es)) => assert(es >= ex, s"$t: est $es < exact $ex") }
    // 4 distinct terms in a 4×2048 sketch: collisions are impossible only if
    // no two terms share a bucket in EVERY row — with this fixture they
    // don't, so the estimates are exact.
    rows.foreach { case (_, (ex, es)) => assert(es == ex) }
  }

  test("cms sketch size is bounded by depth*width and merges by summation") {
    val a = (1 to 500).map(i => s"t${i % 37}").toDF("term")
    val cms = Sketches.cmsCounts(a, "term", depth = 3, width = 16)
    assert(cms.count() <= 3 * 16)
    // shard-merge law: cms(A ++ A) == cms(A) with doubled counters
    val merged = Sketches.cmsCounts(a.union(a), "term", 3, 16)
    val joined = cms.withColumnRenamed("cnt", "c1").join(merged, Seq("d", "bucket"))
    assert(joined.filter(col("cnt") =!= col("c1") * 2).count() == 0)
  }

  private implicit class ToMap2(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
