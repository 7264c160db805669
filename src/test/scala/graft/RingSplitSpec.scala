package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PolyGeom, RingSplit, Tessellation}

/** Real-ring tessellation laws: area conservation, determinism, hole
  * handling, part counts, and agreement with the Rect path on rectangles
  * (same RNG order ⇒ same part areas within tolerance). */
class RingSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import RingSplit.Poly

  private def rect(w: Double, h: Double): Poly =
    Poly(IndexedSeq(IndexedSeq((0.0, 0.0), (w, 0.0), (w, h), (0.0, h))))

  private val pentagon = Poly(IndexedSeq(IndexedSeq(
    (0.0, 0.0), (10.0, 0.0), (10.0, 8.0), (5.0, 10.0), (0.0, 8.0))))

  test("splitPoly: left side hits the target area within tol; both sides partition the area") {
    val p = pentagon
    val Some((l, r)) = RingSplit.splitPoly(p, p.area / 2)
    assert(math.abs(1 - l.area / (p.area / 2)) <= Tessellation.DefaultTolerance)
    assert(math.abs(l.area + r.area - p.area) < 1e-9) // exact partition: shared cut line
  }

  test("tessellate: conservation + part count over convex polys (random sizes)") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { i =>
      val w = 5 + rnd.nextInt(40); val h = 5 + rnd.nextInt(20)
      val p = rect(w, h)
      val parts = RingSplit.tessellate(p, acres = p.area, maxAcres = 30.0, seed = i)
      val expected = math.max(math.floor(p.area / 30.0).toLong, 1L)
      assert(parts.length == expected, s"w=$w h=$h")
      assert(parts.map(_._2).toSeq == (1L to expected).toSeq) // split_seq dense, 1-based
      if (expected > 1) {
        val total = parts.flatMap(_._1).map(_.area).sum
        // each binary split partitions exactly; accumulated fp error stays tiny
        assert(math.abs(total - p.area) / p.area < 1e-6, s"w=$w h=$h total=$total")
      }
    }
  }

  test("holes survive clipping: donut split conserves net area") {
    val donut = Poly(IndexedSeq(
      IndexedSeq((0.0, 0.0), (20.0, 0.0), (20.0, 10.0), (0.0, 10.0)),     // CCW outer, 200
      IndexedSeq((8.0, 4.0), (8.0, 6.0), (12.0, 6.0), (12.0, 4.0))))      // CW hole, 8
    assert(donut.area == 192.0)
    val Some((l, r)) = RingSplit.splitPoly(donut, donut.area / 2)
    assert(math.abs(l.area + r.area - donut.area) < 1e-9)
    // the cut at x≈10 bisects the hole too: both sides carry a hole ring
    assert(l.rings.length == 2 && r.rings.length == 2)
  }

  test("determinism: same seed → identical parts; agreement with the Rect path on rectangles") {
    val p = rect(37, 13)
    val a = RingSplit.tessellate(p, p.area, 50.0, seed = 42)
    val b = RingSplit.tessellate(p, p.area, 50.0, seed = 42)
    assert(a.map(_._1.map(_.rings)) == b.map(_._1.map(_.rings)))
    // same recursion + RNG order as the Rect path → same part areas
    val rectParts = Tessellation.tessellate(
      Tessellation.Rect(0, 0, 37, 13), 37.0 * 13, 50.0, seed = 42)
    assert(a.length == rectParts.length)
    a.zip(rectParts).foreach { case ((rp, _), (rr, _)) =>
      (rp, rr) match {
        case (Some(pp), Some(q)) => assert(math.abs(pp.area - q.area) < 1e-6)
        case (pp, q) => assert(pp.isEmpty == q.isEmpty)
      }
    }
  }

  test("splitEqualArea DataFrame operator: schema, provenance, carried attrs, part areas") {
    val rows = Seq(
      Row(1L, pentagon.rings.map(r => r.map { case (x, y) => Row(x, y) }), pentagon.area, "A"),
      Row(2L, rect(4, 4).rings.map(r => r.map { case (x, y) => Row(x, y) }), 16.0, "B"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("OBJECTID", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("geom", PolyGeom.RingsT),
        org.apache.spark.sql.types.StructField("acres", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType))))
    val out = RingSplit.splitEqualArea(df, maxAcres = 30.0)
    assert(out.columns.toSeq == Seq("geom", "part_area", "orig_fid", "split_seq", "tag"))
    val got = out.orderBy("orig_fid", "split_seq").collect()
    // pentagon area 90 → 3 parts; small rect → 1 part (whole polygon)
    assert(got.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
    assert(got.map(_.getString(4)).toSeq == Seq("A", "A", "A", "B"))
    val areas = got.take(3).map(_.getDouble(1))
    assert(math.abs(areas.sum - pentagon.area) / pentagon.area < 1e-6)
    // the part geometry is valid rings: recompute area from the geom column
    val recomputed = out.filter(col("orig_fid") === 1)
      .select(PolyGeom.polygonArea(col("geom")).as("a"), col("part_area")).collect()
    recomputed.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }
}
