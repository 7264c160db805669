package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tessellation
import graft.operators.Tessellation.Rect

/** Conservation laws from poly_splitting.py (SURVEY §5), property-style over
  * a seeded random sample (scalatestplus bridge isn't in the offline cache,
  * so sampling is hand-rolled with a fixed seed — same coverage, reproducible):
  * Σ part areas ≈ parent area; parts within tolerance of mean; part count =
  * max(floor(acres/max_acres), 1); SPLIT_SEQ is 1..n; area ≤ target →
  * passthrough. */
class TessellationSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def randRect(): Rect = {
    val x0 = rng.nextDouble() * 2000 - 1000
    val y0 = rng.nextDouble() * 2000 - 1000
    Rect(x0, y0, x0 + 1.0 + rng.nextDouble() * 499, y0 + 1.0 + rng.nextDouble() * 499)
  }

  test("splitPoly: left side hits target within tolerance; clip partitions area exactly") {
    (1 to 200).foreach { _ =>
      val r = randRect()
      val target = r.area * (0.1 + rng.nextDouble() * 0.8)
      Tessellation.splitPoly(r, target) match {
        case Some((l, rt)) =>
          assert(math.abs(1 - l.area / target) <= Tessellation.DefaultTolerance)
          assert(math.abs(l.area + rt.area - r.area) / r.area < 1e-9)
        case None => fail(s"split failed for $r target=$target")
      }
    }
  }

  test("splitPoly: area <= target returns None (poly_splitting.py:29-30)") {
    val r = Rect(0, 0, 10, 10)
    assert(Tessellation.splitPoly(r, 100.0).isEmpty)
    assert(Tessellation.splitPoly(r, 200.0).isEmpty)
  }

  test("tessellate: part count, seq completeness, conservation, equal areas") {
    (1 to 100).foreach { _ =>
      val r = randRect()
      val parts = 1 + rng.nextInt(12)
      val seed = rng.nextLong()
      val maxAcres = r.area / (parts + 0.5) // → floor(acres/maxAcres) == parts
      val out = Tessellation.tessellate(r, r.area, maxAcres, seed)
      val expected = math.max(math.floor(r.area / maxAcres).toLong, 1L)
      assert(out.length == expected)
      assert(out.map(_._2) == (1L to expected))
      if (out.forall(_._1.isDefined)) {
        val areas = out.map(_._1.get.area)
        assert(math.abs(areas.sum - r.area) / r.area < 1e-6)
        val mean = r.area / expected
        areas.foreach(a => assert(math.abs(1 - a / mean) < 0.03,
          s"part area $a vs mean $mean (n=$expected)"))
      }
    }
  }

  test("tessellate: num_parts <= 1 emits the whole polygon once (poly_splitting.py:105-107)") {
    val r = Rect(0, 0, 10, 10)
    val out = Tessellation.tessellate(r, acres = 50.0, maxAcres = 100.0, seed = 1)
    assert(out == Seq((Some(r), 1L)))
  }

  test("tessellate: deterministic per seed") {
    val r = Rect(0, 0, 30, 20)
    val a = Tessellation.tessellate(r, 600, 85, seed = 7) // 7 parts → odd coin path
    val b = Tessellation.tessellate(r, 600, 85, seed = 7)
    assert(a == b)
  }
}
