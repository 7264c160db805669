package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Equal-area tessellation over REAL polygon rings — [[Tessellation]]'s
  * algorithm (`/root/reference/smartpy_arc/poly_splitting.py`) lifted from
  * the axis-rect model to arbitrary polygons in the [[PolyGeom]] ring model.
  *
  * The reference's split primitive is `poly.clip(extent)`
  * (`poly_splitting.py:65,72`) — clipping against an axis-aligned
  * half-plane/extent. For real rings that is Sutherland–Hodgman against a
  * single axis line: each ring is clipped independently (holes stay holes,
  * orientation is preserved, so the signed shoelace sum still nets holes
  * out). Exact for convex rings; for non-convex rings the classic S–H
  * caveat applies (collinear bridge edges may join disjoint pieces — they
  * contribute zero area, so area-targeted splitting stays correct).
  *
  * Everything else — binary search on the longer-extent axis, `tol`
  * convergence on the left part's area, even/odd recursion with a
  * per-row-seeded coin — is shared verbatim with the Rect path
  * ([[Tessellation.recursiveSplitG]]), consuming the RNG in the identical
  * order. Per-row flatMap: no shuffle, embarrassingly parallel.
  */
object RingSplit {

  type Ring = IndexedSeq[(Double, Double)]

  /** Polygon as rings (outer first, holes opposite-wound). */
  final case class Poly(rings: IndexedSeq[Ring]) {
    /** abs of the signed shoelace sum over all rings (holes subtract). */
    lazy val area: Double = {
      var a2 = 0.0
      rings.foreach { r =>
        val n = r.length
        var i = 0
        while (i < n) {
          val p = r(i); val q = r((i + 1) % n)
          a2 += p._1 * q._2 - q._1 * p._2
          i += 1
        }
      }
      math.abs(a2 / 2.0)
    }
    lazy val extent: (Double, Double, Double, Double) = {
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      rings.foreach(_.foreach { case (x, y) =>
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
      })
      (xmin, ymin, xmax, ymax)
    }

    /** Sutherland–Hodgman clip of every ring against one axis half-plane:
      * keep x≤d (vertical=true, below=true), x≥d, y≤d, y≥d. Rings that
      * degenerate (<3 points) drop out. */
    def clipHalfPlane(vertical: Boolean, d: Double, keepBelow: Boolean): Poly = {
      def coord(p: (Double, Double)) = if (vertical) p._1 else p._2
      def inside(p: (Double, Double)) =
        if (keepBelow) coord(p) <= d else coord(p) >= d
      def intersect(p: (Double, Double), q: (Double, Double)): (Double, Double) = {
        val t = (d - coord(p)) / (coord(q) - coord(p))
        if (vertical) (d, p._2 + t * (q._2 - p._2))
        else (p._1 + t * (q._1 - p._1), d)
      }
      val clipped = rings.map { r =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        val n = r.length
        var i = 0
        while (i < n) {
          val p = r(i); val q = r((i + 1) % n)
          if (inside(q)) {
            if (!inside(p)) out += intersect(p, q)
            out += q
          } else if (inside(p)) out += intersect(p, q)
          i += 1
        }
        out.toIndexedSeq
      }.filter(_.length >= 3)
      Poly(clipped)
    }
  }

  /** `split_poly` over rings: binary-search the bisecting axis line so the
    * left/lower side has `targetArea` within `tol` — same convergence and
    * failure contract as [[Tessellation.splitPoly]]. */
  def splitPoly(poly: Poly, targetArea: Double,
                tol: Double = Tessellation.DefaultTolerance): Option[(Poly, Poly)] = {
    if (poly.area <= targetArea) return None
    val (xmin, ymin, xmax, ymax) = poly.extent
    val isHoriz = (xmax - xmin) > (ymax - ymin) // wider → sweep a vertical line over x
    var dMin = if (isHoriz) xmin else ymin
    var dMax = if (isHoriz) xmax else ymax
    var iters = 0
    while (dMin < dMax && iters < Tessellation.MaxSearchIters) {
      iters += 1
      val dMid = (dMin + dMax) / 2
      val left = poly.clipHalfPlane(isHoriz, dMid, keepBelow = true)
      if (left.rings.isEmpty) return None // clip degenerated
      val leftArea = left.area
      if (math.abs(1 - leftArea / targetArea) <= tol) {
        val right = poly.clipHalfPlane(isHoriz, dMid, keepBelow = false)
        return if (right.rings.isEmpty) None else Some((left, right))
      } else if (leftArea > targetArea) dMax = dMid
      else dMin = dMid
    }
    None
  }

  /** Pure per-row tessellation over rings (callback order = split_seq). */
  def tessellate(poly: Poly, acres: Double, maxAcres: Double, seed: Long,
                 tol: Double = Tessellation.DefaultTolerance): Seq[(Option[Poly], Long)] = {
    val numParts = math.floor(acres / maxAcres).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[(Option[Poly], Long)]
    var seq = 1L
    Tessellation.recursiveSplitG[Poly](Some(poly), numParts,
        new scala.util.Random(seed), _.area, (p, t) => splitPoly(p, t, tol)) { part =>
      out += ((part, seq)); seq += 1
    }
    out.toSeq
  }

  /** G3 `split_equal_area` over a rings column: one row → N rows. Input:
    * `oidCol` (row id), `geomCol` ([[PolyGeom.RingsT]]), `acresCol`; output:
    * part `geom` rings + `part_area`, `orig_fid`, 1-based `split_seq`, then
    * the carried attributes — the same contract as the Rect operator. */
  def splitEqualArea(df: DataFrame, maxAcres: Double,
                     oidCol: String = "OBJECTID", geomCol: String = "geom",
                     acresCol: String = "acres",
                     tol: Double = Tessellation.DefaultTolerance): DataFrame = {
    val inSchema = df.schema
    val oidIdx = inSchema.fieldIndex(oidCol)
    val geomIdx = inSchema.fieldIndex(geomCol)
    val acresIdx = inSchema.fieldIndex(acresCol)
    val attrIdx = inSchema.fields.zipWithIndex.collect {
      case (f, i) if i != oidIdx && i != geomIdx && i != acresIdx => i
    }.toSeq
    val outSchema = StructType(
      StructField("geom", PolyGeom.RingsT, nullable = true) +:
      StructField("part_area", DoubleType, nullable = true) +:
      StructField("orig_fid", LongType) +:
      StructField("split_seq", LongType) +:
      attrIdx.map(i => inSchema.fields(i)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.flatMap { row =>
      val oid = row.get(oidIdx) match {
        case l: Long => l
        case i: Int => i.toLong
        case x => x.toString.toLong
      }
      val ringRows = row.getSeq[scala.collection.Seq[Row]](geomIdx)
      val poly = Poly(ringRows.map(r =>
        r.map(p => (p.getDouble(0), p.getDouble(1))).toIndexedSeq).toIndexedSeq)
      val acres = row.getDouble(acresIdx)
      val attrs = attrIdx.map(row.get)
      tessellate(poly, acres, maxAcres, seed = oid, tol).map { case (part, seq) =>
        val geomOut = part.map(p =>
          p.rings.map(r => r.map { case (x, y) => Row(x, y) })).orNull
        val areaOut = part.map(_.area).map(Double.box).orNull
        Row.fromSeq(geomOut +: areaOut +: oid +: seq +: attrs)
      }
    }
  }
}
