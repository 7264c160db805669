package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Equal-area polygon tessellation — the reference's one real algorithm
  * (`/root/reference/smartpy_arc/poly_splitting.py`).
  *
  * Geometry model: axis-aligned rectangles (`xmin,ymin,xmax,ymax`), the
  * parity-sufficient scalar model per SURVEY §7.4 (the reference's pandas
  * surface only ever exposes derived scalars). `clip` of a rectangle by an
  * envelope is exact intersection, so the reference's binary-search split
  * (`poly_splitting.py:13-82`) carries over unchanged.
  *
  * Semantics reproduced:
  *  - `split_poly`: binary search for the bisecting line over the MBR's
  *    longer axis (width>height → vertical line sweeping x, else horizontal
  *    sweeping y, `poly_splitting.py:41-49`); convergence when
  *    `|1 - left_area/target| <= tol` (default 0.005, `:70`); failure →
  *    `(None, None)` (`:81-82` — silent area drop, reproduced; our guard is
  *    an iteration cap instead of float-equality loop exit).
  *  - `recursive_split` (`:85-132`): even → halve; odd → coin flip decides
  *    which side takes the extra part (`:119-124`). The reference's coin is
  *    an unseeded `random.random()`; we seed a per-row RNG from ORIG_FID so
  *    results are deterministic (SURVEY §7.4) while preserving the
  *    distributional behavior.
  *  - `split_equal_area` (`:135-198`): `num_parts = floor(acres/max_acres)`
  *    (`:187`); `num_parts <= 1` → the whole polygon is emitted as one part
  *    (`:105-107`); output = attrs minus `Blob/Geometry/OID/Raster`
  *    (`:152-156`) plus `ORIG_FID` + 1-based `SPLIT_SEQ` (`:149-150,190-195`).
  *
  * Scale: per-row independent flatMap — no shuffle, perfectly parallel,
  * whole pipeline stays in one stage. At 100 TB the only concern is row-level
  * compute balance, which Spark's splittable parquet input already spreads.
  */
object Tessellation {

  val DefaultTolerance = 0.005
  val MaxSearchIters = 200

  /** Axis-aligned rectangle geometry. */
  final case class Rect(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
    def width: Double = xmax - xmin
    def height: Double = ymax - ymin
    def area: Double = math.max(width, 0.0) * math.max(height, 0.0)
    /** Exact clip by an envelope (`poly.clip(extent)`, poly_splitting.py:65,72). */
    def clip(exmin: Double, eymin: Double, exmax: Double, eymax: Double): Option[Rect] = {
      val nxmin = math.max(xmin, exmin); val nymin = math.max(ymin, eymin)
      val nxmax = math.min(xmax, exmax); val nymax = math.min(ymax, eymax)
      if (nxmin < nxmax && nymin < nymax) Some(Rect(nxmin, nymin, nxmax, nymax)) else None
    }
  }

  /** `split_poly` (poly_splitting.py:13-82): binary-search a bisecting line so
    * the left/lower side has `targetArea` within `tol`. */
  def splitPoly(poly: Rect, targetArea: Double,
                tol: Double = DefaultTolerance): Option[(Rect, Rect)] = {
    if (poly.area <= targetArea) return None
    val isHoriz = poly.width > poly.height
    var dMin = if (isHoriz) poly.xmin else poly.ymin
    var dMax = if (isHoriz) poly.xmax else poly.ymax
    var iters = 0
    while (dMin < dMax && iters < MaxSearchIters) {
      iters += 1
      val dMid = (dMin + dMax) / 2
      val left =
        if (isHoriz) poly.clip(poly.xmin - 100, poly.ymin - 100, dMid, poly.ymax + 100)
        else poly.clip(poly.xmin - 100, poly.ymin - 100, poly.xmax + 100, dMid)
      left match {
        case None => return None // clip degenerated (poly_splitting.py:66-67)
        case Some(l) =>
          val leftArea = l.area
          if (math.abs(1 - leftArea / targetArea) <= tol) {
            val right =
              if (isHoriz) poly.clip(dMid, poly.ymin - 100, poly.xmax + 1, poly.ymax + 100)
              else poly.clip(poly.xmin - 100, dMid, poly.xmax + 100, poly.ymax + 100)
            return right.map(r => (l, r))
          } else if (leftArea > targetArea) dMax = dMid
          else dMin = dMid
      }
    }
    None // search failed (poly_splitting.py:81-82)
  }

  /** Geometry-generic recursive halving (poly_splitting.py:85-132) — shared
    * by the Rect path and the real-ring path ([[RingSplit]]); both consume
    * the RNG in the identical order, so the Rect results (and q20's oracle)
    * are unchanged. */
  private[operators] def recursiveSplitG[G](poly: Option[G], numParts: Long,
      rng: scala.util.Random, area: G => Double,
      split: (G, Double) => Option[(G, G)])(onDone: Option[G] => Unit): Unit = {
    if (numParts <= 1) { onDone(poly); return }
    val polyArea = poly.map(area).getOrElse(0.0)
    val (leftParts, leftArea) =
      if (numParts % 2 == 0) (numParts / 2, polyArea / 2)
      else {
        val lp = if (rng.nextDouble() > 0.5) (numParts + 1) / 2 else numParts / 2
        (lp, lp * (polyArea / numParts))
      }
    val rightParts = numParts - leftParts
    val sp = poly.flatMap(p => split(p, leftArea))
    recursiveSplitG(sp.map(_._1), leftParts, rng, area, split)(onDone)
    recursiveSplitG(sp.map(_._2), rightParts, rng, area, split)(onDone)
  }

  /** `recursive_split` (poly_splitting.py:85-132). `None` parts propagate to
    * leaves as null geometry — reproducing the reference, whose failed splits
    * silently insert nothing useful but still fire the callback at parts<=1. */
  def recursiveSplit(poly: Option[Rect], numParts: Long, rng: scala.util.Random,
                     tol: Double)(onDone: Option[Rect] => Unit): Unit =
    recursiveSplitG[Rect](poly, numParts, rng, _.area,
      (p, t) => splitPoly(p, t, tol))(onDone)

  /** Pure per-row tessellation: returns (part, 1-based seq) in callback order
    * (`split_equal_area` loop, poly_splitting.py:176-198). */
  def tessellate(poly: Rect, acres: Double, maxAcres: Double, seed: Long,
                 tol: Double = DefaultTolerance): Seq[(Option[Rect], Long)] = {
    val numParts = math.floor(acres / maxAcres).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[(Option[Rect], Long)]
    var seq = 1L
    recursiveSplit(Some(poly), numParts, new scala.util.Random(seed), tol) { part =>
      out += ((part, seq)); seq += 1
    }
    out.toSeq
  }

  val GeomSchema: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType),
    StructField("area", DoubleType)))

  /** G3 `split_equal_area` as a DataFrame operator: one row → N rows.
    *
    * Input columns: `oidCol` (row id), `geomCol` (struct xmin,ymin,xmax,ymax),
    * `acresCol` (double); all other columns are carried attributes
    * (poly_splitting.py:152-156). Output: `geom` part struct (+area),
    * `orig_fid`, `split_seq`, then the carried attributes.
    */
  def splitEqualArea(df: DataFrame, maxAcres: Double,
                     oidCol: String = "OBJECTID", geomCol: String = "geom",
                     acresCol: String = "acres",
                     tol: Double = DefaultTolerance): DataFrame = {
    val inSchema = df.schema
    val oidIdx = inSchema.fieldIndex(oidCol)
    val geomIdx = inSchema.fieldIndex(geomCol)
    val acresIdx = inSchema.fieldIndex(acresCol)
    val attrIdx = inSchema.fields.zipWithIndex.collect {
      case (f, i) if i != oidIdx && i != geomIdx && i != acresIdx => i
    }.toSeq
    val outSchema = StructType(
      StructField("geom", GeomSchema, nullable = true) +:
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
      val g = row.getStruct(geomIdx)
      val rect = Rect(g.getDouble(0), g.getDouble(1), g.getDouble(2), g.getDouble(3))
      val acres = row.getDouble(acresIdx)
      val attrs = attrIdx.map(row.get)
      tessellate(rect, acres, maxAcres, seed = oid, tol).map { case (part, seq) =>
        val geomOut = part.map(r => Row(r.xmin, r.ymin, r.xmax, r.ymax, r.area)).orNull
        Row.fromSeq(geomOut +: oid +: seq +: attrs)
      }
    }
  }
}
