package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Real polygon geometry over ring coordinate arrays — the full-polygon half
  * of the reference's exchange encodings (`/root/reference/smartpy_arc/
  * arc_utils.py:971-978,1072-1078`: ESRISHAPE/ESRIJSON/GEOJSON/WKT/WKB;
  * encoding + CRS WKT ride as field metadata, `:1104-1112`).
  *
  * Model: a ring is `array<struct<x:double,y:double>>`; a polygon is
  * `array<ring>` — outer ring first, holes (opposite winding) after. Rings
  * may be closed (last == first) or open; every kernel wraps mod n so both
  * spell the same shape. The representation is columnar-native: rings live
  * in Tungsten `ArrayData` end to end, and every codec/measure below is a
  * thin codegen'd expression over a compiled static kernel — scan-speed, no
  * UDF serialization, no shuffle.
  *
  * Area/centroid use the shoelace formula per ring, summed SIGNED across
  * rings (CCW outer positive, CW holes negative — so holes subtract
  * naturally): A = Σᵣ ½ Σᵢ crossᵢ, C = Σᵣ Σᵢ (pᵢ+pᵢ₊₁)·crossᵢ / 6A, left
  * fold in ring order — the op sequence the DuckDB oracle reproduces with
  * `list_reduce`.
  */
object PolyGeom {

  val PointT: StructType =
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))
  val RingT: ArrayType = ArrayType(PointT, containsNull = false)
  val RingsT: ArrayType = ArrayType(RingT, containsNull = false)

  // ---- compiled kernels (shared by eval and codegen) -----------------------

  /** ISO little-endian WKB polygon (byteOrder=1, type=3). */
  def wkbOf(rings: ArrayData): Array[Byte] = {
    val nRings = rings.numElements()
    var nPts = 0
    var r = 0
    while (r < nRings) { nPts += rings.getArray(r).numElements(); r += 1 }
    val bb = java.nio.ByteBuffer.allocate(9 + 4 * nRings + 16 * nPts)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(3).putInt(nRings)
    r = 0
    while (r < nRings) {
      val ring = rings.getArray(r)
      val n = ring.numElements()
      bb.putInt(n)
      var i = 0
      while (i < n) {
        val p = ring.getStruct(i, 2)
        bb.putDouble(p.getDouble(0)).putDouble(p.getDouble(1))
        i += 1
      }
      r += 1
    }
    bb.array()
  }

  /** Decode a WKB polygon (type 3) OR multipolygon (type 6) back to rings,
    * either byte order. A multipolygon flattens into the single rings model
    * — each member polygon's rings concatenate in order, which keeps the
    * signed-shoelace area/centroid exact (disjoint members all contribute
    * with their own winding). */
  def ringsOf(wkb: Array[Byte]): ArrayData = {
    val bb = java.nio.ByteBuffer.wrap(wkb)
    val rings = scala.collection.mutable.ArrayBuffer.empty[Any]
    def readPolygonBody(): Unit = {
      val nRings = bb.getInt()
      var r = 0
      while (r < nRings) {
        val n = bb.getInt()
        val pts = new Array[Any](n)
        var i = 0
        while (i < n) { pts(i) = InternalRow(bb.getDouble(), bb.getDouble()); i += 1 }
        rings += new GenericArrayData(pts)
        r += 1
      }
    }
    def readHeader(): Int = {
      val order =
        if (bb.get() == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN
      bb.order(order)
      bb.getInt()
    }
    readHeader() match {
      case 3 => readPolygonBody()
      case 6 =>
        val nPolys = bb.getInt()
        var p = 0
        while (p < nPolys) {
          // each member polygon repeats its own byte-order + type header
          val t = readHeader()
          require(t == 3, s"multipolygon member has WKB type $t, expected 3")
          readPolygonBody()
          p += 1
        }
      case other => throw new IllegalArgumentException(
        s"not a WKB polygon/multipolygon (type $other)")
    }
    new GenericArrayData(rings.toArray)
  }

  /** Parse `POLYGON ((x y, …), (…))` WKT (case-insensitive tag, flexible
    * whitespace, scientific notation) back to rings — the decode half of
    * [[polygonWkt]]. */
  def ringsOfWkt(wkt: String): ArrayData = {
    val t = wkt.trim
    require(t.regionMatches(true, 0, "POLYGON", 0, 7), s"not a WKT polygon: $t")
    val open = t.indexOf('(')
    val close = t.lastIndexOf(')')
    require(open >= 0 && close > open, s"malformed WKT polygon: $t")
    val body = t.substring(open + 1, close)
    val rings = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < body.length) {
      val rOpen = body.indexOf('(', i)
      if (rOpen < 0) i = body.length
      else {
        val rClose = body.indexOf(')', rOpen)
        require(rClose > rOpen, s"unterminated ring in WKT polygon: $t")
        val pts = body.substring(rOpen + 1, rClose).split(",").map { pair =>
          val xy = pair.trim.split("\\s+")
          require(xy.length == 2, s"bad WKT coordinate '$pair'")
          InternalRow(xy(0).toDouble, xy(1).toDouble): Any
        }
        rings += new GenericArrayData(pts)
        i = rClose + 1
      }
    }
    new GenericArrayData(rings.toArray)
  }

  /** One-pass signed shoelace area + centroid over all rings:
    * struct(area, cx, cy). Degenerate (zero-area) polygons yield NaN
    * centroids (0/0) rather than a fabricated point. */
  def statsOf(rings: ArrayData): InternalRow = {
    var a2 = 0.0   // 2·signed area
    var cx6 = 0.0  // 6A·cx
    var cy6 = 0.0
    val nRings = rings.numElements()
    var r = 0
    while (r < nRings) {
      val ring = rings.getArray(r)
      val n = ring.numElements()
      var i = 0
      while (i < n) {
        val p = ring.getStruct(i, 2)
        val q = ring.getStruct((i + 1) % n, 2)
        val cross = p.getDouble(0) * q.getDouble(1) - q.getDouble(0) * p.getDouble(1)
        a2 += cross
        cx6 += (p.getDouble(0) + q.getDouble(0)) * cross
        cy6 += (p.getDouble(1) + q.getDouble(1)) * cross
        i += 1
      }
      r += 1
    }
    val area = a2 / 2.0
    InternalRow(area, cx6 / (6.0 * area), cy6 / (6.0 * area))
  }

  /** Even-odd ray cast: is (px,py) inside the polygon? One horizontal ray
    * to +∞; parity of edge crossings over ALL rings, so holes (any winding)
    * exclude naturally. The crossing test for edge (cur → nxt) is
    * `(cur.y > py) != (nxt.y > py) && px < (nxt.x-cur.x)·(py-cur.y)/(nxt.y-cur.y) + cur.x`
    * — one IEEE division per crossing candidate, the EXACT op sequence the
    * DuckDB oracle spells with a list comprehension (edge orientation
    * cur→nxt matters: the reversed edge rounds differently at the ulp).
    * Boundary points follow the crossing rule's tie-breaking (consistent
    * across engines, not a documented in/out guarantee). */
  def containsOf(rings: ArrayData, px: Double, py: Double): Boolean = {
    var inside = false
    val nRings = rings.numElements()
    var r = 0
    while (r < nRings) {
      val ring = rings.getArray(r)
      val n = ring.numElements()
      var i = 0
      while (i < n) {
        val cur = ring.getStruct(i, 2)
        val nxt = ring.getStruct((i + 1) % n, 2)
        val cy = cur.getDouble(1); val ny = nxt.getDouble(1)
        if ((cy > py) != (ny > py) &&
            px < (nxt.getDouble(0) - cur.getDouble(0)) * (py - cy) / (ny - cy)
              + cur.getDouble(0)) {
          inside = !inside
        }
        i += 1
      }
      r += 1
    }
    inside
  }

  /** One-pass minimum bounding rectangle: struct(xmin, ymin, xmax, ymax).
    * Empty rings yield a NULL-free all-NaN MBR (no vertices to bound). */
  def mbrOf(rings: ArrayData): InternalRow = {
    var xmin = Double.NaN; var ymin = Double.NaN
    var xmax = Double.NaN; var ymax = Double.NaN
    val nRings = rings.numElements()
    var r = 0
    while (r < nRings) {
      val ring = rings.getArray(r)
      val n = ring.numElements()
      var i = 0
      while (i < n) {
        val p = ring.getStruct(i, 2)
        val x = p.getDouble(0); val y = p.getDouble(1)
        if (xmin.isNaN || x < xmin) xmin = x
        if (xmax.isNaN || x > xmax) xmax = x
        if (ymin.isNaN || y < ymin) ymin = y
        if (ymax.isNaN || y > ymax) ymax = y
        i += 1
      }
      r += 1
    }
    InternalRow(xmin, ymin, xmax, ymax)
  }

  /** Clip rings to an axis-aligned rectangle: four Sutherland–Hodgman
    * half-plane passes ([[RingSplit.Poly.clipHalfPlane]] — the same kernel
    * the tessellation splitter uses, the reference's `clip(extent)`).
    * Degenerate result → empty rings array. */
  def clipRectOf(rings: ArrayData, xmin: Double, ymin: Double,
                 xmax: Double, ymax: Double): ArrayData = {
    val nRings = rings.numElements()
    val in = (0 until nRings).map { r =>
      val ring = rings.getArray(r)
      (0 until ring.numElements()).map { i =>
        val p = ring.getStruct(i, 2); (p.getDouble(0), p.getDouble(1))
      }
    }
    val clipped = RingSplit.Poly(in.toIndexedSeq)
      .clipHalfPlane(vertical = true, xmax, keepBelow = true)
      .clipHalfPlane(vertical = true, xmin, keepBelow = false)
      .clipHalfPlane(vertical = false, ymax, keepBelow = true)
      .clipHalfPlane(vertical = false, ymin, keepBelow = false)
    new GenericArrayData(clipped.rings.map(r =>
      new GenericArrayData(r.map { case (x, y) => InternalRow(x, y): Any }.toArray): Any).toArray)
  }

  // ---- Column surface ------------------------------------------------------

  def polygonWkb(rings: Column): Column =
    Bridge.column(PolygonWkb(Bridge.expression(rings)))
  def wkbPolygonRings(wkb: Column): Column =
    Bridge.column(WkbPolygonRings(Bridge.expression(wkb)))
  def wktPolygonRings(wkt: Column): Column =
    Bridge.column(WktPolygonRings(Bridge.expression(wkt)))
  def clipRect(rings: Column, xmin: Column, ymin: Column,
               xmax: Column, ymax: Column): Column =
    Bridge.column(RingsClipRect(Bridge.expression(rings), Bridge.expression(xmin),
      Bridge.expression(ymin), Bridge.expression(xmax), Bridge.expression(ymax)))
  def polygonStats(rings: Column): Column =
    Bridge.column(PolygonStats(Bridge.expression(rings)))
  def pointInPolygon(rings: Column, px: Column, py: Column): Column =
    Bridge.column(PointInPolygon(Bridge.expression(rings),
      Bridge.expression(px), Bridge.expression(py)))
  def polygonMbr(rings: Column): Column =
    Bridge.column(PolygonMbr(Bridge.expression(rings)))
  /** Absolute polygon area (holes subtracted), winding-independent. */
  def polygonArea(rings: Column): Column = abs(polygonStats(rings).getField("area"))

  private def num(c: Column): Column = c.cast("string")

  /** WKT: `POLYGON ((x y, …), (…))` — doubles rendered by Spark's
    * double→string, matching the point codecs in [[GeomCodec]]. */
  def polygonWkt(rings: Column): Column =
    concat(lit("POLYGON ("),
      concat_ws(", ", transform(rings, r => concat(lit("("),
        concat_ws(", ", transform(r, p =>
          concat(num(p.getField("x")), lit(" "), num(p.getField("y"))))),
        lit(")")))),
      lit(")"))

  private def ringJson(r: Column): Column =
    concat(lit("["),
      concat_ws(",", transform(r, p =>
        concat(lit("["), num(p.getField("x")), lit(","), num(p.getField("y")), lit("]")))),
      lit("]"))

  /** GeoJSON: `{"type":"Polygon","coordinates":[[[x,y],…],…]}`. */
  def polygonGeoJson(rings: Column): Column =
    concat(lit("""{"type":"Polygon","coordinates":["""),
      concat_ws(",", transform(rings, ringJson _)), lit("]}"))

  /** EsriJSON: `{"rings":[[[x,y],…],…],"spatialReference":{"wkid":N}}` —
    * the native-JSON passthrough encoding. */
  def polygonEsriJson(rings: Column, wkid: Int): Column =
    concat(lit("""{"rings":["""),
      concat_ws(",", transform(rings, ringJson _)),
      lit(s"""],"spatialReference":{"wkid":$wkid}}"""))

  private val geoJsonSchema = StructType(Seq(StructField("coordinates",
    ArrayType(ArrayType(ArrayType(DoubleType))))))
  private val esriJsonSchema = StructType(Seq(StructField("rings",
    ArrayType(ArrayType(ArrayType(DoubleType))))))

  private def nestedToRings(coords: Column): Column =
    transform(coords, r => transform(r, p =>
      struct(element_at(p, 1).as("x"), element_at(p, 2).as("y"))))

  /** Parse GeoJSON `{"type":"Polygon","coordinates":[…]}` back to rings —
    * the decode half of [[polygonGeoJson]]. Declarative (`from_json`), so
    * it stays inside codegen and malformed input yields null, matching
    * Spark's JSON semantics. */
  def geoJsonPolygonRings(json: Column): Column =
    nestedToRings(from_json(json, geoJsonSchema).getField("coordinates"))

  /** Parse EsriJSON `{"rings":[…], "spatialReference":…}` back to rings —
    * the decode half of [[polygonEsriJson]]. */
  def esriJsonPolygonRings(json: Column): Column =
    nestedToRings(from_json(json, esriJsonSchema).getField("rings"))

  /** Attach the reference's geometry field metadata (encoding + CRS WKT,
    * `arc_utils.py:1104-1112`) to a geometry column; survives the parquet
    * sink like every field-metadata key ([[Sinks.EncodingKey]]). */
  def asGeometry(geom: Column, name: String, encoding: String, srWkt: String): Column =
    geom.as(name, new MetadataBuilder()
      .putString(Sinks.EncodingKey, encoding)
      .putString(Sinks.SrWktKey, srWkt)
      .build())

  private[operators] def isRingsType(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(StructType(fs), _), _) =>
      fs.length == 2 && fs.forall(_.dataType == DoubleType)
    case _ => false
  }
}

/** binary: ISO little-endian WKB polygon from rings. */
case class PolygonWkb(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (PolyGeom.isRingsType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<struct<x:double,y:double>>>, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(rings: Any): Any =
    PolyGeom.wkbOf(rings.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PolyGeom.wkbOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_polygon_wkb"
}

/** rings: decode a WKB polygon (either byte order). */
case class WkbPolygonRings(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
  override def dataType: DataType = PolyGeom.RingsT
  override def nullSafeEval(wkb: Any): Any =
    PolyGeom.ringsOf(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PolyGeom.ringsOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_wkb_polygon_rings"
}

/** rings: parse a WKT polygon string. */
case class WktPolygonRings(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")
  override def dataType: DataType = PolyGeom.RingsT
  override def nullSafeEval(wkt: Any): Any =
    PolyGeom.ringsOfWkt(wkt.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PolyGeom.ringsOfWkt($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_wkt_polygon_rings"
}

/** rings: clip to an axis-aligned rectangle (Sutherland–Hodgman ×4). */
case class RingsClipRect(rings: Expression, xmin: Expression, ymin: Expression,
                         xmax: Expression, ymax: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {
  override def children: Seq[Expression] = Seq(rings, xmin, ymin, xmax, ymax)
  override def checkInputDataTypes(): TypeCheckResult =
    if (PolyGeom.isRingsType(rings.dataType) &&
        Seq(xmin, ymin, xmax, ymax).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (rings, double, double, double, double)")
  override def dataType: DataType = PolyGeom.RingsT
  override def nullable: Boolean = true
  override protected def nullSafeEval(r: Any, x0: Any, y0: Any, x1: Any, y1: Any): Any =
    PolyGeom.clipRectOf(r.asInstanceOf[ArrayData], x0.asInstanceOf[Double],
      y0.asInstanceOf[Double], x1.asInstanceOf[Double], y1.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, x0, y0, x1, y1) =>
      s"graft.operators.PolyGeom.clipRectOf($r, $x0, $y0, $x1, $y1)")
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(rings = c(0), xmin = c(1), ymin = c(2), xmax = c(3), ymax = c(4))
  override def prettyName: String = "graft_rings_clip_rect"
}

/** boolean: even-odd ray-cast point-in-polygon test. */
case class PointInPolygon(rings: Expression, px: Expression, py: Expression)
    extends TernaryExpression {
  override def first: Expression = rings
  override def second: Expression = px
  override def third: Expression = py
  override def checkInputDataTypes(): TypeCheckResult =
    if (PolyGeom.isRingsType(rings.dataType) &&
        px.dataType == DoubleType && py.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (rings, double, double)")
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(r: Any, x: Any, y: Any): Any =
    PolyGeom.containsOf(r.asInstanceOf[ArrayData],
      x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, x, y) =>
      s"graft.operators.PolyGeom.containsOf($r, $x, $y)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(rings = f, px = s, py = t)
  override def prettyName: String = "graft_point_in_polygon"
}

/** struct<xmin,ymin,xmax,ymax>: one-pass minimum bounding rectangle. */
case class PolygonMbr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (PolyGeom.isRingsType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<struct<x:double,y:double>>>, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
  override def nullSafeEval(rings: Any): Any =
    PolyGeom.mbrOf(rings.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PolyGeom.mbrOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_polygon_mbr"
}

/** struct<area,cx,cy>: one-pass signed shoelace area + centroid. */
case class PolygonStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (PolyGeom.isRingsType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<struct<x:double,y:double>>>, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("area", DoubleType), StructField("cx", DoubleType),
    StructField("cy", DoubleType)))
  override def nullSafeEval(rings: Any): Any =
    PolyGeom.statsOf(rings.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PolyGeom.statsOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_polygon_stats"
}
