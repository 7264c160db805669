package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Geometry encodings — the reference's selectable exchange formats
  * (`/root/reference/smartpy_arc/arc_utils.py:971-978,1072-1078`:
  * ESRISHAPE / ESRIJSON / GEOJSON / WKT / WKB; encoding + CRS ride as field
  * metadata, `arc_utils.py:1104-1112`).
  *
  * Under the scalar-struct geometry model (SURVEY §7.4) points and envelopes
  * are the concrete shapes; encoders are plain codegen'd string/binary
  * expressions. WKB is ISO little-endian (byteOrder=1, type=1 point,
  * float64 x y) via a compiled kernel.
  */
object GeomCodec {

  /** WKT point: `POINT (x y)` (doubles rendered by Spark's double→string). */
  def pointWkt(x: Column, y: Column): Column =
    concat(lit("POINT ("), x.cast("string"), lit(" "), y.cast("string"), lit(")"))

  /** WKT polygon of an envelope, closed ring, counter-clockwise. */
  def boxWkt(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column = {
    def pt(a: Column, b: Column) = concat(a.cast("string"), lit(" "), b.cast("string"))
    concat(lit("POLYGON (("),
      pt(xmin, ymin), lit(", "), pt(xmax, ymin), lit(", "),
      pt(xmax, ymax), lit(", "), pt(xmin, ymax), lit(", "),
      pt(xmin, ymin), lit("))"))
  }

  /** GeoJSON point: `{"type":"Point","coordinates":[x,y]}`. */
  def pointGeoJson(x: Column, y: Column): Column =
    concat(lit("""{"type":"Point","coordinates":["""),
      x.cast("string"), lit(","), y.cast("string"), lit("]}"))

  /** Parse a WKT point back to (x, y). */
  def wktPointX(wkt: Column): Column =
    regexp_extract(wkt, """POINT \(([-\d.eE]+) ([-\d.eE]+)\)""", 1).cast("double")
  def wktPointY(wkt: Column): Column =
    regexp_extract(wkt, """POINT \(([-\d.eE]+) ([-\d.eE]+)\)""", 2).cast("double")

  // ---- WKB (compiled kernel) ----------------------------------------------
  /** 21-byte little-endian WKB point. */
  def pointWkbBytes(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    bb.array()
  }
  def wkbPointXOf(wkb: Array[Byte]): Double =
    java.nio.ByteBuffer.wrap(wkb, 5, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
  def wkbPointYOf(wkb: Array[Byte]): Double =
    java.nio.ByteBuffer.wrap(wkb, 13, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble

  def pointWkb(x: Column, y: Column): Column =
    Bridge.column(PointWkb(Bridge.expression(x), Bridge.expression(y)))
  def wkbPointX(wkb: Column): Column =
    Bridge.column(WkbCoord(Bridge.expression(wkb), isX = true))
  def wkbPointY(wkb: Column): Column =
    Bridge.column(WkbCoord(Bridge.expression(wkb), isX = false))
}

/** binary: little-endian WKB point from two doubles. */
case class PointWkb(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (double, double)")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(x: Any, y: Any): Any =
    GeomCodec.pointWkbBytes(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.operators.GeomCodec.pointWkbBytes($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_point_wkb"
}

/** double: x or y coordinate of a WKB point. */
case class WkbCoord(child: Expression, isX: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any): Any = {
    val arr = b.asInstanceOf[Array[Byte]]
    if (isX) GeomCodec.wkbPointXOf(arr) else GeomCodec.wkbPointYOf(arr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isX) "wkbPointXOf" else "wkbPointYOf"
    defineCodeGen(ctx, ev, c => s"graft.operators.GeomCodec.$m($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = if (isX) "graft_wkb_x" else "graft_wkb_y"
}
