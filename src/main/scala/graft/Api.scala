package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compat.Compat
import graft.operators.{FieldMap, FieldSpec, Geometry, WhereDialect}

/** The reference's front door, composed — `arc_to_pandas`
  * (`/root/reference/smartpy_arc/arc_utils.py:614-747`) as ONE call over the
  * tested pieces, in the reference's argument order and defaults: scan →
  * optional field map (case-insensitive src, output takes the caller's
  * spelling) → optional ArcGIS-dialect where → optional derived shape
  * scalars (`spatial=True`) → sentinel fill (`fill_nulls=True` default) →
  * date clamp → optional index sort.
  *
  * A reference user's `arc_to_pandas(ws, name, index_fld=..., flds=...,
  * where=..., ...)` line maps 1:1. Everything stays a single lazy Catalyst
  * plan: projections prune the scan, the where pushes down, the fills are
  * scan-stage column expressions — no materialization until the caller acts.
  */
object Graft {

  /** `arc_to_pandas`. `flds`: None = all columns; rename via [[FieldSpec]].
    * `spatial=true` appends shape_x/shape_y/shape_area/shape_length from
    * `geomCol` when present (`arc_utils.py:683-701`). */
  def arcToTable(spark: SparkSession, workspace: String, className: String,
                 indexFld: Option[String] = None,
                 flds: Option[Seq[FieldSpec]] = None,
                 spatial: Boolean = false,
                 where: Option[String] = None,
                 fillNulls: Boolean = true,
                 strFill: String = Compat.StrFill,
                 numFill: Double = Compat.NumFill,
                 dateFill: java.sql.Timestamp = Compat.DateFill,
                 geomCol: String = "geom"): DataFrame = {
    var df = Tables.load(spark, workspace, className)
    df = where.map(w => df.filter(expr(WhereDialect.toSparkSql(w)))).getOrElse(df)
    df = flds.map(FieldMap(df, _)).getOrElse(df)
    if (spatial && df.columns.contains(geomCol))
      df = Geometry.withDerivedShapeCols(df, geomCol)
    df = Compat.clampTimestamps(df)
    if (fillNulls) df = Compat.fillSentinels(df, numFill, strFill, dateFill)
    df = indexFld.map(Compat.withIndex(df, _)).getOrElse(df)
    df
  }
}
