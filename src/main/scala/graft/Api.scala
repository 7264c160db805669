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

  /** `pandas_to_arc` (`arc_utils.py:815-898`) as ONE call over the tested
    * pieces, in the reference's argument order and defaults: optional index
    * drop (`keep_index=False` drops the [[Compat.IndexKey]]-marked column) →
    * optional field subset/rename + `String(n)` declaration (`cols`) →
    * write-side coercions (int64→int32 when in range else float64 — lossy,
    * reproduced deliberately — bool→int32, `arc_utils.py:792-800`) →
    * optional XY→point geometry (`x_col`/`y_col`/`srs`, `:846-875`) →
    * overwrite flag (C2 `TempOverwrite`, `:121-135`; default ERRORS on an
    * existing table like the reference) → optional readback cursor
    * (`get_cursor`, `:883-892`).
    *
    * Returns the readback DataFrame when `getCursor`, else None. The write
    * itself is one lazy plan executed from the executors (coercion select,
    * varchar enforcement, and point struct all inside whole-stage codegen);
    * only the downcast min/max probe materializes anything driver-side, and
    * that is one scalar row. */
  def tableToArc(df: DataFrame, workspace: String, outputTable: String,
                 keepIndex: Boolean = true,
                 cols: Option[Seq[FieldSpec]] = None,
                 getCursor: Boolean = false,
                 overwrite: Boolean = false,
                 xCol: Option[String] = None,
                 yCol: Option[String] = None,
                 srs: Option[Int] = None,
                 varcharMode: String = "truncate"): Option[DataFrame] = {
    var d = df
    if (!keepIndex) {
      val idxCols = d.schema.fields
        .filter(_.metadata.contains(Compat.IndexKey)).map(_.name)
      if (idxCols.nonEmpty) d = d.drop(idxCols.toIndexedSeq: _*)
    }
    d = cols.map(FieldMap(d, _)).getOrElse(d)
    // The reference derives geometry whenever BOTH x_col and y_col are given
    // (`arc_utils.py:877-881`); srs is passed through and may be absent —
    // srid 0 is the standard "unknown spatial reference" encoding.
    val xy = for { x <- xCol; y <- yCol } yield (x, y, srs.getOrElse(0))
    operators.Sinks.writeTable(d, workspace, outputTable,
      overwrite = overwrite, xy = xy, coerce = true, varcharMode = varcharMode)
    if (getCursor)
      Some(operators.Sinks.readBack(df.sparkSession, workspace, outputTable))
    else None
  }
}
