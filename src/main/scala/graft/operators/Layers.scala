package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named non-materialized views and CTAS — the reference's `create_layer`
  * (`/root/reference/smartpy_arc/arc_utils.py:422-474`) and `copy_feats`
  * (`arc_utils.py:477-519`).
  *
  * A "layer" is projection + rename + filter stacked over a table, named in
  * the catalog, respected by all downstream ops — exactly Spark's temp view
  * over a lazy LogicalPlan. Nothing materializes until an action; Catalyst
  * merges the layer's filter/projection into downstream plans, so the
  * predicate still reaches the parquet scan (pushdown survives the view).
  */
object Layers {

  /** `create_layer`: keep/rename via field map, optional where, optional
    * derived-area column prefix (`arc_utils.py:452-455` — the reference can
    * attach a freshly named SHAPE@AREA copy). Registers and returns the view. */
  def createLayer(spark: SparkSession,
                  df: DataFrame,
                  name: String,
                  specs: Option[Seq[FieldSpec]] = None,
                  where: Option[String] = None,
                  areaCol: Option[(String, String)] = None): DataFrame = {
    var out = specs.map(FieldMap(df, _)).getOrElse(df)
    out = areaCol match {
      case Some((srcArea, newName)) => out.withColumn(newName, col(srcArea))
      case None => out
    }
    // where strings arrive in the reference's ArcGIS dialect (arc_utils.py
    // feeds them verbatim to arcpy) — normalize before the Spark parser sees
    // them so `[field]` / `"field"` / `#date#` spellings keep their meaning.
    out = where.map(w => out.filter(expr(WhereDialect.toSparkSql(w)))).getOrElse(out)
    out.createOrReplaceTempView(name)
    out
  }

  /** `copy_feats` CTAS: copy a table/layer with projection/rename/filter and
    * varchar resize, materialized to a new parquet table. Respects whatever
    * filter the input layer already carries (layers are lazy plans). */
  def copyFeats(df: DataFrame,
                outPath: String,
                specs: Option[Seq[FieldSpec]] = None,
                where: Option[String] = None): Unit = {
    var out = specs.map(FieldMap(df, _)).getOrElse(df)
    out = where.map(w => out.filter(expr(WhereDialect.toSparkSql(w)))).getOrElse(out)
    out.write.mode("overwrite").parquet(outPath)
  }
}
