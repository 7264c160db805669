package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution read face: conform whatever landed in a parquet
  * directory to a DECLARED target schema.
  *
  * The reference tolerates field drift by silently dropping requested
  * fields a table doesn't carry (`/root/reference/smartpy_arc/arc_utils.py:
  * 685-689` — the field map keeps only names `ListFields` actually returns).
  * That tolerance, made explicit for an evolving landing folder:
  *
  *  - files written under OLDER schemas (missing newer columns) null-fill:
  *    parquet `mergeSchema` unions the file footers, and any target column
  *    absent from the union is added as a typed NULL literal;
  *  - EXTRA columns (present on disk, absent from the target) are dropped —
  *    the reference's "requested fields only" contract;
  *  - matching names cast to the target type (parquet widenings the merge
  *    already did — int→long, float→double — stay; anything else is an
  *    explicit cast, failing per ANSI rules rather than silently corrupting).
  *
  * Scale: `mergeSchema` reads FOOTERS of every file at plan time — O(files)
  * driver work, no data scan; the null-fill/cast projection is codegen'd
  * per row with zero shuffles, and column pruning still reaches the scan
  * (unread target columns are pruned through the projection).
  */
object SchemaEvolution {

  /** Read `path` with parquet schema merge and conform to `target`. */
  def readConformed(spark: SparkSession, path: String,
                    target: StructType): DataFrame =
    conform(spark.read.option("mergeSchema", "true").parquet(path), target)

  /** Conform an already-loaded frame to `target`: null-fill missing
    * columns, drop extras, cast drifted types, emit target column order. */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
