package graft.compat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference compatibility semantics (SURVEY §1.2).
  *
  * The reference encodes nulls as in-band sentinels on scan
  * (`/root/reference/smartpy_arc/arc_utils.py:614-747`), clamps timestamps to
  * the int64-ns epoch window (`arc_utils.py:710-724`), and applies lossy
  * write-side type coercions (`arc_utils.py:750-812`). Spark's native
  * behavior (real SQL NULLs, µs timestamps, stable types) is the default for
  * this engine; these helpers reproduce the reference behavior as an opt-in
  * compat layer.
  *
  * Everything here is pure `Column` expression composition — whole-stage
  * codegen applies, nothing blocks pushdown of *other* predicates, and the
  * per-column min/max scan in [[downcastLongs]] is a single distributed agg.
  */
object Compat {

  /** Default sentinels (`arc_utils.py:615`: num_fill=-1, str_fill='',
    * date_fill='1678-01-01'). */
  val NumFill: Double = -1.0
  val StrFill: String = ""
  val DateFill: java.sql.Timestamp = java.sql.Timestamp.valueOf("1678-01-01 00:00:00")

  /** pandas ns-epoch validity window (`arc_utils.py:717-718`): timestamps
    * outside [1677-09-22, 2262-04-12] are coerced to null. */
  val TsMin: java.sql.Timestamp = java.sql.Timestamp.valueOf("1677-09-22 00:00:00")
  val TsMax: java.sql.Timestamp = java.sql.Timestamp.valueOf("2262-04-12 00:00:00")

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Scan-side sentinel fill (`fill_nulls=True` default path,
    * `arc_utils.py:665-708`): numerics→num_fill, strings→str_fill,
    * timestamps→date_fill. */
  def fillSentinels(df: DataFrame,
                    numFill: Double = NumFill,
                    strFill: String = StrFill,
                    dateFill: java.sql.Timestamp = DateFill): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(df.columns(df.schema.fieldIndex(f.name)))
      f.dataType match {
        case dt if isNumeric(dt) =>
          coalesce(c, lit(numFill).cast(dt)).as(f.name, f.metadata)
        case StringType =>
          coalesce(c, lit(strFill)).as(f.name, f.metadata)
        case TimestampType =>
          coalesce(c, lit(dateFill)).as(f.name, f.metadata)
        case _ => c
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Inverse of [[fillSentinels]] (`fill_nulls=False` back-conversion,
    * `arc_utils.py:741-746`): sentinel values → NULL. Note the reference also
    * nulls the literal string 'nan' (`:744`). */
  def unfillSentinels(df: DataFrame,
                      numFill: Double = NumFill,
                      strFill: String = StrFill,
                      dateFill: java.sql.Timestamp = DateFill): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      f.dataType match {
        case dt if isNumeric(dt) =>
          when(c === lit(numFill).cast(dt), lit(null).cast(dt))
            .otherwise(c).as(f.name, f.metadata)
        case StringType =>
          when(c === lit(strFill) || c === lit("nan"), lit(null).cast(StringType))
            .otherwise(c).as(f.name, f.metadata)
        case TimestampType =>
          when(c === lit(dateFill), lit(null).cast(TimestampType))
            .otherwise(c).as(f.name, f.metadata)
        case _ => c
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Timestamp clamp expression (`arc_utils.py:710-724`): values outside the
    * ns-epoch window become NULL (pd.to_datetime(errors='coerce') behavior). */
  def clampTimestamp(c: Column): Column =
    when(c.between(lit(TsMin), lit(TsMax)), c).otherwise(lit(null).cast(TimestampType))

  /** Apply [[clampTimestamp]] to every timestamp column. */
  def clampTimestamps(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => clampTimestamp(col(f.name)).as(f.name, f.metadata)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Write-side long downcast (`arc_utils.py:792-798`): an int64 column whose
    * observed min/max fit in [-2147483647, 2147483647] becomes int32; one that
    * does NOT becomes float64 (lossy — reproduced deliberately). bool→int32
    * (`:799-800`). One distributed min/max agg decides all columns at once —
    * no per-column pass, no driver loop over rows.
    */
  val DowncastBound: Long = 2147483647L

  def downcastLongs(df: DataFrame): DataFrame = {
    val longCols = df.schema.fields.filter(_.dataType == LongType).map(_.name)
    val boolCols = df.schema.fields.filter(_.dataType == BooleanType).map(_.name)
    val fits: Map[String, Boolean] =
      if (longCols.isEmpty) Map.empty
      else {
        val aggs = longCols.flatMap(n => Seq(min(col(n)).as(s"__mn_$n"), max(col(n)).as(s"__mx_$n")))
        val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
        longCols.zipWithIndex.map { case (n, i) =>
          val mn = row.get(2 * i); val mx = row.get(2 * i + 1)
          val ok = mn != null && mx != null &&
            mn.asInstanceOf[Long] >= -DowncastBound && mx.asInstanceOf[Long] <= DowncastBound
          n -> ok
        }.toMap
      }
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case LongType if fits(f.name) => col(f.name).cast(IntegerType).as(f.name, f.metadata)
        case LongType => col(f.name).cast(DoubleType).as(f.name, f.metadata)
        case BooleanType => col(f.name).cast(IntegerType).as(f.name, f.metadata)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Index semantics (§1.3, `arc_utils.py:629-632,733-736,770-772`): a
    * pandas index is any column, sorted, NOT required unique; round-trips as
    * an ordinary column (`keep_index`). Spark has no index — this is the
    * explicit mapping: sort by the column and mark it in metadata so a sink
    * can record which column was "the index". Purely presentational; no
    * effect on any operator semantics. */
  val IndexKey = "graft.index"
  def withIndex(df: DataFrame, indexCol: String): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.name == indexCol) {
        val md = new MetadataBuilder().withMetadata(f.metadata)
          .putBoolean(IndexKey, true).build()
        col(f.name).as(f.name, md)
      } else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*).orderBy(col(indexCol))
  }

  /** Case-insensitive column resolution where the OUTPUT takes the caller's
    * spelling, not the data's (`arc_utils.py:1036-1049`). Unknown names are an
    * error (the reference raises via polars select). */
  def selectRequestedCase(df: DataFrame, requested: Seq[String]): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = requested.map { r =>
      byLower.get(r.toLowerCase) match {
        case Some(actual) => col(actual).as(r)
        case None => throw new IllegalArgumentException(
          s"column '$r' not found (case-insensitive) among ${df.columns.mkString(",")}")
      }
    }
    df.select(cols: _*)
  }
}
