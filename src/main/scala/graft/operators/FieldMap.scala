package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StringType}

/** Projection / rename / varchar-length descriptor — the reference's
  * `get_field_map` (`/root/reference/smartpy_arc/arc_utils.py:387-420`).
  *
  * A field map is an ordered list of (source, output, optional varchar
  * length). The reference can take a plain list (keep, no rename) or a dict
  * (rename); varchar lengths ride along so the sink can re-create
  * `String(n)` columns (`arc_utils.py:59-63,414-415`). Spark keeps the
  * length in `StructField.metadata` under key "varchar_len".
  */
final case class FieldSpec(src: String, out: String, varcharLen: Option[Int] = None)

object FieldMap {
  val VarcharLenKey = "varchar_len"

  def keep(names: Seq[String]): Seq[FieldSpec] = names.map(n => FieldSpec(n, n))
  def rename(pairs: Seq[(String, String)]): Seq[FieldSpec] =
    pairs.map { case (s, o) => FieldSpec(s, o) }

  /** U1 `CalculateField` (`/root/reference/smartpy_arc/arc_utils.py:382-384,
    * 601-606`): add/overwrite a column from a SQL expression string — the
    * reference's Python/Arcade expression surface maps to Catalyst `expr`,
    * which parses into codegen'd native expressions (never an opaque UDF). */
  def calculateField(df: DataFrame, name: String, expression: String): DataFrame =
    df.withColumn(name, org.apache.spark.sql.functions.expr(expression))

  /** Apply a field map: case-insensitive source resolution, output named by
    * the map, varchar length recorded in column metadata. Pure projection —
    * column pruning reaches the scan. */
  def apply(df: DataFrame, specs: Seq[FieldSpec]): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols: Seq[Column] = specs.map { s =>
      val actual = byLower.getOrElse(s.src.toLowerCase,
        throw new IllegalArgumentException(s"field '${s.src}' not in ${df.columns.mkString(",")}"))
      s.varcharLen match {
        case Some(n) =>
          val md: Metadata = new MetadataBuilder().putLong(VarcharLenKey, n.toLong).build()
          col(actual).cast(StringType).as(s.out, md)
        case None => col(actual).as(s.out)
      }
    }
    df.select(cols: _*)
  }
}
