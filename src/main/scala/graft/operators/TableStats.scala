package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row/null/distinct counts and
  * lexicographic min/max — the statistics pass a pipeline runs over a new
  * drop before deciding how to partition/join it (and the input to CBO-style
  * decisions like broadcast-side election).
  */
object TableStats {

  /** One-pass column profile: for each requested column emit
    * (column_name, n_rows, n_nulls, n_distinct, min_str, max_str).
    *
    * min/max are taken over `CAST(col AS STRING)` — lexicographic, so the
    * values are engine-portable for integer/string columns (cast a double
    * through a fixed-point DECIMAL first; raw double→string formatting is
    * not cross-engine stable).
    *
    * Scale: ONE scan and one aggregation for every column together. The
    * multiple exact COUNT(DISTINCT)s expand the input |cols|× through
    * Spark's Expand operator before the shuffle — the exact-answer cost; at
    * 100 TB swap `countDistinct` for `approx_count_distinct` (HLL partial
    * aggs, no Expand) and keep the same output shape. Each distinct group
    * still partial-aggregates map-side, so the shuffle carries distinct
    * values per column, not rows. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    wide.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))): _*))
        .as("__s"))
      .select(col("__s.column_name").as("column_name"), col("__s.n_rows").as("n_rows"),
        col("__s.n_nulls").as("n_nulls"), col("__s.n_distinct").as("n_distinct"),
        col("__s.min_str").as("min_str"), col("__s.max_str").as("max_str"))
  }

  /** Oracle face of [[profile]]: one UNION ALL arm per column. */
  def profileSql(tableE: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_str, MAX(CAST($c AS VARCHAR)) AS max_str
         |FROM $tableE""".stripMargin
    }.mkString("\nUNION ALL\n")
}
