package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys.
  *
  * At 100 TB a handful of hot keys (the empty document, a null-ish user id, a
  * default label) can pin a whole stage on one task. AQE's skew-join split
  * handles sort-merge joins after the fact; salting handles it BY
  * CONSTRUCTION and also covers aggregations:
  *
  *  - [[saltedJoin]]: replicate the small side `buckets`× (one copy per
  *    salt), scatter the big side uniformly with a deterministic per-row
  *    salt, join on (key, salt). Each hot key fans out over `buckets` tasks.
  *    Cost: small side grows `buckets`× — keep buckets ≤ ~32 and the small
  *    side broadcast-size.
  *  - [[saltedAgg]]: two-phase aggregation — partial agg on (key, salt),
  *    final agg on key. Works for any commutative-reassociative aggregate
  *    (sum/count/min/max); the partial shuffle spreads hot keys.
  *
  * Salts are deterministic (`pmod(hash(cols), buckets)` or a stable row
  * hash), never `rand()` — retries and AQE re-execution must see the same
  * assignment or results silently duplicate.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets): hash of the given columns
    * (use high-cardinality stable columns; fall back to all columns). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Salted equi-join: big side gets a deterministic salt, small side is
    * replicated across all salt values, join key becomes (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 buckets: Int, joinType: String = "inner",
                 saltSource: Seq[String] = Nil): DataFrame = {
    val saltCols =
      if (saltSource.nonEmpty) saltSource.map(big(_))
      else big.columns.toSeq.map(big(_))
    val b = big.withColumn("__salt", salt(buckets, saltCols: _*))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }

  /** Key-skew diagnosis report: the top-N heaviest values of a prospective
    * join/aggregation key, with each key's share and the cumulative share of
    * the head — the measurement that decides WHETHER to reach for
    * [[saltedJoin]]/[[saltedAgg]]/AQE-skew-join before a 100 TB shuffle
    * (a top key holding >1/tasks of the rows will pin a straggler task).
    *
    * Scale: one partial-aggregated count per key (map-side combine), a
    * bounded top-N via TakeOrderedAndProject (no full sort), and the
    * rank/cumulative window runs over the N surviving rows only — the
    * single-partition window is N-bounded by construction, never
    * corpus-sized. The total is one broadcast row. All counts are exact
    * int64; each share is one IEEE division.
    *
    * Output: (rank, keyCol, cnt, frac, cum_frac), rank 1 = heaviest, ties
    * broken by key ascending. */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt").desc, col(keyCol).asc)
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc).limit(topN)
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__total"))))
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("__cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("frac"),
        (col("__cum").cast("double") / col("__total").cast("double")).as("cum_frac"))
  }

  /** Oracle face of [[keySkewReport]] (same total order, same divisions). */
  def keySkewReportSql(tableE: String, keyE: String, topN: Int): String =
    s"""WITH sk_c AS (SELECT $keyE AS key, COUNT(*) AS cnt FROM $tableE GROUP BY key),
       |sk_t AS (SELECT COUNT(*) AS total FROM $tableE),
       |sk_top AS (SELECT key, cnt FROM sk_c ORDER BY cnt DESC, key LIMIT $topN),
       |sk_w AS (SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT) AS rank,
       |    key, cnt,
       |    SUM(cnt) OVER (ORDER BY cnt DESC, key
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM sk_top)
       |SELECT rank, key, cnt,
       |  (CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) AS frac,
       |  (CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)) AS cum_frac
       |FROM sk_w, sk_t""".stripMargin

  /** Salted two-phase aggregation: `partialAggs` run per (key, salt),
    * `finalAggs` recombine per key. Caller supplies both phases because the
    * recombination depends on the aggregate (sum→sum, count→sum, min→min). */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column],
                saltSource: Seq[String] = Nil): DataFrame = {
    val saltCols =
      if (saltSource.nonEmpty) saltSource.map(col)
      else df.columns.toSeq.map(col)
    df.withColumn("__salt", salt(buckets, saltCols: _*))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
