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
