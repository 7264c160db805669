package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver runs over the
  * same parquet tables. Column aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  *
  * Determinism rules every Q follows so the value-hash comparison is exact:
  *  - double SUM/AVG go through an exact DECIMAL accumulator (sum order
  *    independent), then CAST back to DOUBLE;
  *  - every result has a total ORDER BY with a unique tiebreaker;
  *  - null ordering is explicit (NULLS LAST) on nullable sort keys;
  *  - timestamp literals are parsed in the session timezone (UTC).
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
