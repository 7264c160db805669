package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, co-located) tables — the shuffle-elimination
  * lever for repeated large-table joins.
  *
  * A join between two tables bucketed by the same key into the same bucket
  * count needs NO exchange: each task zips bucket i with bucket i. At 100 TB
  * this converts every fact⋈fact join on the bucket key from a full-data
  * shuffle into a local merge — the difference between re-shuffling 100 TB
  * per query and shuffling once at write time. `sortBy` makes each bucket
  * file pre-sorted, so the join is also sort-free.
  *
  * The reference's manual `AddIndex`-before-join
  * (`/root/reference/smartpy_arc/arc_utils.py:931`) is the same instinct —
  * pay an indexing cost once, reuse it per join; bucketing is its
  * distributed form.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table. `path` makes it an
    * external table at that location (scratch-friendly); default goes to the
    * session warehouse. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys (exchange-free when
    * bucket specs line up — assert with `.explain`). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String,
                   joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}
