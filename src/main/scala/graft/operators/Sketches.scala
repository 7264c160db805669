package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Deterministic mergeable sketches.
  *
  * Unlike `approx_count_distinct`/`percentile_approx` (engine-private sketch
  * layouts, oracle-checked only through their error bounds — q64/q85), the
  * count-min sketch here is built from the repo's own md5-derived `hash60`,
  * so Spark and the DuckDB oracle compute THE SAME sketch and every estimate
  * hash-matches exactly.
  */
object Sketches {

  /** Count-min sketch of term frequencies (Cormode & Muthukrishnan 2005):
    * `depth` independent rows of `width` counters; row d counts terms at
    * bucket `hash60(d || ':' || term) % width`.
    *
    * Output: (d, bucket, cnt) — at most depth·width rows REGARDLESS of corpus
    * size; that is the whole point at 100 TB. The explode emits (d, bucket)
    * pairs only (8+4 bytes, never term strings) and the count partial-
    * aggregates map-side, so a heavy hitter collapses to depth rows per task
    * before the shuffle. Sketches from disjoint corpus shards merge by
    * summing counters (the agg IS the merge). */
  def cmsCounts(terms: DataFrame, termCol: String, depth: Int, width: Int): DataFrame =
    terms.select(posexplode(array((0 until depth).map(d =>
        (Fns.hash60(concat(lit(s"$d:"), col(termCol))) % width).cast("int")): _*)))
      .toDF("d", "bucket")
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate lookup: for each row of `terms`, min over the sketch's
    * `depth` counters at the term's buckets — the classic CMS upper-bound
    * estimate (≥ true count always; ≤ true + εN with prob 1−δ for
    * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
    *
    * Scale: the sketch is depth·width rows → broadcast; the lookup is a
    * map-side broadcast join however large the candidate set is. */
  def cmsEstimate(cms: DataFrame, terms: DataFrame, termCol: String,
                  depth: Int, width: Int): DataFrame = {
    val keyed = terms.select(col(termCol), posexplode(array((0 until depth).map(d =>
        (Fns.hash60(concat(lit(s"$d:"), col(termCol))) % width).cast("int")): _*)))
      .toDF(termCol, "d", "bucket")
    keyed.join(broadcast(cms), Seq("d", "bucket"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Oracle face of [[cmsCounts]] + [[cmsEstimate]] over a term CTE:
    * `termsCte` must expose a `term` column; emits (term, cms_est) for every
    * term of `candCte` (term column, deduped). */
  def cmsEstimateSql(termsCte: String, candCte: String, depth: Int, width: Int): String = {
    val bucket = s"(${Fns.hash60Sql(s"CAST(d AS VARCHAR)||':'||term")} % $width)"
    s"""cms_d AS (SELECT unnest(generate_series(0, ${depth - 1})) AS d),
       |cms_pairs AS (SELECT d, $bucket AS bucket FROM ($termsCte), cms_d),
       |cms AS (SELECT d, bucket, COUNT(*) AS cnt FROM cms_pairs GROUP BY 1, 2),
       |cms_keyed AS (SELECT term, d, $bucket AS bucket FROM ($candCte), cms_d),
       |cms_est AS (SELECT k.term, MIN(COALESCE(m.cnt, 0)) AS cms_est
       |  FROM cms_keyed k LEFT JOIN cms m USING (d, bucket) GROUP BY 1)""".stripMargin
  }
}
