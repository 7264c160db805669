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

  // ---- Z-order clustering (multi-dimensional data skipping) ----------------

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Spread the low 16 bits of `c` into the even bit positions of a long
    * (the classic magic-mask Morton spread — Bedi & al.; same sequence as
    * Delta/Iceberg Z-order kernels). Pure bitwise column arithmetic: stays
    * inside whole-stage codegen. */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (Z-order) interleave of two 16-bit cells: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Rows close in BOTH
    * dimensions are close on the z-curve. */
  def zOrder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale a numeric column into the 16-bit cell space [0, 65535] given its
    * (min, max) bounds — the quantization step before the Morton interleave.
    * Degenerate bounds (min == max) map everything to cell 0. */
  def cell16(c: Column, min: Double, max: Double): Column =
    if (max <= min) lit(0L)
    else least(greatest(
      ((c.cast("double") - lit(min)) / lit(max - min) * lit(65535.0)).cast("long"),
      lit(0L)), lit(65535L))

  /** Z-order-clustered parquet write — MULTI-dimensional data skipping.
    *
    * A linear sort gives one column tight per-file min/max ranges and leaves
    * every other column spread across all files; at 100 TB a predicate on the
    * second dimension then scans everything. Clustering by the Morton
    * interleave of two quantized dimensions keeps BOTH columns' per-file
    * (and per-row-group) ranges narrow, so parquet stats prune files for
    * predicates on either column or both — the same layout lever Delta
    * OPTIMIZE ZORDER and Iceberg's z-ordered rewrite pull, here as one
    * `repartitionByRange` + `sortWithinPartitions` plan (one range exchange;
    * sampling picks balanced file boundaries on the z-curve).
    *
    * Bounds for the quantization are one driver-side min/max row (the
    * bounded Compat scalar pattern). Returns the (minA, maxA, minB, maxB)
    * used, so callers can re-derive cells. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int): (Double, Double, Double, Double) = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // Temporal columns quantize by epoch seconds; NTZ reads as session-tz
    // (UTC) instants. The curve only needs a monotonic numeric image.
    def numify(name: String): Column = df.schema(name).dataType match {
      case TimestampNTZType | TimestampType | DateType =>
        col(name).cast(TimestampType).cast("double")
      case _ => col(name).cast("double")
    }
    val (nA, nB) = (numify(colA), numify(colB))
    val Array(r) = df.agg(min(nA), max(nA), min(nB), max(nB)).collect()
    val (loA, hiA, loB, hiB) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val z = zOrder2(cell16(nA, loA, hiA), cell16(nB, loB, hiB))
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(path)
    (loA, hiA, loB, hiB)
  }
}
