package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every declared query at the given SF and
  * prints one JSON line. An untimed warmup first exercises the session —
  * parquet footer reads, shuffle machinery, codegen compiler — so the first
  * timed query measures the query, not JVM startup. Per-query codegen still
  * lands inside each query's own timing (not hidden).
  *
  * Each query is materialized through the NOOP SINK, not `count()`: under a
  * count, Catalyst prunes every column the row count doesn't need — scalar
  * projections (metrics, scores, redacted strings) vanish from the measured
  * plan and the timing understates the query, sometimes by orders of
  * magnitude (q57's interpreted HOF metrics cost minutes at sf0.1 while its
  * `count()` read 0.1 s). The noop sink consumes every column of every row
  * — the same work `Verify`'s parquet write does, minus the I/O. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: one scan per fixture table + one shuffle + one sort.
    Tables.All.foreach(t => Tables.load(spark, sfDir, t).count())
    Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey")).count().orderBy(desc("count")).limit(5).count()
    // Declared Seq order (NOT Map hash order): iteration order is stable
    // across JVMs, so per-query timings see the same cache-warmth context
    // run over run and round-over-round deltas are comparable.
    //
    // Session-aging flush every BLOCK queries (the r13 lesson: seven tail
    // queries measured 1.5-4.9x slow purely from harness state): hundreds
    // of faces localCheckpoint intermediates, and once their references
    // drop those blocks sit PINNED in the BlockManager until a driver GC
    // lets the ContextCleaner reap them — by the tail of a 227-query run
    // the accumulated blocks/broadcasts/shuffles crowd the unified memory
    // region and tail queries pay in evictions. The flush (SQL-cache
    // clear + an explicit GC to trigger the cleaner) runs OUTSIDE any
    // query's timing and restores steady-state conditions per block.
    val Block = 20
    val results = SparkEntry.packs.zipWithIndex.map { case (q, i) =>
      if (i > 0 && i % Block == 0) {
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
        System.gc()
      }
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal rounding keeps the single JSON line short enough to survive
    // the driver's bounded tail capture (full-precision doubles overflowed
    // it). The aggregate fields ride AFTER the per-query map: the driver
    // keeps the LAST ~2k chars of the line, so trailing placement is what
    // makes the total/sf visible when the query map overflows the capture.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","unit":"sec","queries":$qs,"value":${r3(total)},"n_queries":${results.length},"sf":"$sfDir"}""")
    Session.clearScratch() // C5 janitor: sink queries leave scratch dirs
    spark.stop()
  }
}
