package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHANGE DATA FEED for PARTITIONED workspace tables (VERDICT r16 missing
  * #3): a DML statement on the date-sharded production table previously
  * left no consumable change record — an incremental downstream consumer
  * (index refresh, cache invalidation, re-embedding) had to re-diff the
  * table. Opt-in per table; once enabled, every row-level statement lands
  * its change rows into a sibling dot-directory
  * (`.<table>.parquet.__cdf/c<ms>_<tag>/…parquet`), which Spark's own FILE
  * STREAMING SOURCE consumes (`readStream.schema(…).parquet("<root>/c*")`)
  * with exactly-once delivery via the stream's file log.
  *
  * Grain and shape (the Delta CDF trade, stated plainly — the writer pays
  * O(delta) once so every consumer avoids re-diffing 100 TB):
  *
  *  - **translatable DELETE**: the deleted rows, `_change_type='delete'`.
  *  - **COW UPDATE/MERGE/row-level DELETE**: the MINIMAL pre/post multiset
  *    diff of the touched partitions — `exceptAll` both ways, so an UPDATE
  *    appears as one 'delete' (pre-image) + one 'insert' (post-image) per
  *    actually-changed row and carried-over rows cancel. No update_pre/
  *    postimage pairing is claimed: the COW write has no row identity to
  *    pair on (that is the snapshot catalog's keyed-CDF contract).
  *  - **INSERT INTO**: the appended rows, `_change_type='insert'`.
  *  - **INSERT OVERWRITE**: a rewrite has NO change grain — the statement
  *    lands a `_rewrite_<ms>` DISCONTINUITY marker (underscore-prefixed,
  *    invisible to the file source) instead of fabricating a table-sized
  *    feed; [[discontinuities]] lets a consumer detect it and re-sync.
  *  - compaction / respec / manifest enable: no logical change, no feed.
  *
  * Atomicity & crash contract: change rows are STAGED (a dot-prefixed
  * sibling inside the feed root) while the statement's pre-image is still
  * live, and renamed in — one directory rename, all-or-nothing — strictly
  * AFTER the data publish succeeds. A crash between the publish and the
  * feed rename loses that statement's feed entry (the snapshot CDF's
  * documented landing-crash window; here there is no `_deletes` artifact
  * to re-derive from, so the loss is permanent — consumers needing
  * airtight delivery should route through the snapshot catalog's keyed
  * feed). A failed statement never lands feed rows: staging is dropped on
  * every abort path. Feed landing is NON-FATAL post-publish — the
  * statement's own result is already live, so a feed filesystem error is
  * logged, never rethrown into a statement Spark already applied. */
object PartitionChangeFeed {

  val ChangeCol = "_change_type"

  def feedRoot(dir: String): Path = {
    val real = new Path(dir)
    new Path(real.getParent, s".${real.getName}.__cdf")
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Opt the table in. Idempotent. */
  def enable(spark: SparkSession, dir: String): Unit = {
    val root = feedRoot(dir)
    val fs = fsOf(spark, root)
    fs.mkdirs(root): Unit
    val marker = new Path(root, "_enabled")
    if (!fs.exists(marker)) fs.create(marker, false).close()
  }

  def enabled(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(feedRoot(dir), "_enabled")
    fsOf(spark, p).exists(p)
  }

  /** Stage one statement's change rows while its pre-image is still live.
    * Returns None when the frame is empty (a no-op statement feeds
    * nothing). The write is a real Spark job — sized by the statement's
    * delta, never the table. */
  private[sources] def stage(spark: SparkSession, dir: String,
                             rows: DataFrame): Option[Path] = {
    val root = feedRoot(dir)
    val tmp = new Path(root,
      s".staging_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = fsOf(spark, tmp)
    try graft.operators.Sinks.microsBound(rows).write.parquet(tmp.toString)
    catch { case t: Throwable =>
      if (fs.exists(tmp)) fs.delete(tmp, true): Unit
      throw t
    }
    val hasRows = fs.listStatus(tmp).exists(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet") && st.getLen > 0)
    // an all-empty part set still carries footers; cheap row probe instead
    if (hasRows && !spark.read.parquet(tmp.toString).isEmpty) Some(tmp)
    else { fs.delete(tmp, true): Unit; None }
  }

  /** Rename the staged entry in — strictly AFTER the data publish.
    * Non-fatal by design (see class scaladoc). */
  private[sources] def commitStaged(spark: SparkSession, dir: String,
                                    staged: Option[Path]): Unit =
    staged.foreach { tmp =>
      try {
        val dest = new Path(feedRoot(dir),
          s"c${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}")
        if (!fsOf(spark, tmp).rename(tmp, dest))
          throw new IllegalStateException(s"feed rename $tmp -> $dest failed")
      } catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"change-feed landing for $dir failed AFTER the statement " +
              "published; the statement's result is live but its feed entry " +
              "is lost — downstream consumers of this statement must re-sync", e)
      }
    }

  private[sources] def abortStaged(spark: SparkSession,
                                   staged: Option[Path]): Unit =
    staged.foreach { tmp =>
      val fs = fsOf(spark, tmp)
      if (fs.exists(tmp)) fs.delete(tmp, true): Unit
    }

  /** INSERT OVERWRITE discontinuity marker (see class scaladoc). */
  private[sources] def markRewrite(spark: SparkSession, dir: String): Unit = {
    val p = new Path(feedRoot(dir),
      s"_rewrite_${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}")
    try fsOf(spark, p).create(p, false).close()
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Millisecond timestamps of recorded rewrite discontinuities, sorted. */
  def discontinuities(spark: SparkSession, dir: String): Seq[Long] = {
    val root = feedRoot(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_rewrite_"))
      .flatMap(_.stripPrefix("_rewrite_").split('_').headOption)
      .flatMap(_.toLongOption).sorted
  }

  /** The feed's read schema: the table's full declared row plus
    * [[ChangeCol]] — what a `readStream.schema(...)` consumer passes. */
  def feedSchema(spark: SparkSession, dir: String,
                 declared: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType =
    declared.add(ChangeCol, org.apache.spark.sql.types.StringType)

  /** Batch read of every landed change entry. */
  def read(spark: SparkSession, dir: String,
           declared: org.apache.spark.sql.types.StructType): DataFrame = {
    val root = feedRoot(dir)
    val fs = fsOf(spark, root)
    val entries =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("c"))
        .map(_.getPath.toString)
    if (entries.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        feedSchema(spark, dir, declared))
    else spark.read.schema(feedSchema(spark, dir, declared)).parquet(entries: _*)
  }

  /** Tag a change frame. */
  private[sources] def tagged(rows: DataFrame, change: String): DataFrame =
    rows.withColumn(ChangeCol, lit(change))
}
