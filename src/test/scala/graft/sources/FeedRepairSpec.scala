package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18 (VERDICT r17 next #5): the partitioned-workspace change feed's
  * landing-crash window is REPAIRED — a crash between the data publish and
  * the feed rename leaves a `.pending_<tag>` journal (written inside
  * `publishPartitioned`, after every staged leaf moved in), and the next
  * locked load lands the staged entry EXACTLY ONCE. */
class FeedRepairSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def freshTable(): (String, String, String) = {
    val s = new graft.Session.Scratch
    val cat = "feedrep_" + java.lang.Long.toHexString(
      System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.WorkspaceCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.t SELECT CAST(id AS BIGINT), " +
      "TIMESTAMP '2024-03-01 00:00:00' + make_interval(0,0,0, CAST(id % 3 AS INT)), " +
      "CONCAT('v', id) FROM range(30)")
    (cat, s.dir, s"${s.dir}/t.parquet")
  }

  private def feedCount(dir: String): Long = {
    val declared = StructTypeOf(dir)
    PartitionChangeFeed.read(spark, dir, declared).count()
  }

  private def StructTypeOf(dir: String) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))

  test("crash between publish and feed rename: the next load lands the " +
       "entry exactly once") {
    val (cat, _, dir) = freshTable()
    PartitionChangeFeed.enable(spark, dir)
    // a live statement lands its feed normally (the non-crash baseline)
    spark.sql(s"DELETE FROM $cat.t WHERE id = 1")
    val base = feedCount(dir)
    assert(base == 1, s"baseline feed rows: $base")
    // CRASH STATE: statement published, feed staged + journaled, rename
    // never ran — exactly what a kill between publishPartitioned's return
    // and commitStaged leaves behind
    import spark.implicits._
    val staged = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((2L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "v2"))
          .toDF("id", "ts", "v"), "delete"))
    assert(staged.isDefined)
    PartitionChangeFeed.journalPublished(spark, dir, staged)
    val root = PartitionChangeFeed.feedRoot(dir)
    val f = fsOf(root)
    assert(f.listStatus(root).exists(
      _.getPath.getName.startsWith(".pending_")))
    // next catalog load repairs (repairRetiredPartitionsSafe → locked
    // repair → PartitionChangeFeed.repairPending)
    spark.table(s"$cat.t").count(): Unit
    assert(feedCount(dir) == base + 1, "repair did not land the entry")
    assert(!f.listStatus(root).exists(st =>
      st.getPath.getName.startsWith(".pending_") ||
        st.getPath.getName.startsWith(".staging_")), "repair left debris")
    // EXACTLY once: a second load must not double-land
    spark.table(s"$cat.t").count(): Unit
    assert(feedCount(dir) == base + 1, "repair double-landed the entry")
  }

  test("journal alone (rename landed, journal delete crashed) is dropped " +
       "without fabricating rows; young journal-less staging survives, " +
       "aged debris is cleared") {
    val (cat, _, dir) = freshTable()
    PartitionChangeFeed.enable(spark, dir)
    val root = PartitionChangeFeed.feedRoot(dir)
    val f = fsOf(root)
    // journal alone: its staged dir is gone (the rename DID land before
    // the crash — here the feed root just has no matching staging)
    import spark.implicits._
    val staged = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((3L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "v3"))
          .toDF("id", "ts", "v"), "delete"))
    PartitionChangeFeed.journalPublished(spark, dir, staged)
    // simulate "rename landed": move the staged dir in by hand
    val landed = new Path(root, "c1700000000000_byhand")
    assert(f.rename(staged.get, landed))
    val before = feedCount(dir)
    // a fresh journal-less staging (a LIVE statement's) must survive repair
    val live = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((4L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "v4"))
          .toDF("id", "ts", "v"), "delete"))
    assert(live.isDefined)
    // an AGED journal-less staging (pre-publish crash) must clear
    val old = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((5L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "v5"))
          .toDF("id", "ts", "v"), "delete"))
    f.setTimes(old.get, 1000L, -1)
    spark.table(s"$cat.t").count(): Unit // triggers the locked repair
    assert(feedCount(dir) == before, "a journal alone fabricated feed rows")
    assert(!f.listStatus(root).exists(
      _.getPath.getName.startsWith(".pending_")), "stale journal kept")
    val stagings = f.listStatus(root)
      .filter(_.getPath.getName.startsWith(".staging_")).map(_.getPath)
    assert(stagings.map(_.getName).toSet == Set(live.get.getName),
      s"wrong staging survivors: ${stagings.mkString(", ")}")
    PartitionChangeFeed.abortStaged(spark, live)
  }

  test("a clean abort drops staging AND journal") {
    val (_, _, dir) = freshTable()
    PartitionChangeFeed.enable(spark, dir)
    import spark.implicits._
    val staged = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((9L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "x"))
          .toDF("id", "ts", "v"), "insert"))
    PartitionChangeFeed.journalPublished(spark, dir, staged)
    PartitionChangeFeed.abortStaged(spark, staged)
    val root = PartitionChangeFeed.feedRoot(dir)
    val f = fsOf(root)
    assert(!f.listStatus(root).exists(st =>
      st.getPath.getName.startsWith(".pending_") ||
        st.getPath.getName.startsWith(".staging_")))
    assert(feedCount(dir) == 0)
  }
}
