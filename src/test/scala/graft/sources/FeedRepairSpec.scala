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

  test("a clean PRE-journal abort drops staging; a POST-journal abort " +
       "preserves the entry for repair (ADVICE r18: the statement's data " +
       "IS live once the journal exists — destroying the feed here was " +
       "unrepairable)") {
    val (cat, _, dir) = freshTable()
    PartitionChangeFeed.enable(spark, dir)
    val root = PartitionChangeFeed.feedRoot(dir)
    val f = fsOf(root)
    import spark.implicits._
    // pre-journal abort: statement failed before publishing — scrub
    val failed = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((9L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "x"))
          .toDF("id", "ts", "v"), "insert"))
    PartitionChangeFeed.abortStaged(spark, failed)
    assert(!f.listStatus(root).exists(
      _.getPath.getName.startsWith(".staging_")))
    // post-journal abort (publish landed, post-commit cleanup threw, the
    // caller's catch unwinds): the entry must SURVIVE and land via repair
    val published = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((10L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "y"))
          .toDF("id", "ts", "v"), "insert"))
    PartitionChangeFeed.journalPublished(spark, dir, published)
    PartitionChangeFeed.abortStaged(spark, published)
    assert(f.exists(published.get), "post-journal abort destroyed the feed")
    assert(f.listStatus(root).exists(
      _.getPath.getName.startsWith(".pending_")),
      "post-journal abort destroyed the journal")
    spark.table(s"$cat.t").count(): Unit // locked repair lands it
    assert(feedCount(dir) == 1, "journaled entry was not repaired in")
    spark.table(s"$cat.t").count(): Unit
    assert(feedCount(dir) == 1, "repair double-landed")
  }

  test("crash BETWEEN the last leaf rename and the journal write lands " +
       "the feed entry: the park's _feed marker proves full publication " +
       "(r19 — the window the r18 age-gate lost)") {
    val (cat, ws, dir) = freshTable()
    PartitionChangeFeed.enable(spark, dir)
    val root = PartitionChangeFeed.feedRoot(dir)
    val f = fsOf(root)
    import spark.implicits._
    // the statement's staged feed rows (journal-less — the crash hit
    // before journalPublished ran)
    val staged = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((7L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "v7"))
          .toDF("id", "ts", "v"), "delete"))
    assert(staged.isDefined)
    // the publish's park root at the crash instant: _feed marker + a
    // STALE parked copy whose original exists (every replacement moved
    // in), and a leaf-empty staging dir (every staged leaf renamed out)
    val park = new Path(dir, ".retired_crash1")
    val cowName = s".t.parquet.__cow_crash1"
    f.mkdirs(new Path(ws, cowName)): Unit // leaf-empty staging survives
    val liveLeaf = f.listStatus(new Path(dir)).map(_.getPath)
      .find(_.getName.startsWith("ts_day=")).get
    val parkedLeaf = new Path(park, liveLeaf.getName)
    f.mkdirs(parkedLeaf): Unit
    f.create(new Path(parkedLeaf, "part-stale.parquet"), false).close()
    val mk = f.create(new Path(park, "_feed"), false)
    mk.write(s"${staged.get.getName}\n$cowName".getBytes("UTF-8")); mk.close()
    val before = feedCount(dir)
    spark.table(s"$cat.t").count(): Unit // locked repair adjudicates
    assert(feedCount(dir) == before + 1,
      "publish-proven journal-less entry was not landed")
    assert(!f.exists(park), "park debris survived repair")
    assert(!f.listStatus(root).exists(st =>
      st.getPath.getName.startsWith(".pending_") ||
        st.getPath.getName.startsWith(".staging_")), "repair left debris")
    // exactly once
    spark.table(s"$cat.t").count(): Unit
    assert(feedCount(dir) == before + 1, "repair double-landed the entry")
  }

  test("a crash the park CANNOT prove published (staged leaf data " +
       "remains / a leaf was restored) drops the staged feed " +
       "deterministically — never fabricated, never age-gated") {
    val (cat, ws, dir) = freshTable()
    PartitionChangeFeed.enable(spark, dir)
    val root = PartitionChangeFeed.feedRoot(dir)
    val f = fsOf(root)
    import spark.implicits._
    val staged = PartitionChangeFeed.stage(spark, dir,
      PartitionChangeFeed.tagged(
        Seq((8L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "v8"))
          .toDF("id", "ts", "v"), "delete"))
    assert(staged.isDefined)
    // crash state: staging still holds an unmoved staged leaf → the
    // statement did NOT fully publish
    val park = new Path(dir, ".retired_crash2")
    val cowName = s".t.parquet.__cow_crash2"
    val stagedLeaf = new Path(new Path(ws, cowName), "ts_day=99999")
    f.mkdirs(stagedLeaf): Unit
    f.create(new Path(stagedLeaf, "part-unmoved.parquet"), false).close()
    f.mkdirs(park): Unit
    val mk = f.create(new Path(park, "_feed"), false)
    mk.write(s"${staged.get.getName}\n$cowName".getBytes("UTF-8")); mk.close()
    val before = feedCount(dir)
    spark.table(s"$cat.t").count(): Unit
    assert(feedCount(dir) == before, "an unproven crash fabricated feed rows")
    assert(!f.listStatus(root).exists(
      _.getPath.getName.startsWith(".staging_")),
      "the dead statement's staged feed was age-gated instead of dropped")
    assert(!f.exists(park), "park debris survived repair")
  }
}
