package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sinks
import graft.sources.PartitionedSnapshot

/** r18: the claim-CAS protocol lifted onto partitioned snapshots
  * (VERDICT r17 next #1), the SQL-native lifecycle (#2-#4), and the
  * ADVICE r17 publish-ordering fixes. */
class PartitionedSnapshotCasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val s = new graft.Session.Scratch
    val cat = "pscas_" + java.lang.Long.toHexString(
      System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    (cat, s.dir)
  }

  private val t0 = java.time.LocalDateTime.of(2024, 7, 1, 0, 0)
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  private val day0 = java.time.LocalDate.of(2024, 7, 1).toEpochDay

  private def seed(dir: String, days: Int = 4, perDay: Int = 10): Unit = {
    import spark.implicits._
    val df = (0L until (days * perDay).toLong).map(i => (i,
        new java.sql.Timestamp(t0 + (i % days) * 86400000L + i * 1000L),
        s"v$i")).toDF("id", "ts", "v")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
  }

  private def row(id: Long, dayOffset: Int, v: String) = {
    import spark.implicits._
    Seq((id, new java.sql.Timestamp(t0 + dayOffset * 86400000L), v))
      .toDF("id", "ts", "v")
  }

  test("concurrent appendRows land as DISTINCT consecutive versions " +
       "(claim-fenced, loser re-stages)") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/race1"
    seed(dir)
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fs = (0 until 2).map { k =>
      scala.concurrent.Future {
        start.await()
        PartitionedSnapshot.appendRows(spark, dir,
          row(1000L + k, 10 + k, s"racer$k"))
      }
    }
    start.countDown()
    val versions = fs.map(f =>
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(
        "120s")))
    pool.shutdown()
    // both publishes landed, on distinct consecutive versions
    assert(versions.toSet == Set(2, 3), versions.toString)
    assert(Sinks.snapshotCommitted(spark, dir).contains(3))
    val head = PartitionedSnapshot.read(spark, dir)
    assert(head.count() == 42)
    assert(head.filter(col("v").startsWith("racer")).count() == 2)
    // no claim debris for committed versions is required; importantly no
    // staging debris survives the race
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(dir)).exists(
      _.getPath.getName.startsWith(".psnap_staging_")), "staging debris")
    // history classifies both as appends with their true bases
    val metas = Seq(2, 3).flatMap(v =>
      PartitionedSnapshot.versionMeta(spark, dir, v))
    assert(metas.map(_._1).toSet == Set("append"), metas.toString)
    assert(metas.map(_._2) == Seq(Some(1), Some(2)), metas.toString)
  }

  test("drop-vs-append interleave serializes: final state equals a serial " +
       "order, versions stay contiguous") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/race2"
    seed(dir)
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fDrop = scala.concurrent.Future {
      start.await()
      PartitionedSnapshot.dropPartitions(spark, dir, Seq(day0.toString))
    }
    val fApp = scala.concurrent.Future {
      start.await()
      PartitionedSnapshot.appendRows(spark, dir, row(2000L, 20, "late"))
    }
    start.countDown()
    val d = java.time.Duration.ofSeconds(120)
    val vDrop = scala.concurrent.Await.result(fDrop,
      scala.concurrent.duration.Duration("120s"))
    val vApp = scala.concurrent.Await.result(fApp,
      scala.concurrent.duration.Duration("120s"))
    pool.shutdown(); val _ = d
    assert(Set(vDrop, vApp) == Set(2, 3), s"$vDrop / $vApp")
    assert(Sinks.snapshotCommitted(spark, dir).contains(3))
    // both serial orders agree on the final content: day0 gone, 'late' in
    val head = PartitionedSnapshot.read(spark, dir)
    assert(head.count() == 31, head.count().toString)
    assert(head.filter(col("v") === "late").count() == 1)
    assert(head.filter(col("ts") < lit("2024-07-02 00:00:00")
      .cast("timestamp")).count() == 0)
    // pinned history: v=1 still serves everything
    assert(PartitionedSnapshot.read(spark, dir, Some(1)).count() == 40)
  }

  test("writePartitioned refuses converting a dir with FLAT snapshot " +
       "versions; crash-before-publish leaves no routing markers") {
    import spark.implicits._
    val (_, ws) = freshCatalog()
    val dir = s"$ws/conv"
    Sinks.writeSnapshot((1 to 5).map(i => (i.toLong, s"d$i"))
      .toDF("id", "txt"), dir): Unit
    val e = intercept[IllegalArgumentException] {
      PartitionedSnapshot.writePartitioned(
        row(1L, 0, "x"), dir, "days:ts")
    }
    assert(e.getMessage.contains("FLAT snapshot versions"), e.getMessage)
    // the refusal happened BEFORE any write: no _partspec marker landed,
    // and the committed flat version still serves
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!f.exists(new org.apache.hadoop.fs.Path(dir, "_partspec")))
    assert(Sinks.readSnapshot(spark, dir).count() == 5)
  }

  test("drop's carry manifest is staged: it rides the version rename, " +
       "never an in-place create") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/stagedcarry"
    seed(dir)
    PartitionedSnapshot.dropPartitions(spark, dir, Seq(day0.toString)): Unit
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the committed v=2 holds _carry + _op + _pinschema.json and no data
    val v2 = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/v=2"))
      .map(_.getPath.getName).toSet
    assert(v2.contains("_carry") && v2.contains("_op") &&
      v2.contains("_pinschema.json"), v2.toString)
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(dir)).exists(
      _.getPath.getName.startsWith(".psnap_staging_")), "staging debris")
  }

  test("vacuumOrphans ages out crashed psnap staging debris; young " +
       "staging survives") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/vac"
    seed(dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(dir, ".psnap_staging_deadbeef")
    val young = new org.apache.hadoop.fs.Path(dir, ".psnap_staging_f0e1d2c3")
    f.mkdirs(old); f.mkdirs(young)
    f.setTimes(old, 1000L, -1)
    Sinks.vacuumOrphans(spark, dir, graceMs = 3600000L): Unit
    assert(!f.exists(old), "aged staging debris survived vacuum")
    assert(f.exists(young), "young (possibly live) staging was deleted")
    f.delete(young, true): Unit
  }

  test("SQL lifecycle: CREATE TABLE PARTITIONED BY days(ts) + INSERT INTO " +
       "+ snapshot_history with carry-aware footprints") {
    val (cat, ws) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.lh (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts))")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.lh").first().getLong(0) == 0)
    spark.sql(s"INSERT INTO $cat.lh VALUES " +
      "(1, TIMESTAMP '2024-07-01 01:00:00', 'a'), " +
      "(2, TIMESTAMP '2024-07-02 01:00:00', 'b')")
    spark.sql(s"INSERT INTO $cat.lh VALUES " +
      "(3, TIMESTAMP '2024-07-02 02:00:00', 'c')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.lh").first().getLong(0) == 3)
    val dir = s"$ws/lh"
    // day drop through the API; history reads it all back through SQL
    PartitionedSnapshot.dropPartitions(spark, dir, Seq(
      PartitionedSnapshot.partitionValueOf(
        spark, dir, java.sql.Date.valueOf("2024-07-01")))): Unit
    val hist = spark.sql(s"SELECT * FROM snapshot_history('$cat.lh')")
      .orderBy("version")
      .select("version", "kind", "operation", "base_version", "files")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getInt(4))).toSeq
    assert(hist.map(_._2).forall(_ == "partitioned"), hist.toString)
    assert(hist.map(h => (h._1, h._3, h._4)) ==
      Seq((1, "create", -1), (2, "append", 1), (3, "append", 2),
        (4, "drop_partitions", 3)), hist.toString)
    // footprint: the creating version owns no files (empty), appends own
    // their touched days' files, the zero-copy drop owns none
    assert(hist.head._5 == 0 && hist.last._5 == 0, hist.toString)
    assert(hist(1)._5 > 0 && hist(2)._5 > 0, hist.toString)
    // INSERT INTO keeps serving after the drop
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.lh").first().getLong(0) == 2)
  }

  test("table_changes routes to the metadata-driven diff on partitioned " +
       "handles and hash-equals the API result") {
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/tc"
    seed(dir)
    PartitionedSnapshot.dropPartitions(spark, dir, Seq(day0.toString)): Unit
    PartitionedSnapshot.appendRows(spark, dir, row(500L, 2, "new")): Unit
    val viaTvf = spark.sql(s"SELECT * FROM table_changes('$cat.tc', 2, 3)")
      .orderBy("_version", "_change_type", "id")
      .collect().map(_.toSeq).toSeq
    val viaApi = PartitionedSnapshot.changesBetween(spark, dir, 1, 3)
      .orderBy("_version", "_change_type", "id")
      .collect().map(_.toSeq).toSeq
    assert(viaTvf == viaApi)
    assert(viaTvf.nonEmpty)
    // v=1 has no change grain: guided error
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$cat.tc', 1, 3)")
    }
    assert(e.getMessage.contains("no change grain"), e.getMessage)
  }

  test("snapshot_compact on a partitioned handle materializes a fully-" +
       "owned fenced version; the flat compaction APIs refuse") {
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/cpt"
    seed(dir)
    PartitionedSnapshot.dropPartitions(spark, dir, Seq(day0.toString)): Unit
    PartitionedSnapshot.appendRows(spark, dir, row(600L, 1, "x")): Unit
    val before = PartitionedSnapshot.read(spark, dir)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val v = spark.sql(s"SELECT * FROM snapshot_compact('$cat.cpt')")
      .first().getInt(0)
    assert(v == 4)
    // fully owned: zero carries, every partition under v=4
    val parts = PartitionedSnapshot.resolvedPartitions(spark, dir, 4)
    assert(parts.nonEmpty && parts.forall(_._2.startsWith("v=4/")),
      parts.toString)
    assert(PartitionedSnapshot.read(spark, dir)
      .orderBy("id").collect().map(_.toSeq).toSeq == before)
    assert(PartitionedSnapshot.versionMeta(spark, dir, 4)
      .contains(("compact", Some(3))))
    val e = intercept[IllegalArgumentException] {
      Sinks.compactSnapshot(spark, dir, 1000000L)
    }
    assert(e.getMessage.contains("PARTITIONED"), e.getMessage)
  }

  test("bucket-partitioned snapshots serve KEY-GROUPED scans: the " +
       "zero-exchange join survives appendRows (buckets spanning two " +
       "version folders) and a zero-copy bucket drop") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val w = (0L until 200L).map(i => (i, i % 37, s"t$i"))
      .toDF("event_id", "user_id", "v")
    val prof = w.select(col("user_id")).distinct()
      .select(col("user_id"), concat(lit("u"), col("user_id")).as("uname"))
    PartitionedSnapshot.writePartitioned(
      w, s"$ws/bf", "bucket:4:user_id"): Unit
    PartitionedSnapshot.writePartitioned(
      prof, s"$ws/bd", "bucket:4:user_id"): Unit
    PartitionedSnapshot.appendRows(spark, s"$ws/bf",
      Seq((1000L, 3L, "late")).toDF("event_id", "user_id", "v")): Unit
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k,
      if (k.endsWith("Threshold")) "-1" else "true"))
    try {
      def j = spark.sql(s"SELECT f.event_id, p.uname FROM $cat.bf f " +
        s"JOIN $cat.bd p ON f.user_id = p.user_id")
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        j.queryExecution.executedPlan.toString.take(1500))
      assert(j.count() == 201)
      // zero-copy bucket drop: the carry-only version still joins
      // exchange-free (pushPartValues covers the now-missing bucket)
      PartitionedSnapshot.dropPartitions(spark, s"$ws/bf", Seq("1")): Unit
      def j2 = spark.sql(s"SELECT f.event_id, p.uname FROM $cat.bf f " +
        s"JOIN $cat.bd p ON f.user_id = p.user_id")
      assert(!j2.queryExecution.executedPlan.toString.contains("Exchange"),
        j2.queryExecution.executedPlan.toString.take(1500))
      val expected = w.filter(col("user_id") % 4 =!= 1).count() + 1
      assert(j2.count() == expected)
      // delta-append CHAIN depth (r19): two more appends leave bucket 3
      // spanning FOUR version folders — the key-grouped scan reports one
      // key across all its splits and the join still plans no exchange
      PartitionedSnapshot.appendRows(spark, s"$ws/bf",
        Seq((1001L, 7L, "l2")).toDF("event_id", "user_id", "v")): Unit
      PartitionedSnapshot.appendRows(spark, s"$ws/bf",
        Seq((1002L, 7L, "l3")).toDF("event_id", "user_id", "v")): Unit
      assert(PartitionedSnapshot
        .resolvedDirLists(spark, s"$ws/bf", 5).toMap.apply("3").length >= 3)
      def j3 = spark.sql(s"SELECT f.event_id, p.uname FROM $cat.bf f " +
        s"JOIN $cat.bd p ON f.user_id = p.user_id")
      assert(!j3.queryExecution.executedPlan.toString.contains("Exchange"),
        j3.queryExecution.executedPlan.toString.take(1500))
      assert(j3.count() == expected + 2)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("metadata-only ALTER matrix on partitioned snapshots: rename " +
       "resolves old files by field id, widen serves old ints as longs, " +
       "drop + re-ADD never resurrects, pinned history keeps its shape") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/alt"
    val df = (0L until 20L).map(i => (i,
        new java.sql.Timestamp(t0 + (i % 2) * 86400000L + i * 1000L),
        i.toInt, s"d$i")).toDF("id", "ts", "n", "txt")
    PartitionedSnapshot.writePartitioned(df, dir, "days:ts"): Unit
    def v1Files: Map[String, Long] = {
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
        f.listStatus(p).toSeq.flatMap { st =>
          if (st.isDirectory) walk(st.getPath)
          else Seq(st.getPath.toString -> st.getModificationTime)
        }
      walk(new org.apache.hadoop.fs.Path(s"$dir/v=1")).toMap
    }
    val before = v1Files
    // RENAME: old files resolve by id — values preserved under the new name
    spark.sql(s"ALTER TABLE $cat.alt RENAME COLUMN txt TO body")
    assert(spark.sql(s"SELECT body FROM $cat.alt WHERE id = 3")
      .first().getString(0) == "d3")
    // WIDEN int -> bigint: old int files serve as longs
    spark.sql(s"ALTER TABLE $cat.alt ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql(s"SELECT SUM(n) FROM $cat.alt").first().getLong(0) == 190)
    // DROP + re-ADD same name: fresh id, old bytes null-fill
    spark.sql(s"ALTER TABLE $cat.alt DROP COLUMN body")
    assert(!spark.table(s"$cat.alt").columns.contains("body"))
    spark.sql(s"ALTER TABLE $cat.alt ADD COLUMN body STRING")
    assert(spark.sql(s"SELECT body FROM $cat.alt").collect()
      .forall(_.isNullAt(0)), "dropped bytes resurrected under re-ADD")
    // appends after the matrix write the evolved shape; old rows null-fill
    spark.sql(s"INSERT INTO $cat.alt VALUES " +
      "(900, TIMESTAMP '2024-07-01 05:00:00', 7, 'fresh')")
    assert(spark.sql(s"SELECT body FROM $cat.alt WHERE id = 900")
      .first().getString(0) == "fresh")
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.alt WHERE body IS NULL")
      .first().getLong(0) == 20)
    // pinned v=1 keeps its ORIGINAL shape and content
    val v1 = spark.sql(s"SELECT * FROM $cat.alt VERSION AS OF 1")
    assert(v1.columns.toSeq == Seq("id", "ts", "n", "txt"), v1.columns.toSeq)
    assert(v1.filter(col("txt") === "d3").count() == 1)
    // every ALTER was metadata-only: v=1 bytes untouched
    assert(v1Files == before, "ALTER touched version bytes")
    // partition source guardrails
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.alt RENAME COLUMN ts TO t2") }
    assert(e1.getMessage.contains("partition source"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.alt DROP COLUMN ts") }
    assert(e2.getMessage.contains("partition source"), e2.getMessage)
    // the compaction physically sheds the tombstoned column and keeps
    // the served content
    val headBefore = spark.sql(s"SELECT id, n, body FROM $cat.alt")
      .orderBy("id").collect().map(_.toSeq).toSeq
    PartitionedSnapshot.compactTable(spark, dir): Unit
    assert(spark.sql(s"SELECT id, n, body FROM $cat.alt")
      .orderBy("id").collect().map(_.toSeq).toSeq == headBefore)
  }
}
