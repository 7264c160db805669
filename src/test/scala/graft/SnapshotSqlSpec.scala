package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sinks

/** Thin merge-on-read versions served through the SQL snapshot catalog
  * (ResolveThinSnapshots + ThinSnapshotTable) and the thin SQL DELETE
  * paths — the r12 verdict's top two next-round items. */
class SnapshotSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Distinct data-file paths in the PLANNED scan set (pre-AQE tree). */
  private def plannedFileSet(sql: String): Seq[String] =
    spark.sql(sql).queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputPartitions).flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString)
      case _ => Nil
    }.distinct

  private def freshCatalog(): (String, String) = {
    val s = new graft.Session.Scratch
    val cat = "snapsql_" + java.lang.Long.toHexString(
      System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    (cat, s.dir)
  }

  private def seed(ws: String, tbl: String): Unit = {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"doc$i", i % 7)).toDF("id", "txt", "grp")
    assert(Sinks.writeSnapshot(df, s"$ws/$tbl") == 1)
  }

  test("thin head: unpinned and pinned SQL reads resolve the chain") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t1")
    import spark.implicits._
    Sinks.deleteSnapshotKeys(spark, s"$ws/t1",
      Seq(1L, 2L, 3L).toDF("id"), Seq("id")): Unit
    // unpinned read resolves the thin head (v=2)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t1").first().getLong(0) == 97)
    // pinned thin read and pinned base read both work
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t1 VERSION AS OF 2")
      .first().getLong(0) == 97)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t1 VERSION AS OF 1")
      .first().getLong(0) == 100)
    // content, not just counts: the deleted keys are gone, others intact
    val ids = spark.sql(s"SELECT id FROM $cat.t1 WHERE id <= 5 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(4L, 5L))
  }

  test("thin head SQL DELETE publishes an O(keys) thin version, fenced") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t2")
    import spark.implicits._
    Sinks.deleteSnapshotKeys(spark, s"$ws/t2",
      Seq(Tuple1(50L)).toDF("id"), Seq("id")): Unit
    // SQL DELETE on the thin head takes SupportsDelete → another thin hop
    spark.sql(s"DELETE FROM $cat.t2 WHERE grp = 3")
    assert(Sinks.snapshotCommitted(spark, s"$ws/t2").contains(3))
    // the published version is THIN: _deletes + _base only, no data files
    val fs = new org.apache.hadoop.fs.Path(ws)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(s"$ws/t2/v=3"))
      .map(_.getPath.getName).toSet
    assert(entries.forall(n => n.startsWith("_") || n.startsWith(".")),
      s"thin version must hold only markers/deltas, got $entries")
    val expect = (1L to 100L).filterNot(_ == 50L).filterNot(_ % 7 == 3)
    val got = spark.sql(s"SELECT id FROM $cat.t2 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }

  test("declared keys: SQL DELETE on a materialized head goes thin") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t3")
    Sinks.declareSnapshotKeys(spark, s"$ws/t3", Seq("id"))
    spark.sql(s"DELETE FROM $cat.t3 WHERE id <= 10")
    assert(Sinks.snapshotCommitted(spark, s"$ws/t3").contains(2))
    assert(Sinks.thinBase(spark, s"$ws/t3", 2).map(_._1).contains(1),
      "declared-keys DELETE must publish a thin version, not a COW rewrite")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t3").first().getLong(0) == 90)
    // and the thin version is byte-thin: no parquet data files
    val fs = new org.apache.hadoop.fs.Path(ws)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$ws/t3/v=2"))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(dataFiles.isEmpty)
  }

  test("declared keys: UPDATE publishes an O(delta) thin version via the delta rewrite") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t7")
    Sinks.declareSnapshotKeys(spark, s"$ws/t7", Seq("id"))
    spark.sql(s"UPDATE $cat.t7 SET txt = 'patched' WHERE grp = 3")
    assert(Sinks.snapshotCommitted(spark, s"$ws/t7").contains(2))
    assert(Sinks.thinBase(spark, s"$ws/t7", 2).map(_._1).contains(1),
      "declared-keys UPDATE must publish a thin version, not a COW rewrite")
    val fs = new org.apache.hadoop.fs.Path(ws)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the delta is O(matched): _deletes + _upserts subfolders, zero
    // root-level data files
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$ws/t7/v=2"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")))
    val up = spark.read.parquet(s"$ws/t7/v=2/_upserts")
    assert(up.count() == 14 && up.columns.toSeq == Seq("id", "txt", "grp"))
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.t7 WHERE txt = 'patched'").first().getLong(0) == 14)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t7").first().getLong(0) == 100)
    // a statement matching NOTHING publishes NO version (replay-safe no-op)
    spark.sql(s"UPDATE $cat.t7 SET txt = 'x' WHERE id < 0")
    assert(Sinks.snapshotCommitted(spark, s"$ws/t7").contains(2),
      "an empty delta must not publish a version")
  }

  test("declared keys: MERGE publishes one thin version (update+insert+delete)") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t8")
    Sinks.declareSnapshotKeys(spark, s"$ws/t8", Seq("id"))
    import spark.implicits._
    // updates ids 1-5, deletes ids 96-100, inserts ids 101-103
    ((1L to 5L) ++ (96L to 103L)).map(i => (i, s"m$i", i % 7))
      .toDF("id", "txt", "grp").createOrReplaceTempView("t8_src")
    spark.sql(
      s"""MERGE INTO $cat.t8 t USING t8_src s ON t.id = s.id
         |WHEN MATCHED AND s.id > 90 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET txt = s.txt
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Sinks.snapshotCommitted(spark, s"$ws/t8").contains(2))
    assert(Sinks.thinBase(spark, s"$ws/t8", 2).isDefined,
      "declared-keys MERGE must publish a thin version")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t8").first().getLong(0) == 98)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t8 WHERE txt LIKE 'm%'")
      .first().getLong(0) == 8) // 5 updates + 3 inserts
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t8 WHERE id > 95 AND id <= 100")
      .first().getLong(0) == 0)
    // an UPDATE that mutates the KEY itself: delete(old) + insert(new)
    spark.sql(s"UPDATE $cat.t8 SET id = 1000 WHERE id = 1")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t8 WHERE id = 1").first().getLong(0) == 0)
    assert(spark.sql(s"SELECT txt FROM $cat.t8 WHERE id = 1000").first().getString(0) == "m1")
    // v1 history stays pinned through it all
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t8 VERSION AS OF 1")
      .first().getLong(0) == 100)
  }

  test("thin head: UPDATE chains another thin hop; reads in joins/subqueries expand") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t4")
    import spark.implicits._
    Sinks.deleteSnapshotKeys(spark, s"$ws/t4",
      Seq(Tuple1(1L)).toDF("id"), Seq("id")): Unit
    // UPDATE on the thin head reads the RESOLVED chain and publishes v=3
    // as a thin delta (row identity = the chain's own marker keys)
    spark.sql(s"UPDATE $cat.t4 SET txt = 'x' WHERE id = 2")
    assert(Sinks.snapshotCommitted(spark, s"$ws/t4").contains(3))
    assert(Sinks.thinBase(spark, s"$ws/t4", 3).map(_._1).contains(2))
    assert(spark.sql(s"SELECT txt FROM $cat.t4 WHERE id = 2")
      .first().getString(0) == "x")
    // thin relation as a JOIN side and inside a subquery both expand
    assert(spark.sql(
      s"""SELECT COUNT(*) FROM $cat.t4 a JOIN $cat.t4 b ON a.id = b.id"""
    ).first().getLong(0) == 99)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.t4 WHERE id IN (SELECT id FROM $cat.t4 WHERE grp = 0)"
    ).first().getLong(0) == 14)
  }

  test("SQL lifecycle: CREATE/CTAS, INSERT appends thin versions, OVERWRITE materializes, DROP") {
    val (cat, ws) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.life (id BIGINT, v STRING)")
    assert(Sinks.snapshotCommitted(spark, s"$ws/life").contains(1))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.life").first().getLong(0) == 0)
    // INSERT INTO = keyless thin APPEND version: O(batch) bytes, base
    // never reopened, pinned history per insert
    spark.sql(s"INSERT INTO $cat.life VALUES (1, 'a'), (2, 'b')")
    assert(Sinks.snapshotCommitted(spark, s"$ws/life").contains(2))
    assert(Sinks.thinBase(spark, s"$ws/life", 2).exists(_._2.isEmpty),
      "INSERT INTO must publish a KEYLESS thin append, not rewrite")
    val fs = new org.apache.hadoop.fs.Path(ws)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$ws/life/v=2"))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")))
    spark.sql(s"INSERT INTO $cat.life VALUES (3, 'c')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.life").first().getLong(0) == 3)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.life VERSION AS OF 2")
      .first().getLong(0) == 2)
    // v=1 (pre-insert) is still exactly empty — the r13 bugfix: the old
    // FileTable fallback wrote INTO the committed folder, mutating history
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.life VERSION AS OF 1")
      .first().getLong(0) == 0)
    // INSERT OVERWRITE = a new MATERIALIZED version, history intact
    spark.sql(s"INSERT OVERWRITE $cat.life VALUES (9, 'z')")
    assert(Sinks.snapshotCommitted(spark, s"$ws/life").contains(4))
    assert(Sinks.thinBase(spark, s"$ws/life", 4).isEmpty)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.life").first().getLong(0) == 1)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.life VERSION AS OF 3")
      .first().getLong(0) == 3)
    // CTAS composes CREATE + append; DROP removes the version store
    spark.sql(s"CREATE TABLE $cat.life2 AS SELECT * FROM $cat.life")
    assert(spark.sql(s"SELECT v FROM $cat.life2").first().getString(0) == "z")
    spark.sql(s"DROP TABLE $cat.life2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ws/life2")))
    intercept[Exception] { spark.table(s"$cat.life2").count() }
  }

  test("manifest-bearing snapshot: SQL scans plan ONLY surviving files") {
    val (cat, ws) = freshCatalog()
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, s"d$i")).toDF("id", "txt")
    // one sorted write task + maxRecordsPerFile=50 → 8 files of 50
    // CONSECUTIVE ids each: file k spans exactly [50k, 50k+49]
    Sinks.writeSnapshotWithManifest(
      df.coalesce(1).sortWithinPartitions("id"), s"$ws/mt", Seq("id"),
      maxRecordsPerFile = 50L): Unit

    def plannedFiles(sql: String): Seq[String] = plannedFileSet(sql)

    // range hits exactly files [100,149] and [150,199]
    val q = s"SELECT id, txt FROM $cat.mt WHERE id BETWEEN 120 AND 170"
    assert(plannedFiles(q).size == 2,
      s"expected 2 surviving files, planned: ${plannedFiles(q)}")
    // results stay EXACT (the predicate re-applies after the skip)
    val got = spark.sql(q).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == (120L to 170L).toSeq)
    // unfiltered scan keeps every file
    assert(plannedFiles(s"SELECT id FROM $cat.mt").size == 8)
    // zero-survivor predicate plans NO files and returns no rows
    val none = s"SELECT id FROM $cat.mt WHERE id > 100000"
    assert(plannedFiles(none).isEmpty)
    assert(spark.sql(none).count() == 0)
    // the pinned path (VERSION AS OF) prunes the same way
    val pinned = s"SELECT id FROM $cat.mt VERSION AS OF 1 WHERE id < 40"
    assert(plannedFiles(pinned).size == 1)
    assert(spark.sql(pinned).count() == 40)
    // row-group pushdown still rides the inner parquet scan
    val physical = spark.sql(q).queryExecution.executedPlan.toString
    assert(raw"PushedFilters: \[[^\]]*id".r.findFirstIn(physical).isDefined,
      physical.take(1200))
    // DML keeps working on a manifest-bearing committed version (the COW
    // scan rides the pruned builder; skipping is provably-empty-only)
    spark.sql(s"UPDATE $cat.mt SET txt = 'u' WHERE id BETWEEN 0 AND 49")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mt").first().getLong(0) == 400)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mt WHERE txt = 'u'")
      .first().getLong(0) == 50)
  }

  test("table_changes TVF: version-range reads off cdf files, guardrails") {
    val (cat, ws) = freshCatalog()
    seed(ws, "tc")
    import spark.implicits._
    val tdir = s"$ws/tc"
    Sinks.declareSnapshotKeys(spark, tdir, Seq("id"))
    Sinks.enableChangeFeed(spark, tdir)
    spark.sql(s"DELETE FROM $cat.tc WHERE id <= 3")                // v2
    Sinks.upsertSnapshotRows(spark, tdir,
      Seq((50L, "DOC50", 1L)).toDF("id", "txt", "grp"), Seq("id")): Unit // v3
    // explicit range: one version's changes only
    val v2 = spark.sql(s"SELECT id, __change FROM table_changes('$cat.tc', 2, 2)")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(v2.toSeq == Seq((1L, "delete"), (2L, "delete"), (3L, "delete")))
    // 2-arg form defaults to the committed head
    assert(spark.sql(s"SELECT COUNT(*) FROM table_changes('$cat.tc', 2)")
      .first().getLong(0) == 4)
    // a directory path works as the first argument too
    assert(spark.sql(s"SELECT COUNT(*) FROM table_changes('$tdir', 3, 3)")
      .first().getLong(0) == 1)
    // materialized version inside the range → guided error
    spark.sql(s"INSERT OVERWRITE $cat.tc VALUES (9, 'z', 0)")      // v4
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$cat.tc', 2, 4)").collect()
    }
    assert(e.getMessage.contains("MATERIALIZED"), e.getMessage)
    // range below the enable point → guided error
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$cat.tc', 1, 2)").collect()
    }
    assert(e2.getMessage.contains("enable point"), e2.getMessage)
  }

  test("manifest skipping prunes on TIMESTAMP and STRING stats, not just numerics") {
    val (cat, ws) = freshCatalog()
    import spark.implicits._
    // 4 files of 25 consecutive hours each + a lang that sorts with ts
    val df = (0L until 100L).map { i =>
      (i, java.sql.Timestamp.valueOf(java.time.LocalDateTime
        .of(2024, 3, 1, 0, 0).plusHours(i.toInt)),
        f"lang${i / 25}%02d")
    }.toDF("id", "ts", "lang")
    Sinks.writeSnapshotWithManifest(
      df.coalesce(1).sortWithinPartitions("id"), s"$ws/tm",
      Seq("ts", "lang"), maxRecordsPerFile = 25L): Unit
    def planned(sql: String): Int = plannedFileSet(sql).size
    // hours 30..40 live ONLY in file 1 (hours 25-49)
    val tsQ = s"SELECT id FROM $cat.tm WHERE " +
      s"ts >= timestamp'2024-03-02 06:00:00' AND ts < timestamp'2024-03-02 17:00:00'"
    assert(planned(tsQ) == 1, s"ts-range should touch one file: ${planned(tsQ)}")
    assert(spark.sql(tsQ).count() == 11)
    // one lang value lives in one file
    val strQ = s"SELECT id FROM $cat.tm WHERE lang = 'lang02'"
    assert(planned(strQ) == 1)
    assert(spark.sql(strQ).count() == 25)
    // midnight boundary prunes exactly (ts < file-2 start keeps files 0-1)
    val edgeQ = s"SELECT id FROM $cat.tm WHERE ts < timestamp'2024-03-03 02:00:00'"
    assert(planned(edgeQ) == 2)
    assert(spark.sql(edgeQ).count() == 50)
  }

  test("manifest continuity: COW DML, INSERT OVERWRITE and compaction carry the manifest") {
    val (cat, ws) = freshCatalog()
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"v$i")).toDF("id", "txt")
    Sinks.writeSnapshotWithManifest(
      df.coalesce(1).sortWithinPartitions("id"), s"$ws/mc", Seq("id"),
      maxRecordsPerFile = 50L): Unit
    def planned(sql: String): Int = plannedFileSet(sql).size
    import graft.sources.ManifestPrune
    // COW UPDATE (whole-table rewrite) → the NEW version has a manifest
    spark.sql(s"UPDATE $cat.mc SET txt = 'u' WHERE id < 10")
    val v2 = Sinks.snapshotCommitted(spark, s"$ws/mc").get
    assert(ManifestPrune.exists(spark, s"$ws/mc", v2),
      "COW DML must carry the manifest to the new version")
    // the rewritten layout differs, but SOME pruning must still apply
    val q = s"SELECT id FROM $cat.mc WHERE id BETWEEN 60 AND 70"
    assert(spark.sql(q).count() == 11)
    // INSERT OVERWRITE with the same schema carries it too
    spark.sql(s"INSERT OVERWRITE $cat.mc " +
      s"SELECT id, txt FROM $cat.mc VERSION AS OF 1 WHERE id < 100")
    val v3 = Sinks.snapshotCommitted(spark, s"$ws/mc").get
    assert(ManifestPrune.exists(spark, s"$ws/mc", v3))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mc").first().getLong(0) == 100)
    // compaction carries it as well
    val v4 = Sinks.compactSnapshot(spark, s"$ws/mc", targetRows = 25L)
    assert(ManifestPrune.exists(spark, s"$ws/mc", v4))
    assert(planned(s"SELECT id FROM $cat.mc WHERE id < 20") <
      planned(s"SELECT id FROM $cat.mc"),
      "the carried manifest must actually skip files on the compacted layout")
    assert(spark.sql(s"SELECT id FROM $cat.mc WHERE id < 20").count() == 20)
    // a schema-changing overwrite that DROPS the stats column commits
    // WITHOUT a manifest (never a broken one) and still serves
    Sinks.writeSnapshotConcurrent(
      df.select(col("txt")), s"$ws/mc"): Unit
    val v5 = Sinks.snapshotCommitted(spark, s"$ws/mc").get
    assert(!ManifestPrune.exists(spark, s"$ws/mc", v5))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mc").first().getLong(0) == 200)
  }

  test("thin SQL read plan: predicate pushdown reaches the base scan, keys ride broadcast") {
    val (cat, ws) = freshCatalog()
    seed(ws, "t5")
    import spark.implicits._
    Sinks.deleteSnapshotKeys(spark, s"$ws/t5",
      Seq(1L, 2L).toDF("id"), Seq("id")): Unit
    val df = spark.sql(s"SELECT id, txt FROM $cat.t5 WHERE grp = 2")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LeftAnti"), physical.take(800))
    assert(physical.contains("Broadcast"),
      "delete-key side must broadcast:\n" + physical.take(800))
    // AQE wraps the tree, so assert on the plan string (FileScan lines
    // carry their PushedFilters inline)
    assert(raw"PushedFilters: \[[^\]]*grp".r.findFirstIn(physical).isDefined,
      "grp predicate must reach the base parquet scan:\n" + physical.take(1200))
  }
}
