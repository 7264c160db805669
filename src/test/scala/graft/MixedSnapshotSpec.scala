package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sinks
import graft.sources.PartitionedSnapshot

/** r18 second pass: MIXED `key:src,days:ts` layouts on PARTITIONED
  * SNAPSHOTS — the production-lake nesting on the versioned store. A
  * `key:` level is identity-VALUED but its source column stays in the
  * data files (cross-version leaf reads cannot re-attach hive values), so
  * every single-level invariant lifts: zero-copy cell drops, O(touched
  * cells) appends/row-deletes, metadata-driven changes, both-level scan
  * pruning, pinned history. */
class MixedSnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val s = new graft.Session.Scratch
    val cat = "mxsnap_" + java.lang.Long.toHexString(
      System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    (cat, s.dir)
  }

  private val t0 = java.time.LocalDateTime.of(2024, 8, 1, 0, 0)
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  private val day0 = java.time.LocalDate.of(2024, 8, 1).toEpochDay

  /** 60 rows: 2 sources × 3 days × 10 rows. */
  private def seed(dir: String): Unit = {
    import spark.implicits._
    val df = (0L until 60L).map(i => (i,
        new java.sql.Timestamp(t0 + (i % 3) * 86400000L + i * 1000L),
        if (i % 2 == 0) "web" else "app", s"v$i"))
      .toDF("id", "ts", "src", "v")
    assert(PartitionedSnapshot.writePartitioned(
      df, dir, "key:src,days:ts") == 1)
  }

  private def files(dir: String, v: Int): Map[String, (Long, Long)] = {
    def walk(d: java.io.File): Seq[(String, (Long, Long))] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f0 =>
        if (f0.isDirectory) walk(f0)
        else if (f0.getName.endsWith(".parquet"))
          Seq(f0.getAbsolutePath -> ((f0.lastModified(), f0.length())))
        else Nil
      }
    walk(new java.io.File(s"$dir/v=$v")).toMap
  }

  test("mixed layout: nested dirs, SQL round trip, BOTH-level pruning, " +
       "zero-copy cell drop, O(touched) append, pinned history") {
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/mx"
    seed(dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // nested dir shape: v=1/src_key=<s>/ts_day=<d>
    val srcs = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/v=1"))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(srcs.toSeq == Seq("src_key=app", "src_key=web"), srcs.toSeq)
    // SQL round trip: src values come from the FILES (not re-attachment)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 60)
    assert(spark.sql(s"SELECT src FROM $cat.mx WHERE id = 7")
      .first().getString(0) == "app")
    // BOTH-level pruning: src + day predicate plans exactly one cell
    def q = spark.sql(s"SELECT id FROM $cat.mx WHERE src = 'web' AND " +
      "ts >= TIMESTAMP '2024-08-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-08-03 00:00:00'")
    assert(q.count() == 10)
    val planned = q.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputPartitions).flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString)
      case _ => Nil
    }
    assert(planned.nonEmpty && planned.forall(p =>
      p.contains("src_key=web") && p.contains(s"ts_day=${day0 + 1}")),
      planned.toString)
    val v1 = files(dir, 1)
    // ZERO-COPY cell drop via the full leaf key
    val key = PartitionedSnapshot.leafKeyOf(spark, dir,
      Seq("web", java.sql.Date.valueOf("2024-08-01")))
    assert(key == s"src_key=web/ts_day=$day0", key)
    assert(PartitionedSnapshot.dropPartitions(spark, dir, Seq(key)) == 2)
    assert(files(dir, 2).isEmpty, "a cell drop wrote data files")
    assert(files(dir, 1) == v1, "a cell drop touched v=1 bytes")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 50)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx VERSION AS OF 1")
      .first().getLong(0) == 60)
    // O(touched cells) append: one (src, day) cell rewrites, others carry
    import spark.implicits._
    assert(PartitionedSnapshot.appendRows(spark, dir,
      Seq((900L, new java.sql.Timestamp(t0 + 3600000L), "app", "new"))
        .toDF("id", "ts", "src", "v")) == 3)
    assert(files(dir, 1) == v1, "append touched carried bytes")
    val parts3 = PartitionedSnapshot.resolvedPartitions(spark, dir, 3).toMap
    assert(parts3(s"src_key=app/ts_day=$day0").startsWith("v=3/"),
      parts3.toString)
    assert(parts3(s"src_key=web/ts_day=${day0 + 1}").startsWith("v=1/"),
      parts3.toString)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 51)
    // row-level delete within one cell
    assert(PartitionedSnapshot.deleteRowsWhere(spark, dir,
      col("src") === "app" && col("v") === "v1") == 4)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 50)
    // metadata-driven changes across the mixed history
    val ch = PartitionedSnapshot.changesBetween(spark, dir, 1, 4)
      .groupBy("_version", "_change_type").count()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(ch == Set((2, "delete", 10L), (3, "insert", 1L),
      (4, "delete", 1L)), ch.toString)
    // expire protects carried-from folders
    val dropped = Sinks.expireSnapshots(spark, dir, keep = 1)
    assert(!dropped.contains(1), s"expire dropped a carried-from folder")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 50)
  }

  test("key values with path metacharacters round-trip: dirs escape, " +
       "carry keys re-resolve, cell drop by leafKeyOf still lands") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/esc"
    val nasty = Seq("a/b", "c=d", "plain", "e f%g")
    // (i/4) % 2 spreads each source across BOTH days (i % 2 would pin
    // every source to one day and the cell drop would take all its rows)
    val df = (0L until 40L).map(i => (i,
        new java.sql.Timestamp(t0 + ((i / 4) % 2) * 86400000L),
        nasty((i % 4).toInt), s"v$i")).toDF("id", "ts", "src", "v")
    PartitionedSnapshot.writePartitioned(df, dir, "key:src,days:ts"): Unit
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.esc").first().getLong(0) == 40)
    // every key re-resolves through the carry round trip: drop one nasty
    // cell, the rest (all carried) keep serving
    val key = PartitionedSnapshot.leafKeyOf(spark, dir,
      Seq("a/b", java.sql.Date.valueOf("2024-08-01")))
    assert(PartitionedSnapshot.dropPartitions(spark, dir, Seq(key)) == 2)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.esc").first().getLong(0) == 35)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.esc WHERE src = 'a/b'")
      .first().getLong(0) == 5, "wrong cell dropped")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.esc WHERE src = 'c=d'")
      .first().getLong(0) == 10)
    // source-value pruning still works through escaped dir names
    def q = spark.sql(s"SELECT id FROM $cat.esc WHERE src = 'e f%g'")
    assert(q.count() == 10)
  }

  test("TIMESTAMP AS OF resolves partitioned-snapshot history through " +
       "the CAS commit records") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/tt"
    seed(dir)
    // UTC timestamp STRINGS: a bare numeric literal in TIMESTAMP AS OF
    // casts as SECONDS since epoch, not micros
    def utc(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val afterV1 = utc(System.currentTimeMillis())
    Thread.sleep(5)
    PartitionedSnapshot.appendRows(spark, dir,
      Seq((900L, new java.sql.Timestamp(t0), "web", "x"))
        .toDF("id", "ts", "src", "v")): Unit
    val afterV2 = utc(System.currentTimeMillis())
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.tt " +
      s"TIMESTAMP AS OF '$afterV1'").first().getLong(0) == 60)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.tt " +
      s"TIMESTAMP AS OF '$afterV2'").first().getLong(0) == 61)
  }

  test("SQL lifecycle on a mixed snapshot: CREATE PARTITIONED BY " +
       "(src, days(ts)) + INSERT INTO; history walks nested footprints; " +
       "source columns are ALTER-immutable") {
    val (cat, ws) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ml (id BIGINT, ts TIMESTAMP, src STRING) " +
      "PARTITIONED BY (src, days(ts))")
    assert(graft.sources.PartitionedSnapshot
      .partSpec(spark, s"$ws/ml").contains("key:src,days:ts"))
    spark.sql(s"INSERT INTO $cat.ml VALUES " +
      "(1, TIMESTAMP '2024-08-01 01:00:00', 'web'), " +
      "(2, TIMESTAMP '2024-08-02 01:00:00', 'app')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ml").first().getLong(0) == 2)
    val hist = spark.sql(s"SELECT version, operation, files " +
        s"FROM snapshot_history('$cat.ml')").orderBy("version")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(hist.map(_._2) == Seq("create", "append"), hist.toString)
    assert(hist(0)._3 == 0 && hist(1)._3 > 0,
      s"nested footprint walk wrong: $hist")
    // both level sources refuse RENAME/DROP
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ml RENAME COLUMN src TO origin") }
    assert(e1.getMessage.contains("partition source"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ml DROP COLUMN ts") }
    assert(e2.getMessage.contains("partition source"), e2.getMessage)
    // a non-source column still evolves
    spark.sql(s"ALTER TABLE $cat.ml ADD COLUMN note STRING")
    assert(spark.sql(s"SELECT note FROM $cat.ml").collect()
      .forall(_.isNullAt(0)))
    // bare identity via the API still refuses toward key:/workspace
    val e3 = intercept[IllegalArgumentException] {
      import spark.implicits._
      PartitionedSnapshot.writePartitioned(
        Seq((1L, "a")).toDF("id", "src"), s"$ws/bad", "src")
    }
    assert(e3.getMessage.contains("key:"), e3.getMessage)
  }
}
