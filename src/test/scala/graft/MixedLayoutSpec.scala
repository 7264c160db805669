package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18 (VERDICT r17 next #7): MIXED `identity(source), days(ts)` layouts on
  * partitioned workspace tables — the standard production-lake nesting.
  * Identity levels hive-nest ABOVE one hidden transform; reads re-attach
  * the identity values via basePath discovery while the synthetic hidden
  * dir stays invisible; both levels prune; DML stays partition-grained. */
class MixedLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val s = new graft.Session.Scratch
    val cat = "mixed_" + java.lang.Long.toHexString(System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.WorkspaceCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    (cat, s.dir)
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputPartitions).flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString)
      case _ => Nil
    }.distinct

  private def seed(cat: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.mx (id BIGINT, ts TIMESTAMP, v STRING, " +
      "src STRING) PARTITIONED BY (src, days(ts))")
    spark.sql(s"INSERT INTO $cat.mx SELECT CAST(id AS BIGINT), " +
      "TIMESTAMP '2024-04-01 00:00:00' + make_interval(0,0,0, CAST(id % 3 AS INT), 0, 0, CAST(id AS INT)), " +
      "CONCAT('v', id), IF(id % 2 = 0, 'web', 'app') FROM range(60)")
  }

  test("mixed layout: directory shape, identity re-attachment, round trip") {
    val (cat, ws) = freshCatalog()
    seed(cat)
    // dirs: src=<v>/ts_day=<epochDay>
    val day0 = java.time.LocalDate.of(2024, 4, 1).toEpochDay
    val f = new org.apache.hadoop.fs.Path(ws)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val srcDirs = f.listStatus(new org.apache.hadoop.fs.Path(s"$ws/mx.parquet"))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(srcDirs.toSeq == Seq("src=app", "src=web"), srcDirs.toSeq)
    val dayDirs = f.listStatus(
      new org.apache.hadoop.fs.Path(s"$ws/mx.parquet/src=web"))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(dayDirs.toSeq == (0 to 2).map(d => s"ts_day=${day0 + d}"),
      dayDirs.toSeq)
    // identity values re-attach on read; full content round-trips
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 60)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx WHERE src = 'web'")
      .first().getLong(0) == 30)
    val r = spark.sql(s"SELECT src, v FROM $cat.mx WHERE id = 7").first()
    assert(r.getString(0) == "app" && r.getString(1) == "v7")
    // the synthetic column never surfaces
    assert(spark.table(s"$cat.mx").columns.toSeq ==
      Seq("id", "ts", "v", "src"))
  }

  test("mixed layout: BOTH levels prune the planned scan") {
    val (cat, _) = freshCatalog()
    seed(cat)
    val day0 = java.time.LocalDate.of(2024, 4, 1).toEpochDay
    def q = spark.sql(s"SELECT id FROM $cat.mx WHERE src = 'web' AND " +
      "ts >= TIMESTAMP '2024-04-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-04-03 00:00:00'")
    assert(q.count() == 10)
    val planned = plannedFiles(q)
    assert(planned.nonEmpty && planned.forall(p =>
        p.contains("src=web") && p.contains(s"ts_day=${day0 + 1}")),
      planned.toString)
    // a source-only predicate still prunes the whole other source
    val p2 = plannedFiles(spark.sql(
      s"SELECT id FROM $cat.mx WHERE src = 'app'"))
    assert(p2.nonEmpty && p2.forall(_.contains("src=app")), p2.toString)
  }

  test("mixed layout: pinned DELETE is partition-grained, UPDATE lands, " +
       "feed diffs only the statement's partitions") {
    val (cat, ws) = freshCatalog()
    seed(cat)
    val dir = s"$ws/mx.parquet"
    graft.sources.PartitionChangeFeed.enable(spark, dir)
    def mtimes: Map[String, Long] = {
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
        f.listStatus(p).toSeq.flatMap { st =>
          if (st.isDirectory && !st.getPath.getName.startsWith(".")) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet"))
            Seq(st.getPath.toString -> st.getModificationTime) else Nil
        }
      walk(new org.apache.hadoop.fs.Path(dir)).toMap
    }
    val before = mtimes
    // delete one (src, day) cell by predicate
    spark.sql(s"DELETE FROM $cat.mx WHERE src = 'web' AND " +
      "ts >= TIMESTAMP '2024-04-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-04-03 00:00:00'")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.mx").first().getLong(0) == 50)
    val after = mtimes
    val day0 = java.time.LocalDate.of(2024, 4, 1).toEpochDay
    val untouched = before.filterNot(_._1.contains(s"src=web/ts_day=${day0 + 1}"))
    assert(untouched.forall { case (p, t) => after.get(p).contains(t) },
      "DELETE touched partitions outside its (src, day) cell")
    // UPDATE through the COW path
    spark.sql(s"UPDATE $cat.mx SET v = 'upd' WHERE id = 8")
    assert(spark.sql(s"SELECT v FROM $cat.mx WHERE id = 8")
      .first().getString(0) == "upd")
    // the feed carries the statement grains (delete rows + update diff)
    val declared = spark.table(s"$cat.mx").schema
    val feed = graft.sources.PartitionChangeFeed.read(spark, dir, declared)
    assert(feed.filter(col("_change_type") === "delete").count() >= 10)
    assert(feed.filter(col("_change_type") === "insert" && col("v") === "upd")
      .count() == 1)
  }

  test("mixed layout: compaction and respec keep content; ALTER guardrails " +
       "hold for both level sources") {
    val (cat, ws) = freshCatalog()
    seed(cat)
    // fragment one leaf with a second insert, then compact
    spark.sql(s"INSERT INTO $cat.mx SELECT CAST(1000 + id AS BIGINT), " +
      "TIMESTAMP '2024-04-01 01:00:00', 'frag', 'web' FROM range(3)")
    val content = spark.sql(s"SELECT * FROM $cat.mx").orderBy("id")
      .collect().map(_.toSeq).toSeq
    val res = graft.sources.PartitionCompaction.compactPartitions(
      spark, ws, "mx", targetRows = 1000000L, minFiles = 2)
    assert(res.nonEmpty, "no leaf compacted")
    assert(spark.sql(s"SELECT * FROM $cat.mx").orderBy("id")
      .collect().map(_.toSeq).toSeq == content)
    // respec mixed -> flat -> mixed round-trips content
    graft.sources.PartitionEvolution.repartition(spark, ws, "mx", "")
    assert(spark.sql(s"SELECT * FROM $cat.mx").orderBy("id")
      .collect().map(_.toSeq).toSeq == content)
    graft.sources.PartitionEvolution.repartition(spark, ws, "mx", "src,days:ts")
    assert(spark.sql(s"SELECT * FROM $cat.mx").orderBy("id")
      .collect().map(_.toSeq).toSeq == content)
    // both partition sources are rename/drop-immutable
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.mx RENAME COLUMN src TO origin") }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.mx DROP COLUMN ts") }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    // composition guardrails: hidden must be last, only one hidden
    val e3 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad1 (a STRING, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts), a)") }
    assert(e3.getMessage.contains("LAST"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad2 (t1 TIMESTAMP, t2 TIMESTAMP) " +
        "PARTITIONED BY (days(t1), days(t2))") }
    assert(e4.getMessage.contains("at most one hidden"), e4.getMessage)
  }
}
