package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sinks
import graft.sources.PartitionedSnapshot

/** r19 (VERDICT r18 next #1 + ADVICE r18): O(batch) DELTA appends on the
  * partitioned snapshot store — a micro-batch ingest writes the batch's
  * bytes per commit, never the touched partition's; chains are bounded by
  * the depth collapse; changesBetween stays O(batch) on append steps;
  * deleteRowsWhere discovery is partition-pruned; full rewrites preserve
  * the sidecar's field-id space; empty appends are no-ops. */
class PartitionedSnapshotDeltaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val s = new graft.Session.Scratch
    val cat = "psdelta_" + java.lang.Long.toHexString(
      System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    (cat, s.dir)
  }

  private val t0 = java.time.LocalDateTime.of(2024, 7, 1, 0, 0)
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  private val day0 = java.time.LocalDate.of(2024, 7, 1).toEpochDay

  private def seed(dir: String, days: Int = 2, perDay: Int = 25): Unit = {
    import spark.implicits._
    val df = (0L until (days * perDay).toLong).map(i => (i,
        new java.sql.Timestamp(t0 + (i % days) * 86400000L + i * 1000L),
        s"v$i")).toDF("id", "ts", "v")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
  }

  private def batch(ids: Range, dayOffset: Int) = {
    import spark.implicits._
    ids.map(i => (i.toLong,
        new java.sql.Timestamp(t0 + dayOffset * 86400000L + i * 1000L),
        s"b$i")).toDF("id", "ts", "v")
  }

  /** Rows physically OWNED by one version folder (its delta/rewrite
    * payload) — the per-statement write-amplification probe. */
  private def ownedRows(dir: String, v: Int): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/v=$v")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    def files(q: org.apache.hadoop.fs.Path): Seq[String] =
      f.listStatus(q).toSeq.flatMap { st =>
        if (st.isDirectory) files(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet"))
          Seq(st.getPath.toString) else Nil
      }
    val fl = files(p)
    if (fl.isEmpty) 0L else spark.read.parquet(fl: _*).count()
  }

  test("N consecutive appends to one hot day write O(sum of batches): " +
       "each version owns exactly its batch's rows, the day serves the " +
       "union of its chain, pinned history intact") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/hot"
    seed(dir) // v=1: 50 rows, days 0 and 1
    (1 to 5).foreach { k =>
      assert(PartitionedSnapshot.appendRows(spark, dir,
        batch(1000 * k until 1000 * k + 5, 0)) == 1 + k)
    }
    // THE O(batch) contract (VERDICT r18 #1): every append version owns
    // its 5-row batch — NOT the day's accumulated 25+5k rows (the r18
    // full-rewrite behavior this round retires)
    (2 to 6).foreach(v => assert(ownedRows(dir, v) == 5L,
      s"v=$v owns ${ownedRows(dir, v)} rows — append amplified"))
    // the hot day resolves to its chain: v=1 base + five deltas, in order
    val chain = PartitionedSnapshot.resolvedDirLists(spark, dir, 6)
      .toMap.apply(day0.toString)
    assert(chain.length == 6 && chain.head.startsWith("v=1/") &&
      chain.last.startsWith("v=6/"), chain.toString)
    // the untouched day still rides ONE v=1 dir
    assert(PartitionedSnapshot.resolvedDirLists(spark, dir, 6)
      .toMap.apply((day0 + 1).toString).map(_.take(4)) == Seq("v=1/"))
    // served content: union of the chain
    val head = PartitionedSnapshot.read(spark, dir)
    assert(head.count() == 75)
    assert(head.filter(col("v").startsWith("b")).count() == 25)
    // pinned reads serve each version's own chain state
    assert(PartitionedSnapshot.read(spark, dir, Some(1)).count() == 50)
    assert(PartitionedSnapshot.read(spark, dir, Some(3)).count() == 60)
  }

  test("depth backstop collapses a hot partition's chain: the collapsing " +
       "append owns old ∪ new for the touched day only") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/collapse"
    seed(dir)
    spark.conf.set("graft.snapshot.partitionAppendDepth", "3")
    try {
      assert(PartitionedSnapshot.appendRows(spark, dir,
        batch(100 until 105, 0)) == 2) // chain 1+1 < 3: delta
      assert(ownedRows(dir, 2) == 5L)
      // chain would hit 3: THIS append collapses the day (25+5 old ∪ 5 new)
      assert(PartitionedSnapshot.appendRows(spark, dir,
        batch(200 until 205, 0)) == 3)
      assert(ownedRows(dir, 3) == 35L, "collapse must own old ∪ new")
      val lists = PartitionedSnapshot.resolvedDirLists(spark, dir, 3).toMap
      assert(lists(day0.toString).map(_.take(4)) == Seq("v=3/"),
        lists.toString)
      assert(lists((day0 + 1).toString).map(_.take(4)) == Seq("v=1/"),
        "collapse touched the untouched day")
      assert(PartitionedSnapshot.read(spark, dir).count() == 60)
      assert(PartitionedSnapshot.versionMeta(spark, dir, 3)
        .contains(("append", Some(2))))
    } finally spark.conf.unset("graft.snapshot.partitionAppendDepth")
  }

  test("empty appends are no-ops: the API returns the committed version " +
       "and SQL `INSERT INTO ... WHERE false` publishes nothing (ADVICE r18)") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/noop"
    seed(dir)
    val empty = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("id", "ts", "v")
    assert(PartitionedSnapshot.appendRows(spark, dir, empty) == 1)
    assert(Sinks.snapshotCommitted(spark, dir).contains(1))
    spark.sql(s"INSERT INTO $cat.noop SELECT * FROM $cat.noop WHERE false")
    assert(Sinks.snapshotCommitted(spark, dir).contains(1),
      "an empty SQL INSERT published a carry-only version")
    assert(Sinks.snapshotVersions(spark, dir) == Seq(1))
  }

  test("changesBetween stays O(batch) on delta-append steps (insert-only " +
       "suffix reads), and a depth collapse is change-free") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/chg"
    seed(dir)
    assert(PartitionedSnapshot.appendRows(spark, dir,
      batch(300 until 303, 0)) == 2)
    assert(PartitionedSnapshot.appendRows(spark, dir,
      batch(400 until 404, 1)) == 3)
    // append steps: exactly the batches, tagged insert at their versions
    val ch = PartitionedSnapshot.changesBetween(spark, dir, 1, 3)
      .groupBy("_version", "_change_type").count()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(ch == Set((2, "insert", 3L), (3, "insert", 4L)), ch.toString)
    // a collapse rewrites the chain into one dir with IDENTICAL content:
    // the step diff is empty (the general pre/post multiset diff cancels)
    spark.conf.set("graft.snapshot.partitionAppendDepth", "2")
    try assert(PartitionedSnapshot.appendRows(spark, dir,
      batch(500 until 502, 0)) == 4)
    finally spark.conf.unset("graft.snapshot.partitionAppendDepth")
    val ch4 = PartitionedSnapshot.changesBetween(spark, dir, 3, 4)
      .groupBy("_change_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ch4 == Map("insert" -> 2L), s"collapse leaked carried rows: $ch4")
    // a drop of the chained day deletes the whole union
    assert(PartitionedSnapshot.dropPartitions(spark, dir,
      Seq(day0.toString)) == 5)
    val ch5 = PartitionedSnapshot.changesBetween(spark, dir, 4, 5)
      .groupBy("_change_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ch5 == Map("delete" -> 30L), ch5.toString)
  }

  test("deleteRowsWhere discovery is partition-pruned: a day-pinned " +
       "delete never opens non-candidate dirs (proven by corrupting one)") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/prune"
    import spark.implicits._
    val df = (0L until 40L).map(i => (i,
        new java.sql.Timestamp(t0 + (i % 4) * 86400000L + i * 1000L),
        if ((i / 4) % 2 == 0) "even" else "odd")).toDF("id", "ts", "v")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
    // corrupt day 3's data file in place: any scan of it now throws, so
    // the delete below SUCCEEDING proves its discovery never read it
    val p = new org.apache.hadoop.fs.Path(s"$dir/v=1/ts_day=${day0 + 3}")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val victim = f.listStatus(p).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val out = f.create(victim, true)
    try out.write("not parquet".getBytes("UTF-8")) finally out.close()
    intercept[Throwable] { // corruption is real
      PartitionedSnapshot.read(spark, dir)
        .filter(col("ts") >= lit("2024-07-04 00:00:00").cast("timestamp"))
        .count()
    }
    assert(PartitionedSnapshot.deleteRowsWhere(spark, dir,
      col("v") === "even" &&
        col("ts") >= lit("2024-07-01 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-07-02 00:00:00").cast("timestamp")) == 2)
    // only day 0 rewrote; the corrupt day rode a carry untouched
    val parts = PartitionedSnapshot.resolvedDirLists(spark, dir, 2).toMap
    assert(parts(day0.toString).map(_.take(4)) == Seq("v=2/"))
    assert(parts((day0 + 3).toString).map(_.take(4)) == Seq("v=1/"))
    // day 0 content is right (5 odd survivors of its 10 rows); read the
    // rewritten dir directly — the corrupt day stays unreadable by design
    assert(spark.read.parquet(s"$dir/${parts(day0.toString).head}")
      .count() == 5)
    // an untranslatable-only predicate still works (prunes nothing):
    // day 3 is corrupt, so restrict to a day-pinned conjunct again but
    // via an opaque udf-free expression the translator can't express
    assert(PartitionedSnapshot.deleteRowsWhere(spark, dir,
      (col("id") % 7 === 1) &&
        col("ts") < lit("2024-07-02 00:00:00").cast("timestamp")) == 3)
  }

  test("writePartitioned REWRITE preserves the sidecar id space: " +
       "tombstones carry forward, kept names keep their ids, new names " +
       "allocate above max — and a later ALTER ADD never reuses (ADVICE r18)") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/rw"
    val df = (0L until 10L).map(i => (i,
        new java.sql.Timestamp(t0 + i * 1000L), i.toInt, s"d$i"))
      .toDF("id", "ts", "n", "txt")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
    spark.sql(s"ALTER TABLE $cat.rw DROP COLUMN txt") // tombstone id=4
    // full rewrite with txt gone and a NEW column: ids must come from the
    // sidecar (id/ts/n keep 1/2/3), extra allocates ABOVE the tombstone
    val df2 = (0L until 10L).map(i => (i,
        new java.sql.Timestamp(t0 + i * 1000L), i.toInt * 10, s"x$i"))
      .toDF("id", "ts", "n", "extra")
    assert(PartitionedSnapshot.writePartitioned(df2, dir, "days:ts") == 2)
    val sidecar = PartitionedSnapshot.declaredSchema(spark, dir)
    def idOf(name: String): Long =
      sidecar(name).metadata.getLong("parquet.field.id")
    assert(idOf("id") == 1L && idOf("ts") == 2L && idOf("n") == 3L)
    assert(sidecar.fieldNames.contains("__dropped_4"),
      s"rewrite discarded the tombstone: ${sidecar.fieldNames.toSeq}")
    assert(idOf("extra") == 5L,
      s"new column must allocate above the tombstoned max, got ${idOf("extra")}")
    // re-ADD of the dropped NAME takes a fresh id and null-fills — the
    // rewrite kept the id space, so v=1's txt bytes can never resurrect
    spark.sql(s"ALTER TABLE $cat.rw ADD COLUMN txt STRING")
    assert(PartitionedSnapshot.declaredSchema(spark, dir)("txt")
      .metadata.getLong("parquet.field.id") == 6L,
      "re-ADD reused a dropped id")
    assert(spark.sql(s"SELECT txt FROM $cat.rw").collect()
      .forall(_.isNullAt(0)), "dropped bytes resurrected after rewrite")
    // pinned v=1 still serves its own shape and values
    val v1 = spark.sql(s"SELECT * FROM $cat.rw VERSION AS OF 1")
    assert(v1.columns.toSeq == Seq("id", "ts", "n", "txt"))
    assert(v1.filter(col("txt") === "d3").count() == 1)
    // head serves the rewrite
    assert(spark.sql(s"SELECT SUM(n) FROM $cat.rw").first().getLong(0) == 450)
  }

  test("SQL DELETE on partitioned snapshots routes by provability: a " +
       "whole-day range is the ZERO-COPY drop (no data file written, no " +
       "data row read), a row-level predicate is the pruned rewrite, a " +
       "pinned read refuses (r19)") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/sqldel"
    val df = (0L until 40L).map(i => (i,
        new java.sql.Timestamp(t0 + (i % 4) * 86400000L + i * 1000L),
        s"v$i")).toDF("id", "ts", "v")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def vFiles(v: Int): Seq[String] = {
      def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
        if (!f.exists(p)) Nil
        else f.listStatus(p).toSeq.flatMap { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet"))
            Seq(st.getPath.toString) else Nil
        }
      walk(new org.apache.hadoop.fs.Path(s"$dir/v=$v"))
    }
    // zero-I/O proof for the zero-copy route: corrupt the doomed day's
    // file — the DELETE must still succeed because provably-full-matching
    // partitions are dropped from METADATA alone
    val doomed = new org.apache.hadoop.fs.Path(s"$dir/v=1/ts_day=$day0")
    val victim = f.listStatus(doomed).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val out = f.create(victim, true)
    try out.write("junk".getBytes("UTF-8")) finally out.close()
    spark.sql(s"DELETE FROM $cat.sqldel WHERE " +
      "ts >= TIMESTAMP '2024-07-01 00:00:00' AND " +
      "ts < TIMESTAMP '2024-07-02 00:00:00'")
    assert(Sinks.snapshotCommitted(spark, dir).contains(2))
    assert(vFiles(2).isEmpty, "zero-copy DELETE wrote data files")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.sqldel")
      .first().getLong(0) == 30)
    // row-level predicate → the pruned rewrite (owns the touched day)
    spark.sql(s"DELETE FROM $cat.sqldel WHERE id = 5") // day 1
    assert(Sinks.snapshotCommitted(spark, dir).contains(3))
    assert(vFiles(3).nonEmpty)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.sqldel")
      .first().getLong(0) == 29)
    // no-match DELETE publishes nothing
    spark.sql(s"DELETE FROM $cat.sqldel WHERE " +
      "ts >= TIMESTAMP '2030-01-01 00:00:00'")
    assert(Sinks.snapshotCommitted(spark, dir).contains(3))
    // DELETE without WHERE = truncate: every partition provably matches,
    // one zero-copy version
    spark.sql(s"DELETE FROM $cat.sqldel")
    assert(Sinks.snapshotCommitted(spark, dir).contains(4))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.sqldel")
      .first().getLong(0) == 0)
    assert(vFiles(4).isEmpty, "truncate wrote data files")
    // pinned history still serves (days 2,3 ride uncorrupted v=1 dirs)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.sqldel VERSION AS OF 3 WHERE " +
        "ts >= TIMESTAMP '2024-07-03 00:00:00'").first().getLong(0) == 20)
  }

  test("per-partition file manifests on partitioned snapshots (r19): a " +
       "non-partition predicate prunes FILES inside surviving dirs, the " +
       "ring spans carried dirs and freshly staged deltas, and a missing " +
       "manifest serves its dir whole") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/mf"
    // v is CONSTANT per day — a v-filter cannot dir-prune (v is not a
    // partition source) but must file-prune through the manifests
    val df = (0L until 40L).map { i =>
      val d = (i % 2).toInt
      (i, new java.sql.Timestamp(t0 + d * 86400000L + i * 1000L),
        if (d == 0) "alpha" else "beta")
    }.toDF("id", "ts", "v")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
    assert(PartitionedSnapshot.enableManifests(spark, dir, Seq("v", "id")) == 2)
    // a delta append into day0 stamps its own staged manifest
    assert(PartitionedSnapshot.appendRows(spark, dir,
      Seq((900L, new java.sql.Timestamp(t0 + 3600000L), "alpha"))
        .toDF("id", "ts", "v")) == 2)
    def plannedFiles(q: org.apache.spark.sql.DataFrame): Seq[String] =
      q.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.flatMap(_.inputPartitions).flatMap {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.map(_.filePath.toString)
        case _ => Nil
      }.distinct
    def q(v: String) =
      spark.sql(s"SELECT id FROM $cat.mf WHERE v = '$v'")
    // beta lives only in day1 (a CARRIED v=1 dir at head v=2): every
    // alpha file — base and delta — must be manifest-pruned
    val betaPlanned = plannedFiles(q("beta"))
    assert(betaPlanned.nonEmpty && betaPlanned.forall(
      _.contains(s"ts_day=${day0 + 1}")), betaPlanned.toString)
    assert(q("beta").count() == 20)
    // alpha spans v=1 base + v=2 delta; day1's files prune away
    val alphaPlanned = plannedFiles(q("alpha"))
    assert(alphaPlanned.exists(_.contains("v=1/")) &&
      alphaPlanned.exists(_.contains("v=2/")), alphaPlanned.toString)
    assert(alphaPlanned.forall(_.contains(s"ts_day=$day0")),
      alphaPlanned.toString)
    assert(q("alpha").count() == 21)
    // complete-or-ignored: drop day1's manifest — the dir serves WHOLE
    // (planned again) and results stay exact
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val day1Dir = s"$dir/v=1/ts_day=${day0 + 1}"
    assert(f.delete(new org.apache.hadoop.fs.Path(
      day1Dir, "_manifest.json"), false))
    val alphaPlanned2 = plannedFiles(q("alpha"))
    assert(alphaPlanned2.exists(_.contains(s"ts_day=${day0 + 1}")),
      "manifest-less dir was not served whole")
    assert(q("alpha").count() == 21)
    // a compaction restores the ring: fresh manifests ride the rewrite
    PartitionedSnapshot.compactTable(spark, dir): Unit
    val alphaPlanned3 = plannedFiles(q("alpha"))
    assert(alphaPlanned3.nonEmpty &&
      alphaPlanned3.forall(_.contains(s"ts_day=$day0")),
      alphaPlanned3.toString)
    assert(q("alpha").count() == 21)
  }

  test("pure delta appends write O(1) CARRY METADATA (#base inheritance), " +
       "removal publishes anchor the chain, the checkpoint interval " +
       "materializes, and expire protects every hop incl. a data-less " +
       "drop anchor (r19)") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/inherit"
    seed(dir) // v1: full layout, days 0-1
    def carryText(v: Int): Option[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/v=$v/_carry")
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(org.apache.hadoop.io.IOUtils
          .readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      }
    }
    // a drop first: v2 is a MATERIALIZED anchor that owns NO data dir
    assert(PartitionedSnapshot.dropPartitions(spark, dir,
      Seq((day0 + 1).toString)) == 2)
    assert(carryText(2).exists(t => !t.startsWith("#base") && t.contains("\t")))
    // three delta appends: each carry is ONE tiny inheritance pointer —
    // O(1) metadata regardless of the table's partition count
    (1 to 3).foreach { k =>
      assert(PartitionedSnapshot.appendRows(spark, dir,
        batch(2000 * k until 2000 * k + 4, 0)) == 2 + k)
      assert(carryText(2 + k).contains(s"#base ${1 + k}"),
        s"v=${2 + k}: ${carryText(2 + k)}")
    }
    // resolution walks the chain: head = day0 seed + 12 delta rows
    assert(PartitionedSnapshot.read(spark, dir).count() == 37)
    assert(PartitionedSnapshot.resolvedDirLists(spark, dir, 5)
      .toMap.apply(day0.toString).length == 4)
    // EXPIRE while the head INHERITS: the survivor's hop walk traverses
    // v=4 → v=3 → v=2 (the drop anchor, which owns NO data dir) — every
    // hop and every data folder must survive a keep=1, so nothing drops
    val d1 = Sinks.expireSnapshots(spark, dir, keep = 1)
    assert(d1.isEmpty, s"expire broke a live chain: dropped $d1")
    assert(PartitionedSnapshot.read(spark, dir).count() == 37)
    // the checkpoint interval bounds the hop walk: with interval 2 the
    // next append MATERIALIZES the full list instead of a 3rd hop
    spark.conf.set("graft.snapshot.carryCheckpointInterval", "2")
    try {
      assert(PartitionedSnapshot.appendRows(spark, dir,
        batch(9000 until 9002, 0)) == 6)
      assert(carryText(6).exists(t => !t.startsWith("#base")),
        s"v=6 should have checkpointed: ${carryText(6)}")
    } finally spark.conf.unset("graft.snapshot.carryCheckpointInterval")
    assert(PartitionedSnapshot.read(spark, dir).count() == 39)
    // once checkpointed, the data-less anchor is RECLAIMABLE (the
    // checkpoint cut the chain) while every data folder stays protected
    val d2 = Sinks.expireSnapshots(spark, dir, keep = 1)
    assert(d2 == Seq(2), s"expected exactly the cut anchor to drop: $d2")
    assert(PartitionedSnapshot.read(spark, dir).count() == 39)
    assert(PartitionedSnapshot.resolvedDirLists(spark, dir, 6)
      .toMap.apply(day0.toString).length == 5)
  }

  test("metadata-only ALTER composes with delta chains: a partition's " +
       "chain mixes pre-rename/pre-ADD delta dirs with post-ALTER ones " +
       "and serves by field id; changesBetween spans the ALTER; compact " +
       "collapses the mixed chain (r19)") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/altchain"
    val df = (0L until 20L).map(i => (i,
        new java.sql.Timestamp(t0 + (i % 2) * 86400000L + i * 1000L),
        s"d$i")).toDF("id", "ts", "txt")
    assert(PartitionedSnapshot.writePartitioned(df, dir, "days:ts") == 1)
    // two OLD-shape deltas into day0
    assert(PartitionedSnapshot.appendRows(spark, dir,
      Seq((100L, new java.sql.Timestamp(t0 + 1000L), "old1"))
        .toDF("id", "ts", "txt")) == 2)
    spark.sql(s"ALTER TABLE $cat.altchain RENAME COLUMN txt TO body")
    spark.sql(s"ALTER TABLE $cat.altchain ADD COLUMN score INT")
    // NEW-shape delta into the SAME day's chain
    spark.sql(s"INSERT INTO $cat.altchain VALUES " +
      "(200, TIMESTAMP '2024-07-01 02:00:00', 'new1', 7)")
    val lists = PartitionedSnapshot.resolvedDirLists(spark, dir,
      3).toMap
    assert(lists(day0.toString).length == 3, lists.toString)
    // the union serves by field id: old files' txt bytes under `body`,
    // score null-fills on pre-ALTER dirs
    val head = spark.sql(
      s"SELECT id, body, score FROM $cat.altchain ORDER BY id")
    assert(head.count() == 22)
    assert(head.filter(col("id") === 100L).first().getString(1) == "old1")
    assert(head.filter(col("id") === 3L).first().getString(1) == "d3")
    assert(head.filter(col("id") === 200L).first().getInt(2) == 7)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.altchain " +
      "WHERE score IS NULL").first().getLong(0) == 21)
    // the change diff spans the ALTER boundary (served in the LIVE shape)
    val ch = PartitionedSnapshot.changesBetween(spark, dir, 1, 3)
      .orderBy("_version", "id")
      .select("_version", "_change_type", "id", "body")
      .collect().map(_.toSeq).toSeq
    assert(ch == Seq(Seq(2, "insert", 100L, "old1"),
      Seq(3, "insert", 200L, "new1")), ch.toString)
    // compaction collapses the mixed chain into one dir per day, sheds
    // nothing live, and keeps serving identically
    val before = spark.sql(
      s"SELECT id, body, score FROM $cat.altchain ORDER BY id")
      .collect().map(_.toSeq).toSeq
    PartitionedSnapshot.compactTable(spark, dir): Unit
    assert(PartitionedSnapshot.resolvedDirLists(spark, dir, 4)
      .toMap.forall(_._2.length == 1))
    assert(spark.sql(
      s"SELECT id, body, score FROM $cat.altchain ORDER BY id")
      .collect().map(_.toSeq).toSeq == before)
  }

  test("a pinned read whose inheritance hop has been EXPIRED throws a " +
       "guided error instead of silently serving a partial chain (r19)") {
    val (_, ws) = freshCatalog()
    val dir = s"$ws/exphop"
    seed(dir)
    assert(PartitionedSnapshot.appendRows(spark, dir,
      batch(100 until 103, 0)) == 2) // #base 1
    assert(PartitionedSnapshot.appendRows(spark, dir,
      batch(200 until 203, 0)) == 3) // #base 2
    // simulate an out-of-protocol expiry of the mid-chain hop
    val p = new org.apache.hadoop.fs.Path(s"$dir/v=2")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(f.delete(p, true))
    val e = intercept[IllegalStateException] {
      PartitionedSnapshot.read(spark, dir).count()
    }
    assert(e.getMessage.contains("EXPIRED"), e.getMessage)
  }

  test("snapshot_partitions TVF: one metadata row per partition with " +
       "chain depth / files / footer-exact rows; " +
       "snapshot_enable_manifests is the SQL enable face (r19)") {
    import spark.implicits._
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/tvf"
    seed(dir) // days 0,1 × 25 rows
    assert(PartitionedSnapshot.appendRows(spark, dir,
      batch(700 until 703, 0)) == 2) // day0 chain depth 2
    val stats = spark.sql(s"SELECT * FROM snapshot_partitions('$cat.tvf')")
      .orderBy("partition")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(stats.map(_._1) == Seq(day0.toString, (day0 + 1).toString))
    assert(stats.head._2 == 2 && stats.head._4 == 28L, stats.toString)
    assert(stats(1)._2 == 1 && stats(1)._4 == 25L, stats.toString)
    assert(stats.forall(s => s._3 >= s._2), "files below chain depth")
    // historical version arg: v=1's stats are pre-append (depth 1, 25
    // rows each day)
    val v1Stats = spark.sql(
      s"SELECT * FROM snapshot_partitions('$cat.tvf', 1)")
      .orderBy("partition").collect()
      .map(r => (r.getInt(1), r.getLong(3))).toSeq
    assert(v1Stats == Seq((1, 25L), (1, 25L)), v1Stats.toString)
    // SQL enable face: marker written, dirs of the HEAD indexed (3: two
    // day0 chain links + day1)
    val n = spark.sql(
      s"SELECT * FROM snapshot_enable_manifests('$cat.tvf', 'id,v')")
      .first().getInt(0)
    assert(n == 3, s"dirs indexed: $n")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(f.exists(new org.apache.hadoop.fs.Path(dir, ".stats_cols")))
    // flat stores refuse with guidance
    val flat = s"$ws/flat"
    graft.operators.Sinks.writeSnapshot(
      Seq((1L, "a")).toDF("id", "t"), flat): Unit
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_partitions('$flat')")
    }
    assert(e.getMessage.contains("not a PARTITIONED snapshot"), e.getMessage)
  }

  test("snapshot_compact('t', targetRows) is honored on partitioned " +
       "handles (ADVICE r18): a tiny target splits each partition") {
    val (cat, ws) = freshCatalog()
    val dir = s"$ws/ctr"
    seed(dir, days = 1, perDay = 100)
    val v = spark.sql(s"SELECT * FROM snapshot_compact('$cat.ctr', 10)")
      .first().getInt(0)
    assert(v == 2)
    val p = new org.apache.hadoop.fs.Path(s"$dir/v=2/ts_day=$day0")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = f.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    assert(files >= 10, s"targetRows=10 over 100 rows produced $files files")
    assert(PartitionedSnapshot.read(spark, dir).count() == 100)
  }
}
