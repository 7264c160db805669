package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Structured Streaming over the events shape: the SAME plan builders the
  * batch oracle checks (q60/q61) run on a MemoryStream with a watermark. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourly windowed agg over a stream (watermark + tumbling window)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyByTypeStream(events, "1 hour")
      .writeStream.format("memory").queryName("hourly_out").outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("hourly_out").orderBy("window_start", "event_type").collect()
      assert(out.length == 2)
      assert(out(0).getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
      assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
      assert(out(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: emit on close + on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Streams.SessionEvent]
    val q = Streams.sessionizeWithState(events)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // batch 1: two events 10m apart = one open session for user 1
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open, nothing emitted
      // batch 2: event 2h later closes the session inline (same microbatch path)
      mem.addData((1L, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val closed = spark.table("sess_out").collect()
      assert(closed.length == 1)
      assert(closed(0).getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
      assert(closed(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
      assert(closed(0).getAs[Long]("n_events") == 2)
      // batch 3: advance the watermark far past end+gap → timeout path emits
      mem.addData((2L, ts("2024-01-01 18:00:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 18:00:01")))
      q.processAllAvailable()
      val after = spark.table("sess_out").as[Streams.SessionOut].collect()
      assert(after.exists(s => s.user_id == 1L && s.n_events == 1)) // timed-out 12:30 session
    } finally q.stop()
  }

  test("sessionizeWithState on a batch Dataset matches session_window counts") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // touch → same session
      (1L, ts("2024-01-01 11:00:01")), // > gap → new session
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts").as[Streams.SessionEvent]
    // batch mode emits only CLOSED sessions (final open ones stay in "state");
    // user 1's first session closes when the 11:00:01 event arrives
    val out = Streams.sessionizeWithState(batch).collect()
    assert(out.length == 1)
    assert(out(0).user_id == 1L && out(0).n_events == 2 &&
      out(0).session_end == ts("2024-01-01 10:30:00"))
  }

  test("file-source stream over the real events fixture matches the batch q60 plan") {
    val sf = "/root/testdata/sf0.001"
    val batch = Tables.load(spark, sf, "events")
    val expected = Streams.hourlyByType(batch).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // file stream needs a directory: stage the fixture file, then apply the
    // same ts normalization and the same plan builder as the batch path
    Session.withScratch { s =>
      val dir = java.nio.file.Paths.get(s.dir, "events_stream")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("part-0.parquet"))
      val raw = spark.readStream
        .schema(spark.read.parquet(s"$sf/events.parquet").schema)
        .parquet(dir.toString)
        .transform(Tables.normalizeEventTs)
      val q = Streams.hourlyByTypeStream(raw, "10 years")
        .writeStream.format("memory").queryName("file_stream_out")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table("file_stream_out").collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
        assert(got == expected)
      } finally q.stop()
    }
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("event_id", "ts")
    val q = Streams.dedupStream(events, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
                  (2L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 10:03:00")), (3L, ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream join: matches within the time bound, drops outside, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = Streams.streamStreamJoin(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_ts", "what"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      within = "10 minutes", watermark = "10 minutes")
    val q = joined.select("imp_id", "what")
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00"), "in-window"),     // +5m → joins
        (2L, ts("2024-01-01 10:30:00"), "too-late"),      // +30m → outside bound
        (3L, ts("2024-01-01 10:06:00"), "no-impression")) // key never seen
      q.processAllAvailable()
      val out = spark.table("ssj_out").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.toSeq == Seq((1L, "in-window")))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched left rows emit null-padded after the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = Streams.streamStreamJoin(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_ts", "what"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      within = "10 minutes", watermark = "10 minutes", joinType = "left_outer")
    val q = joined.select("imp_id", "what")
      .writeStream.format("memory").queryName("ssj_outer_out").outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      clicks.addData((1L, ts("2024-01-01 10:05:00"), "clicked"))
      q.processAllAvailable()
      // advance BOTH inputs' event time far past the bound so the global
      // watermark closes imp 2's join window, then run follow-up batches
      imps.addData((9L, ts("2024-01-01 12:00:00")))
      clicks.addData((8L, ts("2024-01-01 12:00:00"), "late"))
      q.processAllAvailable()
      imps.addData((10L, ts("2024-01-01 12:30:00")))
      clicks.addData((11L, ts("2024-01-01 12:30:00"), "later"))
      q.processAllAvailable()
      val out = spark.table("ssj_outer_out").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(out.contains((1L, Some("clicked"))))
      assert(out.contains((2L, None))) // unmatched → null-padded once closed
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join: both sides null-pad their unmatched rows on watermark close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = Streams.streamStreamJoin(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_ts", "what"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      within = "10 minutes", watermark = "10 minutes", joinType = "full_outer")
    val q = joined.select("imp_id", "click_id", "what")
      .writeStream.format("memory").queryName("ssj_full_out").outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00"), "clicked"),       // joins imp 1
        (3L, ts("2024-01-01 10:06:00"), "no-impression")) // key never seen
      q.processAllAvailable()
      // advance BOTH inputs' event time far past the bound so the global
      // watermark closes the buffered rows, then run follow-up batches
      imps.addData((9L, ts("2024-01-01 12:00:00")))
      clicks.addData((8L, ts("2024-01-01 12:00:00"), "late"))
      q.processAllAvailable()
      imps.addData((10L, ts("2024-01-01 12:30:00")))
      clicks.addData((11L, ts("2024-01-01 12:30:00"), "later"))
      q.processAllAvailable()
      val out = spark.table("ssj_full_out").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.getString(2)))).toSet
      assert(out.contains((Some(1L), Some(1L), Some("clicked"))))     // matched
      assert(out.contains((Some(2L), None, None)))                    // left-unmatched
      assert(out.contains((None, Some(3L), Some("no-impression"))))   // right-unmatched
    } finally q.stop()
  }

  test("streaming near-dup drop: same-signature docs collapse, distinct texts survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.nearDupDropStream(docs, "text", "ts", k = 8, w = 3, watermark = "10 minutes")
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma delta epsilon zeta", ts("2024-01-01 10:00:00")),
        (2L, "alpha beta gamma delta epsilon zeta", ts("2024-01-01 10:01:00")), // exact dup
        (3L, "one two three four five six seven", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      mem.addData(
        (4L, "alpha beta gamma delta epsilon zeta", ts("2024-01-01 10:03:00")), // dup again
        (5L, "totally different content here now yes", ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val out = spark.table("neardup_out").collect()
      assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 5L))
      // the signature column does not leak into the output
      assert(!spark.table("neardup_out").columns.contains("__sig"))
    } finally q.stop()
  }

  test("transformWithState running counts accumulate across microbatches (RocksDB state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp)]
      val events = mem.toDF().toDF("user_id", "ts").as[Streams.SessionEvent]
      val q = Streams.runningCounts(events).toDF("user_id", "n")
        .writeStream.format("memory").queryName("twc_out").outputMode("update").start()
      try {
        mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
                    (2L, ts("2024-01-01 10:02:00")))
        q.processAllAvailable()
        mem.addData((1L, ts("2024-01-01 10:03:00")))
        q.processAllAvailable()
        val byBatch = spark.table("twc_out").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        // batch 1: user1 → 2, user2 → 1; batch 2: user1 → 3 (state carried)
        assert(byBatch.contains((1L, 2L)) && byBatch.contains((2L, 1L)))
        assert(byBatch.contains((1L, 3L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-static join enriches events with a dimension (broadcast per microbatch)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.load(spark, "/root/testdata/sf0.001", "nation") // static side
    val mem = MemoryStream[(Long, Long)]
    val stream = mem.toDF().toDF("event_id", "nation_key")
    val q = stream.join(dim, col("nation_key") === col("n_nationkey"))
      .select("event_id", "n_name")
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData((1L, 0L), (2L, 3L), (3L, 999L)) // 999 has no match → dropped (inner)
      q.processAllAvailable()
      val out = spark.table("enrich_out").orderBy("event_id").collect()
      assert(out.length == 2 && out(0).getString(1).nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch routes a stream through the batch sink path (Sinks.writeTable)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Session.withScratch { s =>
      val mem = MemoryStream[(Long, Double)]
      val q = mem.toDF().toDF("id", "v").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          graft.operators.Sinks.writeTable(batch, s.dir, s"batch_$batchId")
          ()
        }
        .start()
      try {
        mem.addData((1L, 1.5), (2L, -2.0))
        q.processAllAvailable()
        val back = graft.operators.Sinks.readBack(spark, s.dir, "batch_0")
        assert(back.count() == 2)
        // write-side coercion applied on the streaming path too (int64→int32)
        assert(back.schema("id").dataType.typeName == "integer")
      } finally q.stop()
    }
  }

  test("session window merges on touch, splits strictly after gap (q61 oracle uses >)") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-01-01 10:00:00")), // s1
      (1L, ts("2024-01-01 10:30:00")), // s1 (gap == 30m: sessions touch → merged)
      (1L, ts("2024-01-01 11:00:01")), // s2 (gap > 30m → new session)
      (1L, ts("2024-01-01 11:20:00")), // s2
      (2L, ts("2024-01-01 00:00:00"))  // other user
    ).toDF("user_id", "ts")
    val out = Streams.userSessionStats(batch).orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n_sessions") == 2 && out(0).getAs[Long]("n_events") == 4)
    assert(out(1).getAs[Long]("n_sessions") == 1)
  }

  test("runSnapshotPublish: one atomic version per micro-batch, mid-stream states travelable") {
    import graft.operators.Sinks
    import spark.implicits._
    val s = new graft.Session.Scratch
    val src = s"${s.dir}/src162"
    val table = s"${s.dir}/pub162"
    val chk = s"${s.dir}/chk162"
    // two files → two micro-batches under maxFilesPerTrigger=1
    Seq((1L, "a"), (2L, "a")).toDF("id", "k").write.parquet(s"$src/f1")
    Seq((3L, "b")).toDF("id", "k").write.parquet(s"$src/f2")
    val schema = spark.read.parquet(src + "/*").schema
    val fin = Streams.runSnapshotPublish(spark, table, chk) {
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
        .groupBy(col("k"))
        .agg(org.apache.spark.sql.functions.count(col("id")).as("n"))
    }
    // one contiguous version per micro-batch (Spark may admit an extra
    // empty/terminal batch — the PROTOCOL claim is contiguity + pointer on
    // the newest, not Spark's admission count)
    val vs = Sinks.snapshotVersions(spark, table)
    val committed = Sinks.snapshotCommitted(spark, table).get
    assert(vs.size >= 2 && vs == (1 to vs.max) && committed == vs.max, s"$vs/$committed")
    // final state covers both keys; some earlier version is a genuine
    // mid-stream snapshot with strictly fewer groups
    assert(fin.count() == 2)
    val midCounts = vs.init.map(v => Sinks.readSnapshot(spark, table, Some(v)).count())
    assert(midCounts.exists(_ < 2), midCounts.toString)
    // output-file sizing (r19 optimization): a complete-mode batch is
    // cardinality-bounded, so each published version must land exactly
    // sinkFiles (default 1) parquet files — not one near-empty file per
    // state partition
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    vs.foreach { v =>
      val n = fs.listStatus(new org.apache.hadoop.fs.Path(s"$table/v=$v"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      assert(n == 1, s"v=$v has $n data files, expected 1")
    }
  }

  test("q192 composition: mid-stream pins ≡ immutable versions; rerun-isolated; probe guards in-flight") {
    val sf = "/root/testdata/sf0.001"
    // two invocations must agree exactly (fresh per-invocation table +
    // checkpoint — a rerun appending onto an old table would shift
    // batchIds vs versions and the in-face require() would throw)
    val r1 = SparkEntry.queries("q192_streaming_time_travel")(spark, sf)
      .collect().map(_.toSeq)
    val r2 = SparkEntry.queries("q192_streaming_time_travel")(spark, sf)
      .collect().map(_.toSeq)
    assert(r1.toSeq == r2.toSeq)
    assert(r1.map(_.head.asInstanceOf[Int]).distinct.sorted.toSeq == Seq(1, 2, 3))
    // v-prefixes nest: each version's total n is strictly increasing
    val totals = r1.groupBy(_.head.asInstanceOf[Int]).toSeq.sortBy(_._1)
      .map(_._2.map(_(2).asInstanceOf[Long]).sum)
    assert(totals == totals.sorted && totals.distinct == totals, totals.toString)
    // the probe hook fires before the publish: a probe that throws must
    // fail the stream (no silent swallow of an in-flight-visibility bug)
    val s = new graft.Session.Scratch
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "k").write.parquet(s"${s.dir}/psrc/f1")
    val schema = spark.read.parquet(s"${s.dir}/psrc/f1").schema
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.runSnapshotPublish(spark, s"${s.dir}/ptab", s"${s.dir}/pchk",
        probe = _ => throw new IllegalStateException("probe saw in-flight state")) {
        spark.readStream.schema(schema).parquet(s"${s.dir}/psrc/*")
          .groupBy(col("k")).agg(org.apache.spark.sql.functions.count(col("id")).as("n"))
      }
    }
    assert(boom.getMessage.contains("probe saw in-flight state") ||
      Option(boom.getCause).exists(_.getMessage.contains("probe saw in-flight state")))
    // ...and nothing was published
    assert(graft.operators.Sinks.snapshotCommitted(spark, s"${s.dir}/ptab").isEmpty)
  }

  test("update-mode late-drop across checkpointed restarts: watermark metrics prove the drop") {
    import org.apache.spark.sql.functions._
    val s = spark
    val scratch = new Session.Scratch
    val src = s"${scratch.dir}/wm_src"
    val sink = s"${scratch.dir}/wm_sink"
    val chk = s"${scratch.dir}/wm_chk"
    def mk(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      rows.toDF("event_id", "event_type")
        .withColumn("ts", expr(
          "TIMESTAMP '2026-01-01 00:00:00' + make_interval(0,0,0,0,0, CAST(event_id AS INT), 0)"))
    }
    def run(df: org.apache.spark.sql.DataFrame, name: String) = {
      Streams.landFile(df, src, name)
      val schema = s.read.parquet(src).schema
      Streams.runUpdateTagged(s, sink, chk) {
        s.readStream.schema(schema).parquet(src)
          .withWatermark("ts", "30 minutes")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      }
    }
    // run 1: on-time events in windows 00 and 01
    run(mk(Seq((5L, "a"), (10L, "a"), (70L, "b"))), "b1")
    // run 2 (restart from checkpoint): +6 h advances the watermark past 01
    val (_, p2) = run(mk(Seq((360L, "a"), (370L, "b"))), "b2")
    // run 3 (restart again): replays below the watermark — must be dropped
    val (out3, p3) = run(mk(Seq((6L, "a"), (71L, "b"), (72L, "b"))), "b3")
    // the metric counts rows REACHING the state store, i.e. post-partial-agg
    // groups: (6,a) is one group, (71,b)+(72,b) map-side combine into one —
    // 2 dropped groups carry all 3 late input rows
    val dropped3 = p3.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    assert(dropped3 == 2, s"expected both late groups dropped, got $dropped3")
    // eviction actually happened once the watermark passed the old windows
    val removed = (p2 ++ p3).flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed > 0, "expected watermark-driven state eviction")
    // final state = last emission per key; late rows changed nothing
    import org.apache.spark.sql.expressions.Window
    val wspec = Window.partitionBy("w_start", "event_type").orderBy(col("__batch").desc)
    val fin = out3.withColumn("rn", row_number().over(wspec)).filter(col("rn") === 1)
      .select("w_start", "event_type", "n")
      .orderBy("w_start", "event_type").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(fin.toSeq == Seq(
      ("2026-01-01 00:00:00.0", "a", 2L),
      ("2026-01-01 01:00:00.0", "b", 1L),
      ("2026-01-01 06:00:00.0", "a", 1L),
      ("2026-01-01 06:00:00.0", "b", 1L)), fin.mkString(", "))
  }

  test("sessionStats on a stream (native session_window state) matches the batch face") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // exactly gap → same session (merge at the boundary)
      (1L, ts("2024-01-01 11:00:01")), // > gap → new session
      (2L, ts("2024-01-01 00:00:00")))
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Streams.sessionStats(mem.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sess_out").outputMode("complete").start()
    try {
      // two batches so session state must merge across micro-batches
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val stream = spark.table("sess_out")
        .orderBy("user_id", "session_start").collect()
      val batch = Streams.sessionStats(rows.toDF("user_id", "ts"))
        .orderBy("user_id", "session_start").collect()
      assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
      assert(stream.length == 3) // user 1 × 2 sessions + user 2 × 1
      assert(stream(0).getAs[Long]("n_events") == 2 &&
        stream(0).getAs[Timestamp]("last_ts") == ts("2024-01-01 10:30:00"))
    } finally q.stop()
  }

  test("streaming ANN serving: heap state isolates per query across restarts, equals batch search") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Similarity
    val s = spark
    val scratch = new Session.Scratch
    // tiny deterministic corpus: 20 vectors dim 4, pivots = ids < 4
    val corpus = (0L until 20L).map { i =>
      (i, Array((i % 5 + 1).toFloat, (i % 3).toFloat, (i % 7).toFloat, 1f))
    }.toDF("vec_id", "embedding")
    val pivots = corpus.filter(col("vec_id") < 4)
    val idxPath = s"${scratch.dir}/ann_idx"
    Similarity.ivfWriteIndex(
      Similarity.ivfAssign(corpus, pivots, "embedding", "vec_id", "vec_id"), idxPath)
    val index = Similarity.ivfOpenIndex(s, idxPath)
    val queries = Seq(
      (100L, Array(2f, 1f, 3f, 1f)), (101L, Array(5f, 0f, 6f, 1f)),
      (102L, Array(1f, 2f, 0f, 1f)), (103L, Array(3f, 2f, 5f, 1f))
    ).toDF("vec_id", "embedding")
    val src = s"${scratch.dir}/ann_src"
    val sink = s"${scratch.dir}/ann_sink"
    val chk = s"${scratch.dir}/ann_chk"
    var out: org.apache.spark.sql.DataFrame = null
    var progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil
    for (i <- 1 to 2) {
      Streams.landFile(queries.filter(pmod(col("vec_id"), lit(2)) === i - 1), src, s"b$i")
      val schema = s.read.parquet(src).schema
      val (o, p) = Streams.runUpdateTagged(s, sink, chk) {
        Similarity.ivfStreamSearch(index, pivots,
          s.readStream.schema(schema).parquet(src),
          "embedding", "vec_id", "vec_id", "vec_id", k = 3, nprobe = 2)
      }
      out = o; progress ++= p
    }
    // a real streaming-engine execution with stateful aggregation ran twice
    assert(progress.flatMap(_.stateOperators.toSeq).nonEmpty, "no stateful op in progress")
    // both micro-batches (one per restart) emitted into the sink
    val batches = out.select("__batch").distinct().as[Long].collect().sorted
    assert(batches.toSeq == Seq(0L, 1L), s"expected batch ids 0,1 got ${batches.toSeq}")
    // update mode + per-qid state: each query's heap emitted EXACTLY once —
    // the second run touched only its own keys (state isolation on restart)
    val perQid = out.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(perQid.keySet == Set(100L, 101L, 102L, 103L), perQid.toString)
    assert(perQid.values.forall(_ == 1L), s"re-emitted heaps: $perQid")
    // even qids landed first → batch 0; odd → batch 1
    val qidBatch = out.select("qid", "__batch").as[(Long, Long)].collect().toMap
    assert(qidBatch(100L) == 0L && qidBatch(102L) == 0L &&
      qidBatch(101L) == 1L && qidBatch(103L) == 1L, qidBatch.toString)
    // streaming serving ≡ batch serving, rank for rank, bit for bit
    val streamed = out
      .select(col("qid"), posexplode(col("__tk")))
      .select(col("qid"), col("col.id").as("vec_id"), col("col.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("qid", "rn").collect().map(_.toSeq)
    val batch = Similarity.ivfBatchSearch(index, pivots, queries,
        "embedding", "vec_id", "vec_id", "vec_id", k = 3, nprobe = 2)
      .orderBy("qid", "rn").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("thin-upsert sink: re-delivered data publishes NO version (effective delta empty)") {
    import spark.implicits._
    import graft.operators.Sinks
    val scratch = new Session.Scratch
    val src = s"${scratch.dir}/redeliver_src"
    val chk = s"${scratch.dir}/chk_redeliver"
    val tdir = s"${scratch.dir}/thin_tbl"
    val batch1 = Seq((1L, 10L, "u", 1.0), (2L, 11L, "u", 2.0))
      .toDF("k", "seq", "op", "v")
    Sinks.writeSnapshot(batch1.filter(org.apache.spark.sql.functions.lit(false)), tdir) // empty seed = v1
    Streams.landFile(batch1, src, "b1")
    val schema = spark.read.parquet(src).schema
    def run(): Unit = Streams.runThinUpsertSink(
      spark, chk, tdir, "k", "seq", "seq") {
      spark.readStream.schema(schema).parquet(src)
    }
    run()
    assert(Sinks.snapshotVersions(spark, tdir) == Seq(1, 2))
    // at-least-once delivery: the SAME rows arrive again as a new file —
    // the effective delta is empty, so no version may publish
    Streams.landFile(batch1, src, "b1_redelivered")
    run()
    assert(Sinks.snapshotVersions(spark, tdir) == Seq(1, 2),
      "re-delivered batch published a version")
    // genuinely newer rows still publish
    Streams.landFile(Seq((1L, 12L, "u", 9.0)).toDF("k", "seq", "op", "v"),
      src, "b2")
    run()
    assert(Sinks.snapshotVersions(spark, tdir) == Seq(1, 2, 3))
    val fin = Sinks.readSnapshot(spark, tdir, None).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(fin.toSeq == Seq((1L, 12L, 9.0), (2L, 11L, 2.0)))
    scratch.close()
  }

  test("change data feed: per-commit feed files, incremental file-stream reads, crash repair") {
    import spark.implicits._
    import graft.operators.Sinks
    val scratch = new graft.Session.Scratch
    val tdir = s"${scratch.dir}/cdf_t"
    val chk = s"${scratch.dir}/cdf_chk"
    val out = s"${scratch.dir}/cdf_out"
    val base = (1L to 40L).map(i => (i, s"v$i", i % 5)).toDF("id", "v", "g")
    Sinks.writeSnapshot(base, tdir)
    Sinks.enableChangeFeed(spark, tdir)
    Sinks.deleteSnapshotKeys(spark, tdir,
      Seq(1L, 2L).toDF("id"), Seq("id")): Unit
    Streams.runChangeFeedCollect(spark, chk, tdir, out, run = 1)
    Sinks.upsertSnapshotRows(spark, tdir,
      Seq((3L, "patched", 3L)).toDF("id", "v", "g"), Seq("id")): Unit
    Streams.runChangeFeedCollect(spark, chk, tdir, out, run = 2)
    val feed = spark.read.parquet(out)
    // run 1 saw ONLY v2's deletes; run 2 ONLY v3's upsert (exactly-once
    // discovery across restarts on one checkpoint)
    assert(feed.filter(col("run") === 1).select("__version").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(feed.filter(col("run") === 2).select("__version").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(3))
    // delete rows carry keys with null payload; upsert rows carry the row
    val del = feed.filter(col("__change") === "delete")
      .select("id", "v").collect()
    assert(del.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L) &&
      del.forall(_.isNullAt(1)))
    assert(feed.filter(col("__change") === "upsert").select("v")
      .head().getString(0) == "patched")
    // crash window: feed file lost after commit -> repair re-derives it
    val fs = new org.apache.hadoop.fs.Path(tdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$tdir/cdf/v2.parquet"), false))
    assert(Sinks.repairChangeFeed(spark, tdir) == Seq(2))
    assert(spark.read.parquet(s"$tdir/cdf/v2.parquet").count() == 2)
    // idempotent: nothing left to repair
    assert(Sinks.repairChangeFeed(spark, tdir).isEmpty)
    scratch.close()
  }
}
