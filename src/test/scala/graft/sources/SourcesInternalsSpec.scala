package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** package-private internals of graft.sources: the tokenized DML lock
  * (ADVICE r15: stale-break/release were check-then-act on the path
  * alone) and the days-partition derivation's bit-exactness contract. */
class SourcesInternalsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def fsOf(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  test("DML lock tokens: a broken-and-retaken lock is never deleted by the old holder") {
    graft.Session.withScratch { s =>
      val dir = s"${s.dir}/t.parquet"
      val h1 = WorkspaceDmlLock.acquire(spark, dir)
      val fs = fsOf(h1.path)
      assert(fs.exists(h1.path))
      // h1's statement stalls past the grace: age its lock out, and a
      // second statement legitimately breaks it and acquires its own
      fs.setTimes(h1.path, 1000L, -1)
      val h2 = WorkspaceDmlLock.acquire(spark, dir)
      assert(h2.token != h1.token)
      assert(fs.exists(h2.path))
      // the stalled holder finally exits and releases: WITHOUT the token
      // check this would delete h2's FRESH lock and let a third statement
      // run concurrently with h2 — the release must no-op instead
      WorkspaceDmlLock.release(spark, h1)
      assert(fs.exists(h2.path), "release deleted a lock it no longer owned")
      // h2's lock is fresh, so a third acquire still fences
      intercept[java.util.ConcurrentModificationException] {
        WorkspaceDmlLock.acquire(spark, dir)
      }
      // the rightful owner's release works
      WorkspaceDmlLock.release(spark, h2)
      assert(!fs.exists(h2.path))
    }
  }

  test("DML lock stale-break: a legacy token-less lock still ages out") {
    graft.Session.withScratch { s =>
      val dir = s"${s.dir}/u.parquet"
      val p = WorkspaceDmlLock.lockPath(dir)
      val fs = fsOf(p)
      // a crashed PRE-TOKEN holder: empty lock file, ancient mtime
      fs.create(p, false).close()
      fs.setTimes(p, 1000L, -1)
      val h = WorkspaceDmlLock.acquire(spark, dir)
      assert(fs.exists(h.path))
      WorkspaceDmlLock.release(spark, h)
      assert(!fs.exists(p))
    }
  }

  test("FooterStats ≡ Spark's own min/max/null-count agg on random mixed-type data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // the fidelity contract q231's hash rides on: footer-read stats must
    // equal what the old scan-side aggregation computed, per file, for
    // every supported kind — longs, ints, strings (incl. non-ASCII,
    // empty, and supplementary-plane characters, where java String order
    // and UTF8 binary order disagree), doubles, dates, timestamps
    // (TIMESTAMP_MICROS in this session), decimals, with nulls sprinkled
    val rnd = new scala.util.Random(151515)
    val strPool = Vector("", "a", "Z~", "é", "ÿ", "😀" /* 😀 */,
      "zz", "Ω", "0", " lead", "trail ")
    graft.Session.withScratch { s =>
      val rows = (1 to 400).map { i =>
        org.apache.spark.sql.Row(
          i.toLong,
          if (rnd.nextInt(10) == 0) null else rnd.nextLong(),
          if (rnd.nextInt(10) == 0) null else Int.box(rnd.nextInt()),
          if (rnd.nextInt(10) == 0) null
          else strPool(rnd.nextInt(strPool.size)) + strPool(rnd.nextInt(strPool.size)),
          if (rnd.nextInt(10) == 0) null else Double.box(rnd.nextGaussian() * 1e6),
          if (rnd.nextInt(10) == 0) null
          else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000) - 5000)),
          if (rnd.nextInt(10) == 0) null
          else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            rnd.nextLong(4102444800L), rnd.nextInt(1000000) * 1000L)),
          if (rnd.nextInt(10) == 0) null
          else new java.math.BigDecimal(java.math.BigInteger.valueOf(
            rnd.nextLong(1000000000000L) - 500000000000L), 4))
      }
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("l", LongType),
        StructField("i", IntegerType), StructField("s", StringType),
        StructField("d", DoubleType), StructField("dt", DateType),
        StructField("ts", TimestampType),
        StructField("dec", DecimalType(16, 4))))
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      val dir = s"${s.dir}/footer_eq"
      df.repartition(7).write.parquet(dir)
      val cols = Seq("l", "i", "s", "d", "dt", "ts", "dec")
      val got = FooterStats.manifestFrame(spark, dir, schema, cols)
        .collect().map(r => r.getString(0).split('/').last -> r).toMap
      val aggs = cols.flatMap(c => Seq(
        min(col(c)).as(s"amin_$c"), max(col(c)).as(s"amax_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"anull_$c")))
      val want = spark.read.parquet(dir)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("arc"), aggs: _*)
        .collect().map(r => r.getString(0).split('/').last -> r).toMap
      assert(got.keySet == want.keySet, s"${got.keySet} vs ${want.keySet}")
      got.keySet.foreach { f =>
        val g = got(f); val w = want(f)
        assert(g.getLong(g.fieldIndex("rowcount")) == w.getLong(w.fieldIndex("arc")),
          s"rowcount of $f")
        cols.foreach { c =>
          def gv(n: String) = g.get(g.fieldIndex(n))
          def wv(n: String) = w.get(w.fieldIndex(n))
          assert(gv(s"min_$c") == wv(s"amin_$c"), s"min_$c of $f")
          assert(gv(s"max_$c") == wv(s"amax_$c"), s"max_$c of $f")
          assert(gv(s"nullcount_$c") == wv(s"anull_$c"), s"nullcount_$c of $f")
        }
      }
    }
  }

  test("dayColumn agrees bit-for-bit with Math.floorDiv over the full Long range") {
    import spark.implicits._
    val d = PartitionedWorkspace.MicrosPerDay
    val rnd = new scala.util.Random(4215)
    val edges = Seq(0L, 1L, -1L, d - 1, d, d + 1, -d, -d + 1, -d - 1,
      Long.MaxValue, Long.MaxValue - 1, Long.MinValue, Long.MinValue + 1,
      Long.MinValue + d - 1,
      // past the 2^53 double mantissa, where `/`-based derivations round
      (1L << 53) * 1024L + 12345L, -((1L << 53) * 1024L) - 12345L)
    val micros = edges ++ Seq.fill(200)(rnd.nextLong())
    val got = micros.toDF("us")
      .select(col("us"),
        PartitionedWorkspace.dayColumn(timestamp_micros(col("us")),
          isDate = false).as("day"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    micros.foreach { us =>
      assert(got(us) == Math.floorDiv(us, d),
        s"us=$us: got ${got(us)}, want ${Math.floorDiv(us, d)}")
    }
  }

  test("r17 hidden levels: Column derivations agree bit-for-bit with the " +
       "writer-side math over randomized + boundary timestamps") {
    import spark.implicits._
    val rnd = new scala.util.Random(4217)
    val span = 9467280000000000L // ±~300 years of micros
    val monthEdges = (-2400L to 2400L by 37L).map(m =>
      PartitionedWorkspace.monthStartDay(m) * PartitionedWorkspace.MicrosPerDay)
    val micros = (Seq.fill(3000)(rnd.nextLong() % span) ++
      monthEdges.flatMap(e => Seq(e - 1, e, e + 1)) ++
      Seq(-1L, 0L, 1L, PartitionedWorkspace.MicrosPerHour - 1,
        PartitionedWorkspace.MicrosPerHour,
        PartitionedWorkspace.MicrosPerDay - 1,
        PartitionedWorkspace.MicrosPerDay)).distinct
    val hl = HoursLevel("ts")
    val ml = MonthsLevel("ts", isDate = false)
    val dl = DaysLevel("ts", isDate = false)
    val got = micros.toDF("us")
      .select(col("us"), timestamp_micros(col("us")).as("ts"))
      .select(col("us"), dl.deriveColumn(col("ts")).as("d"),
        hl.deriveColumn(col("ts")).as("h"), ml.deriveColumn(col("ts")).as("m"))
      .collect()
    assert(got.length == micros.length)
    got.foreach { r =>
      val us = r.getLong(0)
      val day = Math.floorDiv(us, PartitionedWorkspace.MicrosPerDay)
      assert(r.getLong(1) == day, s"days drift at us=$us")
      assert(r.getLong(2) ==
        Math.floorDiv(us, PartitionedWorkspace.MicrosPerHour),
        s"hours drift at us=$us")
      assert(r.getLong(3) == PartitionedWorkspace.epochMonthOfDay(day),
        s"months drift at us=$us: col=${r.getLong(3)} " +
          s"writer=${PartitionedWorkspace.epochMonthOfDay(day)}")
    }
    // bucket: Column pmod ≡ writer ((k % n) + n) % n over random keys
    val bl = BucketLevel("k", 7)
    val keys = Seq.fill(2000)(rnd.nextLong()) ++
      Seq(Long.MinValue, Long.MinValue + 1, -7L, -1L, 0L, 6L, 7L, Long.MaxValue)
    val gotB = keys.distinct.toDF("k")
      .select(col("k"), bl.deriveColumn(col("k")).as("b")).collect()
    gotB.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == ((k % 7) + 7) % 7, s"bucket drift at k=$k")
    }
  }
}
