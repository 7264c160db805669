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
}
