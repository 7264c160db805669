package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sinks

/** Storage-partitioned joins over bucketed snapshot versions: the scan
  * reports KeyGroupedPartitioning(graft_bucket(n, key)), so a same-layout
  * join plans with ZERO exchange on either side. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withSpjConf[T](body: => T): T = {
    val prev = Seq(
      "spark.sql.sources.v2.bucketing.enabled" ->
        spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed snapshots: co-partitioned join has no exchange, results exact") {
    import spark.implicits._
    val s = new graft.Session.Scratch
    val cat = "spj_" + java.lang.Long.toHexString(System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    val fact = (1L to 5000L).map(i => (i % 97, i, (i % 13).toDouble))
      .toDF("user_id", "event_id", "v")
    val dim = (0L until 97L).map(u => (u, s"user$u")).toDF("user_id", "name")
    assert(Sinks.writeSnapshotBucketed(fact, s"${s.dir}/fact", "user_id", 8) == 1)
    assert(Sinks.writeSnapshotBucketed(dim, s"${s.dir}/dim", "user_id", 8) == 1)
    withSpjConf {
      val j = spark.sql(
        s"""SELECT f.user_id, f.event_id, d.name
           |FROM $cat.fact f JOIN $cat.dim d ON f.user_id = d.user_id""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(800))
      assert(!plan.contains("Exchange"),
        "co-partitioned join must not shuffle either side:\n" + plan.take(1500))
      // exactness: same result as the plain (shuffled) join
      val expect = fact.join(dim, "user_id").count()
      assert(j.count() == expect && expect == 5000L)
    }
    // the same key joined WITHOUT the bucketed layout still shuffles —
    // the no-exchange plan above is the layout's doing, not a conf accident
    withSpjConf {
      Sinks.writeSnapshot(dim, s"${s.dir}/dim_flat"): Unit
      val j2 = spark.sql(
        s"""SELECT f.user_id, d.name
           |FROM $cat.fact f JOIN $cat.dim_flat d ON f.user_id = d.user_id""".stripMargin)
      assert(j2.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(j2.count() == 5000L)
    }
    // resolver + unpinned reads hide the physical __bucket column
    assert(spark.table(s"$cat.fact").columns.toSeq ==
      Seq("user_id", "event_id", "v"))
    assert(Sinks.readSnapshot(spark, s"${s.dir}/fact").columns.toSeq ==
      Seq("user_id", "event_id", "v"))
    s.close()
  }

  test("bucketed × MOR contract: SQL DML refused with guidance, thin hops degrade, rebucket restores") {
    import spark.implicits._
    val s = new graft.Session.Scratch
    val cat = "spjm_" + java.lang.Long.toHexString(System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    val fact = (1L to 2000L).map(i => (i % 41, i)).toDF("user_id", "event_id")
    val dim = (0L until 41L).map(u => (u, s"u$u")).toDF("user_id", "name")
    Sinks.writeSnapshotBucketed(fact, s"${s.dir}/f2", "user_id", 8): Unit
    Sinks.writeSnapshotBucketed(dim, s"${s.dir}/d2", "user_id", 8): Unit
    // SQL DML on the bucketed head: GUIDED refusal, never a silent degrade
    Seq(
      s"DELETE FROM $cat.f2 WHERE user_id = 3",          // translatable
      s"DELETE FROM $cat.f2 WHERE user_id % 2 = 1",      // rewrite path
      s"UPDATE $cat.f2 SET event_id = 0 WHERE user_id = 3").foreach { stmt =>
      val e = intercept[Throwable] { spark.sql(stmt) }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).toSeq
      assert(msgs.exists(m => m.contains("rebucketSnapshot")), s"$stmt → $e")
    }
    assert(spark.table(s"$cat.f2").count() == 2000)
    // programmatic takedown: a thin hop chains on the bucketed base —
    // correct content, layout honestly gone (join shuffles again)
    Sinks.deleteSnapshotKeys(spark, s"${s.dir}/f2",
      (1L to 2000L).filter(_ % 10 == 3).toDF("event_id"), Seq("event_id")): Unit
    withSpjConf {
      val j = spark.sql(s"SELECT f.user_id, d.name FROM $cat.f2 f " +
        s"JOIN $cat.d2 d ON f.user_id = d.user_id")
      assert(j.count() == 1800)
      assert(j.queryExecution.executedPlan.toString.contains("Exchange"),
        "a resolved thin chain is not a key-grouped scan; the join must shuffle")
    }
    // rebucket re-materializes the chain → zero-exchange restored
    Sinks.rebucketSnapshot(spark, s"${s.dir}/f2", "user_id", 8): Unit
    withSpjConf {
      val j = spark.sql(s"SELECT f.user_id, d.name FROM $cat.f2 f " +
        s"JOIN $cat.d2 d ON f.user_id = d.user_id")
      assert(j.count() == 1800)
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "rebucketed head must join with zero exchange:\n" +
          j.queryExecution.executedPlan.toString.take(1500))
    }
    s.close()
  }
}
