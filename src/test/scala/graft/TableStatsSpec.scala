package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TableStats

/** Semantics pinned for the r20 one-pass restructures of the stats
  * operators (q156/q173 oracle faces cover end-to-end values at SF). */
class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fkAudit: orphan/unreferenced counts, nulls are orphans, dups per-row") {
    // child: two rows ref parent 1 (dup FK counted per-row), one row ref 2,
    // one orphan key 99, one NULL key (never matches → orphan).
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    // parent: 1, 2 referenced; 3 unreferenced; NULL parent key matches
    // nothing (not "referenced" by the NULL child).
    val parent = Seq(Some(1L), Some(2L), Some(3L), None).toDF("pk")
    val r = TableStats.fkAudit("rel", child, "fk", parent, "pk").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (5L, 2L, 4L, 2L)) // n_child, n_orphans, n_parent, n_unreferenced
  }

  test("fkAudit: empty sides yield zero counts, not nulls") {
    val child = Seq.empty[Long].toDF("fk")
    val parent = Seq.empty[Long].toDF("pk")
    val r = TableStats.fkAudit("rel", child, "fk", parent, "pk").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (0L, 0L, 0L, 0L))
  }

  test("fkAudit: one scan per side (no anti-join re-derivation)") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L).toDF("pk")
    val plan = TableStats.fkAudit("rel", child, "fk", parent, "pk")
      .queryExecution.optimizedPlan.toString
    // each LocalRelation appears exactly once in the logical plan
    assert(plan.split("LocalRelation").length - 1 == 2, plan)
  }

  test("pearsonMicro: all pair rows come from ONE aggregate; exact values") {
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 4.0), (3.0, 6.0, 3.0),
        (4.0, 8.0, 2.0))
      .toDF("x", "y", "z")
    val pairs = Seq(("x", "y"), ("x", "z"), ("y", "z"))
    val out = TableStats.pearsonMicro(df, pairs, factor = 1000.0)
      .orderBy("col_a", "col_b").collect()
    assert(out.length == 3)
    // y = 2x exactly; z = -x + 6 exactly (after quantization both remain
    // exact multiples) → corr ±1.
    assert(math.abs(out(0).getDouble(3) - 1.0) < 1e-12)  // (x,y)
    assert(math.abs(out(1).getDouble(3) + 1.0) < 1e-12)  // (x,z)
    assert(math.abs(out(2).getDouble(3) + 1.0) < 1e-12)  // (y,z)
    assert(out.forall(_.getLong(2) == 4L))               // n rides each row
    // single-scan shape: the source appears exactly once in the plan
    val plan = TableStats.pearsonMicro(df, pairs, 1000.0)
      .queryExecution.optimizedPlan.toString
    assert(plan.split("LocalRelation").length - 1 == 1, plan)
  }

  test("pearsonMicro: zero-variance column yields NULL corr (den = 0 guard)") {
    val df = Seq((1.0, 7.0), (2.0, 7.0)).toDF("x", "c")
    val out = TableStats.pearsonMicro(df, Seq(("x", "c")), 1000.0).collect()(0)
    assert(out.isNullAt(3))
  }
}
