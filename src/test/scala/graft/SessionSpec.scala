package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.8 session/catalog ops: scoped workspace swap, scratch lifecycle
  * + janitor, uniqueness-checked view resolution, introspection. */
class SessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("workspace: scoped swap restores on exit (arc_utils.py:93-118)") {
    val ws = new Session.Workspace(sf)
    assert(ws.dir == sf)
    val inner = ws.withWork("/tmp/elsewhere") { ws.dir }
    assert(inner == "/tmp/elsewhere" && ws.dir == sf)
    // restore happens even on exception
    intercept[RuntimeException] { ws.withWork("/tmp/x") { throw new RuntimeException("boom") } }
    assert(ws.dir == sf)
  }

  test("scratch: created, usable, deleted on close; janitor clears leftovers") {
    val leaked = new Session.Scratch
    val kept = Session.withScratch { s =>
      val p = java.nio.file.Paths.get(s.dir, "probe.txt")
      java.nio.file.Files.writeString(p, "x")
      assert(java.nio.file.Files.exists(p))
      s.path
    }
    assert(!java.nio.file.Files.exists(kept)) // auto-deleted on exit
    assert(Session.listScratch().contains(leaked.path))
    assert(Session.clearScratch() >= 1) // janitor removes the leak
    assert(!java.nio.file.Files.exists(leaked.path))
  }

  test("janitor skips scratch dirs owned by a LIVE other process, reclaims dead owners") {
    import java.nio.file.{Files, Paths}
    // foreign + alive (pid 1 always runs in this container) → must survive
    val foreign = new Session.Scratch
    Files.writeString(foreign.path.resolve(".owner_pid"), "1")
    // dead/unknown owner (pid far beyond pid_max) → reclaimable leftovers
    val orphan = new Session.Scratch
    Files.writeString(orphan.path.resolve(".owner_pid"), "999999999")
    Session.clearScratch()
    assert(Files.exists(foreign.path),
      "janitor must not delete a live other process's scratch (it would kill " +
        "that JVM's streaming checkpoints mid-batch)")
    assert(!Files.exists(orphan.path))
    foreign.close() // explicit close still works for the owner
    assert(!Files.exists(foreign.path))
  }

  test("resolveView: unique hit resolves, missing/ambiguous error (pro_utils.py:99-103)") {
    Tables.load(spark, sf, "region").createOrReplaceTempView("res_probe")
    assert(Session.resolveView(spark, "RES_PROBE").count() == 5)
    intercept[IllegalArgumentException] { Session.resolveView(spark, "no_such_view") }
  }

  test("introspection shims (arc_utils.py:42-84)") {
    val df = Tables.load(spark, sf, "nation")
    assert(Session.listFlds(df) == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(Session.listFldTypes(df)("n_name") == "string")
  }

  test("get_oid_fld / get_shp_fld resolution (arc_utils.py:67-84)") {
    import org.apache.spark.sql.functions._
    val base = Tables.load(spark, sf, "supplier")
    assert(Session.getOidFld(base).isEmpty && Session.getShpFld(base).isEmpty)
    val withOid = base.withColumnRenamed("s_suppkey", "OBJECTID")
    assert(Session.getOidFld(withOid).contains("OBJECTID"))
    val indexed = graft.compat.Compat.withIndex(base, "s_suppkey")
    assert(Session.getOidFld(indexed).contains("s_suppkey")) // metadata beats names
    val withGeom = graft.operators.Sinks.withPointGeom(base, "s_acctbal", "s_suppkey", 4326)
    assert(Session.getShpFld(withGeom).contains("geom"))
    assert(Session.withExtension("spatial") { 42 } == 42) // C4 no-op scope
  }
}
