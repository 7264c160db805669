package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextHashExprs, VectorExprs}

/** SQL registration of the native kernels: the same expressions reachable
  * from `spark.sql(...)` as from the Column API, with identical results. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("SQL functions match the Column API bit-for-bit") {
    GraftFunctions.register(spark)
    Tables.load(spark, sf, "documents").limit(20).createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash16(text, 5) AS sh,
        |       graft_minhash_sig(text, 5, 8)[0] AS m1,
        |       size(graft_shingle_hashes(text, 5)) AS nsh
        |FROM gf_docs ORDER BY doc_id""".stripMargin).collect()
    val viaCol = spark.table("gf_docs").select(
        col("doc_id"),
        TextHashExprs.simhash16(col("text"), 5).as("sh"),
        element_at(TextHashExprs.minhashSig(col("text"), 5, 8), 1).as("m1"),
        size(TextHashExprs.shingleHashes(col("text"), 5)).as("nsh"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("SQL cosine/dot and WKB round-trip") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_wkb_x(graft_point_wkb(1.5D, -2.25D)) AS x""".stripMargin).first()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0 && r.getDouble(2) == 1.5)
  }

  test("graft_split_rect generator: SQL LATERAL VIEW matches the flatMap operator") {
    GraftFunctions.register(spark)
    Tables.load(spark, sf, "part").limit(50).select(
        col("p_partkey"), lit(0.0).as("xmin"), lit(0.0).as("ymin"),
        col("p_size").cast("double").as("xmax"),
        (col("p_retailprice") / 100.0).as("ymax"))
      .withColumn("acres", (col("xmax") - col("xmin")) * (col("ymax") - col("ymin")))
      .createOrReplaceTempView("gf_polys")
    val viaSql = spark.sql(
      """SELECT p_partkey AS orig_fid, t.split_seq, t.xmin, t.xmax, t.area
        |FROM gf_polys
        |LATERAL VIEW graft_split_rect(p_partkey, xmin, ymin, xmax, ymax, acres, 100.0D) t
        |ORDER BY orig_fid, split_seq""".stripMargin).collect()
    val viaDf = graft.operators.Tessellation.splitEqualArea(
        spark.table("gf_polys").select(
          col("p_partkey").as("OBJECTID"),
          struct(col("xmin"), col("ymin"), col("xmax"), col("ymax")).as("geom"),
          col("acres")),
        maxAcres = 100.0)
      .select(col("orig_fid"), col("split_seq"),
        col("geom.xmin"), col("geom.xmax"), col("geom.area"))
      .orderBy("orig_fid", "split_seq").collect()
    assert(viaSql.length == viaDf.length && viaSql.nonEmpty)
    viaSql.zip(viaDf).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("graft_split_rings generator: SQL LATERAL VIEW matches the rings flatMap operator") {
    GraftFunctions.register(spark)
    import graft.operators.{PolyGeom, RingSplit}
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(x.as("x"), y.as("y"))
    val w = col("p_size").cast("double")
    val h = col("p_retailprice") / lit(100.0)
    val rings = array(array(
      pt(lit(0.0), lit(0.0)), pt(w, lit(0.0)), pt(w, h),
      pt(w / lit(2.0), h + lit(2.0)), pt(lit(0.0), h)))
    val polys = Tables.load(spark, sf, "part").limit(50).select(
      col("p_partkey").as("OBJECTID"), rings.as("geom"),
      PolyGeom.polygonArea(rings).as("acres"))
    polys.createOrReplaceTempView("gf_ring_polys")
    val viaSql = spark.sql(
      """SELECT OBJECTID AS orig_fid, t.split_seq, t.part_area, t.geom
        |FROM gf_ring_polys
        |LATERAL VIEW graft_split_rings(OBJECTID, geom, acres, 100.0D) t
        |ORDER BY orig_fid, split_seq""".stripMargin).collect()
    val viaDf = RingSplit.splitEqualArea(polys, maxAcres = 100.0)
      .select(col("orig_fid"), col("split_seq"), col("part_area"), col("geom"))
      .orderBy("orig_fid", "split_seq").collect()
    assert(viaSql.length == viaDf.length && viaSql.nonEmpty)
    viaSql.zip(viaDf).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("SQL polygon codecs + top-k aggregate match the Column API") {
    GraftFunctions.register(spark)
    // WKT → rings → stats, all in SQL
    val r = spark.sql(
      """SELECT graft_polygon_stats(graft_wkt_polygon_rings('POLYGON ((0 0, 10 0, 10 10, 0 10))')) AS s"""
    ).select("s.area", "s.cx", "s.cy").head()
    assert(r.getDouble(0) == 100.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0)
    // WKB round-trip in SQL
    val n = spark.sql(
      """SELECT size(graft_wkb_polygon_rings(graft_polygon_wkb(
        |  graft_wkt_polygon_rings('POLYGON ((0 0, 4 0, 0 3))')))[0]) AS np""".stripMargin)
      .head().getInt(0)
    assert(n == 3)
    // bounded top-k as a SQL aggregate
    spark.range(0, 100).selectExpr("id % 3 AS g", "CAST(id AS DOUBLE) AS s", "id")
      .createOrReplaceTempView("tk_probe")
    val tk = spark.sql(
      "SELECT g, graft_top_k(s, id, 2) AS t FROM tk_probe GROUP BY g ORDER BY g")
      .selectExpr("g", "t[0].id AS best", "t[1].id AS second").collect()
    assert(tk.map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2))).toSeq ==
      Seq((0L, 99L, 96L), (1L, 97L, 94L), (2L, 98L, 95L)))
  }

  test("non-literal w/k arguments are rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_simhash16('a b', CAST(rand()*5 AS INT))").collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
  }
}
