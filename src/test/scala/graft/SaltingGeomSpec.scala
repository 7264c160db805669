package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GeomCodec, Multimodal, Salting}

/** Skew salting, geometry encodings, multimodal feature/resize surface. */
class SaltingGeomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("saltedJoin matches plain join results and spreads hot keys") {
    val orders = Tables.load(spark, sf, "orders")
    val cust = Tables.load(spark, sf, "customer").select("c_custkey", "c_name")
    val plain = orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .groupBy("c_custkey").count()
    val salted = Salting.saltedJoin(orders, cust, "o_custkey", "c_custkey",
        buckets = 8, saltSource = Seq("o_orderkey"))
      .groupBy("c_custkey").count()
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // determinism: same salt for same row on re-evaluation
    val s1 = orders.select(Salting.salt(8, col("o_orderkey")).as("s")).collect()
    val s2 = orders.select(Salting.salt(8, col("o_orderkey")).as("s")).collect()
    assert(s1.map(_.getInt(0)).toSeq == s2.map(_.getInt(0)).toSeq)
  }

  test("saltedAgg two-phase sum/count matches direct aggregation") {
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val salted = Salting.saltedAgg(
      li.select(col("l_returnflag").as("k"), col("l_quantity"), col("l_orderkey")),
      "k", buckets = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum(col("l_quantity")).as("pq")),
      finalAggs = Seq(sum(col("pn")).as("n"), sum(col("pq")).as("q")),
      saltSource = Seq("l_orderkey"))
    val d = direct.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    val s = salted.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(d.toSeq == s.toSeq)
  }

  test("WKT / GeoJSON / WKB point encodings round-trip (arc_utils.py:971-978)") {
    val df = spark.range(1).select(lit(1.5).as("x"), lit(-2.25).as("y"))
    val r = df.select(
      GeomCodec.pointWkt(col("x"), col("y")).as("wkt"),
      GeomCodec.pointGeoJson(col("x"), col("y")).as("gj"),
      GeomCodec.pointWkb(col("x"), col("y")).as("wkb")).first()
    assert(r.getString(0) == "POINT (1.5 -2.25)")
    assert(r.getString(1) == """{"type":"Point","coordinates":[1.5,-2.25]}""")
    val wkb = r.getAs[Array[Byte]](2)
    assert(wkb.length == 21 && wkb(0) == 1)
    // round-trips, both codegen and local
    val back = df.select(
      GeomCodec.wktPointX(GeomCodec.pointWkt(col("x"), col("y"))).as("x1"),
      GeomCodec.wkbPointX(GeomCodec.pointWkb(col("x"), col("y"))).as("x2"),
      GeomCodec.wkbPointY(GeomCodec.pointWkb(col("x"), col("y"))).as("y2")).first()
    assert(back.getDouble(0) == 1.5 && back.getDouble(1) == 1.5 && back.getDouble(2) == -2.25)
    assert(GeomCodec.wkbPointXOf(GeomCodec.pointWkbBytes(1.5, -2.25)) == 1.5)
  }

  test("box WKT closes the ring") {
    val r = spark.range(1).select(
      GeomCodec.boxWkt(lit(0.0), lit(0.0), lit(2.0), lit(1.0)).as("w")).first()
    assert(r.getString(0) ==
      "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0))")
  }

  test("multimodal features: 16-dim normalized decoded-pixel histogram feeds similarity") {
    val media = Multimodal.asMedia(
      Tables.load(spark, sf, "documents").limit(10), "text", "image")
    val feats = Multimodal.extractFeatures(media, "doc_id")
    val row = feats.first()
    val v = row.getSeq[Float](1)
    assert(v.length == 16)
    assert(math.abs(v.sum - 1.0f) < 1e-3) // normalized histogram
  }

  test("multimodal resize updates metadata contract") {
    val media = Multimodal.asMedia(
      Tables.load(spark, sf, "documents").limit(5), "text", "image")
    val resized = Multimodal.resize(media, 64, 32)
    val m = resized.select("media_meta.width", "media_meta.height").first()
    assert(m.getInt(0) == 64 && m.getInt(1) == 32)
  }

  test("keySkewReport: exact counts, shares and cumulative head share; ties by key") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("key").repartition(4)
    val out = Salting.keySkewReport(df, "key", topN = 3).orderBy("rank").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "a", 5L), (2, "b", 3L), (3, "c", 1L))) // c before d on the tie
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.5, 0.3, 0.1))
    assert(out.map(_.getDouble(4)).toSeq == Seq(0.5, 0.8, 0.9))
  }
}
