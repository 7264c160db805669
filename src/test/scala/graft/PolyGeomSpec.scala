package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PolyGeom, Sinks}

/** Polygon ring codecs + measures: WKB round-trip, shoelace area/centroid
  * laws (hole subtraction, winding invariance, open≡closed), JSON/WKT
  * encodings, CRS metadata through the sink. DuckDB has no spatial extension
  * in this environment, so laws stand in for a cross-engine oracle here —
  * the arithmetic itself IS oracle-checked by q39_polygon_stats. */
class PolyGeomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ringsDf(polys: Seq[Seq[Seq[(Double, Double)]]]): DataFrame = {
    val rows = polys.zipWithIndex.map { case (rings, i) =>
      Row(i.toLong, rings.map(r => r.map { case (x, y) => Row(x, y) }))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rings", PolyGeom.RingsT))))
  }

  private val square = Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)))
  private val squareWithHole = Seq(
    Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),          // CCW outer
    Seq((4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)))              // CW hole 2×2

  test("WKB round-trip preserves every ring and coordinate (random polygons)") {
    val rnd = new scala.util.Random(7)
    val polys = Seq.fill(25) {
      Seq.fill(1 + rnd.nextInt(3)) {
        Seq.fill(3 + rnd.nextInt(6))((rnd.nextDouble() * 1000 - 500, rnd.nextDouble() * 1000 - 500))
      }
    }
    val df = ringsDf(polys)
    val back = df.select(col("id"),
      PolyGeom.wkbPolygonRings(PolyGeom.polygonWkb(col("rings"))).as("rt"),
      col("rings"))
    assert(back.filter(not(col("rt") === col("rings"))).count() == 0)
  }

  test("WKB header: little-endian, type 3, ring/point counts") {
    val bytes = ringsDf(squareWithHole +: Nil).select(PolyGeom.polygonWkb(col("rings")))
      .head().getAs[Array[Byte]](0)
    assert(bytes(0) == 1.toByte)                       // byte order LE
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.get()
    assert(bb.getInt() == 3)                           // polygon
    assert(bb.getInt() == 2)                           // two rings
    assert(bb.getInt() == 4)                           // 4 pts in outer
  }

  test("MultiPolygon WKB (type 6) flattens to rings; area sums the members") {
    // two disjoint unit squares, CCW, LE encoding with per-member headers
    def squareAt(x0: Double): Seq[(Double, Double)] =
      Seq((x0, 0.0), (x0 + 1, 0.0), (x0 + 1, 1.0), (x0, 1.0))
    val bb = java.nio.ByteBuffer.allocate(9 + 2 * (9 + 4 + 4 * 16))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(6).putInt(2)
    Seq(0.0, 5.0).foreach { x0 =>
      bb.put(1.toByte).putInt(3).putInt(1).putInt(4)
      squareAt(x0).foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    }
    import spark.implicits._
    val df = Seq(bb.array()).toDF("wkb")
      .select(PolyGeom.wkbPolygonRings(col("wkb")).as("rings"))
    assert(df.select(size(col("rings"))).head().getInt(0) == 2)
    assert(df.select(PolyGeom.polygonArea(col("rings"))).head().getDouble(0) == 2.0)
  }

  test("big-endian WKB decodes too") {
    val bb = java.nio.ByteBuffer.allocate(9 + 4 + 3 * 16) // 1 ring, 3 pts
    bb.put(0.toByte).putInt(3).putInt(1).putInt(3)
      .putDouble(0).putDouble(0).putDouble(4).putDouble(0).putDouble(0).putDouble(3)
    import spark.implicits._
    val df = Seq(bb.array()).toDF("wkb")
    val area = df.select(PolyGeom.polygonArea(PolyGeom.wkbPolygonRings(col("wkb"))))
      .head().getDouble(0)
    assert(area == 6.0) // right triangle 4×3
  }

  test("shoelace laws: rectangle area/centroid; hole subtracts; winding-invariant; open≡closed") {
    val df = ringsDf(Seq(square, squareWithHole))
    val stats = df.orderBy("id")
      .select(PolyGeom.polygonStats(col("rings")).as("s"))
      .select("s.area", "s.cx", "s.cy").collect()
    assert(stats(0).getDouble(0) == 100.0 && stats(0).getDouble(1) == 5.0 && stats(0).getDouble(2) == 5.0)
    assert(stats(1).getDouble(0) == 96.0)              // 100 − 4
    // winding invariance of the absolute area
    val rev = ringsDf(Seq(square.map(_.reverse)))
    assert(rev.select(PolyGeom.polygonArea(col("rings"))).head().getDouble(0) == 100.0)
    // closed spelling (last == first) computes the same stats
    val closed = ringsDf(Seq(Seq(square.head :+ square.head.head)))
    val cs = closed.select(PolyGeom.polygonStats(col("rings")).as("s"))
      .select("s.area", "s.cx", "s.cy").head()
    assert(cs.getDouble(0) == 100.0 && cs.getDouble(1) == 5.0 && cs.getDouble(2) == 5.0)
  }

  test("WKT / GeoJSON / EsriJSON renderings") {
    val tri = ringsDf(Seq(Seq(Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)))))
    val out = tri.select(
      PolyGeom.polygonWkt(col("rings")).as("wkt"),
      PolyGeom.polygonGeoJson(col("rings")).as("gj"),
      PolyGeom.polygonEsriJson(col("rings"), wkid = 4326).as("ej")).head()
    assert(out.getString(0) == "POLYGON ((0.0 0.0, 1.0 0.0, 0.0 1.0))")
    assert(out.getString(1) == """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[0.0,1.0]]]}""")
    assert(out.getString(2) == """{"rings":[[[0.0,0.0],[1.0,0.0],[0.0,1.0]]],"spatialReference":{"wkid":4326}}""")
    // GeoJSON body parses back via Spark's JSON reader
    val coords = tri.select(from_json(PolyGeom.polygonGeoJson(col("rings")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("coordinates",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))))).as("j"))
      .select(element_at(element_at(col("j.coordinates"), 1), 2)).head().getSeq[Double](0)
    assert(coords == Seq(1.0, 0.0))
  }

  test("GeoJSON / EsriJSON parse: every text codec round-trips") {
    val df = ringsDf(Seq(squareWithHole))
    val gj = df.select(col("rings"),
      PolyGeom.geoJsonPolygonRings(PolyGeom.polygonGeoJson(col("rings"))).as("rt"))
    assert(gj.filter(not(col("rt") === col("rings"))).count() == 0)
    val ej = df.select(col("rings"),
      PolyGeom.esriJsonPolygonRings(PolyGeom.polygonEsriJson(col("rings"), 4326)).as("rt"))
    assert(ej.filter(not(col("rt") === col("rings"))).count() == 0)
    // malformed input → null, Spark JSON semantics
    import spark.implicits._
    assert(Seq("not json").toDF("j")
      .select(PolyGeom.geoJsonPolygonRings(col("j"))).head().isNullAt(0))
  }

  test("WKT parse: round-trips the WKT codec, tolerates case/whitespace, rejects junk") {
    val df = ringsDf(Seq(squareWithHole))
    // encode → parse → identical rings
    val back = df.select(col("rings"),
      PolyGeom.wktPolygonRings(PolyGeom.polygonWkt(col("rings"))).as("rt"))
    assert(back.filter(not(col("rt") === col("rings"))).count() == 0)
    // flexible spelling
    import spark.implicits._
    val area = Seq("polygon((0 0, 4.0e0 0, 4 3, 0 3))").toDF("w")
      .select(PolyGeom.polygonArea(PolyGeom.wktPolygonRings(col("w")))).head().getDouble(0)
    assert(area == 12.0)
    assertThrows[Exception] {
      Seq("LINESTRING (0 0, 1 1)").toDF("w")
        .select(PolyGeom.wktPolygonRings(col("w"))).collect()
    }
  }

  test("clipRect: exact rectangle intersection; empty when disjoint; SQL surface agrees") {
    val df = ringsDf(Seq(square)) // 10×10 at origin
    val clipped = df.select(
      PolyGeom.polygonStats(PolyGeom.clipRect(col("rings"),
        lit(5.0), lit(5.0), lit(20.0), lit(20.0))).as("s"))
      .select("s.area", "s.cx", "s.cy").head()
    assert(clipped.getDouble(0) == 25.0)  // overlap square [5,10]×[5,10]
    assert(clipped.getDouble(1) == 7.5 && clipped.getDouble(2) == 7.5)
    // disjoint clip → empty rings
    assert(df.select(size(PolyGeom.clipRect(col("rings"),
      lit(50.0), lit(50.0), lit(60.0), lit(60.0)))).head().getInt(0) == 0)
    // same through SQL
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("clip_probe")
    val viaSql = spark.sql(
      """SELECT graft_polygon_stats(
        |  graft_rings_clip_rect(rings, 5.0D, 5.0D, 20.0D, 20.0D)).area AS a
        |FROM clip_probe""".stripMargin).head().getDouble(0)
    assert(viaSql == 25.0)
  }

  test("pointInPolygon: inside/outside/hole; MBR bounds; spatialJoinGrid agrees with brute force") {
    val df = ringsDf(Seq(squareWithHole))
    def in(px: Double, py: Double): Boolean =
      df.select(PolyGeom.pointInPolygon(col("rings"), lit(px), lit(py)).as("b"))
        .first().getBoolean(0)
    assert(in(1.0, 1.0))            // inside outer
    assert(!in(5.0, 5.0))           // inside the hole → outside the polygon
    assert(!in(11.0, 5.0))          // right of the square
    assert(!in(-0.5, 5.0))          // left of the square
    assert(in(9.9, 9.9))            // corner-adjacent interior
    val mbr = df.select(PolyGeom.polygonMbr(col("rings")).as("m")).select("m.*").first()
    assert(mbr.getDouble(0) == 0.0 && mbr.getDouble(1) == 0.0 &&
      mbr.getDouble(2) == 10.0 && mbr.getDouble(3) == 10.0)

    // grid join ≡ brute-force cross join + exact test, regardless of cell size
    val polys = ringsDf(Seq(square.map(_.map { case (x, y) => (x + 20.0, y) }),
      squareWithHole))
    val pts = spark.range(0, 200).selectExpr("id AS pt_id",
      "CAST(id % 40 AS DOUBLE) - 2.5 AS px", "CAST(id % 17 AS DOUBLE) - 1.5 AS py")
    def pairs(d: DataFrame) =
      d.select("pt_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(pts.crossJoin(polys)
      .filter(PolyGeom.pointInPolygon(col("rings"), col("px"), col("py"))))
    for (cell <- Seq(3.0, 10.0, 50.0)) {
      val grid = pairs(graft.operators.Joins.spatialJoinGrid(
        pts, "px", "py", polys, "rings", cell))
      assert(grid == brute, s"cell=$cell grid=${grid.size} brute=${brute.size}")
    }
  }

  test("mbrOverlapJoin: equals brute force and emits each pair exactly once at any cell size") {
    import graft.operators.{Joins, PolyGeom}
    // overlapping squares at varied offsets; several pairs straddle many cells
    val polys = ringsDf((0 until 12).map { i =>
      val o = i * 4.0
      Seq(Seq((o, o), (o + 10.0, o), (o + 10.0, o + 10.0), (o, o + 10.0)))
    })
    val mbrs = polys.select(col("id"), PolyGeom.polygonMbr(col("rings")).as("m"))
      .select(col("id"), col("m.xmin"), col("m.ymin"), col("m.xmax"), col("m.ymax"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val brute = (for {
      a <- mbrs.keys; b <- mbrs.keys if a < b
      (ax0, ay0, ax1, ay1) = mbrs(a); (bx0, by0, bx1, by1) = mbrs(b)
      if math.max(ax0, bx0) < math.min(ax1, bx1) &&
        math.max(ay0, by0) < math.min(ay1, by1)
    } yield (a, b)).toSet
    for (cell <- Seq(3.0, 10.0, 100.0)) {
      val rows = Joins.mbrOverlapJoin(polys, "id", "rings", cell)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.distinct.length, s"cell=$cell: duplicate pairs emitted")
      assert(rows.toSet == brute, s"cell=$cell got=${rows.length} want=${brute.size}")
    }
  }

  test("multipolygon WKB (type 6, hole): decode → spatialJoinGrid excludes hole, finds both parts") {
    import graft.operators.Joins
    import spark.implicits._
    // part 1 = unit-10 square with a centered hole; part 2 = disjoint square
    val multi = Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
      Seq((2.5, 2.5), (7.5, 2.5), (7.5, 7.5), (2.5, 7.5)),
      Seq((20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0)))
    val polys = ringsDf(Seq(multi)).select(col("id"),
      concat(lit(Array[Byte](1, 6, 0, 0, 0, 2, 0, 0, 0)),
        PolyGeom.polygonWkb(slice(col("rings"), 1, 2)),
        PolyGeom.polygonWkb(slice(col("rings"), 3, 1))).as("wkb"))
    // bytes really are a 2-part type-6 multipolygon; decode flattens back
    val first = polys.select(hex(col("wkb"))).first().getString(0)
    assert(first.startsWith("01060000000200000001030000000200000004000000"), first)
    val decoded = polys.select(col("id"), PolyGeom.wkbPolygonRings(col("wkb")).as("rings"))
    assert(decoded.select(size(col("rings"))).first().getInt(0) == 3)
    val points = Seq(
      (1L, 1.0, 1.0),    // in part 1's ring (outside hole) → match
      (2L, 5.0, 5.0),    // inside the hole → NO match
      (3L, 25.0, 5.0),   // in part 2 → match
      (4L, 15.0, 5.0),   // between parts → NO match
      (5L, 3.0, 8.5)     // above the hole, inside part 1 → match
    ).toDF("pt_id", "px", "py")
    val got = Joins.spatialJoinGrid(points, "px", "py", decoded, "rings", cellSize = 8.0)
      .select("pt_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 5L), got.toString)
  }

  test("CRS + encoding metadata ride the geometry column through the parquet sink") {
    Session.withScratch { s =>
      val df = ringsDf(Seq(square)).select(col("id"),
        PolyGeom.asGeometry(PolyGeom.polygonWkb(col("rings")), "shape",
          encoding = "WKB", srWkt = "PROJCS[\"test\"]"))
      Sinks.writeTable(df, s.dir, "polys", coerce = false)
      val md = Sinks.readBack(spark, s.dir, "polys").schema("shape").metadata
      assert(md.getString(Sinks.EncodingKey) == "WKB")
      assert(md.getString(Sinks.SrWktKey) == "PROJCS[\"test\"]")
    }
  }
}
