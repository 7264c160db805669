package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ArrowExchange, PolyGeom, Sinks}

/** S2/S3/S5 Arrow exchange: requested-case rename + where + geometry
  * encoding through a REAL Arrow IPC stream (opened with the Arrow Java
  * reader, as a polars/pyarrow client would), per-partition batch surface,
  * and the batches→DataFrame inverse. */
class ArrowExchangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def geoDf = {
    val rows = Seq(
      Row(1L, "a", Seq(Seq(Row(0.0, 0.0), Row(4.0, 0.0), Row(4.0, 3.0), Row(0.0, 3.0)))),
      Row(2L, "b", Seq(Seq(Row(0.0, 0.0), Row(2.0, 0.0), Row(0.0, 2.0)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("Obj_Id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("shape", PolyGeom.RingsT))))
  }

  test("prepare: requested-case rename, dialect where, WKT geometry + metadata (arc_utils.py:991-1051)") {
    val out = ArrowExchange.prepare(geoDf,
      flds = Some(Seq("OBJ_ID" -> "OBJECTID", "tag" -> "tag", "shape" -> "shape")),
      where = Some("[Obj_Id] = 1"),
      geomCol = Some("shape"), geometryEncoding = Some("WKT"), srWkt = "GEOGCS[\"wgs84\"]")
    assert(out.columns.toSeq == Seq("OBJECTID", "tag", "shape"))
    val r = out.head()
    assert(r.getLong(0) == 1L)
    assert(r.getString(2) == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 3.0, 0.0 3.0))")
    val md = out.schema("shape").metadata
    assert(md.getString(Sinks.EncodingKey) == "WKT")
    assert(md.getString(Sinks.SrWktKey) == "GEOGCS[\"wgs84\"]")
  }

  test("prepare: no encoding drops the geometry column; ESRIJSON carries the wkid") {
    assert(!ArrowExchange.prepare(geoDf, geomCol = Some("shape"))
      .columns.contains("shape"))
    val ej = ArrowExchange.prepare(geoDf, where = Some("[Obj_Id] = 2"),
      geomCol = Some("shape"), geometryEncoding = Some("ESRIJSON"), wkid = 2868)
      .select("shape").head().getString(0)
    assert(ej == """{"rings":[[[0.0,0.0],[2.0,0.0],[0.0,2.0]]],"spatialReference":{"wkid":2868}}""")
  }

  test("toArrowStream produces a valid IPC stream a client can open") {
    import scala.jdk.CollectionConverters._
    val df = ArrowExchange.prepare(geoDf,
      flds = Some(Seq("obj_id" -> "OID", "tag" -> "tag", "shape" -> "shape")),
      geomCol = Some("shape"), geometryEncoding = Some("WKB"))
    val bytes = ArrowExchange.toArrowStream(df)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val names = reader.getVectorSchemaRoot.getSchema.getFields.asScala.map(_.getName)
      assert(names == Seq("OID", "tag", "shape")) // requested case survives the Arrow path
      var rows = 0L
      val oids = scala.collection.mutable.ArrayBuffer[Long]()
      while (reader.loadNextBatch()) {
        val root = reader.getVectorSchemaRoot
        val oid = root.getVector("OID").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        (0 until root.getRowCount).foreach(i => oids += oid.get(i))
        rows += root.getRowCount
      }
      assert(rows == 2L && oids.sorted == Seq(1L, 2L))
    } finally { reader.close(); alloc.close() }
  }

  test("per-partition batch surface + batches round-trip back to a DataFrame") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(3)
    val batches = ArrowExchange.toArrowBatches(df)
    assert(batches.getNumPartitions == 3) // one executor-side batch stream per partition
    val back = ArrowExchange.fromArrowBatches(spark, df.schema.json,
      batches.collect().iterator)
    assert(back.count() == 1000L)
    assert(back.agg(sum(col("v"))).head().getLong(0) == 999000L)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"))
  }
}
