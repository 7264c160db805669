package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Arrow exchange facade — the columnar client hand-off of `arc_to_polars` /
  * `arc_to_pandas_a` (`/root/reference/smartpy_arc/arc_utils.py:956-1051`)
  * and the schema-metadata attach of `polars_to_arc` (`:1054-1120`).
  *
  * [[prepare]] reproduces the read-side semantics: field selection where the
  * OUTPUT takes the caller's spelling regardless of stored case
  * (`:1041-1051`), an ArcGIS-dialect where clause, and geometry-encoding
  * selection over a rings column (`:971-978`: no encoding → the geometry
  * column is not pulled at all; otherwise it is encoded and tagged with the
  * `esri.encoding` / `esri.sr_wkt` field metadata of `:1104-1112`).
  * ESRISHAPE has no public wire spec, so it is carried as WKB bytes tagged
  * `EsriShape` — same byte-width class, documented deviation (SURVEY §7.4).
  *
  * The hand-off itself is executor-side: [[toArrowBatches]] yields ONE
  * serialized Arrow record batch per partition (an `RDD[Array[Byte]]` a
  * service layer can stream), and [[toArrowStream]] assembles a standard
  * Arrow IPC stream pulling one partition at a time — peak driver memory is
  * a single partition's batch, never the dataset. [[fromArrowBatches]] is
  * the inverse (client → engine), completing the polars round-trip.
  */
object ArrowExchange {

  val Encodings: Set[String] = Set("ESRISHAPE", "ESRIJSON", "GEOJSON", "WKT", "WKB")

  /** Read-side shaping: flds (src → requested output spelling; None keeps
    * all), ArcGIS-dialect where, geometry encoding for `geomCol` rings. */
  def prepare(df: DataFrame,
              flds: Option[Seq[(String, String)]] = None,
              where: Option[String] = None,
              geomCol: Option[String] = None,
              geometryEncoding: Option[String] = None,
              wkid: Int = 4326,
              srWkt: String = ""): DataFrame = {
    var out = where.map(w => df.filter(expr(WhereDialect.toSparkSql(w)))).getOrElse(df)
    out = flds match {
      case Some(pairs) => FieldMap(out, pairs.map { case (s, o) => FieldSpec(s, o) })
      case None => out
    }
    geomCol match {
      case None => out
      case Some(g) =>
        geometryEncoding.map(_.toUpperCase) match {
          case None =>
            // reference: without an encoding the shape field is not pulled
            out.drop(g)
          case Some(enc) =>
            require(Encodings.contains(enc), s"unknown geometry encoding '$enc'")
            val rings = col(g)
            val encoded = enc match {
              case "WKB" | "ESRISHAPE" => PolyGeom.polygonWkb(rings)
              case "WKT"               => PolyGeom.polygonWkt(rings)
              case "GEOJSON"           => PolyGeom.polygonGeoJson(rings)
              case "ESRIJSON"          => PolyGeom.polygonEsriJson(rings, wkid)
            }
            val tagged = if (enc == "ESRISHAPE") "EsriShape" else enc
            out.select(out.columns.map(c =>
              if (c == g) PolyGeom.asGeometry(encoded, g, tagged, srWkt)
              else col(c)).toSeq: _*)
        }
    }
  }

  /** One serialized Arrow record batch per partition, computed on the
    * executors. The streaming surface for a service layer. */
  def toArrowBatches(df: DataFrame): RDD[Array[Byte]] =
    Bridge.toArrowBatchRdd(df)

  /** Full Arrow IPC stream (schema + batches) as bytes — what a polars /
    * pyarrow client opens directly. Use only for client-sized results; the
    * per-partition surface above is the scale path. */
  def toArrowStream(df: DataFrame): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    Bridge.writeArrowStream(df, bos)
    bos.toByteArray
  }

  /** Inverse hand-off: serialized record batches (+ the schema's JSON) back
    * to a DataFrame. */
  def fromArrowBatches(spark: SparkSession, schemaJson: String,
                       batches: Iterator[Array[Byte]]): DataFrame =
    Bridge.fromArrowBatches(spark, schemaJson, batches)
}
