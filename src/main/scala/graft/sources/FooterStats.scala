package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics read from parquet FOOTERS — the metadata
  * the write already paid for. This is how a manifest gets built or
  * carried WITHOUT re-reading data pages: at 100 TB a manifest rebuild
  * that re-scans the version it just published doubles the write path's
  * I/O (the r14 wart, VERDICT r14 "What's wrong" #1); the footers hold
  * the same per-column min/max (and null counts, which the scan-side agg
  * never collected) at O(#files) metadata round-trips.
  *
  * Fidelity contract with the scan-built manifests it replaces:
  *  - numerics/strings/dates/timestamps(INT64): parquet chunk statistics
  *    are exact values in the same orders Spark's own min/max agg uses
  *    (strings: unsigned-byte = UTF8String binary order), so pruning
  *    decisions are identical;
  *  - any column/file whose footer stats are absent, unusable (INT96
  *    timestamps, NaN float bounds, stats dropped for oversized binary
  *    values) or of an unsupported shape degrades to NULL min/max for
  *    that file — [[ManifestPrune]] keeps such files, conservative by
  *    construction. NOTE: Spark still writes TimestampType as INT96 by
  *    default, whose footer stats are order-unreliable and therefore
  *    ignored — sessions that want timestamp FILE skipping set
  *    `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (the
  *    right choice on a modern lakehouse anyway; INT96 is deprecated).
  *    Everything still WORKS under INT96 — timestamp bounds just stay
  *    unknown, so those files are never skipped;
  *  - all-null files/chunks yield NULL min/max with an exact null count,
  *    matching the agg path's `min(col) = NULL`.
  *
  * The manifest row schema gains `rowcount` and `nullcount_<col>`
  * columns (both LongType) over the legacy `file/min_<col>/max_<col>`
  * shape; readers treat the new columns as optional, so legacy manifests
  * keep serving. */
object FooterStats {

  /** Merged stats of one column across one file's row groups. `min`/`max`
    * are Spark EXTERNAL values of the column's Spark type (null = not
    * provable from the footer); `nullCount` None = not recorded. */
  final case class ColStats(min: Any, max: Any, nullCount: Option[Long])

  /** Resolve requested stats columns against `schema` CASE-INSENSITIVELY
    * to their canonical (on-schema) spelling — SQL identifiers arrive in
    * whatever case the user typed, and an exact-case miss here would
    * throw AFTER data is already written. Unknown columns error with
    * guidance up front. */
  def resolveCols(schema: StructType, cols: Seq[String]): Seq[String] =
    cols.map { c =>
      schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.name).getOrElse(
        throw new IllegalArgumentException(
          s"stats column '$c' is not in the schema " +
            s"(${schema.fieldNames.mkString(", ")})"))
    }

  /** The manifest schema for `statsCols` of `schema`:
    * file, rowcount, then (min_c, max_c, nullcount_c) per column. */
  def manifestSchema(schema: StructType, statsCols: Seq[String]): StructType =
    StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("rowcount", LongType, nullable = false) +:
        resolveCols(schema, statsCols).flatMap { c =>
          val dt = schema(c).dataType
          Seq(StructField(s"min_$c", dt), StructField(s"max_$c", dt),
            StructField(s"nullcount_$c", LongType))
        })

  /** The manifest frame for every `*.parquet` under `dataDir` — built on
    * the driver from footers only (one tail read per file, zero data
    * pages, zero Spark jobs). #files rows; callers coalesce(1)-write it. */
  def manifestFrame(spark: SparkSession, dataDir: String,
                    schema: StructType, statsCols: Seq[String]): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(dataDir)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
      .sortBy(_.getName)
    val cols = resolveCols(schema, statsCols)
    val out = manifestSchema(schema, cols)
    // footer reads are independent per file — bounded driver-pool fan-out
    // (graft.Par), order preserved by indexed writes
    val rowArr = new Array[Row](files.length)
    graft.Par.each(files.zipWithIndex) { case (f, i) =>
      val (rowCount, stats) = fileStats(conf, f, schema, cols)
      rowArr(i) = Row.fromSeq(
        f.toString +: rowCount +: cols.flatMap { c =>
          val s = stats(c)
          Seq(s.min, s.max, s.nullCount.map(Long.box).orNull)
        })
    }
    val rows: Seq[Row] = rowArr.toSeq
    spark.createDataFrame(rows.asJava, out)
  }

  /** One file's footer → (row count, per-column merged stats). */
  def fileStats(conf: Configuration, file: org.apache.hadoop.fs.Path,
                schema: StructType,
                statsCols: Seq[String]): (Long, Map[String, ColStats]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      // top-level flat columns only (the manifest never indexes nested
      // paths); dot-string of a top-level column is its name
      val chunks: Map[String, Seq[ColumnChunkMetaData]] = blocks
        .flatMap(_.getColumns.asScala)
        .groupBy(_.getPath.toDotString.toLowerCase)
        .view.mapValues(_.toSeq).toMap
      // FIELD-ID resolution (r17): when the requested field carries a
      // `parquet.field.id` AND the file's schema declares ids, the footer
      // column is found BY ID — never by name. Under metadata-only RENAME
      // a name lookup misses the old-named chunk and mis-reports the
      // column as all-null (stats that would PRUNE files whose id-read
      // serves real values); under DROP + re-ADD of the same name a name
      // lookup matches the RETIRED bytes' stats (claiming non-null values
      // the id-read serves as null). Id-vs-id misses stay all-null —
      // correct for files written before the column existed. Name lookup
      // remains for id-less schemas/files (fixtures, snapshot versions).
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      val fileHasIds = fileSchema.getFields.asScala.exists(_.getId != null)
      def footerKey(canonical: String): Option[String] = {
        val fd = schema(canonical)
        val reqId =
          if (fd.metadata.contains("parquet.field.id"))
            Some(fd.metadata.getLong("parquet.field.id").toInt)
          else None
        (reqId, fileHasIds) match {
          case (Some(id), true) =>
            fileSchema.getFields.asScala
              .find(t => t.getId != null && t.getId.intValue == id)
              .map(_.getName.toLowerCase)
          case _ => Some(canonical.toLowerCase)
        }
      }
      val stats = resolveCols(schema, statsCols).zip(statsCols).map {
        case (canonical, c) =>
        val dt = schema(canonical).dataType
        c -> footerKey(canonical).flatMap(chunks.get)
          .map(mergeChunks(dt, _))
          // column absent from this file (written before a schema ADD):
          // every read of it is null — exactly representable
          .getOrElse(ColStats(null, null, Some(rowCount)))
      }.toMap
      (rowCount, stats)
    } finally reader.close()
  }

  private def mergeChunks(dt: DataType,
                          chunks: Seq[ColumnChunkMetaData]): ColStats = {
    var mn: Any = null
    var mx: Any = null
    var boundsOk = true // min/max remain provable
    var nulls = 0L
    var nullsOk = true // null count remains exact
    chunks.foreach { ch =>
      val st = ch.getStatistics
      if (st == null) { boundsOk = false; nullsOk = false }
      else {
        if (st.isNumNullsSet) nulls += st.getNumNulls else nullsOk = false
        if (st.hasNonNullValue) {
          (toSpark(dt, ch, st.genericGetMin.asInstanceOf[AnyRef]),
            toSpark(dt, ch, st.genericGetMax.asInstanceOf[AnyRef])) match {
            case (Some(lo), Some(hi)) =>
              if (mn == null || cmp(dt, lo, mn) < 0) mn = lo
              if (mx == null || cmp(dt, hi, mx) > 0) mx = hi
            case _ => boundsOk = false
          }
        } else if (!(st.isNumNullsSet && st.getNumNulls == ch.getValueCount)) {
          // no recorded values AND not provably all-null: stats were
          // dropped (oversized binary, INT96, legacy writer) — the
          // file's bounds are unknowable from the footer
          boundsOk = false
        }
      }
    }
    ColStats(if (boundsOk) mn else null, if (boundsOk) mx else null,
      if (nullsOk) Some(nulls) else None)
  }

  /** Parquet raw statistics value → Spark external value of `dt`.
    * None = unconvertible (caller degrades the file to unknown bounds). */
  private def toSpark(dt: DataType, ch: ColumnChunkMetaData,
                      raw: AnyRef): Option[Any] = {
    if (raw == null) return None
    val logical = ch.getPrimitiveType.getLogicalTypeAnnotation
    (dt, raw) match {
      case (ByteType, v: java.lang.Integer) => Some(v.byteValue())
      case (ShortType, v: java.lang.Integer) => Some(v.shortValue())
      case (IntegerType, v: java.lang.Integer) => Some(v)
      case (LongType, v: java.lang.Long) => Some(v)
      case (FloatType, v: java.lang.Float) =>
        if (v.isNaN) None else Some(v)
      case (DoubleType, v: java.lang.Double) =>
        if (v.isNaN) None else Some(v)
      case (BooleanType, v: java.lang.Boolean) => Some(v)
      case (StringType, v: Binary) =>
        Some(new String(v.getBytes, java.nio.charset.StandardCharsets.UTF_8))
      case (DateType, v: java.lang.Integer) =>
        Some(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.longValue)))
      case (TimestampType, v: java.lang.Long) =>
        microsOf(logical, v).map(javaTimestamp)
      case (TimestampNTZType, v: java.lang.Long) =>
        microsOf(logical, v).map { us =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        }
      case (d: DecimalType, v: java.lang.Integer) =>
        Some(java.math.BigDecimal.valueOf(v.longValue, d.scale))
      case (d: DecimalType, v: java.lang.Long) =>
        Some(java.math.BigDecimal.valueOf(v, d.scale))
      case (d: DecimalType, v: Binary) =>
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(v.getBytes), d.scale))
      case _ => None
    }
  }

  /** INT64 timestamp → micros, per the logical annotation's unit. INT96
    * never reaches here (its raw is Binary → toSpark returns None). */
  private def microsOf(logical: LogicalTypeAnnotation,
                       v: Long): Option[Long] = logical match {
    case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
      t.getUnit match {
        case LogicalTypeAnnotation.TimeUnit.MICROS => Some(v)
        case LogicalTypeAnnotation.TimeUnit.MILLIS =>
          Some(Math.multiplyExact(v, 1000L))
        case LogicalTypeAnnotation.TimeUnit.NANOS =>
          Some(Math.floorDiv(v, 1000L))
        case _ => None
      }
    case _ => None
  }

  private def javaTimestamp(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Ordering for merge — same orders [[ManifestPrune]] compares in
    * (strings in UTF8String binary order, everything else natural). */
  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case StringType =>
      UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }
}
