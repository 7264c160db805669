package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star pack).
  *
  * Media (image/audio/video) are opaque `binary` columns plus a typed
  * metadata struct. The Spark-side plumbing — schema, batch iteration,
  * partition-level processing, output shape — is real and tested; the actual
  * codec step is STUBBED (media libraries are not in this container) behind
  * [[decodeStub]]: a clearly-marked deterministic fake that derives "features"
  * from the raw bytes. Swapping in a real decoder means replacing only the
  * body of the stub; every schema/partitioning decision stays.
  *
  * Scale: decode runs per-partition with batch amortization (mapPartitions),
  * no shuffle. At 100 TB the binary payloads dominate I/O — partition sizing
  * comes from `spark.sql.files.maxPartitionBytes`, and decode-heavy stages
  * should be repartitioned to core count before the map, never after.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Attach a binary payload + metadata struct from a string column (the
    * fixture corpus has no real media; text bytes stand in as payload).
    * Frame count uses explicit floor() so the oracle's integer semantics
    * match exactly (DuckDB CAST rounds; floor-then-cast truncates in both). */
  def asMedia(df: DataFrame, srcCol: String, mediaType: String): DataFrame =
    df.withColumn("media_bytes", encode(col(srcCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        (length(col(srcCol)) % 1024).cast(IntegerType).as("width"),
        (length(col(srcCol)) % 768).cast(IntegerType).as("height"),
        greatest(floor(length(col(srcCol)) / lit(100.0)).cast(IntegerType), lit(1))
          .as("n_frames")))

  /** STUB decode: deterministic fake "decoded frame" = (frame index, byte at
    * a fixed stride, rolling checksum over all bytes seeded by the frame
    * index). A real implementation would decode `media_bytes` with an
    * image/audio codec here — *** STUB: the container has no media libs;
    * everything around it (schema, batching, partitioning) is real. *** */
  def decodeStub(bytes: Array[Byte], nFrames: Int): Seq[(Int, Int, Long)] = {
    if (bytes.isEmpty) return Seq((0, 0, 0L))
    val stride = math.max(bytes.length / math.max(nFrames, 1), 1)
    (0 until nFrames).map { f =>
      val b = java.lang.Byte.toUnsignedInt(bytes((f * stride) % bytes.length))
      val checksum = bytes.foldLeft(f.toLong)(
        (acc, x) => (acc * 31 + java.lang.Byte.toUnsignedInt(x)) % 1000000007L)
      (f, b, checksum)
    }
  }

  /** STUB feature extraction: 16-dim "embedding" = normalized 16-bucket byte
    * histogram. *** STUB: a real implementation decodes pixels/samples and
    * runs a feature model here; schema (array<float>) and the
    * partition-local batch loop are the real plumbing. *** */
  def featureStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist(java.lang.Byte.toUnsignedInt(bytes(i)) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { hist(j) /= bytes.length; j += 1 }
    hist
  }

  /** Feature extraction over media rows: (id, media_bytes) → (id,
    * features array<float>). Runs per-partition, no shuffle; output feeds the
    * [[Similarity]] pack directly (same Array[Float] embedding shape). */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bytesIdx = df.schema.fieldIndex("media_bytes")
    val outSchema = StructType(Seq(
      df.schema.fields(idIdx),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        Row(row.get(idIdx), featureStub(row.getAs[Array[Byte]](bytesIdx)).toSeq)
      }
    }
  }

  /** STUB resize: updates width/height metadata and truncates the payload to
    * the implied byte budget. *** STUB: a real implementation re-encodes
    * pixels; the metadata/schema contract is the real plumbing. *** */
  def resize(df: DataFrame, newW: Int, newH: Int): DataFrame =
    df.withColumn("media_meta", struct(
        col("media_meta.media_type").as("media_type"),
        lit(newW).as("width"), lit(newH).as("height"),
        col("media_meta.n_frames").as("n_frames")))
      .withColumn("media_bytes",
        expr(s"substring(media_bytes, 1, greatest($newW * $newH / 256, 1))"))

  /** Frame sampling: decode each media row into frame rows (1 → N) with
    * partition-local batching. Output: (id, frame_idx, sample_byte, checksum). */
  def sampleFrames(df: DataFrame, idCol: String, everyN: Int = 1): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bytesIdx = df.schema.fieldIndex("media_bytes")
    val metaIdx = df.schema.fieldIndex("media_meta")
    val outSchema = StructType(Seq(
      df.schema.fields(idIdx),
      StructField("frame_idx", IntegerType),
      StructField("sample_byte", IntegerType),
      StructField("checksum", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](bytesIdx)
        val nFrames = row.getStruct(metaIdx).getInt(3)
        decodeStub(bytes, nFrames).zipWithIndex.collect {
          case ((f, b, c), i) if i % everyN == 0 =>
            Row(row.get(idIdx), f, b, c)
        }
      }
    }
  }
}
