package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column operators (north-star pack).
  *
  * Media (image/audio/video) are opaque `binary` columns plus a typed
  * metadata struct. The image path is REAL end to end: [[asMedia]] renders
  * the payload as an actual grayscale PNG ([[MediaCodec.encodePng]], JDK
  * `javax.imageio`), and every downstream operator — frame sampling, feature
  * extraction, resize — runs on genuinely decoded pixels
  * ([[MediaCodec.decodePixels]]). The canonical layout (payload bytes laid
  * row-major into a ceil-sqrt grid, PNG being lossless) makes decoded pixels
  * a pure function of the source bytes, which is what lets the DuckDB oracle
  * check frame samples (q70) and histogram features (q71) bit-exactly.
  *
  * Scale: encode/decode/features are per-row codegen'd expressions or
  * per-partition maps — no shuffle anywhere in the pack. At 100 TB the
  * binary payloads dominate I/O: partition sizing comes from
  * `spark.sql.files.maxPartitionBytes`, and decode-heavy stages should be
  * repartitioned to core count before the map, never after.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_bytes", IntegerType)))

  /** Attach a real PNG payload + metadata struct from a string column (the
    * fixture corpus has no media files; text bytes are the pixel source).
    * width/height mirror [[MediaCodec.gridW]]/[[MediaCodec.gridH]] in SQL
    * (`ceil(sqrt(n))` / `ceil(n/w)` on small ints — exact in double);
    * MultimodalSpec asserts they equal the decoded image's dimensions.
    * Frame count uses explicit floor() so the oracle's integer semantics
    * match exactly (DuckDB CAST rounds; floor-then-cast truncates in both). */
  def asMedia(df: DataFrame, srcCol: String, mediaType: String): DataFrame = {
    val raw = encode(col(srcCol), "UTF-8")
    val nb = length(raw).cast(IntegerType)
    val w = greatest(ceil(sqrt(nb.cast(DoubleType))).cast(IntegerType), lit(1))
    val h = greatest(ceil(nb.cast(DoubleType) / w.cast(DoubleType)).cast(IntegerType), lit(1))
    df.withColumn("media_bytes", MediaExprs.pngEncode(raw))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        w.as("width"), h.as("height"),
        greatest(floor(length(col(srcCol)) / lit(100.0)).cast(IntegerType), lit(1))
          .as("n_frames"),
        nb.as("n_bytes")))
  }

  /** Audio sibling of [[asMedia]]: render the payload as a real PCM WAV
    * ([[AudioCodec.encodeWav]], JDK `javax.sound.sampled`) — one 16-bit
    * sample per payload byte at 8 kHz mono. n_frames counts 20 ms windows
    * (160 samples); width/height are meaningless for audio and set 0. */
  def asAudio(df: DataFrame, srcCol: String): DataFrame = {
    val raw = encode(col(srcCol), "UTF-8")
    val nb = length(raw).cast(IntegerType)
    df.withColumn("media_bytes", AudioExprs.wavEncode(raw))
      .withColumn("media_meta", struct(
        lit("audio").as("media_type"),
        lit(0).as("width"), lit(0).as("height"),
        greatest(floor(nb.cast(DoubleType) / lit(160.0)).cast(IntegerType), lit(1))
          .as("n_frames"),
        nb.as("n_bytes")))
  }

  /** Track statistics over DECODED WAV samples (real `AudioSystem` parse):
    * (id, n_samples, max_abs, energy, sum_s) — integer-exact, so the DuckDB
    * oracle (q72) checks them bit-for-bit from the source characters. */
  def audioStats(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), AudioExprs.wavStats(col("media_bytes")).as("__s"))
      .select(col(idCol), col("__s.n_samples").as("n_samples"),
        col("__s.max_abs").as("max_abs"), col("__s.energy").as("energy"),
        col("__s.sum_s").as("sum_s"))

  /** Frame extraction over DECODED pixels: frame f samples the pixel at a
    * fixed stride and carries a rolling checksum over the payload pixels
    * seeded by the frame index (padding pixels beyond `nBytes` excluded —
    * they are grid fill, not payload). */
  def decodeFrames(pixels: Array[Byte], nBytes: Int, nFrames: Int): Seq[(Int, Int, Long)] = {
    if (nBytes <= 0) return Seq((0, 0, 0L))
    val stride = math.max(nBytes / math.max(nFrames, 1), 1)
    // One pass over the payload computes the seed-0 checksum C and 31^n mod p;
    // a rolling hash seeded by f is congruent to f·31^n + C (mod p), so each
    // frame's checksum derives in O(1) instead of re-folding all nBytes per
    // frame (O(nFrames·nBytes) → O(nBytes + nFrames) per row). Values are
    // unchanged — mod distributes over the fold — so the q70 oracle (which
    // spells out the per-frame fold) still matches bit-for-bit.
    val P = 1000000007L
    var c0 = 0L
    var pow31n = 1L
    var i = 0
    while (i < nBytes) {
      c0 = (c0 * 31 + java.lang.Byte.toUnsignedInt(pixels(i))) % P
      pow31n = (pow31n * 31) % P
      i += 1
    }
    (0 until nFrames).map { f =>
      val b = java.lang.Byte.toUnsignedInt(pixels((f * stride) % nBytes))
      (f, b, (f.toLong % P * pow31n + c0) % P)
    }
  }

  /** Feature extraction over media rows: (id, media_bytes, media_meta) →
    * (id, features array<float>) where features is the normalized 16-bucket
    * gray histogram of the decoded image. Fully columnar — PNG decode and
    * histogram are codegen'd expressions ([[MediaExprs]]), so the stage has
    * no shuffle and stays inside whole-stage codegen. Output feeds the
    * [[Similarity]] pack directly (same Array[Float] embedding shape). */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val nb = col("media_meta.n_bytes")
    val hist = MediaExprs.grayHist16(MediaExprs.pngPixels(col("media_bytes")), nb)
    df.select(col(idCol),
      transform(hist, c =>
          (c.cast(DoubleType) / greatest(nb, lit(1)).cast(DoubleType)).cast(FloatType))
        .as("features"))
  }

  /** Exact integer histogram counts (the oracle-checkable face of
    * [[extractFeatures]]): (id, hist array<long>) over decoded pixels. */
  def histogram16(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
      MediaExprs.grayHist16(MediaExprs.pngPixels(col("media_bytes")),
        col("media_meta.n_bytes")).as("hist"))

  /** Image near-dup candidates by PERCEPTUAL hash: 64-bit aHash over the
    * decoded pixels ([[MediaExprs.aHash64]], codegen'd — block-mean bits,
    * robust to re-encoding), then 4×16-bit BANDED Hamming blocking (any
    * shared band → candidate; a pair within Hamming distance d survives
    * banding with certainty when d < 4 by pigeonhole) and an exact
    * `bit_count(xor)` verify ≤ `maxDist`. The image twin of the MinHash
    * LSH text path: candidates come from equi-joins on (band, sig), never
    * an all-pairs scan; the hash is 16 bytes per image, so the join state
    * is tiny regardless of image payload size. */
  def phashPairs(media: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    // localCheckpoint: the self-join below reads the hash table TWICE, and
    // without materialization each side would re-run the PNG decode + aHash
    // pipeline per image (the q171 re-evaluation trap). The checkpoint holds
    // 16 bytes + id per image — negligible at any corpus size — and the
    // codec runs exactly once.
    val h = media.select(col(idCol),
        MediaExprs.aHash64(MediaExprs.pngPixels(col("media_bytes")),
          col("media_meta.n_bytes")).as("__h"))
      .select(col(idCol).as("id"), col("__h")(0).as("hi"), col("__h")(1).as("lo"))
      .localCheckpoint()
    hamming64Pairs(h, maxDist)
  }

  /** Audio near-dup candidates by ACOUSTIC fingerprint — the audio member
    * of the perceptual-dedup family (q170's image aHash, q31's text
    * MinHash): real WAV decode → 64-bit energy-envelope hash
    * ([[AudioExprs.wavAHash64]], block-mean bits over |s|) → the same
    * banded-Hamming blocking + exact verify. 16 bytes per track however
    * long the audio; candidates from (band, sig) equi-joins, never
    * all-pairs. */
  def audioFingerprintPairs(media: DataFrame, idCol: String,
                            maxDist: Int): DataFrame = {
    val h = media.select(col(idCol),
        AudioExprs.wavAHash64(col("media_bytes")).as("__h"))
      .select(col(idCol).as("id"), col("__h")(0).as("hi"), col("__h")(1).as("lo"))
      .localCheckpoint() // decode once — the phashPairs discipline
    hamming64Pairs(h, maxDist)
  }

  /** Video near-dup candidates by TEMPORAL-GRADIENT fingerprint — the
    * video member of the perceptual-dedup family (text MinHash q31, image
    * aHash q170, audio envelope q200): the payload's decoded pixel stream
    * as a fixed-rate temporal signal → 64-bit circular difference hash
    * ([[MediaExprs.dHash64]], bit b = block-b mean strictly above its
    * successor's — invariant under global brightness shifts, which the
    * LEVEL hashes of q170/q200 are not) → the same banded-Hamming blocking
    * + exact verify. 16 bytes per video however long the stream. */
  def videoDhashPairs(media: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val h = media.select(col(idCol),
        MediaExprs.dHash64(MediaExprs.pngPixels(col("media_bytes")),
          col("media_meta.n_bytes")).as("__h"))
      .select(col(idCol).as("id"), col("__h")(0).as("hi"), col("__h")(1).as("lo"))
      .localCheckpoint() // decode once — the phashPairs discipline
    hamming64Pairs(h, maxDist)
  }

  /** Shared tail of the perceptual-dedup family: (id, hi, lo) 64-bit
    * hashes → 4×16-bit banded blocking (any shared band → candidate; d < 4
    * survives with certainty by pigeonhole) → exact bit_count(xor) verify
    * ≤ maxDist. */
  private def hamming64Pairs(h: DataFrame, maxDist: Int): DataFrame = {
    val bands = h.select(col("id"), col("hi"), col("lo"),
        explode(array(
          struct(lit(1).as("band"),
            shiftright(col("hi"), 16).bitwiseAND(lit(65535L)).as("sig")),
          struct(lit(2).as("band"), col("hi").bitwiseAND(lit(65535L)).as("sig")),
          struct(lit(3).as("band"),
            shiftright(col("lo"), 16).bitwiseAND(lit(65535L)).as("sig")),
          struct(lit(4).as("band"), col("lo").bitwiseAND(lit(65535L)).as("sig"))))
          .as("__b"))
      .select(col("id"), col("hi"), col("lo"),
        col("__b.band").as("band"), col("__b.sig").as("sig"))
    val a = bands.select(col("band"), col("sig"), col("id").as("id_a"),
      col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = bands.select(col("band"), col("sig"), col("id").as("id_b"),
      col("hi").as("hi_b"), col("lo").as("lo_b"))
    a.join(b, Seq("band", "sig")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Real resize: nearest-neighbor resample of the decoded image re-encoded
    * as PNG ([[MediaCodec.resizePng]]), with the metadata struct updated to
    * the new geometry (payload now fills the whole grid → n_bytes = w·h). */
  def resize(df: DataFrame, newW: Int, newH: Int): DataFrame =
    df.withColumn("media_bytes",
        MediaExprs.pngResize(col("media_bytes"), lit(newW), lit(newH)))
      .withColumn("media_meta", struct(
        col("media_meta.media_type").as("media_type"),
        lit(newW).as("width"), lit(newH).as("height"),
        col("media_meta.n_frames").as("n_frames"),
        lit(newW * newH).as("n_bytes")))

  /** Frame sampling: decode each media row's PNG into frame rows (1 → N)
    * with partition-local batching (mapPartitions — the decode is real
    * `ImageIO` work per row; no shuffle). Output:
    * (id, frame_idx, sample_byte, checksum). */
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
        val meta = row.getStruct(metaIdx)
        val nFrames = meta.getInt(3)
        val nBytes = meta.getInt(4)
        val pixels = MediaCodec.decodePixels(row.getAs[Array[Byte]](bytesIdx))
        decodeFrames(pixels, nBytes, nFrames).zipWithIndex.collect {
          case ((f, b, c), i) if i % everyN == 0 =>
            Row(row.get(idIdx), f, b, c)
        }
      }
    }
  }
}
