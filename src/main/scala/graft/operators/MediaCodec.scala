package graft.operators

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Real image codec for the multimodal pack — JDK `javax.imageio` (public
  * Java SE API; PNG read/write ships with every JDK, no external media libs).
  *
  * The engine's canonical image layout is 8-bit grayscale PNG: raw payload
  * bytes laid row-major into a `ceil(sqrt(n))`-wide grid (zero-padded tail).
  * PNG is lossless, so `decodePixels(encodePng(b)).take(b.length) == b` —
  * the law the codec spec pins and the q70/q71 oracles build on.
  *
  * All entry points are static and allocation-local, called from codegen'd
  * Catalyst expressions ([[PngEncode]]/[[PngPixels]]/[[PngResize]]/
  * [[GrayHist16]]) so decode stays inside the whole-stage-codegen span — the
  * same pattern as [[graft.functions.TextHashing]]. `ImageIO.read/write`
  * construct a fresh reader/writer per call: thread-safe under local[32] and
  * multi-executor alike.
  */
object MediaCodec {

  /** Grid width for an n-byte payload: ceil(sqrt(n)), min 1. */
  def gridW(n: Int): Int =
    math.max(math.ceil(math.sqrt(math.max(n, 0).toDouble)).toInt, 1)

  /** Grid height: ceil(n / w), min 1 (a 0-byte payload is a 1×1 black PNG). */
  def gridH(n: Int, w: Int): Int = math.max((math.max(n, 0) + w - 1) / w, 1)

  // Explicit MEMORY-cached image streams on both paths: the
  // `ImageIO.read/write(File|stream)` conveniences default to a DISK-backed
  // stream cache — a temp file created and deleted per call — which
  // serializes a 32-thread decode stage on filesystem contention (measured
  // 0.074 → 0.016 ms/call effective at 32 threads when bypassed). Passing
  // Memory*ImageStream directly sidesteps the cache without touching the
  // process-global `ImageIO.setUseCache` toggle (a library shouldn't).
  private def writePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream(img.getWidth * img.getHeight / 2 + 64)
    val ios = new MemoryCacheImageOutputStream(bos)
    try require(ImageIO.write(img, "png", ios), "no PNG writer available")
    finally ios.close()
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload to a BufferedImage (memory-cached
    * stream; `ImageIO.read(ImageInputStream)` closes it after reading). */
  private def readImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(
      new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
    require(img != null, "not a decodable image payload")
    img
  }

  /** Encode raw bytes as a real grayscale PNG (one pixel per byte). */
  def encodePng(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    val w = gridW(n); val h = gridH(n, w)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    System.arraycopy(bytes, 0, data, 0, n)
    writePng(img)
  }

  /** Decode a PNG to row-major 8-bit gray samples, one byte per pixel.
    * Raster sample access (not `getRGB`) — no colorspace conversion, so the
    * round-trip with [[encodePng]] is bit-exact. */
  def decodePixels(png: Array[Byte]): Array[Byte] = {
    val img = readImage(png)
    val w = img.getWidth; val h = img.getHeight
    val samples = img.getRaster.getSamples(0, 0, w, h, 0, new Array[Int](w * h))
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) { out(i) = samples(i).toByte; i += 1 }
    out
  }

  /** Nearest-neighbor resample to newW×newH, re-encoded as PNG. Pure integer
    * sample mapping (`src = floor(dst·srcDim/dstDim)`) — deterministic, no
    * Graphics2D interpolation pipeline. */
  def resizePng(png: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    require(newW > 0 && newH > 0, "resize dims must be positive")
    val img = readImage(png)
    val sw = img.getWidth; val sh = img.getHeight
    val src = img.getRaster.getSamples(0, 0, sw, sh, 0, new Array[Int](sw * sh))
    val out = new BufferedImage(newW, newH, BufferedImage.TYPE_BYTE_GRAY)
    val data = out.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var y = 0
    while (y < newH) {
      val sy = math.min((y.toLong * sh / newH).toInt, sh - 1)
      var x = 0
      while (x < newW) {
        val sx = math.min((x.toLong * sw / newW).toInt, sw - 1)
        data(y * newW + x) = src(sy * sw + sx).toByte
        x += 1
      }
      y += 1
    }
    writePng(out)
  }

  /** 64-bit average-hash (aHash) over the first `nBytes` decoded pixels,
    * returned as [hi32, lo32] non-negative int64s (a single int64 would
    * need the sign bit; two halves keep every engine's integer semantics
    * trivially exact). Block b of 64 covers payload bytes
    * [⌊b·n/64⌋, ⌊(b+1)·n/64⌋); bit b = 1 iff the block mean ≥ the global
    * mean, compared in exact integers (sum_b·n ≥ total·len_b); empty
    * blocks (n < 64) yield 0. A pure function of the payload bytes, so
    * the DuckDB oracle reproduces it from the source characters. */
  def aHash64(pixels: Array[Byte], nBytes: Int): ArrayData = {
    val n = math.min(math.max(nBytes, 0), pixels.length)
    var total = 0L
    var i = 0
    while (i < n) { total += (pixels(i) & 0xff); i += 1 }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 64) {
      val start = (b.toLong * n / 64).toInt
      val end = ((b + 1).toLong * n / 64).toInt
      var s = 0L
      var j = start
      while (j < end) { s += (pixels(j) & 0xff); j += 1 }
      // 128-bit exact compare of s·n vs total·len: both products approach
      // 255·n²/64 and overflow a signed long beyond ~1.5 GB payloads, so
      // compare (high, low) halves via multiplyHigh instead of s*n directly
      if (end > start && geUnsigned128(s, n, total, (end - start).toLong)) {
        if (b < 32) hi |= 1L << (31 - b) else lo |= 1L << (63 - b)
      }
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }

  /** 64-bit GRADIENT hash (dHash) over the first `nBytes` decoded pixels,
    * returned as [hi32, lo32] like [[aHash64]] so the banded-Hamming
    * machinery applies unchanged. Block b of 64 covers payload bytes
    * [⌊b·n/64⌋, ⌊(b+1)·n/64⌋); bit b = 1 iff mean(block b) is STRICTLY
    * greater than mean(block (b+1) mod 64) — the circular
    * difference-of-neighbors signature, compared in exact 128-bit integers
    * (sum_b·len_b2 > sum_b2·len_b). Empty blocks (n < 64) yield 0. Where
    * [[aHash64]] captures the LEVEL envelope (mean vs global), dHash
    * captures the temporal GRADIENT — invariant under global
    * brightness/volume shifts, which level hashes are not. A pure function
    * of the payload, so the DuckDB oracle replays it (q204). */
  def dHash64(pixels: Array[Byte], nBytes: Int): ArrayData = {
    val n = math.min(math.max(nBytes, 0), pixels.length)
    val sums = new Array[Long](64)
    val lens = new Array[Long](64)
    var b = 0
    while (b < 64) {
      val start = (b.toLong * n / 64).toInt
      val end = ((b + 1).toLong * n / 64).toInt
      var s = 0L
      var j = start
      while (j < end) { s += (pixels(j) & 0xff); j += 1 }
      sums(b) = s; lens(b) = (end - start).toLong
      b += 1
    }
    var hi = 0L
    var lo = 0L
    b = 0
    while (b < 64) {
      val b2 = (b + 1) & 63
      // strict a/l_a > c/l_c  ⇔  !(c·l_a ≥ a·l_c)
      if (lens(b) > 0 && lens(b2) > 0 &&
          !geUnsigned128(sums(b2), lens(b), sums(b), lens(b2))) {
        if (b < 32) hi |= 1L << (31 - b) else lo |= 1L << (63 - b)
      }
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }

  /** a·b >= c·d over non-negative longs, exact at 128 bits (no overflow).
    * Shared with [[AudioCodec.aHash64]], whose Σ|s|·n products overflow
    * int64 past ~50 min of mono 44.1 kHz audio. */
  private[operators] def geUnsigned128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) >= 0
  }

  /** Shot-boundary census over the DECODED pixel stream treated as a video
    * frame sequence: frame f of F covers payload pixels
    * [⌊f·n/F⌋, ⌊(f+1)·n/F⌋) (the aHash block rule, so frames tile the
    * payload exactly). A boundary fires between consecutive NON-EMPTY
    * frames whose means differ by ≥ `thresh` gray levels, compared in
    * exact integers: |sum_f·L_{f−1} − sum_{f−1}·L_f| ≥ thresh·L_f·L_{f−1}
    * (products ≤ 255·n² — exact in int64 for payloads < ~190 MB, far past
    * any per-row video chunk this census would see). Shots are the
    * boundary-delimited frame runs. Returns
    * (n_frames, n_shots, longest_shot [frames; ties → earliest],
    * key_frame = ⌊(start+end)/2⌋ of the longest shot, key_byte = that
    * frame's first payload pixel) — a pure function of the payload, so the
    * DuckDB oracle replays it from the source characters (q203). */
  def videoShots(png: Array[Byte], nBytes: Int, nFrames: Int, thresh: Int): InternalRow = {
    val pixels = decodePixels(png)
    val n = math.min(math.max(nBytes, 0), pixels.length)
    val f = math.max(nFrames, 1)
    if (n <= 0) return InternalRow(0L, 0L, 0L, 0L, 0L)
    val sums = new Array[Long](f)
    val lens = new Array[Long](f)
    var fi = 0
    while (fi < f) {
      val s = (fi.toLong * n / f).toInt
      val e = ((fi + 1).toLong * n / f).toInt
      var acc = 0L
      var j = s
      while (j < e) { acc += (pixels(j) & 0xff); j += 1 }
      sums(fi) = acc; lens(fi) = (e - s).toLong
      fi += 1
    }
    var nShots = 1L
    var runStart = 0
    var bestLen = 0L; var bestStart = 0; var bestEnd = 0
    def closeRun(endExcl: Int): Unit = {
      val len = (endExcl - runStart).toLong
      if (len > bestLen) { bestLen = len; bestStart = runStart; bestEnd = endExcl - 1 }
    }
    var i = 1
    while (i < f) {
      val boundary = lens(i) > 0 && lens(i - 1) > 0 &&
        math.abs(sums(i) * lens(i - 1) - sums(i - 1) * lens(i)) >=
          thresh.toLong * lens(i) * lens(i - 1)
      if (boundary) { closeRun(i); nShots += 1L; runStart = i }
      i += 1
    }
    closeRun(f)
    val keyFrame = (bestStart + bestEnd) / 2
    val keyByte = (pixels((keyFrame.toLong * n / f).toInt) & 0xff).toLong
    InternalRow(f.toLong, nShots, bestLen, keyFrame.toLong, keyByte)
  }

  /** 16-bucket histogram (bucket = pixel >> 4) over the first `nBytes`
    * pixels — padding pixels beyond the payload are excluded, so counts are
    * a pure function of the original bytes (what the DuckDB oracle computes
    * from the text characters). Exact int64 counts. */
  def hist16(pixels: Array[Byte], nBytes: Int): ArrayData = {
    val counts = new Array[Long](16)
    val n = math.min(math.max(nBytes, 0), pixels.length)
    var i = 0
    while (i < n) {
      counts((pixels(i) & 0xff) >> 4) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** binary → binary: raw payload bytes rendered as a grayscale PNG. */
case class PngEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_png_encode requires a binary input")
  override def nullSafeEval(b: Any): Any =
    MediaCodec.encodePng(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MediaCodec.encodePng($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_png_encode"
}

/** binary → binary: PNG decoded to row-major 8-bit gray pixels. */
case class PngPixels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_png_pixels requires a binary input")
  override def nullSafeEval(b: Any): Any =
    MediaCodec.decodePixels(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MediaCodec.decodePixels($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_png_pixels"
}

/** (binary, int, int) → binary: nearest-neighbor PNG resize. */
case class PngResize(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_png_resize(png binary, w int, h int)")
  override def nullSafeEval(b: Any, w: Any, h: Any): Any =
    MediaCodec.resizePng(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, w, h) => s"graft.operators.MediaCodec.resizePng($b, $w, $h)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "graft_png_resize"
}

/** (binary pixels, int nBytes) → array<long>: 16-bucket gray histogram. */
case class GrayHist16(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_gray_hist16(pixels binary, n_bytes int)")
  override def nullSafeEval(p: Any, n: Any): Any =
    MediaCodec.hist16(p.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, n) => s"graft.operators.MediaCodec.hist16($p, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_gray_hist16"
}

/** (binary pixels, int nBytes) → array<long> [hi32, lo32]: 64-bit aHash. */
case class AHash64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ahash64(pixels binary, n_bytes int)")
  override def nullSafeEval(p: Any, n: Any): Any =
    MediaCodec.aHash64(p.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, n) => s"graft.operators.MediaCodec.aHash64($p, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_ahash64"
}

/** Column-API faces of the media expressions. */
/** (pixels binary, n_bytes int) → array<long>: 64-bit temporal-gradient
  * hash [hi32, lo32] ([[MediaCodec.dHash64]]). */
case class DHash64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_dhash64(pixels binary, n_bytes int)")
  override def nullSafeEval(p: Any, n: Any): Any =
    MediaCodec.dHash64(p.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, n) => s"graft.operators.MediaCodec.dHash64($p, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dhash64"
}

/** (png binary, n_bytes int, n_frames int) → struct: shot-boundary census
  * ([[MediaCodec.videoShots]]); the boundary threshold is a literal plan
  * parameter. One fused pass per row — decode, frame sums, run walk. */
case class VideoShots(first: Expression, second: Expression, third: Expression,
                      thresh: Int) extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("n_shots", LongType, nullable = false),
    StructField("longest_shot", LongType, nullable = false),
    StructField("key_frame", LongType, nullable = false),
    StructField("key_byte", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
        third.dataType == IntegerType && thresh >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_video_shots(png binary, n_bytes int, n_frames int) with thresh >= 0")
  override def nullSafeEval(p: Any, n: Any, f: Any): Any =
    MediaCodec.videoShots(p.asInstanceOf[Array[Byte]], n.asInstanceOf[Int],
      f.asInstanceOf[Int], thresh)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, n, f) => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
        graft.operators.MediaCodec.videoShots($p, $n, $f, $thresh);""")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "graft_video_shots"
}

object MediaExprs {
  def pngEncode(raw: Column): Column = Bridge.column(PngEncode(Bridge.expression(raw)))
  def aHash64(pixels: Column, nBytes: Column): Column =
    Bridge.column(AHash64(Bridge.expression(pixels), Bridge.expression(nBytes)))
  def pngPixels(png: Column): Column = Bridge.column(PngPixels(Bridge.expression(png)))
  def pngResize(png: Column, w: Column, h: Column): Column =
    Bridge.column(PngResize(Bridge.expression(png), Bridge.expression(w), Bridge.expression(h)))
  def grayHist16(pixels: Column, nBytes: Column): Column =
    Bridge.column(GrayHist16(Bridge.expression(pixels), Bridge.expression(nBytes)))
  def dHash64(pixels: Column, nBytes: Column): Column =
    Bridge.column(DHash64(Bridge.expression(pixels), Bridge.expression(nBytes)))
  def videoShots(png: Column, nBytes: Column, nFrames: Column, thresh: Int): Column =
    Bridge.column(VideoShots(Bridge.expression(png), Bridge.expression(nBytes),
      Bridge.expression(nFrames), thresh))
}
