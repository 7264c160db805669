package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Real audio codec for the multimodal pack — JDK `javax.sound.sampled`
  * (public Java SE API; WAV/PCM read-write ships with every JDK, the audio
  * sibling of [[MediaCodec]]'s `javax.imageio`).
  *
  * Canonical layout: 16-bit signed PCM, mono, 8 kHz, little-endian — one
  * sample per payload byte, `sample = (byte − 128) << 8` (centered,
  * trivially invertible). PCM in a WAV container is lossless, so
  * `decodeSamples(encodeWav(b))` recovers exactly the mapped samples — the
  * law AudioSpec pins and the q72 oracle builds on: every decoded-sample
  * statistic is a pure function of the source bytes, which DuckDB computes
  * from the text characters.
  *
  * Static, allocation-local entry points called from codegen'd expressions
  * ([[WavEncode]]/[[WavStats]]) — same pattern as [[MediaCodec]]. All
  * streams are in-memory (`AudioSystem` has no disk-cache trap).
  */
object AudioCodec {

  val SampleRate = 8000f

  private def pcmFormat: AudioFormat =
    new AudioFormat(SampleRate, 16, 1, true, false) // signed, little-endian

  /** Encode raw payload bytes as a real WAV file (RIFF header + PCM data).
    *
    * Composes the canonical 44-byte RIFF/WAVE header + PCM data directly —
    * BYTE-IDENTICAL to what `AudioSystem.write(..., Type.WAVE, ...)` emits
    * for this format (AudioSpec pins the identity against [[encodeWavRef]]).
    * The direct compose exists because `AudioSystem.write` walks the audio
    * provider registry and re-negotiates the target format PER CALL — at
    * ~1 ms+ a call it dominated the per-row audio kernels (q72 measured
    * ~4 s steady for 5 000 rows; the codec, not the arithmetic, was the
    * cost — optimization guide §1.2 step 2). */
  def encodeWav(bytes: Array[Byte]): Array[Byte] = {
    val dataLen = bytes.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put4(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put2(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); put4(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put4(16, 16)
    put2(20, 1) // PCM
    put2(22, 1) // mono
    put4(24, SampleRate.toInt) // 8000 Hz
    put4(28, SampleRate.toInt * 2) // byte rate (16-bit mono)
    put2(32, 2) // block align
    put2(34, 16) // bits per sample
    tag(36, "data"); put4(40, dataLen)
    var i = 0
    while (i < bytes.length) {
      val s = ((bytes(i) & 0xff) - 128) << 8
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Reference encoder via `javax.sound.sampled.AudioSystem` — the law
    * anchor: AudioSpec asserts `encodeWav` is byte-identical to this for
    * every payload shape, so the hot path stays a REAL WAV container. */
  def encodeWavRef(bytes: Array[Byte]): Array[Byte] = {
    val data = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val s = ((bytes(i) & 0xff) - 128) << 8
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), pcmFormat, bytes.length.toLong)
    val bos = new ByteArrayOutputStream(data.length + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload to its 16-bit signed samples.
    *
    * Real RIFF chunk walk (not a fixed-offset shortcut): verifies the
    * RIFF/WAVE magic, locates `fmt ` (requires 16-bit mono PCM — the same
    * contract [[decodeSamplesRef]] enforces) and `data`, honoring the
    * odd-size pad byte the RIFF spec mandates between chunks. Direct parse
    * for the same reason as [[encodeWav]]: `AudioSystem
    * .getAudioInputStream` probes every registered provider per call;
    * AudioSpec pins sample-exact agreement with the `AudioSystem` path. */
  def decodeSamples(wav: Array[Byte]): Array[Int] = {
    require(wav.length >= 12 &&
      wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
      "not a RIFF/WAVE payload")
    def u2(off: Int): Int = (wav(off) & 0xff) | ((wav(off + 1) & 0xff) << 8)
    def u4(off: Int): Int = u2(off) | (u2(off + 2) << 16)
    var pos = 12
    var fmtOk = false
    while (pos + 8 <= wav.length) {
      val size = u4(pos + 4)
      val isFmt = wav(pos) == 'f' && wav(pos + 1) == 'm' && wav(pos + 2) == 't' &&
        wav(pos + 3) == ' '
      val isData = wav(pos) == 'd' && wav(pos + 1) == 'a' && wav(pos + 2) == 't' &&
        wav(pos + 3) == 'a'
      if (isFmt) {
        val audioFormat = u2(pos + 8)
        val channels = u2(pos + 10)
        val bits = u2(pos + 22)
        require(audioFormat == 1 && bits == 16 && channels == 1,
          s"expected 16-bit mono PCM, got format=$audioFormat channels=$channels bits=$bits")
        fmtOk = true
      } else if (isData) {
        require(fmtOk, "RIFF data chunk before fmt chunk")
        val n = math.min(size, wav.length - pos - 8) / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          // little-endian: low byte unsigned, high byte carries the sign
          out(i) = (wav(pos + 8 + 2 * i) & 0xff) | (wav(pos + 8 + 2 * i + 1).toInt << 8)
          i += 1
        }
        return out
      }
      pos += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    throw new IllegalArgumentException("RIFF/WAVE payload has no data chunk")
  }

  /** Reference decoder via `AudioSystem` (provider-negotiated parse) — the
    * law anchor for [[decodeSamples]]; kept for AudioSpec only. */
  def decodeSamplesRef(wav: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val data = ais.readAllBytes()
      val out = new Array[Int](data.length / 2)
      var i = 0
      while (i < out.length) {
        // little-endian: low byte unsigned, high byte carries the sign
        out(i) = (data(2 * i) & 0xff) | (data(2 * i + 1).toInt << 8)
        i += 1
      }
      out
    } finally ais.close()
  }

  /** Kernel for [[WavSegments]]: run-length census of |s| ≥ threshold over
    * the decoded samples — (n_segments, n_active, longest), exact int64. */
  def segments(wav: Array[Byte], threshold: Int): InternalRow = {
    val s = decodeSamples(wav)
    var nSeg = 0L; var nAct = 0L; var longest = 0L; var run = 0L
    var i = 0
    while (i < s.length) {
      if (math.abs(s(i)) >= threshold) {
        if (run == 0L) nSeg += 1L
        run += 1L; nAct += 1L
        if (run > longest) longest = run
      } else run = 0L
      i += 1
    }
    InternalRow(nSeg, nAct, longest)
  }

  /** 64-bit acoustic fingerprint over the DECODED samples — the audio
    * analog of [[MediaCodec.aHash64]]: block b of 64 covers samples
    * [⌊b·n/64⌋, ⌊(b+1)·n/64⌋); bit b = 1 iff the block's mean |s| ≥ the
    * track's mean |s|, compared in exact integers (sum_b·n ≥ total·len_b,
    * evaluated at 128 bits via [[MediaCodec.geUnsigned128]] — Σ|s| ≤ 2¹⁵·n
    * makes the products ~2⁹·n², which overflows int64 past ~1.3e8 samples
    * (≈50 min of mono 44.1 kHz: podcasts, DJ sets), so 64-bit products
    * would silently flip envelope bits on long-form audio; the 128-bit
    * compare is exact for any n). Returned as [hi32, lo32] non-negative int64s with
    * bit b at position 31−b / 63−b (the aHash layout, so the banded
    * Hamming machinery applies unchanged). The energy ENVELOPE shape,
    * robust to re-encoding/amplitude-preserving edits; a pure function of
    * the samples, so the DuckDB oracle reproduces it from the source
    * characters. */
  def aHash64(wav: Array[Byte]): ArrayData = {
    val s = decodeSamples(wav)
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) { total += math.abs(s(i)); i += 1 }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 64) {
      val start = (b.toLong * n / 64).toInt
      val end = ((b + 1).toLong * n / 64).toInt
      var bs = 0L
      var j = start
      while (j < end) { bs += math.abs(s(j)); j += 1 }
      if (end > start &&
          MediaCodec.geUnsigned128(bs, n.toLong, total, (end - start).toLong)) {
        if (b < 32) hi |= 1L << (31 - b) else lo |= 1L << (63 - b)
      }
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }

  /** Integer-exact track statistics over the DECODED samples:
    * (n_samples, max_abs, energy = Σ s², sum_s). Everything is int64
    * arithmetic — no float drift possible, so the DuckDB oracle reproduces
    * them from the source characters. */
  def stats(wav: Array[Byte]): InternalRow = {
    val samples = decodeSamples(wav)
    var maxAbs = 0L
    var energy = 0L
    var sum = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      val a = math.abs(s)
      if (a > maxAbs) maxAbs = a
      energy += s * s
      sum += s
      i += 1
    }
    InternalRow(samples.length.toLong, maxAbs, energy, sum)
  }
}

/** binary → binary: raw payload bytes rendered as a real PCM WAV file. */
case class WavEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_wav_encode requires a binary input")
  override def nullSafeEval(b: Any): Any =
    AudioCodec.encodeWav(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.AudioCodec.encodeWav($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_wav_encode"
}

/** binary → struct: decoded-sample statistics of a WAV payload. */
case class WavStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("max_abs", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("sum_s", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_wav_stats requires a binary input")
  override def nullSafeEval(b: Any): Any =
    AudioCodec.stats(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.AudioCodec.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_wav_stats"
}

/** binary → array<int>: the decoded 16-bit PCM samples themselves. */
case class WavSamples(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_wav_samples requires a binary input")
  override def nullSafeEval(b: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      AudioCodec.decodeSamples(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.operators.AudioCodec.decodeSamples($c))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_wav_samples"
}

/** (binary wav, int threshold) → struct: activity-segment census of the
  * decoded samples — runs of consecutive |s| ≥ threshold. One fused pass
  * per row (decode + threshold + run-length), ZERO shuffle: per-track
  * segmentation is a pure row function, so exploding samples through an
  * exchange (the first q171 shape — 7× slower at sf1) is wasted motion. */
case class WavSegments(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_segments", LongType, nullable = false),
    StructField("n_active", LongType, nullable = false),
    StructField("longest", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_wav_segments(wav binary, threshold int)")
  override def nullSafeEval(b: Any, t: Any): Any =
    AudioCodec.segments(b.asInstanceOf[Array[Byte]], t.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, t) => s"graft.operators.AudioCodec.segments($b, $t)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_wav_segments"
}

/** binary → array<long>: 64-bit acoustic fingerprint [hi32, lo32]. */
case class WavAHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_wav_ahash64 requires a binary input")
  override def nullSafeEval(b: Any): Any =
    AudioCodec.aHash64(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.AudioCodec.aHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_wav_ahash64"
}

/** Column-API faces of the audio expressions. */
object AudioExprs {
  def wavEncode(raw: Column): Column = Bridge.column(WavEncode(Bridge.expression(raw)))
  def wavAHash64(wav: Column): Column = Bridge.column(WavAHash64(Bridge.expression(wav)))
  def wavStats(wav: Column): Column = Bridge.column(WavStats(Bridge.expression(wav)))
  def wavSamples(wav: Column): Column = Bridge.column(WavSamples(Bridge.expression(wav)))
  def wavSegments(wav: Column, threshold: Column): Column =
    Bridge.column(WavSegments(Bridge.expression(wav), Bridge.expression(threshold)))
}
