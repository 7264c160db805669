package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled one-pass text-hashing kernels for the dedup pack.
  *
  * The declarative formulation (explode word shingles → md5 hex → conv →
  * groupBy-min) evaluates higher-order lambdas interpreted and needs a
  * keyed shuffle just to reassemble per-document signatures. These kernels
  * compute the ENTIRE MinHash signature / SimHash fingerprint / shingle-hash
  * set per document in one compiled pass over the text — an embarrassingly
  * parallel scan with NO shuffle, the shape you want when the corpus is
  * 100 TB (signature computation cost scales with bytes read, shuffle with
  * zero bytes instead of |shingles| rows).
  *
  * Semantics are IDENTICAL to the declarative path (and to the DuckDB oracle):
  *  - shingles: `split(trim(text), '\s+')`, windows of w words joined by ' ',
  *    `max(n-w+1, 1)` windows (a short doc yields one partial shingle) —
  *    exactly [[Fns.wordShingles]];
  *  - shingle hash: first 15 hex chars of md5 as int64 (= first 8 digest
  *    bytes big-endian >>> 4), reduced mod P — exactly [[Fns.hashP]];
  *  - MinHash term k: (hp·a_k + b_k) mod P with [[Fns.hashA]]/[[Fns.hashB]];
  *  - SimHash bit j: sign of Σ ±1 votes over shingle-hash bit j.
  * All arithmetic is exact int64 — no float drift is possible.
  */
object TextHashing {
  private val P = Fns.P

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hash60 of a string: first 15 hex chars of md5 = first 8 digest bytes as
    * big-endian int64, shifted right 4 (drops the 16th nibble). */
  def hash60(s: String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Word-w-gram shingle hashes in [0, P), in document order (duplicates
    * kept — the declarative path keeps them too). */
  def shingleHashesP(text: UTF8String, w: Int): Array[Long] = {
    // UTF8String.trim() trims ASCII space only — same as Spark's trim().
    val words = text.trim().toString.split("\\s+", -1)
    val n = math.max(words.length - (w - 1), 1)
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      val end = math.min(i + w, words.length)
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(words(j)); j += 1 }
      out(i) = hash60(sb.toString) % P
      i += 1
    }
    out
  }

  /** Full K-term MinHash signature in one pass. */
  def minhashSig(text: UTF8String, w: Int, k: Int): Array[Long] = {
    val hps = shingleHashesP(text, w)
    val a = new Array[Long](k); val b = new Array[Long](k)
    var j = 0
    while (j < k) { a(j) = Fns.hashA(j + 1); b(j) = Fns.hashB(j + 1); j += 1 }
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hps.length) {
      val hp = hps(i)
      j = 0
      while (j < k) {
        val t = (hp * a(j) + b(j)) % P
        if (t < out(j)) out(j) = t
        j += 1
      }
      i += 1
    }
    out
  }

  /** 16-bit SimHash fingerprint in one pass. */
  def simhash16(text: UTF8String, w: Int): Long = {
    val hps = shingleHashesP(text, w)
    val votes = new Array[Int](16)
    var i = 0
    while (i < hps.length) {
      val hp = hps(i)
      var j = 0
      while (j < 16) {
        if (((hp >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 16) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  /** DISTINCT word-w-gram hashes in one compiled pass — the decontamination
    * hot path. Distinct-ing happens at the STRING level (first-occurrence
    * order, matching `array_distinct`), and only then are the survivors
    * hashed — identical to `array_distinct(wordShingles(text,w))` exploded
    * through `hashP`, including the edge where two distinct grams collide in
    * hashP (both values are kept, as the declarative path keeps both rows).
    * This replaces a per-exploded-row md5-hex → conv(…,16,10) string
    * pipeline with one pass over the document. */
  def distinctShingleHashesP(text: UTF8String, w: Int): Array[Long] = {
    val words = text.trim().toString.split("\\s+", -1)
    val n = math.max(words.length - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[String](math.min(n * 2, 1 << 16))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      val end = math.min(i + w, words.length)
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(words(j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = hash60(it.next()) % P; k += 1 }
    out
  }

  /** Character n-gram shingle hashes in [0, P), string-order, duplicates
    * kept — semantics of [[Fns.charShinglesExpr]] + [[Fns.hashP]]:
    * `max(len-n+1, 1)` windows; a short string yields one partial gram.
    * Positions are CHARACTER offsets (substring semantics), so multi-byte
    * code points count as one — iterate code points, not bytes. */
  def charShingleHashesP(text: UTF8String, n: Int): Array[Long] = {
    val s = text.toString
    val chars = s.length // UTF-16 length; fixture text is ASCII/Latin. For
    // full parity with substring() on surrogate pairs, Spark's substring is
    // code-point based — use offsets into code points when needed.
    val cnt = math.max(chars - (n - 1), 1)
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val end = math.min(i + n, chars)
      out(i) = hash60(s.substring(i, end)) % P
      i += 1
    }
    out
  }

  /** One-pass MLM-style masking: token w masks when
    * hash60(salt||w) % P % den == 0 — exactly [[Fns.hashP]] of the same
    * concatenation, so the declarative/DuckDB faces agree bit-for-bit.
    * Returns (masked text rejoined by single spaces, mask count) — one md5
    * per token, shared by the rewrite and the count. */
  def maskTokensRow(text: UTF8String, salt: String, den: Int,
                    mask: String): org.apache.spark.sql.catalyst.InternalRow = {
    val words = text.trim().toString.split("\\s+", -1)
    val sb = new java.lang.StringBuilder(text.numBytes() + 16)
    var n = 0
    var i = 0
    while (i < words.length) {
      if (i > 0) sb.append(' ')
      if (hash60(salt + words(i)) % P % den == 0) { sb.append(mask); n += 1 }
      else sb.append(words(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), n))
  }

  /** One-pass span-drop kernel for [[graft.operators.Curation.removeDupSpans]]:
    * tokens = `trim(text).split("\\s+")` (identical to the declarative
    * `split(trim(text), "\\s+")`), `starts` = SORTED ascending w-gram start
    * positions whose spans `[j, j+w)` drop their covered tokens. Classic
    * merged-interval two-pointer: O(tokens + starts) per document — the
    * lambda formulation (`filter(toks, i => !exists(starts, ...))`) is
    * O(tokens·starts), quadratic for a heavily-duplicated document. Returns
    * struct(n_tokens, n_kept, text_clean). */
  def dropSpansRow(text: UTF8String, starts: ArrayData, w: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val words = text.trim().toString.split("\\s+", -1)
    val n = words.length
    val m = if (starts == null) 0 else starts.numElements()
    val sb = new java.lang.StringBuilder(math.min(text.numBytes() + 16, 1 << 20))
    var kept = 0
    var p = 0
    var cov = 0 // tokens below `cov` are covered by some merged span
    var i = 0
    while (i < n) {
      while (p < m && starts.getInt(p) <= i) {
        val end = starts.getInt(p) + w
        if (end > cov) cov = end
        p += 1
      }
      if (i >= cov) {
        if (kept > 0) sb.append(' ')
        sb.append(words(i))
        kept += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, kept.toLong, UTF8String.fromString(sb.toString)))
  }

  // ---- ArrayData wrappers for codegen call sites -------------------------
  def minhashSigData(text: UTF8String, w: Int, k: Int): ArrayData =
    new GenericArrayData(minhashSig(text, w, k))
  def shingleHashesData(text: UTF8String, w: Int): ArrayData =
    new GenericArrayData(shingleHashesP(text, w))
  def distinctShingleHashesData(text: UTF8String, w: Int): ArrayData =
    new GenericArrayData(distinctShingleHashesP(text, w))
  def charShingleHashesData(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(charShingleHashesP(text, n))
}

/** Base for string→kernel expressions: codegen emits one static call, so the
  * surrounding whole-stage-codegen span stays unbroken. */
abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  /** Java call on graft.functions.TextHashing for generated code. */
  protected def staticCall(childRef: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

/** array<long>: full MinHash signature (terms 1..k). */
case class MinhashSig(child: Expression, w: Int, k: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHashing.minhashSigData(t.asInstanceOf[UTF8String], w, k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashing.minhashSigData($c, $w, $k)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

/** long: 16-bit SimHash fingerprint. */
case class SimHash16(child: Expression, w: Int) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    TextHashing.simhash16(t.asInstanceOf[UTF8String], w)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashing.simhash16($c, $w)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash16"
}

/** array<long>: hashP of every shingle, document order, duplicates kept. */
case class ShingleHashes(child: Expression, w: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHashing.shingleHashesData(t.asInstanceOf[UTF8String], w)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashing.shingleHashesData($c, $w)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** array<long>: hashP of every DISTINCT shingle (string-level distinct,
  * first-occurrence order — `array_distinct` semantics). */
case class DistinctShingleHashes(child: Expression, w: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHashing.distinctShingleHashesData(t.asInstanceOf[UTF8String], w)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashing.distinctShingleHashesData($c, $w)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_distinct_shingle_hashes"
}

/** array<long>: hashP of every char n-gram, string order, duplicates kept. */
case class CharShingleHashes(child: Expression, n: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHashing.charShingleHashesData(t.asInstanceOf[UTF8String], n)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashing.charShingleHashesData($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_char_shingle_hashes"
}

/** struct<masked:string, n_masked:int>: one-pass deterministic token
  * masking (rewrite + count share one hash per token). */
case class MaskTokensK(child: Expression, salt: String, den: Int, mask: String)
  extends TextHashExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("masked", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false)))
  override def nullSafeEval(t: Any): Any =
    TextHashing.maskTokensRow(t.asInstanceOf[UTF8String], salt, den, mask)
  override protected def staticCall(c: String): String =
    throw new UnsupportedOperationException("uses custom doGenCode")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    val maskRef = ctx.addReferenceObj("mask", mask, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.maskTokensRow($c, $saltRef, $den, $maskRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_mask_tokens"
}

/** struct<n_tokens:long, n_kept:long, text_clean:string>: drop every token
  * covered by a duplicated w-gram span (merged-interval two-pointer over
  * the SORTED `starts` array — one compiled pass per document). */
case class DropSpansClean(left: Expression, right: Expression, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("text_clean", StringType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<int>)")
  override def nullSafeEval(t: Any, s: Any): Any =
    TextHashing.dropSpansRow(t.asInstanceOf[UTF8String],
      s.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashing.dropSpansRow($a, $b, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_drop_spans"
}

object TextHashExprs {
  def minhashSig(text: Column, w: Int, k: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(text), w, k))
  def simhash16(text: Column, w: Int): Column =
    Bridge.column(SimHash16(Bridge.expression(text), w))
  def shingleHashes(text: Column, w: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), w))
  def distinctShingleHashes(text: Column, w: Int): Column =
    Bridge.column(DistinctShingleHashes(Bridge.expression(text), w))
  def charShingleHashes(text: Column, n: Int): Column =
    Bridge.column(CharShingleHashes(Bridge.expression(text), n))
  def maskTokens(text: Column, salt: String, den: Int, mask: String): Column =
    Bridge.column(MaskTokensK(Bridge.expression(text), salt, den, mask))
  def dropSpans(text: Column, starts: Column, w: Int): Column =
    Bridge.column(DropSpansClean(
      Bridge.expression(text), Bridge.expression(starts), w))
}
