package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-math hot path (north-star
  * similarity pack).
  *
  * [[Fns.dot]]/[[Fns.cosine]] compose higher-order functions
  * (`transform`→`zip_with`→`aggregate`), which materialize an intermediate
  * array per row and evaluate lambdas outside whole-stage codegen. These
  * expressions fuse cast + dot + both norms into ONE loop over the raw
  * `ArrayData` with `doGenCode` (zero allocation, stays inside codegen) —
  * the q34-style intra-block pair scan does |pairs|·dim fused multiply-adds
  * and nothing else.
  *
  * Numeric contract (oracle bit-identity): elements are widened to double and
  * accumulated LEFT-TO-RIGHT per accumulator, exactly the fold order of
  * `Fns.dot(vecD(a), vecD(b))` and of the DuckDB oracle's `list_reduce` —
  * the IEEE op sequence per accumulator is unchanged, so results are
  * bit-identical to the HOF path.
  *
  * Null contract (matches the HOF path): null array → null; mismatched
  * lengths → null (zip_with pads with null, poisoning the fold); any null
  * element → null.
  */
abstract class VectorFold extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemT(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Combine the three accumulators into the result. */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  /** Java source for the same combination (same ops, same order). */
  protected def finishCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val leftFloat = elemT(left) == FloatType
    val rightFloat = elemT(right) == FloatType
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    finish(d, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, e: Expression): String =
      if (elemT(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${get(a, i, left)};
         |    final double $y = ${get(b, i, right)};
         |    $d += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ${finishCode(d, na, nb)};
         |  }
         |}
       """.stripMargin
    })
  }
}

/** Fused dot product: Σ aᵢ·bᵢ, left fold. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** Fused cosine similarity: dot / sqrt(norm2(a)·norm2(b)), one pass. */
case class CosineSim(left: Expression, right: Expression) extends VectorFold {
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / math.sqrt(na * nb)
  override protected def finishCode(dot: String, na: String, nb: String): String =
    s"$dot / java.lang.Math.sqrt($na * $nb)"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

/** Exact integer dot product over code arrays (the SQ8 scoring hot path):
  * Σ aᵢ·bᵢ accumulated in long — int8 codes are ≤127 in magnitude so the sum
  * is exact for any realistic dim (≤127²·dim ≪ 2⁶³). The declarative
  * formulation (`aggregate(zip_with(a,b,(x,y)=>(x*y).cast("long")),0L,_+_)`)
  * evaluates two interpreted lambdas per element and allocates the zipped
  * array per row; this fuses the whole fold into one codegen loop over the
  * raw `ArrayData` — the same treatment [[DotProduct]] gives float vectors.
  *
  * Null contract matches the HOF path exactly: null array → null; mismatched
  * lengths → null (`zip_with` pads with null, poisoning the fold); any null
  * element → null. Values are bit-identical by construction (exact integer
  * arithmetic — no fold-order sensitivity at all).
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int|bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val la = elemLong(left); val lb = elemLong(right)
    var d = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (la) a.getLong(i) else a.getInt(i).toLong
      val y = if (lb) b.getLong(i) else b.getInt(i).toLong
      d += x * y
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, e: Expression): String =
      if (elemLong(e)) s"$arr.getLong($i)" else s"(long) $arr.getInt($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $d += ${get(a, i, left)} * ${get(b, i, right)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $d;
         |  }
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_int_dot"
}

/** binary: int4 nibble-packing of a code array (SQ4 — the next rung of the
  * FAISS-style quantization ladder under SQ8). Codes must lie in [-7, 7]
  * (the `round(7·x/maxabs)` range); each byte holds two codes biased by +7
  * (high nibble first), an odd tail padded with bias-7 = code 0, which
  * contributes nothing to any dot product. 8× smaller than the float
  * column, 2× smaller than SQ8. This expression is PURE bit-packing — the
  * code values come from the same declarative `round` path as SQ8, so the
  * cross-engine rounding contract stays exactly the one q66 already proves.
  * Out-of-range codes fail fast (corrupt packing would silently skew every
  * downstream score). */
case class Int4Pack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${dt.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    VectorExprs.int4PackOf(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("packed")
      s"""
         |Object $out = graft.functions.VectorExprs.int4PackOf($a);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (byte[]) $out; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_int4_pack"
}

/** long: exact integer dot product over two int4-packed binaries — unbias
  * nibbles, multiply-add in long, one fused loop over the raw bytes. Null
  * contract: null input → null; mismatched byte length → null (different
  * dims can't dot). */
case class Int4Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    VectorExprs.int4DotOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("dot")
      s"""
         |Object $out = graft.functions.VectorExprs.int4DotOf($a, $b);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $out).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_int4_dot"
}

/** long: id of the pivot with the max cosine against `left` (ties → smaller
  * id, NaN ranks greatest — `ORDER BY cos DESC, cid ASC` semantics). `right`
  * is the PACKED pivot array `array<struct<cid: long|int, cv: array<float|
  * double>>>` — typically one broadcast row for the whole corpus, so the
  * entire IVF assignment is this single codegen'd loop: C fused cosines +
  * running argmax per row, zero allocation, zero shuffle.
  * Cosines use the exact [[VectorFold]] fold order, so the argmax agrees
  * bit-for-bit with ranking the individual [[CosineSim]] scores. */
case class NearestPivot(left: Expression, right: Expression) extends BinaryExpression {
  private def arrOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def pivotFields: Option[(DataType, DataType)] = right.dataType match {
    case ArrayType(StructType(Array(cid, cv)), _) => Some((cid.dataType, cv.dataType))
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = pivotFields match {
    case Some((cidT, cvT)) if arrOk(left.dataType) && arrOk(cvT) &&
        (cidT == LongType || cidT == IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<struct<cid: long|int, cv: array<float|double>>>), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def vecFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def cvFloat =
    pivotFields.get._2.asInstanceOf[ArrayType].elementType == FloatType
  private def cidInt = pivotFields.get._1 == IntegerType

  override def nullSafeEval(v: Any, p: Any): Any =
    VectorExprs.nearestPivotOf(v.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData],
      vecFloat, cvFloat, cidInt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val out = ctx.freshName("cid")
      s"""
         |Object $out = graft.functions.VectorExprs.nearestPivotOf($v, $p, $vecFloat, $cvFloat, $cidInt);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $out).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_nearest_pivot"
}

/** array<long>: ids of the `r` best pivots by cosine against `left`, in
  * rank order — the multi-assignment generalization of [[NearestPivot]]
  * (identical total order: cos DESC, cid ASC, NaN ranks greatest), same
  * packed-pivot broadcast encoding. Replaces the |corpus|·C scored cross
  * join + rank window a soft IVF assignment otherwise needs: one codegen'd
  * loop per row (C fused cosines + an r-slot insertion), zero shuffle.
  * Emits fewer than `r` entries only when fewer valid pivots exist. */
case class NearestPivots(left: Expression, right: Expression, r: Int)
    extends BinaryExpression {
  private def arrOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def pivotFields: Option[(DataType, DataType)] = right.dataType match {
    case ArrayType(StructType(Array(cid, cv)), _) => Some((cid.dataType, cv.dataType))
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = pivotFields match {
    case Some((cidT, cvT)) if arrOk(left.dataType) && arrOk(cvT) &&
        (cidT == LongType || cidT == IntegerType) && r > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<struct<cid: long|int, cv: array<float|double>>>, r > 0), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString} / $r")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def vecFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def cvFloat =
    pivotFields.get._2.asInstanceOf[ArrayType].elementType == FloatType
  private def cidInt = pivotFields.get._1 == IntegerType

  override def nullSafeEval(v: Any, p: Any): Any =
    VectorExprs.nearestPivotsOf(v.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData],
      r, vecFloat, cvFloat, cidInt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val out = ctx.freshName("cids")
      s"""
         |Object $out = graft.functions.VectorExprs.nearestPivotsOf($v, $p, $r, $vecFloat, $cvFloat, $cidInt);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $out; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_nearest_pivots"
}

/** array<int>: product-quantization encoding. `left` is the vector, `right`
  * the codebook — an array of K full-dimension vectors (one broadcast row
  * for the whole corpus, the [[NearestPivot]] packing trick). The vector is
  * split into `numSub` equal subspaces; each emits the 0-based index of the
  * codebook entry whose matching sub-slice is L2-nearest (squared distance,
  * accumulated left-to-right; ties → the FIRST minimum, i.e. smallest k —
  * exactly DuckDB's `list_position(dists, list_min(dists))`). One fused loop
  * per row: K·dim multiply-adds, no intermediate arrays.
  *
  * Null contract: null vector/codebook → null; any null element, a dim not
  * divisible by `numSub`, or a codebook entry of mismatched dim → null
  * (divergent geometry must not silently encode). */
case class PqEncode(left: Expression, right: Expression, numSub: Int) extends BinaryExpression {
  private def arrOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def cbElem: Option[DataType] = right.dataType match {
    case ArrayType(inner @ ArrayType(_, _), _) if arrOk(inner) => Some(inner.elementType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (arrOk(left.dataType) && cbElem.isDefined && numSub > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<float|double>>, numSub > 0), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString} / $numSub")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def vecFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def cbFloat = cbElem.get == FloatType

  override def nullSafeEval(v: Any, c: Any): Any =
    VectorExprs.pqEncodeOf(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      numSub, vecFloat, cbFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val out = ctx.freshName("codes")
      s"""
         |Object $out = graft.functions.VectorExprs.pqEncodeOf($v, $c, $numSub, $vecFloat, $cbFloat);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $out; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_pq_encode"
}

/** double: Σₘ lut[m][codes[m]] — the ADC (asymmetric-distance) scoring hot
  * path for PQ. `left` is an `array<int>` of 0-based codes, `right` an
  * `array<array<double>>` lookup table (typically query-side constants on a
  * broadcast row). Left-to-right fold over m — the same order as the
  * oracle's `list_reduce` — so results are bit-identical cross-engine. Per
  * corpus row this is M array reads and M adds: no float math against the
  * corpus vector at all.
  *
  * Null contract: null input → null; codes/lut length mismatch → null. An
  * out-of-range code fails fast (IllegalArgumentException) — it means the
  * codes and the LUT disagree about K, and a silent skip would skew every
  * downstream score. */
case class LutSum(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), " +
        s"got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(c: Any, l: Any): Any =
    VectorExprs.lutSumOf(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val out = ctx.freshName("sum")
      s"""
         |Object $out = graft.functions.VectorExprs.lutSumOf($c, $l);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $out).doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_lut_sum"
}

object VectorExprs {
  /** Column surface: fused dot over raw float/double array columns. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  /** Column surface: fused cosine over raw float/double array columns. */
  def cosineF(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  /** Column surface: argmax-cosine pivot id over a packed pivot array. */
  def nearestPivotF(vec: Column, pivots: Column): Column =
    Bridge.column(NearestPivot(Bridge.expression(vec), Bridge.expression(pivots)))
  /** Column surface: ids of the r best pivots, rank-ordered. */
  def nearestPivotsF(vec: Column, pivots: Column, r: Int): Column =
    Bridge.column(NearestPivots(Bridge.expression(vec), Bridge.expression(pivots), r))
  /** Column surface: fused exact integer dot over int/long code arrays. */
  def intDotF(a: Column, b: Column): Column =
    Bridge.column(IntDotProduct(Bridge.expression(a), Bridge.expression(b)))
  /** Column surface: int4 nibble-pack of a [-7,7] code array → binary. */
  def int4Pack(codes: Column): Column =
    Bridge.column(Int4Pack(Bridge.expression(codes)))
  /** Column surface: fused exact integer dot over int4-packed binaries. */
  def int4DotF(a: Column, b: Column): Column =
    Bridge.column(Int4Dot(Bridge.expression(a), Bridge.expression(b)))
  /** Column surface: PQ encode — per-subspace nearest-codebook-entry ids. */
  def pqEncodeF(vec: Column, codebook: Column, numSub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), Bridge.expression(codebook), numSub))
  /** Column surface: ADC lookup-table sum over PQ codes. */
  def lutSumF(codes: Column, lut: Column): Column =
    Bridge.column(LutSum(Bridge.expression(codes), Bridge.expression(lut)))

  /** Kernel for [[Int4Pack]]: two codes per byte, +7 bias, high nibble
    * first, odd tail padded with the bias (code 0). Null element → null;
    * out-of-range code → IllegalArgumentException (fail fast — silent
    * clamping would corrupt every downstream score). */
  def int4PackOf(codes: ArrayData): Any = {
    val n = codes.numElements()
    val out = new Array[Byte]((n + 1) / 2)
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < -7 || c > 7)
        throw new IllegalArgumentException(s"int4 code out of range [-7,7]: $c")
      val nib = c + 7
      if ((i & 1) == 0) out(i >> 1) = (nib << 4).toByte
      else out(i >> 1) = (out(i >> 1) | nib).toByte
      i += 1
    }
    if ((n & 1) == 1) out(n >> 1) = (out(n >> 1) | 7).toByte // pad = code 0
    out
  }

  /** Kernel for [[Int4Dot]]: Σ (aᵢ−7)(bᵢ−7) over unbias'd nibbles. The pad
    * nibble is code 0 on both sides, so odd-dim tails contribute nothing. */
  def int4DotOf(a: Array[Byte], b: Array[Byte]): Any = {
    if (a.length != b.length) return null
    var d = 0L
    var i = 0
    while (i < a.length) {
      val ab = a(i) & 0xff; val bb = b(i) & 0xff
      d += ((ab >> 4) - 7).toLong * ((bb >> 4) - 7)
      d += ((ab & 0xf) - 7).toLong * ((bb & 0xf) - 7)
      i += 1
    }
    java.lang.Long.valueOf(d)
  }

  /** Kernel for [[NearestPivot]] (shared by eval and codegen): C cosines
    * with the [[VectorFold]] fold order + running argmax. Pivots with
    * mismatched dimension are skipped (a per-pivot null cosine would be
    * ignored by the ranking anyway); no valid pivot → null. */
  def nearestPivotOf(vec: ArrayData, pivots: ArrayData,
                     vecFloat: Boolean, cvFloat: Boolean, cidInt: Boolean): Any = {
    val n = vec.numElements()
    val c = pivots.numElements()
    var bestCid = 0L
    var bestCos = 0.0
    var found = false
    var j = 0
    while (j < c) {
      val p = pivots.getStruct(j, 2)
      val cid = if (cidInt) p.getInt(0).toLong else p.getLong(0)
      val cv = p.getArray(1)
      if (cv.numElements() == n) {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          val y = if (cvFloat) cv.getFloat(i).toDouble else cv.getDouble(i)
          d += x * y; na += x * x; nb += y * y
          i += 1
        }
        val cos = d / math.sqrt(na * nb)
        val cmp = java.lang.Double.compare(cos, bestCos)
        if (!found || cmp > 0 || (cmp == 0 && cid < bestCid)) {
          found = true; bestCos = cos; bestCid = cid
        }
      }
      j += 1
    }
    if (found) java.lang.Long.valueOf(bestCid) else null
  }

  /** Kernel for [[NearestPivots]]: r-slot insertion ranking with the exact
    * [[NearestPivot]] total order (cos DESC, cid ASC via Double.compare —
    * NaN greatest). Same fused cosine loop; allocation is two r-length
    * locals per row (r is 2-3 in practice). */
  def nearestPivotsOf(vec: ArrayData, pivots: ArrayData, r: Int,
                      vecFloat: Boolean, cvFloat: Boolean, cidInt: Boolean): Any = {
    val n = vec.numElements()
    val c = pivots.numElements()
    val topCos = new Array[Double](r)
    val topCid = new Array[Long](r)
    var m = 0
    var j = 0
    while (j < c) {
      val p = pivots.getStruct(j, 2)
      val cid = if (cidInt) p.getInt(0).toLong else p.getLong(0)
      val cv = p.getArray(1)
      if (cv.numElements() == n) {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          val y = if (cvFloat) cv.getFloat(i).toDouble else cv.getDouble(i)
          d += x * y; na += x * x; nb += y * y
          i += 1
        }
        val cos = d / math.sqrt(na * nb)
        // insertion position: strictly better than slot k ⇔ cos greater,
        // or equal cos with smaller cid (Double.compare: NaN greatest)
        var k = m
        while (k > 0 && {
          val cmp = java.lang.Double.compare(cos, topCos(k - 1))
          cmp > 0 || (cmp == 0 && cid < topCid(k - 1))
        }) k -= 1
        if (k < r) {
          var s = math.min(m, r - 1)
          while (s > k) {
            topCos(s) = topCos(s - 1); topCid(s) = topCid(s - 1)
            s -= 1
          }
          topCos(k) = cos; topCid(k) = cid
          if (m < r) m += 1
        }
      }
      j += 1
    }
    if (m == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topCid, m))
  }

  /** Kernel for [[PqEncode]]: per subspace, squared-L2 against every
    * codebook entry's matching slice (left-to-right accumulation) with
    * FIRST-minimum selection (strict `<` keeps the earliest k on ties —
    * `list_position(dists, list_min(dists))` semantics). Null element,
    * indivisible dim, or a codebook entry of mismatched dim → null. */
  def pqEncodeOf(vec: ArrayData, cbs: ArrayData, numSub: Int,
                 vecFloat: Boolean, cbFloat: Boolean): Any = {
    val n = vec.numElements()
    val kk = cbs.numElements()
    if (kk == 0 || numSub <= 0 || n % numSub != 0) return null
    val d = n / numSub
    val codes = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      var bestK = -1
      var bestDist = 0.0
      var k = 0
      while (k < kk) {
        if (cbs.isNullAt(k)) return null
        val cv = cbs.getArray(k)
        if (cv.numElements() != n) return null
        var dist = 0.0
        var i = m * d
        val end = i + d
        while (i < end) {
          if (vec.isNullAt(i) || cv.isNullAt(i)) return null
          val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          val c = if (cbFloat) cv.getFloat(i).toDouble else cv.getDouble(i)
          val diff = c - x
          dist += diff * diff
          i += 1
        }
        if (bestK < 0 || dist < bestDist) { bestK = k; bestDist = dist }
        k += 1
      }
      codes(m) = bestK
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes.map(Int.box))
  }

  /** Kernel for [[LutSum]]: Σₘ lut[m][codes[m]], left fold over m. Length
    * mismatch or nulls → null; out-of-range code → IllegalArgumentException
    * (codes and LUT disagree about K — fail fast). */
  def lutSumOf(codes: ArrayData, lut: ArrayData): Any = {
    val n = codes.numElements()
    if (lut.numElements() != n) return null
    var acc = 0.0
    var m = 0
    while (m < n) {
      if (codes.isNullAt(m) || lut.isNullAt(m)) return null
      val inner = lut.getArray(m)
      val c = codes.getInt(m)
      if (c < 0 || c >= inner.numElements())
        throw new IllegalArgumentException(
          s"PQ code out of LUT range: code=$c, lut k=${inner.numElements()} at subspace $m")
      if (inner.isNullAt(c)) return null
      acc += inner.getDouble(c)
      m += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
