package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable elementwise running sum for [[VectorMean]]: one double per
  * dimension plus a count — the entire per-group state is `dim · 8` bytes
  * regardless of how many vectors fold into it. Rows whose dimension
  * disagrees with the group's first-seen dimension are SKIPPED (counted in
  * `skipped`), not thrown on — one ragged row in a 100 TB corpus must not
  * fail the job. The dominant (first-seen) dimension wins; `skipped` makes
  * data-quality triage possible without a second pass. */
final class VecSumBuf(var sums: Array[Double], var n: Long, var skipped: Long = 0L) {
  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val d = v.numElements()
    if (sums == null) sums = new Array[Double](d)
    if (sums.length != d) { skipped += 1; return }
    var i = 0
    while (i < d) {
      sums(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    n += 1
  }
}

/** Elementwise mean of an `array<float|double>` column as a
  * TypedImperativeAggregate — the Lloyd-step "mean per inverted list" for
  * [[graft.operators.Similarity.ivfRefinePivots]].
  *
  * Why not `posexplode → groupBy(list, pos) → avg`: that shape shuffles
  * |corpus|·dim ROWS just to average, and reassembling the mean vector
  * needs a second shuffle (collect_list over sorted positions). Here the
  * aggregate runs inside ObjectHashAggregate WITH partial aggregation:
  * map tasks fold their rows into a dim-double buffer locally, the
  * exchange carries one buffer per (group × task), and the merge is an
  * elementwise add — the classic mergeable-sketch shape that survives
  * 100 TB. Result element type is FLOAT (the corpus embedding type), so
  * refined pivots feed [[VectorExprs.nearestPivotF]] unchanged. */
case class VectorMean(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(null, 0L)

  override def update(b: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = vec.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], isFloat)
    b
  }

  override def merge(b: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    b.skipped += other.skipped
    if (other.sums != null) {
      if (b.sums == null) { b.sums = other.sums; b.n = other.n }
      else if (b.sums.length != other.sums.length) {
        // cross-partition dimension disagreement: keep the heavier side
        // (more rows folded), count the lighter side's rows as skipped —
        // same skip-don't-throw policy as VecSumBuf.add.
        if (other.n > b.n) {
          b.skipped += b.n; b.sums = other.sums; b.n = other.n
        } else b.skipped += other.n
      } else {
        var i = 0
        while (i < b.sums.length) { b.sums(i) += other.sums(i); i += 1 }
        b.n += other.n
      }
    }
    b
  }

  override def eval(b: VecSumBuf): Any =
    if (b.sums == null || b.n == 0L) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      b.sums.map(s => (s / b.n).toFloat).toArray[Any])

  override def serialize(b: VecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val dim = if (b.sums == null) -1 else b.sums.length
    out.writeInt(dim)
    out.writeLong(b.n)
    out.writeLong(b.skipped)
    if (dim > 0) b.sums.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dim = in.readInt()
    val n = in.readLong()
    val skipped = in.readLong()
    if (dim < 0) new VecSumBuf(null, n, skipped)
    else {
      val sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { sums(i) = in.readDouble(); i += 1 }
      new VecSumBuf(sums, n, skipped)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorMean =
    copy(vec = newChildren(0))
  override def prettyName: String = "graft_vector_mean"
}

object VectorMeanAgg {
  /** Column surface: elementwise mean of an array<float|double> column. */
  def vectorMean(vec: Column): Column =
    Bridge.column(VectorMean(Bridge.expression(vec)).toAggregateExpression())
}
