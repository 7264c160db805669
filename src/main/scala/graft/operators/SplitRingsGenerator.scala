package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** SQL face of the REAL-polygon tessellation (G3 over rings,
  * `/root/reference/smartpy_arc/poly_splitting.py:135-198`) — the rings
  * analog of [[SplitRectGenerator]], completing the SQL surface so LATERAL
  * VIEW users get the Sutherland–Hodgman splitter, not just the Rect model:
  *
  * {{{
  *   SELECT oid, t.* FROM parcels
  *   LATERAL VIEW graft_split_rings(oid, geom, acres, 100.0) t
  * }}}
  *
  * One input row → N output rows (geom rings, part_area, split_seq), same
  * kernel and RNG seeding as [[RingSplit.splitEqualArea]], so SQL and
  * DataFrame paths emit identical parts (GraftFunctionsSpec asserts parity).
  * Generators execute inside `GenerateExec` — per-row independent, no
  * shuffle, the same scale shape as the flatMap form.
  */
case class SplitRingsGenerator(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 4)
      TypeCheckResult.TypeCheckFailure(
        "graft_split_rings(oid, rings, acres, max_acres) takes 4 args")
    else if (children.head.dataType != LongType &&
             children.head.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("oid must be integral")
    else if (!PolyGeom.isRingsType(children(1).dataType))
      TypeCheckResult.TypeCheckFailure("rings must be array<array<struct<x,y>>>")
    else if (children.drop(2).exists(_.dataType != DoubleType))
      TypeCheckResult.TypeCheckFailure("acres/max_acres must be double")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("geom", PolyGeom.RingsT, nullable = true),
    StructField("part_area", DoubleType, nullable = true),
    StructField("split_seq", LongType)))

  private def toPoly(rings: ArrayData): RingSplit.Poly =
    RingSplit.Poly((0 until rings.numElements()).map { r =>
      val ring = rings.getArray(r)
      (0 until ring.numElements()).map { i =>
        val p = ring.getStruct(i, 2)
        (p.getDouble(0), p.getDouble(1))
      }.toIndexedSeq
    }.toIndexedSeq)

  private def fromPoly(poly: RingSplit.Poly): ArrayData =
    new GenericArrayData(poly.rings.map { ring =>
      new GenericArrayData(ring.map { case (x, y) =>
        new GenericInternalRow(Array[Any](x, y))
      }.toArray[Any])
    }.toArray[Any])

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val oid = children.head.eval(input) match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case null => return Nil
    }
    val ringsV = children(1).eval(input)
    val acresV = children(2).eval(input)
    val maxAcresV = children(3).eval(input)
    if (ringsV == null || acresV == null || maxAcresV == null) return Nil
    val poly = toPoly(ringsV.asInstanceOf[ArrayData])
    RingSplit.tessellate(poly, acresV.asInstanceOf[Double],
        maxAcresV.asInstanceOf[Double], seed = oid)
      .map { case (part, seq) =>
        part match {
          case Some(p) => new GenericInternalRow(
            Array[Any](fromPoly(p), p.area, seq))
          case None => new GenericInternalRow(Array[Any](null, null, seq))
        }
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  override def prettyName: String = "graft_split_rings"
}
