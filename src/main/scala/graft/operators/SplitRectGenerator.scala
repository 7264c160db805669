package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** SQL face of the tessellation operator (G3) — a Catalyst `Generator`, so
  * `split_equal_area` is usable from pure SQL:
  *
  * {{{
  *   SELECT p_partkey, t.* FROM part
  *   LATERAL VIEW graft_split_rect(p_partkey, xmin, ymin, xmax, ymax, acres, 100.0) t
  * }}}
  *
  * One input row → N output rows (xmin,ymin,xmax,ymax,area,split_seq), same
  * kernel as [[Tessellation.splitEqualArea]] (seeded by the oid argument, so
  * SQL and DataFrame paths emit identical parts). Generators execute inside
  * `GenerateExec` — per-row independent, no shuffle, same scale shape as the
  * flatMap form.
  */
case class SplitRectGenerator(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 7)
      TypeCheckResult.TypeCheckFailure(
        "graft_split_rect(oid, xmin, ymin, xmax, ymax, acres, max_acres) takes 7 args")
    else if (children.head.dataType != LongType &&
             children.head.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("oid must be integral")
    else if (children.tail.exists(_.dataType != DoubleType))
      TypeCheckResult.TypeCheckFailure("coordinates/acres/max_acres must be double")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType),
    StructField("area", DoubleType), StructField("split_seq", LongType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val oid = children.head.eval(input) match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case null => return Nil
    }
    val args = children.tail.map(_.eval(input))
    if (args.contains(null)) return Nil
    val Seq(xmin, ymin, xmax, ymax, acres, maxAcres) =
      args.map(_.asInstanceOf[Double])
    Tessellation.tessellate(
        Tessellation.Rect(xmin, ymin, xmax, ymax), acres, maxAcres, seed = oid)
      .map { case (part, seq) =>
        part match {
          case Some(r) => new GenericInternalRow(
            Array[Any](r.xmin, r.ymin, r.xmax, r.ymax, r.area, seq))
          case None => new GenericInternalRow(
            Array[Any](null, null, null, null, null, seq))
        }
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  override def prettyName: String = "graft_split_rect"
}
