package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded per-partition heap for [[TopKByScore]]: at most k entries, the
  * WORST on top for O(log k) eviction. Quality order: higher score first,
  * ties → smaller id (the `ORDER BY score DESC, id ASC` of a ranking
  * window). Score comparison goes through `Double.compare` so NaN ranks
  * greatest — identical to Spark's sort order for doubles.
  */
final class TopKHeap(val k: Int) {
  // ByQuality is ascending-better, so the PriorityQueue max (= head) is the
  // worst retained entry — the eviction candidate.
  val q: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](TopKHeap.ByQuality)

  def insert(score: Double, id: Long): Unit =
    if (q.size < k) q.enqueue((score, id))
    else {
      val (ws, wi) = q.head
      val c = java.lang.Double.compare(score, ws)
      if (c > 0 || (c == 0 && id < wi)) { q.dequeue(); q.enqueue((score, id)) }
    }
}

object TopKHeap {
  /** compare(a, b) < 0 iff a is BETTER: score desc, then id asc. */
  val ByQuality: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}

/** Bounded top-k aggregate: keeps the k (score, id) entries with the highest
  * score (ties → smallest id) and returns them best-first as
  * `array<struct<cos: double, id: long|int>>`.
  *
  * The point vs `row_number() OVER (PARTITION BY g ORDER BY score DESC)`:
  * a ranking window must shuffle EVERY scored row to its group's task before
  * discarding all but k, so a batch-KNN over |corpus|·|queries| scores puts
  * the entire cross product on the wire — and at large scale each query's
  * |corpus| rows land on a single task. As a TypedImperativeAggregate this
  * runs inside ObjectHashAggregate WITH partial aggregation: each map task
  * retains at most k entries per group, the shuffle carries
  * k · partitions · |groups| heap entries, and the merge is heap-merge.
  * Same result, cross-product-sized shuffle → k-sized shuffle.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"top-k size must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  private def idType: DataType = id.dataType
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cos", DoubleType), StructField("id", idType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && (idType == LongType || idType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double score, long|int id), got " +
        s"${score.dataType.simpleString} / ${idType.simpleString}")

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idL = i match { case l: java.lang.Long => l.longValue(); case n: java.lang.Integer => n.longValue() }
      b.insert(s.asInstanceOf[Double], idL)
    }
    b
  }

  override def merge(b: TopKHeap, other: TopKHeap): TopKHeap = {
    other.q.foreach { case (s, i) => b.insert(s, i) }
    b
  }

  override def eval(b: TopKHeap): Any = {
    val sorted = b.q.toArray.sorted(TopKHeap.ByQuality)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, if (idType == IntegerType) i.toInt else i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.q.size)
    b.q.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val n = in.readInt()
    val h = new TopKHeap(kk)
    var j = 0
    while (j < n) { h.insert(in.readDouble(), in.readLong()); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_top_k"
}

object TopKAgg {
  /** Column surface: bounded top-k of (score, id), best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
