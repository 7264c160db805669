package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.IntegerType
import graft.functions.{CosineSim, DotProduct, MinhashSig, ShingleHashes, SimHash16}
import graft.operators.{PointWkb, WkbCoord}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths, same builders:
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster-wide, survives session cloning) — the
  *    `SparkSessionExtensions.injectFunction` route;
  *  - [[GraftFunctions.register]] on a live session (temp functions).
  *
  * After either, SQL users get the same kernels the DataFrame API uses:
  * {{{
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT doc_id, graft_simhash16(text, 5) FROM documents
  *   SELECT explode(graft_shingle_hashes(text, 5)) FROM documents
  * }}}
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INTEGER literal, got $other")
  }

  /** (name, builder) for every SQL-exposed native expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { es => CosineSim(es(0), es(1)) },
    "graft_dot" -> { es => DotProduct(es(0), es(1)) },
    "graft_minhash_sig" -> { es =>
      MinhashSig(es(0), intLit(es(1), "graft_minhash_sig", "w"),
        intLit(es(2), "graft_minhash_sig", "k")) },
    "graft_simhash16" -> { es =>
      SimHash16(es(0), intLit(es(1), "graft_simhash16", "w")) },
    "graft_shingle_hashes" -> { es =>
      ShingleHashes(es(0), intLit(es(1), "graft_shingle_hashes", "w")) },
    "graft_char_shingle_hashes" -> { es =>
      graft.functions.CharShingleHashes(es(0),
        intLit(es(1), "graft_char_shingle_hashes", "n")) },
    "graft_split_rect" -> { es => graft.operators.SplitRectGenerator(es) },
    "graft_split_rings" -> { es => graft.operators.SplitRingsGenerator(es) },
    "graft_point_wkb" -> { es => PointWkb(es(0), es(1)) },
    "graft_wkb_x" -> { es => WkbCoord(es(0), isX = true) },
    "graft_wkb_y" -> { es => WkbCoord(es(0), isX = false) },
    "graft_polygon_wkb" -> { es => graft.operators.PolygonWkb(es(0)) },
    "graft_wkb_polygon_rings" -> { es => graft.operators.WkbPolygonRings(es(0)) },
    "graft_wkt_polygon_rings" -> { es => graft.operators.WktPolygonRings(es(0)) },
    "graft_polygon_stats" -> { es => graft.operators.PolygonStats(es(0)) },
    "graft_rings_clip_rect" -> { es =>
      graft.operators.RingsClipRect(es(0), es(1), es(2), es(3), es(4)) },
    "graft_png_encode" -> { es => graft.operators.PngEncode(es(0)) },
    "graft_png_pixels" -> { es => graft.operators.PngPixels(es(0)) },
    "graft_png_resize" -> { es => graft.operators.PngResize(es(0), es(1), es(2)) },
    "graft_gray_hist16" -> { es => graft.operators.GrayHist16(es(0), es(1)) },
    "graft_wav_encode" -> { es => graft.operators.WavEncode(es(0)) },
    "graft_wav_stats" -> { es => graft.operators.WavStats(es(0)) },
    "graft_nearest_pivot" -> { es => graft.functions.NearestPivot(es(0), es(1)) },
    "graft_top_k" -> { es =>
      graft.functions.TopKByScore(es(0), es(1), intLit(es(2), "graft_top_k", "k"))
        .toAggregateExpression() },
    "graft_vector_mean" -> { es =>
      graft.functions.VectorMean(es(0)).toAggregateExpression() })

  /** Register everything as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) => Bridge.registerTempFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point: the native SQL functions plus the
  * MOR-aware resolution rule that serves thin snapshot chains through the
  * SQL catalog ([[graft.sources.ResolveThinSnapshots]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name),
        builder))
    }
    ext.injectResolutionRule(graft.sources.ResolveThinSnapshots(_))
  }
}
