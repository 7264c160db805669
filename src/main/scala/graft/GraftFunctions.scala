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

  private[graft] def intLit(e: Expression, fn: String, arg: String): Int = e match {
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

/** `spark.sql.extensions` entry point: the native SQL functions, the
  * MOR-aware resolution rule that serves thin snapshot chains through the
  * SQL catalog ([[graft.sources.ResolveThinSnapshots]]), and the
  * `table_changes` table-valued function over the change data feed. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** `table_changes('<catalog>.<table>' | '<tableDir>', fromV [, toV])`:
    * the change rows of thin commits in the version range, straight off
    * the landed `cdf/` files ([[graft.operators.Sinks.tableChanges]]).
    * A `catalog.table` first argument resolves through the catalog's
    * registered workspace directory on the ACTIVE session; `toV` defaults
    * to the committed head. */
  private def tableChangesPlan(es: Seq[Expression]):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def str(e: Expression, arg: String): String = e match {
      case Literal(s, org.apache.spark.sql.types.StringType) if s != null =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: $arg must be a STRING literal, got $other")
    }
    require(es.length == 2 || es.length == 3,
      "table_changes(table, fromVersion [, toVersion])")
    val spark = SparkSession.active
    val ref = str(es.head, "table")
    val dir =
      if (ref.contains("/")) ref
      else ref.split('.') match {
        case Array(cat, tbl) =>
          val ws = spark.conf.getOption(s"spark.sql.catalog.$cat.workspace")
            .getOrElse(throw new IllegalArgumentException(
              s"table_changes: no catalog '$cat' with a workspace on this session"))
          s"$ws/$tbl"
        case _ => throw new IllegalArgumentException(
          s"table_changes: table must be 'catalog.table' or a directory path, got '$ref'")
      }
    val fromV = GraftFunctions.intLit(es(1), "table_changes", "fromVersion")
    val toV = es.lift(2)
      .map(GraftFunctions.intLit(_, "table_changes", "toVersion"))
      .orElse(graft.operators.Sinks.snapshotCommitted(spark, dir))
      .getOrElse(throw new IllegalStateException(
        s"table_changes: no committed snapshot at $dir"))
    graft.operators.Sinks.tableChanges(spark, dir, fromV, toV)
      .queryExecution.logical
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name),
        builder))
    }
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.operators.Sinks", "table_changes"),
      tableChangesPlan))
    ext.injectResolutionRule(graft.sources.ResolveThinSnapshots(_))
  }
}
