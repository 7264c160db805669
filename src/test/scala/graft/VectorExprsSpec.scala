package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fns, VectorExprs}

/** The fused codegen vector expressions must be BIT-identical to the HOF
  * compositions they replace (the DuckDB oracle reproduces the HOF fold
  * order, so any drift here breaks the correctness gate). */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("cosineF / dotF bit-identical to HOF fold over real float embeddings") {
    val e = Tables.load(spark, sf, "embeddings")
    val a = e.select(col("vec_id"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("vid_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("vec_id") % 17 === col("vid_b") % 17 && col("vec_id") < col("vid_b"))
    val both = pairs.select(
      VectorExprs.cosineF(col("va"), col("vb")).as("fused_cos"),
      Fns.cosine(Fns.vecD(col("va")), Fns.vecD(col("vb"))).as("hof_cos"),
      VectorExprs.dotF(col("va"), col("vb")).as("fused_dot"),
      Fns.dot(Fns.vecD(col("va")), Fns.vecD(col("vb"))).as("hof_dot"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact comparison via raw bits — not a tolerance check
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("null contract matches HOF: null array, null element, length mismatch") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0F, 2.0F), array(3.0F, 4.0F)),
        |  (CAST(NULL AS ARRAY<FLOAT>), array(3.0F, 4.0F)),
        |  (array(1.0F, NULL), array(3.0F, 4.0F)),
        |  (array(1.0F), array(3.0F, 4.0F)) AS t(a, b)""".stripMargin)
    val out = df.select(
      VectorExprs.cosineF(col("a"), col("b")).as("fused"),
      Fns.cosine(Fns.vecD(col("a")), Fns.vecD(col("b"))).as("hof")).collect()
    out.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1), r.toString) }
    assert(!out(0).isNullAt(0) && out.drop(1).forall(_.isNullAt(0)))
  }

  test("nearestPivotF ≡ argmax over individual cosineF scores (real embeddings)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pivots = emb.filter(col("vec_id") < 8)
    val packed = broadcast(
      pivots.select(struct(col("vec_id").as("cid"), col("embedding").as("cv")).as("p"))
        .agg(sort_array(collect_list(col("p"))).as("pivs")))
    val fused = emb.crossJoin(packed)
      .select(col("vec_id"),
        graft.functions.VectorExprs.nearestPivotF(col("embedding"), col("pivs")).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: score every (vec, pivot) with the scalar kernel and rank
    val scored = emb.crossJoin(broadcast(pivots.select(col("vec_id").as("pid"), col("embedding").as("pv"))))
      .select(col("vec_id"), col("pid"),
        graft.functions.VectorExprs.cosineF(col("embedding"), col("pv")).as("cos"))
      .collect().groupBy(_.getLong(0)).map { case (v, rows) =>
        v -> rows.minBy(r => (-r.getDouble(2), r.getLong(1))).getLong(1)
      }
    assert(fused == scored)
  }

  test("nearestPivotsF ≡ rank-window top-r over individual cosines (real embeddings)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pivots = emb.filter(col("vec_id") < 8)
    val packed = broadcast(
      pivots.select(struct(col("vec_id").as("cid"), col("embedding").as("cv")).as("p"))
        .agg(sort_array(collect_list(col("p"))).as("pivs")))
    for (r <- Seq(1, 2, 3)) {
      val fused = emb.crossJoin(packed)
        .select(col("vec_id"),
          graft.functions.VectorExprs.nearestPivotsF(col("embedding"), col("pivs"), r).as("cids"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
      val ref = emb.crossJoin(broadcast(
          pivots.select(col("vec_id").as("pid"), col("embedding").as("pv"))))
        .select(col("vec_id"), col("pid"),
          graft.functions.VectorExprs.cosineF(col("embedding"), col("pv")).as("cos"))
        .collect().groupBy(_.getLong(0)).map { case (v, rows) =>
          v -> rows.sortBy(x => (-x.getDouble(2), x.getLong(1))).take(r)
            .map(_.getLong(1)).toSeq
        }
      assert(fused == ref, s"r=$r")
      // rank 1 must agree with the hard-assignment kernel
      if (r == 1) {
        val hard = emb.crossJoin(packed)
          .select(col("vec_id"),
            graft.functions.VectorExprs.nearestPivotF(col("embedding"), col("pivs")).as("cid"))
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        assert(fused.view.mapValues(_.head).toMap == hard)
      }
    }
  }

  test("intDotF ≡ HOF intDot over quantized real embeddings (exact longs)") {
    import graft.operators.Similarity
    val codes = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"))
    val q = broadcast(codes.filter(col("vec_id") === 0).select(col("q").as("qq")))
    val rows = codes.crossJoin(q).select(
      VectorExprs.intDotF(col("q"), col("qq")).as("fused"),
      Similarity.intDot(col("q"), col("qq")).as("hof"),
      VectorExprs.intDotF(col("q"), col("q")).as("fused_self"),
      Similarity.intDot(col("q"), col("q")).as("hof_self")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("intDotF null contract matches HOF: null array, null element, length mismatch") {
    import graft.operators.Similarity
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1, -2, 3), array(4, 5, 6)),
        |  (CAST(NULL AS ARRAY<INT>), array(4, 5, 6)),
        |  (array(1, NULL, 3), array(4, 5, 6)),
        |  (array(1, 2), array(4, 5, 6)) AS t(a, b)""".stripMargin)
    val out = df.select(
      VectorExprs.intDotF(col("a"), col("b")).as("fused"),
      Similarity.intDot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1), r.toString) }
    assert(out(0).getLong(0) == 4 - 10 + 18)
    assert(out.drop(1).forall(_.isNullAt(0)))
  }

  test("quantizedCosineFromDots: zero-code vector scores 0.0, not null/NaN") {
    import graft.operators.Similarity
    val df = spark.sql("SELECT array(0.0F, 0.0F) AS z, array(1.0F, 2.0F) AS v")
      .select(Similarity.quantizeInt8(col("z")).as("qz"),
              Similarity.quantizeInt8(col("v")).as("qv"))
    val r = df.select(
      Similarity.quantizedCosine(col("qz"), col("qv")).as("c"),
      Similarity.quantizedCosine(col("qz"), col("qz")).as("zz")).first()
    assert(!r.isNullAt(0) && r.getDouble(0) == 0.0)
    assert(!r.isNullAt(1) && r.getDouble(1) == 0.0)
  }

  test("int4 pack+dot ≡ HOF intDot over the unpacked codes (even and odd dims)") {
    import graft.operators.Similarity
    // real embeddings (even dim) quantized to [-7,7] codes
    val codes4 = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x * lit(7.0) / greatest(array_max(transform(col("embedding"),
            y => abs(y))), lit(1e-30))).cast("int")).as("c"))
    val q = broadcast(codes4.filter(col("vec_id") === 0).select(col("c").as("qc")))
    val rows = codes4.crossJoin(q).select(
      VectorExprs.int4DotF(VectorExprs.int4Pack(col("c")),
        VectorExprs.int4Pack(col("qc"))).as("packed"),
      Similarity.intDot(col("c"), col("qc")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // odd dim: the pad nibble must contribute nothing
    val odd = spark.sql("SELECT array(7, -7, 3) AS a, array(-1, 2, -7) AS b")
    val r = odd.select(
      VectorExprs.int4DotF(VectorExprs.int4Pack(col("a")), VectorExprs.int4Pack(col("b"))).as("p"),
      Similarity.intDot(col("a"), col("b")).as("h")).first()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == -7 - 14 - 21)
  }

  test("int4Pack fails fast on out-of-range codes; int4DotF nulls on length mismatch") {
    val bad = spark.sql("SELECT array(8) AS a")
    val e = intercept[Exception] {
      bad.select(VectorExprs.int4Pack(col("a"))).collect()
    }
    assert(e.getMessage != null)
    val mm = spark.sql("SELECT array(1, 2, 3) AS a, array(1) AS b")
    val r = mm.select(VectorExprs.int4DotF(
      VectorExprs.int4Pack(col("a")), VectorExprs.int4Pack(col("b")))).first()
    assert(r.isNullAt(0))
  }

  test("pqEncodeF ≡ declarative first-min L2 argmin over real embeddings") {
    import graft.operators.Similarity
    val (m, d, k) = (8, 8, 16)
    val emb = Tables.load(spark, sf, "embeddings")
    val cb = Similarity.pqCodebook(emb, "embedding", "vec_id", k)
    def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val vd = Fns.vecD(col("embedding"))
    // reference: array_position(dists, array_min(dists)) — first minimum
    val codesRef = array((0 until m).map { mi =>
      val dists = transform(col("__cbs"),
        c => l2(slice(c, mi * d + 1, d), slice(vd, mi * d + 1, d)))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
    val rows = emb.crossJoin(cb).select(
      col("vec_id"),
      VectorExprs.pqEncodeF(col("embedding"), col("__cbs"), m).as("fused"),
      codesRef.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Int](1) == r.getSeq[Int](2), r.toString))
    // codebook members must self-encode (dist 0 at their own index)
    rows.filter(_.getLong(0) < k).foreach { r =>
      assert(r.getSeq[Int](1).forall(_ == r.getLong(0).toInt), r.toString)
    }
  }

  test("lutSumF ≡ HOF fold; null/mismatch contract; out-of-range fails fast") {
    val df = spark.sql(
      """SELECT array(1, 0) AS c,
        |array(array(CAST(0.5 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |      array(CAST(-1.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS lut""".stripMargin)
    val hof = aggregate(zip_with(col("c"), col("lut"), (ci, l) => element_at(l, ci + 1)),
      lit(0.0), (acc, x) => acc + x)
    val r = df.select(VectorExprs.lutSumF(col("c"), col("lut")).as("f"), hof.as("h")).first()
    assert(r.getDouble(0) == 2.0 - 1.0)
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
           java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    // length mismatch → null
    val mm = spark.sql(
      "SELECT array(1) AS c, array(array(CAST(1.0 AS DOUBLE)), array(CAST(2.0 AS DOUBLE))) AS lut")
    assert(mm.select(VectorExprs.lutSumF(col("c"), col("lut"))).first().isNullAt(0))
    // code beyond the LUT's K → fail fast, not a silent skip
    val oob = spark.sql("SELECT array(5) AS c, array(array(CAST(1.0 AS DOUBLE))) AS lut")
    val e = intercept[Exception] {
      oob.select(VectorExprs.lutSumF(col("c"), col("lut"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("pqEncodeF ties go to the FIRST minimum (duplicate codebook entries)") {
    // entries 1 and 2 are identical — equidistant from any vector — so the
    // winner must be the earlier index (list_position(list_min) semantics);
    // entry 0 is farther, proving the tie isn't won by accident of order
    val df = spark.sql(
      """SELECT array(5.0F, 5.0F) AS v,
        |array(array(100.0F, 100.0F), array(4.0F, 4.0F), array(4.0F, 4.0F)) AS cb""".stripMargin)
    assert(df.select(VectorExprs.pqEncodeF(col("v"), col("cb"), 1)).first()
      .getSeq[Int](0) == Seq(1))
    // per-subspace independence: numSub=2 picks per-slice winners
    assert(df.select(VectorExprs.pqEncodeF(col("v"), col("cb"), 2)).first()
      .getSeq[Int](0) == Seq(1, 1))
  }

  test("pqEncodeF null contract: indivisible dim and mismatched codebook entry") {
    val df = spark.sql(
      """SELECT array(1.0F, 2.0F, 3.0F) AS v,
        |array(array(1.0F, 2.0F, 3.0F), array(0.0F, 0.0F, 0.0F)) AS cb,
        |array(array(1.0F, 2.0F)) AS badcb""".stripMargin)
    // dim 3 not divisible by numSub 2 → null
    assert(df.select(VectorExprs.pqEncodeF(col("v"), col("cb"), 2)).first().isNullAt(0))
    // codebook entry dim ≠ vector dim → null
    assert(df.select(VectorExprs.pqEncodeF(col("v"), col("badcb"), 1)).first().isNullAt(0))
    // divisible + well-formed → codes
    assert(df.select(VectorExprs.pqEncodeF(col("v"), col("cb"), 3)).first()
      .getSeq[Int](0) == Seq(0, 0, 0))
  }

  test("interpreted eval path agrees with codegen (mixed double/float sides)") {
    val w = array(lit(0.5), lit(-1.25), lit(2.0))
    val df = spark.sql("SELECT array(1.0F, 2.0F, 3.0F) AS v")
    val r = df.select(
      VectorExprs.dotF(w, col("v")).as("d"),
      Fns.dot(w, Fns.vecD(col("v"))).as("h")).first()
    assert(r.getDouble(0) == 0.5 - 2.5 + 6.0)
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
           java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
  }
}
