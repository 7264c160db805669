package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorMeanAgg
import graft.operators.Similarity

/** IVF pivot refinement (Lloyd step) + the VectorMean aggregate it rides on. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two tight clusters on the x/y axes plus pivots chosen badly on purpose:
  // pivot 0 = (0.5, 1.02) sits between them, pivot 1 = (0, 1) inside B.
  // Under argmax-cosine the boundary cuts THROUGH cluster B (b > 0.232 goes
  // to pivot 0), so a nprobe=1 search in the B direction loses 2 of B's 5.
  private def fixture = {
    val a = (0 to 4).map(i => (i.toLong, Array(1.0f, i * 0.1f, 0f, 0f)))
    val b = (0 to 4).map(i => (10L + i, Array(i * 0.1f, 1.0f, 0f, 0f)))
    val corpus = (a ++ b).toDF("vec_id", "embedding")
    val pivots = Seq(
      (0L, Array(0.5f, 1.02f, 0f, 0f)),
      (1L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    (corpus, pivots)
  }

  test("vectorMean: exact elementwise mean, partial/merge path included") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(3.0f, 1.0f)), (1L, Array(5.0f, 2.0f)),
      (2L, Array(10.0f, -2.0f))).toDF("g", "v").repartition(4)
    val out = df.groupBy("g").agg(VectorMeanAgg.vectorMean(col("v")).as("m"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Float](1) == Seq(3.0f, 1.0f))
    assert(out(1).getSeq[Float](1) == Seq(10.0f, -2.0f))
  }

  test("ivfRefinePivots: one Lloyd pass recenters lists on exact means") {
    val (corpus, pivots) = fixture
    val refined = Similarity.ivfRefinePivots(
        corpus, pivots, "embedding", "vec_id", "vec_id")
      .orderBy("vec_id").collect()
    assert(refined.length == 2)
    // list 1 held B's b ∈ {0, 0.1, 0.2} → mean (0.1, 1.0, 0, 0)
    val c1 = refined(1).getSeq[Float](1)
    assert(math.abs(c1(0) - 0.1f) < 1e-6 && math.abs(c1(1) - 1.0f) < 1e-6)
  }

  test("ivfRefinePivots: nprobe=1 recall improves on the clustered fixture") {
    val (corpus, pivots) = fixture
    val query = Seq((99L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val trueTop = Similarity.bruteForceTopK(corpus, query, "embedding", "vec_id", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(trueTop == Set(10L, 11L, 12L, 13L, 14L)) // all of cluster B

    def hits(pv: org.apache.spark.sql.DataFrame): Set[Long] =
      Similarity.ivfSearch(
          Similarity.ivfAssign(corpus, pv, "embedding", "vec_id", "vec_id"),
          pv, query, "embedding", "vec_id", "vec_id", k = 5, nprobe = 1)
        .collect().map(_.getLong(0)).toSet

    val before = hits(pivots)
    val after = hits(Similarity.ivfRefinePivots(
      corpus, pivots, "embedding", "vec_id", "vec_id"))
    assert((before & trueTop).size == 3, s"fixture drifted: $before")
    assert((after & trueTop).size == 5, s"refined recall not full: $after")
  }

  test("ivfAssignQuantized stores codes + self-dot, no float vectors") {
    val (corpus, pivots) = fixture
    val idx = Similarity.ivfAssignQuantized(corpus, pivots, "embedding", "vec_id", "vec_id")
    assert(idx.columns.toSeq == Seq("vec_id", "codes", "code_self_dot", "centroid_id"))
    val r = idx.filter(col("vec_id") === 0).first()
    // vec 0 = (1, 0, 0, 0): codes (127, 0, 0, 0), self-dot 127²
    assert(r.getSeq[Int](1) == Seq(127, 0, 0, 0))
    assert(r.getLong(2) == 127L * 127L)
  }

  test("ivfSearchQuantized: recall parity with float ivfSearch (exact re-rank)") {
    val (corpus, pivots) = fixture
    val query = Seq((99L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val floatIdx = Similarity.ivfAssign(corpus, pivots, "embedding", "vec_id", "vec_id")
    val quantIdx = Similarity.ivfAssignQuantized(corpus, pivots, "embedding", "vec_id", "vec_id")
    val floatHits = Similarity.ivfSearch(floatIdx, pivots, query,
        "embedding", "vec_id", "vec_id", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val quantHits = Similarity.ivfSearchQuantized(quantIdx, pivots, query, corpus,
        "embedding", "vec_id", "vec_id", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // same probes, shortlist ⊇ k, exact float re-rank → identical (id, cos)
    // pairs, bit-for-bit (both sides score the final list with cosineF)
    assert(quantHits.toSeq == floatHits.toSeq)
  }

  test("ivfSearchQuantized with a tight shortlist still finds the cluster at nprobe=1 (refined pivots)") {
    val (corpus, pivots) = fixture
    val query = Seq((99L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val refined = Similarity.ivfRefinePivots(corpus, pivots, "embedding", "vec_id", "vec_id")
    val idx = Similarity.ivfAssignQuantized(corpus, refined, "embedding", "vec_id", "vec_id")
    val hits = Similarity.ivfSearchQuantized(idx, refined, query, corpus,
        "embedding", "vec_id", "vec_id", k = 5, nprobe = 1, shortlist = 5)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(10L, 11L, 12L, 13L, 14L))
  }

  test("ivfAssignPq stores M codes + centroid only, no float vectors") {
    val (corpus, pivots) = fixture
    val cb = Similarity.pqCodebook(corpus, "embedding", "vec_id", k = 4)
    val idx = Similarity.ivfAssignPq(corpus, pivots, cb,
      "embedding", "vec_id", "vec_id", numSub = 2)
    assert(idx.columns.toSeq == Seq("vec_id", "codes", "centroid_id"))
    val r = idx.filter(col("vec_id") === 0L).first()
    assert(r.getSeq[Int](1).length == 2) // M codes per vector
    // codebook member 0 must self-encode in every subspace
    assert(r.getSeq[Int](1) == Seq(0, 0))
  }

  test("pqRefineCodebook: one k-means pass recenters every (subspace, code) cell") {
    // two clusters per subspace; initial codebook = vectors 0 and 1
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
      (1L, Array(4.0f, 4.0f, 14.0f, 14.0f)),
      (2L, Array(1.0f, 1.0f, 11.0f, 11.0f)),
      (3L, Array(5.0f, 5.0f, 15.0f, 15.0f))).toDF("vec_id", "embedding")
    val cb0 = Similarity.pqCodebook(corpus, "embedding", "vec_id", k = 2)
    val refined = Similarity.pqRefineCodebook(corpus, cb0, "embedding", numSub = 2)
      .first().getSeq[Seq[Double]](0)
    // cell (m, 0) attracted vecs {0, 2}, cell (m, 1) attracted {1, 3} in
    // both subspaces → exact means (representable halves)
    assert(refined == Seq(
      Seq(0.5, 0.5, 10.5, 10.5),
      Seq(4.5, 4.5, 14.5, 14.5)))
    // refined codebook drops straight into the encode path
    val codes = corpus.crossJoin(Similarity.pqRefineCodebook(corpus, cb0, "embedding", 2))
      .select(col("vec_id"),
        graft.functions.VectorExprs.pqEncodeF(col("embedding"), col("__cbs"), 2).as("c"))
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(codes.toSeq == Seq(Seq(0, 0), Seq(1, 1), Seq(0, 0), Seq(1, 1)))
  }

  test("ivfSearchPq: recall parity with float ivfSearch (exact re-rank)") {
    val (corpus, pivots) = fixture
    val query = Seq((99L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(corpus, "embedding", "vec_id", k = 4)
    val floatIdx = Similarity.ivfAssign(corpus, pivots, "embedding", "vec_id", "vec_id")
    val pqIdx = Similarity.ivfAssignPq(corpus, pivots, cb,
      "embedding", "vec_id", "vec_id", numSub = 2)
    val floatHits = Similarity.ivfSearch(floatIdx, pivots, query,
        "embedding", "vec_id", "vec_id", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // default shortlist 4·k = 20 ⊇ the 10-vector corpus → the ADC pass
    // passes everything through and the exact float re-rank decides:
    // identical (id, cos) pairs, bit-for-bit (both sides use cosineF)
    val pqHits = Similarity.ivfSearchPq(pqIdx, pivots, cb, query, corpus,
        "embedding", "vec_id", "vec_id", numSub = 2, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pqHits.toSeq == floatHits.toSeq)
  }

  test("semDedup: near-dup flagged by lower-id cluster-mate; cluster minima never dup") {
    // pivots on the axes; a near-dup pair in each cluster plus one distinct vec
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0f, 0f)),
      (1L, Array(1.0f, 0.001f, 0f, 0f)),  // ≈0, same cluster → dup
      (2L, Array(0.6f, 0.4f, 0f, 0f)),    // cluster 0, cos < τ → kept
      (10L, Array(0.0f, 1.0f, 0f, 0f)),
      (11L, Array(0.001f, 1.0f, 0f, 0f))  // ≈10, same cluster → dup
    ).toDF("vec_id", "embedding")
    val pivots = Seq(
      (0L, Array(1.0f, 0.0f, 0f, 0f)),
      (1L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val stats = Similarity.semDedupStats(corpus, pivots,
        "embedding", "vec_id", "vec_id", tau = 0.9)
      .orderBy("vec_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getInt(3))).toSeq ==
      Seq((0L, 0), (1L, 1), (2L, 0), (10L, 0), (11L, 1)))
    // cluster-lowest ids have no lower-id mate → NULL max_cos
    assert(stats(0).isNullAt(2) && stats(3).isNullAt(2))
    // near-dup pair's max_cos is its pairwise cosine (> τ); kept vec's is < τ
    assert(stats(1).getDouble(2) > 0.9 && stats(2).getDouble(2) < 0.9)
    // apply face = exactly the non-dup rows of the corpus
    val survivors = Similarity.semDedup(corpus, pivots,
        "embedding", "vec_id", "vec_id", tau = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 2L, 10L))
  }

  test("randomProjection: bit-exact vs scalar left-fold reference; angle structure preserved") {
    val w = Similarity.hyperplaneWeights(4, 6)
    val vecs = Seq(
      (0L, Array(0.25f, -1.5f, 2.0f, 0.125f, -0.75f, 3.0f)),
      (1L, Array(1.0f, 0.5f, -0.25f, 2.0f, 0.0f, -1.0f)))
    val out = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.randomProjection(col("embedding"), w).as("p"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val expected = vecs.map { case (_, x) =>
      w.toSeq.map(row => row.zip(x).foldLeft(0.0) { case (acc, (wi, xi)) =>
        acc + wi.toDouble * xi.toDouble })
    }
    assert(out.map(_.toSeq).toSeq == expected)
    // identical vectors project identically → projected cosine 1 for (v, v)
    val v = vecs.head._2
    val self = Seq((0L, v), (1L, v)).toDF("vec_id", "embedding")
      .select(Similarity.randomProjection(col("embedding"), w).as("p"))
      .collect().map(_.getSeq[Double](0))
    assert(self(0) == self(1))
  }

  test("groupCentroidsMicro: exact int64 cell sums of micro-quantized components") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f)), (1L, Array(2.0f, 0.25f)),
      (2L, Array(-1.0f, 0.0f))).toDF("label", "embedding").repartition(3)
    val out = Similarity.groupCentroidsMicro(df, "embedding", "label")
      .orderBy("label", "pos").collect()
    // (label, pos, n, sum_micro, mean_micro)
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq ==
      Seq((1L, 0, 2L, 3000000L, 1500000.0), (1L, 1, 2L, -250000L, -125000.0),
          (2L, 0, 1L, -1000000L, -1000000.0), (2L, 1, 1L, 0L, 0.0)))
  }

  test("marginFromPairs: hub neighbors are demoted below exclusive matches") {
    // b1 is a hub (high cosine to every a); b2 matches only a1. Raw cosine
    // prefers b1 for a1 (90 > 89); the margin criterion flips to b2.
    val pairs = Seq(
      (1L, 10L, 90L), (1L, 20L, 89L),
      (2L, 10L, 95L), (2L, 20L, 10L),
      (3L, 10L, 96L), (3L, 20L, 11L)).toDF("a_id", "b_id", "c_micro")
    val best = Similarity.marginFromPairs(pairs, k = 2)
      .orderBy("a_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(best.head == ((1L, 20L)))
    // hub-free sides keep their raw-cosine winner
    assert(best.toSeq.drop(1) == Seq((2L, 10L), (3L, 10L)))
  }

  test("marginFromPairs: rank filters compile to WindowGroupLimit") {
    val pairs = Seq((1L, 10L, 90L), (1L, 20L, 80L), (2L, 10L, 70L))
      .toDF("a_id", "b_id", "c_micro")
    val plan = Similarity.marginFromPairs(pairs, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("ivfGraphSearch: soft-assignment graph hop recovers a cross-list neighbor") {
    // Pivots on the axes; c's PRIMARY list is p1 but its secondary is p0,
    // so the soft graph links it to list-0 members. A query probing ONLY
    // list 0 (nprobe=1) misses c seed-wise; the one-hop expansion must
    // recover it — the coarse-quantization miss the layer exists to fix.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val pivots = Seq((100L, v(1, 0, 0, 0)), (101L, v(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(1, 0.05, 0, 0)),  // list 0
      (2L, v(0.95, 0.1, 0, 0)), // list 0
      (3L, v(0.6, 0.8, 0, 0)),  // primary list 1, secondary list 0
      (4L, v(0.05, 1, 0, 0))    // list 1
    ).toDF("vec_id", "embedding")
    val query = Seq((0L, v(1, 0.1, 0, 0))).toDF("vec_id", "embedding")
    val index = Similarity.ivfAssign(corpus, pivots, "embedding", "vec_id", "vec_id")
    // Sanity: primary assignment puts 3 in list 1 — seeds alone can't see it.
    val asg = index.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(asg(3L) == 101L && asg(1L) == 100L)
    val soft = Similarity.ivfSoftAssign(corpus, pivots, "embedding", "vec_id",
      "vec_id", r = 2)
    val graph = Similarity.ivfNeighborGraph(soft, "embedding", "vec_id", m = 2)
    val got = Similarity.ivfGraphSearch(index, pivots, graph, query,
        "embedding", "vec_id", "vec_id", k = 3, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L)) // 3 only reachable via the hop
  }

  test("ivfAssignAll: every corpus column rides along with the assignment") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val pivots = Seq((100L, v(1, 0)), (101L, v(0, 1))).toDF("vec_id", "embedding")
    val corpus = Seq((1L, v(1, 0.1), 7, "en"), (2L, v(0.1, 1), 3, "fr"))
      .toDF("vec_id", "embedding", "label", "lang")
    val idx = Similarity.ivfAssignAll(corpus, pivots, "embedding", "vec_id")
    assert(idx.columns.toSeq ==
      Seq("vec_id", "embedding", "label", "lang", "centroid_id"))
    val rows = idx.orderBy("vec_id").collect()
    assert(rows(0).getAs[Long]("centroid_id") == 100L &&
      rows(0).getAs[String]("lang") == "en")
    assert(rows(1).getAs[Long]("centroid_id") == 101L &&
      rows(1).getAs[Int]("label") == 3)
  }

  test("ivfSearchFiltered: adaptive probing survives a filter-emptied best list") {
    // Query points at cluster B (list 101), but the predicate keeps ONLY
    // cluster A members — the best-ranked list has ZERO survivors. A fixed
    // nprobe=1 search over the filtered index returns nothing; the
    // coverage-driven probe rule must extend into list 100 and reproduce
    // the filtered brute-force exactly.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val pivots = Seq((100L, v(1, 0, 0, 0)), (101L, v(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(1, 0.0, 0, 0), 1), (2L, v(1, 0.2, 0, 0), 1),
      (3L, v(1, 0.4, 0, 0), 1),                        // cluster A, label 1
      (11L, v(0.0, 1, 0, 0), 0), (12L, v(0.2, 1, 0, 0), 0)
    ).toDF("vec_id", "embedding", "label")
    val query = Seq((0L, v(0.1, 1, 0, 0))).toDF("vec_id", "embedding")
    val index = Similarity.ivfAssignAll(corpus, pivots, "embedding", "vec_id")
    // sanity: the best-ranked list for this query is 101, all label 0
    val fixedNprobe1 = Similarity.ivfSearch(
      index.filter(col("label") === 1).select("vec_id", "embedding", "centroid_id"),
      pivots, query, "embedding", "vec_id", "vec_id", k = 2, nprobe = 1)
    assert(fixedNprobe1.count() == 0)
    val got = Similarity.ivfSearchFiltered(index, pivots, query,
        col("label") === 1, "embedding", "vec_id", "vec_id",
        k = 2, minCandidates = 2)
      .collect().map(_.getLong(0)).toSeq
    val want = Similarity.bruteForceTopK(
        corpus.filter(col("label") === 1), query, "embedding", "vec_id", 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("ivfApplyDelta: incremental maintenance equals a full rebuild") {
    import graft.operators.Sinks
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val pivots = Seq((100L, v(1, 0)), (101L, v(0, 1))).toDF("vec_id", "embedding")
    val v1 = Seq(
      (1L, v(1, 0.1)), (2L, v(0.9, 0.2)),   // list 100
      (3L, v(0.1, 1))                        // list 101
    ).toDF("vec_id", "embedding")
    val v2 = Seq(
      (1L, v(1, 0.1)),                       // unchanged
      (3L, v(1, 0.05)),                      // CHANGED: moves 101 → 100
      (4L, v(0.2, 1))                        // added (list 101); 2 removed
    ).toDF("vec_id", "embedding")
    val index1 = Similarity.ivfAssignAll(v1, pivots, "embedding", "vec_id")
    val delta = Sinks.diffTables(v1, v2, Seq("vec_id"))
    val got = Similarity.ivfApplyDelta(index1, delta, v2, "vec_id",
        pivots, "embedding", "vec_id")
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val want = Similarity.ivfAssignAll(v2, pivots, "embedding", "vec_id")
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == want)
    assert(got == Set(1L -> 100L, 3L -> 100L, 4L -> 101L))
  }

  test("ivfSplitRebalance: drift fires the decision, splits rebalance, pre-drift stays KEEP") {
    import org.apache.spark.sql.functions._
    val embD = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pivots = embD.filter(col("vec_id") < 8)
    val v0 = embD.filter(col("vec_id") === 0)
    def maxLoadMicro(asg: org.apache.spark.sql.DataFrame): Long = {
      val m = asg.groupBy(col("centroid_id")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")), sum(col("n")), count(lit(1))).first()
      m.getLong(0) * m.getLong(2) * 1000000L / m.getLong(1)
    }
    // pre-drift: the standing index is balanced — the decision rule says KEEP
    val pre = Similarity.ivfSplitRebalance(embD, pivots, "embedding", "vec_id", "vec_id", v0, iters = 0)
    assert(maxLoadMicro(pre.head._1) <= 1500000L, maxLoadMicro(pre.head._1).toString)
    // post-drift: one cell overloads ~4.4×; three split iterations bring it
    // back under threshold with C constant and monotone improvement
    val drifted = embD.crossJoin(broadcast(v0.select(col("embedding").as("qv"))))
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
        zip_with(col("embedding"), col("qv"), (x, q) => lit(0.9) * q + lit(0.1) * x).as("embedding"))
    val states = Similarity.ivfSplitRebalance(
      embD.unionByName(drifted), pivots, "embedding", "vec_id", "vec_id", v0, iters = 3)
    val loads = states.map(s => maxLoadMicro(s._1))
    assert(loads.head > 1500000L, loads.toString)
    assert(loads.last <= 1500000L, loads.toString)
    assert(loads == loads.sorted.reverse, s"trajectory must be non-increasing: $loads")
    assert(states.forall(_._2.count() == 8), "C must stay constant")
    // an ALREADY-BALANCED index must not grow C either (heaviest can tie
    // lightest — the retire step must pick the lightest OTHER cell)
    val balanced = Similarity.ivfSplitRebalance(
      embD, pivots, "embedding", "vec_id", "vec_id", v0, iters = 2)
    assert(balanced.forall(_._2.count() == 8),
      s"balanced index grew C: ${balanced.map(_._2.count())}")
    // degenerate corpus (|corpus| == C): every cell holds ≤1 member — the
    // loop stops instead of shrinking C below the pivot count
    val tiny = embD.filter(col("vec_id") < 8)
    val degen = Similarity.ivfSplitRebalance(
      tiny, pivots, "embedding", "vec_id", "vec_id", v0, iters = 3)
    assert(degen.map(_._2.count()).forall(_ == 8), s"degenerate case changed C")
    assert(degen.length == 1, "1-member cells cannot split; loop must stop")
  }

  test("rangedGlobalRank ≡ global row_number, C=1 stops cleanly, seeds never collide with live cids") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val embD = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // synthetic (id, cos) with heavy ties in cos — id must break them
    val scored = embD.select(col("vec_id"),
      (col("vec_id") % 7).cast("double").as("__cos"))
    val (ranked, n) = Similarity.rangedGlobalRank(scored, "vec_id", shards = 8)
    assert(n == scored.count())
    val got = ranked.select(col("vec_id"), col("__rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = scored.withColumn("__rk", row_number().over(
        Window.orderBy(col("__cos").desc, col("vec_id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
    // ranks are a permutation of 1..n
    assert(got.values.toSeq.sorted == (1L to n).toSeq)
    // ADVICE guard: a single-pivot index (C=1) cannot retire-and-split with
    // C constant — the loop must stop, not throw on an empty lightest set
    val pivots1 = embD.filter(col("vec_id") === 0)
    val v0 = embD.filter(col("vec_id") === 0)
    val one = Similarity.ivfSplitRebalance(
      embD, pivots1, "embedding", "vec_id", "vec_id", v0, iters = 2)
    assert(one.length == 1, "C=1 must stop after the initial assignment")
    assert(one.head._2.count() == 1)
    // duplicate vectors force a surviving pivot's cid-id row into the heavy
    // cell; the seed exclusion must keep centroid ids unique anyway
    val dup = embD.limit(40).crossJoin(
        broadcast(embD.filter(col("vec_id") === 3).select(col("embedding").as("__dv"))))
      .select(col("vec_id"), col("__dv").as("embedding"))
    val pivots3 = embD.filter(col("vec_id") < 3)
    val st = Similarity.ivfSplitRebalance(
      dup, pivots3, "embedding", "vec_id", "vec_id", v0, iters = 2)
    st.foreach { case (_, piv) =>
      val cids = piv.select("cid").collect().map(_.getLong(0))
      assert(cids.distinct.length == cids.length, s"duplicate cids: ${cids.toSeq}")
    }
  }

  test("rangedGlobalRank: randomized equivalence across sizes, shard counts, tie densities") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 4) {
      val n = 1 + rnd.nextInt(400)
      val shards = 1 + rnd.nextInt(40)       // incl. shards > n and shards = 1
      val mod = 1 + rnd.nextInt(8)           // heavy-tie regimes
      val scored = (0 until n).map(i => (i.toLong, rnd.nextInt(mod).toDouble))
        .toDF("vec_id", "__cos")
      val (ranked, total) = Similarity.rangedGlobalRank(scored, "vec_id", shards)
      assert(total == n)
      val got = ranked.select("vec_id", "__rk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = scored.withColumn("__rk", row_number().over(
          Window.orderBy(col("__cos").desc, col("vec_id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"n=$n shards=$shards mod=$mod")
    }
  }

  test("ivfPatchIndex covers delta ingest: inserts land, deletes purge stale rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val s = new graft.Session.Scratch
    val path = s"${s.dir}/patch_delta"
    // old: ids 1..6 over lists 10,20; new: id 2 DELETED, id 7 INSERTED
    // into 20, id 5 moves 20→10; list 30 exists untouched via id 9
    val oldAsg = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
        (6L, 20L), (9L, 30L))
      .toDF("vec_id", "centroid_id")
    val newAsg = Seq((1L, 10L), (3L, 10L), (5L, 10L), (4L, 20L), (6L, 20L),
        (7L, 20L), (9L, 30L))
      .toDF("vec_id", "centroid_id")
    Similarity.ivfWriteIndex(oldAsg, path)
    val (rw, del) = Similarity.ivfPatchIndex(spark, path, oldAsg, newAsg, "vec_id")
    assert(rw == 2L && del == 0L, s"($rw, $del)") // lists 10 and 20 rewritten
    val got = Similarity.ivfOpenIndex(spark, path)
      .select(col("vec_id"), col("centroid_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val want = newAsg.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == want, s"patched index diverges: $got vs $want")
    s.close()
  }

  test("ivfPatchIndex: untouched lists keep their exact files, retired vanish, patched ≡ fresh") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val s = new graft.Session.Scratch
    val path = s"${s.dir}/patch_idx"
    // old layout: lists 1,2,3,9; new: 2 moves to (new) 4, 3's members fold
    // into 2 (3 retired), 9 untouched
    val oldAsg = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L), (6L, 3L),
      (7L, 9L), (8L, 9L)).toDF("vec_id", "centroid_id")
    val newAsg = Seq((1L, 1L), (2L, 4L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 2L),
      (7L, 9L), (8L, 9L)).toDF("vec_id", "centroid_id")
    Similarity.ivfWriteIndex(oldAsg, path)
    def files(c: Long) = Option(new java.io.File(s"$path/centroid_id=$c").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified, f.length)).toSet
    val untouchedBefore = files(9L)
    assert(untouchedBefore.nonEmpty)
    val (nRw, nDel) = Similarity.ivfPatchIndex(spark, path, oldAsg, newAsg, "vec_id")
    // moved rows: 2(1→4), 3(2→1), 5,6(3→2) → cids {1,4,2,3}; 3 retired
    assert((nRw, nDel) == (3L, 1L), s"($nRw, $nDel)")
    assert(files(9L) == untouchedBefore, "untouched partition was rewritten")
    assert(!new java.io.File(s"$path/centroid_id=3").exists(), "retired list survived")
    val patched = Similarity.ivfOpenIndex(spark, path)
      .select(col("vec_id"), col("centroid_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(patched == newAsg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
