package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.Fns
import graft.queries.PipelineQueries

/** Unit coverage for the north-star operator packs at semantics level (the
  * oracle gate covers end-to-end values at sf0.01). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact dedup: identical texts collapse, survivor = min id") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id")
      .select("doc_id", "n_copies").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash signature: identical docs share all K hashes; candidates found") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6 w7"), (2L, "w1 w2 w3 w4 w5 w6 w7"),
                 (3L, "q r s t u v x")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(df, "text", "doc_id", 8, 5)
    val rows = sig.orderBy("doc_id").collect()
    assert(rows(0).toSeq.drop(1) == rows(1).toSeq.drop(1)) // same text → same sig
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 4, 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("lshQualityAudit: PASSes the tuned config, flags a recall-starved one") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val good = Dedup.lshQualityAudit(docs, "text", "doc_id",
      PipelineQueries.MinhashK, PipelineQueries.ShingleW, bands = 4, rows = 2).first()
    assert(good.getAs[String]("verdict") == "PASS", good)
    assert(good.getAs[Long]("hit_hi") == good.getAs[Long]("n_hi"),
      s"tuned config should catch every hi-band pair on the planted fixture: $good")
    // ground truth is LSH-independent: the same buckets reappear under any
    // (bands, rows); only the catches move
    val bad = Dedup.lshQualityAudit(docs, "text", "doc_id",
      PipelineQueries.MinhashK, PipelineQueries.ShingleW, bands = 1, rows = 8).first()
    assert(bad.getAs[Long]("n_hi") == good.getAs[Long]("n_hi"))
    assert(bad.getAs[Long]("n_lo") == good.getAs[Long]("n_lo"))
    // one band of all 8 rows = AND over the full signature — near-exact
    // matching. The audit must SAY so: catches fall below the (now much
    // lower) S-curve expectation only if pairs are imperfect; at minimum
    // the expectation itself collapses and recall drops for any hi pair
    // that is not byte-identical
    assert(bad.getAs[Long]("exp_hi_micro") < good.getAs[Long]("exp_hi_micro"),
      s"S-curve expectation must collapse for (1,8): $bad vs $good")
    assert(bad.getAs[Long]("hit_hi") <= good.getAs[Long]("hit_hi"))
  }

  test("simhash: equal text → equal hash; 16-bit range") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "totally different words here now yes"))
      .toDF("doc_id", "text")
    val out = Dedup.simhash16(df, "text", "doc_id", 5).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == out(1).getLong(1))
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 65536))
  }

  test("jaccard: identical=1.0, disjoint pairs absent (not candidates)") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(df, "text", "doc_id", 8, 5)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 4, 2)
    val j = Dedup.jaccardForPairs(pairs, df, "text", "doc_id", 5).collect()
    assert(j.length == 1 && j(0).getDouble(2) == 1.0)
  }

  test("cosine: orthogonal=0, identical=1") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 1)
    val out = Similarity.bruteForceTopK(df, q, "embedding", "vec_id", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out(0)._2 == 1.0 && out(1)._2 == 1.0) // ids 1 and 3 (colinear)
    assert(out(2) == (2L, 0.0))
  }

  test("sign-LSH: identical vectors share a bucket; deterministic weights") {
    val w1 = Similarity.hyperplaneWeights(6, 4)
    val w2 = Similarity.hyperplaneWeights(6, 4)
    assert(w1.map(_.toSeq).toSeq == w2.map(_.toSeq).toSeq)
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val b = df.withColumn("bkt", Similarity.signBucket($"embedding", w1))
      .select("bkt").collect().map(_.getLong(0))
    assert(b(0) == b(1))
  }

  test("langId: stopword votes and CJK short-circuit") {
    val df = Seq((1L, "the cat and the dog is in a house of cards"),
                 (2L, "el que de la casa y los gatos"),
                 (3L, "中文 text here")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text").as("l")).orderBy("id")
      .collect().map(_.getString(1))
    assert(out.toSeq == Seq("en", "es", "zh"))
  }

  test("bm25: exact int stats, score matches the closed-form formula") {
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, "text", "doc_id")
      .orderBy("doc_id", "term").collect()
    // (doc, term, tf, df, dl): doc1 {a:2, b:1} dl=3; doc2 {a:1, c:1} dl=2
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSeq ==
      Seq((1L, "a", 2L, 2L, 3), (1L, "b", 1L, 1L, 3), (2L, "a", 1L, 2L, 2), (2L, "c", 1L, 1L, 2)))
    // doc1/"a": N=2 docs, 5 total tokens, avgdl=2.5
    val expected = math.log((2.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0) *
      (2.0 * (1.2 + 1.0)) / (2.0 + 1.2 * (1.0 - 0.75 + 0.75 * (3.0 / 2.5)))
    assert(math.abs(out(0).getDouble(5) - expected) < 1e-12)
    // non-default (k1, b) — guards the folded-literal refactor: (1 - 0.9)
    // must be the IEEE subtraction, not an exact-decimal 0.1
    val out2 = TextAnalysis.bm25(df, "text", "doc_id", k1 = 0.5, b = 0.9)
      .orderBy("doc_id", "term").collect()
    val expected2 = math.log((2.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0) *
      (2.0 * (0.5 + 1.0)) / (2.0 + 0.5 * ((1.0 - 0.9) + 0.9 * (3.0 / 2.5)))
    assert(out2(0).getDouble(5) == expected2)
  }

  test("hashedLinearScore: fold ≡ explode+sum over the same bucket weights") {
    val df = Seq((1L, "alpha beta gamma alpha"), (2L, "zz q"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val ref = df.select($"doc_id", explode(TextAnalysis.words($"text")).as("w"))
      .select($"doc_id",
        TextAnalysis.classifierWeight(Fns.hashP($"w") % TextAnalysis.ClassifierBuckets).as("wt"))
      .groupBy("doc_id").agg(sum("wt").as("score_raw"))
      .orderBy("doc_id").collect()
    // docs with tokens match the explode+sum face exactly
    assert(out.take(2).map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      ref.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // empty doc: zero tokens, zero score, negative label
    assert(out(2).getInt(1) == 0 && out(2).getLong(2) == 0L && out(2).getInt(3) == 0)
    // label is the sign of score_raw
    assert(out.forall(r => r.getInt(3) == (if (r.getLong(2) > 0) 1 else 0)))
  }

  test("gopherWordStats: exact counts, ratios are single divisions") {
    val df = Seq((1L, "ab c12 ! Def"), (2L, "xyz")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherWordStats(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc1 tokens [ab, c12, !, Def]: n=4, sum_len=9, alpha {ab, Def}=2, digit {c12}=1
    assert((out(0).getInt(1), out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) ==
      ((4, 9L, 2L, 1L)))
    assert(out(0).getDouble(5) == 9.0 / 4.0 && out(0).getDouble(6) == 2.0 / 4.0
      && out(0).getDouble(7) == 1.0 / 4.0)
    assert((out(1).getInt(1), out(1).getLong(3), out(1).getDouble(6)) == ((1, 1L, 1.0)))
  }

  test("unigramLogProbMicro: hand-computed micro-nat sums") {
    val df = Seq((1L, "a a b"), (2L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProbMicro(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // ctf: a→3, b→1, total=4
    val lpA = math.floor(math.log(3.0 / 4.0) * 1e6).toLong
    val lpB = math.floor(math.log(1.0 / 4.0) * 1e6).toLong
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 2 * lpA + lpB), (2L, 1L, lpA)))
  }

  test("unigramLogProbAgainst: foreign LM with OOV floor") {
    val docs = Seq((1L, "a b zz"), (2L, "a a")).toDF("doc_id", "text")
    val lm = Seq(("a", 3L), ("b", 1L)).toDF("term", "ctf") // total = 4
    val out = TextAnalysis.unigramLogProbAgainst(docs, lm, "text", "doc_id")
      .orderBy("doc_id").collect()
    val lpA = math.floor(math.log(3.0 / 4.0) * 1e6).toLong
    val lpB = math.floor(math.log(1.0 / 4.0) * 1e6).toLong
    val oov = math.floor(math.log(1.0 / 5.0) * 1e6).toLong
    // (doc_id, n_tokens, lp_micro, n_oov); doc1 has one OOV token "zz"
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 3L, lpA + lpB + oov, 1L), (2L, 2L, 2 * lpA, 0L)))
  }

  test("unigramLogProbMicro ≡ Scala reference on random corpora (seeded)") {
    val rnd = new scala.util.Random(881)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (1 to 3).foreach { _ =>
      val docs = (1L to 20L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      // reference: same md5-free path — plain token counts + JVM Math.log,
      // which is the exact function Spark's `log` evaluates
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val ctf = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val total = ctf.values.sum.toDouble
      val lp = ctf.map { case (w, c) => w -> math.floor(math.log(c / total) * 1e6).toLong }
      val expected = toks.map { case (id, ws) =>
        (id, ws.size.toLong, ws.map(lp).sum)
      }.sortBy(_._1)
      val out = TextAnalysis.unigramLogProbMicro(docs.toDF("doc_id", "text"), "text", "doc_id")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(out == expected)
    }
  }

  test("stratifiedSample: randomized size + prefix laws (seeded)") {
    val rnd = new scala.util.Random(882)
    val rows = (1L to 120L).map(i => (i, s"g${rnd.nextInt(5)}"))
    val df = rows.toDF("doc_id", "source")
    val sizes = rows.groupBy(_._2).map { case (g, xs) => g -> xs.size }
    def sample(n: Int) = graft.operators.Curation
      .stratifiedSample(df, "source", "doc_id", n, "law")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val s3 = sample(3); val s7 = sample(7)
    // per-group size = min(n, |group|)
    assert(s3.groupBy(_._1).view.mapValues(_.length).toMap ==
      sizes.map { case (g, c) => g -> math.min(3, c) })
    assert(s7.groupBy(_._1).view.mapValues(_.length).toMap ==
      sizes.map { case (g, c) => g -> math.min(7, c) })
    // prefix property across arbitrary n
    assert(s3.toSet.subsetOf(s7.toSet))
  }

  test("fingerprint: deterministic, order-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("multimodal: frame rows = n_frames; frames computed on real decoded pixels") {
    val df = Seq((1L, "x" * 250), (2L, "y" * 50)).toDF("doc_id", "text")
    val media = Multimodal.asMedia(df, "text", "image")
    val frames = Multimodal.sampleFrames(
      media.select("doc_id", "media_bytes", "media_meta"), "doc_id")
    val byDoc = frames.groupBy("doc_id").count().orderBy("doc_id").collect()
    assert(byDoc.map(_.getLong(1)).toSeq == Seq(2L, 1L)) // floor(250/100)=2, max(floor(50/100),1)=1
    // The payload is a real PNG and frame values come from ImageIO-decoded
    // pixels — which equal the source bytes (lossless gray PNG). Exact pin:
    // doc 2 is "y"*50 → sample_byte = 'y' = 121 for its single frame.
    val f2 = frames.filter($"doc_id" === 2L).collect().head
    assert(f2.getInt(2) == 'y'.toInt)
  }

  test("duplicateClusters: transitive chains collapse to the min id (a-b, b-c → one cluster)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    // both paths: driver union-find (small input) and the distributed
    // star loop (forced with driverThreshold = 0) must agree
    for (thr <- Seq(Dedup.DriverUnionFindMaxEdges, 0L)) {
      val out = Dedup.duplicateClusters(pairs, driverThreshold = thr).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)   // chain via 2
      assert(out(10L) == 10L && out(11L) == 10L)                // separate component
      assert(Seq(20L, 21L, 22L, 23L).forall(out(_) == 20L))     // longer chain
    }
  }

  test("duplicateClusters: 300-node path converges within maxIters (O(log n), not O(diameter))") {
    // A diameter-299 chain: min-label propagation would need 299 rounds and
    // silently mislabel under any practical iteration cap; large-star /
    // small-star collapses it in O(log n) rounds.
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs, driverThreshold = 0).collect()
    assert(out.length == 300)
    assert(out.forall(_.getLong(1) == 1L), out.filter(_.getLong(1) != 1L).take(5).mkString(","))
  }

  test("duplicateClusters: random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    // distributed star loop and driver union-find both match ground truth
    for (thr <- Seq(0L, Dedup.DriverUnionFindMaxEdges)) {
      val out = Dedup.duplicateClusters(edges.toDF("id_a", "id_b"),
        driverThreshold = thr).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"thr=$thr")
    }
  }

  test("lshCandidatePairs: hot-bucket cap drops degenerate buckets instead of emitting m² pairs") {
    val m = 60
    val clones = (1 to m).map(i => (i.toLong, "the same boilerplate text repeated verbatim here"))
    val sig = Dedup.minhashSignature(clones.toDF("doc_id", "text"), "text", "doc_id", 8, 5)
    // uncapped: all m docs share every band bucket → m(m-1)/2 pairs
    assert(Dedup.lshCandidatePairs(sig, "doc_id", 4, 2).count() == m.toLong * (m - 1) / 2)
    // capped: the degenerate buckets are dropped entirely (exact-dedup owns
    // identical text); no quadratic pair blow-up
    assert(Dedup.lshCandidatePairs(sig, "doc_id", 4, 2, maxBucketSize = 10).count() == 0L)
    // cap above the bucket size changes nothing
    assert(Dedup.lshCandidatePairs(sig, "doc_id", 4, 2, maxBucketSize = m).count() == m.toLong * (m - 1) / 2)
  }

  test("duplicateClusters: uses a reliable checkpoint when the session has a checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
      val out = Dedup.duplicateClusters(pairs, driverThreshold = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
      // the reliable checkpoint actually wrote to the configured dir
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("knnJoinBucketed: exact within shared buckets, candidates ⊆ bucket mates, no corpus broadcast") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val weights = Similarity.hyperplaneWeights(4, 64)
    val queries = emb.filter(col("vec_id") < 5)
    val out = Similarity.knnJoinBucketed(emb, queries, "embedding", "vec_id", "vec_id",
      k = 3, weights = weights).collect()
    // each query shares its own bucket → finds itself at rank 1 with cos 1
    val top = out.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(q => assert(top(q) == q))
    // every (qid, hit) pair really is bucket-mates (candidate containment)
    val bkt = emb.select(col("vec_id"),
      Similarity.signBucket(col("embedding"), weights).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(bkt(r.getLong(0)) == bkt(r.getLong(1))))
    // ranks agree with brute force restricted to the bucket (spot-check qid 0)
    val q0 = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(3))
    assert(q0.map(_.getInt(3)).toSeq == (1 to q0.length))
  }

  test("IVF: every vector assigned to exactly one list; probed search finds the query itself") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pivots = emb.filter(col("vec_id") < 8)
    val index = Similarity.ivfAssign(emb, pivots, "embedding", "vec_id", "vec_id")
    assert(index.count() == emb.count()) // total assignment, no dup/drop
    assert(index.select("centroid_id").distinct().count() <= 8)
    // a pivot must be assigned to itself (cos=1 with itself, ties → own id among equals)
    val self = index.filter(col("vec_id") === 3).select("centroid_id").first().getLong(0)
    assert(self == 3L)
    val hits = Similarity.ivfSearch(index, pivots, emb.filter(col("vec_id") === 0),
      "embedding", "vec_id", "vec_id", k = 3, nprobe = 2).collect()
    assert(hits.head.getLong(0) == 0L && math.abs(hits.head.getDouble(1) - 1.0) < 1e-12)
    // probed candidates ⊆ brute force: every probed hit's cosine ≤ brute-force best
    val bf = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
      "embedding", "vec_id", 3).collect()
    assert(hits.head.getDouble(1) <= bf.head.getDouble(1) + 1e-12)
  }

  test("approx_count_distinct sketch lands within its configured error bound") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val rows = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
           countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("hash60 local mirrors the Column expression") {
    val fromCol = spark.range(1).select(Fns.hash60(lit("hp1_1"))).head().getLong(0)
    assert(fromCol == Fns.hash60Local("hp1_1"))
  }

  test("sparseCosineTopK ≡ dense tf-vector cosine reference (seeded corpora)") {
    val rng = new scala.util.Random(96)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 30L).map { id =>
      (id, Seq.fill(3 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(4)
    val out = TextAnalysis.sparseCosineTopK(df, df.filter(col("doc_id") < 3),
        "text", "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // Scala reference: same exact-int dot/norms, same one-division cosine
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.split(" ").groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    }.toMap
    val n2: Map[Long, Long] = tf.map { case (id, m) => id -> m.values.map(v => v * v).sum }
    val expected = (0L until 3L).flatMap { qid =>
      val scored = docs.map(_._1).filter(_ != qid).flatMap { did =>
        val dot = tf(qid).keysIterator
          .map(w => tf(qid)(w) * tf(did).getOrElse(w, 0L)).sum
        if (dot == 0) None
        else Some((did, dot.toDouble / math.sqrt((n2(qid) * n2(did)).toDouble)))
      }
      scored.sortBy { case (did, cos) => (-cos, did) }.take(4).zipWithIndex
        .map { case ((did, cos), i) => (qid, did, cos, i + 1) }
    }
    assert(out.sortBy(r => (r._1, r._4)).toSeq == expected)
  }

  test("bigramLogProbMicro: hand-computed conditional micro-nat sums") {
    val df = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProbMicro(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // c2: "a b"=2, "b a"=1, "a c"=1; marginals: a·=3, b·=1
    val lpAB = math.floor(math.log(2.0 / 3.0) * 1e6).toLong
    val lpBA = math.floor(math.log(1.0 / 1.0) * 1e6).toLong
    val lpAC = math.floor(math.log(1.0 / 3.0) * 1e6).toLong
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, lpAB + lpBA + lpAC), (2L, 1L, lpAB)))
  }

  test("rrfFuse: full-outer coverage, 0 markers for absent ids, exact scores") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = TextAnalysis.rrfFuse(a, b, "id", "rank", kRrf = 60)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // score is 1/(60+ra) + 1/(60+rb), absent list contributes 0 and marks 0
    assert(out.toSeq == Seq(
      (10L, 1L, 0L, 1.0 / 61),
      (20L, 2L, 1L, 1.0 / 62 + 1.0 / 61),
      (30L, 3L, 0L, 1.0 / 63),
      (40L, 0L, 2L, 1.0 / 62)))
  }

  test("incrementalDedup: digest kills copies, LSH kills near-dups, fresh survives") {
    import graft.operators.Dedup
    val old = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val nw = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),   // exact copy
      (11L, "alpha  beta gamma delta epsilon zeta eta  theta"), // ws-perturbed:
      // different md5, IDENTICAL shingle set (split on \\s+) -> every LSH
      // band matches -> caught by the near-dup pass, not the digest pass
      (12L, "one two three four five six seven eight")          // fresh
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(nw, old, "text", "doc_id",
        k = 8, w = 2, bands = 4, rows = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))
  }

  test("incrementalDedupIndexed ≡ self-contained form over sequential rounds") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text", "source")
    val c0 = docs.filter(col("source").isin("src0", "src1", "src2"))
    val b1 = docs.filter(col("source").isin("src3", "src4"))
    val b2 = docs.filter(col("source").isin("src5", "src6"))
    // reference: recompute the corpus side each round
    val k1Ref = Dedup.incrementalDedup(b1, c0, "text", "doc_id", 8, 5, 4, 2)
    val c1Ref = c0.unionByName(k1Ref)
    val k2Ref = Dedup.incrementalDedup(b2, c1Ref, "text", "doc_id", 8, 5, 4, 2)
    // indexed: corpus text touched exactly once, at index build
    val idx0 = Dedup.buildDedupIndex(c0, "text", "doc_id", 8, 5, 4, 2)
    val (k1, idx1) = Dedup.incrementalDedupIndexed(b1, idx0, "text", "doc_id", 8, 5, 4, 2)
    val (k2, _) = Dedup.incrementalDedupIndexed(b2, idx1, "text", "doc_id", 8, 5, 4, 2)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(k1) == ids(k1Ref))
    assert(ids(k2) == ids(k2Ref), "round-2 admission must see round-1 survivors' keys")
    assert(k1.columns.toSeq == b1.columns.toSeq, "survivors keep the batch schema")
  }

  test("pageRankMicro: hand-computed one-round values on a path graph") {
    import graft.operators.Dedup
    // path 1-2-3: deg = (1,2,1), N = 3, pr0 = 333333
    // contribs: s(1)=s(3)=floor(333333/2)=166666, s(2)=333333+333333
    // base = floor(((1-0.85)*1e6)/3) = 50000
    // pr1(1) = pr1(3) = 50000 + floor(0.85*166666) = 50000+141666 = 191666
    // pr1(2) = 50000 + floor(0.85*666666) = 50000+566666 = 616666
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.pageRankMicro(pairs, iters = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 191666L), (2L, 616666L), (3L, 191666L)))
    // more rounds keep the symmetry and the hub on top
    val r3 = Dedup.pageRankMicro(pairs, iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r3(0)._2 == r3(2)._2 && r3(1)._2 > r3(0)._2)
  }

  test("keepBestSurvivors: max metric wins, ties -> min id, loners pass") {
    val docs = Seq((1L, 5L, "t1"), (2L, 9L, "t2"), (3L, 9L, "t3"), (4L, 1L, "t4"))
      .toDF("doc_id", "n_chars", "text")
    // one cluster {1,2,3}: metric max 9 hit by 2 and 3 → min id 2 survives
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val out = Dedup.keepBestSurvivors(docs, clusters, "doc_id", "n_chars")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L, 4L))
  }

  test("vocabCoverage: tf-desc lexicographic cut, OOV counts per group") {
    val df = Seq(("g1", "a a b c"), ("g2", "b b d")).toDF("source", "text")
    // tf: b=3, a=2, c=1, d=1
    val v2 = TextAnalysis.vocabCoverage(df, "text", "source", 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(v2.toSeq == Seq(("g1", 4L, 1L, 1L), ("g2", 3L, 1L, 1L)))
    // V=3: c beats d on the lexicographic tiebreak at tf=1
    val v3 = TextAnalysis.vocabCoverage(df, "text", "source", 3)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(v3.toSeq == Seq(("g1", 4L, 0L, 0L), ("g2", 3L, 1L, 1L)))
  }

  test("pmiPairs: doc-frequency counts and micro-nat PMI, minSup floor") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d d a b"))
      .toDF("doc_id", "text")
    // N=4; df: a=4, b=3, c=1, d=1; pairs: (a,b)=3, (a,c)=1, (a,d)=1, (b,d)=1
    val out = TextAnalysis.pmiPairs(df, "text", "doc_id", minSup = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 1)
    val (a, b, nab, na, nb, pmi) = out(0)
    assert((a, b, nab, na, nb) == (("a", "b", 3L, 4L, 3L)))
    assert(pmi == math.floor(math.log(3.0 * 4.0 / (4.0 * 3.0)) * 1e6).toLong) // = 0
    // duplicate terms inside a doc count once (d d → one posting)
    val all = TextAnalysis.pmiPairs(df, "text", "doc_id", minSup = 1L).collect()
    assert(all.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("a", "b", 3L), ("a", "c", 1L), ("a", "d", 1L), ("b", "d", 1L)))
  }

  test("tokenizerFertility: hand-computed counts and exact divisions") {
    val df = Seq(("s1", "ab 12 c.d!")).toDF("source", "text")
    val r = TextAnalysis.tokenizerFertility(df, "text", "source").collect()(0)
    // regex tokens: ab | 12 | c | . | d | ! = 6; ws tokens 3; chars 10
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 3L, 10L)))
    assert(r.getDouble(4) == 6.0 / 3.0 && r.getDouble(5) == 10.0 / 6.0)
  }

  test("triangleCount: clique C(4,3)=4, chains contribute none") {
    // 4-clique {1,2,3,4} (4 triangles) + chain 5-6-7 (0) + lone edge 8-9
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L),
      (8L, 9L)).toDF("id_a", "id_b")
    val r = Dedup.triangleCount(pairs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((9L, 9L, 4L)))
  }

  test("psiMicro: identical populations score 0; a shift scores positive") {
    import graft.operators.TableStats
    val a = (1 to 100).map(i => i * 7 % 400).toDF("v")
    // identical distribution → every bin contributes exactly 0 nano-nats
    val same = TableStats.psiMicro(a, a, "v", 50.0, 9).collect()
    assert(same.nonEmpty && same.forall(_.getLong(3) == 0L))
    // shifted distribution → strictly positive total on the shared bins
    val b = (1 to 100).map(i => (i * 7 % 400) / 2 + 10).toDF("v")
    val drift = TableStats.psiMicro(a, b, "v", 50.0, 9)
      .agg(sum(col("psi_nano"))).collect()(0).getLong(0)
    assert(drift > 0L, s"psi=$drift")
  }
}
