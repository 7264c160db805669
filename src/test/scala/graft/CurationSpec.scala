package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Semantics-level coverage for the curation pack (the oracle gate covers
  * end-to-end values at sf0.01; q55-q59/q49 there). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii replaces emails, phones and IPs; counts see each class") {
    val t = "mail bob.smith+x@corp.example.org now 555-123-4567 host 192.168.0.1 end"
    val df = Seq(t).toDF("t").select(
      Curation.piiCount(col("t"), Curation.EmailPattern).as("e"),
      Curation.piiCount(col("t"), Curation.PhonePattern).as("p"),
      Curation.piiCount(col("t"), Curation.Ipv4Pattern).as("i"),
      Curation.redactPii(col("t")).as("r"))
    val r = df.collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((1, 1, 1)))
    assert(r.getString(3) == "mail <EMAIL> now <PHONE> host <IP> end")
  }

  test("redactPii leaves clean text untouched") {
    val t = "plain words 12 and dots. nothing else"
    val out = Seq(t).toDF("t").select(Curation.redactPii(col("t"))).first().getString(0)
    assert(out == t)
  }

  test("wordChunks: 23 words at width 10 → chunks of 10/10/3") {
    val t = (1 to 23).map(i => s"w$i").mkString(" ")
    val chunks = Seq(t).toDF("t")
      .select(Curation.wordChunks(col("t"), 10).as("c"))
      .first().getSeq[String](0)
    assert(chunks.length == 3)
    assert(chunks(0).split(" ").length == 10)
    assert(chunks(2) == "w21 w22 w23")
  }

  test("paragraphDedupStats: corpus-wide first occurrence survives") {
    // doc 1: [A, B], doc 2: [A, C], doc 3: [B, B] — survivors: 1/A 1/B 2/C.
    val df = Seq(
      (1L, Seq("A", "B")), (2L, Seq("A", "C")), (3L, Seq("B", "B"))
    ).toDF("doc_id", "paras")
    val out = Curation.paragraphDedupStats(df, col("paras"), "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("repetition metrics on crafted text") {
    // 6 words: "x y x y x z" → bigrams [x y, y x, x y, y x, x z]:
    // top bigram 2/5; top word 3/6; 2-word lines [x y, x y, x z] → dup 1/3.
    val df = Seq("x y x y x z").toDF("text")
    val r = df.select(
      Curation.dupLineFrac(Curation.wordChunks(col("text"), 2)).as("d"),
      Curation.topNgramFrac(col("text"), 2).as("g"),
      Curation.topWordFrac(col("text")).as("w")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0 / 3) < 1e-15)
    assert(math.abs(r.getDouble(1) - 2.0 / 5) < 1e-15)
    assert(math.abs(r.getDouble(2) - 3.0 / 6) < 1e-15)
  }

  test("decontaminationHits finds shared 3-grams; removeContaminated drops the doc") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox" with test
      (2L, "totally clean words here now")
    ).toDF("doc_id", "text")
    val testSet = Seq((100L, "a quick brown fox appears")).toDF("doc_id", "text")
    val hits = Curation.decontaminationHits(corpus, testSet, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((1L, 1L)))
    val clean = Curation.removeContaminated(corpus, testSet, "text", "doc_id", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("hashSample is deterministic and monotone in pct") {
    val df = spark.range(0, 1000).toDF("id")
    val s30 = Curation.hashSample(df, "id", 30, "s").select("id").as[Long].collect().toSet
    val s30b = Curation.hashSample(df, "id", 30, "s").select("id").as[Long].collect().toSet
    val s60 = Curation.hashSample(df, "id", 60, "s").select("id").as[Long].collect().toSet
    assert(s30 == s30b)                  // pure function of (salt, id)
    assert(s30.subsetOf(s60))            // bucket < 30 ⊆ bucket < 60
    assert(s30.size > 200 && s30.size < 400) // ~30% ± slack
    // a different salt draws a different sample
    val sAlt = Curation.hashSample(df, "id", 30, "t").select("id").as[Long].collect().toSet
    assert(sAlt != s30)
  }

  test("mixSources honors per-source rates (0 drops all, 100 keeps all)") {
    val df = (0 until 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = Curation.mixSources(df, "id", "src", Map("a" -> 100, "b" -> 0), 50, "m")
      .select("src").as[String].collect()
    assert(out.toSet == Set("a") && out.length == 50)
  }

  test("quantizeInt8: max-abs scaling, away-from-zero ties, zero-vector guard") {
    import graft.operators.Similarity
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
    val out = df.select(col("id"), Similarity.quantizeInt8(col("v")).as("q"))
      .orderBy("id").collect()
    // maxabs=1: 127·1=127, 127·(−0.5)=−63.5 → −64 (away from zero), 31.75 → 32
    assert(out(0).getSeq[Int](1) == Seq(127, -64, 32))
    assert(out(1).getSeq[Int](1) == Seq(0, 0, 0)) // 0/1e-30 → 0, not NaN
  }

  test("quantizedCosine: self-similarity exactly 1.0, order tracks float cosine") {
    import graft.operators.Similarity
    val a = Seq(1.0f, 0.0f, 0.5f)
    val near = Seq(0.9f, 0.1f, 0.45f)
    val far = Seq(-1.0f, 0.2f, 0.0f)
    val df = Seq((0L, a), (1L, near), (2L, far)).toDF("id", "v")
    val codes = df.select(col("id"), Similarity.quantizeInt8(col("v")).as("q"))
    val q0 = codes.filter(col("id") === 0).select(col("q").as("qq"))
    val scored = codes.crossJoin(broadcast(q0))
      .select(col("id"), Similarity.quantizedCosine(col("q"), col("qq")).as("qcos"))
      .orderBy(col("qcos").desc).collect()
    assert(scored(0).getLong(0) == 0L && scored(0).getDouble(1) == 1.0)
    assert(scored(1).getLong(0) == 1L && scored(2).getLong(0) == 2L)
  }

  test("packSequences: concat-and-chunk bins and offsets per group") {
    val df = Seq((1L, "g", 100), (2L, "g", 200), (3L, "g", 100), (4L, "h", 300))
      .toDF("id", "grp", "tok")
    val out = Curation.packSequences(df, "id", "grp", col("tok"), budget = 256)
      .select("id", "bin_id", "bin_offset").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // g: cum_before 0,100,300 → bins 0,0,1, offsets 0,100,44; h restarts at 0
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 100L), (3L, 1L, 44L), (4L, 0L, 0L)))
  }

  test("removeBoilerplateLines: C4 rules — punct, min words, markers, braces") {
    val lines = Seq(
      "This sentence is long enough and ends well.",   // kept
      "Too short.",                                    // < 4 words
      "no terminal punctuation in this line",          // no punct
      "Enable JavaScript to view this content.",       // marker (case-insens)
      "We use cookie tracking on this site!",          // marker
      "Lorem ipsum dolor sit amet consectetur.",       // marker
      "function f() { return 1; }",                    // brace
      "Does a question mark count as terminal?",       // kept
      "He said \"quoted endings count too\"")          // kept (quote)
    val out = Seq(lines).toDF("ls")
      .select(Curation.removeBoilerplateLines(col("ls"), minWords = 4).as("k"))
      .first().getSeq[String](0)
    assert(out == Seq(lines(0), lines(7), lines(8)))
  }

  test("url blocklist: exact, subdomain, case-variant blocked; others kept") {
    val df = Seq(
      (0L, "https://spam.example.com/p/0"),        // exact
      (1L, "https://tracker.ads.example.net/p/1"), // subdomain
      (2L, "https://docs.example.org/p/2"),        // kept
      (3L, "https://Ads.Example.NET/p/3"),         // case-variant
      (4L, "http://notads.example.net/p/4"),       // kept: not a subdomain
      (5L, "https://ads.example.net:8080/p/5"))    // blocked: port stripped
      .toDF("doc_id", "url")
    val kept = Curation.filterBlockedUrls(df, "url",
        Seq("spam.example.com", "ads.example.net"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 4L))
    val hosts = df.select(Curation.urlHost(col("url"))).collect().map(_.getString(0))
    assert(hosts(3) == "ads.example.net" && hosts(5) == "ads.example.net")
  }

  test("distinctShingleHashes kernel ≡ array_distinct(wordShingles)→hashP, in order") {
    import graft.functions.{Fns, TextHashExprs}
    // real corpus rows + crafted edges: duplicate grams, doc shorter than w
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(50)
      .union(Seq((9001L, "a b c a b c a b"), (9002L, "only two")).toDF("doc_id", "text"))
    val kernel = docs
      .select(col("doc_id"), TextHashExprs.distinctShingleHashes(col("text"), 3).as("ghs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val decl = docs
      .select(col("doc_id"), explode(array_distinct(Fns.wordShingles(col("text"), 3))).as("g"))
      .select(col("doc_id"), Fns.hashP(col("g")).as("gh"))
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.toSeq.map(_.getLong(1)) }
    assert(kernel.keySet == decl.keySet)
    kernel.foreach { case (id, hs) => assert(hs == decl(id), s"doc $id") }
  }

  test("per-document metrics plan shuffle-free (scan-stage only)") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = df.select(
        Curation.dupLineFrac(Curation.wordChunks(col("text"), 5)),
        Curation.topNgramFrac(col("text"), 2),
        Curation.redactPii(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    val classifierPlan = graft.operators.TextAnalysis
      .hashedLinearScore(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!classifierPlan.contains("Exchange"))
  }

  test("stratifiedSample: exact size, rank-prefix monotone, partition-immune") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    def keys(n: Int, d: org.apache.spark.sql.DataFrame) =
      Curation.stratifiedSample(d, "source", "doc_id", n, "salt")
        .select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val s10 = keys(10, df)
    assert(s10.size == 20 && s10.count(_._1 == "a") == 10)
    // the n=5 sample is a prefix of the n=10 sample (rank-prefix property)
    assert(keys(5, df).subsetOf(s10))
    // partitioning cannot change the chosen sample
    assert(keys(10, df.repartition(7)) == s10)
    // n above the group size returns the whole group
    assert(keys(1000, df).size == 100)
    // the rank-≤-n filter must compile to a WindowGroupLimit (per-partition
    // top-n below the exchange) — the property the SCALE claim rests on
    val plan = Curation.stratifiedSample(df, "source", "doc_id", 10, "salt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("dupSpanStats: shared grams count as duplicated, unique docs score 0") {
    // docs 1 and 2 share their full text (every 2-gram duplicated); doc 3
    // is unique (0 duplicated); doc 4 shares one 2-gram with docs 1/2.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"),
      (4L, "a b q r")).toDF("doc_id", "text")
    val out = Curation.dupSpanStats(docs, "text", "doc_id", w = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0), (3L, 3L, 0L, 0.0),
      (4L, 3L, 1L, 1.0 / 3.0)))
    // apply face drops the fully-duplicated docs at a 0.5 threshold
    val kept = Curation.removeDupSpanDocs(docs, "text", "doc_id", 2, maxDupFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("lengthQuantiles: exact ⌈p·n⌉ ranks per group, tie-stable") {
    import graft.operators.TextAnalysis
    // group g1: lengths 1..10 (n=10) → p25→rank3, p50→rank5, p75→rank8,
    // p90→rank9, p99→rank10; group g2: n=1 → every p picks the only row
    val docs = ((1 to 10).map(i => ("g1", i.toLong, ("w " * i).trim)) :+
      ("g2", 99L, "a b c")).toDF("source", "doc_id", "text")
    val out = TextAnalysis.lengthQuantiles(docs, "source", "doc_id",
        TextAnalysis.wsTokenCount(col("text")))
      .orderBy("source", "pl").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      ("g1", "p25", 3), ("g1", "p50", 5), ("g1", "p75", 8),
      ("g1", "p90", 9), ("g1", "p99", 10),
      ("g2", "p25", 3), ("g2", "p50", 3), ("g2", "p75", 3),
      ("g2", "p90", 3), ("g2", "p99", 3)))
  }

  test("canonicalizeUrl: every rewrite rule plus the non-rules") {
    val cases = Seq(
      // scheme/host case + default port + trailing slash
      "HTTP://Example.COM:80/a/b/" -> "http://example.com/a/b",
      "https://X.Example.ORG:443/p" -> "https://x.example.org/p",
      // non-default port, path case, trailing slash
      "https://Example.net:8080/Keep/Case/" -> "https://example.net:8080/Keep/Case",
      // fragment
      "https://h.example/a?id=5#frag" -> "https://h.example/a?id=5",
      // utm: leading, middle, trailing, lone, multiple
      "https://h.example/p?utm_source=f&id=5" -> "https://h.example/p?id=5",
      "https://h.example/p?id=5&utm_a=1&utm_b=2" -> "https://h.example/p?id=5",
      "https://h.example/p?utm_a=1" -> "https://h.example/p",
      "https://h.example/p?a=1&utm_x=2&b=3" -> "https://h.example/p?a=1&b=3",
      // root slash kept; clean URL untouched; port-like path segment kept
      "http://example.com/" -> "http://example.com/",
      "https://ok.example/x?a=1&b=2" -> "https://ok.example/x?a=1&b=2",
      "http://h.example/80/x" -> "http://h.example/80/x")
    val out = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl(col("url"))).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
  }

  test("gopherFilter: each rule sets its reason bit; exact rational boundaries") {
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd"),                       // n=4 in [3,5]; ml=4; top=1/4 ≤ 1/2 → keep
      (2L, "aaa bbbb"),                                  // too short only (bit0; mean 3.5 in band)
      (3L, "aaaa bbbb cccc dddd eeee ffff"),             // too long (bit1)
      (4L, "aaaaaaaa bbbbbbbb cccccccc dddddddd"),       // mean_len 8 > 5 (bit2)
      (5L, "aaaa aaaa aaaa dddd"),                       // top 3/4 > 1/2 (bit3)
      (6L, "a a a a")                                    // mean 1 < 3 AND top 4/4 (bits 2+3)
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "text", "doc_id",
        minTokens = 3, maxTokens = 5,
        meanLenMin = (3, 1), meanLenMax = (5, 1), topWordMax = (1, 2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getInt(5)))
    assert(out.toSeq == Seq((1L, 0, 1), (2L, 1, 0), (3L, 2, 0),
      (4L, 4, 0), (5L, 8, 0), (6L, 12, 0)))
    // boundary is EXACT: mean_len == max (5.0) and top == max (1/2) both pass
    val edge = Seq((7L, "aaaaa bbbbb aaaaa ccccc")).toDF("doc_id", "text")
    val e = Curation.gopherFilter(edge, "text", "doc_id", 3, 5, (3, 1), (5, 1), (1, 2))
      .collect()(0)
    assert(e.getInt(4) == 0 && e.getInt(5) == 1)
  }

  test("removeDupSpans: covered tokens drop everywhere but the first doc") {
    // docs 1 and 2 share the 2-gram "b c" (and only that); doc 3 is unique.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "x b c y"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val out = Curation.removeDupSpans(docs, "text", "doc_id", w = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 is the first occurrence → keeps everything; doc 2 loses tokens
    // at the shared gram's span (positions of "b c"); doc 3 untouched.
    assert(out.toSeq == Seq(
      (1L, 4L, 4L, "a b c d"),
      (2L, 4L, 2L, "x y"),
      (3L, 4L, 4L, "p q r s")))
  }

  test("removeDupSpans: identical docs — first keeps all, second empties") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Curation.removeDupSpans(docs, "text", "doc_id", w = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 3L, 3L, "a b c"), (2L, 3L, 0L, "")))
  }

  test("mixtureWeights: sqrt temperature up-weights the small source") {
    val docs = Seq(
      (1L, "a b c d e f g h i", "big"),   // 9 tokens
      (2L, "x", "small")                  // 1 token
    ).toDF("doc_id", "text", "source")
    val out = Curation.mixtureWeights(docs, "text", "source", budgetTokens = 100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // sqrt(9):sqrt(1) = 3:1 -> w_temp 0.75/0.25 (vs w_prop 0.9/0.1);
    // eff_epochs = w_temp * 100 / n_tokens
    assert(out.toSeq == Seq(
      ("big", 9L, 0.9, 0.75, 0.75 * 100 / 9),
      ("small", 1L, 0.1, 0.25, 25.0)))
  }

  test("budgetSample: greedy prefix respects the boundary rule and partitioning") {
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(10)("w").mkString(" "), if (i <= 20) "a" else "b"))
      .toDF("doc_id", "text", "source")
    // equal sources -> w_temp = 0.5 each -> 100-token budget per source
    val out = Curation.budgetSample(docs, "text", "doc_id", "source", 200L, "s")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc.keySet == Set("a", "b"))
    bySrc.foreach { case (_, rows) =>
      assert(rows.forall(_._4 == 100L))
      val kept = rows.map(_._3).sum
      // greedy: kept reaches the budget, overshooting by less than one doc
      assert(kept >= 100L && kept - 10L < 100L)
    }
    // partition-invariant selection
    val ids = out.map(_._2).toSet
    val ids7 = Curation.budgetSample(docs.repartition(7), "text", "doc_id",
      "source", 200L, "s").collect().map(_.getLong(0)).toSet
    assert(ids == ids7)
    // a budget covering everything keeps everything
    assert(Curation.budgetSample(docs, "text", "doc_id", "source", 100000L, "s")
      .count() == 40L)
  }

  test("epochShuffle: dense in-shard positions, partition/salt behavior") {
    val docs = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Curation.epochShuffle(docs, "doc_id", "e1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 200 && out.map(_._1).toSet.size == 200)
    // positions are dense 0..n-1 within every shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // pure function of (salt, id): repartitioning the input changes nothing
    val out7 = Curation.epochShuffle(docs.repartition(7), "doc_id", "e1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == out7.sortBy(_._1).toSeq)
    // a different salt is a different permutation
    val out2 = Curation.epochShuffle(docs, "doc_id", "e2", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq != out2.sortBy(_._1).toSeq)
  }

  test("materializeEpochs: copies in {floor(e), floor(e)+1}, dense copy_idx") {
    // two equal sources, 10 docs × 10 tokens each → w_temp = 1/2 per source;
    // budget 300 → eff_epochs = 150/100 = 1.5 exactly
    val docs = (0L until 20L)
      .map(i => (i, if (i < 10) "a" else "b", Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = Curation.materializeEpochs(docs, "text", "doc_id", "source", 300L, "s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1)
    // every doc keeps >= floor(1.5)=1 copy; Bernoulli tops up to 2
    assert(byDoc.values.forall(c => c.length == 1 || c.length == 2))
    assert(byDoc.values.forall(c => c.map(_._3).sorted.toSeq == (1L to c.length)))
    // frac=0.5: with 20 docs some get 1 and some get 2 (hash-dependent but
    // deterministic — pinned by the equality below)
    assert(byDoc.values.exists(_.length == 1) && byDoc.values.exists(_.length == 2))
    // pure function of (salt, id): partitioning-immune
    val out7 = Curation.materializeEpochs(docs.repartition(7), "text", "doc_id",
      "source", 300L, "s").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(r => (r._1, r._3)).toSeq == out7.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("reservoirSample: exact k, partitioning-immune, salt varies the draw") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Curation.reservoirSample(docs, "doc_id", 10, "sA")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a.length == 10 && a.distinct.length == 10)
    val a7 = Curation.reservoirSample(docs.repartition(7), "doc_id", 10, "sA")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == a7) // pure function of (salt, k, id-set)
    val b = Curation.reservoirSample(docs, "doc_id", 10, "sB")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a != b) // fresh salt = fresh draw
    // the plan is a bounded top-k, not a global sort
    val plan = Curation.reservoirSample(docs, "doc_id", 10, "sA")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("maskTokens: rewrite and count agree; masking is a pure word function") {
    val df = Seq((1L, "aa bb cc aa dd ee ff gg hh"), (2L, "aa aa aa")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        Curation.maskTokens(col("text"), "t", 3).as("m"),
        Curation.maskedTokenCount(col("text"), "t", 3).as("n"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getInt(2)))
    rows.foreach { case (_, m, n) =>
      assert(m.split(" ").count(_ == "<mask>") == n) // rewrite matches count
    }
    // position-independence: every occurrence of a word shares one fate
    val (_, m1, n1) = rows.find(_._1 == 2L).get
    assert(n1 == 0 || n1 == 3, s"aa must mask all-or-nothing, got $m1")
  }

  test("denseSurrogates: exact 0..n-1 bijection, partition-immune, round trip") {
    val ids = (1L to 97L).map(i => (i * 13 % 101, s"e$i"))  // dup + gappy ids
    val df = ids.toDF("uid", "payload")
    val vault = Curation.denseSurrogates(df, "uid", "salty", shards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = df.select("uid").distinct().count()
    // dense bijection over distinct ids
    assert(vault.size == n && vault.values.toSeq.sorted == (0L until n))
    // stable under different partitioning
    val vault2 = Curation.denseSurrogates(df.repartition(7), "uid", "salty", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vault2 == vault)
    // surrogate order is hash order, not id order (no order leak)
    assert(vault.toSeq.sortBy(_._1).map(_._2) != (0L until n).toSeq)
    // apply + re-identify round trip preserves every row
    val vaultDf = Curation.denseSurrogates(df, "uid", "salty", 8)
    val applied = Curation.applyPseudonyms(df, vaultDf, "uid")
    assert(applied.count() == df.count())
    assert(applied.select("uid").distinct().count() == n)
  }

  test("dedup index artifact: publish/load round-trips, versions pin history") {
    import graft.operators.{Dedup, Sinks}
    val s = new graft.Session.Scratch
    val dir = s"${s.dir}/didx"
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("id", "text")
    val idx = Dedup.buildDedupIndex(corpus, "text", "id", 8, 3, 4, 2)
    assert(Dedup.publishDedupIndex(idx, dir) == 1)
    val loaded = Dedup.loadDedupIndex(spark, dir)
    // loaded key-frames ≡ built key-frames, both directions
    assert(loaded.digests.except(idx.digests).isEmpty &&
      idx.digests.except(loaded.digests).isEmpty)
    assert(loaded.bandSigs.except(idx.bandSigs).isEmpty &&
      idx.bandSigs.except(loaded.bandSigs).isEmpty)
    // admit a batch with the loaded index, publish the maintained index
    val batch = Seq((3L, "alpha beta gamma delta epsilon zeta"), // exact dup
      (4L, "seven eight nine ten eleven twelve")).toDF("id", "text")
    val (kept, nidx) = Dedup.incrementalDedupIndexed(batch, loaded,
      "text", "id", 8, 3, 4, 2)
    assert(kept.select("id").as[Long].collect().toSeq == Seq(4L))
    assert(Dedup.publishDedupIndex(nidx, dir) == 2)
    // pinned v1 still serves the PRE-admission index (history intact)
    val v1 = Dedup.loadDedupIndex(spark, dir, Some(1))
    assert(v1.digests.count() == 2 &&
      Dedup.loadDedupIndex(spark, dir).digests.count() == 3)
    s.close()
  }
}
