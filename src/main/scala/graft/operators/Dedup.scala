package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Fns, TextHashExprs}

/** Deduplication pack — north-star LLM-pipeline operators (BASELINE.json;
  * SURVEY §7.2 step 9). The reference has no dedup; these are designed
  * Spark-first for 100 TB:
  *
  *  - exact: hash-groupBy on content digest — one shuffle keyed by md5, no
  *    full-text comparison ever crosses the wire (digest is 32 bytes/row).
  *  - MinHash+LSH: shingle → K universal hashes → B bands of R → bucket
  *    join. The only shuffle is keyed by (band, signature); true pair
  *    candidates are generated without any n² comparison. Hot buckets (skew)
  *    are handled by AQE skew-join splitting; a signature that collides for a
  *    large fraction of the corpus indicates degenerate text and should be
  *    length-capped upstream.
  *  - SimHash: 16-bit sign-fingerprint via explode + groupBy (one partial-agg
  *    shuffle; map-side combine applies since the agg is sum/count-shaped).
  *  - Jaccard verify: exact n-gram Jaccard on the LSH candidate pairs only.
  *
  * Everything is built from codegen'd built-ins (no UDFs); oracle SQL for
  * each op is authored from the same constants in [[graft.functions.Fns]].
  */
object Dedup {

  /** Exact dedup: survivor per content digest = min doc id. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Corpus-level exact dedup: returns the FULL surviving rows (lowest id
    * per content digest) — the `dropDuplicates`-shaped face of [[exact]].
    *
    * Shape: survivor ids via `groupBy(digest).agg(min(id))` — the exchange
    * carries only (16-byte digest, id), never the text (PlansSpec asserts
    * this) — then a left-semi join back on id. The earlier window
    * formulation (`row_number over partition by md5(text)`) sorted FULL
    * rows through one exchange: the whole corpus text through a shuffle at
    * 100 TB. Here the corpus side still streams once through the join, but
    * Spark can inject a runtime bloom/InSubquery filter on `id`, and with a
    * bucketed or id-partitioned corpus the join exchange disappears
    * entirely — the window shape can never avoid it.
    *
    * CONTRACT: `idCol` must be non-null and unique (it is the survivor key
    * and the join-back key). A NULL id never matches the null-rejecting
    * semi-join predicate, so null-id rows are dropped from the output —
    * unlike a `dropDuplicates`-style window, which would retain one such
    * row per digest. Pre-assign ids (`monotonically_increasing_id`) if the
    * corpus lacks them. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val survivors = df
      .select(md5(col(textCol)).as("__digest"), col(idCol).as("__sid"))
      .groupBy(col("__digest"))
      .agg(min(col("__sid")).as("__sid"))
      .select(col("__sid"))
    df.join(survivors, df(idCol) === survivors("__sid"), "left_semi")
  }

  /** Per-row MinHash signature columns m1..mK over word-w-gram shingles.
    * One compiled pass per document ([[TextHashExprs.minhashSig]]) — no
    * explode, no groupBy shuffle; signature cost scales with bytes scanned.
    * Values are identical to the declarative explode→hashP→groupBy-min
    * formulation (exact int64 arithmetic, same md5). */
  def minhashSignature(df: DataFrame, textCol: String, idCol: String,
                       k: Int, w: Int): DataFrame = {
    val sig = TextHashExprs.minhashSig(col(textCol), w, k)
    val terms = (1 to k).map(i => element_at(col("__sig"), i).as(s"m$i"))
    df.select(col(idCol) +: sig.as("__sig") +: Nil: _*)
      .select(col(idCol) +: terms: _*)
  }

  /** LSH candidate pairs: B bands of R rows each; docs sharing any band
    * signature become a candidate pair (idA < idB).
    *
    * `maxBucketSize` guards against degenerate buckets: a (band, sig) bucket
    * holding m docs emits m·(m−1)/2 pairs, so one boilerplate family shared
    * by 1M docs would explode into 5·10¹¹ pairs. Buckets above the cap are
    * dropped BEFORE the self-join (their members are near-identical
    * boilerplate — the exact-dedup pass handles them at digest cost, and at
    * B bands each doc has B−1 more chances to pair normally). The guard is a
    * count window over the same (band, sig) key the join shuffles on — no
    * extra shuffle. Default = no cap (exact LSH semantics).
    */
  /** (id, band, sig) banded signatures from [[minhashSignature]] columns —
    * the LSH bucketing key, shared by [[lshCandidatePairs]] (intra-corpus
    * pairs) and [[incrementalDedup]] (batch-vs-corpus membership). */
  def bandedSignatures(sig: DataFrame, idCol: String,
                       bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val ms = (1 to rows).map(r => col(s"m${b * rows + r}"))
      struct(lit(b + 1).as("band"), concat_ws("_", ms: _*).as("sig"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def lshCandidatePairs(sig: DataFrame, idCol: String,
                        bands: Int, rows: Int,
                        maxBucketSize: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded0 = bandedSignatures(sig, idCol, bands, rows)
    val exploded =
      if (maxBucketSize == Int.MaxValue) exploded0
      else {
        val w = Window.partitionBy(col("band"), col("sig"))
        exploded0.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= maxBucketSize)
          .drop("__bn")
      }
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Incremental (batch-vs-corpus) dedup — the crawl-ingest path: drop rows
    * of `newDf` that exact-duplicate (same md5 digest) or near-duplicate
    * (any shared LSH band signature) a document already in `oldDf`, WITHOUT
    * re-clustering the existing corpus. Returns the surviving `newDf` rows.
    *
    * Scale: this is the operation that keeps ingest O(batch), not O(corpus).
    * The corpus side collapses to its distinct digests and distinct
    * (band, sig) keys — both tiny relative to the text, both precomputable
    * and storable as the corpus's standing "dedup index". The two rejection
    * passes are a digest-keyed anti-join and a (band,sig)-keyed semi-join →
    * anti-join, all runtime-filter friendly; batch text never shuffles (the
    * digest and signature are computed in the scan stage). Intra-batch
    * duplicates are NOT removed here — run [[dropExactDuplicates]] /
    * [[lshCandidatePairs]] within the batch for that. */
  def incrementalDedup(newDf: DataFrame, oldDf: DataFrame, textCol: String,
                       idCol: String, k: Int, w: Int,
                       bands: Int, rows: Int): DataFrame = {
    val oldDigests = oldDf.select(md5(col(textCol)).as("__digest")).distinct()
    val s1 = newDf.withColumn("__digest", md5(col(textCol)))
      .join(oldDigests, Seq("__digest"), "left_anti")
      .drop("__digest")
    val oldBands = bandedSignatures(
        minhashSignature(oldDf, textCol, idCol, k, w), idCol, bands, rows)
      .select(col("band"), col("sig")).distinct()
    val hitIds = bandedSignatures(
        minhashSignature(s1, textCol, idCol, k, w), idCol, bands, rows)
      .join(oldBands, Seq("band", "sig"), "left_semi")
      .select(col(idCol)).distinct()
    s1.join(hitIds, Seq(idCol), "left_anti")
  }

  /** The corpus's STANDING dedup index — the precomputed state
    * [[incrementalDedup]]'s scaladoc promises, made first-class: the
    * corpus's distinct content digests and distinct LSH (band, sig) keys.
    * Both are tiny relative to the text and both maintain by APPENDING an
    * admitted batch's own keys, so steady-state admission never touches
    * corpus text again — O(Δ) per round instead of the O(corpus)
    * signature recompute the self-contained form pays. */
  final case class DedupIndex(digests: DataFrame, bandSigs: DataFrame)

  def buildDedupIndex(corpus: DataFrame, textCol: String, idCol: String,
                      k: Int, w: Int, bands: Int, rows: Int): DedupIndex =
    DedupIndex(
      corpus.select(md5(col(textCol)).as("__digest")).distinct(),
      bandedSignatures(minhashSignature(corpus, textCol, idCol, k, w),
        idCol, bands, rows).select(col("band"), col("sig")).distinct())

  /** Admit `batch` against a PRECOMPUTED [[DedupIndex]]: returns
    * (survivors, updated index). Row-for-row ≡
    * [[incrementalDedup]](batch, corpus) — spec-pinned — but the corpus
    * side is two key-frames, never text: the batch's signatures compute
    * ONCE and serve both the rejection join and the index update (the
    * admitted rows' keys union in). Persist the returned index frames
    * (or localCheckpoint between rounds) so the lineage doesn't re-chain. */
  def incrementalDedupIndexed(batch: DataFrame, index: DedupIndex,
                              textCol: String, idCol: String, k: Int, w: Int,
                              bands: Int, rows: Int): (DataFrame, DedupIndex) = {
    val withDigest = batch.withColumn("__digest", md5(col(textCol)))
    val s1 = withDigest.join(index.digests, Seq("__digest"), "left_anti")
    // batch-sized intermediates consumed TWICE (rejection + index update) —
    // materialize so the admission joins run once, not per consumer
    val s1Bands = bandedSignatures(
      minhashSignature(s1, textCol, idCol, k, w), idCol, bands, rows)
      .localCheckpoint()
    val hitIds = s1Bands.join(index.bandSigs, Seq("band", "sig"), "left_semi")
      .select(col(idCol)).distinct()
    val kept = s1.join(hitIds, Seq(idCol), "left_anti").localCheckpoint()
    val updated = DedupIndex(
      index.digests.unionByName(kept.select(col("__digest"))).distinct(),
      index.bandSigs.unionByName(
          s1Bands.join(kept.select(col(idCol)), Seq(idCol), "left_semi")
            .select(col("band"), col("sig")))
        .distinct())
    (kept.drop("__digest"), updated)
  }

  /** Persist a [[DedupIndex]] as ONE versioned snapshot artifact — the
    * q195 artifact discipline applied to the standing dedup state: both
    * key-frames ride a single union-schema table (`kind` discriminates
    * digest rows from (band, sig) rows), so a publish is ONE atomic
    * pointer swap (two separate tables could commit torn), every admission
    * round's index is a pinned, time-travelable version, and a FRESH
    * session (a restarted ingest job) loads the index from disk instead of
    * rebuilding it from corpus text — the whole point of the standing
    * index at 100 TB. Returns the committed version. */
  def publishDedupIndex(index: DedupIndex, tableDir: String): Int = {
    import org.apache.spark.sql.types.IntegerType
    val rows = index.digests
      .select(lit("digest").as("kind"), col("__digest").as("digest"),
        lit(null).cast(IntegerType).as("band"),
        lit(null).cast("string").as("sig"))
      .unionByName(index.bandSigs
        .select(lit("band").as("kind"), lit(null).cast("string").as("digest"),
          col("band"), col("sig")))
    graft.operators.Sinks.writeSnapshot(rows, tableDir)
  }

  /** Load a published index (the committed version, or a pinned one). */
  def loadDedupIndex(spark: org.apache.spark.sql.SparkSession,
                     tableDir: String,
                     version: Option[Int] = None): DedupIndex = {
    val t = graft.operators.Sinks.readSnapshot(spark, tableDir, version)
    DedupIndex(
      t.filter(col("kind") === "digest").select(col("digest").as("__digest")),
      t.filter(col("kind") === "band").select(col("band"), col("sig")))
  }

  /** PageRank over the undirected duplicate-pair graph (pairs as produced by
    * [[lshCandidatePairs]]: (id_a, id_b), id_a < id_b) — node centrality in
    * the duplication graph ranks the template/boilerplate hubs that
    * connected components ([[duplicateClusters]]) lumps into one label.
    *
    * Every iteration is micro-quantized so partial-agg ordering cannot
    * drift: contributions are ⌊pr_micro/deg⌋ (one IEEE division each), the
    * neighbor sum is exact int64, and the damped update is base +
    * ⌊d·sum⌋ (one multiply). Both engines run the identical chain, so ranks
    * hash-match exactly after any number of rounds. Quantization floor-loss
    * (≤1 micro-unit per hop) is far below any ranking-relevant signal.
    *
    * Scale: the classic edges-only iteration — each round shuffles
    * (dst, int64) contributions keyed by node, partial-aggregated map-side;
    * node state is (id, deg, pr_micro). Degrees and the node count are
    * computed once; the |V|-row count rides a broadcast. `iters` is a fixed
    * small constant (rank separation, not convergence, is the goal). */
  def pageRankMicro(pairs: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // The pair generator upstream (LSH banding, verification joins) is the
    // expensive subtree, and edges/nodes feed EVERY iteration below: left
    // lazy, the unrolled plan re-derives them per iteration (plan size and
    // planning/codegen time grow ~linearly in iters, and each iteration
    // re-executes the generator). One localCheckpoint pins the edge list —
    // edges-only payload, the same discipline as duplicateClusters' loop.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val nodes = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
      .localCheckpoint()
    val nRow = broadcast(nodes.agg(count(lit(1)).as("__n")))
    // Fold (1-d)*1e6 HERE and splice the folded literal into both faces —
    // in-SQL folding would be DuckDB DECIMAL math, not this IEEE product
    // (the BM25 lesson).
    val baseNum = (1.0 - damping) * 1000000.0
    var pr = nodes.crossJoin(nRow)
      .select(col("id"), col("deg"),
        floor(lit(1000000.0) / col("__n").cast("double")).cast("long").as("pr_micro"))
    for (_ <- 1 to iters) {
      val contrib = pr
        .select(col("id").as("__cid"),
          floor(col("pr_micro").cast("double") / col("deg").cast("double"))
            .cast("long").as("__c"))
        .join(edges, col("__cid") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__s"))
        .select(col("dst").as("id"), col("__s"))
      pr = nodes.join(contrib, Seq("id"), "left").crossJoin(nRow)
        .select(col("id"), col("deg"),
          (floor(lit(baseNum) / col("__n").cast("double")).cast("long")
            + floor(lit(damping) * coalesce(col("__s"), lit(0L)).cast("double"))
                .cast("long")).as("pr_micro"))
    }
    pr.select(col("id"), col("pr_micro"))
  }

  /** Oracle face of [[pageRankMicro]]: unrolled CTE chain over a `pairsCte`
    * exposing (id_a, id_b); ends in `prr$iters` = (id, deg, pr). */
  def pageRankMicroSql(pairsCte: String, iters: Int, damping: Double = 0.85): String = {
    val dE = s"CAST(${damping} AS DOUBLE)"
    val baseE = s"CAST(${(1.0 - damping) * 1000000.0} AS DOUBLE)"
    val head =
      s"""pr_e AS (SELECT id_a AS src, id_b AS dst FROM $pairsCte
         |         UNION ALL SELECT id_b, id_a FROM $pairsCte),
         |pr_d AS (SELECT src AS id, COUNT(*) AS deg FROM pr_e GROUP BY 1),
         |pr_n AS (SELECT COUNT(*) AS n FROM pr_d),
         |prr0 AS (SELECT id, deg,
         |    CAST(floor(CAST(1000000.0 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS pr
         |  FROM pr_d, pr_n)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""prc$i AS (SELECT e.dst AS id,
         |    CAST(SUM(CAST(floor(CAST(p.pr AS DOUBLE) / CAST(p.deg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s
         |  FROM prr${i - 1} p JOIN pr_e e ON p.id = e.src GROUP BY 1),
         |prr$i AS (SELECT d.id, d.deg,
         |    CAST(floor($baseE / CAST(n AS DOUBLE)) AS BIGINT)
         |      + CAST(floor($dE * CAST(COALESCE(c.s, 0) AS DOUBLE)) AS BIGINT) AS pr
         |  FROM pr_d d LEFT JOIN prc$i c USING (id), pr_n)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Duplicate clustering: connected components over candidate/verified
    * pairs — every document labeled with the smallest doc id reachable
    * through the pair graph (the cluster's canonical survivor).
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", 2014): converges in O(log n)
    * rounds vs O(graph diameter) for plain min-label propagation — chained
    * boilerplate families at corpus scale make diameter the driver-loop
    * bottleneck, log n stays ≤ ~40 for any realistic corpus. Each star op is
    * a window + distinct over the EDGE list only (near-duplicate pairs, not
    * the corpus); the driver loop is control-flow only.
    *
    * Per round exactly one scan of the previous edge set materializes the
    * next one (`localCheckpoint` — truncates lineage so the plan stays
    * constant-size across rounds; on a real cluster flip this to a reliable
    * `checkpoint` dir) plus one trivial in-memory aggregate that decides
    * convergence: the next set equals the previous iff |next| == |prev| and
    * every next edge exists in prev — count + containment folded into a
    * single job, no separate per-round `count()` over recomputed lineage.
    */
  /** Edge-count threshold below which clustering runs as a driver-side
    * union-find instead of the distributed star loop: 1M edges is ~16 MB on
    * the driver and resolves in milliseconds, where the loop would pay
    * ~2·log n tiny-job round-trips. The SAME adaptive instinct as Spark's
    * broadcast threshold; the distributed path is the 100 TB contract and
    * stays fully exercised in specs (threshold=0). */
  val DriverUnionFindMaxEdges: Long = 1L << 20

  def duplicateClusters(pairs: DataFrame, maxIters: Int = 25,
                        driverThreshold: Long = DriverUnionFindMaxEdges): DataFrame = {
    // Canonical down-pointing edge set (src > dst), materialized ONCE — the
    // upstream lineage (e.g. the LSH pipeline) never re-runs after this.
    val edges0 = materialize(pairs
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("src"),
              least(col("id_a"), col("id_b")).as("dst"))
      .distinct())
    var edges = edges0
    var prevCount = edges.count()
    if (prevCount <= driverThreshold) return driverUnionFind(edges0, prevCount)
    var converged = prevCount == 0L
    var i = 0
    while (!converged && i < maxIters) {
      val next = materialize(smallStar(largeStar(edges)))
      val stats = next
        .join(edges.withColumn("__old", lit(1)), Seq("src", "dst"), "left")
        .agg(count(lit(1)).as("n"), count(col("__old")).as("n_in_old"))
        .head()
      val n = stats.getLong(0)
      converged = n == prevCount && stats.getLong(1) == n
      edges = next
      prevCount = n
      i += 1
    }
    // Fixpoint = star forest: every non-minimum node has exactly one edge to
    // its component minimum; centers (the minima) have none → label self.
    val nodes = edges0.select(col("src").as("doc_id"))
      .union(edges0.select(col("dst").as("doc_id")))
      .distinct()
    val stars = edges.groupBy(col("src")).agg(min(col("dst")).as("__lbl"))
    nodes.join(stars, nodes("doc_id") === stars("src"), "left")
      .select(col("doc_id"), coalesce(col("__lbl"), col("doc_id")).as("cluster_id"))
  }

  /** Quality-aware dedup APPLY: keep, per duplicate cluster, the row that
    * maximizes `metricCol` (ties → smallest `idCol`), plus every unclustered
    * row — "keep the best copy", vs [[duplicateClusters]]' min-id survivor
    * rule that can discard a full document in favor of its truncated twin.
    * `clusters` is (`idCol`, cluster_id) from [[duplicateClusters]]. Output
    * = the surviving `docs` rows (original schema).
    *
    * Scale: the winner election is `max_by` over a struct — a partial-agg
    * whose shuffle carries (cluster_id, metric, id) triples only, never the
    * row payload; survivors come back via a left-semi join on the id.
    * `metricCol` must be totally ordered and engine-portable (ints; NOT raw
    * doubles, whose oracle-side agg order could differ). */
  def keepBestSurvivors(docs: DataFrame, clusters: DataFrame, idCol: String,
                        metricCol: String): DataFrame = {
    val mapped = docs.select(col(idCol), col(metricCol))
      .join(clusters.select(col(idCol), col("cluster_id")), Seq(idCol), "left")
    // max_by key struct(metric, -id): max metric, then min id — total since
    // ids are unique, so the election is deterministic (no max_by tie risk).
    val winners = mapped.filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id")
      .agg(max_by(col(idCol), struct(col(metricCol), negate(col(idCol)))).as(idCol))
      .select(col(idCol))
    val loners = mapped.filter(col("cluster_id").isNull).select(col(idCol))
    docs.join(winners.union(loners), Seq(idCol), "left_semi")
  }

  /** Small-graph fast path: collect the (already-tiny, already-distinct)
    * edge list and run path-compressed union-find on the driver — exact
    * same labels as the distributed fixpoint, in one job + O(E α(E)) local
    * work. */
  private def driverUnionFind(edges: DataFrame, count: Long): DataFrame = {
    val spark = edges.sparkSession
    val local = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new java.util.HashMap[Long, Long](math.max(16, (count * 2).toInt))
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrDefault(root, root) != root) root = parent.get(root)
      var cur = x // path compression
      while (parent.getOrDefault(cur, cur) != cur) {
        val next = parent.get(cur); parent.put(cur, root); cur = next
      }
      root
    }
    local.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins → label = min reachable id
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val nodes = local.flatMap(e => Seq(e._1, e._2)).distinct
    import spark.implicits._
    nodes.map(n => (n, find(n))).toSeq.toDF("doc_id", "cluster_id")
  }

  /** Materialize + truncate lineage: a RELIABLE checkpoint when the session
    * has a checkpoint dir configured (the cluster path — survives executor
    * loss), else a local checkpoint (single-JVM dev/test). */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Large-star: each node connects its LARGER neighbors to the minimum of
    * its closed neighborhood. Input edges must point down (src > dst); the
    * symmetric view is built here. Output edges again point down. */
  private def largeStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    val w = Window.partitionBy(col("src"))
    sym.select(col("src"), col("dst"),
        least(min(col("dst")).over(w), col("src")).as("__m"))
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .distinct()
  }

  /** Small-star: each node connects its SMALLER neighbors (and itself) to
    * the minimum of that neighborhood. Preserves the down-pointing
    * invariant; alternating with [[largeStar]] reaches the min-star forest
    * fixpoint in O(log n) rounds. */
  private def smallStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("src"))
    val withM = e.select(col("src"), col("dst"), min(col("dst")).over(w).as("__m"))
    withM.filter(col("dst") =!= col("__m"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .union(withM.select(col("src"), col("__m").as("dst")))
      .distinct()
  }

  /** 16-bit SimHash from word-w-gram shingle hashes: bit j set iff the
    * (+1/-1) vote sum over shingles at bit j is positive. One compiled pass
    * per document — no explode, no 16-way partial-agg shuffle. */
  def simhash16(df: DataFrame, textCol: String, idCol: String, w: Int): DataFrame =
    df.select(col(idCol), TextHashExprs.simhash16(col(textCol), w).as("simhash"))

  /** Exact word-w-gram Jaccard for given candidate pairs. `docs` must carry
    * (idCol, textCol). Shuffles are keyed by shingle/doc — no n² compare.
    * Set elements are the int64 shingle HASHES, not the strings: the join and
    * distinct shuffle 8-byte keys instead of ~5-word strings (the oracle
    * hashes identically, so any collision affects both engines equally).
    * Only docs that actually appear in `pairs` are shingled (left-semi prune
    * BEFORE the explode): the candidate set is typically orders of magnitude
    * smaller than the corpus, and exploding the full corpus into |text|-many
    * shingle rows for it is the classic unpushed filter. */
  def jaccardForPairs(pairs0: DataFrame, docs: DataFrame,
                      textCol: String, idCol: String, w: Int): DataFrame = {
    // Pin the candidate pairs once: they are consumed 4× downstream (the
    // member semi-join plus 3 references in [[jaccardOnShingles]]); left
    // lazy, each consumer re-derives the whole pair generator — for q33 the
    // full minhash→LSH self-join subtree (plan was 1,149 lines / 50
    // Exchanges / 32 parquet scans). Pinned payload is two int64 ids/row.
    val pairs = materialize(pairs0)
    jaccardOnShingles(pairs, shingledMembers(pairs, docs, textCol, idCol, w))
  }

  /** Lazy pair-member word-shingle table (exposed for plan tests): the
    * semi-join prune must sit BELOW the shingle explode. */
  private[graft] def shingledMembers(pairs: DataFrame, docs: DataFrame,
      textCol: String, idCol: String, w: Int): DataFrame =
    pairMembers(pairs, docs, idCol).select(col(idCol).as("did"),
      explode(TextHashExprs.shingleHashes(col(textCol), w)).as("s"))

  /** Char n-gram variant: same pipeline over character shingle hashes. */
  def charJaccardForPairs(pairs0: DataFrame, docs: DataFrame,
                          textCol: String, idCol: String, n: Int): DataFrame = {
    val pairs = materialize(pairs0) // same 4-consumer pinning as above
    jaccardOnShingles(pairs,
      pairMembers(pairs, docs, idCol).select(col(idCol).as("did"),
        explode(TextHashExprs.charShingleHashes(col(textCol), n)).as("s")))
  }

  /** Docs restricted to ids that occur in the candidate pairs. */
  /** Exact triangle count over an undirected pair graph (`id_a < id_b`
    * distinct edges) — the clustering-coefficient primitive that tells
    * template/boilerplate cliques (triangle-dense) apart from chain-shaped
    * accidental collisions in the dup graph.
    *
    * Algorithm: DEGREE-ORDERED ORIENTATION (the MapReduce-classic from
    * Suri & Vassilvitskii, WWW'11): orient every edge from the endpoint
    * with the smaller (degree, id) to the larger, enumerate wedges only
    * from each node's OUT-edges, and close them against the oriented edge
    * set. Out-degree under this orientation is O(√m), so wedge count is
    * Σ outdeg² = O(m^1.5) — never the Σ deg² hub blow-up of naive wedge
    * counting; every step is an equi-join keyed on a node id, no
    * cartesian. Output: one row (n_nodes, n_edges, n_triangles). */
  def triangleCount(pairs0: DataFrame): DataFrame = {
    // The pair generator upstream (LSH banding) feeds FOUR references of
    // `pairs` and four of `deg` below; left lazy, the plan re-derives the
    // whole generator per reference (q169's plan: 2,876 lines, 140
    // Exchanges, 88 parquet scans). Pin the edge list and the degree
    // table once — edges-only payloads, the pageRankMicro/duplicateClusters
    // discipline.
    val pairs = pairs0.localCheckpoint()
    val deg = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val withDeg = pairs
      .join(deg.select(col("id").as("id_a"), col("d").as("__da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("d").as("__db")), "id_b")
    val fwd = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("id_a") < col("id_b"))
    val oe = withDeg.select(
      when(fwd, col("id_a")).otherwise(col("id_b")).as("u"),
      when(fwd, col("id_b")).otherwise(col("id_a")).as("v"))
    val oed = oe.join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
    val e1 = oed.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val e2 = oed.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("v1") < col("v2")))
    val tris = wedges.join(oe.select(col("u").as("v1"), col("v").as("v2")),
      Seq("v1", "v2"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tris.agg(count(lit(1)).as("n_triangles")))
  }

  /** Oracle face of [[triangleCount]] over a `pairs(id_a, id_b)` CTE. */
  def triangleCountSql(pairsCte: String): String =
    s"""tc_deg AS (SELECT id, COUNT(*) AS d FROM (
       |    SELECT id_a AS id FROM $pairsCte UNION ALL SELECT id_b FROM $pairsCte) t
       |  GROUP BY id),
       |tc_oe AS (SELECT
       |    CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.id_a < p.id_b)
       |      THEN p.id_a ELSE p.id_b END AS u,
       |    CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.id_a < p.id_b)
       |      THEN p.id_b ELSE p.id_a END AS v
       |  FROM $pairsCte p JOIN tc_deg da ON p.id_a = da.id
       |  JOIN tc_deg db ON p.id_b = db.id),
       |tc_oed AS (SELECT oe.u, oe.v, dv.d AS dv
       |  FROM tc_oe oe JOIN tc_deg dv ON oe.v = dv.id),
       |tc_tri AS (SELECT COUNT(*) AS n_tri FROM tc_oed e1
       |  JOIN tc_oed e2 ON e1.u = e2.u
       |    AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
       |  JOIN tc_oe e3 ON e3.u = e1.v AND e3.v = e2.v),
       |tc_out AS (SELECT (SELECT COUNT(*) FROM tc_deg) AS n_nodes,
       |  (SELECT COUNT(*) FROM $pairsCte) AS n_edges,
       |  (SELECT n_tri FROM tc_tri) AS n_triangles)""".stripMargin

  private def pairMembers(pairs: DataFrame, docs: DataFrame, idCol: String): DataFrame =
    docs.join(
      pairs.select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct(),
      Seq(idCol), "left_semi")

  /** LSH quality-contract audit — the q88/q142 discipline for MinHash: an
    * audit that can say a bad (bands, rows) choice is bad, from the data
    * alone.
    *
    * Ground truth is LSH-independent: EVERY pair sharing ≥1 distinct
    * w-gram (inverted shingle index self-join), with its exact Jaccard.
    * Any pair with Jaccard > 0 shares a gram, so the index finds the
    * complete ground truth above any positive threshold — no sampling, no
    * LSH in the loop. Pairs bucket at the S-curve's exact rational
    * thresholds (j ≥ 1/2, the (1/B)^(1/R) midpoint for B=4/R=2, via
    * integer cross-multiplication: 3·∩ ≥ |A|+|B|; j ≥ 1/4 via 5·∩) and
    * each bucket reports measured catches vs the S-curve expectation
    * Σ 1−(1−j^R)^B — evaluated as a fixed left-associated multiply chain
    * (engine-identical IEEE ops, no pow), micro-floored, and summed
    * exactly in int64 (sum-order-free). One verdict row: the audit PASSes
    * when high-band catches reach ≥70% of their own S-curve expectation
    * AND sub-threshold pairs don't over-fire past 3× theirs.
    *
    * Scale: the inverted-index self-join is the classic all-true-pairs
    * bound — at 100 TB run it on a deterministic-hash document sample, or
    * cap shingle document-frequency (a gram in >F docs is boilerplate; its
    * pairs belong to the exact-dedup pass) — the audit's verdict is a
    * property of the (bands, rows) choice, not of corpus completeness. */
  def lshQualityAudit(docs: DataFrame, textCol: String, idCol: String,
                      k: Int, w: Int, bands: Int, rows: Int): DataFrame = {
    // localCheckpoint both shared inputs: the candidate set feeds the
    // caught-join AND the n_lsh count, the shingle index feeds sizes AND
    // both sides of the inverted-index self-join — without materialization
    // the MinHash pipeline runs twice and the shingle scan three times in
    // the one audit action (the bpeTopMerges re-evaluation lesson)
    val lsh = lshCandidatePairs(
      minhashSignature(docs, textCol, idCol, k, w), idCol, bands, rows)
      .localCheckpoint()
    val dsh = docs.select(col(idCol).as("did"),
      explode(TextHashExprs.distinctShingleHashes(col(textCol), w)).as("s"))
      .distinct()
      .localCheckpoint()
    val sizes = dsh.groupBy(col("did")).agg(count(lit(1)).as("sz"))
    val inter = dsh.as("ia").join(dsh.as("ib"),
        col("ia.s") === col("ib.s") && col("ia.did") < col("ib.did"))
      .groupBy(col("ia.did").as("id_a"), col("ib.did").as("id_b"))
      .agg(count(lit(1)).as("n_int"))
    val shared = inter
      .join(sizes.select(col("did").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("did").as("id_b"), col("sz").as("sz_b")), "id_b")
      .join(lsh.withColumn("__c", lit(1L)), Seq("id_a", "id_b"), "left")
      .withColumn("caught", coalesce(col("__c"), lit(0L)))
    val union = (col("sz_a") + col("sz_b") - col("n_int")).cast("double")
    val j = col("n_int").cast("double") / union
    val jR = (2 to rows).foldLeft(j)((acc, _) => acc * j)         // j^R, left-assoc
    val miss1 = lit(1.0) - jR
    val missB = (2 to bands).foldLeft(miss1)((acc, _) => acc * miss1) // (1-j^R)^B
    val detMicro = floor((lit(1.0) - missB) * lit(1000000.0)).cast("long")
    val hi = (lit(3L) * col("n_int")) >= (col("sz_a") + col("sz_b"))   // j ≥ 1/2
    val mid = !hi && (lit(5L) * col("n_int")) >= (col("sz_a") + col("sz_b")) // 1/4 ≤ j < 1/2
    val b = when(hi, "hi").when(mid, "mid").otherwise("lo")
    val agg = shared.select(b.as("bucket"), col("caught"), detMicro.as("det_micro"))
      .groupBy()
      .agg(
        sum(when(col("bucket") === "hi", 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("bucket") === "hi", col("caught")).otherwise(0L)).as("hit_hi"),
        sum(when(col("bucket") === "hi", col("det_micro")).otherwise(0L)).as("exp_hi_micro"),
        sum(when(col("bucket") === "mid", 1L).otherwise(0L)).as("n_mid"),
        sum(when(col("bucket") === "mid", col("caught")).otherwise(0L)).as("hit_mid"),
        sum(when(col("bucket") === "mid", col("det_micro")).otherwise(0L)).as("exp_mid_micro"),
        sum(when(col("bucket") === "lo", 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("bucket") === "lo", col("caught")).otherwise(0L)).as("hit_lo"),
        sum(when(col("bucket") === "lo", col("det_micro")).otherwise(0L)).as("exp_lo_micro"))
    val nLsh = lsh.groupBy().agg(count(lit(1)).as("n_lsh"))
    agg.crossJoin(nLsh)
      .select(
        lit(bands).as("bands"), lit(rows).as("rows_per_band"),
        col("n_lsh"),
        col("n_hi"), col("hit_hi"), col("exp_hi_micro"),
        col("n_mid"), col("hit_mid"), col("exp_mid_micro"),
        col("n_lo"), col("hit_lo"), col("exp_lo_micro"),
        (col("hit_hi").cast("double") /
          when(col("n_hi") === 0L, lit(1L)).otherwise(col("n_hi")).cast("double"))
          .as("recall_hi"),
        (col("hit_hi").cast("double") /
          when(col("n_lsh") === 0L, lit(1L)).otherwise(col("n_lsh")).cast("double"))
          .as("precision_hi"),
        when((col("hit_hi") * lit(10000000L)) >= (col("exp_hi_micro") * lit(7L)) &&
             (col("hit_lo") * lit(1000000L)) <= (col("exp_lo_micro") * lit(3L)),
          lit("PASS")).otherwise(lit("WEAK")).as("verdict"))
  }

  private def jaccardOnShingles(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    // Pin the distinct shingle table once (the q117/q169 discipline): it is
    // referenced 3× below (sizes, inter-a, inter-b); left lazy, each
    // reference re-derives the semi-join + explode upstream. `pairs` must
    // arrive pinned from the caller for the same reason (3 references here).
    // The pinned frame is candidate-member-sized (ids + int64 hashes), never
    // corpus-sized.
    val sh = materialize(shingled.distinct())
    val sizes = sh.groupBy(col("did")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.as("sa"), col("id_a") === col("sa.did"))
      .join(sh.as("sb"), col("id_b") === col("sb.did") && col("sa.s") === col("sb.s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.as("za"), col("id_a") === col("za.did"))
      .join(sizes.as("zb"), col("id_b") === col("zb.did"))
      .select(col("id_a"), col("id_b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("za.sz") + col("zb.sz") - coalesce(col("inter"), lit(0L))).cast("double"))
          .as("jaccard"))
  }
}
