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
    * One shuffle keyed by the 16-byte digest; full text never compared. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
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
    * signature become a candidate pair (idA < idB). */
  def lshCandidatePairs(sig: DataFrame, idCol: String,
                        bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val ms = (1 to rows).map(r => col(s"m${b * rows + r}"))
      struct(lit(b + 1).as("band"), concat_ws("_", ms: _*).as("sig"))
    }
    val exploded = sig
      .select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Duplicate clustering: connected components over candidate/verified
    * pairs — every document labeled with the smallest doc id reachable
    * through the pair graph (the cluster's canonical survivor).
    *
    * Min-label propagation: labels start as self; each round every node
    * takes the min of its own and its neighbors' labels; converged when no
    * label changes. Rounds needed = graph diameter in the worst case but
    * O(log n) for the short chains dedup graphs form. Each round is two
    * keyed shuffles over the EDGE list (tiny — only near-duplicate pairs,
    * not the corpus); the driver loop is control-flow only, all data stays
    * distributed (Pregel shape). `maxIters` caps adversarial chains.
    */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // Cache the edge list: every propagation round joins against it, and
    // without the cache each round re-executes the whole upstream lineage
    // (e.g. the LSH pipeline that produced the pairs) — observed 3-4× cost.
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("t"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
      .cache()
    val nodes = edges.select(col("s").as("doc_id")).distinct()
    var labels = nodes.withColumn("lbl", col("doc_id"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val neighborMin = edges.join(labels, edges("t") === labels("doc_id"))
        .groupBy(col("s")).agg(min(col("lbl")).as("nlbl"))
      val updated = labels.join(neighborMin, labels("doc_id") === neighborMin("s"), "left")
        .select(col("doc_id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      updated.cache()
      changed = updated.join(labels.withColumnRenamed("lbl", "old"), "doc_id")
        .filter(col("lbl") =!= col("old")).count()
      labels.unpersist()
      labels = updated
      i += 1
    }
    labels.select(col("doc_id"), col("lbl").as("cluster_id"))
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
    * hashes identically, so any collision affects both engines equally). */
  def jaccardForPairs(pairs: DataFrame, docs: DataFrame,
                      textCol: String, idCol: String, w: Int): DataFrame =
    jaccardOnShingles(pairs,
      docs.select(col(idCol).as("did"),
        explode(TextHashExprs.shingleHashes(col(textCol), w)).as("s")))

  /** Char n-gram variant: same pipeline over character shingle hashes. */
  def charJaccardForPairs(pairs: DataFrame, docs: DataFrame,
                          textCol: String, idCol: String, n: Int): DataFrame =
    jaccardOnShingles(pairs,
      docs.select(col(idCol).as("did"),
        explode(TextHashExprs.charShingleHashes(col(textCol), n)).as("s")))

  private def jaccardOnShingles(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    val sh = shingled.distinct()
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
