package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Training-data curation pack (north-star, beyond the reference's surface):
  * PII scrubbing, paragraph-level dedup, repetition quality metrics
  * (Gopher-style), test-set decontamination, and deterministic hash sampling
  * / source mixing. The reference has no analog (it is an ArcGIS ETL bridge,
  * `arc_utils.py`); these are the standard corpus-hygiene operations a
  * 100 TB LLM pipeline runs between ingest and tokenization — published in
  * C4 (Raffel et al. 2020), Gopher (Rae et al. 2021, appendix A) and
  * "Deduplicating Training Data Makes Language Models Better" (Lee et al.
  * 2021); implemented here fresh against the Spark built-in function surface.
  *
  * Scale design notes:
  *  - Every per-document metric is a codegen'd higher-order-function
  *    expression — zero shuffle, runs at scan speed inside one stage.
  *  - Cross-document stages (paragraph dedup, decontamination) shuffle only
  *    8/16-byte hashes, never document text (same rule as
  *    [[Dedup.dropExactDuplicates]] after the round-5 de-texting).
  *  - Regex patterns are restricted to syntax with identical semantics in
  *    Java regex (Spark) and RE2 (DuckDB oracle): no backreferences, no
  *    lookaround, explicit `[0-9]` classes.
  */
object Curation {

  // ---- PII detection / redaction -----------------------------------------
  // Patterns are intentionally conservative (precision over recall): an
  // over-eager scrub destroys good training text, while residual rare
  // formats are caught downstream. All three compile identically under
  // Java regex and RE2.
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val Ipv4Pattern: String = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Count matches of one PII pattern (detection face — cheap audit scans
    * run this before committing to a full rewrite of the corpus). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact all three PII classes. Order matters and is fixed: emails first
    * (their local part may contain digits a later pattern would nibble at),
    * then IPv4 (dotted digits), then phones (dashed/dotted digits) — the
    * replacement tokens contain no digits, so passes cannot cascade. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** DuckDB fragment of [[redactPii]] (RE2, global flag is explicit).
    * CONSTANTS-ONLY contract: the spliced patterns are the fixed library
    * constants above (quote-free by construction) — this builder does not
    * escape, so caller-supplied pattern strings must not flow in. */
  def redactPiiSql(textE: String): String = {
    val e = s"regexp_replace($textE, '$EmailPattern', '<EMAIL>', 'g')"
    val i = s"regexp_replace($e, '$Ipv4Pattern', '<IP>', 'g')"
    s"regexp_replace($i, '$PhonePattern', '<PHONE>', 'g')"
  }

  // ---- synthetic "lines": fixed-width word chunks ------------------------
  /** Chunk whitespace words into w-word pseudo-lines. The documents fixture
    * is single-line word soup, so line/paragraph-shaped operators take their
    * unit from this chunking; on a real corpus the caller splits on
    * newline/blank-line instead (the downstream operators only see an array
    * of strings either way). */
  def wordChunks(text: Column, w: Int): Column = {
    val ws = split(trim(text), "\\s+")
    val n = greatest(ceil(size(ws) / lit(w.toDouble)).cast("int"), lit(1))
    transform(sequence(lit(1), n), i => concat_ws(" ", slice(ws, (i - lit(1)) * lit(w) + lit(1), lit(w))))
  }
  def wordChunksSql(textE: String, w: Int): String = {
    val ws = s"regexp_split_to_array(trim($textE), '\\s+')"
    s"[array_to_string(($ws)[((i-1)*$w+1):((i-1)*$w+$w)], ' ') " +
      s"FOR i IN generate_series(1, GREATEST(CAST(CEIL(len($ws)/$w.0) AS BIGINT), 1))]"
  }

  // ---- paragraph-level exact dedup ---------------------------------------
  /** Explode a paragraph array column to (id, para_idx, para). 1-based idx. */
  def paragraphs(df: DataFrame, parasCol: Column, idCol: String): DataFrame =
    df.select(col(idCol), posexplode(parasCol).as(Seq("pos", "para")))
      .select(col(idCol), (col("pos") + 1).as("para_idx"), col("para"))

  /** Paragraph-level exact dedup: a paragraph is kept iff it is the corpus-
    * wide first occurrence (lowest (id, para_idx)). Returns per-document
    * (id, n_paras, n_kept).
    *
    * Scale: survivors are computed as a min-struct aggregate over the
    * 16-byte paragraph digest — the exchange carries (digest, id, idx),
    * never paragraph text (the [[Dedup.dropExactDuplicates]] rule at
    * paragraph granularity). The join back to the exploded paragraphs is on
    * (id, idx) — broadcast/bloom-filterable — and the final per-doc rollup
    * partial-aggregates map-side. */
  def paragraphDedupStats(df: DataFrame, parasCol: Column, idCol: String): DataFrame = {
    val paras = paragraphs(df, parasCol, idCol)
      .select(col(idCol), col("para_idx"), md5(col("para")).as("ph"))
    val firstOcc = paras
      .groupBy(col("ph"))
      .agg(min(struct(col(idCol), col("para_idx"))).as("f"))
      .select(col("f").getField(idCol).as(idCol), col("f.para_idx").as("para_idx"))
    paras.select(col(idCol), col("para_idx"))
      .join(firstOcc.withColumn("kept", lit(1L)), Seq(idCol, "para_idx"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paras"), sum(coalesce(col("kept"), lit(0L))).as("n_kept"))
  }

  // ---- repetition metrics (Gopher-style quality signals) -----------------
  /** Fraction of duplicate lines: (n − n_distinct) / n over a line array.
    * Exact-integer division → bit-stable across engines. */
  def dupLineFrac(lines: Column): Column =
    (size(lines) - size(array_distinct(lines))).cast("double") / size(lines).cast("double")

  /** Occurrence count of the most frequent element of an array — a per-row
    * O(distinct·n) HOF loop, no shuffle (docs are bounded; at 100 TB this
    * stays embarrassingly parallel inside the scan stage). */
  def topElementCount(arr: Column): Column =
    array_max(transform(array_distinct(arr), g => size(filter(arr, x => x === g))))

  /** Fraction of the text's n-grams occupied by its single most frequent
    * n-gram (Gopher's "top n-gram fraction" family, n=2 default). */
  def topNgramFrac(text: Column, n: Int): Column = {
    val gs = Fns.wordShingles(text, n)
    topElementCount(gs).cast("double") / size(gs).cast("double")
  }

  /** Fraction of words that are the single most frequent word. */
  def topWordFrac(text: Column): Column = {
    val ws = split(trim(text), "\\s+")
    topElementCount(ws).cast("double") / size(ws).cast("double")
  }

  /** All three repetition metrics as a DataFrame operator over the COMPILED
    * one-pass kernels ([[graft.functions.TextMetricExprs]]).
    *
    * Why kernels, not the scalar HOF builders above: higher-order functions
    * don't participate in whole-stage codegen — `transform(array_distinct(
    * arr), g -> size(filter(arr, _ === g)))` runs O(distinct·n) interpreted
    * lambda evaluations per row (and with the array INLINED rather than
    * projected, re-builds the whole shingle array per distinct element).
    * At sf0.1 the declarative form cost ~50 ms/row — minutes per query —
    * a cost `count()`-based timing never saw because the metric columns got
    * pruned (Bench scaladoc). The kernels compute every count in one
    * compiled pass (split once, hash-count once, ~µs/row); only the exact
    * int64 counts leave the kernel, and the fractions stay declarative —
    * value-identical to the scalar builders and the oracle SQL (CurationSpec
    * pins kernel ≡ HOF equivalence). */
  def repetitionMetrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.functions.TextMetricExprs
    val d = (i: Int, c: String) => element_at(col(c), i).cast("double")
    df.select(col(idCol),
        TextMetricExprs.wordStats(col(textCol)).as("__wst"),
        TextMetricExprs.chunkGramStats(col(textCol), 5, 2).as("__cgs"))
      .select(col(idCol),
        ((d(1, "__cgs") - d(2, "__cgs")) / d(1, "__cgs")).as("dup_line_frac"),
        (d(4, "__cgs") / d(3, "__cgs")).as("top_bigram_frac"),
        (d(3, "__wst") / d(1, "__wst")).as("top_word_frac"))
  }

  def topElementCountSql(arrE: String): String =
    s"list_max(list_transform(list_distinct($arrE), g -> len(list_filter($arrE, x -> x = g))))"

  // ---- Gopher rule filter (keep/drop with reasons) ------------------------
  /** Rule-based document filter in the Gopher style (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1): token-count band, mean-word-length band,
    * top-word-fraction ceiling — each violated rule sets a bit in `reasons`
    * (bit0 too-short, bit1 too-long, bit2 mean-length out of band, bit3
    * top-word fraction over ceiling); `keep` = no bit set. The reasons
    * bitmask is what production pipelines log per drop so filter drift is
    * attributable.
    *
    * EVERY rule evaluates in exact int64 arithmetic — thresholds are
    * rationals (num, den) and `mean_len < num/den` is tested as
    * `den·sum_len < num·n_tokens` — so verdicts are engine-exact with no
    * float-comparison boundary risk; the reported mean_len/top_word_frac
    * doubles are informational single divisions.
    *
    * Scale: per-row HOF folds inside the scan stage (the q57/q86 family) —
    * zero shuffle; thresholds ride the plan as literals. */
  def gopherFilter(df: DataFrame, textCol: String, idCol: String,
                   minTokens: Int, maxTokens: Int,
                   meanLenMin: (Int, Int), meanLenMax: (Int, Int),
                   topWordMax: (Int, Int)): DataFrame = {
    // counts from the compiled one-pass kernel (repetitionMetrics note)
    val n = element_at(col("__wst"), 1)
    val sumLen = element_at(col("__wst"), 2)
    val topc = element_at(col("__wst"), 3)
    val bShort = when(n < minTokens, lit(1)).otherwise(lit(0))
    val bLong = when(n > maxTokens, lit(2)).otherwise(lit(0))
    val bMean = when(
      sumLen * meanLenMin._2 < lit(meanLenMin._1.toLong) * n ||
      sumLen * meanLenMax._2 > lit(meanLenMax._1.toLong) * n, lit(4)).otherwise(lit(0))
    val bTop = when(topc * topWordMax._2 > lit(topWordMax._1.toLong) * n, lit(8))
      .otherwise(lit(0))
    df.select(col(idCol),
        graft.functions.TextMetricExprs.wordStats(col(textCol)).as("__wst"))
      .select(col(idCol), n.as("n_tokens"), sumLen.as("__sl"), topc.as("__tc"),
        (bShort + bLong + bMean + bTop).as("reasons"))
      .select(col(idCol), col("n_tokens"),
        (col("__sl").cast("double") / col("n_tokens").cast("double")).as("mean_len"),
        (col("__tc").cast("double") / col("n_tokens").cast("double")).as("top_word_frac"),
        col("reasons"),
        when(col("reasons") === 0, lit(1)).otherwise(lit(0)).as("keep"))
  }

  /** Oracle face of [[gopherFilter]] — same exact-int rule arithmetic. */
  def gopherFilterSql(tableE: String, textE: String, idE: String,
                      minTokens: Int, maxTokens: Int,
                      meanLenMin: (Int, Int), meanLenMax: (Int, Int),
                      topWordMax: (Int, Int)): String = {
    val toksE = s"regexp_split_to_array(trim($textE), '\\s+')"
    s"""WITH gf_m AS (SELECT $idE AS id, CAST(len($toksE) AS BIGINT) AS n,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform($toksE, t -> CAST(length(t) AS BIGINT))), (acc, x) -> acc + x) AS sl,
       |    CAST(${topElementCountSql(toksE)} AS BIGINT) AS tc
       |  FROM $tableE),
       |gf_r AS (SELECT id, n, sl, tc,
       |    ((CASE WHEN n < $minTokens THEN 1 ELSE 0 END)
       |     + (CASE WHEN n > $maxTokens THEN 2 ELSE 0 END)
       |     + (CASE WHEN sl * ${meanLenMin._2} < ${meanLenMin._1} * n
       |             OR sl * ${meanLenMax._2} > ${meanLenMax._1} * n THEN 4 ELSE 0 END)
       |     + (CASE WHEN tc * ${topWordMax._2} > ${topWordMax._1} * n THEN 8 ELSE 0 END)) AS reasons
       |  FROM gf_m)
       |SELECT id, n AS n_tokens,
       |  (CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)) AS mean_len,
       |  (CAST(tc AS DOUBLE) / CAST(n AS DOUBLE)) AS top_word_frac,
       |  reasons, CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS keep
       |FROM gf_r""".stripMargin
  }

  // ---- decontamination (test-set n-gram overlap) -------------------------
  /** Distinct w-gram hashes per document: per-row shingle + per-row distinct
    * (no shuffle-side dedup of grams within a doc), hashed to 8 bytes before
    * anything leaves the scan stage. The shingle→distinct→hash chain runs as
    * ONE compiled kernel per document
    * ([[graft.functions.TextHashExprs.distinctShingleHashes]] — the MinHash
    * kernel family), so the explode emits 8-byte longs instead of feeding
    * each gram STRING through an interpreted md5-hex → conv pipeline;
    * semantics (string-level distinct, [[Fns.hashP]] values) are identical
    * and CurationSpec pins the equivalence. */
  def gramHashes(df: DataFrame, textCol: String, idCol: String, w: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.TextHashExprs.distinctShingleHashes(col(textCol), w)).as("gh"))

  /** Per-document count of distinct w-grams shared with a held-out test set
    * — the standard train/test decontamination sweep (n-gram collision
    * check, as run for GPT-3/PaLM/Llama training sets). Returns
    * (id, n_hits) for contaminated docs only.
    *
    * Scale: both sides reduce to 8-byte gram hashes inside their scan
    * stages; the equi-join shuffles only those hashes (the test side is
    * usually small enough that AQE broadcasts it), and the rollup
    * partial-aggregates. Corpus text never moves. */
  def decontaminationHits(corpus: DataFrame, testSet: DataFrame,
                          textCol: String, idCol: String, w: Int): DataFrame = {
    val testGrams = gramHashes(testSet, textCol, idCol, w).select("gh").distinct()
    gramHashes(corpus, textCol, idCol, w)
      .join(testGrams, "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Apply face: corpus minus contaminated documents (left-anti on id). */
  def removeContaminated(corpus: DataFrame, testSet: DataFrame,
                         textCol: String, idCol: String, w: Int): DataFrame =
    corpus.join(decontaminationHits(corpus, testSet, textCol, idCol, w),
      Seq(idCol), "left_anti")

  // ---- cross-document duplicated-span metric -----------------------------
  /** Per-document duplicated-span statistics: of a document's distinct
    * w-grams, how many also occur in at least one OTHER document (`gdf > 1`
    * over the corpus) — the span-level memorization metric behind
    * substring-dedup pipelines (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": ~50-token repeated spans; here the
    * span unit is the w-gram and the fraction is the per-doc report). The
    * filter face drops documents whose fraction exceeds a threshold.
    *
    * Scale: same shape as [[decontaminationHits]] — grams become 8-byte
    * hashes inside the scan stage (one compiled kernel per doc), the
    * gram-frequency agg partial-aggregates, and the join shuffles hashes
    * only; corpus text never moves. `dup_frac` is ONE IEEE division of two
    * exact longs — cross-engine bit-exact. (A hashP collision merges two
    * distinct gram strings on both sides of the join identically on a
    * corpus-wide count, so the metric stays engine-consistent.) */
  def dupSpanStats(df: DataFrame, textCol: String, idCol: String, w: Int): DataFrame = {
    val g = gramHashes(df, textCol, idCol, w)
    val gdf = g.groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
    g.join(gdf, "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_grams").cast("double"))
  }

  /** Apply face: corpus minus documents with dup_frac above the threshold. */
  def removeDupSpanDocs(df: DataFrame, textCol: String, idCol: String, w: Int,
                        maxDupFrac: Double): DataFrame =
    df.join(dupSpanStats(df, textCol, idCol, w)
        .filter(col("dup_frac") > maxDupFrac).select(idCol),
      Seq(idCol), "left_anti")

  /** SPAN-level dedup apply (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): instead of dropping whole documents,
    * remove the duplicated SPANS — every token covered by a w-gram that
    * occurs in more than one document is dropped from all but the gram's
    * first-occurrence document (min id keeps its copy; the distributed
    * w-gram form of the paper's suffix-array substring dedup).
    *
    * Output: (idCol, n_tokens, n_kept, text_clean) — text_clean is the
    * surviving tokens re-joined by single spaces.
    *
    * Scale: grams leave the scan stage as (id, pos, 8-byte hash) — text
    * never shuffles; the gdf agg partial-aggregates on hash keys and only
    * gdf>1 survivors join back (a small fraction of the gram table, and
    * the join itself is hash-keyed); drop-starts collect per document
    * (bounded by document length, the same bound the text column itself
    * already puts on a row); the final token filter is a per-row HOF in
    * the scan stage of the second corpus pass. A hashP collision merges
    * two gram strings identically in both engines, so the result stays
    * engine-consistent (the dupSpanStats caveat). */
  def removeDupSpans(df: DataFrame, textCol: String, idCol: String, w: Int): DataFrame = {
    // gram start positions are the shingle-array indices (0-based here,
    // 1-based in the SQL face — only the emitted columns must agree).
    // Compiled kernel: one MD5 pass per gram, no gram strings in the plan
    // (wordShingles' slice-per-element form is O(tokens²) per doc).
    val g = df.select(col(idCol),
        posexplode(graft.functions.TextHashExprs.shingleHashes(col(textCol), w)))
      .select(col(idCol), col("pos"), col("col").as("gh"))
    val dup = g.groupBy(col("gh"))
      .agg(countDistinct(col(idCol)).as("gdf"), min(col(idCol)).as("first_id"))
      .filter(col("gdf") > 1)
    val dropStarts = g.join(dup, "gh")
      .filter(col(idCol) > col("first_id"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("__starts"))
    // the token filter is ONE compiled merged-interval two-pointer pass
    // per document (TextHashing.dropSpansRow, O(tokens + starts)) — the
    // former `filter(toks, i => !exists(starts, ...))` lambda was
    // O(tokens·starts), quadratic for a heavily-duplicated document
    df.join(dropStarts, Seq(idCol), "left")
      .select(col(idCol), graft.functions.TextHashExprs.dropSpans(
        col(textCol),
        coalesce(col("__starts"), array().cast("array<int>")), w).as("__k"))
      .select(col(idCol), col("__k.n_tokens").as("n_tokens"),
        col("__k.n_kept").as("n_kept"), col("__k.text_clean").as("text_clean"))
  }

  /** Oracle face of [[removeDupSpans]] (1-based positions; coverage via an
    * exploded position anti-join instead of index lambdas, then `list(...
    * ORDER BY pos)` reassembly — same surviving-token set). */
  def removeDupSpansSql(tableE: String, textE: String, idE: String, w: Int): String = {
    val shE = Fns.wordShinglesSql(textE, w)
    val toksE = s"regexp_split_to_array(trim($textE), '\\s+')"
    s"""WITH rs_g0 AS (SELECT id, gs, unnest(generate_series(1, len(gs))) AS pos
       |  FROM (SELECT $idE AS id, $shE AS gs FROM $tableE)),
       |rs_g AS (SELECT id, pos, ${Fns.hashPSql(s"gs[CAST(pos AS INT)]")} AS gh FROM rs_g0),
       |rs_dup AS (SELECT gh, MIN(id) AS first_id FROM rs_g
       |           GROUP BY gh HAVING COUNT(DISTINCT id) > 1),
       |rs_cov AS (SELECT DISTINCT g.id, g.pos + o.o AS cpos
       |  FROM rs_g g JOIN rs_dup d USING (gh),
       |       (SELECT unnest(generate_series(0, ${w - 1})) AS o) o
       |  WHERE g.id > d.first_id),
       |rs_t AS (SELECT $idE AS id, $toksE AS toks FROM $tableE),
       |rs_tp0 AS (SELECT id, toks, unnest(generate_series(1, len(toks))) AS pos FROM rs_t),
       |rs_tp AS (SELECT id, pos, toks[CAST(pos AS INT)] AS tok FROM rs_tp0),
       |rs_kept AS (SELECT tp.id, list(tp.tok ORDER BY tp.pos) AS kept
       |  FROM rs_tp tp LEFT JOIN rs_cov c ON tp.id = c.id AND tp.pos = c.cpos
       |  WHERE c.cpos IS NULL GROUP BY tp.id)
       |SELECT t.id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(len(k.kept), 0) AS BIGINT) AS n_kept,
       |  COALESCE(array_to_string(k.kept, ' '), '') AS text_clean
       |FROM rs_t t LEFT JOIN rs_kept k ON t.id = k.id""".stripMargin
  }

  // ---- C4-style boilerplate line removal ---------------------------------
  // The C4 line rules (Raffel et al. 2020 §2.2): keep a line only if it ends
  // in a terminal punctuation mark, has at least `minWords` words, and
  // contains none of the boilerplate markers ("javascript", "cookie",
  // "lorem ipsum") or code debris ('{'). Per-row HOF filter over a line
  // array — scan-speed, zero shuffle, composable with [[wordChunks]] on the
  // fixture or a newline split on a real corpus.

  /** Case-insensitive markers whose presence drops the line. */
  val BoilerplateMarkers: Seq[String] = Seq("javascript", "cookie", "lorem ipsum")
  /** Terminal-punctuation rule (shared Java-regex/RE2 syntax). */
  val TerminalPunct: String = "[.!?\"]$"

  /** Predicate: line survives the C4 rules. Usable standalone or inside a
    * HOF lambda (all building blocks are plain codegen'd expressions). */
  def lineKept(line: Column, minWords: Int): Column = {
    val noMarker = BoilerplateMarkers
      .map(m => instr(lower(line), m) === 0)
      .reduce(_ && _)
    line.rlike(TerminalPunct) &&
      size(split(trim(line), "\\s+")) >= minWords &&
      noMarker && instr(line, "{") === 0
  }
  def lineKeptSql(lE: String, minWords: Int): String = {
    val noMarker = BoilerplateMarkers
      .map(m => s"NOT contains(lower($lE), '$m')").mkString(" AND ")
    s"""regexp_matches($lE, '$TerminalPunct') AND len(regexp_split_to_array(trim($lE), '\\s+')) >= $minWords AND $noMarker AND NOT contains($lE, '{')"""
  }

  /** Filter a line-array column down to its C4 survivors. */
  def removeBoilerplateLines(lines: Column, minWords: Int = 4): Column =
    filter(lines, l => lineKept(l, minWords))
  def removeBoilerplateLinesSql(lsE: String, minWords: Int = 4): String =
    s"list_filter($lsE, l -> ${lineKeptSql("l", minWords)})"

  // ---- URL / domain blocklist filtering ----------------------------------
  // Standard corpus-hygiene source filter: drop documents whose URL host is
  // on (or under) a blocked domain. Row-local — at 100 TB the blocklist is a
  // driver-side literal chain (typical lists are 10³-10⁵ entries; beyond
  // that, broadcast-join a blocklist table on the extracted suffix instead).

  /** Lower-cased host of a URL (scheme://host[:port]/... — the port is
    * STRIPPED so a blocked domain blocks every port; bracketed IPv6 hosts
    * are out of scope for this extractor). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))
  def urlHostSql(uE: String): String =
    s"lower(regexp_extract($uE, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1))"

  /** True iff the host equals a blocked domain or is a subdomain of one. */
  def hostBlocked(host: Column, blocklist: Seq[String]): Column =
    blocklist.map(b => host === b || host.endsWith(s".$b")).reduce(_ || _)
  def hostBlockedSql(hE: String, blocklist: Seq[String]): String =
    blocklist.map(b => s"($hE = '$b' OR ends_with($hE, '.$b'))").mkString("(", " OR ", ")")

  /** Apply face: corpus minus documents from blocked domains. */
  def filterBlockedUrls(df: DataFrame, urlCol: String, blocklist: Seq[String]): DataFrame =
    df.filter(!hostBlocked(urlHost(col(urlCol)), blocklist))

  /** URL canonicalization for web-corpus dedup keys — the normalization
    * crawl pipelines apply BEFORE url-level dedup so trivially-variant URLs
    * (case, default port, fragment, tracking params, trailing slash)
    * collapse to one key. Fixed-order rewrite chain, every step a
    * Java-regex≡RE2-safe `regexp_replace` (no lookarounds — optional
    * trailing capture groups instead; an unmatched group substitutes the
    * empty string in BOTH engines):
    *   1. lower-case the scheme and host (path/query case is preserved);
    *   2. strip a default port (`:80` for http, `:443` for https);
    *   3. drop the `#fragment`;
    *   4. drop `utm_*` tracking query params, then repair the delimiter
    *      debris (`&&+`→`&`, `?&+`→`?`, trailing `?`/`&` stripped);
    *   5. strip one trailing `/` from a non-root, query-free path.
    * Scale: per-row, shuffle-free — runs inside the scan stage beside
    * [[urlHost]]/[[hostBlocked]]; the canonical key then feeds the exact-
    * dedup digest pack ([[Dedup]]). */
  def canonicalizeUrl(url: Column): Column = {
    // 1. lower(scheme://host[:port]) — rebuilt from anchored captures.
    val prefixLowered = concat(
      lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""))
    val noPort = regexp_replace(
      regexp_replace(prefixLowered, "^(http://[^/?#]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#]*):443([/?#].*)?$", "$1$2")
    val noFrag = regexp_replace(noPort, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "([?&])utm_[^&#]*", "$1")
    val repaired = regexp_replace(
      regexp_replace(regexp_replace(noUtm, "&&+", "&"), "\\?&+", "?"),
      "[?&]+$", "")
    regexp_replace(repaired, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+/.+?)/$", "$1")
  }

  /** Oracle face of [[canonicalizeUrl]] (same fixed-order chain; DuckDB
    * replacements use `\1` refs and the explicit global flag). */
  def canonicalizeUrlSql(uE: String): String = {
    val prefixLowered = s"(lower(regexp_extract($uE, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) || " +
      s"regexp_replace($uE, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g'))"
    val noPort = s"regexp_replace(regexp_replace($prefixLowered, " +
      s"'^(http://[^/?#]*):80([/?#].*)?$$', '\\1\\2', 'g'), " +
      s"'^(https://[^/?#]*):443([/?#].*)?$$', '\\1\\2', 'g')"
    val noFrag = s"regexp_replace($noPort, '#.*$$', '', 'g')"
    val noUtm = s"regexp_replace($noFrag, '([?&])utm_[^&#]*', '\\1', 'g')"
    val repaired = s"regexp_replace(regexp_replace(regexp_replace($noUtm, " +
      s"'&&+', '&', 'g'), '\\?&+', '?', 'g'), '[?&]+$$', '', 'g')"
    s"regexp_replace($repaired, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+/.+?)/$$', '\\1', 'g')"
  }

  // ---- deterministic hash sampling / source mixing -----------------------
  /** Stable per-row bucket in [0, 100): md5-derived, salt-keyed. Unlike
    * `rand(seed)`, the verdict is a pure function of (salt, id) — immune to
    * partitioning, task retries, and engine — which is what makes sampled
    * corpora reproducible across reruns and auditable by other engines. */
  def hashBucket(id: Column, salt: String): Column =
    Fns.hash60(concat(lit(salt), id.cast("string"))) % 100
  /** Oracle fragment. The salt is spliced into a single-quoted SQL literal —
    * quotes are doubled so a salt containing `'` still round-trips; DuckDB
    * string literals have no backslash escapes by default, so `''` is the
    * only metacharacter to neutralize. */
  def hashBucketSql(idE: String, salt: String): String = {
    val s = salt.replace("'", "''")
    s"(${Fns.hash60Sql(s"'$s'||CAST($idE AS VARCHAR)")} % 100)"
  }

  /** Keep ~pct% of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, pct: Int, salt: String): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < pct)

  // ---- deterministic epoch shuffle ----------------------------------------
  /** Deterministic training-epoch shuffle: each row gets a shard
    * (hash60(salt||id) mod `nShards`) and a dense 0-based position within its
    * shard (rank by (hash, id) — a total order). The layout is a pure
    * function of (salt, id): partitioning/retry-immune, auditable in the
    * oracle, and a new salt is a fresh epoch permutation — the
    * "globally shuffled corpus" a trainer streams, without ever sorting the
    * corpus globally.
    *
    * Scale: shard assignment is a per-row scalar; the position rank is a
    * PARTITIONED window (one shuffle keyed by shard, each shard sorted
    * independently — no global order). The natural consumer is
    * `.repartition(shard).sortWithinPartitions(pos)` + a partitioned write:
    * shards are the write granularity, so nShards scales with the cluster,
    * not the corpus. */
  def epochShuffle(df: DataFrame, idCol: String, salt: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0)
    import org.apache.spark.sql.expressions.Window
    val hk = Fns.hash60(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hk"), col(idCol))
    df.select(col(idCol), hk.as("__hk"))
      .withColumn("shard", (col("__hk") % nShards).cast("long"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Oracle face of [[epochShuffle]] (same hash, same rank order). */
  def epochShuffleSql(tableE: String, idE: String, salt: String,
                      nShards: Int): String = {
    val s = salt.replace("'", "''")
    val hk = Fns.hash60Sql(s"'$s'||CAST($idE AS VARCHAR)")
    s"""WITH es_d AS (SELECT $idE AS id, $hk AS hk FROM $tableE)
       |SELECT id, CAST(hk % $nShards AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY hk % $nShards ORDER BY hk, id) - 1
       |    AS BIGINT) AS pos
       |FROM es_d""".stripMargin
  }

  /** Fixed-SIZE deterministic stratified sample: exactly min(n, |group|)
    * rows per group, chosen by salted-hash rank — the "n docs per source"
    * complement of the rate-based [[hashSample]]/[[mixSources]]. The rank
    * key (hash60(salt||id), id) is a pure function of (salt, id), so the
    * chosen sample is immune to partitioning, task retries and engine
    * swaps, and changing n only grows/shrinks the sample monotonically
    * (rank-prefix property — the n=100 sample contains the n=50 sample).
    *
    * Scale: a rank-≤-n window per group. Spark's WindowGroupLimit rule
    * pushes a per-partition top-n below the exchange, so the shuffle
    * carries at most n rows per group per map partition, not the corpus;
    * groups (sources) are bounded. For a single giant group use the same
    * composite-shard-key treatment as [[packSequences]]. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       n: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__hk",
        Fns.hash60(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__hk"), col(idCol))))
      .filter(col("rk") <= n)
      .drop("__hk")
  }

  /** Pseudonymization vault: assign every distinct identifier a DENSE
    * surrogate 0..n-1 — the PII-tokenization step of a privacy-preserving
    * pipeline (drop the vault and the surrogates are irreversible; keep it
    * escrowed and re-identification is one join). Surrogate order is a
    * salted hash, so it leaks nothing about identifier order, yet the
    * assignment is a pure function of (salt, id set): stable across runs,
    * partitioning and engines.
    *
    * Scale — this is distributed dense-ID assignment (zipWithIndex in
    * DataFrame algebra), NO global window: shard distinct ids by hash,
    * rank within shard (keyed window), cumulate shard counts into
    * exclusive offsets (a `shards`-row single-partition window BY
    * CONSTRUCTION — bounded), broadcast the offsets back. pseud =
    * offset(shard) + rank - 1. */
  def denseSurrogates(df: DataFrame, idCol: String, salt: String,
                      shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = df.select(col(idCol)).distinct()
      .withColumn("__hk", Fns.hash60(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__shard", (col("__hk") % shards).cast("int"))
    val ranked = ids.withColumn("__rk", row_number().over(
      Window.partitionBy(col("__shard")).orderBy(col("__hk"), col(idCol))))
    val offsets = ranked.groupBy(col("__shard")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard"), col("__off"))
    ranked.join(broadcast(offsets), "__shard")
      .select(col(idCol), (col("__off") + col("__rk") - 1).as("pseud"))
  }

  /** Oracle face of [[denseSurrogates]] (same shard/rank/offset chain). */
  def denseSurrogatesSql(tableE: String, idE: String, salt: String,
                         shards: Int): String = {
    val s = salt.replace("'", "''")
    val hk = Fns.hash60Sql(s"'$s'||CAST($idE AS VARCHAR)")
    s"""SELECT $idE, CAST(__off + __rk - 1 AS BIGINT) AS pseud FROM (
       |  SELECT $idE, CAST($hk % $shards AS INT) AS __shard,
       |    row_number() OVER (PARTITION BY CAST($hk % $shards AS INT)
       |      ORDER BY $hk, $idE) AS __rk
       |  FROM (SELECT DISTINCT $idE FROM $tableE)) r
       |JOIN (
       |  SELECT __shard, COALESCE(SUM(__n) OVER (ORDER BY __shard
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off
       |  FROM (SELECT CAST($hk % $shards AS INT) AS __shard, COUNT(*) AS __n
       |        FROM (SELECT DISTINCT $idE FROM $tableE) GROUP BY 1)) o
       |USING (__shard)""".stripMargin
  }

  /** Swap the identifier column for its surrogate via the vault — the
    * "apply" half of [[denseSurrogates]]; broadcast when the vault fits. */
  def applyPseudonyms(df: DataFrame, vault: DataFrame, idCol: String): DataFrame =
    df.join(vault, Seq(idCol))
      .drop(idCol)
      .withColumnRenamed("pseud", idCol)

  /** Oracle face of [[stratifiedSample]] (same salted hash + rank). */
  def stratifiedSampleSql(tableE: String, groupE: String, idE: String,
                          n: Int, salt: String): String = {
    val s = salt.replace("'", "''")
    val hk = Fns.hash60Sql(s"'$s'||CAST($idE AS VARCHAR)")
    s"""SELECT * FROM (SELECT *,
       |  CAST(row_number() OVER (PARTITION BY $groupE ORDER BY $hk, $idE) AS INT) AS rk
       |  FROM $tableE)
       |WHERE rk <= $n""".stripMargin
  }

  // ---- sequence packing (concat-and-chunk token binning) -----------------
  /** GPT-style sequence packing: documents are (conceptually) concatenated
    * in (group, id) order and chunked into fixed token budgets; each doc is
    * assigned the bin where it starts plus its offset inside that bin.
    * bin = ⌊cum_before / budget⌋, offset = cum_before mod budget, where
    * cum_before is the running token total of earlier docs in the group.
    *
    * Scale: the running sum is a window per group — groups pack in
    * parallel, and within-group sequencing is inherent to the semantics
    * (packing IS an ordered fold). At 100 TB the group key is a composite
    * shard (e.g. source × hash-bucket of id) so no single window partition
    * exceeds a task; bins are then keyed (group, bin_id) and never span
    * shards. A global single-order pack would serialize the corpus — that
    * formulation is deliberately not offered. */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    // Explicit ROWS frame: Spark's default for an ordered window is RANGE,
    // which would fold PEER rows (duplicate (group,id) keys) into cum_before
    // — diverging from the documented ordered-fold semantics (and from the
    // oracle's ROWS frame) whenever the id is not unique within the group.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = sum(tokens).over(w) - tokens
    df.withColumn("n_tokens", tokens)
      .withColumn("bin_id", floor(cum / lit(budget.toDouble)).cast("long"))
      .withColumn("bin_offset", pmod(cum, lit(budget.toLong)))
  }

  /** Weighted dataset mixing: per-source keep rates (percent), unknown
    * sources fall back to defaultPct. One scan, zero shuffle — the mixture
    * is decided row-locally, so a 100 TB multi-source union mixes without
    * materializing intermediate samples. */
  def mixSources(df: DataFrame, idCol: String, srcCol: String,
                 rates: Map[String, Int], defaultPct: Int, salt: String): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (src, p)) =>
      when(col(srcCol) === src, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < pct)
  }

  // ---- sliding-window chunking --------------------------------------------
  /** Overlapping fixed-window chunking (the embedding-model context-window
    * cut, stride < chunk ⇒ overlap): chunk i of a document covers tokens
    * [i·stride, i·stride + chunkTokens), starts at every multiple of stride
    * below the token count (tail chunks may be short; every document emits
    * ≥ 1 chunk). Output: (idCol, chunk_idx, start_tok, n_chunk_tokens,
    * chunk_text).
    *
    * Scale: a per-row Generate in the scan stage — no shuffle, no state; the
    * 1→⌈n/stride⌉ fan-out is the output's size, not an intermediate. */
  def chunkSliding(df: DataFrame, textCol: String, idCol: String,
                   chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens > 0)
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), toks.as("__t"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), ((size(col("__t")) - 1) / lit(stride)).cast("int")),
        i => {
          val c = slice(col("__t"), i * stride + 1, lit(chunkTokens))
          struct((i * stride).as("start_tok"),
            size(c).cast("long").as("n_chunk_tokens"),
            array_join(c, " ").as("chunk_text"))
        })))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col.start_tok").cast("long").as("start_tok"),
        col("col.n_chunk_tokens").as("n_chunk_tokens"),
        col("col.chunk_text").as("chunk_text"))
  }

  /** Oracle face of [[chunkSliding]] (1-based slice, same start grid). */
  def chunkSlidingSql(tableE: String, textE: String, idE: String,
                      chunkTokens: Int, stride: Int): String =
    s"""WITH cs_t AS (SELECT $idE AS id,
       |    regexp_split_to_array(trim($textE), '\\s+') AS t FROM $tableE),
       |cs_i AS (SELECT id, t, unnest(generate_series(0,
       |    CAST(floor((CAST(len(t) AS DOUBLE) - 1.0) / $stride) AS INT))) AS i
       |  FROM cs_t)
       |SELECT id, CAST(i AS BIGINT) AS chunk_idx,
       |  CAST(i * $stride AS BIGINT) AS start_tok,
       |  CAST(len(t[i * $stride + 1 : i * $stride + $chunkTokens]) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(t[i * $stride + 1 : i * $stride + $chunkTokens], ' ') AS chunk_text
       |FROM cs_i""".stripMargin

  // ---- temperature mixture weights ----------------------------------------
  /** Temperature-scaled sampling weights (the multilingual-LM mixture rule,
    * Conneau & Lample 2019 §3.1 / Raffel et al. 2020 §3.4.3 at α = 1/2):
    * source s gets weight n_s^α / Σ n_t^α — α < 1 up-weights small sources
    * against the head. α is fixed at 1/2 because `sqrt` is CORRECTLY ROUNDED
    * under IEEE-754 in both engines (a general `pow` is not, and a 1-ulp
    * disagreement would flip the ⌊·1e6⌋ quantization at the boundary). The
    * quantized numerators are summed as exact int64, so both engines reach
    * each weight through one identical IEEE division.
    *
    * Output per source: n_tokens (exact), w_prop (proportional weight),
    * w_temp (α=1/2 weight), eff_epochs (passes over the source when
    * `budgetTokens` are drawn at w_temp).
    *
    * Scale: one map-side-combined agg to |sources| rows, then a broadcast of
    * the 1-row totals — the corpus is scanned once, nothing else moves. */
  def mixtureWeights(df: DataFrame, textCol: String, srcCol: String,
                     budgetTokens: Long): DataFrame = {
    val n = df.groupBy(col(srcCol))
      .agg(sum(TextAnalysis.wsTokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("__sm",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1e6)).cast("long"))
    val tot = n.agg(sum(col("n_tokens")).as("__tn"), sum(col("__sm")).as("__ts"))
    n.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_tokens"),
        (col("n_tokens").cast("double") / col("__tn").cast("double")).as("w_prop"),
        (col("__sm").cast("double") / col("__ts").cast("double")).as("w_temp"),
        (col("__sm").cast("double") / col("__ts").cast("double")
          * lit(budgetTokens.toDouble) / col("n_tokens").cast("double"))
          .as("eff_epochs"))
  }

  /** Materialize a [[mixtureWeights]] mixture as an ACTUAL repeated corpus:
    * every document of source s is emitted ⌊e_s⌋ times plus one more with
    * probability frac(e_s), decided by a deterministic per-doc Bernoulli
    * (hash60(salt||id) mod 1e6 < ⌊frac·1e6⌋) — so sources with e_s ≥ 1 are
    * up-sampled by repetition and e_s < 1 sources are subsampled, exactly
    * the epochs-per-source semantics trainers consume. Output: one row per
    * copy, (idCol, srcCol, copy_idx) with copy_idx 1-based.
    *
    * e_s doubles come from the identical IEEE chain in both engines (the
    * q112 contract), so ⌊e⌋ and the 1e6-quantized fraction threshold are
    * engine-exact; the Bernoulli is a pure function of (salt, id) —
    * retry/partitioning-immune.
    *
    * Scale: weights are a |sources|-row broadcast; the fan-out is the
    * output's size (explode of a ≤⌈e⌉-long sequence per row, in the scan
    * stage). Guard: Spark's `sequence(1, 0)` DESCENDS rather than emptying,
    * so zero-copy docs must drop via the `copies >= 1` branch, not the
    * sequence itself. */
  def materializeEpochs(df: DataFrame, textCol: String, idCol: String,
                        srcCol: String, budgetTokens: Long,
                        salt: String): DataFrame = {
    val eff = mixtureWeights(df, textCol, srcCol, budgetTokens)
      .select(col(srcCol), col("eff_epochs"))
    val whole = floor(col("eff_epochs")).cast("long")
    val fracT = floor((col("eff_epochs") - floor(col("eff_epochs"))) * lit(1e6))
      .cast("long")
    val bern = Fns.hash60(concat(lit(salt), col(idCol).cast("string"))) % lit(1000000L)
    df.select(col(idCol), col(srcCol))
      .join(broadcast(eff), srcCol)
      .withColumn("__copies", whole + when(bern < fracT, 1L).otherwise(0L))
      .filter(col("__copies") >= 1L)
      .select(col(idCol), col(srcCol),
        explode(sequence(lit(1L), col("__copies"))).as("copy_idx"))
  }

  /** Oracle face of [[materializeEpochs]] (same IEEE chain, same Bernoulli). */
  def materializeEpochsSql(tableE: String, textE: String, idE: String,
                           srcE: String, budgetTokens: Long,
                           salt: String): String = {
    val s = salt.replace("'", "''")
    val mw = mixtureWeightsSql(tableE, textE, srcE, budgetTokens)
    val bern = s"(${Fns.hash60Sql(s"'$s'||CAST($idE AS VARCHAR)")} % 1000000)"
    s"""WITH me_w AS (SELECT source, eff_epochs FROM ($mw)),
       |me_d AS (SELECT $idE AS id, $srcE AS source, $bern AS bern FROM $tableE),
       |me_c AS (SELECT d.id, d.source,
       |    CAST(floor(w.eff_epochs) AS BIGINT)
       |      + CASE WHEN d.bern < CAST(floor((w.eff_epochs - floor(w.eff_epochs)) * 1e6) AS BIGINT)
       |             THEN 1 ELSE 0 END AS copies
       |  FROM me_d d JOIN me_w w USING (source)),
       |me_x AS (SELECT id, source, unnest(generate_series(1, copies)) AS o
       |         FROM me_c WHERE copies >= 1)
       |SELECT id, source, CAST(o AS BIGINT) AS copy_idx FROM me_x""".stripMargin
  }

  /** Greedy token-budget sampler driven by [[mixtureWeights]]: source s gets
    * a token budget ⌊w_temp·totalBudget⌋; its documents are taken in salted-
    * hash order (the [[stratifiedSample]] ordering — deterministic,
    * partition-invariant) until the running token count reaches the budget.
    * The document straddling the boundary is INCLUDED (cum-before < budget),
    * so every non-empty budget takes at least one document. Returns the kept
    * rows as (idCol, srcCol, n_tokens, budget_tokens).
    *
    * Scale: two corpus scans (one for the per-source totals — a
    * map-side-combined agg to |sources| rows — one for the rows), a
    * broadcast of the |sources|-row budget table, and ONE key shuffle for
    * the per-source cumulative window. The explicit ROWS frame is the
    * packSequences lesson: the default RANGE frame would fold peer rows on
    * duplicate sort keys. */
  def budgetSample(df: DataFrame, textCol: String, idCol: String, srcCol: String,
                   totalBudget: Long, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgets = mixtureWeights(df, textCol, srcCol, totalBudget)
      .select(col(srcCol),
        floor(col("w_temp") * lit(totalBudget.toDouble)).cast("long").as("budget_tokens"))
    val win = Window.partitionBy(col(srcCol)).orderBy(col("__hk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(srcCol),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__hk", Fns.hash60(concat(lit(salt), col(idCol).cast("string"))))
      .join(broadcast(budgets), srcCol)
      .withColumn("__cum_before", sum(col("n_tokens")).over(win) - col("n_tokens"))
      .filter(col("__cum_before") < col("budget_tokens"))
      .select(col(idCol), col(srcCol), col("n_tokens"), col("budget_tokens"))
  }

  /** Oracle face of [[budgetSample]] (same salted-hash order and greedy
    * boundary rule). */
  def budgetSampleSql(tableE: String, textE: String, idE: String, srcE: String,
                      totalBudget: Long, salt: String): String = {
    val s = salt.replace("'", "''")
    val mw = mixtureWeightsSql(tableE, textE, srcE, totalBudget)
    val hk = Fns.hash60Sql(s"'$s'||CAST($idE AS VARCHAR)")
    s"""WITH bs_w AS (SELECT source,
       |    CAST(floor(w_temp * ${totalBudget.toDouble}) AS BIGINT) AS budget_tokens
       |  FROM ($mw)),
       |bs_d AS (SELECT $idE AS id, $srcE AS source,
       |    CAST(len(regexp_split_to_array(trim($textE), '\\s+')) AS BIGINT) AS n_tokens,
       |    $hk AS hk
       |  FROM $tableE),
       |bs_r AS (SELECT d.id, d.source, d.n_tokens, w.budget_tokens,
       |    CAST(SUM(d.n_tokens) OVER (PARTITION BY d.source ORDER BY d.hk, d.id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - d.n_tokens AS cum_before
       |  FROM bs_d d JOIN bs_w w USING (source))
       |SELECT id, source, n_tokens, budget_tokens
       |FROM bs_r WHERE cum_before < budget_tokens""".stripMargin
  }

  // ---- deterministic reservoir sample --------------------------------------
  /** Exact-k uniform sample via deterministic priorities: every row's
    * priority is hashP(salt||id) and the k SMALLEST win. Spark compiles
    * orderBy+limit to TakeOrderedAndProject — a bounded k-row heap per
    * partition, then a k·partitions merge on the driver: a 100 TB scan emits
    * k rows per task and never globally sorts (the distributed form of
    * reservoir sampling, made retry/rerun-reproducible by the hash
    * priority — same salt, same sample, auditable by any engine). A new
    * salt is a fresh independent draw. Ties (hash collisions) break on id,
    * so the sample is a pure function of (salt, k, id-set). */
  def reservoirSample(df: DataFrame, idCol: String, k: Int, salt: String): DataFrame =
    df.orderBy(Fns.hashP(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
      .limit(k)
  /** Oracle face of [[reservoirSample]] (same priority hash, same tiebreak). */
  def reservoirSampleSql(tableE: String, idE: String, k: Int, salt: String): String = {
    val s = salt.replace("'", "''")
    s"""SELECT * FROM $tableE
       |ORDER BY ${Fns.hashPSql(s"'$s'||CAST($idE AS VARCHAR)")}, $idE LIMIT $k""".stripMargin
  }

  // ---- deterministic MLM-style token masking -------------------------------
  /** Span-corruption preprocessing (BERT/T5-style): token w masks when
    * hashP(salt||w) % den == 0 (≈1/den of the vocabulary by occurrence,
    * position-independent so the corruption is a pure word function —
    * reproducible across reruns/partitionings and replicable in the oracle).
    * Compiled one-pass kernel ([[graft.functions.TextHashing.maskTokensRow]]
    * — the interpreted-HOF + per-token-md5 form cost ~2× and broke codegen):
    * zero shuffle, one hash per token shared by rewrite and count, scales
    * with the scan. */
  def maskTokens(text: Column, salt: String, den: Int,
                 mask: String = "<mask>"): Column =
    graft.functions.TextHashExprs.maskTokens(text, salt, den, mask)
      .getField("masked")

  /** Count of tokens [[maskTokens]] masks for the same (salt, den). */
  def maskedTokenCount(text: Column, salt: String, den: Int,
                       mask: String = "<mask>"): Column =
    graft.functions.TextHashExprs.maskTokens(text, salt, den, mask)
      .getField("n_masked")

  /** Oracle faces of [[maskTokens]]/[[maskedTokenCount]]. */
  def maskTokensSql(textE: String, salt: String, den: Int,
                    mask: String = "<mask>"): String = {
    val s = salt.replace("'", "''")
    s"array_to_string(list_transform(regexp_split_to_array(trim($textE), '\\s+'), " +
      s"w -> CASE WHEN ${Fns.hashPSql(s"'$s'||w")} % $den = 0 THEN '$mask' ELSE w END), ' ')"
  }
  def maskedTokenCountSql(textE: String, salt: String, den: Int): String = {
    val s = salt.replace("'", "''")
    s"len(list_filter(regexp_split_to_array(trim($textE), '\\s+'), " +
      s"w -> ${Fns.hashPSql(s"'$s'||w")} % $den = 0))"
  }

  /** Oracle face of [[mixtureWeights]] — identical expression chains so every
    * IEEE step matches. */
  def mixtureWeightsSql(tableE: String, textE: String, srcE: String,
                        budgetTokens: Long): String =
    s"""WITH mw_n AS (SELECT $srcE AS source,
       |    CAST(SUM(len(regexp_split_to_array(trim($textE), '\\s+'))) AS BIGINT) AS n_tokens
       |  FROM $tableE GROUP BY 1),
       |mw_q AS (SELECT source, n_tokens,
       |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS sm
       |  FROM mw_n),
       |mw_t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tn,
       |         CAST(SUM(sm) AS BIGINT) AS ts FROM mw_q)
       |SELECT source, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / CAST(tn AS DOUBLE) AS w_prop,
       |  CAST(sm AS DOUBLE) / CAST(ts AS DOUBLE) AS w_temp,
       |  CAST(sm AS DOUBLE) / CAST(ts AS DOUBLE)
       |    * ${budgetTokens.toDouble} / CAST(n_tokens AS DOUBLE) AS eff_epochs
       |FROM mw_q, mw_t""".stripMargin
}
