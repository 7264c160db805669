package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Text analysis pack (north-star): language ID, quality scoring, token
  * counting, document fingerprinting. All per-row codegen'd expressions — no
  * shuffle, no UDF; at 100 TB these run at scan speed inside one stage.
  * Regex patterns are passed as Column literals (never through the SQL
  * parser) and restricted to syntax with identical semantics in Java regex
  * (Spark) and RE2 (DuckDB oracle).
  */
object TextAnalysis {

  /** BPE-ish token regex: letter runs | digit runs | other-symbol runs. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** Regex token count (BPE-ish, group 0). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(TokenPattern), lit(0)))

  // ---- language ID (stopword-hit heuristic) -----------------------------
  /** Source of truth lives beside the compiled kernel that consumes it. */
  val Stopwords: Seq[(String, Seq[String])] = graft.functions.TextMetrics.Stopwords

  /** CJK block as literal chars (identical in Java regex and RE2 classes). */
  val CjkClass: String = s"[${0x4e00.toChar}-${0x9fff.toChar}]"

  /** Words for language scoring: lowercase letter runs. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  def stopwordHits(ws: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(ws, w => array_contains(stopArr, w)))
  }

  /** Deterministic argmax language: CJK chars → zh, else highest stopword hit
    * count with ties broken in [[Stopwords]] order, no hits → "und".
    *
    * All counts come from ONE compiled pass ([[graft.functions
    * .TextMetricExprs.langStats]]); the pick logic is cheap scalar whens
    * over the count array. The previous all-declarative form inlined the
    * `words()` regex into every per-language stopword filter and the tie
    * chain referenced every score twice — the expression tree blew up
    * combinatorially (hundreds of seconds of codegen + interpreted HOF eval
    * at sf0.1; invisible to `count()` timing — Bench scaladoc). */
  def langId(text: Column): Column = {
    val st = graft.functions.TextMetricExprs.langStats(text)
    val cjk = element_at(st, 2)
    val scores = Stopwords.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(st, 3 + i)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // Built inside-out so earlier Stopwords entries win ties (en first).
    val pickOrdered = scores.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, s)) => when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(cjk > 0, lit("zh")).otherwise(pickOrdered)
  }

  // ---- quality scoring ---------------------------------------------------
  /** Quality features: exact int counts turned into double ratios with a
    * fixed formula shape, bit-reproducible in the oracle. Word/stopword
    * counts come from the compiled one-pass kernel (langId note); the
    * char-class counts stay as codegen'd regexp_replace built-ins. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t).cast("double")
    val upper = length(regexp_replace(t, "[^A-Z]", "")).cast("double")
    val digit = length(regexp_replace(t, "[^0-9]", "")).cast("double")
    val punct = length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("double")
    val st = graft.functions.TextMetricExprs.langStats(t)
    val nWords = element_at(st, 1).cast("double")
    val stops = element_at(st, 3).cast("double")
    df.withColumn("n_chars_m", n)
      .withColumn("n_words", nWords)
      .withColumn("upper_ratio", upper / n)
      .withColumn("digit_ratio", digit / n)
      .withColumn("punct_ratio", punct / n)
      .withColumn("stop_ratio", stops / nWords)
  }

  // ---- corpus term statistics (TF / DF) ----------------------------------
  /** Per-(doc, term) term frequency joined with corpus document frequency —
    * the TF-IDF building block, kept in exact integers (a cross-engine `ln`
    * is not bit-reproducible; downstream applies its own idf formula).
    *
    * Scale: two shuffles, both keyed by term-shaped keys — (doc, term)
    * partial-agg for tf (map-side combine applies), term for df. The join
    * back broadcasts when the vocabulary is small, shuffles by term when
    * not. Stop-word-heavy vocabularies skew the df key → salt or filter
    * stop words first. */
  def termFreq(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Corpus document frequency from a termFreq table. */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  def termStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = termFreq(df, textCol, idCol)
    tf.join(docFreq(tf), "term").select(col(idCol), col("term"), col("tf"), col("df"))
  }

  // ---- fingerprint -------------------------------------------------------
  val FpMod: Long = 1000000007L

  /** Polynomial rolling fingerprint over word hashes:
    * fold(0, (acc, h) -> (acc*31 + h) % FpMod). Left fold in both engines
    * (Spark aggregate with 0 init; DuckDB list_reduce over list_prepend 0). */
  def fingerprint(text: Column): Column = {
    val hs = transform(split(trim(text), "\\s+"), w => Fns.hashP(w))
    aggregate(hs, lit(0L), (acc, h) => (acc * 31 + h) % FpMod)
  }
  def fingerprintSql(textE: String): String = {
    val ws = s"regexp_split_to_array(trim($textE), '\\s+')"
    val hs = s"list_transform($ws, w -> ${Fns.hashPSql("w")})"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $hs), (acc, h) -> (acc * 31 + h) % $FpMod)"
  }

  // ---- exact per-group length quantiles ----------------------------------
  /** The default corpus-stats percentile set: (label, numerator,
    * denominator) fractions — pure integers so the rank computation is
    * exact in any engine. */
  val DefaultQuantiles: Seq[(String, Int, Int)] = Seq(
    ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10), ("p99", 99, 100))

  /** EXACT per-group quantiles of a token-length column — the length
    * distribution a pipeline reads before choosing packing budgets and
    * truncation points. Discrete (lower) quantile at rank ⌈p·n⌉ over the
    * group sorted by (length, id): the rank arithmetic is pure integer
    * (`(num·n + den − 1) div den` ≡ ⌈num·n/den⌉ — no float quantile
    * interpolation, whose op order differs between engines), so results
    * are engine-exact and tie-stable.
    *
    * Scale: one window per group (groups = sources, bounded and modest —
    * the same per-group caveat as [[Curation.packSequences]]; shard the
    * group key if a single group outgrows a task) plus a broadcast-literal
    * percentile list. For quantiles over UNGROUPED 100 TB corpora use a
    * sketch (approx_percentile) instead — this operator is the exact face. */
  def lengthQuantiles(df: DataFrame, groupCol: String, idCol: String,
                      tokens: Column,
                      ps: Seq[(String, Int, Int)] = DefaultQuantiles): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .select(col(groupCol), col(idCol), tokens.as("tokens"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("tokens"), col(idCol))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val pList = explode(array(ps.map { case (l, nu, de) =>
      struct(lit(l).as("pl"), lit(nu).as("nu"), lit(de).as("de"))
    }: _*))
    // ⌈nu·n/de⌉ via exact integer arithmetic: (a − a mod de) / de with
    // a = nu·n + de − 1 — no Column-level `div`, and float `floor(a/b)`
    // could cross an integer boundary on rounding.
    val a = col("pp.nu") * col("n") + col("pp.de") - 1
    val ceilRank = ((a - pmod(a, col("pp.de"))) / col("pp.de")).cast("long")
    ranked.select(col(groupCol), col("tokens"), col("rn"), col("n"), pList.as("pp"))
      .filter(col("rn") === ceilRank)
      .select(col(groupCol), col("pp.pl").as("pl"), col("tokens"))
  }

  // ---- extended word statistics (Gopher-style signals) -------------------
  /** Per-document word-shape statistics over whitespace tokens — the
    * Gopher-rule signals not already covered by [[qualityFeatures]]/q57:
    * mean token length, alphabetic-token fraction, digit-bearing-token
    * fraction. Counts are exact int64 (per-row HOF folds, scan-stage only);
    * each ratio is ONE IEEE division of two exact longs, so the oracle
    * matches without float formatting.
    *
    * CONTRACT: empty/whitespace-only text counts as ONE empty token
    * (n_tokens=1, sum_len=0) — the repo-wide whitespace-split convention
    * ([[wsTokenCount]], q50/q67/q79 use the same); filter empty documents
    * upstream if they must not appear as 1-token rows. */
  def gopherWordStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // every count from the compiled one-pass kernel (langId note): the
    // anchored-alpha / any-digit token classes are exact char-loop
    // equivalents of the previous per-token rlike lambdas
    df.select(col(idCol),
        graft.functions.TextMetricExprs.wordStats(col(textCol)).as("__wst"))
      .select(col(idCol),
        element_at(col("__wst"), 1).cast("int").as("n_tokens"),
        element_at(col("__wst"), 2).as("sum_len"),
        element_at(col("__wst"), 4).as("n_alpha"),
        element_at(col("__wst"), 5).as("n_digit"))
      .withColumn("mean_len", col("sum_len").cast("double") / col("n_tokens").cast("double"))
      .withColumn("alpha_frac", col("n_alpha").cast("double") / col("n_tokens").cast("double"))
      .withColumn("digit_frac", col("n_digit").cast("double") / col("n_tokens").cast("double"))
  }

  /** Oracle face of [[gopherWordStats]]. `regexp_full_match` ≡ the anchored
    * Java regex; the character classes are Java≡RE2-safe. */
  def gopherWordStatsSql(tableE: String, textE: String, idE: String): String = {
    val toksE = s"regexp_split_to_array(trim($textE), '\\s+')"
    s"""SELECT id, n_tokens, sum_len, n_alpha, n_digit,
       |  (CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS mean_len,
       |  (CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS alpha_frac,
       |  (CAST(n_digit AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS digit_frac
       |FROM (SELECT $idE AS id, CAST(len($toksE) AS INT) AS n_tokens,
       |        list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform($toksE, t -> CAST(length(t) AS BIGINT))),
       |          (acc, x) -> acc + x) AS sum_len,
       |        CAST(len(list_filter($toksE, t -> regexp_full_match(t, '[A-Za-z]+'))) AS BIGINT) AS n_alpha,
       |        CAST(len(list_filter($toksE, t -> regexp_matches(t, '[0-9]'))) AS BIGINT) AS n_digit
       |      FROM $tableE)""".stripMargin
  }

  // ---- unigram LM log-probability scoring --------------------------------
  /** Unigram language-model score per document — the KenLM-shaped quality
    * filter: build corpus unigram stats, then score each document by
    * Σ_tokens ln p(w) with p(w) = ctf(w)/total. The per-TERM log is
    * quantized to exact integer micro-nats (`floor(ln(p)·1e6)`), so the
    * per-DOC sum is an int64 sum — order-independent by construction, where
    * a raw double Σln would hash-diverge on partial-agg ordering. The
    * remaining cross-engine surface is one `ln` per distinct TERM whose
    * ±1-ulp wobble only flips the floor within ~1e-10 of a boundary —
    * vanishing over a vocabulary, same risk class as the %.6f rule (q49).
    *
    * Scale: the tf/ctf aggs partial-aggregate on term-shaped keys; the
    * total is one broadcast row; the score join shuffles by term (or
    * broadcasts a small vocabulary). Per-doc rollup shuffles (id, two
    * longs). OOV smoothing is out of scope here — every scored token is by
    * construction in the corpus vocabulary (self-scoring); scoring against
    * a FOREIGN LM table needs a left join + a floor-probability literal. */
  def unigramLogProbMicro(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = termFreq(df, textCol, idCol)
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val total = ctf.agg(sum(col("ctf")).as("total"))
    val lpMicro = floor(log(col("ctf").cast("double") / col("total").cast("double")) * lit(1e6))
    tf.join(ctf, "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * lpMicro).as("lp_micro"))
  }

  /** [[unigramLogProbMicro]] against a FOREIGN language model — the
    * CCNet-shaped filter (Wenzek et al. 2020: score a web corpus against a
    * clean-reference LM and keep the low-perplexity head): `lm` is any
    * (term, ctf) table; its total is recomputed on a broadcast row; tokens
    * missing from the LM vocabulary score the OOV floor
    * `⌊ln(1/(total+1))·1e6⌋` — below every in-vocabulary term by
    * construction. Same micro-nat quantization as the self-scored face, so
    * the per-doc sum stays an order-independent int64.
    *
    * Scale: the LM table is the small side (a curated reference corpus's
    * vocabulary) — the term join broadcasts; everything else matches
    * [[unigramLogProbMicro]].
    *
    * CONTRACT: `lm.term` must be unique (one row per term) — a duplicate
    * term fans out the left join and double-counts n_tokens/lp_micro/n_oov
    * for its documents. Re-aggregate first (`lm.groupBy("term")
    * .agg(sum("ctf"))`) when composing shard-level LM tables. */
  def unigramLogProbAgainst(docs: DataFrame, lm: DataFrame,
                            textCol: String, idCol: String): DataFrame = {
    val total = lm.agg(sum(col("ctf")).as("total"))
    val lpMicro = floor(log(col("ctf").cast("double") / col("total").cast("double")) * lit(1e6))
    val oovMicro = floor(log(lit(1.0) / (col("total").cast("double") + lit(1.0))) * lit(1e6))
    termFreq(docs, textCol, idCol)
      .join(broadcast(lm), Seq("term"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * when(col("ctf").isNotNull, lpMicro).otherwise(oovMicro))
          .as("lp_micro"),
        sum(when(col("ctf").isNull, col("tf")).otherwise(lit(0L))).as("n_oov"))
  }

  /** Oracle face of [[unigramLogProbAgainst]]: `lmE` must select
    * (term, ctf) — the same shape the Spark face consumes. */
  def unigramLogProbAgainstSql(tableE: String, textE: String, idE: String,
                               lmE: String): String = {
    val wordsE = s"regexp_extract_all(lower($textE), '[a-z]+')"
    s"""WITH fl_t AS (SELECT $idE AS id, unnest($wordsE) AS term FROM $tableE),
       |fl_tf AS (SELECT id, term, COUNT(*) AS tf FROM fl_t GROUP BY id, term),
       |fl_lm AS ($lmE),
       |fl_n AS (SELECT CAST(SUM(ctf) AS BIGINT) AS total FROM fl_lm)
       |SELECT id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |  CAST(SUM(tf * CASE WHEN ctf IS NOT NULL
       |    THEN CAST(FLOOR(ln(CAST(ctf AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT)
       |    ELSE CAST(FLOOR(ln(1.0 / (CAST(total AS DOUBLE) + 1.0)) * 1000000.0) AS BIGINT)
       |    END) AS BIGINT) AS lp_micro,
       |  CAST(SUM(CASE WHEN ctf IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov
       |FROM fl_tf LEFT JOIN fl_lm USING (term), fl_n
       |GROUP BY id""".stripMargin
  }

  /** Oracle face of [[unigramLogProbMicro]] (same quantization). */
  def unigramLogProbMicroSql(tableE: String, textE: String, idE: String): String = {
    val wordsE = s"regexp_extract_all(lower($textE), '[a-z]+')"
    s"""WITH lp_t AS (SELECT $idE AS id, unnest($wordsE) AS term FROM $tableE),
       |lp_tf AS (SELECT id, term, COUNT(*) AS tf FROM lp_t GROUP BY id, term),
       |lp_ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM lp_tf GROUP BY term),
       |lp_n AS (SELECT CAST(SUM(ctf) AS BIGINT) AS total FROM lp_ctf)
       |SELECT id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |  CAST(SUM(tf * CAST(FLOOR(ln(CAST(ctf AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS lp_micro
       |FROM lp_tf JOIN lp_ctf USING (term), lp_n
       |GROUP BY id""".stripMargin
  }

  // ---- BM25 retrieval scoring --------------------------------------------
  /** Okapi BM25 per (doc, term) — the retrieval-scoring face of the TF/DF
    * pack (idf form is Lucene's `ln(1 + (N - df + 0.5)/(df + 0.5))`, always
    * positive). tf/df/dl/N stay exact BIGINTs; the score is one fixed-shape
    * double expression whose op order is mirrored verbatim by [[bm25Sql]],
    * so the only cross-engine wobble is the ±1-ulp `ln` — neutralized by
    * %.6f formatting downstream (same rule as TF-IDF, q49).
    *
    * Scale: tf and df shuffle on term-shaped keys with map-side combine;
    * dl is a per-row projection (no agg — `size(words)` ≡ Σtf by
    * construction); the (n_docs, total_tokens) aggregate is one broadcast
    * row. The df join shuffles by term (or broadcasts when the vocabulary
    * is small); the dl join co-partitions with tf on the doc id. Stop-word
    * df keys skew — salt or drop stop words first, as with [[termFreq]]. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreq(df, textCol, idCol)
    val dl = df.select(col(idCol), size(words(col(textCol))).as("dl"))
    val totals = df.agg(
      count(lit(1)).as("n_docs"),
      sum(size(words(col(textCol))).cast("long")).as("total_tokens"))
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val idf = log((col("n_docs").cast("double") - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
    val avgdl = col("total_tokens").cast("double") / col("n_docs").cast("double")
    // literal-literal arithmetic is done HERE in Scala doubles (k1+1, 1-b):
    // splicing the folded values into the SQL keeps both engines converting
    // ONE literal each — DuckDB types bare decimal literals as DECIMAL, so
    // an in-SQL (1.0 - b) would be exact-decimal math, not the IEEE
    // subtraction Spark folds, and the two could differ in the last ulp.
    val denom = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))
    tf.join(docFreq(tf), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        ((idf * (tfD * lit(k1 + 1.0))) / denom).as("bm25"))
  }

  /** Oracle face of [[bm25]] — same literals (rendered from the identical
    * Scala doubles) and the same parenthesization, so both engines execute
    * the identical IEEE op sequence around the one `ln`. */
  def bm25Sql(tableE: String, textE: String, idE: String,
              k1: Double = 1.2, b: Double = 0.75): String = {
    val wordsE = s"regexp_extract_all(lower($textE), '[a-z]+')"
    // fold the literal-literal terms in Scala (see the bm25 comment): each
    // spliced literal then undergoes one decimal→double conversion, the
    // exact value Spark's constant-folding produced.
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    s"""WITH bm_t AS (SELECT $idE AS id, unnest($wordsE) AS term FROM $tableE),
       |bm_tf AS (SELECT id, term, COUNT(*) AS tf FROM bm_t GROUP BY id, term),
       |bm_df AS (SELECT term, COUNT(*) AS df FROM bm_tf GROUP BY term),
       |bm_dl AS (SELECT $idE AS id, CAST(len($wordsE) AS INT) AS dl FROM $tableE),
       |bm_n AS (SELECT COUNT(*) AS n_docs,
       |           CAST(SUM(len($wordsE)) AS BIGINT) AS total_tokens FROM $tableE)
       |SELECT id, term, tf, df, dl,
       |  ((ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
       |    * (CAST(tf AS DOUBLE) * $k1p1))
       |   / (CAST(tf AS DOUBLE) + $k1 * ($oneMinusB + $b * (CAST(dl AS DOUBLE)
       |        / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS bm25
       |FROM bm_tf JOIN bm_df USING (term) JOIN bm_dl USING (id), bm_n""".stripMargin
  }

  // ---- hashed linear classifier (fastText-style inference) ---------------
  /** Hashing-trick buckets for [[hashedLinearScore]]. */
  val ClassifierBuckets: Int = 1024

  /** Deterministic demo weight for bucket b, an exact integer in
    * [-1e6, 1e6]: a trained model would supply these; the closed form keeps
    * the oracle expressible. (b+1)·knuth stays < 2^42 — no int64 overflow
    * in either engine. */
  def classifierWeight(bucket: Column): Column =
    (bucket + lit(1L)) * lit(2654435761L) % lit(2000001L) - lit(1000000L)

  /** fastText-style linear scoring over hashed token buckets: each token
    * hashes into one of [[ClassifierBuckets]] weight slots and the document
    * score is the exact int64 sum of its tokens' weights (`label` = sign).
    * This is the standard learned-quality-filter serving shape: weights live
    * in the plan (literal/broadcast), scoring is a per-row fold inside the
    * scan stage — zero shuffle, zero lookup join, runs at scan speed on
    * 100 TB. Integer weights keep the score associativity-free (any fold
    * order gives the same sum), so the oracle matches bit-exactly with no
    * float formatting tricks. */
  def hashedLinearScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ws = words(col(textCol))
    val perToken = transform(ws, w => classifierWeight(Fns.hashP(w) % ClassifierBuckets))
    val score = aggregate(perToken, lit(0L), (acc, x) => acc + x)
    df.select(col(idCol), size(ws).as("n_tokens"), score.as("score_raw"),
      when(score > 0, lit(1)).otherwise(lit(0)).as("label"))
  }

  /** Oracle face of [[hashedLinearScore]] (same hash, buckets, weights). */
  def hashedLinearScoreSql(tableE: String, textE: String, idE: String): String = {
    val wsE = s"regexp_extract_all(lower($textE), '[a-z]+')"
    val wE = s"(((${Fns.hashPSql("w")} % $ClassifierBuckets) + 1) * 2654435761 % 2000001 - 1000000)"
    s"""SELECT id, n_tokens, score_raw,
       |  CASE WHEN score_raw > 0 THEN 1 ELSE 0 END AS label
       |FROM (SELECT $idE AS id, CAST(len($wsE) AS INT) AS n_tokens,
       |        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($wsE, w -> $wE)),
       |                    (acc, x) -> acc + x) AS score_raw
       |      FROM $tableE)""".stripMargin
  }

  // ---- sparse cosine retrieval (inverted-index top-k) ---------------------
  /** Top-k sparse-cosine retrieval over term-frequency vectors via a
    * posting-list (inverted-index) join — the SPARSE counterpart to the
    * dense-embedding KNN family ([[graft.operators.Similarity]]): docs are
    * tf vectors over the vocabulary, dot(q,d) = Σ_term tf_q·tf_d computed by
    * joining the two tf tables on term, cosine = dot/√(‖q‖²·‖d‖²). All
    * counts and dots are exact int64; the cosine is one IEEE division after
    * one sqrt of an exactly-representable product — engine-exact with no
    * float formatting. Self-pairs (qid = doc id) are excluded.
    *
    * Scale: the classic sparse-retrieval shape — tf/norms partial-aggregate
    * map-side; the posting join is keyed by term (queries side broadcast
    * when small, term-shuffle when not); candidate volume is bounded by
    * Σ_term df(term)·qdf(term), NOT |corpus|·|queries| — docs sharing no
    * term never meet. Stop-word terms blow that bound up AND skew the term
    * key: drop terms with df above a ceiling (they contribute near-zero idf
    * anyway) or salt ([[graft.operators.Salting]]). The final ranking is the
    * bounded-heap top-k aggregate ([[graft.functions.TopKAgg]]) — ≤k
    * entries per query per task on the exchange, never the full score
    * matrix (the [[Similarity.knnJoin]] rationale). */
  def sparseCosineTopK(corpus: DataFrame, queries: DataFrame,
                       textCol: String, idCol: String, k: Int): DataFrame = {
    val ctf = termFreq(corpus, textCol, idCol)
    val qtf = termFreq(queries, textCol, idCol)
      .withColumnRenamed(idCol, "qid").withColumnRenamed("tf", "qtf")
    val cn = ctf.groupBy(col(idCol)).agg(sum(col("tf") * col("tf")).as("__n2"))
    val qn = qtf.groupBy(col("qid")).agg(sum(col("qtf") * col("qtf")).as("__qn2"))
    val dot = ctf.join(broadcast(qtf), "term")
      .filter(col("qid") =!= col(idCol))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("tf") * col("qtf")).as("__dot"))
    val scored = dot.join(cn, idCol).join(broadcast(qn), "qid")
      .select(col("qid"), col(idCol),
        (col("__dot").cast("double")
          / sqrt((col("__n2") * col("__qn2")).cast("double"))).as("cos"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topKByScore(col("cos"), col(idCol), k).as("__tk"))
      .select(col("qid"), posexplode(col("__tk")))
      .select(col("qid"), col("col.id").as(idCol), col("col.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Oracle face of [[sparseCosineTopK]]: same exact-integer dot/norms, same
    * one-division cosine, row_number ranking with the identical
    * (cos DESC, id) contract the bounded heap sorts by. `queryPredE` is the
    * SQL predicate over `$idE` selecting the query docs. */
  def sparseCosineTopKSql(tableE: String, textE: String, idE: String,
                          queryPredE: String, k: Int): String = {
    val wordsE = s"regexp_extract_all(lower($textE), '[a-z]+')"
    s"""WITH sc_t AS (SELECT $idE AS id, unnest($wordsE) AS term FROM $tableE),
       |sc_tf AS (SELECT id, term, COUNT(*) AS tf FROM sc_t GROUP BY id, term),
       |sc_q AS (SELECT id AS qid, term, tf AS qtf FROM sc_tf WHERE $queryPredE),
       |sc_n AS (SELECT id, SUM(tf * tf) AS n2 FROM sc_tf GROUP BY id),
       |sc_qn AS (SELECT qid, SUM(qtf * qtf) AS qn2 FROM sc_q GROUP BY qid),
       |sc_dot AS (SELECT qid, id, SUM(tf * qtf) AS dot
       |  FROM sc_tf JOIN sc_q USING (term) WHERE id <> qid GROUP BY qid, id),
       |sc_s AS (SELECT qid, id,
       |    (CAST(dot AS DOUBLE) / sqrt(CAST(n2 * qn2 AS DOUBLE))) AS cos
       |  FROM sc_dot JOIN sc_n USING (id) JOIN sc_qn USING (qid)),
       |sc_r AS (SELECT qid, id, cos,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS INT) AS rn
       |  FROM sc_s)
       |SELECT qid, id, cos, rn FROM sc_r WHERE rn <= $k""".stripMargin
  }

  // ---- bigram LM scoring ---------------------------------------------------
  /** Bigram language-model score per document in exact integer micro-nats —
    * the conditional-probability rung above [[unigramLogProbMicro]]:
    * p(w₂|w₁) = c(w₁w₂)/c(w₁·) with c(w₁·) = Σ_w c(w₁w), scored as
    * Σ_bigrams tf·⌊ln(p)·1e6⌋. The context marginal is derived FROM the
    * bigram table (not raw unigram counts), so probabilities per context sum
    * to exactly 1 and the conditional is well-defined at document edges.
    * Same micro-nat quantization contract as the unigram face: the per-doc
    * sum is an order-independent int64; the one `ln` per distinct BIGRAM has
    * the q49/q87 boundary-risk class.
    *
    * Scale: bigram tf partial-aggregates on (doc, bigram); the corpus bigram
    * table aggregates on bigram and its context marginal on w₁ — all
    * term-shaped keys with map-side combine; the score join shuffles by
    * bigram (or broadcasts a small vocabulary²). Documents shorter than the
    * gram window contribute their single truncated shingle (the repo-wide
    * [[Fns.wordShingles]] n<w convention), identically in both engines. */
  def bigramLogProbMicro(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.functions.TextHashExprs
    // Compiled one-pass kernels hash each bigram and its first word to
    // [0, P) longs at the SCAN (the interpreted-HOF string-shingle explode
    // was the old hot spot), so every downstream exchange carries 8-byte
    // keys, never gram strings. Grouping by hash is engine-exact: the
    // oracle applies the same md5-based hashP to the same strings, so any
    // collision (p ≈ m²/2⁶⁰) merges identically on both sides.
    val hbs = TextHashExprs.shingleHashes(col(textCol), 2)
    val hws = TextHashExprs.shingleHashes(col(textCol), 1)
    val b = df.select(col(idCol),
        explode(arrays_zip(hbs.as("hb"), slice(hws, lit(1), size(hbs)).as("h1"))).as("p"))
      .select(col(idCol), col("p.hb").as("hb"), col("p.h1").as("h1"))
    val tf2 = b.groupBy(col(idCol), col("hb"))
      .agg(count(lit(1)).as("tf"), max(col("h1")).as("h1"))
    val c2 = tf2.groupBy(col("hb")).agg(sum(col("tf")).as("cbg"), max(col("h1")).as("h1"))
    val c1 = c2.groupBy(col("h1")).agg(sum(col("cbg")).as("cw1"))
    val lp = c2.join(c1, "h1")
      .select(col("hb"),
        floor(log(col("cbg").cast("double") / col("cw1").cast("double")) * lit(1e6))
          .as("lpm"))
    tf2.join(lp, "hb")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("lpm")).as("lp_micro"))
  }

  /** Oracle face of [[bigramLogProbMicro]] (same shingles, same hashP keys,
    * same marginal derivation, same micro-nat floor). */
  def bigramLogProbMicroSql(tableE: String, textE: String, idE: String): String = {
    val shE = Fns.wordShinglesSql(textE, 2)
    s"""WITH bg_raw AS (SELECT $idE AS id, unnest($shE) AS bg FROM $tableE),
       |bg_b AS (SELECT id, ${Fns.hashPSql("bg")} AS hb,
       |    ${Fns.hashPSql("split_part(bg, ' ', 1)")} AS h1 FROM bg_raw),
       |bg_tf AS (SELECT id, hb, COUNT(*) AS tf, MAX(h1) AS h1
       |  FROM bg_b GROUP BY id, hb),
       |bg_c2 AS (SELECT hb, CAST(SUM(tf) AS BIGINT) AS cbg, MAX(h1) AS h1
       |  FROM bg_tf GROUP BY hb),
       |bg_c1 AS (SELECT h1, CAST(SUM(cbg) AS BIGINT) AS cw1 FROM bg_c2 GROUP BY h1),
       |bg_lp AS (SELECT hb,
       |    CAST(FLOOR(ln(CAST(cbg AS DOUBLE) / CAST(cw1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS lpm
       |  FROM bg_c2 JOIN bg_c1 USING (h1))
       |SELECT id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(tf * lpm) AS BIGINT) AS lp_micro
       |FROM bg_tf JOIN bg_lp USING (hb) GROUP BY id""".stripMargin
  }

  // ---- reciprocal-rank fusion (hybrid retrieval) -------------------------
  /** Reciprocal-rank fusion (Cormack et al. 2009) of two rankings — the
    * standard way to combine a lexical ([[bm25]]) and a dense (cosine KNN)
    * retrieval list into one hybrid ranking: each list contributes
    * `1/(kRrf + rank)` for the ids it ranked, absent ids contribute 0.
    *
    * Inputs are (idCol, rankCol) frames that the CALLER has already cut to
    * its top-K (rank 1 = best); the fusion is then a full-outer join of two
    * K-row sets — broadcastable, never corpus-sized. Output ranks are
    * coalesced to 0 as the "absent from this list" marker.
    *
    * Cross-engine exactness: ranks are exact int64; each contribution is
    * one IEEE division of 1.0 by an exactly-representable integer, and the
    * final score is ONE addition in fixed (a, b) order — both engines run
    * the identical op sequence, so the double is bit-identical (format it
    * `%.6f` downstream anyway, per the repo rule for surfaced doubles). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
              kRrf: Int = 60): DataFrame = {
    val l = a.select(col(idCol).as("__id"), col(rankCol).as("__ra"))
    val r = b.select(col(idCol).as("__id"), col(rankCol).as("__rb"))
    val contrib = (c: Column) => lit(1.0) / (lit(kRrf.toLong) + c).cast("double")
    l.join(r, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        coalesce(col("__ra"), lit(0L)).as("rank_a"),
        coalesce(col("__rb"), lit(0L)).as("rank_b"),
        (coalesce(contrib(col("__ra")), lit(0.0))
          + coalesce(contrib(col("__rb")), lit(0.0))).as("rrf"))
  }

  /** Oracle face of [[rrfFuse]]: `aSql`/`bSql` are subqueries producing
    * (id, rank); same coalesce-to-0 markers, same fixed-order addition. */
  def rrfFuseSql(aSql: String, bSql: String, kRrf: Int = 60): String =
    s"""SELECT COALESCE(l.id, r.id) AS id,
       |  COALESCE(l.rank, 0) AS rank_a, COALESCE(r.rank, 0) AS rank_b,
       |  (COALESCE(1.0 / CAST(($kRrf + l.rank) AS DOUBLE), 0.0)
       |    + COALESCE(1.0 / CAST(($kRrf + r.rank) AS DOUBLE), 0.0)) AS rrf
       |FROM ($aSql) l FULL OUTER JOIN ($bSql) r ON l.id = r.id""".stripMargin

  /** Oracle face of [[lengthQuantiles]] (same integer rank arithmetic). */
  def lengthQuantilesSql(tableE: String, groupE: String, idE: String,
                         tokensE: String,
                         ps: Seq[(String, Int, Int)] = DefaultQuantiles): String = {
    val values = ps.map { case (l, nu, de) => s"('$l', $nu, $de)" }.mkString(", ")
    s"""WITH tq_t AS (SELECT $groupE AS g, $idE AS id, $tokensE AS tokens FROM $tableE),
       |tq_r AS (SELECT g, tokens,
       |           row_number() OVER (PARTITION BY g ORDER BY tokens, id) AS rn,
       |           COUNT(*) OVER (PARTITION BY g) AS n
       |         FROM tq_t),
       |tq_p AS (SELECT * FROM (VALUES $values) AS p(pl, nu, de))
       |SELECT g, pl, tokens FROM tq_r, tq_p
       |WHERE rn = (nu * n + de - 1) // de""".stripMargin
  }

  // ---- vocabulary coverage ------------------------------------------------
  /** Top-V vocabulary coverage (the tokenizer-design question "how big must
    * the vocab be before source X stops drowning in OOV"): build the corpus
    * top-`v` term vocabulary by total frequency (ties broken lexicographically
    * so the cut is total-ordered), then report per-group token counts, OOV
    * token counts, and distinct OOV terms. All-integer output.
    *
    * Scale: the vocabulary is a global top-V — `orderBy.limit(v)` compiles to
    * `TakeOrderedAndProject` (each task keeps ≤ v rows, the driver merges
    * B·v, never a full sort) — and is broadcast to the coverage join, so the
    * token stream is never shuffled by term; the only full shuffle is the
    * per-group partial agg. */
  def vocabCoverage(df: DataFrame, textCol: String, groupCol: String,
                    v: Int): DataFrame = {
    val tok = df.select(col(groupCol), explode(words(col(textCol))).as("term"))
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term").asc).limit(v)
      .select(col("term"), lit(1).as("__in_v"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"),
        countDistinct(when(col("__in_v").isNull, col("term"))).as("n_oov_terms"))
  }

  /** Oracle face of [[vocabCoverage]] (same tie-broken top-V cut). */
  def vocabCoverageSql(tableE: String, textE: String, groupE: String,
                       v: Int): String =
    s"""WITH vc_t AS (SELECT $groupE AS g,
       |    unnest(regexp_extract_all(lower($textE), '[a-z]+')) AS term FROM $tableE),
       |vc_v AS (SELECT term FROM (
       |    SELECT term, COUNT(*) AS tf FROM vc_t GROUP BY term
       |    ORDER BY tf DESC, term LIMIT $v))
       |SELECT g, COUNT(*) AS n_tokens,
       |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  COUNT(DISTINCT CASE WHEN v.term IS NULL THEN t.term END) AS n_oov_terms
       |FROM vc_t t LEFT JOIN vc_v v ON t.term = v.term
       |GROUP BY g""".stripMargin

  // ---- tokenizer fertility ------------------------------------------------
  /** Tokenizer fertility report: per group, exact int64 sums of BPE-ish
    * regex tokens ([[TokenPattern]]), whitespace tokens, and characters, plus
    * `fertility` = regex-tokens per whitespace-token and `chars_per_token` —
    * each ONE correctly-rounded IEEE division of identical exact integers,
    * so the doubles are bit-identical cross-engine. The go/no-go number for
    * a tokenizer on a new source (fertility ≫ 1 ⇒ the source fragments).
    *
    * Scale: both counts are per-row scalars in the scan stage; the shuffle
    * carries one partial-agg row per (task, group). */
  def tokenizerFertility(df: DataFrame, textCol: String,
                         groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(sum(tokenCount(col(textCol))).cast("long").as("n_bpe_tokens"),
        sum(wsTokenCount(col(textCol))).cast("long").as("n_ws_tokens"),
        sum(length(col(textCol))).cast("long").as("n_chars"))
      .select(col(groupCol), col("n_bpe_tokens"), col("n_ws_tokens"), col("n_chars"),
        (col("n_bpe_tokens").cast("double") / col("n_ws_tokens").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
          .as("chars_per_token"))

  // ---- PMI collocations ---------------------------------------------------
  /** Document-level PMI collocation mining (the word2vec-phrases signal):
    * for every within-document distinct term pair (a < b) seen in ≥ `minSup`
    * documents, PMI = ln(n_ab·N / (n_a·n_b)) over document frequencies,
    * reported in ⌊·1e6⌋ micro-nats — the ratio is formed from exact int64
    * products, so there is exactly ONE ln + one multiply per pair and the
    * quantized value hash-matches cross-engine (the q120 shape).
    *
    * Scale: the corpus collapses to distinct (doc, term) postings first; the
    * pair generation is a self-join keyed on doc_id, so its cost is
    * Σ m_d² over per-doc DISTINCT terms — bounded by vocabulary discipline
    * (cap m_d upstream for degenerate docs), never corpus-length-squared.
    * Term doc-frequencies join back by term key; N rides a broadcast row. */
  def pmiPairs(df: DataFrame, textCol: String, idCol: String,
               minSup: Long): DataFrame = {
    val dt = df.select(col(idCol).as("__d"),
      explode(array_distinct(words(col(textCol)))).as("term"))
    val nT = dt.groupBy("term").agg(count(lit(1)).as("n_t"))
    val nDocs = broadcast(df.agg(count(lit(1)).as("n_docs")))
    val pairs = dt.as("x")
      .join(dt.withColumnRenamed("term", "term_b").as("y"), "__d")
      .filter(col("term") < col("term_b"))
      .groupBy(col("term").as("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSup)
    pairs
      .join(nT.select(col("term").as("term_a"), col("n_t").as("n_a")), "term_a")
      .join(nT.select(col("term").as("term_b"), col("n_t").as("n_b")), "term_b")
      .crossJoin(nDocs)
      .select(col("term_a"), col("term_b"), col("n_ab"), col("n_a"), col("n_b"),
        floor(log((col("n_ab") * col("n_docs")).cast("double")
            / (col("n_a") * col("n_b")).cast("double")) * lit(1e6))
          .cast("long").as("pmi_micro"))
  }

  /** Oracle face of [[pmiPairs]] (same distinct-posting pair counts, same
    * single-ln quantization). */
  def pmiPairsSql(tableE: String, textE: String, idE: String,
                  minSup: Long): String =
    s"""WITH pm_t AS (SELECT DISTINCT $idE AS d,
       |    unnest(regexp_extract_all(lower($textE), '[a-z]+')) AS term
       |  FROM $tableE),
       |pm_f AS (SELECT term, COUNT(*) AS n_t FROM pm_t GROUP BY term),
       |pm_n AS (SELECT COUNT(*) AS n_docs FROM $tableE),
       |pm_p AS (SELECT x.term AS term_a, y.term AS term_b, COUNT(*) AS n_ab
       |  FROM pm_t x JOIN pm_t y ON x.d = y.d AND x.term < y.term
       |  GROUP BY x.term, y.term HAVING COUNT(*) >= $minSup)
       |SELECT term_a, term_b, n_ab, a.n_t AS n_a, b.n_t AS n_b,
       |  CAST(FLOOR(ln(CAST(n_ab * n_docs AS DOUBLE)
       |    / CAST(a.n_t * b.n_t AS DOUBLE)) * 1e6) AS BIGINT) AS pmi_micro
       |FROM pm_p JOIN pm_f a ON pm_p.term_a = a.term
       |JOIN pm_f b ON pm_p.term_b = b.term, pm_n""".stripMargin

  /** Oracle face of [[tokenizerFertility]] (same regex, same divisions). */
  def tokenizerFertilitySql(tableE: String, textE: String,
                            groupE: String): String =
    s"""WITH tf_s AS (SELECT $groupE AS g,
       |    CAST(SUM(len(regexp_extract_all($textE, '$TokenPattern'))) AS BIGINT) AS n_bpe_tokens,
       |    CAST(SUM(len(regexp_split_to_array(trim($textE), '\\s+'))) AS BIGINT) AS n_ws_tokens,
       |    CAST(SUM(length($textE)) AS BIGINT) AS n_chars
       |  FROM $tableE GROUP BY g)
       |SELECT g, n_bpe_tokens, n_ws_tokens, n_chars,
       |  CAST(n_bpe_tokens AS DOUBLE) / CAST(n_ws_tokens AS DOUBLE) AS fertility,
       |  CAST(n_chars AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE) AS chars_per_token
       |FROM tf_s""".stripMargin

  // ---- Zipf rank-frequency fit ---------------------------------------------

  /** OLS fit of the corpus rank-frequency curve in log-log space — the Zipf
    * law diagnostic (natural text fits slope ≈ −1; template/boilerplate-heavy
    * or synthetic mixtures flatten or steepen it, making the slope a cheap
    * corpus-drift check next to the q104-style source entropy).
    *
    * Determinism: ranks 1..topR come from a TOTAL order (tf DESC, term);
    * x = ⌊ln(rank)·1e6⌋ and y = ⌊ln(tf)·1e6⌋ are exact integer micro-nats
    * (the q87 quantization); Σx, Σy, Σxy, Σx² are exact int64 sums; the OLS
    * numerator/denominator n·Σxy − Σx·Σy and n·Σx² − (Σx)² EXCEED int64, so
    * they combine in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both exact
    * integer arithmetic — and reach DOUBLE via the repo's exact
    * decimal-via-VARCHAR cast (the dsum rule: direct decimal→double
    * double-rounds in DuckDB past 2^53). slope is then ONE IEEE division;
    * intercept = (Σy − slope·Σx)/n is a fixed mirrored chain over
    * exactly-representable operands. Output: one row
    * (n_terms, slope, intercept) with slope/intercept in micro-nat units
    * (divide by nothing — both axes carry the same 1e6 factor, which cancels
    * in the slope; the intercept stays in micro-nats by design).
    *
    * Scale: corpus rows collapse to the vocabulary with a partial-agg'd tf;
    * the top-R cut is an EXPLICIT distributed TakeOrdered (per-partition
    * top-R, R-sized merge — the keySkewReport idiom) BEFORE the rank
    * window, so the window only ever orders ≤ topR rows regardless of
    * vocabulary size — no bet on the optimizer's rank-limit rewrite; the
    * regression is a single tiny aggregate. */
  def zipfFit(df: DataFrame, textCol: String, topR: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec38 = "decimal(38,0)"
    val tf = df.select(explode(words(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val ranked = tf
      .orderBy(col("tf").desc, col("term")).limit(topR)
      .withColumn("r", row_number().over(Window.orderBy(col("tf").desc, col("term"))))
      .select(floor(log(col("r").cast("double")) * lit(1e6)).cast("long").as("x"),
        floor(log(col("tf").cast("double")) * lit(1e6)).cast("long").as("y"))
    val s = ranked.agg(count(lit(1)).as("n_terms"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    // Degenerate corpora (<2 ranked terms) zero the denominator; Spark would
    // return NaN but DuckDB NULL — guard both faces to NULL (see zipfFitSql's
    // NULLIF) so the engines agree.
    val olsNum = (col("n_terms").cast(dec38) * col("sxy").cast(dec38)
      - col("sx").cast(dec38) * col("sy").cast(dec38))
      .cast("string").cast("double")
    val olsDen = (col("n_terms").cast(dec38) * col("sxx").cast(dec38)
      - col("sx").cast(dec38) * col("sx").cast(dec38))
      .cast("string").cast("double")
    s.withColumn("slope", when(olsDen =!= 0.0, olsNum / olsDen))
      .select(col("n_terms"),
        col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n_terms").cast("double")).as("intercept"))
  }

  /** Oracle face of [[zipfFit]]: same total rank order, same micro-nat
    * quantization, HUGEINT (exact int128) for the OLS combination and the
    * same VARCHAR-mediated exact cast to DOUBLE. */
  def zipfFitSql(tableE: String, textE: String, topR: Int): String =
    s"""WITH zf_t AS (SELECT unnest(regexp_extract_all(lower($textE), '[a-z]+')) AS term FROM $tableE),
       |zf_tf AS (SELECT term, COUNT(*) AS tf FROM zf_t GROUP BY term),
       |zf_r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS r FROM zf_tf),
       |zf_xy AS (SELECT
       |    CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
       |    CAST(FLOOR(ln(CAST(tf AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
       |  FROM zf_r WHERE r <= $topR),
       |zf_s AS (SELECT COUNT(*) AS n_terms,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM zf_xy),
       |zf_f AS (SELECT n_terms, sx, sy,
       |    CAST(CAST(CAST(n_terms AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
       |      / NULLIF(CAST(CAST(CAST(n_terms AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE), 0.0) AS slope
       |  FROM zf_s)
       |SELECT n_terms, slope,
       |  (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n_terms AS DOUBLE) AS intercept
       |FROM zf_f""".stripMargin

  // ---- BPE merge learning (tokenizer training) ----------------------------
  /** Separator for the wrapped-symbol string encoding. Words are lowercase
    * letter runs, so U+001F never collides with symbol content. */
  val BpeSep = "\u001f"

  /** Wrapped-symbol encoding of a word's current segmentation: every symbol
    * is individually wrapped, `␟sym₁␟␟sym₂␟…` — so the merge of pair (l,r)
    * is ONE literal string replace of `␟l␟␟r␟` with `␟lr␟`, and `replace`'s
    * left-to-right non-overlapping scan IS BPE's greedy merge order, in
    * both engines, with no fold and no false match across symbol
    * boundaries (a pattern's leading `␟l␟` can't match the tail of a
    * longer symbol — the char before would be part of that symbol, not a
    * wrap separator). */
  private def bpeInitSymbols(word: Column): Column =
    concat(lit(BpeSep),
      rtrim(regexp_replace(word, "(.)", s"$$1$BpeSep$BpeSep"), BpeSep),
      lit(BpeSep))

  /** Sennrich-style BPE merge learning: the `k` highest-count adjacent
    * symbol pairs over the corpus, learned iteratively (each merge applies
    * before the next count). Output: (rank, lhs, rhs, weight) — weight is
    * the pair's corpus frequency at the time it was chosen; ties break
    * (weight DESC, lhs, rhs), total order.
    *
    * Scale — the classic tokenizer-training shape: the CORPUS is scanned
    * once, into the word-TYPE table (groupBy word, vocabulary-bounded
    * regardless of corpus size); every iteration then touches only the
    * vocabulary — pair counts partial-aggregate map-side, the top-1 is a
    * TakeOrdered (never a full sort), the merge application is one
    * codegen'd literal `replace` in the scan stage; the driver holds k
    * (pair, count) rows and nothing else. k is small (a production vocab
    * build runs ~30k merges of a few million word types — still vocab-,
    * not corpus-, scaled). */
  def bpeTopMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    // localCheckpoint after the corpus aggregation: WITHOUT it, every
    // iteration's collect() re-runs the corpus scan + explode + groupBy
    // (the phashPairs re-evaluation trap) — the "scanned ONCE" contract
    // only holds if the vocab is materialized. Re-checkpoint after each
    // merge application so the replace chain doesn't deepen the lineage
    // (k can be tens of thousands in a production vocab build).
    var vocab = df
      .select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), bpeInitSymbols(col("w")).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val syms = split(trim(col("s"), BpeSep), BpeSep + BpeSep)
      val top = vocab
        .select(col("freq"), syms.as("__syms"))
        .select(col("freq"), explode(
          when(size(col("__syms")) >= 2,
            transform(sequence(lit(1), size(col("__syms")) - 1), i =>
              struct(element_at(col("__syms"), i).as("l"),
                element_at(col("__syms"), i + 1).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, cnt))
        vocab = vocab.withColumn("s", replace(col("s"),
          lit(BpeSep + l + BpeSep + BpeSep + r + BpeSep), lit(BpeSep + l + r + BpeSep)))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "weight")
      .select(col("rank").cast("int").as("rank"), col("lhs"), col("rhs"), col("weight"))
  }

  /** [[bpeTopMerges]] with the k-iteration loop run on the DRIVER over the
    * collected word-TYPE table: the corpus is still scanned exactly once,
    * distributed (explode → groupBy word), but the per-iteration pair
    * count / top-1 / merge-apply — which touch only the vocabulary — run
    * in memory instead of as k Spark jobs. Identical output by
    * construction (same pair counting incl. within-word duplicates, same
    * (cnt DESC, l, r) tie-break, same full left-to-right non-overlapping
    * merge pass); TextMetricsSpec pins the equality against the
    * distributed form. Use THIS when the vocabulary fits the driver (tens
    * of millions of word types — true even at 100 TB for natural-language
    * corpora); use [[bpeTopMerges]] when it does not. */
  def bpeTrainLocal(df: DataFrame, textCol: String, k: Int): Seq[(Int, String, String, Long)] = {
    val types = df
      .select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // mutable (symbols, freq) per word type
    val syms = types.map { case (w, _) => w.toCharArray.map(String.valueOf) }
    val freqs = types.map(_._2)
    // INCREMENTAL pair-count maintenance (r20): the previous form recounted
    // every word type's adjacencies per rank — O(k · Σ|word|). The counts
    // map is now maintained across ranks: a merge touches only the words
    // that contain the merged pair (found via an occurrence index with lazy
    // deletion — stale entries are re-checked against the live symbols),
    // and each touched word contributes an exact -old/+new pair-multiset
    // delta, so `counts` equals the full recount at every rank by
    // construction. Selection (max by cnt DESC, l ASC, r ASC) and the
    // greedy left-to-right non-overlapping merge apply are unchanged, so
    // ranks and tie-breaks are identical to the distributed trainer —
    // TextMetricsSpec pins both the equality and the hand-computed ties.
    val counts = new java.util.HashMap[(String, String), java.lang.Long]()
    val occ = new java.util.HashMap[(String, String),
      scala.collection.mutable.ArrayBuffer[Int]]()
    // Add (sign=+1, recording occurrences) or retract (sign=-1) word t's
    // adjacent-pair multiset; entries hitting 0 are removed so `counts`
    // holds exactly the live pairs.
    def applyWordPairs(t: Int, sign: Long): Unit = {
      val s = syms(t); val d = sign * freqs(t)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val nv = counts.merge(p, d, (a, b) => a + b)
        if (nv == 0L) counts.remove(p)
        if (sign > 0) {
          var lst = occ.get(p)
          if (lst == null) { lst = scala.collection.mutable.ArrayBuffer.empty[Int]; occ.put(p, lst) }
          if (lst.isEmpty || lst.last != t) lst += t
        }
        i += 1
      }
    }
    var t = 0
    while (t < syms.length) { applyWordPairs(t, 1L); t += 1 }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= k && !counts.isEmpty) {
      var bl: String = null; var br: String = null; var bc = -1L
      counts.forEach { (p, c) =>
        if (c > bc || (c == bc &&
            (p._1 < bl || (p._1 == bl && p._2 < br)))) {
          bl = p._1; br = p._2; bc = c
        }
      }
      merges += ((rank, bl, br, bc))
      val lr = bl + br
      val touched = occ.remove((bl, br))
      if (touched != null) {
        val seen = new java.util.HashSet[Int]()
        touched.foreach { t =>
          if (seen.add(t)) {
            val s = syms(t)
            var has = false
            var i = 0
            while (i < s.length - 1 && !has) {
              if (s(i) == bl && s(i + 1) == br) has = true; i += 1
            }
            if (has) { // stale index entries fail this recheck and are skipped
              applyWordPairs(t, -1L)
              val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
              i = 0
              while (i < s.length) {
                if (i < s.length - 1 && s(i) == bl && s(i + 1) == br) {
                  out += lr; i += 2
                } else { out += s(i); i += 1 }
              }
              syms(t) = out.toArray
              applyWordPairs(t, 1L)
            }
          }
        }
      }
      rank += 1
    }
    merges.toSeq
  }

  /** Apply a learned merge list: per document, the BPE token count after
    * the `merges` apply in order — the "encode" half of the tokenizer
    * ([[bpeTopMerges]] is "train"). Each word wraps into the symbol
    * encoding, the merges chain as k literal replaces (greedy
    * left-to-right, the same order training used), and the token count is
    * the surviving segment count summed over the document's words.
    *
    * Scale: a pure per-row scalar pipeline — regexp + k replaces + split
    * inside one codegen stage, zero shuffle; the merge list is k driver
    * literals (a production vocab is ~30k merges — at that size ship the
    * merge ranks as a broadcast map and segment with a compiled kernel;
    * the k-literal form here is the oracle-exact reference). */
  def bpeSegmentCount(text: Column, merges: Seq[(String, String)]): Column = {
    val ws = words(text)
    val counted = transform(ws, w => {
      val segmented = merges.foldLeft(bpeInitSymbols(w)) { case (s, (l, r)) =>
        replace(s, lit(BpeSep + l + BpeSep + BpeSep + r + BpeSep),
          lit(BpeSep + l + r + BpeSep))
      }
      size(split(trim(segmented, BpeSep), BpeSep + BpeSep))
    })
    aggregate(counted, lit(0L), (acc, x) => acc + x)
  }

  /** Oracle face of [[bpeSegmentCount]] over a merge chain learned by
    * [[bpeTopMergesSql]]'s CTEs: the k (l, r) pairs ride in as columns of a
    * one-row cross-joined CTE so the per-word lambda can reference them. */
  def bpeSegmentCountSql(tableE: String, textE: String, idE: String,
                         k: Int): String = {
    val S = BpeSep
    val mergeCols = (1 to k).map(i =>
      s"(SELECT l FROM bpe_t$i) AS l$i, (SELECT r FROM bpe_t$i) AS r$i").mkString(", ")
    val wrapped = s"'$S' || rtrim(regexp_replace(w, '(.)', '\\1$S$S', 'g'), '$S') || '$S'"
    // guard each step: if fewer than k merges were learnable, bpe_t$i is
    // empty and l$i/r$i are NULL — an unguarded replace(s, NULL, NULL)
    // would NULL every segmentation and COALESCE would mask it as 0. The
    // guard COALESCEs the SEARCH to three consecutive separators, which a
    // wrapped encoding can never contain (symbols are non-empty, so
    // boundaries are exactly '$S$S' with single '$S' ends) — a no-op
    // replace, keeping the chained expression linear in k (a CASE that
    // repeats the accumulator would double the text per level).
    val chain = (1 to k).foldLeft(wrapped) { (acc, i) =>
      s"replace($acc, COALESCE('$S'||l$i||'$S$S'||r$i||'$S', '$S$S$S'), " +
        s"COALESCE('$S'||l$i||r$i||'$S', ''))"
    }
    s"""bpe_m AS (SELECT $mergeCols),
       |bpe_out AS (SELECT $idE AS id,
       |    CAST(COALESCE(list_sum(list_transform(
       |      regexp_extract_all(lower($textE), '[a-z]+'),
       |      w -> len(string_split(trim($chain, '$S'), '$S$S')))), 0) AS BIGINT) AS n_bpe
       |  FROM $tableE, bpe_m)""".stripMargin
  }

  /** Oracle face of [[graft.functions.BpeKernel.encodeDoc]] over a merge
    * chain learned by [[bpeMergeCtes]]: per document the FULL token stream
    * (each word's surviving symbols space-joined, words space-joined) —
    * strictly stronger than the token count, which derives from it. Same
    * one-row bpe_m cross join + guarded replace chain as
    * [[bpeSegmentCountSql]]; the per-word segmentation string is the
    * chain's wrapped encoding with boundaries (`SS`) respaced and the
    * outer wraps trimmed. Emits CTE `bpe_enc(id, bpe_seg)`. */
  def bpeEncodeSegSql(tableE: String, textE: String, idE: String,
                      k: Int): String = {
    val S = BpeSep
    val mergeCols = (1 to k).map(i =>
      s"(SELECT l FROM bpe_t$i) AS l$i, (SELECT r FROM bpe_t$i) AS r$i").mkString(", ")
    val wrapped = s"'$S' || rtrim(regexp_replace(w, '(.)', '\\1$S$S', 'g'), '$S') || '$S'"
    val chain = (1 to k).foldLeft(wrapped) { (acc, i) =>
      s"replace($acc, COALESCE('$S'||l$i||'$S$S'||r$i||'$S', '$S$S$S'), " +
        s"COALESCE('$S'||l$i||r$i||'$S', ''))"
    }
    s"""bpe_m AS (SELECT $mergeCols),
       |bpe_enc AS (SELECT $idE AS id,
       |    array_to_string(list_transform(
       |      regexp_extract_all(lower($textE), '[a-z]+'),
       |      w -> replace(trim($chain, '$S'), '$S$S', ' ')), ' ') AS bpe_seg
       |  FROM $tableE, bpe_m)""".stripMargin
  }

  /** The merge-learning CTE chain shared by [[bpeTopMergesSql]] and
    * [[bpeSegmentCountSql]]: bpe_w (word types) → bpe_b0 (initial symbol
    * encodings) → per-iteration bpe_p$i (pair counts) / bpe_t$i (top pair)
    * / bpe_b$i (merge applied). */
  def bpeMergeCtes(tableE: String, textE: String, k: Int): String = {
    val S = BpeSep
    // MATERIALIZED throughout: each bpe_b$i is referenced more than once
    // (pair counting reads it twice, the next apply once) — an inlining
    // planner re-expands the whole chain per reference, which is
    // exponential in k (at k=64 the un-materialized form exhausted file
    // handles re-opening the corpus ~2^64 times; k=5 merely tolerated it).
    def pairCtes(i: Int): String =
      s"""bpe_p$i AS MATERIALIZED (SELECT syms[j] AS l, syms[j+1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, string_split(trim(s, '$S'), '$S$S') AS syms,
         |      unnest(generate_series(1, len(string_split(trim(s, '$S'), '$S$S')) - 1)) AS j
         |    FROM bpe_b${i - 1}) t GROUP BY 1, 2),
         |bpe_t$i AS MATERIALIZED (SELECT l, r, cnt FROM bpe_p$i ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin
    def applyCte(i: Int): String =
      s"""bpe_b$i AS MATERIALIZED (SELECT w, freq,
         |  replace(s, (SELECT '$S'||l||'$S$S'||r||'$S' FROM bpe_t$i),
         |             (SELECT '$S'||l||r||'$S' FROM bpe_t$i)) AS s FROM bpe_b${i - 1})""".stripMargin
    val iters = (1 to k).map { i =>
      if (i < k) s"${pairCtes(i)},\n${applyCte(i)}" else pairCtes(i)
    }.mkString(",\n")
    s"""bpe_w AS MATERIALIZED (SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(lower($textE), '[a-z]+')) AS w FROM $tableE) GROUP BY w),
       |bpe_b0 AS MATERIALIZED (SELECT w, freq,
       |    '$S' || rtrim(regexp_replace(w, '(.)', '\\1$S$S', 'g'), '$S') || '$S' AS s
       |  FROM bpe_w),
       |$iters""".stripMargin
  }

  /** Oracle face of [[bpeTopMerges]] — the same iteration chain as nested
    * CTEs (b0 → p1/t1 → b1 → p2/t2 → …), one pair of CTEs per merge. */
  def bpeTopMergesSql(tableE: String, textE: String, k: Int): String = {
    val out = (1 to k).map(i =>
      s"SELECT $i AS rank, l AS lhs, r AS rhs, cnt AS weight FROM bpe_t$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeMergeCtes(tableE, textE, k)}
       |$out""".stripMargin
  }
}
