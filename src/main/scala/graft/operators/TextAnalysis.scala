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
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"))

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
    * count with ties broken in [[Stopwords]] order, no hits → "und". */
  def langId(text: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit(CjkClass), lit(0)))
    val ws = words(text)
    val scores = Stopwords.map { case (lang, stops) => lang -> stopwordHits(ws, stops) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // Built inside-out so earlier Stopwords entries win ties (en first).
    val pickOrdered = scores.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, s)) => when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(cjk > 0, lit("zh")).otherwise(pickOrdered)
  }

  // ---- quality scoring ---------------------------------------------------
  /** Quality features: exact int counts turned into double ratios with a
    * fixed formula shape, bit-reproducible in the oracle. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t).cast("double")
    val upper = length(regexp_replace(t, "[^A-Z]", "")).cast("double")
    val digit = length(regexp_replace(t, "[^0-9]", "")).cast("double")
    val punct = length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("double")
    val wsCol = words(t)
    val nWords = size(wsCol).cast("double")
    val stops = stopwordHits(wsCol, Stopwords.head._2).cast("double")
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
}
