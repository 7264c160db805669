package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row/null/distinct counts and
  * lexicographic min/max — the statistics pass a pipeline runs over a new
  * drop before deciding how to partition/join it (and the input to CBO-style
  * decisions like broadcast-side election).
  */
object TableStats {

  /** One-pass column profile: for each requested column emit
    * (column_name, n_rows, n_nulls, n_distinct, min_str, max_str).
    *
    * min/max are taken over `CAST(col AS STRING)` — lexicographic, so the
    * values are engine-portable for integer/string columns (cast a double
    * through a fixed-point DECIMAL first; raw double→string formatting is
    * not cross-engine stable).
    *
    * Scale: ONE scan and one aggregation for every column together. The
    * multiple exact COUNT(DISTINCT)s expand the input |cols|× through
    * Spark's Expand operator before the shuffle — the exact-answer cost; at
    * 100 TB swap `countDistinct` for `approx_count_distinct` (HLL partial
    * aggs, no Expand) and keep the same output shape. Each distinct group
    * still partial-aggregates map-side, so the shuffle carries distinct
    * values per column, not rows. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    wide.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))): _*))
        .as("__s"))
      .select(col("__s.column_name").as("column_name"), col("__s.n_rows").as("n_rows"),
        col("__s.n_nulls").as("n_nulls"), col("__s.n_distinct").as("n_distinct"),
        col("__s.min_str").as("min_str"), col("__s.max_str").as("max_str"))
  }

  /** Oracle face of [[profile]]: one UNION ALL arm per column. */
  def profileSql(tableE: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_str, MAX(CAST($c AS VARCHAR)) AS max_str
         |FROM $tableE""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Deequ-style data-quality constraint audit: every check is a
    * (name, violation-predicate) pair evaluated row-wise, plus optional
    * key-uniqueness checks (`dup_<col>` = rows beyond the first per
    * non-null value). Emits one report row per check:
    * (check_name, n_total, n_viol, pass) — pass = 1 iff n_viol = 0.
    *
    * Referential checks ride the same face: left-join the dimension on and
    * pass `dim_key IS NULL` as the predicate (the join keeps fact
    * cardinality when the dimension key is unique — caller's contract).
    *
    * Scale: ONE scan computes every predicate count in a single wide
    * partial-aggregated row (the [[profile]] pattern); the uniqueness
    * checks add COUNT(DISTINCT) Expand arms — swap for
    * `approx_count_distinct` at 100 TB if an exact dup count isn't needed.
    * The per-check explode happens on one driver-sized row. */
  def constraintAudit(df: DataFrame, checks: Seq[(String, Column)],
                      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueCols.nonEmpty, "audit needs at least one check")
    val names = checks.map(_._1) ++ uniqueCols.map(c => s"dup_$c")
    require(names.distinct.size == names.size, s"duplicate check names in $names")
    val aggs = checks.map { case (n, pred) =>
      count(when(pred, lit(1))).as(s"__v_$n")
    } ++ uniqueCols.map { c =>
      (count(col(c)) - countDistinct(col(c))).as(s"__v_dup_$c")
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(names.map(n =>
          struct(lit(n).as("check_name"), col("__n").as("n_total"),
            col(s"__v_$n").as("n_viol"))): _*)).as("__s"))
      .select(col("__s.check_name").as("check_name"), col("__s.n_total").as("n_total"),
        col("__s.n_viol").as("n_viol"),
        when(col("__s.n_viol") === 0, lit(1)).otherwise(lit(0)).as("pass"))
  }

  /** Oracle face of [[constraintAudit]]: one UNION ALL arm per check over
    * the same FROM expression (same counts, different plan shape). Check
    * names/predicates are dev-authored constants (the repo-wide SQL-builder
    * contract); names are still quote-escaped as defense in depth so a
    * name with an apostrophe yields valid (non-injected) SQL. */
  def constraintAuditSql(fromE: String, checks: Seq[(String, String)],
                         uniqueCols: Seq[String] = Nil): String = {
    def q(n: String) = n.replace("'", "''")
    val arms = checks.map { case (n, predE) =>
      s"""SELECT '${q(n)}' AS check_name, COUNT(*) AS n_total,
         |  COUNT(CASE WHEN $predE THEN 1 END) AS n_viol FROM $fromE""".stripMargin
    } ++ uniqueCols.map { c =>
      s"""SELECT 'dup_${q(c)}' AS check_name, COUNT(*) AS n_total,
         |  COUNT($c) - COUNT(DISTINCT $c) AS n_viol FROM $fromE""".stripMargin
    }
    s"""SELECT check_name, n_total, n_viol,
       |  CAST(CASE WHEN n_viol = 0 THEN 1 ELSE 0 END AS INT) AS pass
       |FROM (${arms.mkString("\nUNION ALL\n")})""".stripMargin
  }

  // ---- exact-sum Pearson correlation ---------------------------------------
  /** Pairwise Pearson correlation over fixed-point-quantized columns — the
    * `df.stat.corr` surface made engine-exact and multi-pair-in-one-pass.
    *
    * Each column quantizes per row to round(x·factor) int64 (the q96 SQ8
    * rounding contract — exact for data with ≤ log10(factor) decimals); all
    * moment sums (Σx, Σxy, Σx²) accumulate in DECIMAL(38,0)/HUGEINT, so they
    * are order-independent exact integers. The correlation
    * (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) then runs as a fixed
    * chain over exact-via-VARCHAR doubles (the dsum rule): one sqrt each
    * (correctly rounded IEEE) and one division — bit-identical cross-engine.
    * A constant column zeroes its variance → NULL (both engines, NULLIF).
    *
    * Scale: ONE scan computes every pair's moments as one partial-agg'd
    * row — 3+2k+… sums wide, map-side combined; the quantization factor
    * cancels in the correlation, so it only needs to make the data integral.
    * Output: one row per pair (col_a, col_b, n, corr). */
  def pearsonMicro(df: DataFrame, pairs: Seq[(String, String)],
                   factor: Double): DataFrame = {
    val dec38 = "decimal(38,0)"
    val cols = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    def qz(c: String) = round(col(c).cast("double") * lit(factor)).cast("long")
    val sums =
      Seq(count(lit(1)).as("n")) ++
      cols.flatMap(c => Seq(
        sum(qz(c).cast(dec38)).as(s"s_$c"),
        sum((qz(c) * qz(c)).cast(dec38)).as(s"ss_$c"))) ++
      pairs.map { case (a, b) =>
        sum((qz(a) * qz(b)).cast(dec38)).as(s"sp_${a}_$b") }
    val agg = df.agg(sums.head, sums.tail: _*)
    def vd(c: Column) = c.cast("string").cast("double")
    // One output struct per pair, exploded from the SINGLE one-row aggregate:
    // the former per-pair `agg.select(...)` union re-derived the full-scan
    // aggregate once per pair (q156: 3 lineitem scans for 3 pairs). All
    // moments come from one scan; the explode is driver-trivial. Expressions
    // are unchanged per arm, so every value is bit-identical.
    val arms = pairs.map { case (a, b) =>
      val n = col("n").cast(dec38)
      val num = vd(n * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
      val va = vd(n * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
      val vb = vd(n * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
      val den = sqrt(va) * sqrt(vb)
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        when(den =!= 0.0, num / den).as("corr"))
    }
    agg.select(explode(array(arms: _*)).as("__r"))
      .select(col("__r.col_a").as("col_a"), col("__r.col_b").as("col_b"),
        col("__r.n").as("n"), col("__r.corr").as("corr"))
  }

  /** Oracle face of [[pearsonMicro]] — same quantization, HUGEINT moments,
    * same exact-cast + sqrt/divide chain. */
  def pearsonMicroSql(tableE: String, pairs: Seq[(String, String)],
                      factor: Double): String = {
    val cols = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    def qz(c: String) = s"CAST(round(CAST($c AS DOUBLE) * $factor) AS BIGINT)"
    val sums =
      Seq("COUNT(*) AS n") ++
      cols.flatMap(c => Seq(
        s"SUM(CAST(${qz(c)} AS HUGEINT)) AS s_$c",
        s"SUM(CAST(${qz(c)} * ${qz(c)} AS HUGEINT)) AS ss_$c")) ++
      pairs.map { case (a, b) =>
        s"SUM(CAST(${qz(a)} * ${qz(b)} AS HUGEINT)) AS sp_${a}_$b" }
    def vd(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    val arms = pairs.map { case (a, b) =>
      val num = vd(s"CAST(n AS HUGEINT) * sp_${a}_$b - s_$a * s_$b")
      val va = vd(s"CAST(n AS HUGEINT) * ss_$a - s_$a * s_$a")
      val vb = vd(s"CAST(n AS HUGEINT) * ss_$b - s_$b * s_$b")
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |  $num / NULLIF(sqrt($va) * sqrt($vb), 0.0) AS corr FROM pm_s""".stripMargin
    }
    s"""WITH pm_s AS (SELECT ${sums.mkString(",\n  ")} FROM $tableE)
       |${arms.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** χ²-of-independence contingency audit between two categorical
    * columns — [[psiMicro]]'s categorical sibling (are event types
    * independent of priority? did a new drop skew the joint
    * distribution?). Per cell: observed n_ij, expected e_ij = r_i·c_j/N
    * (one exact-int product divided once), contribution
    * (n_ij−e_ij)²/e_ij floored to micro-units so the cross-engine hash
    * is exact; sum `chi2_micro` for the statistic, df = (R−1)(C−1).
    *
    * Scale: ONE scan reduces to the |A×B| cell counts map-side; margins
    * and N derive from the (tiny) cell table; everything after the first
    * aggregation is broadcast-sized. */
  def chiSquareMicro(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("n"))
    val ra = cells.groupBy("a").agg(sum(col("n")).cast("long").as("ra"))
    val cb = cells.groupBy("b").agg(sum(col("n")).cast("long").as("cb"))
    val tot = broadcast(cells.agg(sum(col("n")).cast("long").as("nn")))
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("nn").cast("double")
    val d = col("n").cast("double") - e
    cells.join(broadcast(ra), "a").join(broadcast(cb), "b").crossJoin(tot)
      .select(col("a"), col("b"), col("n"),
        floor(d * d / e * lit(1e6)).cast("long").as("chi2_micro"))
  }

  /** Oracle face of [[chiSquareMicro]] — identical fold order and floor. */
  def chiSquareMicroSql(tableE: String, aE: String, bE: String): String = {
    val e = "CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(nn AS DOUBLE)"
    val d = s"CAST(n AS DOUBLE) - ($e)"
    s"""WITH x2_c AS (SELECT $aE AS a, $bE AS b, COUNT(*) AS n
       |  FROM $tableE GROUP BY 1, 2),
       |x2_r AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra FROM x2_c GROUP BY a),
       |x2_b AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cb FROM x2_c GROUP BY b),
       |x2_t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM x2_c)
       |SELECT a, b, n,
       |  CAST(FLOOR(($d) * ($d) / ($e) * 1e6) AS BIGINT) AS chi2_micro
       |FROM x2_c JOIN x2_r USING (a) JOIN x2_b USING (b), x2_t""".stripMargin
  }

  /** Referential-integrity audit for ONE foreign-key relationship — the
    * cross-table complement of [[constraintAudit]]'s per-row checks:
    * child row count, orphan count (child keys with no parent — the
    * integrity violation), parent count, and unreferenced-parent count
    * (dead dimension rows — a hygiene signal, not a violation). NULL
    * child keys count as orphans in both engines (a null never matches).
    *
    * Scale: ONE pass per table — each side collapses map-side to per-key
    * counts (guide §2.3 "aggregate before you shuffle": the exchange
    * carries (key, count) pairs, not rows), one full-outer join of the two
    * count tables classifies every key as matched / orphan / unreferenced,
    * and one global agg folds the four counts. The previous two-anti-join
    * form scanned child and parent 3× each (q173's 5-relation union:
    * 1,052-line plan, 60 parquet scans); this derives the same four counts
    * from one scan per side. Null keys form their own group on each side
    * and never equi-match — null child keys count as orphans, identically.
    * Output is ONE row per relationship forever. */
  def fkAudit(rel: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    val ca = child.groupBy(child(childKey).as("__k"))
      .agg(count(lit(1)).as("__ca"))
    val cb = parent.groupBy(parent(parentKey).as("__k"))
      .agg(count(lit(1)).as("__cb"))
    ca.join(cb, Seq("__k"), "full_outer")
      .agg(
        coalesce(sum(col("__ca")), lit(0L)).cast("long").as("n_child"),
        coalesce(sum(when(col("__cb").isNull, col("__ca"))), lit(0L))
          .cast("long").as("n_orphans"),
        coalesce(sum(col("__cb")), lit(0L)).cast("long").as("n_parent"),
        coalesce(sum(when(col("__ca").isNull, col("__cb"))), lit(0L))
          .cast("long").as("n_unreferenced"))
      .select(lit(rel).as("rel"), col("n_child"), col("n_orphans"),
        col("n_parent"), col("n_unreferenced"))
  }

  /** Oracle face of [[fkAudit]] (scalar subqueries; same null semantics). */
  def fkAuditSql(rel: String, childT: String, childKey: String,
                 parentT: String, parentKey: String): String =
    s"""SELECT '$rel' AS rel,
       |  (SELECT COUNT(*) FROM $childT) AS n_child,
       |  (SELECT COUNT(*) FROM $childT ch WHERE NOT EXISTS
       |     (SELECT 1 FROM $parentT pa WHERE pa.$parentKey = ch.$childKey)) AS n_orphans,
       |  (SELECT COUNT(*) FROM $parentT) AS n_parent,
       |  (SELECT COUNT(*) FROM $parentT pa WHERE NOT EXISTS
       |     (SELECT 1 FROM $childT ch WHERE ch.$childKey = pa.$parentKey)) AS n_unreferenced""".stripMargin

  /** Population Stability Index between two populations of a numeric
    * column — THE model-ops drift gate (PSI < 0.1 stable / > 0.25 drifted)
    * — over FIXED-width bins capped at `maxBin` (data-independent binning:
    * quantile bins would make the bin edges themselves engine-divergent).
    * Per-bin contribution (pa−pb)·ln(pa/pb) floors to exact nano-nats so
    * the cross-engine hash compare is exact (the q120 KL discipline);
    * callers sum `psi_nano` for the scalar. Bins present in only one
    * population are omitted (epsilon-free; the inner join IS the declared
    * domain) — report them separately if coverage matters.
    *
    * Scale: two scans (one per population) reduce to ≤maxBin+1 counts each
    * map-side; everything after the two tiny aggregates is
    * broadcast-sized. */
  def psiMicro(a: DataFrame, b: DataFrame, valueCol: String,
               binWidth: Double, maxBin: Int): DataFrame = {
    def binned(df: DataFrame, n: String) =
      df.select(least(floor(col(valueCol).cast("double") / binWidth)
          .cast("int"), lit(maxBin)).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(n))
    val ca = binned(a, "na")
    val cb = binned(b, "nb")
    val tot = broadcast(ca.agg(sum(col("na")).cast("long").as("ta"))
      .crossJoin(cb.agg(sum(col("nb")).cast("long").as("tb"))))
    val pa = col("na").cast("double") / col("ta").cast("double")
    val pb = col("nb").cast("double") / col("tb").cast("double")
    ca.join(cb, "bin").crossJoin(tot)
      .select(col("bin"), col("na"), col("nb"),
        floor(((pa - pb) * log(pa / pb)) * lit(1e9)).cast("long").as("psi_nano"))
  }

  /** Oracle face of [[psiMicro]] — identical binning, fold order, floor. */
  def psiMicroSql(aE: String, bE: String, valueE: String,
                  binWidth: Double, maxBin: Int): String = {
    def binE = s"CAST(LEAST(CAST(FLOOR(CAST($valueE AS DOUBLE) / $binWidth) AS INT), $maxBin) AS INT)"
    val pa = "CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)"
    val pb = "CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)"
    s"""WITH psi_a AS (SELECT $binE AS bin, COUNT(*) AS na FROM $aE GROUP BY 1),
       |psi_b AS (SELECT $binE AS bin, COUNT(*) AS nb FROM $bE GROUP BY 1),
       |psi_t AS (SELECT (SELECT CAST(SUM(na) AS BIGINT) FROM psi_a) AS ta,
       |                 (SELECT CAST(SUM(nb) AS BIGINT) FROM psi_b) AS tb)
       |SELECT bin, na, nb,
       |  CAST(FLOOR((($pa - $pb) * ln(($pa) / ($pb))) * 1e9) AS BIGINT) AS psi_nano
       |FROM psi_a JOIN psi_b USING (bin), psi_t""".stripMargin
  }
}
