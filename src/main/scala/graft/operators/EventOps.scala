package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators: CDC changelog compaction (upsert/delete replay) and
  * ordered conversion funnels.
  *
  * The reference engine has no event-log surface; these fill the §2.9-adjacent
  * gap a training-data platform hits the moment its corpus is fed by a
  * changelog (crawl revisits, takedown tombstones) rather than immutable
  * snapshots.
  */
object EventOps {

  /** Last-writer-wins snapshot of a CDC changelog: for each `keyCol` keep the
    * newest row by (`tsCol`, `tieCol`) descending, then drop keys whose final
    * operation is the `tombstone` (a delete wins over every older upsert).
    * Output schema = input schema.
    *
    * Scale: one shuffle on the key. The rank-1 filter compiles to
    * `WindowGroupLimit` (CurationSpec-asserted), so each map task forwards at
    * most one row per key it sees — the shuffle carries a per-task-deduped
    * changelog, not the full history; the tombstone filter runs after the
    * winner is chosen (it must: an older upsert must NOT resurrect a deleted
    * key). This is the compaction a MERGE INTO sink performs, expressed as a
    * pure query. */
  def latestSnapshot(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                     opCol: String, tombstone: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(col(opCol) =!= tombstone)
      .drop("__rn")
  }

  /** Oracle face of [[latestSnapshot]]. `tsCastE` must pre-cast to the same
    * µs granularity Spark reads (`CAST(ts AS TIMESTAMP)` for ns parquet). */
  def latestSnapshotSql(tableE: String, keyE: String, tsE: String, tieE: String,
                        opE: String, tombstone: String): String =
    s"""SELECT * EXCLUDE (__rn) FROM (
       |  SELECT *, row_number() OVER (PARTITION BY $keyE ORDER BY $tsE DESC, $tieE DESC) AS __rn
       |  FROM $tableE)
       |WHERE __rn = 1 AND $opE <> '$tombstone'""".stripMargin

  /** Ordered conversion funnel: stage 1 users have any `stages(0)` event;
    * stage i users additionally have a `stages(i)` event STRICTLY AFTER their
    * earliest qualifying stage-(i-1) time (the classic ordered-funnel
    * semantics — out-of-order events don't count). Output: one row per stage,
    * (stage, event_type, n_users), stage 1-based.
    *
    * Scale: stage 1 is a key-keyed partial agg; each later stage is one
    * equi-join on the user key (the `ts > t_prev` residual rides the hash
    * join) followed by a key-keyed min agg — the reached-set only shrinks, so
    * every join's left side is monotonically smaller. No window over the full
    * log, no per-user event collection. */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__et"))
    var wide = e.filter(col("__et") === stages.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("t0"))
    for (i <- 1 until stages.length) {
      val si = e.filter(col("__et") === stages(i))
        .select(col("__u").as("__u2"), col("__ts"))
      val carried = (0 until i).map(j => col(s"t$j"))
      wide = wide.join(si,
          wide("__u") === si("__u2") && si("__ts") > wide(s"t${i - 1}"), "left")
        .groupBy((col("__u") +: carried): _*)
        .agg(min(col("__ts")).as(s"t$i"))
    }
    val k = stages.length
    val counts = wide.agg(
      count(col("t0")).as("c0"),
      (1 until k).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    counts.select(explode(array((0 until k).map(i =>
        struct(lit(i + 1).as("stage"), lit(stages(i)).as("event_type"),
          col(s"c$i").as("n_users"))): _*)).as("__s"))
      .select(col("__s.stage").as("stage"), col("__s.event_type").as("event_type"),
        col("__s.n_users").as("n_users"))
  }

  /** Oracle face of [[funnel]] — the same stage chain as left-join CTEs.
    * `tsE` should be the µs-cast timestamp expression (see
    * [[latestSnapshotSql]]); stage names are dev-authored constants
    * (single-quote-safe). */
  def funnelSql(tableE: String, userE: String, tsE: String, typeE: String,
                stages: Seq[String]): String = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val f0 = s"f0 AS (SELECT e.$userE AS u, MIN($tsE) AS t0 FROM $tableE e " +
      s"WHERE e.$typeE = '${stages.head}' GROUP BY 1)"
    val rest = (1 until stages.length).map { i =>
      val carried = (0 until i).map(j => s"p.t$j").mkString(", ")
      s"""f$i AS (SELECT p.u, $carried, MIN($tsE) AS t$i
         |  FROM f${i - 1} p LEFT JOIN $tableE e
         |    ON e.$userE = p.u AND e.$typeE = '${stages(i)}' AND $tsE > p.t${i - 1}
         |  GROUP BY ${(1 to i + 1).mkString(", ")})""".stripMargin
    }
    val last = s"f${stages.length - 1}"
    val arms = stages.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i + 1} AS stage, '$st' AS event_type, COUNT(t$i) AS n_users FROM $last"
    }
    s"""WITH ${(f0 +: rest).mkString(",\n")}
       |SELECT * FROM (${arms.mkString("\nUNION ALL ")})""".stripMargin
  }

  // ---- cohort retention ----------------------------------------------------
  /** Weekly cohort retention: each user's cohort is the epoch-week (⌊epoch
    * seconds / 604800⌋ — a pure integer bucket, no calendar/timezone
    * semantics to diverge cross-engine) of their first event; the matrix
    * counts, per (cohort_week, week_offset), the distinct users from that
    * cohort active `week_offset` weeks later. Offset 0 rows equal cohort
    * sizes by construction.
    *
    * Scale: one key-keyed partial agg for first-seen, one co-keyed shuffle
    * join on the user key (both sides hash-partition by user — no broadcast
    * needed, the user dim at 100 TB is itself large), then a distinct +
    * count over (cohort, offset, user) — partial-agg friendly, and the
    * distinct's key space is bounded by users × active-weeks, never raw
    * events. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val week = floor(unix_timestamp(col(tsCol)).cast("double") / lit(604800.0))
      .cast("long")
    val ew = events.select(col(userCol).as("__u"), week.as("__w"))
    val cohort = ew.groupBy("__u").agg(min(col("__w")).as("cohort_week"))
    ew.join(cohort, "__u")
      .select(col("cohort_week"), (col("__w") - col("cohort_week")).as("week_offset"),
        col("__u"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Oracle face of [[retentionCohorts]]. `tsE` must pre-cast ns parquet
    * timestamps (`CAST(ts AS TIMESTAMP)`); epoch() keeps sub-second
    * fractions, which cannot move an integer-second value across a 604800
    * multiple, so both engines land in the same week bucket. */
  def retentionCohortsSql(tableE: String, userE: String, tsE: String): String =
    s"""WITH rc_e AS (SELECT $userE AS u,
       |    CAST(floor(epoch($tsE) / 604800) AS BIGINT) AS w FROM $tableE),
       |rc_c AS (SELECT u, MIN(w) AS cohort_week FROM rc_e GROUP BY u),
       |rc_d AS (SELECT DISTINCT cohort_week, w - cohort_week AS week_offset, u
       |         FROM rc_e JOIN rc_c USING (u))
       |SELECT cohort_week, week_offset, COUNT(*) AS n_users
       |FROM rc_d GROUP BY cohort_week, week_offset""".stripMargin

  // ---- rolling active users -----------------------------------------------
  /** DAU + trailing-7-day WAU per active epoch-day (⌊s/86400⌋ integer
    * buckets). WAU is computed by fanning each distinct (day, user) out to
    * the 7 report days it supports and re-distinct-ing — sliding-window
    * DISTINCT as two bounded aggs, no per-day range self-join. Rows are
    * emitted for ACTIVE days (DAU > 0); a silent day inside another day's
    * trailing window is not reported.
    *
    * Scale: the event log collapses to distinct user-days first (the only
    * corpus-sized agg); the 7× fan-out runs on user-days, not events, and
    * both distincts are partial-agg friendly. */
  def rollingActives(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)).cast("double") / lit(86400.0))
      .cast("long")
    val du = events.select(day.as("day"), col(userCol).as("__u")).distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("__u"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day").select(col("day"), col("dau"), col("wau"))
  }

  /** Oracle face of [[rollingActives]] (same fan-out shape). */
  def rollingActivesSql(tableE: String, userE: String, tsE: String): String =
    s"""WITH ra_e AS (SELECT DISTINCT
       |    CAST(floor(epoch($tsE) / 86400) AS BIGINT) AS day, $userE AS u
       |  FROM $tableE),
       |ra_d AS (SELECT day, COUNT(*) AS dau FROM ra_e GROUP BY day),
       |ra_w AS (SELECT day, COUNT(*) AS wau FROM (
       |    SELECT DISTINCT e.day + t.o AS day, e.u
       |    FROM ra_e e CROSS JOIN range(0, 7) t(o)) GROUP BY day)
       |SELECT day, dau, wau FROM ra_d JOIN ra_w USING (day)""".stripMargin

  // ---- time-series resample + gap fill ------------------------------------
  /** Per-key daily resample with gap fill — the time-series densification
    * every monitoring/feature pipeline needs: one row per (key, calendar
    * day) from that key's first to last active day, `n` = events that day
    * (0 on gap days), `last_type` = the key's latest event type as of that
    * day (forward-filled across gaps; within a day the max-event-id event
    * wins — a total order, so the fill is deterministic).
    *
    * Scale: one shuffle keys the daily rollup; the calendar is a per-key
    * `sequence` + explode (a generator off a 2-timestamp row — never a
    * cross join against a calendar table); the forward fill is a running
    * `last(ignoreNulls)` window per key. Everything is per-key — span ×
    * keys rows out, no global structure. A key dormant for years explodes
    * its own span only; cap spans upstream if keys can be immortal. */
  def resampleDailyFill(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, idCol: String): DataFrame = {
    val daily = events
      .groupBy(col(userCol), date_trunc("DAY", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"), max_by(col(typeCol), col(idCol)).as("lt"))
    val cal = daily.groupBy(col(userCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(userCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq(userCol, "day"), "left")
      .select(col(userCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("lt"), ignoreNulls = true).over(w).as("last_type"))
  }

  // ---- first-order transition matrix --------------------------------------
  /** Per-key event-type transition matrix — the behavioral bigram LM:
    * consecutive (prev → cur) event pairs along each key's (ts, id)-ordered
    * timeline, counted globally, with the conditional probability
    * P(cur | prev) = n / Σ_cur n. The id tiebreak makes the sequence a
    * total order, so counts are deterministic; the probability is ONE IEEE
    * division of exact int64s (bit-identical cross-engine).
    *
    * Scale: one shuffle keys the per-key sort (lag window), the pair count
    * aggregates map-side, and the marginal join is |event types|² rows —
    * broadcast-sized forever. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("cur"),
        lag(col(typeCol), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n"))
    // Marginal as a window over the pair counts, not a groupBy + self-join:
    // the join form referenced `pairs` twice, re-deriving the lag-window
    // pass over the events table for the marginal side (q155's plan ran the
    // corpus window 2×). The window runs over the |types|² count table —
    // broadcast-sized at any corpus size — and SUM(n) OVER (PARTITION BY
    // prev) is exactly the former `tot`.
    val mw = Window.partitionBy(col("prev"))
    pairs.select(col("prev"), col("cur"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(mw).cast("double")).as("p"))
  }

  /** Oracle face of [[transitionMatrix]]. */
  def transitionMatrixSql(tableE: String, userE: String, tsE: String,
                          typeE: String, idE: String): String =
    s"""WITH tm_t AS (SELECT $typeE AS cur,
       |    lag($typeE) OVER (PARTITION BY $userE
       |      ORDER BY CAST($tsE AS TIMESTAMP), $idE) AS prev
       |  FROM $tableE),
       |tm_c AS (SELECT prev, cur, COUNT(*) AS n FROM tm_t
       |  WHERE prev IS NOT NULL GROUP BY prev, cur),
       |tm_m AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tot FROM tm_c GROUP BY prev)
       |SELECT prev, cur, CAST(n AS BIGINT) AS n,
       |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
       |FROM tm_c JOIN tm_m USING (prev)""".stripMargin

  /** Oracle face of [[resampleDailyFill]] (same rollup, same per-key
    * calendar, same deterministic arg-max and forward fill). */
  /** Sweep-line interval union per key: merge overlapping/touching
    * [start,end] intervals into maximal blocks — the classic "total time
    * covered" op SQL lacks a primitive for (uptime/engagement coverage,
    * interval consolidation before an interval join). A row opens a new
    * block iff its start exceeds the running max end of every EARLIER
    * interval (ties broken by the total order (start, end, tie)); block id
    * = running count of opens; blocks then reduce to (start, max end).
    *
    * Scale: two windows + one aggregation, ALL keyed by `keyCol` — one
    * shuffle total, per-key sequential as the semantics inherently are,
    * keys in parallel. Starts/ends are int64 (epoch seconds) so the
    * sweep is exact. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, tieCol: String): DataFrame = {
    val order = Seq(col(startCol).asc, col(endCol).asc, col(tieCol).asc)
    val before = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pmax", max(col(endCol)).over(before))
      .withColumn("__open",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("block", sum(col("__open")).over(upTo))
      .groupBy(col(keyCol), col("block"))
      .agg(min(col(startCol)).as("block_start"), max(col(endCol)).as("block_end"))
  }

  /** Oracle face of [[mergeIntervals]] over `(key, s, e, tie)` rows. */
  def mergeIntervalsSql(tableE: String): String =
    s"""SELECT key, block, MIN(s) AS block_start, MAX(e) AS block_end FROM (
       |  SELECT key, s, e, SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY key ORDER BY s, e, tie
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block
       |  FROM (SELECT key, s, e, tie, MAX(e) OVER (PARTITION BY key ORDER BY s, e, tie
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |    FROM $tableE) t1) t2
       |GROUP BY key, block""".stripMargin

  def resampleDailyFillSql(tableE: String, userE: String, tsE: String,
                           typeE: String, idE: String): String =
    s"""WITH rf_d AS (SELECT $userE AS u,
       |    date_trunc('day', CAST($tsE AS TIMESTAMP)) AS day,
       |    COUNT(*) AS n, arg_max($typeE, $idE) AS lt
       |  FROM $tableE GROUP BY 1, 2),
       |rf_cal AS (SELECT u, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
       |  FROM (SELECT u, MIN(day) AS d0, MAX(day) AS d1 FROM rf_d GROUP BY u) t),
       |rf_j AS (SELECT rf_cal.u, rf_cal.day, COALESCE(rf_d.n, 0) AS n, rf_d.lt
       |  FROM rf_cal LEFT JOIN rf_d ON rf_cal.u = rf_d.u AND rf_cal.day = rf_d.day)
       |SELECT u, day, n,
       |  last_value(lt IGNORE NULLS) OVER (PARTITION BY u ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type
       |FROM rf_j""".stripMargin
}
