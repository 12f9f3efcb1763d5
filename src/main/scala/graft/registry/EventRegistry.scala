package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Bearly
import graft.operators.{Dedup, EventOps, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Relational, TpchShapes}

/** event log + experimentation suite — the `eventQueries`/`eventOracles` slice of the driver contract
  * (split from the single SparkEntry registry in round 9; SparkEntry
  * merges every domain trait back into the 313-key map the driver
  * reads — see [[graft.SparkEntry]]).
  */
private[graft] trait EventRegistry {
  protected def eventQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_gap_fill" -> ((s, d) => EventOps.gapFilledHourlyCounts(Tables.events(s, d))),
    "ev_transitions" -> ((s, d) => EventOps.transitionMatrix(Tables.events(s, d))),
    "ev_anomaly_zscore" -> ((s, d) => EventOps.hourlyAnomalies(Tables.events(s, d))),
    "ev_heavy_hitters" -> ((s, d) => EventOps.heavyHitterUsers(Tables.events(s, d))),
    "ev_hll_rollup" -> ((s, d) => EventOps.distinctUsersSketchRollup(Tables.events(s, d))),
    "ev_distinct_rollup" -> ((s, d) => EventOps.distinctUsersExactRollup(Tables.events(s, d))),
    "ev_scd2_intervals" -> ((s, d) => EventOps.scd2Intervals(Tables.events(s, d))),
    "ev_dau_wau" -> ((s, d) => EventOps.dauWauStickiness(Tables.events(s, d))),
    "ev_user_gaps" -> ((s, d) => EventOps.userGapStats(Tables.events(s, d))),
    // --- event ops ---
    "ev_props_stats" -> ((s, d) => EventOps.propsStats(Tables.events(s, d))),
    "ev_asof_last_view" -> ((s, d) => EventOps.lastViewBeforePurchase(Tables.events(s, d))),
    "ev_asof_native" -> ((s, d) => EventOps.lastViewBeforePurchaseNative(Tables.events(s, d))),
    "ev_asof_tolerance" -> ((s, d) => EventOps.lastViewWithinNative(Tables.events(s, d))),
    "ev_sessionize" -> ((s, d) => EventOps.sessionize(Tables.events(s, d))),
    "ev_hourly_counts" -> ((s, d) => EventOps.hourlyCounts(Tables.events(s, d))),
    "ev_by_segment" -> ((s, d) =>
      EventOps.eventsBySegment(Tables.events(s, d), Tables.customer(s, d))),
    "ev_hour_pivot" -> ((s, d) => EventOps.hourOfDayPivot(Tables.events(s, d))),
    "ev_funnel" -> ((s, d) => EventOps.viewToPurchaseFunnel(Tables.events(s, d))),
    "ev_attribution" -> ((s, d) => EventOps.lastTouchAttribution(Tables.events(s, d))),
    "ev_rfm" -> ((s, d) => EventOps.rfm(Tables.events(s, d))),
    "ev_decayed_score" -> ((s, d) => EventOps.decayedEngagement(Tables.events(s, d))),
    "ev_funnel_steps" -> ((s, d) => EventOps.funnelSteps(Tables.events(s, d))),
    "ev_cohort_matrix" -> ((s, d) => EventOps.cohortMatrix(Tables.events(s, d))),
    "ev_props_json" -> ((s, d) => EventOps.propsJson(Tables.events(s, d))),
    "ev_props_variant" -> ((s, d) => EventOps.propsVariant(Tables.events(s, d))),
    "ev_daily_rolling" -> ((s, d) => EventOps.dailyRolling(Tables.events(s, d))),
    "ev_retention" -> ((s, d) => EventOps.dailyRetention(Tables.events(s, d))),
    "ev_interval_join" -> ((s, d) => EventOps.nearbyEventPairs(Tables.events(s, d))),
    "ev_hour_of_week" -> ((s, d) => EventOps.hourOfWeekProfile(Tables.events(s, d))),
    "ev_power_users" -> ((s, d) => EventOps.powerUsers(Tables.events(s, d))),
    "ev_session_histogram" -> ((s, d) => EventOps.sessionHistogram(Tables.events(s, d))),
    "ev_time_to_convert" -> ((s, d) => EventOps.timeToConvert(Tables.events(s, d))),
    "ev_user_lifecycle" -> ((s, d) => EventOps.userLifecycle(Tables.events(s, d))),
    "ev_anomaly_mad" -> ((s, d) => EventOps.hourlyAnomaliesMad(Tables.events(s, d))),
    "ev_session_duration" -> ((s, d) =>
      EventOps.sessionDurationPercentiles(Tables.events(s, d))),
    "ev_new_vs_returning" -> ((s, d) => EventOps.newVsReturning(Tables.events(s, d))),
    "ev_burstiness" -> ((s, d) => EventOps.userBurstiness(Tables.events(s, d))),
    "ev_session_funnel" -> ((s, d) => EventOps.sessionFunnel(Tables.events(s, d))),
    "ev_asof_forward" -> ((s, d) => EventOps.nextViewAfterPurchase(Tables.events(s, d))),
    "ev_type_entropy" -> ((s, d) => EventOps.userTypeEntropy(Tables.events(s, d))),
    "ev_peak_concurrency" -> ((s, d) => EventOps.peakConcurrency(Tables.events(s, d))),
    "ev_error_rate" -> ((s, d) => EventOps.errorRateHourly(Tables.events(s, d))),
    "ev_funnel_by_segment" -> ((s, d) =>
      EventOps.funnelBySegment(Tables.events(s, d), Tables.customer(s, d))),
    "ev_ewma_daily" -> ((s, d) => EventOps.ewmaDaily(Tables.events(s, d))),
    "ev_session_paths" -> ((s, d) => EventOps.sessionPaths(Tables.events(s, d))),
    "ev_seasonal_anomaly" -> ((s, d) => EventOps.seasonalAnomalies(Tables.events(s, d))),
    "ev_metric_corr" -> ((s, d) => EventOps.metricCorrelation(Tables.events(s, d))),
    "ev_dwell_time" -> ((s, d) => EventOps.dwellTime(Tables.events(s, d))),
    "ev_user_overlap" -> ((s, d) => EventOps.userOverlapAcrossTypes(Tables.events(s, d))),
    "ev_wow_growth" -> ((s, d) => EventOps.wowGrowth(Tables.events(s, d))),
    "ev_path_conversion" -> ((s, d) => EventOps.pathConversion(Tables.events(s, d))),
    "ev_cohort_ltv" -> ((s, d) => EventOps.cohortLtv(Tables.events(s, d))),
    "ev_activity_streaks" -> ((s, d) => EventOps.activityStreaks(Tables.events(s, d))),
    "ev_purchase_cadence" -> ((s, d) => EventOps.purchaseCadence(Tables.events(s, d))),
    "ev_user_features" -> ((s, d) => EventOps.userFeatures(Tables.events(s, d))),
    "ev_forecast_backtest" -> ((s, d) => EventOps.forecastBacktest(Tables.events(s, d))),
    "ev_conversion_sweep" -> ((s, d) => EventOps.conversionWindowSweep(Tables.events(s, d))),
    "ev_retention_curve" -> ((s, d) => EventOps.retentionCurve(Tables.events(s, d))),
    "ev_mix_drift" -> ((s, d) => EventOps.weeklyMixDrift(Tables.events(s, d))),
    // --- round-7 second continuation ---
    "ev_markov_2step" -> ((s, d) => EventOps.markovTwoStep(Tables.events(s, d))),
    "ev_trigrams" -> ((s, d) => EventOps.topTrigrams(Tables.events(s, d))),
    "ev_rolling_p95" -> ((s, d) => EventOps.rollingDailyP95(Tables.events(s, d))),
    "ev_autocorr" -> ((s, d) => EventOps.dailyAutocorr(Tables.events(s, d))),
    "ev_value_percentiles" -> ((s, d) => EventOps.valuePercentiles(Tables.events(s, d))),
    "ev_session_gap_hist" -> ((s, d) => EventOps.sessionGapHistogram(Tables.events(s, d))),
    "ev_changepoint" -> ((s, d) => EventOps.changepointCusum(Tables.events(s, d))),
    "ev_retention_fit" -> ((s, d) => EventOps.retentionFit(Tables.events(s, d))),
    "ev_strict_funnel" -> ((s, d) => EventOps.strictFunnel(Tables.events(s, d))),
    "ev_behavior_sim" -> ((s, d) => EventOps.behaviorSimilarity(Tables.events(s, d))),
    "ev_ab_test" -> ((s, d) => EventOps.abTest(Tables.events(s, d))),
    "ev_ab_ks" -> ((s, d) => EventOps.abKsStatistic(Tables.events(s, d))),
    "ev_dq_checks" -> ((s, d) => EventOps.dqChecks(Tables.events(s, d))),
    "ev_burst_detect" -> ((s, d) => EventOps.burstDetect(Tables.events(s, d))),
    "ev_attribution_models" -> ((s, d) => EventOps.attributionModels(Tables.events(s, d))),
    "ev_psi_drift" -> ((s, d) => EventOps.psiDrift(Tables.events(s, d))),
    "ev_ab_hte" -> ((s, d) => EventOps.abHeterogeneous(Tables.events(s, d))),
    "ev_diff_in_diff" -> ((s, d) => EventOps.diffInDiff(Tables.events(s, d))),
    "ev_cuped" -> ((s, d) => EventOps.cuped(Tables.events(s, d))),
    "ev_ab_conversion" -> ((s, d) => EventOps.abConversion(Tables.events(s, d))),
    "ev_power_analysis" -> ((s, d) => EventOps.powerAnalysis(Tables.events(s, d))),
    "ev_kaplan_meier" -> ((s, d) => EventOps.kaplanMeier(Tables.events(s, d))),
  )

  protected def eventOracles: Map[String, String] = Map(
    "ev_user_gaps" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |g AS (SELECT user_id,
        |             ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |                                      ORDER BY ts_us, event_id) AS gap_us
        |      FROM t)
        |SELECT user_id, count(*) AS n_gaps, max(gap_us) AS max_gap_us,
        |       round(avg(CAST(gap_us AS DOUBLE)), 2) AS mean_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |wd AS (SELECT DISTINCT user_id, day + d AS day
        |       FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS d) ds),
        |wau AS (SELECT day, count(*) AS wau FROM wd GROUP BY 1)
        |SELECT day, dau, wau, round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "ev_anomaly_zscore" ->
      """WITH h AS (
        |  SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, hour_us, n,
        |         avg(n) OVER (PARTITION BY event_type) AS mean_n,
        |         stddev_samp(n) OVER (PARTITION BY event_type) AS sd_n
        |  FROM h)
        |SELECT event_type, hour_us, n, round(mean_n, 4) AS mean_n,
        |       round((n - mean_n) / sd_n, 4) AS zscore
        |FROM s
        |WHERE sd_n > 0 AND abs(round((n - mean_n) / sd_n, 4)) >= 2.0
        |ORDER BY event_type, hour_us""".stripMargin,
    // Misra-Gries with capacity >= |distinct users| is exact, so the
    // plain exact-count SQL pins the whole summary/merge path.
    "ev_heavy_hitters" ->
      """SELECT user_id, count(*) AS est_n FROM events
        |GROUP BY user_id HAVING count(*) >= 80
        |ORDER BY est_n DESC, user_id""".stripMargin,
    "ev_burstiness" ->
      """WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     gaps AS (
        |  SELECT user_id,
        |         CAST(ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS DOUBLE)
        |           AS gap_us
        |  FROM g),
        |     s AS (
        |  SELECT user_id, count(*) AS n_gaps, avg(gap_us) AS mean_gap,
        |         stddev_samp(gap_us) AS sd_gap
        |  FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, round(mean_gap, 2) AS mean_gap_us,
        |       round(sd_gap / mean_gap, 6) AS burstiness_cv
        |FROM s WHERE n_gaps >= 2 AND mean_gap > 0 ORDER BY user_id""".stripMargin,
    "ev_error_rate" ->
      """WITH h AS (
        |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS hour_us,
        |         count(*) AS n_events,
        |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
        |  FROM events GROUP BY 1)
        |SELECT hour_us, n_events, CAST(n_errors AS BIGINT) AS n_errors,
        |       round(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_rate
        |FROM h ORDER BY hour_us""".stripMargin,
    // the backward as-of chain + broadcast segment dim + per-segment rollup
    "ev_funnel_by_segment" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     lastv AS (
        |  SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |  FROM e p LEFT JOIN e v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY 1, 2, 3)
        |SELECT c_mktsegment, count(*) AS n_purchases,
        |       CAST(coalesce(sum(CASE WHEN last_view_us IS NOT NULL
        |                               AND ts_us - last_view_us <= 3600000000
        |                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN last_view_us IS NOT NULL
        |                            AND ts_us - last_view_us <= 3600000000
        |                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |         AS conversion
        |FROM lastv JOIN customer ON c_custkey = user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // truncated-horizon EWMA; weights are driver-computed literals
    // (exact dyadic rationals for decay=0.75) shared with the Spark
    // side via EventOps.ewmaWeights, so no pow() runs in either engine
    "ev_ewma_daily" -> {
      val weights = graft.operators.EventOps.ewmaWeights(14, 0.75)
        .map { case (o, w) => s"($o, CAST('$w' AS DOUBLE))" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, count(*) AS n
         |  FROM events GROUP BY 1),
         |o AS (SELECT * FROM (VALUES $weights) v(o, w)),
         |m AS (SELECT min(day) AS min_day FROM daily),
         |g AS (
         |  SELECT d.day, o.o, o.w, coalesce(l.n, 0) AS n0
         |  FROM daily d CROSS JOIN o CROSS JOIN m
         |  LEFT JOIN daily l ON l.day = d.day - o.o
         |  WHERE d.day - o.o >= m.min_day)
         |SELECT day, CAST(sum(CASE WHEN o = 0 THEN n0 END) AS BIGINT) AS n,
         |       round(sum(w * n0) / sum(w), 6) AS ewma
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // session chain (same CTEs as ev_sessionize) → first-3-steps path
    // string, (ts, type)-ordered so tied timestamps are deterministic
    "ev_session_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, event_type, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |p AS (
        |  SELECT user_id, session_id,
        |         array_to_string(list(event_type ORDER BY ts_us, event_type)[1:3], '>') AS path
        |  FROM sess GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // per-hour-of-week median/MAD baseline (same conventions as
    // ev_anomaly_mad, grouped by the 168-slot weekly index)
    "ev_seasonal_anomaly" ->
      """WITH h AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx, count(*) AS n
        |  FROM events GROUP BY 1),
        |hh AS (SELECT hour_idx, n, hour_idx % 168 AS how FROM h),
        |med AS (SELECT how, quantile_cont(n, 0.5) AS med_n FROM hh GROUP BY 1),
        |mad AS (SELECT hh.how, quantile_cont(abs(n - med_n), 0.5) AS mad_n
        |        FROM hh JOIN med USING (how) GROUP BY 1)
        |SELECT hour_idx * 3600000000 AS hour_us, hh.how, n,
        |       round(med_n, 4) AS med_n,
        |       round(abs(n - med_n) / (1.4826 * mad_n), 4) AS robust_score
        |FROM hh JOIN med USING (how) JOIN mad USING (how)
        |WHERE mad_n > 0 AND abs(n - med_n) > 3.0 * 1.4826 * mad_n
        |ORDER BY hour_us""".stripMargin,
    // dense days×types grid; zero-variance series filtered on the
    // exact stddev=0 predicate BEFORE corr's NaN/NULL conventions
    "ev_metric_corr" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM daily),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |grid AS (SELECT d.day, t.event_type, CAST(coalesce(x.n, 0) AS DOUBLE) AS n
        |         FROM days d CROSS JOIN types t
        |         LEFT JOIN daily x ON x.day = d.day AND x.event_type = t.event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             count(*) AS n_days,
        |             stddev_samp(a.n) AS sa, stddev_samp(b.n) AS sb,
        |             corr(a.n, b.n) AS r
        |      FROM grid a JOIN grid b ON a.day = b.day AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, n_days, round(r, 6) AS corr FROM p
        |WHERE sa > 0 AND sb > 0 ORDER BY 1, 2""".stripMargin,
    // session chain + lead on the same (ts, type)-deterministic order
    "ev_dwell_time" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, event_type, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |l AS (SELECT event_type, ts_us,
        |             lead(ts_us) OVER (PARTITION BY user_id, session_id
        |                               ORDER BY ts_us, event_type) AS next_us
        |      FROM sess)
        |SELECT event_type, count(*) AS n,
        |       round(avg(next_us - ts_us), 4) AS avg_dwell_us,
        |       quantile_cont(next_us - ts_us, 0.5) AS p50_dwell_us
        |FROM l WHERE next_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // distinct (type, user) sets → pairwise Jaccard; grid join
    // restores zero-intersection pairs
    "ev_user_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1),
        |inter AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_common
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT a.event_type AS type_a, a.n_users AS n_a,
        |         b.event_type AS type_b, b.n_users AS n_b
        |  FROM sz a CROSS JOIN sz b WHERE a.event_type < b.event_type)
        |SELECT g.type_a, g.type_b, g.n_a, g.n_b,
        |       coalesce(i.n_common, 0) AS n_common,
        |       round(CAST(coalesce(i.n_common, 0) AS DOUBLE) /
        |             (g.n_a + g.n_b - coalesce(i.n_common, 0)), 6) AS jaccard
        |FROM grid g LEFT JOIN inter i
        |  ON i.type_a = g.type_a AND i.type_b = g.type_b
        |ORDER BY g.type_a, g.type_b""".stripMargin,
    // epoch-aligned weekly counts + lag against the previous OBSERVED week
    "ev_wow_growth" ->
      """WITH wk AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT week, event_type, n,
        |             lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |      FROM wk)
        |SELECT week, event_type, n, prev_n,
        |       CASE WHEN prev_n IS NOT NULL
        |            THEN round(CAST(n - prev_n AS DOUBLE) / prev_n, 6) END AS growth
        |FROM l ORDER BY week, event_type""".stripMargin,
    // session chain + per-session purchase flag folded into the same
    // grouping as ev_session_paths
    "ev_path_conversion" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, event_type, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |p AS (
        |  SELECT user_id, session_id,
        |         array_to_string(list(event_type ORDER BY ts_us, event_type)[1:3], '>') AS path,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions,
        |       CAST(sum(has_purchase) AS BIGINT) AS n_converted,
        |       round(CAST(sum(has_purchase) AS DOUBLE) / count(*), 6) AS conversion
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // first-seen-week cohorts × week offsets; cumulative over the
    // ROUNDED weekly cells in deterministic offset order
    "ev_cohort_ltv" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_type, value FROM events),
        |w AS (SELECT user_id, ts_us - ts_us % 604800000000 AS week_us,
        |             event_type, value FROM e),
        |fs AS (SELECT user_id, min(week_us) AS cohort_us FROM w GROUP BY 1),
        |cells AS (
        |  SELECT cohort_us,
        |         CAST((week_us - cohort_us) // 604800000000 AS BIGINT) AS week_offset,
        |         count(*) AS n_purchases, round(sum(value), 4) AS week_value
        |  FROM w JOIN fs USING (user_id)
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT cohort_us, week_offset, n_purchases, week_value,
        |       round(sum(week_value) OVER (PARTITION BY cohort_us ORDER BY week_offset
        |             ROWS UNBOUNDED PRECEDING), 4) AS cum_value
        |FROM cells ORDER BY 1, 2""".stripMargin,
    // gaps-and-islands: island id = day − row_number, no self-join
    "ev_activity_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |g AS (SELECT user_id, day,
        |             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d),
        |runs AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks,
        |       CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,
    // consecutive-purchase gaps per user → one-row cadence report
    "ev_purchase_cadence" ->
      """WITH p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |l AS (SELECT user_id, ts_us,
        |             lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us
        |      FROM p),
        |gp AS (SELECT user_id, ts_us - prev_us AS gap_us FROM l WHERE prev_us IS NOT NULL)
        |SELECT count(*) AS n_gaps,
        |       count(DISTINCT user_id) AS n_repeat_buyers,
        |       quantile_cont(gap_us, 0.5) AS p50_gap_us,
        |       quantile_cont(gap_us, 0.9) AS p90_gap_us,
        |       min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
        |FROM gp""".stripMargin,
    // one wide feature row per user: the proven lifecycle / entropy /
    // burstiness / streak CTE chains left-joined from the lifecycle
    // universe (sub-threshold users keep NULL cv, never drop)
    "ev_user_features" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |life AS (
        |  SELECT user_id, count(*) AS n_events,
        |         count(DISTINCT ts_us // 86400000000) AS active_days,
        |         round(CAST(count(*) AS DOUBLE) /
        |               count(DISTINCT ts_us // 86400000000), 4) AS events_per_active_day
        |  FROM e GROUP BY 1),
        |tc AS (SELECT user_id, event_type, count(*) AS c FROM e GROUP BY 1, 2),
        |ent AS (SELECT user_id, count(*) AS n_types,
        |               round(ln(sum(c)) - sum(CAST(c AS DOUBLE) * ln(c)) / sum(c), 6)
        |                 AS type_entropy
        |        FROM tc GROUP BY 1),
        |gaps AS (
        |  SELECT user_id,
        |         CAST(ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS DOUBLE)
        |           AS gap_us
        |  FROM e),
        |bs AS (SELECT user_id, count(*) AS n_gaps, avg(gap_us) AS mean_gap,
        |              stddev_samp(gap_us) AS sd_gap
        |       FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1),
        |burst AS (SELECT user_id, round(sd_gap / mean_gap, 6) AS burstiness_cv
        |          FROM bs WHERE n_gaps >= 2 AND mean_gap > 0),
        |d AS (SELECT DISTINCT user_id, ts_us // 86400000000 AS day FROM e),
        |g AS (SELECT user_id,
        |             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d),
        |runs AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2),
        |st AS (SELECT user_id, max(len) AS max_streak FROM runs GROUP BY 1)
        |SELECT life.user_id, life.n_events, life.active_days, life.events_per_active_day,
        |       ent.n_types, ent.type_entropy, burst.burstiness_cv, st.max_streak
        |FROM life LEFT JOIN ent USING (user_id) LEFT JOIN burst USING (user_id)
        |LEFT JOIN st USING (user_id)
        |ORDER BY life.user_id""".stripMargin,
    // same-hour-last-week naive baseline, one-row MAE/MAPE report
    "ev_forecast_backtest" ->
      """WITH h AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx, count(*) AS n
        |  FROM events GROUP BY 1),
        |j AS (SELECT a.n, b.n AS n_pred FROM h a JOIN h b ON a.hour_idx = b.hour_idx + 168)
        |SELECT count(*) AS n_hours,
        |       round(avg(CAST(abs(n - n_pred) AS DOUBLE)), 4) AS mae,
        |       round(avg(CAST(abs(n - n_pred) AS DOUBLE) / n), 6) AS mape
        |FROM j""".stripMargin,
    // one as-of pass × broadcast window grid
    "ev_conversion_sweep" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |lastv AS (
        |  SELECT p.event_id, p.ts_us, max(v.ts_us) AS last_view_us
        |  FROM e p LEFT JOIN e v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |g AS (SELECT CAST(unnest([15, 30, 60, 120, 240]) AS INTEGER) AS window_minutes)
        |SELECT window_minutes, count(*) AS n_purchases,
        |       CAST(sum(CASE WHEN last_view_us IS NOT NULL
        |                      AND ts_us - last_view_us <=
        |                          window_minutes * CAST(60000000 AS BIGINT)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN last_view_us IS NOT NULL
        |                            AND ts_us - last_view_us <=
        |                                window_minutes * CAST(60000000 AS BIGINT)
        |                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |         AS conversion
        |FROM lastv CROSS JOIN g GROUP BY 1 ORDER BY 1""".stripMargin,
    // cohort matrix normalized by its own day-0 column
    "ev_retention_curve" ->
      """WITH e AS (SELECT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |m AS (SELECT cohort_day, day - cohort_day AS day_offset,
        |             count(DISTINCT user_id) AS n_active
        |      FROM e JOIN c USING (user_id) GROUP BY 1, 2),
        |b AS (SELECT cohort_day, n_active AS cohort_size FROM m WHERE day_offset = 0)
        |SELECT m.cohort_day, m.day_offset, m.n_active, b.cohort_size,
        |       round(CAST(m.n_active AS DOUBLE) / b.cohort_size, 6) AS retention
        |FROM m JOIN b USING (cohort_day)
        |ORDER BY 1, 2""".stripMargin,
    // weekly type-mix JSD vs the overall mix (natural-log JSD, the
    // text_jsd_drift conventions on the weeks × types grid)
    "ev_mix_drift" ->
      """WITH wt AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
        |         event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |wk AS (SELECT week, sum(c) AS n_week FROM wt GROUP BY 1),
        |ty AS (SELECT event_type, sum(c) AS ct FROM wt GROUP BY 1),
        |tot AS (SELECT sum(ct) AS n_total FROM ty),
        |grid AS (
        |  SELECT wk.week, wk.n_week,
        |         CAST(coalesce(wt.c, 0) AS DOUBLE) AS c,
        |         CAST(ty.ct AS DOUBLE) AS ct, tot.n_total
        |  FROM ty CROSS JOIN tot CROSS JOIN wk
        |  LEFT JOIN wt ON wt.week = wk.week AND wt.event_type = ty.event_type),
        |pq AS (SELECT week, c / n_week AS p, ct / n_total AS q FROM grid)
        |SELECT week,
        |       round(sum(CASE WHEN p > 0
        |                      THEN 0.5 * p * ln(2.0 * p / (p + q)) ELSE 0.0 END +
        |                 0.5 * q * ln(2.0 * q / (p + q))), 6) AS jsd
        |FROM pq GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us,
        |       min(v.ts_us) AS next_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us >= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // single-aggregate entropy identity: H = ln N − (Σ c·ln c)/N
    "ev_distinct_rollup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1
        |UNION ALL
        |SELECT '_all_' AS event_type, count(DISTINCT user_id) AS n_users FROM events
        |ORDER BY event_type""".stripMargin,
    "ev_type_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events, count(*) AS n_types,
        |       round(ln(sum(c)) - sum(CAST(c AS DOUBLE) * ln(c)) / sum(c), 6) AS type_entropy
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // day-partitioned sweep line + per-day carry-in over the session chain
    "ev_peak_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), s AS (
        |  SELECT min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM sess GROUP BY user_id, session_id
        |), b AS (
        |  SELECT start_us AS ts, 1 AS d FROM s
        |  UNION ALL SELECT end_us + 1, -1 FROM s
        |), bd AS (
        |  SELECT ts, d, (ts // 86400000000) AS day FROM b
        |), days AS (SELECT DISTINCT day FROM bd),
        |carry AS (
        |  SELECT days.day, count(*) AS carry_in
        |  FROM s JOIN days ON s.start_us < days.day * 86400000000
        |                  AND s.end_us >= days.day * 86400000000
        |  GROUP BY 1
        |), runs AS (
        |  SELECT day, CAST(sum(d) OVER (PARTITION BY day ORDER BY ts, d DESC
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM bd
        |), mx AS (SELECT day, max(run) AS max_run FROM runs GROUP BY 1)
        |SELECT mx.day, CAST(coalesce(carry_in, 0) AS BIGINT) AS carry_in,
        |       CAST(coalesce(carry_in, 0) + greatest(max_run, 0) AS BIGINT)
        |         AS peak_concurrency
        |FROM mx LEFT JOIN carry ON mx.day = carry.day
        |ORDER BY mx.day""".stripMargin,
    // the sessionize chain carrying event_type → per-session first
    // view / last purchase → 1-row conversion rollup
    "ev_session_funnel" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us, event_type,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us, event_type,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), per AS (
        |  SELECT user_id, session_id,
        |         min(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view,
        |         max(CASE WHEN event_type = 'purchase' THEN ts_us END) AS last_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |       CAST(coalesce(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        |         AS n_with_view,
        |       CAST(coalesce(sum(CASE WHEN first_view IS NOT NULL AND last_purchase >= first_view
        |                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN first_view IS NOT NULL AND last_purchase >= first_view
        |                           THEN 1 ELSE 0 END) AS DOUBLE) /
        |             sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END), 6)
        |         AS session_conversion
        |FROM per""".stripMargin,
    // epoch-aligned hour-of-week: pure floor-div/mod arithmetic (no
    // locale calendar), non-negative even for pre-1970 fixtures
    "ev_hour_of_week" ->
      """WITH h AS (SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 168 + 168) % 168 AS how
        |           FROM events),
        |     c AS (SELECT how, count(*) AS n FROM h GROUP BY 1),
        |     t AS (SELECT sum(n) AS n_total FROM c)
        |SELECT how, n, round(CAST(n AS DOUBLE) / n_total, 6) AS share
        |FROM c CROSS JOIN t ORDER BY how""".stripMargin,
    "ev_power_users" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |           FROM events GROUP BY 1),
        |     t AS (SELECT quantile_cont(n_events, 0.9) AS p90,
        |                  sum(n_events) AS n_total FROM c)
        |SELECT user_id, n_events, sum_value,
        |       round(CAST(n_events AS DOUBLE) / n_total, 6) AS traffic_share
        |FROM c CROSS JOIN t WHERE n_events >= p90
        |ORDER BY n_events DESC, user_id""".stripMargin,
    // the ev_sessionize CTE chain + log2 (binary-digit-count) buckets
    "ev_session_histogram" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), sl AS (
        |  SELECT CAST(length(bin(count(*))) - 1 AS INTEGER) AS bucket
        |  FROM sess GROUP BY user_id, session_id
        |), c AS (SELECT bucket, count(*) AS n_sessions FROM sl GROUP BY 1),
        |   t AS (SELECT sum(n_sessions) AS n_total FROM c)
        |SELECT bucket,
        |       CAST(1 AS BIGINT) << bucket AS lo_events,
        |       (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_events,
        |       n_sessions,
        |       round(CAST(n_sessions AS DOUBLE) / n_total, 6) AS share
        |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,
    // as-of (latest prior view per purchase) → conversion-latency percentiles
    "ev_time_to_convert" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     lat AS (
        |  SELECT p.ts_us - max(v.ts_us) AS latency_us
        |  FROM e p JOIN e v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY p.event_id, p.ts_us)
        |SELECT count(*) AS n_converted,
        |       round(quantile_cont(latency_us, 0.5), 4) AS p50_us,
        |       round(quantile_cont(latency_us, 0.9), 4) AS p90_us,
        |       max(latency_us) AS max_us
        |FROM lat""".stripMargin,
    "ev_user_lifecycle" ->
      """WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     u AS (
        |  SELECT user_id, count(*) AS n_events, min(ts_us) AS first_us,
        |         max(ts_us) AS last_us,
        |         count(DISTINCT ts_us // 86400000000) AS active_days
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_events, first_us, last_us, active_days,
        |       round(CAST(n_events AS DOUBLE) / active_days, 4) AS events_per_active_day
        |FROM u ORDER BY user_id""".stripMargin,
    // median/MAD robust anomalies over epoch-aligned hourly counts
    "ev_anomaly_mad" ->
      """WITH h AS (
        |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS hour_us,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med_n FROM h GROUP BY 1),
        |mad AS (SELECT h.event_type, quantile_cont(abs(n - med_n), 0.5) AS mad_n
        |        FROM h JOIN med USING (event_type) GROUP BY 1)
        |SELECT hour_us, h.event_type, n, round(med_n, 4) AS med_n,
        |       round(abs(n - med_n) / (1.4826 * mad_n), 4) AS robust_score
        |FROM h JOIN med USING (event_type) JOIN mad USING (event_type)
        |WHERE mad_n > 0 AND abs(n - med_n) > 3.0 * 1.4826 * mad_n
        |ORDER BY hour_us, event_type""".stripMargin,
    "ev_session_duration" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), dur AS (
        |  SELECT max(ts_us) - min(ts_us) AS dur_us
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT count(*) AS n_sessions,
        |       round(quantile_cont(dur_us, 0.5), 4) AS p50_us,
        |       round(quantile_cont(dur_us, 0.9), 4) AS p90_us,
        |       max(dur_us) AS max_us
        |FROM dur""".stripMargin,
    "ev_new_vs_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |                   epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |     fd AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
        |     d AS (SELECT day, count(*) AS n_active,
        |                  sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS n_new
        |           FROM ud JOIN fd USING (user_id) GROUP BY 1)
        |SELECT day, n_active, CAST(n_new AS BIGINT) AS n_new,
        |       CAST(n_active - n_new AS BIGINT) AS n_returning,
        |       round(CAST(n_new AS DOUBLE) / n_active, 6) AS new_share
        |FROM d ORDER BY day""".stripMargin,
    "ev_transitions" ->
      """WITH g AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |t AS (SELECT event_type AS next_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |               AS prev_type
        |      FROM g),
        |m AS (SELECT prev_type, next_type, count(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |       round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM m ORDER BY prev_type, next_type""".stripMargin,
    "ev_gap_fill" ->
      """WITH h AS (SELECT event_type,
        |            epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM h GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hour FROM r)
        |SELECT g.event_type, g.hour * 3600000000 AS hour_us, coalesce(n, 0) AS n
        |FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hour = h.hour
        |ORDER BY 1, 2""".stripMargin,
    "ev_scd2_intervals" ->
      """WITH g AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |ch AS (SELECT *, lag(event_type) OVER w AS prev_type
        |       FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |c2 AS (SELECT user_id, event_id, ts_us, event_type FROM ch
        |       WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts_us AS valid_from_us,
        |       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us
        |FROM c2 ORDER BY user_id, valid_from_us""".stripMargin,
    "ev_by_segment" ->
      """SELECT c_mktsegment, event_type, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_funnel" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     lastv AS (
        |       SELECT p.event_id, p.ts_us, max(v.ts_us) AS last_view_us
        |       FROM e p LEFT JOIN e v
        |         ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |       WHERE p.event_type = 'purchase'
        |       GROUP BY 1,2)
        |SELECT count(*) AS n_purchases,
        |       CAST(coalesce(sum(CASE WHEN last_view_us IS NOT NULL
        |                  AND ts_us - last_view_us <= 3600000000 THEN 1 ELSE 0 END),0) AS BIGINT) AS n_converted,
        |       CAST(coalesce(sum(CASE WHEN last_view_us IS NULL THEN 1 ELSE 0 END),0) AS BIGINT) AS n_no_prior_view
        |FROM lastv""".stripMargin,
    "ev_funnel_steps" ->
      """WITH g AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS ts_us FROM g
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT g.user_id, min(g.ts_us) AS ts_us
        |       FROM g JOIN s1 ON g.user_id = s1.user_id
        |       WHERE g.event_type = 'click' AND g.ts_us > s1.ts_us GROUP BY 1),
        |s3 AS (SELECT g.user_id, min(g.ts_us) AS ts_us
        |       FROM g JOIN s2 ON g.user_id = s2.user_id
        |       WHERE g.event_type = 'purchase' AND g.ts_us > s2.ts_us GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin,
    "ev_cohort_matrix" ->
      """WITH g AS (SELECT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM g GROUP BY 1)
        |SELECT c.cohort_day, g.day - c.cohort_day AS day_offset,
        |       count(DISTINCT g.user_id) AS n_active
        |FROM g JOIN c ON g.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_rfm" ->
      """WITH g AS (SELECT user_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |nw AS (SELECT max(ts_us) AS now_us FROM g),
        |agg AS (SELECT user_id, max(ts_us) AS last_us, count(*) AS frequency,
        |               round(sum(value), 4) AS monetary
        |        FROM g WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT user_id, (nw.now_us - last_us) // 86400000000 AS recency_days,
        |       frequency, monetary
        |FROM agg CROSS JOIN nw ORDER BY user_id""".stripMargin,
    // decay term written as the identical expression tree Spark
    // evaluates: exp((-0.1 * CAST(diff AS DOUBLE)) / 86400000000.0).
    "ev_decayed_score" ->
      """WITH g AS (SELECT user_id, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |nw AS (SELECT max(ts_us) AS now_us FROM g)
        |SELECT user_id, count(*) AS n_events,
        |       round(sum(value * exp(CAST(-0.1 AS DOUBLE) * CAST(nw.now_us - ts_us AS DOUBLE)
        |                             / 86400000000.0)), 6) AS decayed_score
        |FROM g CROSS JOIN nw GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_attribution" ->
      """WITH g AS (SELECT event_id, user_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT user_id, event_type, value, ts_us,
        |             last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS)
        |               OVER w AS prev_us,
        |             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |               OVER w AS prev_type
        |      FROM g
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |conv AS (SELECT CASE WHEN prev_us IS NOT NULL AND ts_us - prev_us <= 1800000000
        |                     THEN prev_type ELSE 'direct' END AS channel, value
        |         FROM p WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_conversions, round(sum(value), 4) AS total_value
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_interval_join" ->
      """WITH e AS (SELECT event_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |a AS (SELECT event_id AS a_id, ts_us AS a_us FROM e WHERE event_type = 'error'),
        |b AS (SELECT event_id AS b_id, ts_us AS b_us FROM e WHERE event_type = 'purchase')
        |SELECT a.a_id, count(b.b_id) AS n_nearby,
        |       min(abs(a.a_us - b.b_us)) AS min_delta_us
        |FROM a LEFT JOIN b ON abs(a.a_us - b.b_us) <= 300000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_props_variant" ->
      """SELECT CAST(k % 10 AS BIGINT) AS k_bucket, count(*) AS n,
        |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
        |       round(avg(value), 6) AS avg_value
        |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, value FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_props_json" ->
      """SELECT CAST(k % 10 AS BIGINT) AS k_bucket, count(*) AS n,
        |       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
        |       round(sum(value), 4) AS sum_value
        |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, value FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_daily_rolling" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, n,
        |       round(avg(n) OVER (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
        |FROM daily ORDER BY day, event_type""".stripMargin,
    "ev_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
        |  FROM events),
        |ret AS (
        |  SELECT a.day, count(*) AS n_retained
        |  FROM ud a JOIN (SELECT day + 1 AS day, user_id FROM ud) b
        |    USING (day, user_id)
        |  GROUP BY 1)
        |SELECT d.day, d.n_active, coalesce(r.n_retained, 0) AS n_retained
        |FROM (SELECT day, count(*) AS n_active FROM ud GROUP BY 1) d
        |LEFT JOIN ret r USING (day)
        |ORDER BY day""".stripMargin,
    "ev_hour_pivot" ->
      """SELECT CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS INTEGER) AS hour_of_day,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'view') AS view,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_props_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(coalesce(sum(k),0) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |             TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        |      FROM events) sub
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_asof_native" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1,2,3 ORDER BY 1""".stripMargin,
    // tolerance twin: a view in [p.ts - 30min, p.ts] is the as-of
    // match iff one exists (any in-window view beats all older ones)
    "ev_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        |  AND v.ts_us <= p.ts_us AND v.ts_us >= p.ts_us - 1800000000
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1,2,3 ORDER BY 1""".stripMargin,
    "ev_asof_last_view" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1,2,3 ORDER BY 1""".stripMargin,
    "ev_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM sess GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_hourly_counts" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |       event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // --- round-7 second continuation ---
    // matrix multiply as join on the shared middle state; p1 kept
    // unrounded (identical IEEE n/total in both engines), round(6)
    // absorbs the 5-term sum-order ulp
    "ev_markov_2step" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |                                   ORDER BY ts_us, event_id) AS prev_type,
        |             event_type AS next_type
        |      FROM e),
        |c AS (SELECT prev_type, next_type, count(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT prev_type, next_type,
        |             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
        |      FROM c)
        |SELECT ab.prev_type AS from_type, bc.next_type AS to_type,
        |       round(sum(ab.p * bc.p), 6) AS p2
        |FROM p ab JOIN p bc ON ab.next_type = bc.prev_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_trigrams" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT event_type AS t1,
        |             lead(event_type, 1) OVER w AS t2,
        |             lead(event_type, 2) OVER w AS t3
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT t1 || '>' || t2 || '>' || t3 AS trigram, count(*) AS n
        |FROM g WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin,
    // daily totals rounded BEFORE the windowed quantile so both
    // engines interpolate over identical doubles
    "ev_rolling_p95" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  event_type, value FROM events),
        |d AS (SELECT day, event_type, round(sum(value), 2) AS daily_value
        |      FROM e GROUP BY 1, 2)
        |SELECT day, event_type, daily_value,
        |       round(quantile_cont(daily_value, 0.95) OVER (
        |         PARTITION BY event_type ORDER BY day
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS p95_7d
        |FROM d ORDER BY day, event_type""".stripMargin,
    "ev_autocorr" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  event_type FROM events),
        |d AS (SELECT day, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.n AS n_t, b.n AS n_t1
        |      FROM d a JOIN d b
        |        ON a.event_type = b.event_type AND b.day = a.day + 1)
        |SELECT event_type, count(*) AS n_pairs,
        |       round(corr(CAST(n_t AS DOUBLE), CAST(n_t1 AS DOUBLE)), 6)
        |         AS autocorr_lag1
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_value_percentiles" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(avg(value), 4) AS mean_value,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99,
        |       round(max(value), 4) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_session_gap_hist" ->
      """WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |sess AS (
        |  SELECT user_id, ts_us,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked),
        |starts AS (SELECT user_id, session_id, min(ts_us) AS start_us
        |           FROM sess GROUP BY 1, 2),
        |lagged AS (
        |  SELECT start_us - lag(start_us) OVER (PARTITION BY user_id
        |           ORDER BY start_us) AS gap_us
        |  FROM starts),
        |-- filter BEFORE least: least(NULL, cap) = cap in DuckDB, which
        |-- would admit each user's first session as a phantom cap-bucket gap
        |gaps AS (SELECT least(gap_us // 3600000000, 168) AS gap_hours
        |         FROM lagged WHERE gap_us IS NOT NULL),
        |c AS (SELECT gap_hours, count(*) AS n_gaps FROM gaps GROUP BY 1)
        |SELECT gap_hours, n_gaps,
        |       round(CAST(n_gaps AS DOUBLE) / sum(n_gaps) OVER (), 6) AS share
        |FROM c ORDER BY 1""".stripMargin,
    "ev_retention_fit" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |f AS (SELECT user_id, min(day) AS day0 FROM ud GROUP BY 1),
        |b AS (SELECT count(*) AS n_users FROM f),
        |cv AS (SELECT CAST(k AS DOUBLE) AS x,
        |              ln(CAST(n_active AS DOUBLE) / n_users) AS y
        |       FROM (SELECT ud.day - f.day0 AS k, count(*) AS n_active
        |             FROM ud JOIN f USING (user_id)
        |             WHERE ud.day - f.day0 >= 1 GROUP BY 1) t, b),
        |s AS (SELECT count(*) AS n_points, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM cv)
        |SELECT n_points,
        |       round((sxy - sx * sy / n_points)
        |             / (sxx - sx * sx / n_points), 6) AS decay_per_day,
        |       round(sy / n_points - ((sxy - sx * sy / n_points)
        |             / (sxx - sx * sx / n_points)) * sx / n_points, 6) AS intercept,
        |       round(ln(2) / -((sxy - sx * sy / n_points)
        |             / (sxx - sx * sx / n_points)), 4) AS half_life_days
        |FROM s""".stripMargin,
    "ev_behavior_sim" ->
      """WITH v AS (SELECT user_id,
        |  [CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE)] AS v
        |           FROM events GROUP BY 1),
        |q AS (SELECT user_id AS qid, v AS qv FROM v WHERE user_id < 10),
        |s AS (SELECT qid, c.user_id AS cid,
        |             round(list_cosine_similarity(qv, c.v), 6) AS cos_sim
        |      FROM q CROSS JOIN v c WHERE c.user_id <> qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |               ORDER BY cos_sim DESC, cid) AS rnk FROM s)
        |SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // per-user metric rounded before arm sums; Welch t from raw-sum identity
    "ev_ab_test" ->
      """WITH m AS (SELECT user_id,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m
        |           FROM events GROUP BY 1),
        |g AS (SELECT m,
        |             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |               AS BIGINT) % 2 AS grp FROM m),
        |w AS (SELECT
        |  count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |  count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |  sum(CASE WHEN grp = 0 THEN m ELSE 0.0 END) AS sx_a,
        |  sum(CASE WHEN grp = 1 THEN m ELSE 0.0 END) AS sx_b,
        |  sum(CASE WHEN grp = 0 THEN m * m ELSE 0.0 END) AS sx2_a,
        |  sum(CASE WHEN grp = 1 THEN m * m ELSE 0.0 END) AS sx2_b FROM g)
        |SELECT n_a, n_b,
        |       round(sx_a / n_a, 6) AS mean_a, round(sx_b / n_b, 6) AS mean_b,
        |       CASE WHEN n_a > 1 AND n_b > 1 THEN
        |         round((sx_a / n_a - sx_b / n_b) /
        |           sqrt(((sx2_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
        |              + ((sx2_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 4)
        |       END AS welch_t,
        |       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
        |         AS srm_chi2
        |FROM w""".stripMargin,
    // MDE = 2.801585·SE (α=0.05 two-sided, power 0.8), raw-sums SEs
    "ev_power_analysis" ->
      """WITH u AS (SELECT user_id,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m,
        |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |               AS conv
        |           FROM events GROUP BY 1),
        |g AS (SELECT m, conv,
        |        CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |          AS BIGINT) % 2 AS grp FROM u),
        |s AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |             count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |             sum(CASE WHEN grp = 0 THEN m ELSE 0.0 END) AS sx_a,
        |             sum(CASE WHEN grp = 1 THEN m ELSE 0.0 END) AS sx_b,
        |             sum(CASE WHEN grp = 0 THEN m * m ELSE 0.0 END) AS sx2_a,
        |             sum(CASE WHEN grp = 1 THEN m * m ELSE 0.0 END) AS sx2_b,
        |             CAST(sum(conv) AS BIGINT) AS c FROM g)
        |SELECT n_a, n_b,
        |  round((sx_a + sx_b) / (n_a + n_b), 6) AS baseline_value,
        |  round(CAST(c AS DOUBLE) / (n_a + n_b), 6) AS baseline_rate,
        |  CASE WHEN n_a > 1 AND n_b > 1 THEN
        |    round(2.801585 * sqrt(
        |      ((sx2_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
        |      + ((sx2_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 6)
        |  END AS mde_value,
        |  CASE WHEN CAST(c AS DOUBLE) / (n_a + n_b) > 0
        |        AND CAST(c AS DOUBLE) / (n_a + n_b) < 1 THEN
        |    round(2.801585 * sqrt(CAST(c AS DOUBLE) / (n_a + n_b)
        |      * (1.0 - CAST(c AS DOUBLE) / (n_a + n_b))
        |      * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)), 6)
        |  END AS mde_conversion
        |FROM s""".stripMargin,
    // pooled two-proportion z on exact integer counts
    "ev_ab_conversion" ->
      """WITH u AS (SELECT user_id,
        |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |               AS conv
        |           FROM events GROUP BY 1),
        |g AS (SELECT conv,
        |        CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |          AS BIGINT) % 2 AS grp FROM u),
        |s AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |             count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |             CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT)
        |               AS c_a,
        |             CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT)
        |               AS c_b FROM g)
        |SELECT n_a, n_b, c_a, c_b,
        |       round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
        |       round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
        |       CASE WHEN CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) > 0
        |             AND CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) < 1 THEN
        |         round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
        |           / sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
        |             * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |             * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)), 4)
        |       END AS z
        |FROM s""".stripMargin,
    // θ = cov/var from one raw-sums pass; same splits as ab_test / did
    "ev_cuped" ->
      """WITH e AS (SELECT user_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |u AS (SELECT user_id,
        |        round(sum(CASE WHEN event_type = 'purchase'
        |          AND day < (d0 + d1 + 1) // 2 THEN value ELSE 0.0 END), 6) AS x,
        |        round(sum(CASE WHEN event_type = 'purchase'
        |          AND day >= (d0 + d1 + 1) // 2 THEN value ELSE 0.0 END), 6) AS y
        |      FROM e, b GROUP BY 1),
        |g AS (SELECT x, y,
        |        CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |          AS BIGINT) % 2 AS grp FROM u),
        |s AS (SELECT count(*) AS n,
        |        count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |        count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |        sum(x * x) AS sx2, sum(y * y) AS sy2,
        |        sum(CASE WHEN grp = 0 THEN x ELSE 0.0 END) AS sx_a,
        |        sum(CASE WHEN grp = 1 THEN x ELSE 0.0 END) AS sx_b,
        |        sum(CASE WHEN grp = 0 THEN y ELSE 0.0 END) AS sy_a,
        |        sum(CASE WHEN grp = 1 THEN y ELSE 0.0 END) AS sy_b FROM g)
        |SELECT n_a, n_b,
        |  CASE WHEN n * sx2 - sx * sx > 0 THEN
        |    round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) END AS theta,
        |  round(sy_a / n_a - sy_b / n_b, 6) AS effect_raw,
        |  CASE WHEN n * sx2 - sx * sx > 0 THEN
        |    round(sy_a / n_a - sy_b / n_b
        |      - (n * sxy - sx * sy) / (n * sx2 - sx * sx)
        |        * (sx_a / n_a - sx_b / n_b), 6) END AS effect_cuped,
        |  CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0 THEN
        |    round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |      / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6)
        |  END AS var_reduction
        |FROM s""".stripMargin,
    // 2×2 arm × half-period cells over FIXED arm user counts
    "ev_diff_in_diff" ->
      """WITH e AS (SELECT user_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |eb AS (SELECT user_id, event_type, value,
        |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |           AS BIGINT) % 2 AS grp,
        |         day >= (d0 + d1 + 1) // 2 AS is_post
        |       FROM e, b),
        |c AS (SELECT
        |  sum(CASE WHEN grp = 0 AND NOT is_post THEN value ELSE 0.0 END) AS v_t_pre,
        |  sum(CASE WHEN grp = 0 AND is_post THEN value ELSE 0.0 END) AS v_t_post,
        |  sum(CASE WHEN grp = 1 AND NOT is_post THEN value ELSE 0.0 END) AS v_c_pre,
        |  sum(CASE WHEN grp = 1 AND is_post THEN value ELSE 0.0 END) AS v_c_post
        |  FROM eb WHERE event_type = 'purchase'),
        |u AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_t,
        |             count(CASE WHEN grp = 1 THEN 1 END) AS n_c
        |      FROM (SELECT DISTINCT user_id, grp FROM eb) z)
        |SELECT n_t, n_c,
        |       round(v_t_pre / n_t, 6) AS treated_pre,
        |       round(v_t_post / n_t, 6) AS treated_post,
        |       round(v_c_pre / n_c, 6) AS control_pre,
        |       round(v_c_post / n_c, 6) AS control_post,
        |       round((v_t_post / n_t - v_t_pre / n_t)
        |             - (v_c_post / n_c - v_c_pre / n_c), 6) AS did_effect
        |FROM c, u""".stripMargin,
    // ab_test sliced by pooled activity terciles; effect from unrounded means
    "ev_ab_hte" ->
      """WITH u AS (SELECT user_id, count(*) AS n_events,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m
        |           FROM events GROUP BY 1),
        |g AS (SELECT n_events, m,
        |             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |               AS BIGINT) % 2 AS grp FROM u),
        |thr AS (SELECT quantile_cont(CAST(n_events AS DOUBLE),
        |                 list_transform(range(1, 3), i -> i / 3.0)) AS thr FROM g),
        |seg AS (SELECT m, grp,
        |          CAST(len(list_filter(thr, t -> t < n_events)) AS INTEGER)
        |            AS segment
        |        FROM g, thr),
        |w AS (SELECT segment,
        |  count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |  count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |  sum(CASE WHEN grp = 0 THEN m ELSE 0.0 END) AS sx_a,
        |  sum(CASE WHEN grp = 1 THEN m ELSE 0.0 END) AS sx_b,
        |  sum(CASE WHEN grp = 0 THEN m * m ELSE 0.0 END) AS sx2_a,
        |  sum(CASE WHEN grp = 1 THEN m * m ELSE 0.0 END) AS sx2_b
        |  FROM seg GROUP BY 1)
        |SELECT segment, n_a, n_b,
        |       round(sx_a / n_a, 6) AS mean_a, round(sx_b / n_b, 6) AS mean_b,
        |       round(sx_a / n_a - sx_b / n_b, 6) AS effect,
        |       CASE WHEN n_a > 1 AND n_b > 1 THEN
        |         round((sx_a / n_a - sx_b / n_b) /
        |           sqrt(((sx2_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
        |              + ((sx2_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 4)
        |       END AS welch_t
        |FROM w ORDER BY segment""".stripMargin,
    // reference half defines the decile bins; shares clamped at 1e-6
    "ev_psi_drift" ->
      """WITH e AS (SELECT event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |eb AS (SELECT event_type, value, day < (d0 + d1 + 1) // 2 AS is_ref
        |       FROM e, b),
        |thr AS (SELECT event_type,
        |               quantile_cont(value,
        |                 list_transform(range(1, 10), i -> i / 10.0)) AS thr
        |        FROM eb WHERE is_ref GROUP BY 1),
        |binned AS (SELECT eb.event_type, is_ref,
        |                  CAST(len(list_filter(thr, t -> t < value)) AS INTEGER)
        |                    AS bin
        |           FROM eb JOIN thr USING (event_type)),
        |c AS (SELECT event_type, bin,
        |             count(CASE WHEN is_ref THEN 1 END) AS nr,
        |             count(CASE WHEN NOT is_ref THEN 1 END) AS nc
        |      FROM binned GROUP BY 1, 2),
        |t AS (SELECT event_type, nr, nc,
        |        greatest(CAST(nr AS DOUBLE)
        |          / sum(nr) OVER (PARTITION BY event_type), 1e-6) AS p,
        |        greatest(CAST(nc AS DOUBLE)
        |          / sum(nc) OVER (PARTITION BY event_type), 1e-6) AS q
        |      FROM c)
        |SELECT event_type, CAST(sum(nr) AS BIGINT) AS n_ref,
        |       CAST(sum(nc) AS BIGINT) AS n_cur,
        |       round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    // first/last from one per-purchase sort; linear splits 1/n; no-touch → direct
    "ev_attribution_models" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT user_id, event_id AS pid, ts_us AS pts, value FROM e
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS tid, ts_us AS tts,
        |             event_type AS channel FROM e WHERE event_type <> 'purchase'),
        |j AS (SELECT pid, value, tid, tts, channel
        |      FROM p LEFT JOIN t ON p.user_id = t.user_id
        |        AND t.tts < p.pts AND p.pts - t.tts <= 1800000000),
        |j2 AS (SELECT *,
        |         row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rn_f,
        |         row_number() OVER (PARTITION BY pid
        |           ORDER BY tts DESC, tid DESC) AS rn_l,
        |         count(tid) OVER (PARTITION BY pid) AS n,
        |         coalesce(channel, 'direct') AS ch
        |       FROM j),
        |fa AS (SELECT ch AS channel, count(*) AS n_first,
        |              round(sum(value), 4) AS val_first
        |       FROM j2 WHERE rn_f = 1 GROUP BY 1),
        |la AS (SELECT ch AS channel, count(*) AS n_last,
        |              round(sum(value), 4) AS val_last
        |       FROM j2 WHERE rn_l = 1 GROUP BY 1),
        |li AS (SELECT ch AS channel,
        |              round(sum(CASE WHEN n > 0 THEN CAST(1.0 AS DOUBLE) / n
        |                        ELSE CAST(1.0 AS DOUBLE) END), 4) AS credit_linear,
        |              round(sum(CASE WHEN n > 0 THEN value / n ELSE value END), 4)
        |                AS val_linear
        |       FROM j2 GROUP BY 1)
        |SELECT coalesce(fa.channel, la.channel, li.channel) AS channel,
        |       coalesce(n_first, 0) AS n_first,
        |       coalesce(val_first, 0.0) AS val_first,
        |       coalesce(n_last, 0) AS n_last,
        |       coalesce(val_last, 0.0) AS val_last,
        |       coalesce(credit_linear, 0.0) AS credit_linear,
        |       coalesce(val_linear, 0.0) AS val_linear
        |FROM fa FULL OUTER JOIN la ON fa.channel = la.channel
        |        FULL OUTER JOIN li ON coalesce(fa.channel, la.channel) = li.channel
        |ORDER BY channel""".stripMargin,
    // lead(k−1) over the per-user sort IS the pattern match
    "ev_burst_detect" ->
      """WITH e AS (SELECT user_id, event_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |w AS (SELECT user_id, ts_us,
        |             lead(ts_us, 2) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS ts_k FROM e)
        |SELECT user_id, ts_us AS burst_start_us, ts_k AS burst_end_us
        |FROM w WHERE ts_k IS NOT NULL AND ts_k - ts_us <= 1800000000
        |ORDER BY user_id, burst_start_us""".stripMargin,
    // one conditional-count pass; ts bounds are exact epoch-µs literals
    "ev_dq_checks" ->
      """WITH e AS (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT count(*) AS n_rows,
        |       count(*) - count(DISTINCT event_id) AS n_dup_event_ids,
        |       count(CASE WHEN event_id IS NULL THEN 1 END) AS n_null_id,
        |       count(CASE WHEN ts IS NULL THEN 1 END) AS n_null_ts,
        |       count(CASE WHEN user_id IS NULL THEN 1 END) AS n_null_user,
        |       count(CASE WHEN event_type IS NULL THEN 1 END) AS n_null_type,
        |       count(CASE WHEN value IS NULL THEN 1 END) AS n_null_value,
        |       count(CASE WHEN ts_us < 1577836800000000
        |                  OR ts_us >= 2051222400000000 THEN 1 END)
        |         AS n_ts_out_of_range,
        |       count(CASE WHEN value < 0 THEN 1 END) AS n_negative_value,
        |       count(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
        |               ('click', 'error', 'purchase', 'signup', 'view') THEN 1 END)
        |         AS n_unknown_type
        |FROM e""".stripMargin,
    // pooled-percentile-grid KS; same md5 split / per-user metric as ev_ab_test
    "ev_ab_ks" ->
      """WITH m AS (SELECT user_id,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m
        |           FROM events GROUP BY 1),
        |g AS (SELECT m,
        |             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |               AS BIGINT) % 2 AS grp FROM m),
        |grid AS (SELECT DISTINCT t FROM (
        |  SELECT unnest(quantile_cont(m,
        |           list_transform(range(1, 20), i -> i / 20.0))) AS t FROM g) z),
        |c AS (SELECT t,
        |        count(CASE WHEN grp = 0 AND m <= t THEN 1 END) AS ca,
        |        count(CASE WHEN grp = 1 AND m <= t THEN 1 END) AS cb
        |      FROM g CROSS JOIN grid GROUP BY 1),
        |tot AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |               count(CASE WHEN grp = 1 THEN 1 END) AS n_b FROM g)
        |SELECT n_a, n_b,
        |       round(abs(CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b), 6)
        |         AS ks_d,
        |       t AS at_m
        |FROM c, tot ORDER BY ks_d DESC, at_m LIMIT 1""".stripMargin,
    // survival product as exp(Σ ln) in one ordered frame; censor horizon 24h
    "ev_kaplan_meier" ->
      """WITH e AS (SELECT user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr
        |           FROM events),
        |s AS (SELECT user_id, min(hr) AS hr0, max(hr) AS hr1 FROM e GROUP BY 1),
        |h AS (SELECT max(hr1) AS max_hr FROM s),
        |l AS (SELECT hr1 - hr0 AS t,
        |             CASE WHEN hr1 < max_hr - 24 THEN 1 ELSE 0 END AS event
        |      FROM s, h),
        |g AS (SELECT t, count(*) AS n_at_t, CAST(sum(event) AS BIGINT) AS d
        |      FROM l GROUP BY 1),
        |k AS (SELECT t, d,
        |             CAST(sum(n_at_t) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |               PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
        |      FROM g),
        |v AS (SELECT t, n_risk, d,
        |             round(exp(sum(ln(greatest(1.0 - CAST(d AS DOUBLE) / n_risk,
        |                               1e-300)))
        |               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
        |                 CURRENT ROW)), 6) AS survival
        |      FROM k)
        |SELECT t AS t_hours, n_risk, d AS n_events, survival FROM v
        |WHERE d > 0 ORDER BY t_hours""".stripMargin,
    "ev_strict_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS v_us FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS c_us FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > v_us
        |        AND ts_us - v_us <= 3600000000 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS p_us FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > c_us
        |        AND ts_us - c_us <= 3600000000 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_deadline,
        |       (SELECT count(*) FROM p) AS n_purchase_deadline,
        |       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |             / (SELECT count(*) FROM v), 6) AS strict_conversion""".stripMargin,
    "ev_changepoint" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  event_type FROM events),
        |d AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
        |m AS (SELECT event_type, day, n,
        |             avg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type) AS mean_n
        |      FROM d),
        |s AS (SELECT event_type, day, mean_n,
        |             sum(n - mean_n) OVER (PARTITION BY event_type ORDER BY day
        |               ROWS UNBOUNDED PRECEDING) AS s
        |      FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |               ORDER BY abs(s) DESC, day) AS rn FROM s)
        |SELECT event_type, day AS change_day, round(s, 4) AS cusum_peak,
        |       round(mean_n, 4) AS mean_daily
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
  )
}
