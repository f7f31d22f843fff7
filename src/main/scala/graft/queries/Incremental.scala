package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming / incremental analogue over `events` (SURVEY.md §2.8 T1-T6 +
  * §2.3 J7). The reference's incremental surface is dbt incremental models
  * + Delta append/merge (`/root/reference/README.md:2` medallion demo);
  * here each construct is expressed as a deterministic batch query so it is
  * DuckDB-oracle-checkable. The *streaming* executions of the same shapes
  * (withWatermark + window / session_window / dropDuplicatesWithinWatermark
  * / flatMapGroupsWithState) live in graft.streaming.Streams and are
  * exercised by the scalatest streaming suite — they are not oracle
  * queries because a DuckDB oracle cannot run a micro-batch pipeline.
  *
  * All event timestamps are truncated to whole seconds (`ts_sec`) before
  * use — the fixture's nanosecond precision cannot round-trip through
  * Spark's µs TimestampType (FIXTURES.md parity trap).
  */
object Incremental {

  /** events with ts_sec (second-truncated µs timestamp). */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .withColumn("ts_sec", date_trunc("second", col("ts")))

  private val oracleEv =
    """SELECT event_id, user_id, event_type, value, props,
              CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts_sec
       FROM events"""

  /** events with epoch-second `ts_e` — the as-of family does its gap
    * arithmetic on integers (matches Spark's `unix_timestamp(ts_sec)`). */
  private val oracleEpochEv =
    """SELECT event_id, user_id, event_type,
              CAST(epoch(CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS BIGINT) AS ts_e
       FROM events"""

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------- T1
    // Incremental high-watermark batch: only rows past the last processed
    // watermark are read (the dbt `is_incremental()` pattern). The filter
    // is a pushable predicate → at 100 TB this prunes parquet row groups /
    // partitions before any compute.
    QueryDef("t1_incremental_watermark", (s, dir) => {
      ev(s, dir)
        .filter(col("ts_sec") > lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("ts_sec").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), (round((sum(col("value")))*100)/100).as("sum_value"))
        .orderBy(col("day").asc_nulls_last, col("event_type").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv)
         SELECT CAST(ts_sec AS DATE) AS day, event_type,
                count(*) AS n, (round((sum(value))*100)/100) AS sum_value
         FROM e WHERE ts_sec > TIMESTAMP '2024-01-15 00:00:00'
         GROUP BY 1, 2
         ORDER BY day ASC NULLS LAST, event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T2
    // Tumbling 1-hour windows. Batch form of
    // groupBy(window($"ts","1 hour")) — date_trunc is the same epoch-aligned
    // assignment and keeps the output a plain timestamp column.
    QueryDef("t2_tumbling_window", (s, dir) => {
      ev(s, dir)
        .groupBy(date_trunc("hour", col("ts_sec")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), (round((sum(col("value")))*100)/100).as("sum_value"))
        .orderBy(col("hour").asc_nulls_last, col("event_type").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv)
         SELECT CAST(date_trunc('hour', ts_sec) AS TIMESTAMP) AS hour, event_type,
                count(*) AS n, (round((sum(value))*100)/100) AS sum_value
         FROM e GROUP BY 1, 2
         ORDER BY hour ASC NULLS LAST, event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T3
    // Sliding windows: 1-hour window every 15 minutes via Spark's native
    // window(ts, "1 hour", "15 minutes") — each event lands in exactly 4
    // epoch-aligned windows; the oracle reproduces the assignment
    // arithmetic explicitly.
    QueryDef("t3_sliding_window", (s, dir) => {
      ev(s, dir)
        .groupBy(window(col("ts_sec"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
        .orderBy(col("w_start").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv)
         SELECT TIMESTAMP '1970-01-01 00:00:00'
                  + INTERVAL ((CAST(floor(epoch(ts_sec)/900) AS BIGINT) - k.k) * 900) SECOND
                  AS w_start,
                count(*) AS n
         FROM e CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
         GROUP BY 1
         ORDER BY w_start ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T4
    // Session windows (30-minute inactivity gap), batch form: lag-gap flag
    // + running sum = session id, then per-session rollup. The streaming
    // twin uses session_window(ts, "30 minutes") — see
    // graft.streaming.Streams. Scale: one shuffle on user_id.
    QueryDef("t4_session_window", (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("prev_ts", lag(col("ts_sec"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts_sec")) - unix_timestamp(col("prev_ts"))) > 1800, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts_sec")).as("session_start"),
          count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("ts_sec"))) - unix_timestamp(min(col("ts_sec"))))
            .as("dur_sec"))
        .select(col("user_id"), col("session_start"), col("n_events"), col("dur_sec"))
        .orderBy(col("user_id").asc_nulls_last, col("session_start").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         flagged AS (
           SELECT user_id, event_id, ts_sec,
                  CASE WHEN lag(ts_sec) OVER w IS NULL
                         OR date_diff('second', lag(ts_sec) OVER w, ts_sec) > 1800
                       THEN 1 ELSE 0 END AS new_sess
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC)),
         sess AS (
           SELECT user_id, ts_sec,
                  sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts_sec ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
           FROM flagged)
         SELECT user_id, min(ts_sec) AS session_start,
                count(*) AS n_events,
                date_diff('second', min(ts_sec), max(ts_sec)) AS dur_sec
         FROM sess GROUP BY user_id, sess_id
         ORDER BY user_id ASC NULLS LAST, session_start ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T5
    // Late-data / watermark semantics, batch-checked: watermark = global
    // max(ts) - 24h; events older than the watermark would be dropped by a
    // streaming sink. The scalar aggregate is broadcast, not collected.
    QueryDef("t5_late_data", (s, dir) => {
      val e = ev(s, dir)
      val wm = e.agg((max(col("ts_sec")) - expr("INTERVAL 24 HOURS")).as("wm"))
      e.crossJoin(broadcast(wm))
        .groupBy(col("event_type"))
        .agg(
          count(when(col("ts_sec") >= col("wm"), 1)).as("on_time"),
          count(when(col("ts_sec") < col("wm"), 1)).as("late"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         w AS (SELECT max(ts_sec) - INTERVAL 24 HOUR AS wm FROM e)
         SELECT event_type,
                count(*) FILTER (WHERE ts_sec >= wm) AS on_time,
                count(*) FILTER (WHERE ts_sec < wm) AS late
         FROM e CROSS JOIN w
         GROUP BY event_type ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T6
    // Dedup on a business key: dropDuplicates(user_id, event_type) — the
    // batch twin of dropDuplicatesWithinWatermark. Only key columns are
    // output so which duplicate survives cannot affect the result.
    QueryDef("t6_dedup_events", (s, dir) => {
      ev(s, dir)
        .dropDuplicates("user_id", "event_type")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      """SELECT event_type, count(*) AS n_users
         FROM (SELECT DISTINCT user_id, event_type FROM events)
         GROUP BY event_type ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J7
    // As-of join: each purchase matched to the user's latest click at or
    // before it (graft.operators.AsOfJoin — union+window rewrite, one
    // shuffle). Build side pre-aggregated per (user, second) so ties are
    // deterministic. DuckDB runs its native ASOF LEFT JOIN as the oracle.
    QueryDef("j7_asof_join", (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_sec"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_sec").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.backward(purchases, clicks,
          key = "user_id", probeTs = "ts_sec", buildTs = "click_ts",
          payload = Seq("click_id"))
        .orderBy(col("event_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         p AS (SELECT event_id, user_id, ts_sec FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts_sec AS click_ts, max(event_id) AS click_id
               FROM e WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ts_sec, c.click_id
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts_sec >= c.click_ts
         ORDER BY p.event_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- J7 (b)
    // FORWARD as-of join (DuckDB `ASOF ... ON p.ts <= b.ts`): each
    // purchase matched to the user's EARLIEST click at or after it — the
    // "next action after conversion" shape. Timestamps ride as epoch
    // seconds so all gap arithmetic is integer-exact. Same one-shuffle
    // union+window plan as backward, ordered descending.
    QueryDef("j7_asof_forward", (s, dir) => {
      val e = ev(s, dir).withColumn("ts_e", unix_timestamp(col("ts_sec")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_e"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_e").as("click_e"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.forward(purchases, clicks,
          key = "user_id", probeTs = "ts_e", buildTs = "click_e",
          payload = Seq("click_id"))
        .orderBy(col("event_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEpochEv),
         p AS (SELECT event_id, user_id, ts_e FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts_e AS click_e, max(event_id) AS click_id
               FROM e WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ts_e, c.click_id
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts_e <= c.click_e
         ORDER BY p.event_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- J7 (c)
    // Backward as-of join with a MAX-GAP TOLERANCE (pandas merge_asof
    // `tolerance=`): a click older than 10 minutes does not explain the
    // purchase. The oracle states tolerance as a post-ASOF CASE — sound
    // because the as-of match is the NEAREST candidate, so any other is
    // farther and tolerance can only null, never substitute.
    QueryDef("j7_asof_tolerance", (s, dir) => {
      val e = ev(s, dir).withColumn("ts_e", unix_timestamp(col("ts_sec")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_e"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_e").as("click_e"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.backward(purchases, clicks,
          key = "user_id", probeTs = "ts_e", buildTs = "click_e",
          payload = Seq("click_id", "click_e"),
          tolerance = Some(lit(600L)))
        .orderBy(col("event_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEpochEv),
         p AS (SELECT event_id, user_id, ts_e FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts_e AS click_e, max(event_id) AS click_id
               FROM e WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ts_e,
                CASE WHEN p.ts_e - c.click_e <= 600 THEN c.click_id END AS click_id,
                CASE WHEN p.ts_e - c.click_e <= 600 THEN c.click_e END AS click_e
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts_e >= c.click_e
         ORDER BY p.event_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- J7 (d)
    // NEAREST as-of join (pandas `direction='nearest'`; no DuckDB ASOF
    // equivalent): closest click on either side of the purchase, equal
    // gaps preferring the backward match. The Spark plan is both ordered
    // passes over ONE key shuffle; the oracle takes an independent path —
    // rank ALL candidate clicks per purchase by (|gap|, click_e) and keep
    // the first.
    QueryDef("j7_asof_nearest", (s, dir) => {
      val e = ev(s, dir).withColumn("ts_e", unix_timestamp(col("ts_sec")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_e"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_e").as("click_e"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.nearest(purchases, clicks,
          key = "user_id", probeTs = "ts_e", buildTs = "click_e",
          payload = Seq("click_id"))
        .orderBy(col("event_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEpochEv),
         p AS (SELECT event_id, user_id, ts_e FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts_e AS click_e, max(event_id) AS click_id
               FROM e WHERE event_type = 'click' GROUP BY 1, 2),
         cand AS (
           SELECT p.event_id, p.user_id, p.ts_e, c.click_id,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY abs(c.click_e - p.ts_e) ASC, c.click_e ASC) AS rn
           FROM p LEFT JOIN c ON p.user_id = c.user_id)
         SELECT event_id, user_id, ts_e, click_id
         FROM cand WHERE rn = 1
         ORDER BY event_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T8
    // Time-series gap fill + forward fill (resampling): per-user daily
    // purchase totals densified onto a per-user calendar spanning that
    // user's own [min_day, max_day], missing days carrying the last
    // observed value forward. The dense grid is generated MAP-SIDE from a
    // 2-column span aggregate (`sequence` + `explode` — no driver loop, no
    // cross join against a calendar table), the observed/grid alignment is
    // a keyed equi-join, and the forward fill is one per-user window pass —
    // at 100 TB: one shuffle for the span agg, one for the (user, day)
    // join, one window sort, all on the same user-keyed distribution.
    // Day values are rounded BEFORE the fill so the filled copy is
    // bit-identical to its source row (no re-rounding drift).
    QueryDef("t8_gap_fill", (s, dir) => {
      val daily = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_sec").cast("date").as("day"))
        .agg((round(sum(col("value")) * 100) / 100).as("day_value"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("day_value"), ignoreNulls = true).over(w)
            .as("filled_value"),
          col("day_value").isNull.as("is_gap"))
        .orderBy(col("user_id").asc_nulls_last, col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT user_id, CAST(ts_sec AS DATE) AS day,
                  (round((sum(value))*100)/100) AS day_value
           FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
         span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                  FROM daily GROUP BY 1),
         grid AS (
           SELECT user_id,
                  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
           FROM span)
         SELECT g.user_id, g.day,
                last_value(d.day_value IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS filled_value,
                d.day_value IS NULL AS is_gap
         FROM grid g LEFT JOIN daily d
           ON g.user_id = d.user_id AND g.day = d.day
         ORDER BY g.user_id ASC NULLS LAST, g.day ASC NULLS LAST""")),

    // ------------------------------------------------------------------- T9
    // Ordered conversion funnel (signup → first view after it → first
    // purchase after that), reported per signup-day cohort. Each stage is
    // a filtered min-aggregate equi-joined back on user_id — every join is
    // user-keyed hash (never cartesian, never broadcast-dependent), stage
    // ordering is enforced by the ts predicate INSIDE the join-then-agg,
    // and the final cohort rollup is a tiny date-keyed agg. At 100 TB the
    // per-stage frames are each a pushable event_type filter over the
    // fact, reusing one user-keyed shuffle shape end to end.
    QueryDef("t9_funnel", (s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        col("ts_sec"))
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("s_ts"))
      val v1 = e.filter(col("event_type") === "view")
        .join(s1, Seq("user_id"))
        .filter(col("ts_sec") >= col("s_ts"))
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("v_ts"))
      val p1 = e.filter(col("event_type") === "purchase")
        .join(v1, Seq("user_id"))
        .filter(col("ts_sec") >= col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("p_ts"))
      s1.join(v1, Seq("user_id"), "left")
        .join(p1, Seq("user_id"), "left")
        .groupBy(col("s_ts").cast("date").as("cohort_day"))
        .agg(count(lit(1)).as("n_signup"),
          count(col("v_ts")).as("n_view"),
          count(col("p_ts")).as("n_purchase"))
        .orderBy(col("cohort_day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         s1 AS (SELECT user_id, min(ts_sec) AS s_ts FROM e
                WHERE event_type = 'signup' GROUP BY 1),
         v1 AS (SELECT e.user_id, min(e.ts_sec) AS v_ts
                FROM e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'view' AND e.ts_sec >= s1.s_ts
                GROUP BY 1),
         p1 AS (SELECT e.user_id, min(e.ts_sec) AS p_ts
                FROM e JOIN v1 ON e.user_id = v1.user_id
                WHERE e.event_type = 'purchase' AND e.ts_sec >= v1.v_ts
                GROUP BY 1)
         SELECT CAST(s1.s_ts AS DATE) AS cohort_day,
                count(*) AS n_signup,
                count(v1.v_ts) AS n_view,
                count(p1.p_ts) AS n_purchase
         FROM s1 LEFT JOIN v1 ON s1.user_id = v1.user_id
                 LEFT JOIN p1 ON s1.user_id = p1.user_id
         GROUP BY 1 ORDER BY cohort_day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T10
    // Cohort retention triangle (the product-analytics WAU retention
    // matrix): users cohort by their FIRST active ISO week, and each
    // (cohort, week-offset) cell counts how many of them were active
    // offset weeks later, with a percent against the cohort's own week-0
    // size. Shape at 100 TB: the (user, week) de-dup and the first-week
    // min are both user-keyed aggregates sharing one shuffle; the
    // triangle itself aggregates a frame bounded by users × active
    // weeks, and the pct window runs over the tiny (cohorts × offsets)
    // result. Week offsets divide exactly (both engines truncate to
    // Monday), so every cell is integer-exact; pct's half-way cases are
    // exactly representable ratios that both engines round away from
    // zero identically.
    QueryDef("t10_retention", (s, dir) => {
      val wk = ev(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts_sec").cast("date")).cast("date").as("wk"))
        .distinct()
      val cohort = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val cells = wk.join(cohort, Seq("user_id"))
        .withColumn("offset_weeks", expr("datediff(wk, cohort_wk) div 7"))
        .groupBy(col("cohort_wk"), col("offset_weeks"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val w0 = Window.partitionBy(col("cohort_wk"))
      cells
        .withColumn("cohort_n",
          max(when(col("offset_weeks") === 0, col("n_users"))).over(w0))
        .select(col("cohort_wk"), col("offset_weeks"), col("n_users"),
          (round((col("n_users").cast("double") / col("cohort_n").cast("double"))
            * 10000) / 10000).as("pct"))
        .orderBy(col("cohort_wk").asc_nulls_last,
          col("offset_weeks").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         wk AS (
           SELECT DISTINCT user_id,
                  date_trunc('week', CAST(ts_sec AS DATE)) AS wk
           FROM e),
         cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM wk GROUP BY 1),
         cells AS (
           SELECT c.cohort_wk, date_diff('day', c.cohort_wk, w.wk) // 7
                    AS offset_weeks,
                  count(DISTINCT w.user_id) AS n_users
           FROM wk w JOIN cohort c ON w.user_id = c.user_id
           GROUP BY 1, 2)
         SELECT cohort_wk, offset_weeks, n_users,
                (round((CAST(n_users AS DOUBLE) /
                  CAST(max(CASE WHEN offset_weeks = 0 THEN n_users END)
                    OVER (PARTITION BY cohort_wk) AS DOUBLE))*10000)/10000)
                  AS pct
         FROM cells
         ORDER BY cohort_wk ASC NULLS LAST, offset_weeks ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W6
    // Longest consecutive-day streak per user (gaps-and-islands): the
    // island key is day-number minus per-user row_number — consecutive
    // days share it, any gap starts a new island — so streaks fall out
    // of ONE user-keyed window pass plus two integer-exact aggregates,
    // never a self-join or recursion. At 100 TB everything after the
    // (user, day) dedup is keyed by user and reuses that one shuffle.
    QueryDef("w6_streaks", (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
      val daily = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_sec").cast("date").as("day"))
        .distinct()
      daily
        .withColumn("island",
          datediff(col("day"), lit("2024-01-01").cast("date"))
            - row_number().over(w))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum(col("len")).as("active_days"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT DISTINCT user_id, CAST(ts_sec AS DATE) AS day
           FROM e WHERE event_type = 'purchase'),
         isl AS (
           SELECT user_id,
                  date_diff('day', DATE '2024-01-01', day)
                    - row_number() OVER (PARTITION BY user_id
                        ORDER BY day ASC) AS island
           FROM daily),
         runs AS (
           SELECT user_id, island, count(*) AS len
           FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
                count(*) AS n_streaks,
                CAST(sum(len) AS BIGINT) AS active_days
         FROM runs GROUP BY user_id
         ORDER BY user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T11
    // dbt microbatch incremental strategy (dbt 1.9 `incremental_strategy:
    // microbatch`): the load window splits into event-time day batches,
    // each batch recomputes its slice of the daily mart independently and
    // lands via a window-scoped REPLACE WHERE — so a batch retry is
    // idempotent (proven here by re-running the Jan-3 batch; the final
    // state is unchanged, which the full-recompute oracle certifies).
    // Scale shape: the target is PARTITIONED BY day, so each batch's
    // replaceWhere touches exactly one partition's files (copy-on-write of
    // that day only, never the table), each batch reads only its day slice
    // of the source (partition-prunable filter), and failed days re-run
    // without coordination — the point of microbatch at 100 TB: no single
    // giant MERGE, bounded per-batch state, per-day backfill.
    QueryDef("t11_microbatch", (s, dir) => {
      import graft.sources.DeltaLite
      val path = graft.TempDirs.fresh("t11_delta")
      val days = (1 to 5).map(d => f"2024-01-$d%02d")
      def batch(day: String): DataFrame = ev(s, dir)
        .withColumn("day", col("ts_sec").cast("date"))
        .filter(col("day") === lit(day).cast("date"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          (round(sum(col("value")) * 100) / 100).as("total_value"))
      DeltaLite.create(s, path, batch(days.head), partitionBy = Seq("day"),
        properties = Map("graft.optimizeWrite" -> "true"))
      days.tail.foreach { d =>
        DeltaLite.replaceWhere(s, path,
          col("day") === lit(d).cast("date"), batch(d))
      }
      // retried batch: same window, same input → same final state
      DeltaLite.replaceWhere(s, path,
        col("day") === lit("2024-01-03").cast("date"), batch("2024-01-03"))
      DeltaLite.read(s, path)
        .select(col("day"), col("event_type"), col("n_events"),
          col("total_value"))
        .orderBy(col("day").asc_nulls_last, col("event_type").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv)
         SELECT CAST(ts_sec AS DATE) AS day, event_type,
                count(*) AS n_events,
                (round((sum(value))*100)/100) AS total_value
         FROM e
         WHERE CAST(ts_sec AS DATE) >= DATE '2024-01-01'
           AND CAST(ts_sec AS DATE) <= DATE '2024-01-05'
         GROUP BY 1, 2
         ORDER BY day ASC NULLS LAST, event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T14
    // Late-arrival audit — the census that sizes a pipeline's watermark:
    // with event_id as the arrival order, a row is LATE when its event
    // time is behind the running maximum event time already arrived, and
    // its lag is the gap to that high-water mark. One arrival-ordered
    // window pass (running max over epoch seconds, integer-exact) feeds
    // a per-day census: late fraction and worst lag — exactly the
    // numbers that justify `withWatermark("ts", X)` in the streaming
    // twins. The running max is DISTRIBUTED two-phase (the p11 move,
    // adapted from rank to max): arrival order splits into ≤32
    // CONTIGUOUS event_id blocks, each block computes its own running
    // max in parallel, and the global high-water mark is
    // greatest(prefix max of all strictly-earlier blocks, in-block
    // running max) — prefix maxes live on a ≤32-row frame, the only
    // thing that ever single-partitions. At 100 TB the block count is
    // the parallelism knob (or the physical ingest shard id); no plan
    // node ever moves the corpus to one partition.
    QueryDef("t14_late_audit", (s, dir) => {
      val base = ev(s, dir)
        .withColumn("ts_e", unix_timestamp(col("ts_sec")))
      // block bounds via ONE bounded driver collect (1 row, 2 scalars —
      // the l3_kmeans codebook discipline): riding them as literals
      // instead of a crossJoin'd 1-row frame halves the event scans,
      // since both the in-block window branch and the prefix branch
      // would otherwise recompute the bounds aggregate
      val bRow = base.agg(
        expr("CAST(min(event_id) AS BIGINT)").as("lo"),
        greatest(lit(1L), ceil((max(col("event_id")) - min(col("event_id"))
          + lit(1)).cast("double") / 32.0D).cast("long")).as("blk"))
        .collect()(0)
      val (lo, blk) =
        if (bRow.isNullAt(0)) (0L, 1L) else (bRow.getLong(0), bRow.getLong(1))
      val sharded = base
        .withColumn("shard",
          expr(s"CAST(event_id - ${lo}L AS BIGINT) div ${blk}L"))
      val iw = Window.partitionBy(col("shard")).orderBy(col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = sharded.withColumn("hwm_in", max(col("ts_e")).over(iw))
      val ow = Window.orderBy(col("shard").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = within.groupBy(col("shard"))
        .agg(max(col("ts_e")).as("smax"))
        .withColumn("pmax", max(col("smax")).over(ow))
        .select(col("shard"), col("pmax"))
      within.join(broadcast(prefix), Seq("shard"))
        .withColumn("hwm",
          greatest(col("hwm_in"), coalesce(col("pmax"), col("hwm_in"))))
        .select(col("ts_sec").cast("date").as("day"),
          (col("hwm") - col("ts_e")).as("lag_s"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("lag_s") > 0, 1L).otherwise(0L)).as("n_late"),
          max(col("lag_s")).as("max_lag_s"),
          (round((sum(when(col("lag_s") > 0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double")) * 10000) / 10000)
            .as("late_frac"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         o AS (
           SELECT CAST(ts_sec AS DATE) AS day,
                  CAST(epoch(ts_sec) AS BIGINT) AS ts_e,
                  max(CAST(epoch(ts_sec) AS BIGINT)) OVER (
                    ORDER BY event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS hwm
           FROM e)
         SELECT day, count(*) AS n_events,
                CAST(sum(CASE WHEN hwm - ts_e > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_late,
                max(hwm - ts_e) AS max_lag_s,
                (round((CAST(sum(CASE WHEN hwm - ts_e > 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE))*10000)/10000)
                  AS late_frac
         FROM o GROUP BY day
         ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ J14
    // Point-in-time (PIT) join against SCD2 validity intervals — THE
    // warehouse temporal join: each purchase picks the dimension version
    // that was valid AT its timestamp (valid_from <= ts < valid_to, open
    // current interval). The dimension is the same SCD2 build as
    // s9_scd2_snapshot; the join is EQUALITY on the key with the
    // interval residual — intervals partition time per key, so at most
    // one version matches and the join never fans out. At 100 TB this
    // keyed-equality + residual form shuffles each side once on user_id
    // (the AsOfJoin union+window rewrite is the equivalent single-
    // shuffle formulation when the dimension is too hot to hash-join).
    // Purchases before a user's first version report state 'none'.
    QueryDef("j14_pit_scd2", (s, dir) => {
      import graft.operators.Scd2
      val deduped = ev(s, dir)
        .groupBy(col("user_id"), col("ts_sec"))
        .agg(max_by(col("event_type"), col("event_id")).as("event_type"),
          max_by(col("value"), col("event_id")).as("value"))
        .select(col("user_id"), col("event_type"), col("value"),
          col("ts_sec"))
      // the dimension tracks the user's BROWSING state (non-purchase
      // events) so each purchase joins the state it happened DURING —
      // a dimension containing the facts themselves would degenerately
      // self-match at every row
      val dim = Scd2.build(
        deduped.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("event_type"), col("ts_sec")),
        keys = Seq("user_id"), ts = "ts_sec", attrs = Seq("event_type"))
        .select(col("user_id").as("d_user"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"))
      val purchases = deduped.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_sec"), col("value"))
      purchases
        .join(dim,
          col("user_id") === col("d_user") &&
            col("valid_from") <= col("ts_sec") &&
            (col("valid_to").isNull || col("ts_sec") < col("valid_to")),
          "left")
        .groupBy(coalesce(col("state"), lit("none")).as("state_at_purchase"))
        .agg(count(lit(1)).as("n_purchases"),
          (round((sum(col("value")))*100)/100).as("total_value"))
        .orderBy(col("state_at_purchase").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         d AS (
           SELECT user_id, event_type, value, ts_sec FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, ts_sec
                         ORDER BY event_id DESC) AS rn FROM e)
           WHERE rn = 1),
         flagged AS (
           SELECT user_id, event_type, ts_sec,
                  (lag(ts_sec) OVER w IS NULL
                   OR event_type IS DISTINCT FROM lag(event_type) OVER w)
                    AS is_change
           FROM (SELECT * FROM d WHERE event_type <> 'purchase')
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec ASC)),
         dim AS (
           SELECT user_id AS d_user, event_type AS state,
                  ts_sec AS valid_from,
                  lead(ts_sec) OVER (PARTITION BY user_id
                    ORDER BY ts_sec ASC) AS valid_to
           FROM (SELECT user_id, event_type, ts_sec FROM flagged
                 WHERE is_change)),
         p AS (SELECT user_id, ts_sec, value FROM d
               WHERE event_type = 'purchase')
         SELECT COALESCE(dim.state, 'none') AS state_at_purchase,
                count(*) AS n_purchases,
                (round((sum(p.value))*100)/100) AS total_value
         FROM p LEFT JOIN dim
           ON p.user_id = dim.d_user
          AND dim.valid_from <= p.ts_sec
          AND (dim.valid_to IS NULL OR p.ts_sec < dim.valid_to)
         GROUP BY 1
         ORDER BY state_at_purchase ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T12
    // Time-series LINEAR interpolation (the resample().interpolate() of
    // the pandas world): per-user daily purchase totals densified onto the
    // user's own calendar (same spine build as t8), with missing days
    // filled by the straight line between the PREVIOUS and NEXT observed
    // values — prev/next arrive via one last(ignoreNulls)-backward and one
    // first(ignoreNulls)-forward window over a single (user, day) sort,
    // so the whole interpolation is TWO frame passes over one shuffle,
    // never a self-join against the observation set. Edge days before the
    // first / after the last observation coalesce to the nearest observed
    // value. Parity: observed values round to cents BEFORE interpolating;
    // the line arithmetic is textually mirrored and rounds to 4dp.
    QueryDef("t12_interpolate", (s, dir) => {
      val daily = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_sec").cast("date").as("day"))
        .agg((round(sum(col("value")) * 100) / 100).as("day_value"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
      val wb = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("pv", last(col("day_value"), ignoreNulls = true).over(wb))
        .withColumn("pd", last(when(col("day_value").isNotNull, col("day")),
          ignoreNulls = true).over(wb))
        .withColumn("nv", first(col("day_value"), ignoreNulls = true).over(wf))
        .withColumn("nd", first(when(col("day_value").isNotNull, col("day")),
          ignoreNulls = true).over(wf))
        .select(col("user_id"), col("day"),
          (round(when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .when(col("nd") === col("pd"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * (datediff(col("day"), col("pd")).cast("double")
                / datediff(col("nd"), col("pd")).cast("double")))
            * 10000) / 10000).as("interp_value"),
          col("day_value").isNull.as("is_interpolated"))
        .orderBy(col("user_id").asc_nulls_last, col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT user_id, CAST(ts_sec AS DATE) AS day,
                  (round((sum(value))*100)/100) AS day_value
           FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
         span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                  FROM daily GROUP BY 1),
         grid AS (
           SELECT user_id,
                  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
           FROM span),
         j AS (
           SELECT g.user_id, g.day, d.day_value,
                  last_value(d.day_value IGNORE NULLS) OVER (
                    PARTITION BY g.user_id ORDER BY g.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                  last_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
                    IGNORE NULLS) OVER (
                    PARTITION BY g.user_id ORDER BY g.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                  first_value(d.day_value IGNORE NULLS) OVER (
                    PARTITION BY g.user_id ORDER BY g.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
                    IGNORE NULLS) OVER (
                    PARTITION BY g.user_id ORDER BY g.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           FROM grid g LEFT JOIN daily d
             ON g.user_id = d.user_id AND g.day = d.day)
         SELECT user_id, day,
                (round((CASE WHEN pv IS NULL THEN nv
                             WHEN nv IS NULL THEN pv
                             WHEN nd = pd THEN pv
                             ELSE pv + (nv - pv)
                               * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                 / CAST(date_diff('day', pd, nd) AS DOUBLE))
                        END)*10000)/10000) AS interp_value,
                day_value IS NULL AS is_interpolated
         FROM j
         ORDER BY user_id ASC NULLS LAST, day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T13
    // Exponentially-weighted moving average (α = 0.3) over per-type daily
    // totals — the monitoring/trend smoother. Engine-parity form: weights
    // (0.7)^k over the last 6 observations expand to the INTEGER lattice
    // 7^k·10^(5-k) (common denominator 10^5), values are BIGINT cents, so
    // numerator and denominator are exact integer window-band sums and the
    // ONLY float op is the final division (rounded 4dp) — no pow(), no
    // float accumulation order anywhere. The band self-join (b.rn between
    // a.rn-5 and a.rn) is an EQUALITY join on the series key with a band
    // residual; at 100 TB each series' band pairs are O(6·len) rows keyed
    // and shuffled once — the window-frame shape without needing a
    // position-dependent weight inside a frame aggregate (which SQL frames
    // cannot express).
    QueryDef("t13_ewma", (s, dir) => {
      val daily = ev(s, dir)
        .filter(col("event_type").isin("purchase", "view", "click"))
        .groupBy(col("event_type"), col("ts_sec").cast("date").as("day"))
        .agg(expr("CAST(round((sum(value))*100) AS BIGINT)").as("v_c"))
      val wn = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val rnk = daily.withColumn("rn", row_number().over(wn))
      val a = rnk.select(col("event_type"), col("day"), col("rn"))
      val b = rnk.select(col("event_type").as("b_type"),
        col("rn").as("b_rn"), col("v_c"))
      val wExpr = "CASE a_k WHEN 0 THEN 100000 WHEN 1 THEN 70000 " +
        "WHEN 2 THEN 49000 WHEN 3 THEN 34300 WHEN 4 THEN 24010 " +
        "ELSE 16807 END"
      a.join(b, col("event_type") === col("b_type") &&
          col("b_rn").between(col("rn") - 5, col("rn")))
        .withColumn("a_k", col("rn") - col("b_rn"))
        .withColumn("w", expr(wExpr))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("v_c") * col("w")).as("num"),
          sum(col("w")).as("den"))
        .select(col("event_type"), col("day"),
          (round((col("num").cast("double") / col("den").cast("double")
            / 100.0) * 10000) / 10000).as("ewma"))
        .orderBy(col("event_type").asc_nulls_last, col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT event_type, CAST(ts_sec AS DATE) AS day,
                  CAST(round((sum(value))*100) AS BIGINT) AS v_c
           FROM e WHERE event_type IN ('purchase', 'view', 'click')
           GROUP BY 1, 2),
         rnk AS (
           SELECT event_type, day, v_c,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY day ASC) AS rn
           FROM daily),
         band AS (
           SELECT a.event_type, a.day, b.v_c, a.rn - b.rn AS a_k
           FROM rnk a JOIN rnk b
             ON a.event_type = b.event_type
            AND b.rn BETWEEN a.rn - 5 AND a.rn),
         agg AS (
           SELECT event_type, day,
                  CAST(sum(v_c * (CASE a_k WHEN 0 THEN 100000
                    WHEN 1 THEN 70000 WHEN 2 THEN 49000 WHEN 3 THEN 34300
                    WHEN 4 THEN 24010 ELSE 16807 END)) AS BIGINT) AS num,
                  CAST(sum(CASE a_k WHEN 0 THEN 100000
                    WHEN 1 THEN 70000 WHEN 2 THEN 49000 WHEN 3 THEN 34300
                    WHEN 4 THEN 24010 ELSE 16807 END) AS BIGINT) AS den
           FROM band GROUP BY 1, 2)
         SELECT event_type, day,
                (round((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                  / 100.0)*10000)/10000) AS ewma
         FROM agg
         ORDER BY event_type ASC NULLS LAST, day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T15
    // OHLC resampling — the canonical time-series downsample (open/high/
    // low/close per bucket): open/close are min_by/max_by on the RAW µs
    // timestamp, which is unique per user in the fixtures (pinned by the
    // oracle's identical arg_min/arg_max), so no tie-break machinery is
    // needed; values are exact BIGINT cents. ONE hash aggregate — the
    // partial side already collapses each (user, hour) to a single
    // running OHLC tuple, so the exchange carries buckets, not events;
    // at 100 TB this is the scan-bandwidth-bound shape, same as any
    // mergeable rollup (min_by/max_by partials merge associatively).
    QueryDef("t15_ohlc", (s, dir) => {
      ev(s, dir)
        .where(col("user_id") < 50)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
          round(col("value") * 100).cast("long").as("cents"), col("ts"))
        .groupBy(col("user_id"), col("hr"))
        .agg(min_by(col("cents"), col("ts")).as("open"),
          max(col("cents")).as("high"),
          min(col("cents")).as("low"),
          max_by(col("cents"), col("ts")).as("close"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id").asc_nulls_last, col("hr").asc_nulls_last)
    }, Some(
      """WITH e AS (
           SELECT user_id,
                  CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hr,
                  CAST(round(value*100) AS BIGINT) AS cents,
                  CAST(ts AS TIMESTAMP) AS tsx
           FROM events WHERE user_id < 50)
         SELECT user_id, hr,
                arg_min(cents, tsx) AS open,
                max(cents) AS high,
                min(cents) AS low,
                arg_max(cents, tsx) AS close,
                count(*) AS n
         FROM e GROUP BY 1, 2
         ORDER BY user_id ASC NULLS LAST, hr ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T16
    // Seasonal decomposition (classical additive, STL-lite): the daily
    // event series splits into trend (7-day CENTERED moving average),
    // day-of-week seasonal factor (mean residual per weekday), and the
    // seasonally-adjusted remainder — the census a forecasting pipeline
    // runs before modeling. Scale shape: the corpus collapses to the
    // DAILY frame in one keyed agg; every window after that runs over
    // the bounded series (rows = distinct days), never the corpus.
    // Observed counts are BIGINT; the MA sums ≤7 integers (exact in a
    // double regardless of order), so only the per-weekday mean is
    // float-order-sensitive — 6dp rounding absorbs it. Edge days
    // without a full 7-day window are excluded identically via a
    // frame-count guard.
    QueryDef("t16_seasonal_adjust", (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("ts_sec").cast("date").as("day"))
        .agg(count(lit(1)).as("observed"))
      val wMa = Window.orderBy(col("day").asc).rowsBetween(-3, 3)
      val trended = daily
        .withColumn("wn", count(lit(1)).over(wMa))
        .withColumn("trend", expr("round((avg(observed) OVER (ORDER BY day ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))*1000000)/1000000"))
        .filter(col("wn") === 7)
        .withColumn("resid", col("observed") - col("trend"))
        .withColumn("dow", dayofweek(col("day")))
      trended
        .withColumn("seasonal", expr("round((avg(resid) OVER (PARTITION BY dow))*1000000)/1000000"))
        .select(col("day"), col("observed"),
          col("trend"),
          col("seasonal"),
          expr("round((observed - seasonal)*1000000)/1000000").as("adjusted"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT CAST(ts_sec AS DATE) AS day, count(*) AS observed
           FROM e GROUP BY 1),
         t AS (
           SELECT day, observed,
                  count(*) OVER w AS wn,
                  round((avg(observed) OVER w)*1000000)/1000000 AS trend
           FROM daily
           WINDOW w AS (ORDER BY day ASC
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         r AS (
           SELECT day, observed, trend, observed - trend AS resid,
                  CAST(dayofweek(day) + 1 AS INTEGER) AS dow
           FROM t WHERE wn = 7)
         SELECT day, observed, trend,
                round((avg(resid) OVER (PARTITION BY dow))*1000000)/1000000
                  AS seasonal,
                round((observed
                  - round((avg(resid) OVER (PARTITION BY dow))*1000000)/1000000)
                  *1000000)/1000000 AS adjusted
         FROM r
         ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T17
    // CHANGEPOINT DETECTION (offline binary segmentation, single split)
    // over the daily event-count series — the level-shift detector that
    // complements d4's per-day volume anomaly (a changepoint is a
    // REGIME move, not an outlier day). Statistic: the CUSUM deviation
    // |n·S_k − k·T| (prefix sum vs its expected share), INTEGER-exact in
    // BIGINTs so the argmax day is bit-identical across engines — no
    // float variance estimates anywhere. The corpus collapses to the
    // bounded daily frame in ONE keyed agg; prefix sums are a window
    // over that ~30-row series (the t16 pattern — a single-partition
    // window over an already-aggregated bounded frame, never over the
    // corpus). At 100 TB the daily frame stays tiny no matter the event
    // volume; multi-changepoint = recurse on the two halves.
    QueryDef("t17_changepoint", (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("ts_sec").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val wOrd = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = daily
        .withColumn("k",
          row_number().over(Window.orderBy(col("day").asc)).cast("long"))
        .withColumn("s_k", sum(col("x")).over(wOrd))
        .crossJoin(broadcast(daily.agg(
          sum(col("x")).as("t_sum"), count(lit(1)).as("n"))))
        // scaled deviation: |n*S_k - k*T| — exact BIGINT, no division
        .withColumn("dev", abs(col("n") * col("s_k") - col("k") * col("t_sum")))
        // the last position is not a valid split (right side empty)
        .withColumn("dev", when(col("k") === col("n"), lit(0L))
          .otherwise(col("dev")))
      val best = broadcast(scored
        .orderBy(col("dev").desc, col("day").asc).limit(1)
        .select(col("day").as("cp_day"), col("dev").as("cp_dev")))
      scored.crossJoin(best)
        .select(col("day"), col("x"), col("k"), col("s_k"), col("dev"),
          (col("day") === col("cp_day")).as("is_changepoint"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT CAST(ts_sec AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM e GROUP BY 1),
         tot AS (
           SELECT CAST(sum(x) AS BIGINT) AS t_sum,
                  CAST(count(*) AS BIGINT) AS n
           FROM daily),
         scored AS (
           SELECT day, x,
                  CAST(row_number() OVER (ORDER BY day ASC) AS BIGINT) AS k,
                  CAST(sum(x) OVER (ORDER BY day ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS s_k,
                  t_sum, n
           FROM daily CROSS JOIN tot),
         dev AS (
           SELECT day, x, k, s_k,
                  CASE WHEN k = n THEN CAST(0 AS BIGINT)
                       ELSE abs(n * s_k - k * t_sum) END AS dev
           FROM scored),
         best AS (
           SELECT day AS cp_day FROM dev
           ORDER BY dev DESC, day ASC LIMIT 1)
         SELECT day, x, k, s_k, dev,
                (day = (SELECT cp_day FROM best)) AS is_changepoint
         FROM dev
         ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T18
    // TIME-WEIGHTED AVERAGE over irregular samples — the correct mean
    // for event-sampled signals (a value "holds" until the next
    // observation; the arithmetic mean over-weights bursts). Per user:
    // weight each value by the seconds until that user's next event
    // (lead over one user-keyed sort — ONE shuffle), last event carries
    // no interval and drops out. Values ride as exact cents-BIGINTs so
    // the weighted sum is integer-exact and partial-agg order cannot
    // perturb it (sum order over doubles differs between engines); ONE
    // IEEE division + round at the very end. At 100 TB this is a
    // map-side lead + keyed agg — the same one-pass shape as t13's
    // EWMA, no self-joins.
    QueryDef("t18_time_weighted_avg", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      ev(s, dir)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("w_sec",
          (unix_timestamp(lead(col("ts_sec"), 1).over(w))
            - unix_timestamp(col("ts_sec"))).cast("long"))
        .filter(col("w_sec").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("w_sec")).as("span_sec"),
          sum(col("cents") * col("w_sec")).as("wsum"))
        .withColumn("twa", expr(
          "round((CAST(wsum AS DOUBLE) / CAST(span_sec AS DOUBLE) / 100.0D) * 1000000) / 1000000"))
        .select(col("user_id"), col("n_intervals"), col("span_sec"),
          col("twa"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         iv AS (
           SELECT user_id,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  CAST(epoch(lead(ts_sec, 1) OVER (PARTITION BY user_id
                      ORDER BY ts_sec ASC, event_id ASC))
                    - epoch(ts_sec) AS BIGINT) AS w_sec
           FROM e)
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_intervals,
                CAST(sum(w_sec) AS BIGINT) AS span_sec,
                round((CAST(sum(cents * w_sec) AS DOUBLE)
                  / CAST(sum(w_sec) AS DOUBLE) / 100.0) * 1000000) / 1000000
                  AS twa
         FROM iv WHERE w_sec IS NOT NULL
         GROUP BY user_id
         ORDER BY user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T19
    // HOLT LINEAR (double-exponential) smoothing — t13's EWMA tracks a
    // LEVEL; Holt adds a coupled TREND so the forecast extrapolates
    // instead of lagging a drifting series. The coupled recursion
    // (level_t needs trend_{t-1} and vice versa) has NO closed form, so
    // it cannot be a window expression. SPLIT BY NATURE OF THE WORK:
    // the DISTRIBUTED part collapses the corpus to the bounded daily
    // frame in one keyed agg (O(events), scales out); the SEQUENTIAL
    // part — the recursion itself, which NO engine can parallelize —
    // runs as a driver loop over the COLLECTED bounded frame (O(days):
    // ~30 here, thousands over years; bounded by the observation span,
    // never by data volume). The earlier recursive-CTE spelling was
    // semantically identical but paid ~30 sequential Spark-job
    // schedulings (~40 s of pure scheduler latency — the whole suite's
    // makespan pole); o8_recursive_cte keeps the genuine recursive-CTE
    // surface. Each step is the same fixed IEEE double expression the
    // oracle's CTE evaluates, in the same order → bit-identical
    // trajectories; display rounding stays in Spark SQL (same codepath
    // both sides). At 100 TB per-series Holt over many keys becomes a
    // per-key sequential fold inside the executors (each series
    // bounded); the single-series query is driver-bounded work.
    QueryDef("t19_holt_linear", (s, dir) => {
      Tables.registerAll(s, dir)
      val daily = s.sql(
        """SELECT CAST(date_trunc('second', ts) AS DATE) AS day,
                  CAST(count(*) AS DOUBLE) AS x
           FROM events GROUP BY 1 ORDER BY 1""").collect()
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      // base case mirrors the CTE's `a.k = 1 AND b.k = 2` join: fewer
      // than 2 days → empty result, exactly like the SQL
      if (daily.length >= 2) {
        var level = daily(0).getDouble(1)
        var trend = daily(1).getDouble(1) - level
        out += org.apache.spark.sql.Row(
          daily(0).getDate(0), daily(0).getDouble(1), level, trend)
        var i = 1
        while (i < daily.length) {
          val x = daily(i).getDouble(1)
          val nl = 0.5 * x + 0.5 * (level + trend)
          val nt = 0.3 * (nl - level) + 0.7 * trend
          level = nl; trend = nt
          out += org.apache.spark.sql.Row(daily(i).getDate(0), x, level, trend)
          i += 1
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("day",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("level_raw",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("trend_raw",
          org.apache.spark.sql.types.DoubleType)))
      s.createDataFrame(new java.util.ArrayList(
        scala.jdk.CollectionConverters.BufferHasAsJava(out).asJava), schema)
        .select(col("day"),
          expr("CAST(x AS BIGINT)").as("observed"),
          expr("round(level_raw * 1000000) / 1000000").as("level"),
          expr("round(trend_raw * 1000000) / 1000000").as("trend"),
          expr("round((level_raw + 3 * trend_raw) * 1000000) / 1000000")
            .as("forecast_3d"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      """WITH RECURSIVE daily AS (
           SELECT CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS day,
                  CAST(count(*) AS DOUBLE) AS x,
                  CAST(row_number() OVER
                    (ORDER BY CAST(date_trunc('second', CAST(ts AS TIMESTAMP))
                       AS DATE)) AS BIGINT) AS k
           FROM events GROUP BY 1),
         holt AS (
           SELECT a.day, a.x, a.k,
                  a.x AS level, b.x - a.x AS trend
           FROM daily a JOIN daily b ON a.k = 1 AND b.k = 2
           UNION ALL
           SELECT d.day, d.x, d.k,
                  0.5 * d.x + 0.5 * (h.level + h.trend) AS level,
                  0.3 * ((0.5 * d.x + 0.5 * (h.level + h.trend))
                    - h.level) + 0.7 * h.trend AS trend
           FROM holt h JOIN daily d ON d.k = h.k + 1)
         SELECT day, CAST(x AS BIGINT) AS observed,
                round(level * 1000000) / 1000000 AS level,
                round(trend * 1000000) / 1000000 AS trend,
                round((level + 3 * trend) * 1000000) / 1000000 AS forecast_3d
         FROM holt ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T26
    // HOLT-WINTERS additive seasonal smoothing (weekly m=7) over the
    // daily event counts — t19's level/trend recursion plus a seasonal
    // component: level' = α(x − s_head) + (1−α)(level+trend), trend' =
    // β(level'−level) + (1−β)trend, s_new = γ(x − level') + (1−γ)s_head,
    // zero-seeded seasonals (the first week's updates fill them — a
    // deterministic, engine-mirrorable initialization). The 7 seasonal
    // slots ride the recursion as a ROTATING tuple (s1 applies today,
    // s7 is 7 days out), so the oracle is a plain recursive CTE carrying
    // 7 extra columns — no arrays, no lag-7 self-join. Engine parity is
    // t19's: every step is the identical IEEE double tree on both sides
    // (the Spark side runs the collected BOUNDED daily frame through a
    // driver loop — ≤ observation days, the t19/t25 makespan move; the
    // distributed work is the one daily rollup), so trajectories match
    // bit-exactly and the 6dp display rounding is cosmetic. At 100 TB
    // the corpus collapses to the daily frame in one shuffle; the
    // recursion cost is O(days), independent of corpus size.
    QueryDef("t26_holt_winters", (s, dir) => {
      Tables.registerAll(s, dir)
      val daily = s.sql(
        """SELECT CAST(date_trunc('second', ts) AS DATE) AS day,
                  CAST(count(*) AS DOUBLE) AS x
           FROM events GROUP BY 1 ORDER BY 1""").collect()
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      if (daily.nonEmpty) {
        var level = daily(0).getDouble(1)
        var trend = 0.0
        val sea = Array.fill(7)(0.0) // sea(0) applies to the NEXT day
        out += org.apache.spark.sql.Row(daily(0).getDate(0),
          daily(0).getDouble(1), level, trend, 0.0, level + 7 * trend)
        var i = 1
        while (i < daily.length) {
          val x = daily(i).getDouble(1)
          val sh = sea(0)
          val nl = 0.3 * (x - sh) + 0.7 * (level + trend)
          val nt = 0.1 * (nl - level) + 0.9 * trend
          val sn = 0.2 * (x - nl) + 0.8 * sh
          var j = 0
          while (j < 6) { sea(j) = sea(j + 1); j += 1 }
          sea(6) = sn
          level = nl; trend = nt
          out += org.apache.spark.sql.Row(daily(i).getDate(0), x,
            level, trend, sh, level + 7 * trend + sea(6))
          i += 1
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("day",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("level_raw",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("trend_raw",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("s_app_raw",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("fc_raw",
          org.apache.spark.sql.types.DoubleType)))
      s.createDataFrame(new java.util.ArrayList(
        scala.jdk.CollectionConverters.BufferHasAsJava(out).asJava), schema)
        .select(col("day"),
          expr("CAST(x AS BIGINT)").as("observed"),
          expr("round(level_raw * 1000000) / 1000000").as("level"),
          expr("round(trend_raw * 1000000) / 1000000").as("trend"),
          expr("round(s_app_raw * 1000000) / 1000000").as("seasonal"),
          expr("round(fc_raw * 1000000) / 1000000").as("forecast_7d"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      """WITH RECURSIVE daily AS (
           SELECT CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS day,
                  CAST(count(*) AS DOUBLE) AS x,
                  CAST(row_number() OVER
                    (ORDER BY CAST(date_trunc('second', CAST(ts AS TIMESTAMP))
                       AS DATE)) AS BIGINT) AS k
           FROM events GROUP BY 1),
         hw AS (
           SELECT day, x, k,
                  x AS level, CAST(0 AS DOUBLE) AS trend,
                  CAST(0 AS DOUBLE) AS s1, CAST(0 AS DOUBLE) AS s2,
                  CAST(0 AS DOUBLE) AS s3, CAST(0 AS DOUBLE) AS s4,
                  CAST(0 AS DOUBLE) AS s5, CAST(0 AS DOUBLE) AS s6,
                  CAST(0 AS DOUBLE) AS s7,
                  CAST(0 AS DOUBLE) AS s_app
           FROM daily WHERE k = 1
           UNION ALL
           SELECT d.day, d.x, d.k,
                  0.3 * (d.x - h.s1) + 0.7 * (h.level + h.trend) AS level,
                  0.1 * ((0.3 * (d.x - h.s1) + 0.7 * (h.level + h.trend))
                    - h.level) + 0.9 * h.trend AS trend,
                  h.s2 AS s1, h.s3 AS s2, h.s4 AS s3, h.s5 AS s4,
                  h.s6 AS s5, h.s7 AS s6,
                  0.2 * (d.x - (0.3 * (d.x - h.s1)
                    + 0.7 * (h.level + h.trend))) + 0.8 * h.s1 AS s7,
                  h.s1 AS s_app
           FROM hw h JOIN daily d ON d.k = h.k + 1)
         SELECT day, CAST(x AS BIGINT) AS observed,
                round(level * 1000000) / 1000000 AS level,
                round(trend * 1000000) / 1000000 AS trend,
                round(s_app * 1000000) / 1000000 AS seasonal,
                round((level + 7 * trend + s7) * 1000000) / 1000000
                  AS forecast_7d
         FROM hw ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T27
    // KEYED Holt double-exponential smoothing — the MANY-SERIES form of
    // the recursion family (t13/t19/t26 are single-series driver
    // loops over a calendar-bounded frame; this is the design their
    // comments promised: the per-key fold runs INSIDE executors). Each
    // user's daily event counts fold through the Holt recursion
    //   level' = α·x + (1−α)(level + trend)
    //   trend' = β·(level' − level) + (1−β)·trend
    // via collect_list → array_sort → the `aggregate` higher-order
    // function: ONE user-keyed shuffle, then a sequential fold per key
    // with state = (level, trend, n) and memory bounded by the
    // OBSERVATION SPAN (days), never the corpus — a million users fold
    // in parallel, and the driver never sees a row. Float parity is the
    // t26 discipline: both engines execute the SAME IEEE op order per
    // step (the recursion is inherently sequential), then round once to
    // 1e-6 for display. Oracle = per-key recursive CTE.
    QueryDef("t27_holt_keyed", (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), col("ts_sec").cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      daily.groupBy(col("user_id"))
        .agg(collect_list(struct(col("day"), col("x"))).as("s"))
        .select(col("user_id"), expr(
          """aggregate(array_sort(s),
               named_struct('level', CAST(0.0 AS DOUBLE),
                            'trend', CAST(0.0 AS DOUBLE),
                            'n', CAST(0 AS BIGINT)),
               (acc, e) -> IF(acc.n = 0,
                 named_struct('level', e.x,
                              'trend', CAST(0.0 AS DOUBLE),
                              'n', CAST(1 AS BIGINT)),
                 named_struct(
                   'level', 0.3D * e.x + 0.7D * (acc.level + acc.trend),
                   'trend', 0.1D * ((0.3D * e.x
                              + 0.7D * (acc.level + acc.trend))
                              - acc.level) + 0.9D * acc.trend,
                   'n', acc.n + 1L)))""").as("st"))
        .select(col("user_id"), col("st.n").as("n_days"),
          expr("round(st.level * 1000000) / 1000000").as("level"),
          expr("round(st.trend * 1000000) / 1000000").as("trend"),
          expr("round((st.level + 7 * st.trend) * 1000000) / 1000000")
            .as("forecast_7d"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      s"""WITH RECURSIVE e AS ($oracleEv),
         daily AS (
           SELECT user_id, CAST(ts_sec AS DATE) AS day,
                  CAST(count(*) AS DOUBLE) AS x
           FROM e GROUP BY 1, 2),
         dk AS (
           SELECT user_id, day, x,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY day) AS BIGINT) AS k
           FROM daily),
         h AS (
           SELECT user_id, k, x AS level, CAST(0 AS DOUBLE) AS trend
           FROM dk WHERE k = 1
           UNION ALL
           SELECT d.user_id, d.k,
                  0.3 * d.x + 0.7 * (h.level + h.trend) AS level,
                  0.1 * ((0.3 * d.x + 0.7 * (h.level + h.trend))
                    - h.level) + 0.9 * h.trend AS trend
           FROM h JOIN dk d
             ON d.user_id = h.user_id AND d.k = h.k + 1),
         fin AS (SELECT user_id, max(k) AS n_days FROM h GROUP BY 1)
         SELECT h.user_id, fin.n_days,
                round(h.level * 1000000) / 1000000 AS level,
                round(h.trend * 1000000) / 1000000 AS trend,
                round((h.level + 7 * h.trend) * 1000000) / 1000000
                  AS forecast_7d
         FROM h JOIN fin
           ON h.user_id = fin.user_id AND h.k = fin.n_days
         ORDER BY h.user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T28
    // KEYED Holt-WINTERS — t27's per-key executor fold with t26's
    // additive weekly seasonal component: the 7 seasonal slots ride
    // the fold state as a rotating tuple (s1 applies today, s7 is the
    // newest), exactly t26's recursion per USER. The lambda spells
    // each intermediate (new level) out textually wherever it is
    // reused — higher-order-function lambdas bind no lets, and the
    // oracle's recursive CTE repeats the SAME textual tree, so both
    // engines execute identical IEEE op sequences per step (the t26
    // discipline; one display round at the end). State is a flat
    // 10-field struct per key — O(1) beyond the sorted day array;
    // scale = keys, never driver.
    QueryDef("t28_hw_keyed", (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), col("ts_sec").cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      daily.groupBy(col("user_id"))
        .agg(collect_list(struct(col("day"), col("x"))).as("s"))
        .select(col("user_id"), expr(
          """aggregate(array_sort(s),
               named_struct('level', CAST(0.0 AS DOUBLE),
                 'trend', CAST(0.0 AS DOUBLE),
                 's1', CAST(0.0 AS DOUBLE), 's2', CAST(0.0 AS DOUBLE),
                 's3', CAST(0.0 AS DOUBLE), 's4', CAST(0.0 AS DOUBLE),
                 's5', CAST(0.0 AS DOUBLE), 's6', CAST(0.0 AS DOUBLE),
                 's7', CAST(0.0 AS DOUBLE), 'n', CAST(0 AS BIGINT)),
               (acc, e) -> IF(acc.n = 0,
                 named_struct('level', e.x, 'trend', CAST(0.0 AS DOUBLE),
                   's1', CAST(0.0 AS DOUBLE), 's2', CAST(0.0 AS DOUBLE),
                   's3', CAST(0.0 AS DOUBLE), 's4', CAST(0.0 AS DOUBLE),
                   's5', CAST(0.0 AS DOUBLE), 's6', CAST(0.0 AS DOUBLE),
                   's7', CAST(0.0 AS DOUBLE), 'n', CAST(1 AS BIGINT)),
                 named_struct(
                   'level', 0.3D * (e.x - acc.s1)
                     + 0.7D * (acc.level + acc.trend),
                   'trend', 0.1D * ((0.3D * (e.x - acc.s1)
                       + 0.7D * (acc.level + acc.trend)) - acc.level)
                     + 0.9D * acc.trend,
                   's1', acc.s2, 's2', acc.s3, 's3', acc.s4,
                   's4', acc.s5, 's5', acc.s6, 's6', acc.s7,
                   's7', 0.2D * (e.x - (0.3D * (e.x - acc.s1)
                       + 0.7D * (acc.level + acc.trend)))
                     + 0.8D * acc.s1,
                   'n', acc.n + 1L)))""").as("st"))
        .select(col("user_id"), col("st.n").as("n_days"),
          expr("round(st.level * 1000000) / 1000000").as("level"),
          expr("round(st.trend * 1000000) / 1000000").as("trend"),
          expr("round((st.level + 7 * st.trend + st.s7) * 1000000) " +
            "/ 1000000").as("forecast_7d"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      s"""WITH RECURSIVE e AS ($oracleEv),
         daily AS (
           SELECT user_id, CAST(ts_sec AS DATE) AS day,
                  CAST(count(*) AS DOUBLE) AS x
           FROM e GROUP BY 1, 2),
         dk AS (
           SELECT user_id, day, x,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY day) AS BIGINT) AS k
           FROM daily),
         h AS (
           SELECT user_id, k, x AS level, CAST(0 AS DOUBLE) AS trend,
                  CAST(0 AS DOUBLE) AS s1, CAST(0 AS DOUBLE) AS s2,
                  CAST(0 AS DOUBLE) AS s3, CAST(0 AS DOUBLE) AS s4,
                  CAST(0 AS DOUBLE) AS s5, CAST(0 AS DOUBLE) AS s6,
                  CAST(0 AS DOUBLE) AS s7
           FROM dk WHERE k = 1
           UNION ALL
           SELECT d.user_id, d.k,
                  0.3 * (d.x - h.s1) + 0.7 * (h.level + h.trend) AS level,
                  0.1 * ((0.3 * (d.x - h.s1) + 0.7 * (h.level + h.trend))
                    - h.level) + 0.9 * h.trend AS trend,
                  h.s2 AS s1, h.s3 AS s2, h.s4 AS s3, h.s5 AS s4,
                  h.s6 AS s5, h.s7 AS s6,
                  0.2 * (d.x - (0.3 * (d.x - h.s1)
                    + 0.7 * (h.level + h.trend))) + 0.8 * h.s1 AS s7
           FROM h JOIN dk d
             ON d.user_id = h.user_id AND d.k = h.k + 1),
         fin AS (SELECT user_id, max(k) AS n_days FROM h GROUP BY 1)
         SELECT h.user_id, fin.n_days,
                round(h.level * 1000000) / 1000000 AS level,
                round(h.trend * 1000000) / 1000000 AS trend,
                round((h.level + 7 * h.trend + h.s7) * 1000000) / 1000000
                  AS forecast_7d
         FROM h JOIN fin
           ON h.user_id = fin.user_id AND h.k = fin.n_days
         ORDER BY h.user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T29
    // KEYED FUNNEL STATE MACHINE — the t27/t28 per-key fold generalized
    // from numeric smoothing to an ARBITRARY transition table: per user,
    // events in (ts, event_id) order drive a 4-stage conversion funnel
    // (view → click → signup → purchase; a completed funnel increments
    // the counter and re-arms; `error` resets progress; off-path events
    // keep state). This is inherently sequential per key — a window
    // can't express reset + ordered-progress + re-arm — and the
    // established fold shape handles it: collect_list → array_sort →
    // `aggregate` HOF, state = (stage, completions), one user-keyed
    // shuffle, the sequential scan INSIDE executors, driver never sees
    // a row. ALL-INTEGER state (no IEEE concerns at all — the easiest
    // member of the recursion family); oracle = the same transition
    // table as a per-key recursive CTE over row-numbered events.
    QueryDef("t29_funnel_keyed", (s, dir) => {
      // ts_sec discipline (file header): raw ts is ns in the fixture
      // and us in Spark — ordering on it can diverge between engines;
      // second-floored ts + the unique event_id tiebreak is identical
      // on both sides
      val e = ev(s, dir)
        .select(col("user_id"), col("ts_sec"), col("event_id"),
          col("event_type"))
      e.groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts_sec"), col("event_id"),
          col("event_type"))).as("s"))
        .select(col("user_id"), expr(
          """aggregate(array_sort(s),
               named_struct('st', 0, 'done', CAST(0 AS BIGINT)),
               (acc, e) -> CASE
                 WHEN e.event_type = 'error'
                   THEN named_struct('st', 0, 'done', acc.done)
                 WHEN acc.st = 0 AND e.event_type = 'view'
                   THEN named_struct('st', 1, 'done', acc.done)
                 WHEN acc.st = 1 AND e.event_type = 'click'
                   THEN named_struct('st', 2, 'done', acc.done)
                 WHEN acc.st = 2 AND e.event_type = 'signup'
                   THEN named_struct('st', 3, 'done', acc.done)
                 WHEN acc.st = 3 AND e.event_type = 'purchase'
                   THEN named_struct('st', 0,
                     'done', acc.done + CAST(1 AS BIGINT))
                 ELSE acc END)""").as("fin"))
        .select(col("user_id"), col("fin.done").as("funnels_done"),
          col("fin.st").cast("int").as("end_stage"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      s"""WITH RECURSIVE e AS ($oracleEv),
         ev AS MATERIALIZED (
           SELECT user_id, event_type,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts_sec ASC, event_id ASC) AS BIGINT) AS rn
           FROM e),
         step AS (
           SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS st,
                  CAST(0 AS BIGINT) AS done
           FROM (SELECT DISTINCT user_id FROM ev)
           UNION ALL
           SELECT e.user_id, e.rn,
                  CASE WHEN e.event_type = 'error' THEN 0
                       WHEN s.st = 0 AND e.event_type = 'view' THEN 1
                       WHEN s.st = 1 AND e.event_type = 'click' THEN 2
                       WHEN s.st = 2 AND e.event_type = 'signup' THEN 3
                       WHEN s.st = 3 AND e.event_type = 'purchase' THEN 0
                       ELSE s.st END,
                  CASE WHEN s.st = 3 AND e.event_type = 'purchase'
                       THEN s.done + 1 ELSE s.done END
           FROM step s JOIN ev e
             ON e.user_id = s.user_id AND e.rn = s.rn + 1),
         mx AS (SELECT user_id, max(rn) AS mrn FROM ev GROUP BY 1)
         SELECT s.user_id, s.done AS funnels_done,
                CAST(s.st AS INTEGER) AS end_stage
         FROM step s JOIN mx ON s.user_id = mx.user_id AND s.rn = mx.mrn
         ORDER BY s.user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T30
    // MATCH_RECOGNIZE-lite — t29's transition table, COMPILED: the row
    // pattern "V C+ S? P" (view, one-or-more clicks, optional signup,
    // purchase — strict contiguity over the funnel-relevant event
    // classes) compiles through [[graft.operators.SeqPattern]] into
    // ONE CASE decision tree rendered twice from the same table —
    // into the Spark `aggregate` lambda AND into the oracle's
    // recursive CTE — so engine parity is by construction, for ANY
    // pattern the grammar admits (the ISO row-pattern/Flink-CEP
    // skip-to-next strategy as a per-key executor fold; all-integer
    // state, one user-keyed shuffle, driver never sees a row).
    QueryDef("t30_match_recognize", (s, dir) => {
      val pat = graft.operators.SeqPattern.compile("V C+ S? P")
      val e = ev(s, dir)
        .filter(col("event_type").isin("view", "click", "signup",
          "purchase"))
        .select(col("user_id"), col("ts_sec"), col("event_id"),
          expr("""CASE event_type WHEN 'view' THEN 'V'
                  WHEN 'click' THEN 'C' WHEN 'signup' THEN 'S'
                  ELSE 'P' END""").as("cls"))
      e.groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts_sec"), col("event_id"),
          col("cls"))).as("s"))
        .select(col("user_id"), expr(
          s"""aggregate(array_sort(s),
               named_struct('st', 0, 'done', CAST(0 AS BIGINT)),
               (acc, e) -> named_struct(
                 'st', ${pat.nextStateCase("acc.st", "e.cls")},
                 'done', acc.done +
                   CAST(${pat.emitCase("acc.st", "e.cls")} AS BIGINT)))""")
          .as("fin"))
        .select(col("user_id"), col("fin.done").as("n_matches"),
          col("fin.st").cast("int").as("end_state"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some {
      val pat = graft.operators.SeqPattern.compile("V C+ S? P")
      s"""WITH RECURSIVE e0 AS ($oracleEv),
         ev AS MATERIALIZED (
           SELECT user_id,
                  CASE event_type WHEN 'view' THEN 'V'
                  WHEN 'click' THEN 'C' WHEN 'signup' THEN 'S'
                  ELSE 'P' END AS cls,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts_sec ASC, event_id ASC) AS BIGINT) AS rn
           FROM e0
           WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
         step AS (
           SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS st,
                  CAST(0 AS BIGINT) AS done
           FROM (SELECT DISTINCT user_id FROM ev)
           UNION ALL
           SELECT e.user_id, e.rn,
                  ${pat.nextStateCase("s.st", "e.cls")},
                  s.done + ${pat.emitCase("s.st", "e.cls")}
           FROM step s JOIN ev e
             ON e.user_id = s.user_id AND e.rn = s.rn + 1),
         mx AS (SELECT user_id, max(rn) AS mrn FROM ev GROUP BY 1)
         SELECT s.user_id, s.done AS n_matches,
                CAST(s.st AS INTEGER) AS end_state
         FROM step s JOIN mx ON s.user_id = mx.user_id AND s.rn = mx.mrn
         ORDER BY s.user_id ASC NULLS LAST"""
    }),

    // ------------------------------------------------------------------ T31
    // t30 WITH THE CEP `WITHIN` CLAUSE, oracle-gated — a partial match
    // whose first committed row is more than 24 hours (event time)
    // behind the current row EXPIRES before the row is offered, and a
    // rule-3 restart RE-BASES the window at the restarting row (the
    // compiler's restart-transition marking rendered as a 0/1 CASE —
    // (state, next) alone cannot tell a restart from an absorb). All
    // trees generated from ONE compiled table into both engines; the
    // fold state grows a `ps` slot (partial-start epoch seconds,
    // BIGINT) and every decision stays integer — the streaming twin
    // (Streams.matchPatternWithin) executes the same table through
    // Compiled.step/isRestart.
    QueryDef("t31_match_within", (s, dir) => {
      val pat = graft.operators.SeqPattern.compile("V C+ P")
      // 24 h: measured on the fixtures as the informative window —
      // expiry changes ~2/3 of the no-within outcomes (108 vs 321
      // matches at sf0.01) while plenty survive; 30 min expires ALL
      // (events per user are too sparse) and a week expires none
      val W = 86400L
      // st0 = the state AFTER the within-expiry check, spelled once
      // and repeated textually (HOF lambdas bind no lets; the oracle
      // repeats the same tree)
      val st0 =
        s"(CASE WHEN acc.st > 0 AND e.ts_e - acc.ps > $W THEN 0 " +
          "ELSE acc.st END)"
      val e = ev(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"),
          expr("CAST(unix_timestamp(ts_sec) AS BIGINT)").as("ts_e"),
          col("event_id"),
          expr("""CASE event_type WHEN 'view' THEN 'V'
                  WHEN 'click' THEN 'C' ELSE 'P' END""").as("cls"))
      e.groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts_e"), col("event_id"),
          col("cls"))).as("s"))
        .select(col("user_id"), expr(
          s"""aggregate(array_sort(s),
               named_struct('st', 0, 'done', CAST(0 AS BIGINT),
                            'ps', CAST(0 AS BIGINT)),
               (acc, e) -> named_struct(
                 'st', ${pat.nextStateCase(st0, "e.cls")},
                 'done', acc.done +
                   CAST(${pat.emitCase(st0, "e.cls")} AS BIGINT),
                 'ps', CASE
                   WHEN ${pat.nextStateCase(st0, "e.cls")} = 0
                     THEN CAST(0 AS BIGINT)
                   WHEN $st0 = 0 OR ${pat.restartCase(st0, "e.cls")} = 1
                     THEN e.ts_e
                   ELSE acc.ps END))""").as("fin"))
        .select(col("user_id"), col("fin.done").as("n_matches"),
          col("fin.st").cast("int").as("end_state"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some {
      val pat = graft.operators.SeqPattern.compile("V C+ P")
      val W = 86400L
      val st0 =
        s"(CASE WHEN s.st > 0 AND e.ts_e - s.ps > $W THEN 0 " +
          "ELSE s.st END)"
      s"""WITH RECURSIVE e0 AS ($oracleEpochEv),
         ev AS MATERIALIZED (
           SELECT user_id, ts_e,
                  CASE event_type WHEN 'view' THEN 'V'
                  WHEN 'click' THEN 'C' ELSE 'P' END AS cls,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts_e ASC, event_id ASC) AS BIGINT) AS rn
           FROM e0
           WHERE event_type IN ('view', 'click', 'purchase')),
         step AS (
           SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS st,
                  CAST(0 AS BIGINT) AS done, CAST(0 AS BIGINT) AS ps
           FROM (SELECT DISTINCT user_id FROM ev)
           UNION ALL
           SELECT e.user_id, e.rn,
                  ${pat.nextStateCase(st0, "e.cls")},
                  s.done + ${pat.emitCase(st0, "e.cls")},
                  CASE
                    WHEN ${pat.nextStateCase(st0, "e.cls")} = 0
                      THEN CAST(0 AS BIGINT)
                    WHEN $st0 = 0 OR ${pat.restartCase(st0, "e.cls")} = 1
                      THEN e.ts_e
                    ELSE s.ps END
           FROM step s JOIN ev e
             ON e.user_id = s.user_id AND e.rn = s.rn + 1),
         mx AS (SELECT user_id, max(rn) AS mrn FROM ev GROUP BY 1)
         SELECT s.user_id, s.done AS n_matches,
                CAST(s.st AS INTEGER) AS end_state
         FROM step s JOIN mx ON s.user_id = mx.user_id AND s.rn = mx.mrn
         ORDER BY s.user_id ASC NULLS LAST"""
    }),

    // ------------------------------------------------------------------ T24
    // SLO ERROR-BUDGET BURN RATE — the SRE alerting staple over the
    // event stream: per hour, error share vs a 1% SLO in exact ppm,
    // the rolling-6h burn rate (how many times faster than allowed the
    // budget is burning — the multiwindow-burn-alert number), and the
    // month-to-date budget consumed. ALL integer until display: shares
    // as error·1e6 div total, burn = share div SLO share, cumulative
    // budget from running sums — threshold compares on BIGINTs, alerts
    // can't ulp-flip. One hour-keyed agg collapses the corpus; windows
    // run over the bounded hourly frame (t16 discipline).
    QueryDef("t24_slo_burn", (s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(date_trunc("hour", col("ts_sec")).as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_err"))
      val w6 = Window.orderBy(col("hour").asc).rowsBetween(-5, 0)
      val wCum = Window.orderBy(col("hour").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourly
        .withColumn("err_ppm", expr("n_err * 1000000L div n"))
        .withColumn("burn_6h_x100", expr(
          "(sum(n_err) OVER (ORDER BY hour ASC ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)) * 100L * 100L div (sum(n) OVER (ORDER BY hour ASC ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))"))
        .withColumn("budget_used_ppm", expr(
          "(sum(n_err) OVER (ORDER BY hour ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100L * 1000000L div (sum(n) OVER (ORDER BY hour ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"))
        .select(col("hour"), col("n"), col("n_err"), col("err_ppm"),
          col("burn_6h_x100"),
          (col("burn_6h_x100") > 200L).as("page_alert"),
          col("budget_used_ppm"))
        .orderBy(col("hour").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         hourly AS (
           SELECT CAST(date_trunc('hour', ts_sec) AS TIMESTAMP) AS hour,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                    END) AS BIGINT) AS n_err
           FROM e GROUP BY 1)
         SELECT hour, n, n_err,
                CAST((n_err * 1000000) // n AS BIGINT) AS err_ppm,
                CAST((sum(n_err) OVER w6) * 100 * 100
                  // (sum(n) OVER w6) AS BIGINT) AS burn_6h_x100,
                ((sum(n_err) OVER w6) * 100 * 100
                  // (sum(n) OVER w6)) > 200 AS page_alert,
                CAST((sum(n_err) OVER wc) * 100 * 1000000
                  // (sum(n) OVER wc) AS BIGINT) AS budget_used_ppm
         FROM hourly
         WINDOW w6 AS (ORDER BY hour ASC
             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
           wc AS (ORDER BY hour ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY hour ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T23
    // INTERARRIVAL BURSTINESS — the queueing-theory census per event
    // type: coefficient of variation of inter-event gaps and the
    // Goh-Barabási burstiness index B = (CV−1)/(CV+1) (−1 periodic, 0
    // Poisson, →1 bursty). Gaps are exact integer seconds from ONE
    // type-keyed lead sort; CV derives from three exact BIGINT
    // sufficient stats (n, Σg, Σg²) — the a24/a26 discipline, so B is
    // a fixed IEEE tree. What it's for: capacity planning reads CV
    // directly; a B shift flags upstream batching/retry storms before
    // volume alarms (d4) move.
    QueryDef("t23_interarrival_burstiness", (s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      ev(s, dir)
        .withColumn("gap",
          (unix_timestamp(col("ts_sec"))
            - unix_timestamp(lag(col("ts_sec"), 1).over(w))).cast("long"))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("sum_g"),
          sum(col("gap") * col("gap")).as("sum_g2"))
        .withColumn("mean_gap_sec", expr(
          "round((CAST(sum_g AS DOUBLE) / n_gaps) * 100) / 100"))
        .withColumn("cv", expr(
          """round((sqrt((CAST(sum_g2 AS DOUBLE)
               - CAST(sum_g AS DOUBLE) * sum_g / n_gaps) / n_gaps)
               / (CAST(sum_g AS DOUBLE) / n_gaps)) * 1000000) / 1000000"""))
        .withColumn("burstiness", expr(
          "round(((cv - 1.0D) / (cv + 1.0D)) * 1000000) / 1000000"))
        .select(col("event_type"), col("n_gaps"), col("mean_gap_sec"),
          col("cv"), col("burstiness"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         gaps AS (
           SELECT event_type,
                  CAST(date_diff('second',
                    lag(ts_sec) OVER (PARTITION BY event_type
                      ORDER BY ts_sec ASC, event_id ASC), ts_sec)
                    AS BIGINT) AS gap
           FROM e),
         st AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
                  CAST(sum(gap) AS BIGINT) AS sum_g,
                  CAST(sum(gap * gap) AS BIGINT) AS sum_g2
           FROM gaps WHERE gap IS NOT NULL
           GROUP BY 1),
         m AS (
           SELECT event_type, n_gaps,
                  round((CAST(sum_g AS DOUBLE) / n_gaps) * 100) / 100
                    AS mean_gap_sec,
                  round((sqrt((CAST(sum_g2 AS DOUBLE)
                    - CAST(sum_g AS DOUBLE) * sum_g / n_gaps) / n_gaps)
                    / (CAST(sum_g AS DOUBLE) / n_gaps)) * 1000000)
                    / 1000000 AS cv
           FROM st)
         SELECT event_type, n_gaps, mean_gap_sec, cv,
                round(((cv - 1.0) / (cv + 1.0)) * 1000000) / 1000000
                  AS burstiness
         FROM m
         ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------ W11
    // SEQUENCE-PATTERN MATCH over sessions (MATCH_RECOGNIZE-lite): each
    // session renders as its ordered event-initial STRING (one
    // struct-sort fold), and ordered patterns become REGEXES over that
    // string — 'v.*c.*p' = view, later click, later purchase, with
    // arbitrary noise between (t9's funnel counts stage TIMES; this
    // matches ORDER with gaps, the MATCH_RECOGNIZE use case). Census:
    // sessions matching each successive pattern prefix. One user-keyed
    // sessionize + session-keyed fold; regexes run per SESSION STRING
    // (bounded), never per event.
    QueryDef("w11_sequence_pattern", (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      val cum = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      ev(s, dir)
        .withColumn("prev_ts", lag(col("ts_sec"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts_sec"))
              - unix_timestamp(col("prev_ts"))) > 1800, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(expr("""array_join(transform(
            array_sort(collect_list(struct(ts_sec, event_id,
              substring(event_type, 1, 1) AS i))), x -> x.i), '')""")
          .as("seq"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(expr("CAST(seq RLIKE 'v' AS LONG)")).as("n_view"),
          sum(expr("CAST(seq RLIKE 'v.*c' AS LONG)")).as("n_view_click"),
          sum(expr("CAST(seq RLIKE 'v.*c.*p' AS LONG)"))
            .as("n_view_click_purchase"),
          sum(expr("CAST(seq RLIKE '^s' AS LONG)"))
            .as("n_signup_first"),
          expr("CAST(sum(length(seq)) AS BIGINT)").as("n_events"))
    }, Some(
      s"""WITH e AS ($oracleEv),
         sess AS (
           SELECT user_id, event_id, ts_sec, event_type,
                  sum(CASE WHEN prev_ts IS NULL OR
                      date_diff('second', prev_ts, ts_sec) > 1800
                      THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id
                      ORDER BY ts_sec ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS sess_id
           FROM (SELECT *, lag(ts_sec) OVER (PARTITION BY user_id
                   ORDER BY ts_sec ASC, event_id ASC) AS prev_ts
                 FROM e)),
         seqs AS (
           SELECT user_id, sess_id,
                  string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts_sec ASC, event_id ASC) AS seq
           FROM sess GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(CASE WHEN regexp_matches(seq, 'v')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                CAST(sum(CASE WHEN regexp_matches(seq, 'v.*c')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
                CAST(sum(CASE WHEN regexp_matches(seq, 'v.*c.*p')
                  THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_view_click_purchase,
                CAST(sum(CASE WHEN regexp_matches(seq, '^s')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_first,
                CAST(sum(length(seq)) AS BIGINT) AS n_events
         FROM seqs""")),

    // ------------------------------------------------------------------ T22
    // DAU / WAU / MAU + STICKINESS — the product-engagement KPI set.
    // Exact windowed DISTINCT users (which plain window frames cannot
    // express) via sequence+explode EQUI-aggregation (the t8 gap-fill
    // move): the corpus collapses ONCE to the distinct (user, day)
    // frame, then each activity row EMITS the ≤7 / ≤30 window-days it
    // covers and the rolling distinct is a plain keyed COUNT DISTINCT —
    // O(grid×window) rows and zero non-equi joins (the grid×days
    // BroadcastNestedLoopJoin this replaced paid |grid|·|days|
    // comparisons — quadratic in the observation span). Emitted days
    // with no activity of their own drop out in the inner join with the
    // DAU frame, which restricts output to observed days exactly like
    // the BETWEEN-join formulation. Stickiness = DAU·1e6 div MAU stays
    // integer. At 100 TB the (user, day) frame IS the scalable
    // representation (the t10 cohort move); at extreme user counts the
    // exact distinct swaps for the a3 HLL sketch, same plumbing.
    QueryDef("t22_dau_wau_mau", (s, dir) => {
      val ud = ev(s, dir)
        .select(col("user_id"), col("ts_sec").cast("date").as("day"))
        .distinct()
        .localCheckpoint(false)
      val dau = ud.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ud.select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val mau = ud.select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 29))")).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(wau, "day").join(mau, "day")
        .withColumn("stickiness_ppm", expr("dau * 1000000L div mau"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         ud AS (
           SELECT DISTINCT user_id, CAST(ts_sec AS DATE) AS day FROM e),
         days AS (SELECT DISTINCT day FROM ud),
         dau AS (
           SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
           FROM ud GROUP BY 1),
         wau AS (
           SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
           FROM days d JOIN ud u
             ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
           GROUP BY 1),
         mau AS (
           SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
           FROM days d JOIN ud u
             ON u.day BETWEEN d.day - INTERVAL 29 DAY AND d.day
           GROUP BY 1)
         SELECT dau.day, dau, wau, mau,
                CAST((dau * 1000000) // mau AS BIGINT) AS stickiness_ppm
         FROM dau JOIN wau ON dau.day = wau.day
         JOIN mau ON dau.day = mau.day
         ORDER BY dau.day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T21
    // LAST-TOUCH ATTRIBUTION — the event-stream join every marketing /
    // conversion pipeline runs: attribute each purchase to the user's
    // most recent PRIOR click within a 7-day lookback, plus the click
    // volume inside the window (the multi-touch denominator). Two
    // window passes over ONE user-keyed sort: an ignore-nulls last()
    // carries the latest click (id, time) forward — the t12/J7 as-of
    // idiom, no self-join — and a RANGE frame over epoch seconds counts
    // window clicks. The lookback gate then filters carried clicks
    // older than 7 days. Everything shuffles once on user_id; at
    // 100 TB this is the same single-sort shape as t4 sessionization.
    QueryDef("t21_attribution", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_e").asc, col("event_id").asc)
      val wCarry = w.rowsBetween(Window.unboundedPreceding, -1)
      val wRange = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_e").asc)
        .rangeBetween(-604800L, -1L)
      ev(s, dir)
        .withColumn("ts_e", unix_timestamp(col("ts_sec")))
        .withColumn("click_ev", when(col("event_type") === "click",
          struct(col("ts_e"), col("event_id"))))
        .withColumn("last_click",
          last(col("click_ev"), ignoreNulls = true).over(wCarry))
        .withColumn("n_clicks_7d",
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .over(wRange))
        .filter(col("event_type") === "purchase")
        .withColumn("gap_sec", col("ts_e") - col("last_click.ts_e"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_sec").as("purchase_ts"),
          when(col("gap_sec") <= 604800L, col("last_click.event_id"))
            .as("attributed_click"),
          when(col("gap_sec") <= 604800L, col("gap_sec")).as("gap_sec"),
          coalesce(col("n_clicks_7d"), lit(0L)).as("n_clicks_7d"),
          expr("CAST(round(value * 100) AS BIGINT)").as("revenue_cents"))
        .orderBy(col("purchase_id").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         t AS (
           SELECT event_id, user_id, ts_sec, event_type,
                  CAST(round(value * 100) AS BIGINT) AS revenue_cents,
                  CAST(epoch(ts_sec) AS BIGINT) AS ts_e
           FROM e),
         c AS (
           SELECT event_id, user_id, ts_sec, event_type, revenue_cents,
                  ts_e,
                  last_value(CASE WHEN event_type = 'click'
                      THEN ts_e END IGNORE NULLS) OVER wc AS lc_ts,
                  last_value(CASE WHEN event_type = 'click'
                      THEN event_id END IGNORE NULLS) OVER wc AS lc_id,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                    END) OVER wr AS BIGINT) AS n_clicks_7d
           FROM t
           WINDOW wc AS (PARTITION BY user_id
                         ORDER BY ts_e ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  wr AS (PARTITION BY user_id ORDER BY ts_e ASC
                         RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING))
         SELECT event_id AS purchase_id, user_id,
                ts_sec AS purchase_ts,
                CASE WHEN ts_e - lc_ts <= 604800 THEN lc_id END
                  AS attributed_click,
                CASE WHEN ts_e - lc_ts <= 604800 THEN ts_e - lc_ts END
                  AS gap_sec,
                coalesce(n_clicks_7d, 0) AS n_clicks_7d,
                revenue_cents
         FROM c WHERE event_type = 'purchase'
         ORDER BY purchase_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T32
    // CUSUM DRIFT DETECTION (Page 1954) — the classic sequential
    // change-point monitor beside t20's STL outliers and a33's
    // Mann-Kendall trend: S_t = max(0, S_{t-1} + (y_t − μ − slack)),
    // alarm when S_t clears a threshold. The recursion NEEDS NO
    // FOLD: with cum_t = Σ deviations, S_t = cum_t − min(0,
    // running-min cum) — two plain windows, so this stays a
    // declarative two-window query both engines execute identically.
    // ALL integer: daily revenue in cents, deviations scaled by the
    // baseline day count (n0·y_t − sum0 − sum0 div 20 — mean and 5%
    // slack cross-multiplied, `div` truncates identically), windows
    // over the bounded calendar frame (the t-family argument).
    // Baseline = January 1996; monitored = February on.
    QueryDef("t32_cusum_drift", (s, dir) => {
      val daily = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("y"))
        // feeds the baseline aggregate AND the monitored frame
        .localCheckpoint(false)
      val base = daily.filter(col("d") < lit("1996-02-01").cast("date"))
        .agg(count(lit(1)).as("n0"), sum(col("y")).as("sum0"))
      val wCum = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.filter(col("d") >= lit("1996-02-01").cast("date"))
        .crossJoin(broadcast(base))
        .withColumn("dev",
          col("n0") * col("y") - col("sum0") - expr("sum0 div 20"))
        .withColumn("cum", sum(col("dev")).over(wCum))
        .withColumn("s_scaled",
          col("cum") - least(lit(0L), min(col("cum")).over(wCum)))
        .withColumn("alarm",
          // when/otherwise, not a boolean cast: a NULL comparison
          // (empty baseline) must yield 0 exactly like the oracle's
          // CASE ... ELSE 0 — the cast form yields NULL asymmetrically
          when(col("s_scaled") > expr("sum0 div 2"), 1)
            .otherwise(0).cast("int"))
        .select(col("d"), col("y"), col("s_scaled"), col("alarm"))
        .orderBy(col("d").asc_nulls_last)
    }, Some(
      """WITH daily AS MATERIALIZED (
           SELECT CAST(o_orderdate AS DATE) AS d,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-07-01'
           GROUP BY 1),
         base AS (
           SELECT CAST(count(*) AS BIGINT) AS n0,
                  CAST(sum(y) AS BIGINT) AS sum0
           FROM daily WHERE d < DATE '1996-02-01'),
         dev AS (
           SELECT d, y, n0 * y - sum0 - sum0 // 20 AS dev,
                  sum0 FROM daily, base
           WHERE d >= DATE '1996-02-01'),
         c1 AS (
           SELECT d, y, sum0,
                  sum(dev) OVER (ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS cum
           FROM dev),
         c AS (
           SELECT d, y, sum0, cum,
                  min(cum) OVER (ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS mn
           FROM c1)
         SELECT d, y,
                CAST(cum - least(CAST(0 AS BIGINT), mn) AS BIGINT)
                  AS s_scaled,
                CAST(CASE WHEN cum - least(CAST(0 AS BIGINT), mn)
                  > sum0 // 2 THEN 1 ELSE 0 END AS INTEGER) AS alarm
         FROM c ORDER BY d ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T20
    // ROBUST ANOMALY FLAGS on the detrended series — t16 decomposes,
    // THIS alarms: residual = observed − 7-day centered-MA trend, scale
    // = MAD (median absolute deviation, the outlier-immune spread the
    // z-score lacks), flag when |resid| > 3·1.4826·MAD. Residuals are
    // 6dp-pre-rounded so the medians interpolate over identical values
    // in both engines; the corpus collapses to the daily frame first
    // (t16 discipline) and every window/median runs over ~24 rows. The
    // classic ops pairing: d4 alarms on raw volume, t17 on regime
    // shifts, THIS on local spikes against the seasonal-free trend.
    QueryDef("t20_stl_anomaly", (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("ts_sec").cast("date").as("day"))
        .agg(count(lit(1)).as("observed"))
      val wMa = Window.orderBy(col("day").asc).rowsBetween(-3, 3)
      val resids = daily
        .withColumn("wn", count(lit(1)).over(wMa))
        .withColumn("trend", expr(
          "round((avg(observed) OVER (ORDER BY day ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))*1000000)/1000000"))
        .filter(col("wn") === 7)
        .withColumn("resid", expr(
          "round((observed - trend)*1000000)/1000000"))
      val med = broadcast(resids.agg(
        expr("percentile(resid, 0.5D)").as("med")))
      val mad = broadcast(resids.crossJoin(med).agg(
        expr("percentile(abs(resid - med), 0.5D)").as("mad"),
        first(col("med")).as("med")))
      resids.crossJoin(mad)
        .select(col("day"), col("observed"), col("trend"), col("resid"),
          expr("round(med*1000000)/1000000").as("resid_median"),
          expr("round(mad*1000000)/1000000").as("resid_mad"),
          expr("abs(resid - med) > 3.0D * 1.4826D * mad").as("is_anomaly"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      s"""WITH e AS ($oracleEv),
         daily AS (
           SELECT CAST(ts_sec AS DATE) AS day, count(*) AS observed
           FROM e GROUP BY 1),
         t AS (
           SELECT day, observed,
                  count(*) OVER w AS wn,
                  round((avg(observed) OVER w)*1000000)/1000000 AS trend
           FROM daily
           WINDOW w AS (ORDER BY day ASC
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         r AS (
           SELECT day, observed, trend,
                  round((observed - trend)*1000000)/1000000 AS resid
           FROM t WHERE wn = 7),
         med AS (SELECT quantile_cont(resid, 0.5) AS med FROM r),
         mad AS (
           SELECT quantile_cont(abs(resid - med), 0.5) AS mad,
                  any_value(med) AS med
           FROM r CROSS JOIN med)
         SELECT day, observed, trend, resid,
                round(med*1000000)/1000000 AS resid_median,
                round(mad*1000000)/1000000 AS resid_mad,
                (abs(resid - med) > 3.0 * 1.4826 * mad) AS is_anomaly
         FROM r CROSS JOIN mad
         ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ T25
    // KAPLAN-MEIER retention curve — the survival-analysis staple every
    // product team runs on user lifetimes, with CENSORING done right: a
    // user still active in the final week is censored (they leave the
    // risk set without counting as churn), which naive retention curves
    // get wrong. ALL integer: per-lifetime deaths d and risk-set n are
    // exact BIGINTs (n via a reverse running sum over the BOUNDED
    // lifetime frame — days of observation span, never users), the
    // hazard is d·1e6 div n, and the survival product S(t) = Π(1-d/n)
    // is a ppm-scaled truncating-integer recursion (s·(n-d) div n).
    // The t19 split applies: the DISTRIBUTED part collapses the corpus
    // (one (user,day) agg + the lifetime census); the SEQUENTIAL
    // product runs as a driver loop over the COLLECTED risk frame
    // (O(distinct lifetimes) ≤ observation days — the recursive-CTE
    // spelling paid one Spark-job scheduling per lifetime, ~25 s of
    // pure latency). Scala's Long division truncates like both
    // engines' integer div on these all-positive operands, so the
    // oracle stays hash-exact with no float product anywhere.
    QueryDef("t25_kaplan_meier", (s, dir) => {
      Tables.registerAll(s, dir)
      val risk = s.sql(
        """WITH ud AS (
             SELECT user_id, CAST(date_trunc('second', ts) AS DATE) AS day
             FROM events GROUP BY 1, 2),
           lives AS (
             SELECT user_id, min(day) AS first_day, max(day) AS last_day
             FROM ud GROUP BY 1),
           bounds AS (SELECT max(last_day) AS end_day FROM lives),
           cohort AS (
             SELECT CAST(datediff(last_day, first_day) AS BIGINT) AS lt,
                    CASE WHEN last_day <= date_sub(end_day, 7)
                         THEN 1 ELSE 0 END AS churned
             FROM lives CROSS JOIN bounds),
           grp AS (
             SELECT lt, CAST(count(*) AS BIGINT) AS n_users,
                    CAST(sum(churned) AS BIGINT) AS d
             FROM cohort GROUP BY 1)
           SELECT lt, d,
                  CAST(sum(n_users) OVER (ORDER BY lt DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n
           FROM grp ORDER BY lt ASC""").collect()
      var sPpm = 0L
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      var i = 0
      while (i < risk.length) {
        val lt = risk(i).getLong(0); val d = risk(i).getLong(1)
        val n = risk(i).getLong(2)
        sPpm = if (i == 0) ((n - d) * 1000000L) / n
          else (sPpm * (n - d)) / n
        out += org.apache.spark.sql.Row(lt, d, n, (d * 1000000L) / n, sPpm)
        i += 1
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        "lifetime_days", "n_churned", "n_at_risk", "hazard_ppm",
        "survival_ppm").map(n => org.apache.spark.sql.types.StructField(
        n, org.apache.spark.sql.types.LongType)))
      s.createDataFrame(new java.util.ArrayList(
        scala.jdk.CollectionConverters.BufferHasAsJava(out).asJava), schema)
        .orderBy(col("lifetime_days").asc_nulls_last)
    }, Some(
      """WITH RECURSIVE ud AS (
           SELECT user_id,
                  CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS day
           FROM events GROUP BY 1, 2),
         lives AS (
           SELECT user_id, min(day) AS first_day, max(day) AS last_day
           FROM ud GROUP BY 1),
         bounds AS (SELECT max(last_day) AS end_day FROM lives),
         cohort AS (
           SELECT CAST(date_diff('day', first_day, last_day) AS BIGINT)
                    AS lt,
                  CASE WHEN last_day <= end_day - 7
                       THEN 1 ELSE 0 END AS churned
           FROM lives CROSS JOIN bounds),
         grp AS (
           SELECT lt, CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(churned) AS BIGINT) AS d
           FROM cohort GROUP BY 1),
         risk AS (
           SELECT lt, d,
                  CAST(sum(n_users) OVER (ORDER BY lt DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n,
                  CAST(row_number() OVER (ORDER BY lt ASC) AS BIGINT) AS k
           FROM grp),
         km AS (
           SELECT lt, d, n, k, ((n - d) * 1000000) // n AS s_ppm
           FROM risk WHERE k = 1
           UNION ALL
           SELECT r.lt, r.d, r.n, r.k, (km.s_ppm * (r.n - r.d)) // r.n
           FROM km JOIN risk r ON r.k = km.k + 1)
         SELECT CAST(lt AS BIGINT) AS lifetime_days,
                CAST(d AS BIGINT) AS n_churned,
                CAST(n AS BIGINT) AS n_at_risk,
                CAST((d * 1000000) // n AS BIGINT) AS hazard_ppm,
                CAST(s_ppm AS BIGINT) AS survival_ppm
         FROM km ORDER BY lifetime_days ASC NULLS LAST"""))
  )
}
