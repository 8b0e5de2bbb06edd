package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Behavioral analytics over the events stream — the warehouse staples a
  * product team runs on an event table (sessionization, funnels,
  * retention cohorts, hopping windows). Engine completeness beyond the
  * reference's DeFi query (SURVEY §7.5): the reference's warehouse shape
  * (append-only event rows + SQL analytics on top) is exactly this
  * workload with different event names.
  *
  * All four are declarative SQL through Catalyst — windows partitioned
  * by user (150 at the fixture scale, millions in production: the
  * exchange keys on user_id and AQE coalesces), aggregates with
  * map-side partials, DECIMAL sums for cross-engine exactness,
  * timestamps exported as epoch millis (the Relational2 convention —
  * raw timestamps in outputs are a cross-engine hash hazard).
  */
object Events {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** Session gap: two events of one user more than this many seconds
    * apart start a new session. 8 h sits between the fixture's p25
    * (~3 h) and median (~7.4 h) per-user gap, so sessions mix
    * multi-event runs with singletons. */
  val SessionGapSec = 28800L

  /** Gap-based sessionization in batch — the classic two-window chain:
    * a LAG marks every gap > [[SessionGapSec]] as a session break, a
    * running SUM of breaks numbers the sessions, one aggregate rolls
    * each session up. Both windows and the final aggregate share the
    * user_id partitioning — ONE exchange end-to-end (the streaming
    * sibling is `Sessionize`/`flatMapGroupsWithState`, CorpusStreamSpec;
    * this is the same semantics replayable over the warehouse). */
  def sessionize(s: SparkSession, dir: String): DataFrame = sql(s, dir, s"""
    WITH brk AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN unix_millis(CAST(ts AS TIMESTAMP))
               - unix_millis(CAST(LAG(ts) OVER w AS TIMESTAMP))
             > ${SessionGapSec * 1000}
          OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, ts, value,
        SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_no
      FROM brk)
    SELECT user_id, session_no, COUNT(*) AS n_events,
      unix_millis(CAST(MIN(ts) AS TIMESTAMP)) AS start_ms,
      unix_millis(CAST(MAX(ts) AS TIMESTAMP)) AS end_ms,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no""")

  /** Conversion window for each funnel step ([[funnel]]): the next step
    * must land within 12 h of the previous one — without it the dense
    * fixture converts every user and the funnel stops discriminating
    * (12 h ⇒ 150 → 37 → 7 at sf0.01). */
  val FunnelWindowMs = 43200000L

  /** Ordered-funnel analysis: view → click → purchase, each step's
    * timestamp the MIN inside (prev, prev + [[FunnelWindowMs]]] —
    * min_if aggregates per user, no self-join, no window function:
    * per-step converted-user counts. The per-user pivot is one hash
    * aggregate; the step ordering is plain scalar logic on the three
    * firsts, and every join keys on user_id. */
  def funnel(s: SparkSession, dir: String): DataFrame = sql(s, dir, s"""
    WITH t AS (
      SELECT user_id, event_type,
        unix_millis(CAST(ts AS TIMESTAMP)) AS ms
      FROM events WHERE event_type IN ('view', 'click', 'purchase')),
    u AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ms END) AS t1
      FROM t GROUP BY user_id),
    u2 AS (
      SELECT t.user_id, u.t1,
        MIN(CASE WHEN t.event_type = 'click' AND t.ms > u.t1
          AND t.ms <= u.t1 + $FunnelWindowMs THEN t.ms END) AS t2
      FROM t JOIN u ON t.user_id = u.user_id
      GROUP BY t.user_id, u.t1),
    u3 AS (
      SELECT t.user_id, u2.t1, u2.t2,
        MIN(CASE WHEN t.event_type = 'purchase' AND t.ms > u2.t2
          AND t.ms <= u2.t2 + $FunnelWindowMs THEN t.ms END) AS t3
      FROM t JOIN u2 ON t.user_id = u2.user_id
      GROUP BY t.user_id, u2.t1, u2.t2)
    SELECT
      COUNT(t1) AS n_view,
      COUNT(t2) AS n_view_click,
      COUNT(t3) AS n_view_click_purchase
    FROM u3""")

  /** Weekly retention cohorts: users grouped by first-seen week, counted
    * once per (cohort, week-offset) they were active in — the classic
    * triangle. Two aggregates (first-seen, distinct activity) joined on
    * user_id, then one rollup keyed (cohort, offset); at scale both
    * aggregates pre-combine map-side and the join keys on user_id. */
  def retention(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH act AS (
      SELECT DISTINCT user_id,
        unix_millis(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wk_ms
      FROM events),
    first AS (
      SELECT user_id, MIN(wk_ms) AS cohort_ms FROM act GROUP BY user_id)
    SELECT f.cohort_ms,
      CAST((a.wk_ms - f.cohort_ms) DIV 604800000 AS BIGINT) AS week_offset,
      COUNT(*) AS n_users
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY f.cohort_ms, week_offset
    ORDER BY f.cohort_ms, week_offset""")

  /** Hopping (sliding) time window: 6-hour windows advancing every
    * 3 hours — every event lands in exactly two. Spark's native
    * `window(ts, width, hop)` generates the per-row window instances
    * (map-side expand, no join); the aggregate is a plain hash agg on
    * the window start. */
  def hoppingWindow(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT unix_millis(CAST(window.start AS TIMESTAMP)) AS win_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT ts AS t, value FROM events)
    GROUP BY window(t, '6 hours', '3 hours')
    ORDER BY win_start""")

  /** Trailing 24 h per-user rolling aggregates via a RANGE window frame
    * — the frame type ROWS can't express (it bounds by event-time
    * distance, not row count, so sparse and dense users get the same
    * semantics). One user_id exchange; DECIMAL sum for cross-engine
    * exactness. */
  def rollingRange(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH t AS (
      SELECT user_id, event_id,
        unix_millis(CAST(ts AS TIMESTAMP)) AS ms, value
      FROM events)
    SELECT user_id, event_id, ms,
      COUNT(*) OVER w AS n_24h,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_24h
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ms
      RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ms, event_id""")

  /** Slowly-changing-dimension (type 2) build from the event stream:
    * each user's event_type transitions become validity intervals
    * (valid_from, valid_to, is_current) — the classic warehouse
    * dimension-history ETL, as two window passes (LAG change detection,
    * LEAD interval close) sharing one user_id exchange. */
  def scd2(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH t AS (
      SELECT user_id, event_id, event_type,
        unix_millis(CAST(ts AS TIMESTAMP)) AS ms
      FROM events),
    chg AS (
      SELECT user_id, ms, event_id, event_type
      FROM (SELECT *, LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY ms, event_id) AS prev_type
        FROM t)
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type AS state, ms AS valid_from_ms,
      LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        AS valid_to_ms,
      LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
        AS is_current
    FROM chg
    ORDER BY user_id, valid_from_ms, state""")

  /** Linear interpolation of each user's value series onto a daily grid
    * — the gap-filling sibling of LOCF (q14): every grid point gets
    * va + (vb−va)·(t−ta)/(tb−ta) from the surrounding observations,
    * NULL outside the observed range. Both neighbor lookups use the
    * q14 group trick (running count of observations partitions the
    * timeline into LOCF groups — no IGNORE NULLS portability hazard),
    * run once forward and once reverse; all four window passes and the
    * final projection share the user_id exchange. */
  def interpolate(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH b AS (
      SELECT unix_millis(CAST(date_trunc('DAY', MIN(ts)) AS TIMESTAMP)) AS d0,
        unix_millis(CAST(date_trunc('DAY', MAX(ts)) AS TIMESTAMP)) AS d1
      FROM events),
    grid AS (
      SELECT u.user_id, g.ms
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT explode(sequence(d0, d1, 86400000)) AS ms FROM b) g),
    obs AS (
      SELECT user_id, unix_millis(CAST(ts AS TIMESTAMP)) AS ms,
        value, event_id, 1 AS is_obs
      FROM events),
    allr AS (
      SELECT user_id, ms, value, coalesce(event_id, -1) AS eid, is_obs
      FROM obs
      UNION ALL
      SELECT user_id, ms, CAST(NULL AS DOUBLE), -1, 0 FROM grid),
    fwd AS (
      SELECT *, SUM(is_obs) OVER (PARTITION BY user_id
          ORDER BY ms, is_obs DESC, eid
          ROWS UNBOUNDED PRECEDING) AS grp_f
      FROM allr),
    bwd AS (
      SELECT *, SUM(is_obs) OVER (PARTITION BY user_id
          ORDER BY ms DESC, is_obs, eid DESC
          ROWS UNBOUNDED PRECEDING) AS grp_b
      FROM fwd),
    nb AS (
      SELECT user_id, ms, is_obs,
        MAX(CASE WHEN is_obs = 1 THEN ms END)
          OVER (PARTITION BY user_id, grp_f) AS ta,
        MAX(CASE WHEN is_obs = 1 THEN value END)
          OVER (PARTITION BY user_id, grp_f) AS va,
        MAX(CASE WHEN is_obs = 1 THEN ms END)
          OVER (PARTITION BY user_id, grp_b) AS tb,
        MAX(CASE WHEN is_obs = 1 THEN value END)
          OVER (PARTITION BY user_id, grp_b) AS vb
      FROM bwd)
    SELECT user_id, ms,
      CASE
        WHEN ta = ms THEN ROUND(va, 6)
        WHEN ta IS NULL OR tb IS NULL THEN CAST(NULL AS DOUBLE)
        ELSE ROUND(va + (vb - va) *
          (CAST(ms - ta AS DOUBLE) / CAST(tb - ta AS DOUBLE)), 6)
      END AS value_interp
    FROM nb WHERE is_obs = 0
    ORDER BY user_id, ms""")

  /** The same sessionization through Spark's NATIVE session-window
    * operator (`session_window(ts, gap)` — the Structured-Streaming
    * session primitive, usable in batch): one groupBy, the engine
    * merges overlapping [ts, ts+gap) intervals per key internally.
    * Next to [[sessionize]] (the portable two-window SQL formulation)
    * this pins the operator's semantics: identical session boundaries,
    * window end = last event + gap. */
  def sessionWindow(s: SparkSession, dir: String): DataFrame = sql(s, dir, s"""
    SELECT user_id,
      unix_millis(session_window.start) AS start_ms,
      unix_millis(session_window.end) AS end_ms,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events)
    GROUP BY user_id, session_window(t, '${SessionGapSec} seconds')
    ORDER BY user_id, start_ms""")

  /** Z-score outlier report per event_type: mean/stddev from exact
    * DECIMAL sums (population variance via E[x²]−E[x]², every moment an
    * order-independent decimal aggregate), flag at |z| > 3. Two passes:
    * a tiny per-type moment table (broadcast back) and one map-side
    * scoring join — the data-quality shape that runs on every metric at
    * any scale. */
  def outliers(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH m AS (
      SELECT event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
          AS DOUBLE) AS sxx
      FROM events GROUP BY event_type),
    st AS (
      SELECT event_type, n, sx / n AS mean,
        sqrt(sxx / n - (sx / n) * (sx / n)) AS sd
      FROM m)
    SELECT e.event_type, e.event_id,
      ROUND((e.value - st.mean) / st.sd, 6) AS z
    FROM events e JOIN st ON e.event_type = st.event_type
    WHERE ABS((e.value - st.mean) / st.sd) > 3
    ORDER BY e.event_type, e.event_id""")

  /** Two-sample A/B analysis: users split by user_id parity, per-type
    * means and a Welch t statistic — every moment an exact DECIMAL sum,
    * the final scalar algebra identical IEEE on both engines. The
    * whole analysis is one grouped aggregate + one 5-row projection. */
  def abTest(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH g AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS grp,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
          AS DOUBLE) AS sxx
      FROM events GROUP BY event_type, CAST(user_id % 2 AS INT)),
    st AS (
      SELECT event_type, grp, n, sx / n AS mean,
        (sxx - sx * sx / n) / (n - 1) AS var
      FROM g)
    SELECT a.event_type,
      ROUND(a.mean, 6) AS mean_a, ROUND(b.mean, 6) AS mean_b,
      a.n AS n_a, b.n AS n_b,
      ROUND((a.mean - b.mean) /
        sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat
    FROM st a JOIN st b
      ON a.event_type = b.event_type AND a.grp = 0 AND b.grp = 1
    ORDER BY a.event_type""")

  /** Number of equi-width histogram bins ([[histogram]]). */
  val HistBins = 20

  /** Equi-width value histogram per event_type over the type's own
    * min/max — one moment pass, one bucketing pass, the profiling shape
    * behind every dashboard distribution plot. The bin arithmetic is
    * spelled out (not width_bucket) so both engines evaluate the
    * IDENTICAL IEEE expression — engine built-ins disagree on boundary
    * grouping, and DuckDB has no width_bucket at all. */
  def histogram(s: SparkSession, dir: String): DataFrame = sql(s, dir, s"""
    WITH b AS (
      SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
      CASE WHEN b.hi = b.lo THEN CAST(1 AS BIGINT) ELSE
        LEAST(CAST(FLOOR((e.value - b.lo) / (b.hi - b.lo)
          * $HistBins) AS BIGINT) + 1, $HistBins) END AS bin,
      COUNT(*) AS n,
      CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type, bin
    ORDER BY e.event_type, bin""")

  /** Common 3-step behavior paths: each user's consecutive event-type
    * trigrams (ordered by event time), counted corpus-wide, global
    * top-10 — the product-analytics "what do users do next" mining
    * shape. The trigram expansion is two LEADs inside the user window
    * (one exchange); the top-10 cut rides TakeOrderedAndProject
    * (per-partition heaps), never a global sort. */
  def topPaths(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH seq AS (
      SELECT user_id, event_type AS e1,
        LEAD(event_type, 1) OVER w AS e2,
        LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT CONCAT(e1, '>', e2, '>', e3) AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
    SELECT path, COUNT(*) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path LIMIT 10""")

  /** PSI drift-monitor SQL, parameterized by the per-engine 0..9 bin
    * generator (the ONLY dialect difference). Baseline = even event_ids'
    * values; "current" = odd ids' values shifted +100 (a deterministic
    * planted drift). Values bin into ten fixed 60-wide buckets (clamped at BOTH ends —
    * a negative value must land in bin 0, not fall off the enumerated
    * grid and silently vanish from the totals),
    * add-one smoothed so empty bins stay defined, and every log argument
    * is an exact INTEGER product — the [[graft.ops.TextAnalysis]] ln
    * contract — so PSI is engine-exact at 6 dp. The full 10-bin grid is
    * enumerated per type: a bin empty on both sides still contributes
    * its smoothed mass difference. Scale shape: two scan-fused binning
    * aggregates + a broadcast-sized grid join — one shuffle each, the
    * drift report is O(types × bins). Sibling:
    * [[graft.ops.Similarity.embDriftPsiSql]] applies the same PSI/LN
    * contract to embedding-space sign buckets — kept separate on
    * purpose (different grain: per-type value bins vs one global cell
    * grid), but a change to the smoothing, threshold, or LN-factor
    * recipe belongs in BOTH. */
  private def driftPsiSql(binGen: String): String = s"""
    WITH base AS (
      SELECT event_type,
        LEAST(9, GREATEST(0, CAST(FLOOR(value / 60.0) AS INT))) AS bin,
        CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_id % 2 = 0
      GROUP BY 1, 2),
    cur AS (
      SELECT event_type,
        LEAST(9, GREATEST(0, CAST(FLOOR((value + 100) / 60.0) AS INT))) AS bin,
        CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_id % 2 = 1
      GROUP BY 1, 2),
    grid AS (
      SELECT t.event_type, b.bin
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN ($binGen) b),
    j AS (
      SELECT g.event_type, g.bin,
        COALESCE(base.c, 0) + 1 AS c1, COALESCE(cur.c, 0) + 1 AS c2
      FROM grid g
      LEFT JOIN base ON base.event_type = g.event_type AND base.bin = g.bin
      LEFT JOIN cur ON cur.event_type = g.event_type AND cur.bin = g.bin),
    tot AS (
      SELECT event_type,
        CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM j GROUP BY 1)
    SELECT j.event_type,
      ROUND(SUM(
        (CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2) *
        (LN(CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - LN(CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE)))), 6)
        AS psi,
      ROUND(SUM(
        (CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2) *
        (LN(CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - LN(CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE)))), 6)
        > 0.1 AS drifted
    FROM j JOIN tot ON tot.event_type = j.event_type
    GROUP BY j.event_type
    ORDER BY j.event_type"""

  /** Population-stability-index drift monitor (`events_drift_psi`) —
    * the data-observability staple: has a feature's distribution moved
    * between a baseline window and the current one? See
    * [[driftPsiSql]]. */
  def driftPsi(s: SparkSession, dir: String): DataFrame = sql(s, dir,
    driftPsiSql("SELECT explode(sequence(0, 9)) AS bin"))

  /** Heavy-hitter DISCOVERY (`events_heavy_discover`) — the
    * [[graft.ops.MgAgg]] Misra–Gries summary finds frequent values with
    * NO candidate list (the capability a CMS point query lacks), here
    * over a planted-skew stream (2/3 of the mass on one synthetic key).
    * The gate asserts the MERGE-ORDER-INVARIANT guarantees only — the
    * hot key must be present, its stored count within [true − N/(K+1),
    * true] — because raw MG counter values legitimately vary with
    * Spark's nondeterministic partial-merge order; the guarantee is
    * what the algorithm promises at any cluster size. */
  def heavyDiscover(s: SparkSession, dir: String): DataFrame = {
    graft.codec.GraftFunctions.register(s)
    sql(s, dir, s"""
      WITH src AS (
        SELECT CASE WHEN event_id % 3 = 0 THEN user_id ELSE 777777 END AS x
        FROM events),
      sk AS (SELECT mg_agg(x) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM src),
      ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS hot_exact
             FROM events WHERE event_id % 3 <> 0)
      SELECT n, hot_exact,
        mg_estimate(m, 777777) > 0 AS found_ok,
        (mg_estimate(m, 777777) <= hot_exact AND
         mg_estimate(m, 777777) >= hot_exact - (n DIV ${graft.ops.Mg.K + 1}) - 1)
          AS est_ok
      FROM sk, ex""")
  }

  /** TWO-PASS verified heavy hitters (`events_heavy_verified`) — the
    * production composition on top of [[heavyDiscover]]: pass 1 builds
    * the MG summary (one aggregate, no candidate list needed); pass 2
    * re-scans the stream restricted to the ≤K discovered candidates
    * (broadcast join — the candidate side is K rows at ANY corpus
    * scale) and counts them EXACTLY. Keeping candidates with exact
    * count > n DIV (K+1) yields precisely the true heavy-hitter set
    * with exact counts — fully deterministic (hash-gated against plain
    * GROUP BY/HAVING in DuckDB) even though raw MG counters are
    * merge-order dependent: the guarantee ensures no true heavy hitter
    * is missing from the candidates, and the exact pass removes the
    * merge-order-dependent extras. The stream total n rides the
    * candidate rows (each carries it; MIN re-extracts it after the
    * rollup), so `src` is scanned exactly twice — a third
    * threshold-time reference would re-scan the whole stream at
    * 100 TB. */
  def heavyVerified(s: SparkSession, dir: String): DataFrame = {
    graft.codec.GraftFunctions.register(s)
    sql(s, dir, s"""
      WITH src AS (
        SELECT CASE WHEN event_id % 3 = 0 THEN user_id ELSE 777777 END AS x
        FROM events),
      sk AS (SELECT mg_agg(x) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM src),
      cand AS (SELECT explode(mg_keys(m)) AS x, n FROM sk),
      verified AS (
        SELECT /*+ BROADCAST(c) */ s.x, CAST(COUNT(*) AS BIGINT) AS cnt,
          MIN(c.n) AS n
        FROM src s JOIN cand c ON s.x = c.x
        GROUP BY s.x)
      SELECT x, cnt FROM verified
      WHERE cnt > n DIV ${graft.ops.Mg.K + 1}
      ORDER BY x""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_heavy_discover" -> (heavyDiscover _),
    "events_heavy_verified" -> (heavyVerified _),
    "events_drift_psi" -> (driftPsi _),
    "events_top_paths" -> (topPaths _),
    "events_outliers" -> (outliers _),
    "events_ab_test" -> (abTest _),
    "events_histogram" -> (histogram _),
    "events_session_window" -> (sessionWindow _),
    "events_rolling_range" -> (rollingRange _),
    "events_scd2" -> (scd2 _),
    "events_interpolate" -> (interpolate _),
    "events_sessionize" -> (sessionize _),
    "events_funnel" -> (funnel _),
    "events_retention" -> (retention _),
    "events_hopping_window" -> (hoppingWindow _))

  val oracle: Map[String, String] = Map(
    // the two-pass composition is exactly GROUP BY + HAVING over the
    // guarantee threshold — no sketch needed on the oracle side
    "events_heavy_verified" -> s"""
      WITH src AS (
        SELECT CASE WHEN event_id % 3 = 0 THEN user_id ELSE 777777 END AS x
        FROM events),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM src)
      SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM src GROUP BY x
      HAVING CAST(COUNT(*) AS BIGINT) > (SELECT n FROM nn) // ${graft.ops.Mg.K + 1}
      ORDER BY x""",
    // the MG guarantees are literal TRUE on the oracle side; n and the
    // hot key's exact count anchor the row
    "events_heavy_discover" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN event_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS hot_exact,
        TRUE AS found_ok, TRUE AS est_ok
      FROM events""",
    "events_drift_psi" ->
      driftPsiSql("SELECT unnest(range(0, 10)) AS bin"),
    "events_top_paths" -> """
      WITH seq AS (
        SELECT user_id, event_type AS e1,
          LEAD(event_type, 1) OVER w AS e2,
          LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      paths AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
      SELECT path, COUNT(*) AS n
      FROM paths GROUP BY path
      ORDER BY n DESC, path LIMIT 10""",
    "events_outliers" -> """
      WITH m AS (
        SELECT event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
            AS DOUBLE) AS sxx
        FROM events GROUP BY event_type),
      st AS (
        SELECT event_type, n, sx / n AS mean,
          sqrt(sxx / n - (sx / n) * (sx / n)) AS sd
        FROM m)
      SELECT e.event_type, e.event_id,
        ROUND((e.value - st.mean) / st.sd, 6) AS z
      FROM events e JOIN st ON e.event_type = st.event_type
      WHERE ABS((e.value - st.mean) / st.sd) > 3
      ORDER BY e.event_type, e.event_id""",
    "events_ab_test" -> """
      WITH g AS (
        SELECT event_type, CAST(user_id % 2 AS INT) AS grp,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
            AS DOUBLE) AS sxx
        FROM events GROUP BY event_type, CAST(user_id % 2 AS INT)),
      st AS (
        SELECT event_type, grp, n, sx / n AS mean,
          (sxx - sx * sx / n) / (n - 1) AS var
        FROM g)
      SELECT a.event_type,
        ROUND(a.mean, 6) AS mean_a, ROUND(b.mean, 6) AS mean_b,
        a.n AS n_a, b.n AS n_b,
        ROUND((a.mean - b.mean) /
          sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat
      FROM st a JOIN st b
        ON a.event_type = b.event_type AND a.grp = 0 AND b.grp = 1
      ORDER BY a.event_type""",
    "events_histogram" -> s"""
      WITH b AS (
        SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
        FROM events GROUP BY event_type)
      SELECT e.event_type,
        CASE WHEN b.hi = b.lo THEN CAST(1 AS BIGINT) ELSE
          LEAST(CAST(FLOOR((e.value - b.lo) / (b.hi - b.lo)
            * $HistBins) AS BIGINT) + 1, $HistBins) END AS bin,
        COUNT(*) AS n,
        CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events e JOIN b ON e.event_type = b.event_type
      GROUP BY e.event_type, bin
      ORDER BY e.event_type, bin""",
    "events_session_window" -> s"""
      WITH brk AS (
        SELECT user_id, event_id, ts, value,
          -- session_window semantics: an event joins iff it lands STRICTLY
          -- inside [last, last+gap) — compare at MICROsecond precision
          -- (ms rounding could flip an exact-boundary case)
          CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
               >= ${SessionGapSec * 1000000L}
            OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
          SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_no
        FROM brk)
      SELECT user_id,
        epoch_ms(MIN(ts)) AS start_ms,
        epoch_ms(MAX(ts)) + ${SessionGapSec * 1000} AS end_ms,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sess
      GROUP BY user_id, session_no
      ORDER BY user_id, start_ms""",
    "events_rolling_range" -> """
      WITH t AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events)
      SELECT user_id, event_id, ms,
        COUNT(*) OVER w AS n_24h,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_24h
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY ms
        RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ms, event_id""",
    "events_scd2" -> """
      WITH t AS (
        SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        FROM events),
      chg AS (
        SELECT user_id, ms, event_id, event_type
        FROM (SELECT *, LAG(event_type) OVER
            (PARTITION BY user_id ORDER BY ms, event_id) AS prev_type
          FROM t)
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id, event_type AS state, ms AS valid_from_ms,
        LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
          AS valid_to_ms,
        LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
          AS is_current
      FROM chg
      ORDER BY user_id, valid_from_ms, state""",
    "events_interpolate" -> """
      WITH b AS (
        SELECT epoch_ms(date_trunc('day', MIN(ts))) AS d0,
          epoch_ms(date_trunc('day', MAX(ts))) AS d1
        FROM events),
      grid AS (
        SELECT u.user_id, g.ms
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (SELECT unnest(generate_series(d0, d1, 86400000)) AS ms
          FROM b) g),
      obs AS (
        SELECT user_id, epoch_ms(ts) AS ms, value, event_id, 1 AS is_obs
        FROM events),
      allr AS (
        SELECT user_id, ms, value, COALESCE(event_id, -1) AS eid, is_obs
        FROM obs
        UNION ALL
        SELECT user_id, ms, CAST(NULL AS DOUBLE), -1, 0 FROM grid),
      fwd AS (
        SELECT *, SUM(is_obs) OVER (PARTITION BY user_id
            ORDER BY ms, is_obs DESC, eid
            ROWS UNBOUNDED PRECEDING) AS grp_f
        FROM allr),
      bwd AS (
        SELECT *, SUM(is_obs) OVER (PARTITION BY user_id
            ORDER BY ms DESC, is_obs, eid DESC
            ROWS UNBOUNDED PRECEDING) AS grp_b
        FROM fwd),
      nb AS (
        SELECT user_id, ms, is_obs,
          MAX(CASE WHEN is_obs = 1 THEN ms END)
            OVER (PARTITION BY user_id, grp_f) AS ta,
          MAX(CASE WHEN is_obs = 1 THEN value END)
            OVER (PARTITION BY user_id, grp_f) AS va,
          MAX(CASE WHEN is_obs = 1 THEN ms END)
            OVER (PARTITION BY user_id, grp_b) AS tb,
          MAX(CASE WHEN is_obs = 1 THEN value END)
            OVER (PARTITION BY user_id, grp_b) AS vb
        FROM bwd)
      SELECT user_id, ms,
        CASE
          WHEN ta = ms THEN ROUND(va, 6)
          WHEN ta IS NULL OR tb IS NULL THEN CAST(NULL AS DOUBLE)
          ELSE ROUND(va + (vb - va) *
            (CAST(ms - ta AS DOUBLE) / CAST(tb - ta AS DOUBLE)), 6)
        END AS value_interp
      FROM nb WHERE is_obs = 0
      ORDER BY user_id, ms""",
    "events_sessionize" -> s"""
      WITH brk AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w)
               > ${SessionGapSec * 1000}
            OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_id, ts, value,
          SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_no
        FROM brk)
      SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        COUNT(*) AS n_events,
        epoch_ms(MIN(ts)) AS start_ms,
        epoch_ms(MAX(ts)) AS end_ms,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sess
      GROUP BY user_id, session_no
      ORDER BY user_id, session_no""",
    "events_funnel" -> s"""
      WITH t AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ms
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      u AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ms END) AS t1
        FROM t GROUP BY user_id),
      u2 AS (
        SELECT t.user_id, u.t1,
          MIN(CASE WHEN t.event_type = 'click' AND t.ms > u.t1
            AND t.ms <= u.t1 + $FunnelWindowMs THEN t.ms END) AS t2
        FROM t JOIN u ON t.user_id = u.user_id
        GROUP BY t.user_id, u.t1),
      u3 AS (
        SELECT t.user_id, u2.t1, u2.t2,
          MIN(CASE WHEN t.event_type = 'purchase' AND t.ms > u2.t2
            AND t.ms <= u2.t2 + $FunnelWindowMs THEN t.ms END) AS t3
        FROM t JOIN u2 ON t.user_id = u2.user_id
        GROUP BY t.user_id, u2.t1, u2.t2)
      SELECT
        COUNT(t1) AS n_view,
        COUNT(t2) AS n_view_click,
        COUNT(t3) AS n_view_click_purchase
      FROM u3""",
    "events_retention" -> """
      WITH act AS (
        SELECT DISTINCT user_id,
          epoch_ms(date_trunc('week', ts)) AS wk_ms
        FROM events),
      first AS (
        SELECT user_id, MIN(wk_ms) AS cohort_ms FROM act GROUP BY user_id)
      SELECT f.cohort_ms,
        (a.wk_ms - f.cohort_ms) // 604800000 AS week_offset,
        COUNT(*) AS n_users
      FROM act a JOIN first f ON a.user_id = f.user_id
      GROUP BY f.cohort_ms, week_offset
      ORDER BY f.cohort_ms, week_offset""",
    "events_hopping_window" -> """
      WITH inst AS (
        SELECT epoch_ms(time_bucket(INTERVAL '3 hours', ts))
            - k * 10800000 AS win_start,
          epoch_ms(ts) AS ms, value
        FROM events, unnest([0, 1]) u(k))
      SELECT win_start, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM inst
      WHERE ms >= win_start AND ms < win_start + 21600000
      GROUP BY win_start ORDER BY win_start""")
}
