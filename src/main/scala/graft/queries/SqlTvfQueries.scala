package graft.queries

import graft.{Q, Tables}

/** SQL-surface twins for the analytics families that reach `spark.sql`
  * through the r11 table functions (GraftExtensions): time-series
  * (R13/R17/R21/R33/R42/R66/R43/R49/R40), the correlation family
  * (A13/A14/R52/R37/R53/R54), linkage (R28/R47), change-data
  * (R29/R18) and retrieval eval (P27/P27b/P27c). The reference is
  * SQL-first for ALL analytics (pyhdk hdk.py:2456 routes everything
  * through HDK.sql); after this module every operator family has a SQL
  * route. Each key runs PURELY through SQL text with parameters
  * DISTINCT from its DataFrame twin, so it earns its own full DuckDB
  * oracle; SqlSurfaceSpec asserts plan identity (sameResult) for the
  * lazy operators and pinned-input value equality for the
  * internally-materializing ones.
  */
object SqlTvfQueries {

  private type S = org.apache.spark.sql.SparkSession

  private def sql(s: S, d: String, stmts: String*) = {
    Tables.registerAll(s, d)
    stmts.init.foreach(s.sql)
    s.sql(stmts.last)
  }

  // ---------------------------------------------------------------
  // Time-series family
  // ---------------------------------------------------------------

  // R13 as-of join via SQL: view events enriched with the latest
  // signup value at-or-before each view (q37 used purchase/click).
  // Oracle: DuckDB's NATIVE ASOF LEFT JOIN — an independent
  // implementation of the semantics.
  private val q136 = Q(
    "q136_sql_asof",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q136_l AS
        SELECT event_id, user_id, ts, value AS p_val FROM events
        WHERE event_type = 'view'""",
      """CREATE OR REPLACE TEMP VIEW q136_r AS
        SELECT user_id, ts, max(value) AS c_val, ts AS c_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id, ts""",
      """SELECT event_id, user_id, p_val, asof_c_ts, asof_c_val
        FROM graft_asof('q136_l', 'q136_r', 'user_id', 'ts', 'c_ts,c_val')
        ORDER BY event_id"""),
    Some("""WITH p AS (
        SELECT event_id, user_id, ts, value AS p_val FROM events
        WHERE event_type = 'view'),
      c AS (
        SELECT user_id, ts AS c_ts, max(value) AS c_val FROM events
        WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.p_val,
        c.c_ts AS asof_c_ts, c.c_val AS asof_c_val
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.c_ts <= p.ts
      ORDER BY p.event_id"""))

  // R17 resample+ffill via SQL on a DAILY grid (q52 used hourly, a
  // different user slice).
  private val q137 = Q(
    "q137_sql_resample",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q137_obs AS
        SELECT * FROM events WHERE user_id % 11 = 3""",
      """SELECT * FROM
        graft_resample('q137_obs', 'user_id', 'ts', 'value', 'event_id', 'day')
        ORDER BY user_id, bucket"""),
    Some("""WITH obs AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
          epoch_us(ts) AS us, event_id, value
        FROM events WHERE user_id % 11 = 3),
      lastb AS (
        SELECT user_id, bucket, v_last FROM (
          SELECT user_id, bucket, value AS v_last,
            row_number() OVER (PARTITION BY user_id, bucket
              ORDER BY us DESC, event_id DESC) AS rn
          FROM obs) WHERE rn = 1),
      spans AS (
        SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        FROM obs GROUP BY 1),
      grid AS (
        SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY))
          AS bucket FROM spans)
      SELECT user_id, bucket,
        last_value(v_last IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      FROM grid LEFT JOIN lastb USING (user_id, bucket)
      ORDER BY user_id, bucket"""))

  // R21 EWMA via SQL with α=0.25 over a 10-row trailing frame (q57:
  // α=0.1/span 20, a different user slice). DuckDB replays the
  // identical left fold and closed-form geometric denominator.
  private val q138 = Q(
    "q138_sql_ewma",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q138_obs AS
        SELECT * FROM events WHERE user_id % 6 = 2""",
      """SELECT user_id, event_id, ewma FROM
        graft_ewma('q138_obs', 'user_id', 'ts', 'value', 'event_id', 0.25D, 10)
        ORDER BY user_id, event_id"""),
    Some("""WITH f AS (
        SELECT user_id, event_id,
          list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vs
        FROM events WHERE user_id % 6 = 2)
      SELECT user_id, event_id,
        round(list_reduce(list_prepend(CAST(0 AS DOUBLE), vs),
            (a, x) -> a * 0.75e0 + x)
          / ((1 - pow(0.75e0, len(vs))) / 0.25e0), 6) AS ewma
      FROM f ORDER BY user_id, event_id"""))

  // R33 TWAP via SQL (q70 used user_id % 7).
  private val q139 = Q(
    "q139_sql_twap",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q139_obs AS
        SELECT * FROM events WHERE user_id % 4 = 1""",
      """SELECT * FROM
        graft_twap('q139_obs', 'user_id', 'ts', 'value', 'event_id')
        ORDER BY user_id"""),
    Some("""WITH obs AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
          round(value, 6) AS v
        FROM events WHERE user_id % 4 = 1),
      d AS (SELECT user_id, v, us,
          lead(us) OVER (PARTITION BY user_id
            ORDER BY us, event_id) - us AS dt
        FROM obs),
      a AS (SELECT user_id, count(*) AS n_obs,
          CAST(sum(CAST(CAST(v AS DECIMAL(18,6))
            * CAST(dt AS DECIMAL(20,0)) AS DECIMAL(38,6)))
            AS DECIMAL(38,6)) AS ws,
          max(us) - min(us) AS span_us
        FROM d GROUP BY 1)
      SELECT user_id, n_obs, span_us,
        CASE WHEN span_us > 0
          THEN round(CAST(ws AS DOUBLE) / CAST(span_us AS DOUBLE), 6)
        END AS twap
      FROM a ORDER BY user_id"""))

  // R42 CUSUM via SQL on the per-user-decile hourly count series with
  // k=0.25, h=3 (q82: per-type series, 0.5/5). (key, hr) is unique by
  // construction of the GROUP BY.
  private val q140 = Q(
    "q140_sql_cusum",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q140_series AS
        SELECT user_id % 10 AS grp,
          unix_micros(date_trunc('hour', ts)) div 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2""",
      """SELECT * FROM
        graft_cusum('q140_series', 'grp', 'hr', 'value', 0.25D, 3.0D)
        ORDER BY grp, hr"""),
    Some("""WITH s AS (SELECT user_id % 10 AS grp,
          epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      mu AS (SELECT grp,
          round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6)))
            AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mu
        FROM s GROUP BY 1),
      c AS (SELECT s.grp, hr, v, mu,
          count(*) OVER w AS i,
          CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6))) OVER w
            AS DECIMAL(38,6)) AS cs
        FROM s JOIN mu USING (grp)
        WINDOW w AS (PARTITION BY s.grp ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cc AS (SELECT grp, hr, v,
          round(CAST(cs AS DOUBLE) - i * (mu + 0.25), 6) AS cup,
          round(-CAST(cs AS DOUBLE) + i * (mu - 0.25), 6) AS cdn
        FROM c),
      sc AS (SELECT grp, hr, v,
          round(cup - least(0.0, min(cup) OVER w2), 6) AS cusum_up,
          round(cdn - least(0.0, min(cdn) OVER w2), 6) AS cusum_dn
        FROM cc WINDOW w2 AS (PARTITION BY grp ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT grp, hr, v AS value, cusum_up, cusum_dn,
        cusum_up > 3.0 OR cusum_dn > 3.0 AS flagged
      FROM sc ORDER BY grp, hr"""))

  // R66 Holt via SQL with α=0.5, β=0.25, horizon 2 (q126:
  // 0.25/0.125/3, a different user slice). The [l,b] LIST accumulator
  // replays the exact IEEE fold (DuckDB list_reduce mutates struct
  // accumulators — the q126 lesson).
  private val q141 = Q(
    "q141_sql_holt",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q141_obs AS
        SELECT * FROM events WHERE user_id % 17 = 5""",
      """SELECT * FROM
        graft_holt('q141_obs', 'user_id', 'ts', 'value', 'event_id',
          0.5D, 0.25D, 2)
        ORDER BY user_id"""),
    Some("""WITH obs AS (SELECT user_id AS k, ts AS t, event_id AS i,
          CAST(value AS DOUBLE) AS v
        FROM events
        WHERE user_id % 17 = 5 AND value IS NOT NULL
          AND ts IS NOT NULL),
      g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
          list(v ORDER BY t, i) AS vs
        FROM obs GROUP BY 1),
      f AS (SELECT k, n, vs,
          CASE WHEN len(vs) >= 2 THEN list_reduce(
            list_prepend([vs[1], vs[2] - vs[1]],
              list_transform(vs[2:], x -> [x, 0.0e0])),
            (acc, x) -> [
              0.5e0 * x[1] + 0.5e0 * (acc[1] + acc[2]),
              0.25e0 * ((0.5e0 * x[1] + 0.5e0 * (acc[1] + acc[2]))
                - acc[1]) + 0.75e0 * acc[2]])
          END AS st
        FROM g)
      SELECT k AS user_id, n,
        CASE WHEN n = 1 THEN round(vs[1], 6)
          ELSE round(st[1], 6) END AS level,
        round(st[2], 6) AS trend,
        round(st[1] + 2.0e0 * st[2], 6) AS forecast
      FROM f ORDER BY user_id"""))

  // R43 ACF via SQL at lags 1..7 on the DAILY count series (q83:
  // hourly, lags 1..25).
  private val q142 = Q(
    "q142_sql_acf",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q142_series AS
        SELECT event_type,
          unix_micros(date_trunc('day', ts)) div 86400000000 AS dy,
          CAST(count(*) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2""",
      """SELECT * FROM
        graft_acf('q142_series', 'event_type', 'dy', 'value', 7)
        ORDER BY event_type, lag"""),
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
          CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      mu AS (SELECT k,
          round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6)))
            AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mu
        FROM s GROUP BY 1),
      d AS (SELECT s.k, dy,
          CAST(round(round(v, 6) - mu, 6) AS DECIMAL(18,6)) AS dd,
          row_number() OVER (PARTITION BY s.k ORDER BY dy) AS rn
        FROM s JOIN mu USING (k)),
      den AS (SELECT k,
          CAST(sum(dd * dd) AS DECIMAL(38,12)) AS ss
        FROM d GROUP BY 1),
      pairs AS (SELECT a.k, l.lag, a.dd AS da, b.dd AS db
        FROM d a
        CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        LEFT JOIN d b ON a.k = b.k AND b.rn = a.rn - l.lag),
      num AS (SELECT k, CAST(lag AS INT) AS lag,
          CAST(count(db) AS BIGINT) AS n_pairs,
          CAST(coalesce(sum(da * db), 0) AS DECIMAL(38,12)) AS sp
        FROM pairs GROUP BY 1, 2),
      j AS (SELECT num.k, lag, n_pairs, sp, ss
        FROM num JOIN den ON num.k = den.k)
      SELECT k AS event_type, lag, n_pairs,
        CASE WHEN n_pairs > 0 AND ss > 0
          THEN round(CAST(sp AS DOUBLE) / CAST(ss AS DOUBLE), 6)
          END AS acf
      FROM j ORDER BY event_type, lag"""))

  // R49 CCF via SQL at lags ±4 with the y series thresholded at 20
  // (q89: ±6, threshold 50).
  private val q143 = Q(
    "q143_sql_ccf",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q143_series AS
        SELECT event_type,
          unix_micros(date_trunc('hour', ts)) div 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS x,
          CAST(count(CASE WHEN value > 20.0 THEN 1 END) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2""",
      """SELECT * FROM
        graft_ccf('q143_series', 'event_type', 'hr', 'x', 'y', 4)
        ORDER BY event_type, lag"""),
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS x,
          CAST(count(*) FILTER (value > 20.0) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      mx AS (SELECT k, round(CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6)))
          AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mx
        FROM s GROUP BY 1),
      my AS (SELECT k, round(CAST(sum(CAST(round(y, 6) AS DECIMAL(18,6)))
          AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS my
        FROM s GROUP BY 1),
      d AS (SELECT s.k, hr,
          CAST(round(round(x, 6) - mx, 6) AS DECIMAL(18,6)) AS dx,
          CAST(round(round(y, 6) - my, 6) AS DECIMAL(18,6)) AS dy,
          row_number() OVER (PARTITION BY s.k ORDER BY hr) AS rn
        FROM s JOIN mx USING (k) JOIN my USING (k)),
      den AS (SELECT k,
          CAST(sum(CAST(dx AS DECIMAL(20,6)) * dx) AS DECIMAL(38,12))
            AS sxx,
          CAST(sum(CAST(dy AS DECIMAL(20,6)) * dy) AS DECIMAL(38,12))
            AS syy
        FROM d GROUP BY 1),
      pairs AS (SELECT a.k, l.lag, a.dx AS da, b.dy AS db
        FROM d a
        CROSS JOIN (SELECT unnest(range(-4, 5)) AS lag) l
        LEFT JOIN d b ON a.k = b.k AND b.rn = a.rn + l.lag),
      num AS (SELECT k, CAST(lag AS INT) AS lag,
          CAST(count(db) AS BIGINT) AS n_pairs,
          CAST(coalesce(sum(CAST(da AS DECIMAL(20,6)) * db), 0)
            AS DECIMAL(38,12)) AS sp
        FROM pairs GROUP BY 1, 2),
      j AS (SELECT num.k, lag, n_pairs, sp, sxx, syy
        FROM num JOIN den ON num.k = den.k)
      SELECT k AS event_type, lag, n_pairs,
        CASE WHEN n_pairs > 0 AND sxx > 0 AND syy > 0
          THEN round(CAST(sp AS DOUBLE)
            / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6)
          END AS ccf
      FROM j ORDER BY event_type, lag"""))

  // R40 seasonal decomposition via SQL with period 7 on the daily
  // series — the ODD-period branch (plain ±3 centered MA; q79
  // exercised the even 2×24 branch). Gap days (a type with zero
  // events that day is a MISSING row) NULL the straddling trends via
  // the count+span gate.
  private val q144 = Q(
    "q144_sql_seasonal",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q144_series AS
        SELECT event_type,
          unix_micros(date_trunc('day', ts)) div 86400000000 AS dy,
          CAST(count(*) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2""",
      """SELECT * FROM
        graft_seasonal('q144_series', 'event_type', 'dy', 'value', 7)
        ORDER BY event_type, dy"""),
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
          CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      b AS (SELECT k, dy, CAST(round(v, 6) AS DECIMAL(18,6)) AS v6,
          CAST(CAST(round(v, 6) AS DECIMAL(18,6)) * 1000000 AS HUGEINT)
            AS v6i
        FROM s),
      w AS (SELECT k, dy, v6,
          count(v6) OVER win AS n_in,
          max(dy) OVER win - min(dy) OVER win AS span_in,
          sum(v6i) OVER win AS m_in,
          dy % 7 AS phase
        FROM b
        WINDOW win AS (PARTITION BY k ORDER BY dy
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      tr AS (SELECT k, dy, v6, phase,
          CASE WHEN n_in = 7 AND span_in = 6
            THEN CAST(CASE WHEN m_in >= 0 THEN (2*m_in + 7) // 14
                 ELSE -((-2*m_in + 7) // 14) END AS DOUBLE) / 1000000.0
            END AS trend
        FROM w),
      sr0 AS (SELECT k, phase,
          sum(CAST(CAST(round(CAST(v6 AS DOUBLE) - trend, 6)
              AS DECIMAL(18,6)) * 1000000 AS HUGEINT)) AS dsm,
          CAST(count(*) AS HUGEINT) AS dn
        FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2),
      sr AS (SELECT k, phase,
          CAST(CASE WHEN dsm >= 0 THEN (2*dsm + dn) // (2*dn)
               ELSE -((-2*dsm + dn) // (2*dn)) END AS DOUBLE)
            / 1000000.0 AS seas_raw
        FROM sr0),
      sc0 AS (SELECT k, phase, seas_raw,
          sum(CAST(CAST(seas_raw AS DECIMAL(18,6)) * 1000000 AS HUGEINT))
            OVER (PARTITION BY k) AS srm,
          CAST(count(*) OVER (PARTITION BY k) AS HUGEINT) AS srn
        FROM sr),
      sc AS (SELECT k, phase,
          round(seas_raw
            - CAST(CASE WHEN srm >= 0 THEN (2*srm + srn) // (2*srn)
                ELSE -((-2*srm + srn) // (2*srn)) END AS DOUBLE)
              / 1000000.0, 6) AS seasonal
        FROM sc0)
      SELECT tr.k AS event_type, tr.dy, CAST(tr.v6 AS DOUBLE) AS value,
        tr.phase, tr.trend, sc.seasonal,
        CASE WHEN tr.trend IS NOT NULL AND sc.seasonal IS NOT NULL
          THEN round(CAST(tr.v6 AS DOUBLE) - tr.trend - sc.seasonal, 6)
          END AS residual
      FROM tr LEFT JOIN sc ON tr.k = sc.k AND tr.phase = sc.phase
      ORDER BY event_type, dy"""))

  // ---------------------------------------------------------------
  // Correlation family
  // ---------------------------------------------------------------

  // A13 Spearman via SQL on discount vs tax (q78: quantity vs price).
  private val q145 = Q(
    "q145_sql_spearman",
    (s, d) => sql(s, d,
      "SELECT * FROM graft_spearman('lineitem', 'l_discount', 'l_tax')"),
    Some("""WITH r AS (SELECT CAST(l_discount AS DOUBLE) AS x,
          CAST(l_tax AS DOUBLE) AS y
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
      hx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1),
      cx AS (SELECT v,
          2 * (CAST(sum(n) OVER (ORDER BY v) AS BIGINT) - n) + n + 1 AS rx
        FROM hx),
      hy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1),
      cy AS (SELECT v,
          2 * (CAST(sum(n) OVER (ORDER BY v) AS BIGINT) - n) + n + 1 AS ry
        FROM hy),
      j AS (SELECT cx.rx, cy.ry FROM r
        JOIN cx ON r.x = cx.v JOIN cy ON r.y = cy.v),
      m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
          coalesce(sum(CAST(rx AS HUGEINT)), 0) AS sx,
          coalesce(sum(CAST(ry AS HUGEINT)), 0) AS sy,
          coalesce(sum(CAST(rx AS HUGEINT) * rx), 0) AS sxx,
          coalesce(sum(CAST(ry AS HUGEINT) * ry), 0) AS syy,
          coalesce(sum(CAST(rx AS HUGEINT) * ry), 0) AS sxy
        FROM j),
      v AS (SELECT n,
          CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
          CAST(n * syy - sy * sy AS DOUBLE) AS vy,
          CAST(n * sxy - sx * sy AS DOUBLE) AS cov
        FROM m)
      SELECT CAST(n AS BIGINT) AS n,
        CASE WHEN n >= 2 AND vx > 0 AND vy > 0
          THEN round(cov / sqrt(vx * vy), 6) END AS rho
      FROM v"""))

  // A14 Kendall tau-b via SQL on linenumber vs quantity — a naturally
  // bounded 7×50 grid, no bucketing needed (q81 bucketed the price).
  private val q146 = Q(
    "q146_sql_kendall",
    (s, d) => sql(s, d,
      "SELECT * FROM graft_kendall('lineitem', 'l_linenumber', 'l_quantity')"),
    Some("""WITH r AS (SELECT CAST(l_linenumber AS DOUBLE) AS x,
          CAST(l_quantity AS DOUBLE) AS y
        FROM lineitem
        WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL),
      cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn
        FROM r GROUP BY 1, 2),
      grid AS (SELECT xs.x, ys.y, coalesce(c.cn, 0) AS cn
        FROM (SELECT DISTINCT x FROM cells) xs
        CROSS JOIN (SELECT DISTINCT y FROM cells) ys
        LEFT JOIN cells c ON xs.x = c.x AND ys.y = c.y),
      c1 AS (SELECT x, y, cn,
          CAST(sum(cn) OVER (PARTITION BY y ORDER BY x) AS BIGINT) AS cx,
          CAST(sum(cn) OVER (PARTITION BY x ORDER BY y) AS BIGINT) AS cy
        FROM grid),
      c2 AS (SELECT x, y, cn, cx, cy,
          CAST(sum(cx) OVER (PARTITION BY x ORDER BY y) AS BIGINT) AS cum
        FROM c1),
      xt AS (SELECT x, CAST(sum(cn) AS BIGINT) AS tx FROM cells GROUP BY 1),
      xtc AS (SELECT x, tx,
          CAST(sum(tx) OVER (ORDER BY x) AS BIGINT) AS txc FROM xt),
      pq AS (SELECT
          coalesce(sum(CAST(c2.cn AS HUGEINT)
            * (c2.cum - c2.cx - c2.cy + c2.cn)), 0) AS p,
          coalesce(sum(CAST(c2.cn AS HUGEINT)
            * ((xtc.txc - xtc.tx) - (c2.cum - c2.cy))), 0) AS q,
          CAST(coalesce(sum(c2.cn), 0) AS HUGEINT) AS n
        FROM c2 JOIN xtc ON c2.x = xtc.x WHERE c2.cn > 0),
      m AS (SELECT p, q, n,
          (SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1)), 0)
            FROM (SELECT sum(cn) AS t FROM cells GROUP BY x)) AS n1m,
          (SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1)), 0)
            FROM (SELECT sum(cn) AS t FROM cells GROUP BY y)) AS n2m
        FROM pq)
      SELECT CAST(n AS BIGINT) AS n,
        CASE WHEN n >= 2
            AND CAST(n * (n - 1) - n1m AS DOUBLE)
              * CAST(n * (n - 1) - n2m AS DOUBLE) > 0
          THEN round(2.0 * CAST(p - q AS DOUBLE)
            / sqrt(CAST(n * (n - 1) - n1m AS DOUBLE)
              * CAST(n * (n - 1) - n2m AS DOUBLE)), 6) END AS tau
      FROM m"""))

  // R52 mutual information via SQL on returnflag × linestatus (q92:
  // order status × priority).
  private val q147 = Q(
    "q147_sql_mutual_info",
    (s, d) => sql(s, d,
      "SELECT * FROM graft_mutual_info('lineitem', 'l_returnflag', 'l_linestatus')"),
    Some("""WITH cells AS (SELECT l_returnflag AS a,
          l_linestatus AS b, CAST(count(*) AS BIGINT) AS nab
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        GROUP BY 1, 2),
      at AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na
        FROM cells GROUP BY 1),
      bt AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb
        FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM cells),
      mi AS (SELECT CAST(coalesce(sum(CAST(nab AS DECIMAL(38,12))
            * CAST(round(ln(CAST(nab AS DOUBLE) * n
                / (CAST(na AS DOUBLE) * nb)), 12) AS DECIMAL(38,12))),
          0) AS DECIMAL(38,12)) AS m
        FROM cells JOIN at USING (a) JOIN bt USING (b) CROSS JOIN tot),
      ha AS (SELECT CAST(coalesce(sum(CAST(na AS DECIMAL(38,12))
            * CAST(round(ln(CAST(na AS DOUBLE) / n), 12)
              AS DECIMAL(38,12))), 0) AS DECIMAL(38,12)) AS h
        FROM at CROSS JOIN tot),
      hb AS (SELECT CAST(coalesce(sum(CAST(nb AS DECIMAL(38,12))
            * CAST(round(ln(CAST(nb AS DOUBLE) / n), 12)
              AS DECIMAL(38,12))), 0) AS DECIMAL(38,12)) AS h
        FROM bt CROSS JOIN tot)
      SELECT n,
        round(CAST(m AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mi_nats,
        CASE WHEN -CAST(ha.h AS DOUBLE) / CAST(n AS DOUBLE) > 0
            AND -CAST(hb.h AS DOUBLE) / CAST(n AS DOUBLE) > 0
          THEN round((CAST(m AS DOUBLE) / CAST(n AS DOUBLE))
            / sqrt((-CAST(ha.h AS DOUBLE) / CAST(n AS DOUBLE))
              * (-CAST(hb.h AS DOUBLE) / CAST(n AS DOUBLE))), 6)
          END AS normalized_mi
      FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN tot"""))

  // R37 Benford via SQL on extended price at scale 1 (q74: order
  // totals at scale 2).
  private val q148 = Q(
    "q148_sql_benford",
    (s, d) => sql(s, d,
      "SELECT * FROM graft_benford('lineitem', 'l_extendedprice', 1) ORDER BY digit"),
    Some("""WITH v AS (
        SELECT CAST(round(abs(l_extendedprice) * 10, 0) AS BIGINT) AS v2
        FROM lineitem),
      c AS (SELECT CAST(substr(CAST(v2 AS VARCHAR), 1, 1) AS INTEGER)
          AS digit, count(*) AS observed
        FROM v WHERE v2 > 0 GROUP BY 1),
      n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM c),
      g AS (SELECT d.digit, coalesce(c.observed, 0) AS observed,
          n.n_total,
          round(log10(1.0 + 1.0 / d.digit), 6) AS exp_p
        FROM range(1, 10) d(digit) LEFT JOIN c USING (digit), n),
      e AS (SELECT digit, observed, n_total, exp_p,
          round(exp_p * n_total, 6) AS expected,
          round(CAST(observed AS DOUBLE) / n_total, 6) AS obs_p
        FROM g),
      tt AS (SELECT *,
          CAST(round(CAST(CAST((observed - expected) * (observed - expected)
            / expected AS VARCHAR) AS DECIMAL(38,20)), 12) AS DOUBLE) AS term
        FROM e),
      st AS (SELECT round(CAST(sum(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,12)))
          AS DOUBLE), 6) AS chi2 FROM tt)
      SELECT tt.digit, tt.observed, tt.expected, tt.obs_p, tt.exp_p,
        tt.term, st.chi2, CAST(8 AS BIGINT) AS dof, tt.n_total
      FROM tt, st ORDER BY tt.digit"""))

  // R53 Mann-Kendall via SQL (q96: user_id % 9).
  private val q149 = Q(
    "q149_sql_mann_kendall",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q149_obs AS
        SELECT * FROM events WHERE user_id % 14 = 2""",
      """SELECT * FROM
        graft_mann_kendall('q149_obs', 'user_id', 'ts', 'value', 'event_id')
        ORDER BY user_id"""),
    Some("""WITH obs AS (
        SELECT user_id AS k, ts AS t, event_id AS i, value AS v
        FROM events
        WHERE user_id % 14 = 2 AND value IS NOT NULL AND ts IS NOT NULL),
      p AS (SELECT a.k,
          sum(CASE WHEN b.v > a.v THEN 1
            WHEN b.v < a.v THEN -1 ELSE 0 END) AS s
        FROM obs a JOIN obs b ON a.k = b.k
          AND (a.t < b.t OR (a.t = b.t AND a.i < b.i))
        GROUP BY 1),
      tg AS (SELECT k, v, count(*) AS t FROM obs GROUP BY 1, 2),
      ties AS (SELECT k,
          CAST(sum(CAST(t*(t-1)*(2*t+5) AS DECIMAL(38,0)))
            AS DECIMAL(38,0)) AS tie_term
        FROM tg GROUP BY 1),
      nk AS (SELECT k, count(*) AS n FROM obs GROUP BY 1),
      j AS (SELECT nk.k, nk.n, coalesce(p.s, 0) AS s,
          CAST(CAST(nk.n AS DECIMAL(38,0)) * (nk.n - 1) * (2*nk.n + 5)
            AS DECIMAL(38,0)) - ties.tie_term AS var_num
        FROM nk LEFT JOIN p USING (k) JOIN ties USING (k)),
      zz AS (SELECT k, n, s,
          CASE WHEN n >= 2 AND var_num > 0 THEN
            round((CASE WHEN s > 0 THEN s - 1
                WHEN s < 0 THEN s + 1 ELSE 0 END)
              / sqrt(CAST(var_num AS DOUBLE) / 18.0), 6) END AS z
        FROM j)
      SELECT k AS user_id, n, CAST(s AS BIGINT) AS s, z,
        CASE WHEN z IS NULL THEN NULL
          WHEN z > 1.96 THEN 'increasing'
          WHEN z < -1.96 THEN 'decreasing'
          ELSE 'no_trend' END AS trend
      FROM zz ORDER BY user_id"""))

  // R54 Theil–Sen via SQL (q97: user_id % 9).
  private val q150 = Q(
    "q150_sql_theil_sen",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q150_obs AS
        SELECT * FROM events WHERE user_id % 15 = 4""",
      """SELECT * FROM
        graft_theil_sen('q150_obs', 'user_id', 'ts', 'value')
        ORDER BY user_id"""),
    Some("""WITH obs AS (
        SELECT user_id AS k, epoch_us(ts) AS us, value AS v
        FROM events
        WHERE user_id % 15 = 4 AND value IS NOT NULL AND ts IS NOT NULL),
      p AS (SELECT a.k,
          (b.v - a.v) * 86400000000.0 / CAST(b.us - a.us AS DOUBLE)
            AS slope
        FROM obs a JOIN obs b ON a.k = b.k AND a.us < b.us),
      g AS (SELECT k, list(slope ORDER BY slope) AS ss,
          count(*) AS n_pairs
        FROM p GROUP BY 1),
      nk AS (SELECT k, count(*) AS n FROM obs GROUP BY 1)
      SELECT nk.k AS user_id, nk.n,
        coalesce(g.n_pairs, 0) AS n_pairs,
        round(CASE WHEN g.n_pairs % 2 = 0
            THEN (ss[CAST(g.n_pairs//2 AS INT)]
              + ss[CAST(g.n_pairs//2 AS INT) + 1]) / 2.0
            ELSE ss[CAST((g.n_pairs+1)//2 AS INT)] END, 6) + 0.0
          AS sen_slope
      FROM nk LEFT JOIN g USING (k) ORDER BY user_id"""))

  // ---------------------------------------------------------------
  // Linkage family
  // ---------------------------------------------------------------

  // R28 entity resolution via SQL: the dirty feed drops each record's
  // FIRST token (a text-domain corruption both engines replay from the
  // same view definition; er_match used the P24 token dropout), τ=0.4.
  // Oracle = the UNBLOCKED full-cross argmax — a hash match proves
  // blocking recall 1 (the er_match discipline).
  private val q151 = Q(
    "q151_sql_er_match",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q151_dirty AS
        SELECT doc_id AS dirty_id,
          regexp_replace(trim(text), '^\\S+\\s+', '') AS text
        FROM documents WHERE doc_id % 4 = 1""",
      """CREATE OR REPLACE TEMP VIEW q151_clean AS
        SELECT doc_id AS clean_id, text FROM documents""",
      """SELECT * FROM graft_er_match('q151_dirty', 'q151_clean', 0.4D)
        ORDER BY dirty_id"""),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      dirty AS (SELECT doc_id AS dirty_id,
          string_split_regex(trim(lower(
            regexp_replace(trim(text), '^\S+\s+', ''))), '\s+') AS ks
        FROM documents WHERE doc_id % 4 = 1),
      dsh AS (SELECT dirty_id, unnest(CASE WHEN len(ks) < 3
          THEN [list_aggregate(ks, 'string_agg', ' ')]
          ELSE list_distinct([ks[i] || ' ' || ks[i+1] || ' ' || ks[i+2]
                              for i in range(1, len(ks) - 1)]) END) AS sh
        FROM dirty),
      csh AS (SELECT doc_id AS clean_id, unnest(CASE WHEN len(ts) < 3
          THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END) AS sh
        FROM t),
      dsz AS (SELECT dirty_id, count(*) AS sz FROM dsh GROUP BY 1),
      csz AS (SELECT clean_id, count(*) AS sz FROM csh GROUP BY 1),
      inter AS (SELECT d.dirty_id, c.clean_id, count(*) AS i
        FROM dsh d JOIN csh c ON d.sh = c.sh GROUP BY 1, 2),
      sims AS (SELECT dirty_id, clean_id,
          round(CAST(i AS DOUBLE) / (ds.sz + cs.sz - i), 6) AS sim
        FROM inter JOIN dsz ds USING (dirty_id) JOIN csz cs USING (clean_id)),
      ranked AS (SELECT dirty_id, clean_id, sim,
          row_number() OVER (PARTITION BY dirty_id
            ORDER BY sim DESC, clean_id) AS rn
        FROM sims WHERE sim >= 0.4),
      best AS (SELECT dirty_id, clean_id AS match_id, sim
        FROM ranked WHERE rn = 1)
      SELECT d.dirty_id, b.match_id, b.sim
      FROM dirty d LEFT JOIN best b USING (dirty_id)
      ORDER BY d.dirty_id"""))

  // R47 edit-distance join via SQL on 24-char prefixes at k=1 (q87:
  // 32 chars, k=2). Oracle = the UNBLOCKED cross join: recall 1.
  private val q152 = Q(
    "q152_sql_editdist",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q152_docs AS
        SELECT doc_id AS id, substring(lower(text), 1, 24) AS s
        FROM documents""",
      """SELECT * FROM graft_editdist('q152_docs', 'id', 's', 1)
        ORDER BY a_id, b_id"""),
    Some("""WITH d AS (SELECT doc_id AS id, substr(lower(text), 1, 24) AS s
        FROM documents WHERE text IS NOT NULL)
      SELECT a.id AS a_id, b.id AS b_id,
        CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      FROM d a JOIN d b ON a.id < b.id
        AND abs(length(a.s) - length(b.s)) <= 1
      WHERE levenshtein(a.s, b.s) <= 1
      ORDER BY a_id, b_id"""))

  // ---------------------------------------------------------------
  // Change-data family
  // ---------------------------------------------------------------

  // R29 snapshot diff via SQL: next drops keys ≡2 (mod 9), reprices
  // keys ≡0 (mod 5) by +7.5, adds shifted keys ≡4 (mod 17) — all
  // classes distinct from q66's vintages.
  private val q153 = Q(
    "q153_sql_snapshot_diff",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q153_prev AS
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders""",
      """CREATE OR REPLACE TEMP VIEW q153_next AS
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 7.5
               ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 9 <> 2
        UNION ALL
        SELECT o_orderkey + 200000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 17 = 4""",
      """SELECT o_orderkey, op, o_custkey, o_totalprice
        FROM graft_snapshot_diff('q153_prev', 'q153_next', 'o_orderkey')
        ORDER BY o_orderkey"""),
    Some("""WITH prev AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      next AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 7.5
               ELSE o_totalprice END AS o_totalprice
        FROM prev WHERE o_orderkey % 9 <> 2
        UNION ALL
        SELECT o_orderkey + 200000000, o_custkey, o_totalprice
        FROM prev WHERE o_orderkey % 17 = 4),
      d AS (
        SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
          CASE WHEN p.o_orderkey IS NULL THEN 'I'
               WHEN n.o_orderkey IS NULL THEN 'D'
               WHEN p.o_custkey IS NOT DISTINCT FROM n.o_custkey
                AND p.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                 THEN NULL
               ELSE 'U' END AS op,
          CASE WHEN n.o_orderkey IS NULL THEN p.o_custkey
               ELSE n.o_custkey END AS o_custkey,
          CASE WHEN n.o_orderkey IS NULL THEN p.o_totalprice
               ELSE n.o_totalprice END AS o_totalprice
        FROM prev p FULL OUTER JOIN next n
          ON p.o_orderkey = n.o_orderkey)
      SELECT o_orderkey, op, o_custkey, o_totalprice
      FROM d WHERE op IS NOT NULL ORDER BY o_orderkey"""))

  // R18 SCD2 historize via SQL (q53: o_custkey % 50).
  private val q154 = Q(
    "q154_sql_scd2",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q154_obs AS
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM orders WHERE o_custkey % 30 = 7""",
      """SELECT o_custkey, o_orderkey, valid_from, valid_to, is_current
        FROM graft_scd2('q154_obs', 'o_custkey', 'o_orderdate', 'o_orderkey')
        ORDER BY o_custkey, valid_from, o_orderkey"""),
    Some("""SELECT o_custkey, o_orderkey,
        CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS TIMESTAMP) AS valid_to,
        (lead(o_orderdate) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
      FROM orders WHERE o_custkey % 30 = 7
      ORDER BY o_custkey, valid_from, o_orderkey"""))

  // ---------------------------------------------------------------
  // Retrieval-eval family — a GENERIC ranked view (events as the
  // candidate frame: query = event type, doc = event id, score =
  // value), distinct from the BM25-composed text_* twins.
  // ---------------------------------------------------------------

  // P27 NDCG@10 via SQL with a graded 0..2 relevance.
  private val q155 = Q(
    "q155_sql_ndcg",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q155_ranked AS
        SELECT event_type, event_id, CAST(value AS DOUBLE) AS score,
          CAST(pmod(user_id, 3) AS BIGINT) AS rel
        FROM events WHERE value IS NOT NULL""",
      """SELECT * FROM
        graft_ndcg('q155_ranked', 'event_type', 'event_id', 'score', 'rel', 10)
        ORDER BY event_type"""),
    Some("""WITH r AS (SELECT event_type, event_id,
          CAST(value AS DOUBLE) AS score, user_id % 3 AS rel
        FROM events WHERE value IS NOT NULL),
      w AS (SELECT event_type, rel,
          row_number() OVER (PARTITION BY event_type
            ORDER BY score DESC, event_id) AS rs,
          row_number() OVER (PARTITION BY event_type
            ORDER BY rel DESC, event_id) AS ri
        FROM r),
      t AS (SELECT event_type,
          CASE WHEN rs <= 10 THEN round((pow(2.0, rel) - 1.0)
            / log2(rs + 1.0), 12) ELSE 0.0 END AS dterm,
          CASE WHEN ri <= 10 THEN round((pow(2.0, rel) - 1.0)
            / log2(ri + 1.0), 12) ELSE 0.0 END AS iterm
        FROM w),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_docs,
          round(CAST(sum(CAST(dterm AS DECIMAL(38,12))) AS DOUBLE), 6)
            AS dcg,
          round(CAST(sum(CAST(iterm AS DECIMAL(38,12))) AS DOUBLE), 6)
            AS idcg
        FROM t GROUP BY 1)
      SELECT event_type, n_docs, dcg, idcg,
        CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) END AS ndcg
      FROM a ORDER BY event_type"""))

  // P27b precision/recall/RR@10 via SQL with binary relevance
  // value > 30.
  private val q156 = Q(
    "q156_sql_retrieval",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q156_ranked AS
        SELECT event_type, event_id, CAST(value AS DOUBLE) AS score,
          CASE WHEN value > 30 THEN 1L ELSE 0L END AS rel
        FROM events WHERE value IS NOT NULL""",
      """SELECT * FROM
        graft_retrieval_eval('q156_ranked', 'event_type', 'event_id', 'score', 'rel', 10)
        ORDER BY event_type"""),
    Some("""WITH r AS (SELECT event_type, event_id,
          CAST(value AS DOUBLE) AS score,
          CASE WHEN value > 30 THEN 1 ELSE 0 END AS rel
        FROM events WHERE value IS NOT NULL),
      w AS (SELECT event_type, rel,
          row_number() OVER (PARTITION BY event_type
            ORDER BY score DESC, event_id) AS rs
        FROM r),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
          CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
          CAST(sum(CASE WHEN rel > 0 AND rs <= 10 THEN 1 ELSE 0 END)
            AS BIGINT) AS rk,
          min(CASE WHEN rel > 0 THEN rs END) AS fr
        FROM w GROUP BY 1)
      SELECT event_type, nd AS n_docs, nr AS n_rel, rk AS rel_at_k,
        round(CAST(rk AS DOUBLE) / 10, 6) AS precision_k,
        CASE WHEN nr > 0 THEN round(CAST(rk AS DOUBLE) / nr, 6) END
          AS recall_k,
        CASE WHEN nr = 0 THEN NULL
          WHEN fr <= 10 THEN round(1.0 / fr, 6)
          ELSE 0.0 END AS rr_k
      FROM a ORDER BY event_type"""))

  // P27c average precision via SQL with binary relevance value > 60.
  private val q157 = Q(
    "q157_sql_map",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q157_ranked AS
        SELECT event_type, event_id, CAST(value AS DOUBLE) AS score,
          CASE WHEN value > 60 THEN 1L ELSE 0L END AS rel
        FROM events WHERE value IS NOT NULL""",
      """SELECT * FROM
        graft_map('q157_ranked', 'event_type', 'event_id', 'score', 'rel')
        ORDER BY event_type"""),
    Some("""WITH r AS (SELECT event_type, event_id,
          CAST(value AS DOUBLE) AS score,
          CASE WHEN value > 60 THEN 1 ELSE 0 END AS reli
        FROM events WHERE value IS NOT NULL),
      w AS (SELECT event_type, reli,
          row_number() OVER (PARTITION BY event_type
            ORDER BY score DESC, event_id) AS rs
        FROM r),
      c AS (SELECT event_type, rs, reli,
          sum(reli) OVER (PARTITION BY event_type ORDER BY rs
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
        FROM w),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
          CAST(sum(reli) AS BIGINT) AS nr,
          coalesce(sum(CASE WHEN reli = 1 THEN
            CAST(round(CAST(cr AS DOUBLE) / rs, 12) AS DECIMAL(38,12))
            END), 0) AS s
        FROM c GROUP BY 1)
      SELECT event_type, nd AS n_docs, nr AS n_rel,
        CASE WHEN nr > 0 THEN round(CAST(s AS DOUBLE) / nr, 6) END AS ap
      FROM a ORDER BY event_type"""))

  // ---------------------------------------------------------------
  // Behavioral-analytics + diagnostics remainder (r11 continuation):
  // retention, transitions, rolling z-score, skew profile — after
  // these, every relational/time-series/behavioral operator family
  // has a SQL route.
  // ---------------------------------------------------------------

  // R20 weekly retention via SQL on a user slice (q56: all users).
  private val q159 = Q(
    "q159_sql_retention",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q159_ev AS
        SELECT * FROM events WHERE user_id % 3 <> 0""",
      """SELECT * FROM graft_retention('q159_ev')
        ORDER BY cohort_week, week_offset"""),
    Some("""WITH first AS (
        SELECT user_id,
          CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events WHERE user_id % 3 <> 0 GROUP BY 1),
      act AS (
        SELECT DISTINCT user_id,
          CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        FROM events WHERE user_id % 3 <> 0)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset,
        count(*) AS n_users
      FROM act JOIN first USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // R22 transition matrix via SQL over high-value events only (q58:
  // all events).
  private val q160 = Q(
    "q160_sql_transitions",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q160_ev AS
        SELECT * FROM events WHERE value > 10.0""",
      """SELECT * FROM graft_transitions('q160_ev')
        ORDER BY from_type, to_type"""),
    Some("""WITH l AS (
        SELECT user_id,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS from_type,
          event_type AS to_type
        FROM events WHERE value > 10.0)
      SELECT from_type, to_type, count(*) AS n
      FROM l WHERE from_type IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // R27 rolling z-score via SQL with span 10 / minObs 3 / threshold
  // 2.5 on a user slice (q64: 20/5/3.0, all users).
  private val q161 = Q(
    "q161_sql_zscore",
    (s, d) => sql(s, d,
      """CREATE OR REPLACE TEMP VIEW q161_ev AS
        SELECT event_id, user_id, unix_micros(ts) AS us,
          CAST(value AS DOUBLE) AS value
        FROM events WHERE user_id % 5 = 2""",
      """SELECT * FROM
        graft_zscore('q161_ev', 'user_id', 'us', 'value', 'event_id', 10, 3, 2.5D)
        ORDER BY user_id, us, event_id"""),
    Some("""WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS us,
          CAST(value AS DOUBLE) AS value
        FROM events WHERE user_id % 5 = 2),
      sc AS (SELECT event_id, user_id, us, value,
          count(value) OVER w AS roll_n,
          round(avg(value) OVER w, 6) AS m6,
          round(stddev_samp(value) OVER w, 6) AS s6
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, us, value, roll_n,
        CASE WHEN roll_n >= 3 AND s6 > 0
          THEN round((value - m6) / s6, 4) END AS z,
        coalesce(abs(CASE WHEN roll_n >= 3 AND s6 > 0
          THEN round((value - m6) / s6, 4) END) > 2.5, false) AS flagged
      FROM sc ORDER BY user_id, us, event_id"""))

  // R34 skew profile via SQL over the orders priority key (q71: the
  // events type key, topK 5 / threshold 4).
  private val q162 = Q(
    "q162_sql_skew",
    (s, d) => sql(s, d,
      """SELECT * FROM graft_skew('orders', 'o_orderpriority', 3, 2.0D)
        ORDER BY rank"""),
    Some("""WITH c AS (
        SELECT o_orderpriority, count(*) AS n_rows FROM orders GROUP BY 1),
      g AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
          count(*) AS n_keys, max(n_rows) AS mx FROM c),
      r AS (SELECT o_orderpriority, n_rows,
          row_number() OVER (ORDER BY n_rows DESC, o_orderpriority) AS rank
        FROM c)
      SELECT r.o_orderpriority, r.n_rows, r.rank, g.n_total, g.n_keys,
        round(CAST(r.n_rows AS DOUBLE) / g.n_total, 6) AS share,
        round(CAST(g.n_total AS DOUBLE) / g.n_keys, 6) AS avg_rows,
        round(CAST(g.mx AS DOUBLE) * g.n_keys / g.n_total, 6)
          AS skew_factor,
        round(CAST(g.mx AS DOUBLE) * g.n_keys / g.n_total, 6) > 2.0
          AS salt_recommended
      FROM r, g WHERE r.rank <= 3 ORDER BY r.rank"""))

  // ---------------------------------------------------------------
  // Pipeline-assembly family (r12 — the SQL-parity close): mixture /
  // split / packing / quota / profile / bm25-topk are pure frame→frame
  // operators, so they get TVFs + their own oracles under SECOND
  // parameterizations. Write-path assembly ops (corpus sharding IO,
  // index builds) stay code-surface-only: a TVF returns a relation and
  // cannot own a side-effecting write (§2 note).
  // ---------------------------------------------------------------

  // P16 mixture sampling via SQL (mix_sample: src0:2500/src1:0/
  // src2:10000 default 5000 — here src1:7500/src2:1000 default 3000).
  private val q163 = Q(
    "q163_sql_mix",
    (s, d) => sql(s, d,
      """SELECT doc_id, source, mix_bucket, mix_rate_bp, keep
        FROM graft_mix('documents', 'src1:7500,src2:1000', 3000)
        ORDER BY doc_id"""),
    Some("""SELECT doc_id, source,
        (CAST(doc_id AS BIGINT) * 2246822519) % 4294967296 % 10000
          AS mix_bucket,
        CASE WHEN source = 'src1' THEN 7500
             WHEN source = 'src2' THEN 1000 ELSE 3000 END AS mix_rate_bp,
        (CAST(doc_id AS BIGINT) * 2246822519) % 4294967296 % 10000 <
          CASE WHEN source = 'src1' THEN 7500
               WHEN source = 'src2' THEN 1000 ELSE 3000 END AS "keep"
      FROM documents ORDER BY doc_id"""))

  // P13 hash split via SQL (split_train: 80/10/10 — here 70/15/15).
  private val q164 = Q(
    "q164_sql_split",
    (s, d) => sql(s, d,
      """SELECT doc_id, split_bucket, split
        FROM graft_split('documents', 'doc_id', 'train:70,val:15,test:15')
        ORDER BY doc_id"""),
    Some("""SELECT doc_id,
        (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 % 100
          AS split_bucket,
        CASE WHEN (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 % 100 < 70
          THEN 'train'
          WHEN (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 % 100 < 85
          THEN 'val' ELSE 'test' END AS split
      FROM documents ORDER BY doc_id"""))

  // P12 sequence packing via SQL (pack_sequences: capacity 1024 over 8
  // shards — here 512 over 4).
  private val q165 = Q(
    "q165_sql_pack",
    (s, d) => sql(s, d,
      """SELECT shard, chunk_idx, doc_id, doc_from, doc_to, chunk_off
        FROM graft_pack('documents', 512, 4)
        ORDER BY shard, chunk_idx, doc_id"""),
    Some("""WITH t AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens,
          CAST(doc_id % 4 AS BIGINT) AS shard
        FROM documents),
      s AS (
        SELECT doc_id, shard, n_tokens,
          coalesce(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS tok_start
        FROM t),
      e AS (SELECT *, tok_start + n_tokens AS tok_end FROM s),
      x AS (
        SELECT shard, doc_id, tok_start, tok_end,
          unnest(range(tok_start // 512, (tok_end - 1) // 512 + 1))
            AS chunk_idx
        FROM e)
      SELECT shard, chunk_idx, doc_id,
        greatest(tok_start, chunk_idx * 512) - tok_start AS doc_from,
        least(tok_end, (chunk_idx + 1) * 512) - tok_start AS doc_to,
        greatest(tok_start, chunk_idx * 512) - chunk_idx * 512 AS chunk_off
      FROM x ORDER BY shard, chunk_idx, doc_id"""))

  // P12d whole-doc bin packing via SQL (pack_bins: capacity 1024 / 8
  // shards / maxClass 16 — here 512 / 4 / 8).
  private val q169 = Q(
    "q169_sql_pack_bins",
    (s, d) => sql(s, d,
      """SELECT shard, size_class, bin_idx, doc_id, n_tokens, bin_fill,
          oversize
        FROM graft_pack_bins('documents', 512, 4, 8)
        ORDER BY shard, size_class, bin_idx, doc_id"""),
    Some("""WITH t AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens,
          CAST(doc_id % 4 AS BIGINT) AS shard
        FROM documents),
      c AS (SELECT *, least(512 // n_tokens, 8) AS size_class FROM t),
      r AS (SELECT *,
          CAST(row_number() OVER (PARTITION BY shard, size_class
            ORDER BY doc_id) AS BIGINT) - 1 AS rn,
          CASE WHEN size_class = 0 THEN 1 ELSE size_class END AS k
        FROM c),
      a AS (SELECT shard, size_class, rn // k AS bin_idx, doc_id,
          n_tokens
        FROM r)
      SELECT shard, size_class, bin_idx, doc_id, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY shard, size_class, bin_idx)
          AS BIGINT) AS bin_fill,
        size_class = 0 AS oversize
      FROM a ORDER BY shard, size_class, bin_idx, doc_id"""))

  // P20 quota sampling via SQL (quota_sample: 10 per group — here 25).
  private val q166 = Q(
    "q166_sql_quota",
    (s, d) => sql(s, d,
      """SELECT doc_id, source, q_rank, kept
        FROM graft_quota('documents', 25)
        ORDER BY doc_id"""),
    Some("""WITH k AS (
        SELECT doc_id, source,
          (CAST(doc_id AS BIGINT) * 2971215073) % 4294967296 AS q_key
        FROM documents),
      b AS (SELECT doc_id, source, q_key, q_key // 4194304 AS q_bucket
        FROM k),
      h AS (SELECT source, q_bucket, count(*) AS bcount
        FROM b GROUP BY 1, 2),
      c AS (SELECT source, q_bucket,
        coalesce(sum(bcount) OVER (PARTITION BY source ORDER BY q_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS cum_before
        FROM h),
      r AS (SELECT b.doc_id, b.source, c.cum_before,
        CAST(row_number() OVER (PARTITION BY b.source
          ORDER BY b.q_key, b.doc_id) AS BIGINT) AS grank
        FROM b JOIN c USING (source, q_bucket))
      SELECT doc_id, source,
        CASE WHEN cum_before < 25 THEN grank END AS q_rank,
        coalesce(CASE WHEN cum_before < 25 THEN grank END <= 25, false)
          AS kept
      FROM r ORDER BY doc_id"""))

  // P18f BM25 top-k via SQL (text_bm25: spark/hash/window k=20 — here
  // data/join/stream k=15).
  private val q167 = Q(
    "q167_sql_bm25",
    (s, d) => sql(s, d,
      """SELECT doc_id, dl, n_terms, bm25
        FROM graft_bm25_topk('documents', 'data join stream', 15)
        ORDER BY bm25 DESC, doc_id"""),
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('data', 'join', 'stream') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, dl,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st)
      SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
        CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM sc GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 15"""))

  // A12 column profiler via SQL (q54: the four lineitem decimal-ish
  // measures — here the two long join keys, a different stat mix).
  private val q168 = Q(
    "q168_sql_profile",
    (s, d) => sql(s, d,
      """SELECT col_name, n_rows, n_nulls, min_v, max_v, mean_v,
          ndv_exact, ndv_ok
        FROM graft_profile('lineitem', 'l_partkey,l_suppkey')
        ORDER BY col_name"""),
    Some(Seq("l_partkey", "l_suppkey").map(c => s"""SELECT
          '$c' AS col_name,
          count(*) AS n_rows,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          min($c) AS min_v, max($c) AS max_v,
          round(CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)
            / count($c), 6) AS mean_v,
          count(DISTINCT $c) AS ndv_exact,
          CAST(1 AS BOOLEAN) AS ndv_ok
        FROM lineitem""").mkString("SELECT * FROM (\n",
      "\nUNION ALL\n", "\n) ORDER BY col_name")))

  // IO12's read half via SQL: scan the tar shards shards_roundtrip
  // writes (built here if absent — same scratch root and media slice)
  // and project record names + payload lengths; byte_len is DuckDB-
  // recomputed from the PPM seed formula like the DataFrame twin.
  private val q170 = Q(
    "q170_sql_shards",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(3)) === 0)
      val media = graft.pipeline.Multimodal.mediaTable(docs)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.col("doc_id").cast("string"),
            org.apache.spark.sql.functions.lit(".ppm")).as("name"),
          org.apache.spark.sql.functions.col("media"))
      val root = graft.GraftSession.scratchDir(
        "tar_shards_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      if (!new java.io.File(root).exists() ||
          new java.io.File(root).listFiles() == null ||
          !new java.io.File(root).listFiles().exists(
            _.getName.endsWith(".tar")))
        graft.sources.Shards.writeTarShards(media, root, nShards = 8)
      sql(s, d,
        s"""SELECT CAST(substring_index(name, '.', 1) AS BIGINT) AS doc_id,
          CAST(length(bytes) AS BIGINT) AS byte_len
        FROM graft_read_shards('$root')
        ORDER BY doc_id""")
    },
    Some("""WITH s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents WHERE doc_id % 3 = 0),
      dims AS (SELECT doc_id, 4 + seed % 29 AS w,
          4 + (seed // 65536) % 29 AS h FROM s)
      SELECT doc_id,
        CAST(length('P6' || chr(10) || CAST(w AS VARCHAR) || ' '
            || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))
          + w * h * 3 AS BIGINT) AS byte_len
      FROM dims ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(q136, q137, q138, q139, q140, q141, q142, q143,
    q144, q145, q146, q147, q148, q149, q150, q151, q152, q153, q154,
    q155, q156, q157, q159, q160, q161, q162, q163, q164, q165, q166,
    q167, q168, q169, q170)
}
