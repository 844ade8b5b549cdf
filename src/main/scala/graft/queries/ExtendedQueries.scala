package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Coverage beyond the first core batch: quantile interpolation modes,
  * UNION DISTINCT, extra join types, null-safe equality, decimals,
  * array_agg, and oracle-checked sessionization (SURVEY.md §2).
  */
object ExtendedQueries {

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.load(s, d, n)

  // UNION DISTINCT (LogicalUnion is_all=false, Node.h:849).
  private val q10b = Q(
    "q10b_union_distinct",
    (s, d) => {
      val ord = t(s, d, "orders")
      val a = ord.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      val b = ord.filter(col("o_orderpriority") === "1-URGENT")
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      UNION
      SELECT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
      ORDER BY o_custkey"""))

  // All five Interpolation modes of AggType kQuantile
  // (OpTypeEnums.h:117 kLower/kHigher/kNearest/kMidpoint/kLinear).
  // Expressed over the sorted group array with explicit index math so
  // Spark and DuckDB compute identical doubles ("nearest" uses
  // floor(x+0.5) to avoid round-half mode differences). The sort is the
  // honest cost of exact interpolated quantiles; percentile_approx is
  // the no-sort path (q19b).
  private val q19c = Q(
    "q19c_quantile_interp",
    (s, d) => {
      val p = 0.37
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sort_array(collect_list(col("l_quantity"))).as("xs"))
        .select(
          col("l_returnflag"),
          expr(s"element_at(xs, cast(floor((size(xs) - 1) * $p) as int) + 1)").as("q_lower"),
          expr(s"element_at(xs, cast(ceil((size(xs) - 1) * $p) as int) + 1)").as("q_higher"),
          expr(s"element_at(xs, cast(floor((size(xs) - 1) * $p + 0.5) as int) + 1)").as("q_nearest"),
          round(expr(
            s"""(element_at(xs, cast(floor((size(xs) - 1) * $p) as int) + 1)
               + element_at(xs, cast(ceil((size(xs) - 1) * $p) as int) + 1)) / 2"""), 6)
            .as("q_midpoint"),
          round(expr(
            s"""element_at(xs, cast(floor((size(xs) - 1) * $p) as int) + 1)
               + ((size(xs) - 1) * $p - floor((size(xs) - 1) * $p))
                 * (element_at(xs, cast(ceil((size(xs) - 1) * $p) as int) + 1)
                    - element_at(xs, cast(floor((size(xs) - 1) * $p) as int) + 1))"""), 6)
            .as("q_linear"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH g AS (
        SELECT l_returnflag, list(l_quantity ORDER BY l_quantity) AS xs
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
        xs[CAST(floor((len(xs) - 1) * 0.37) AS INT) + 1] AS q_lower,
        xs[CAST(ceil((len(xs) - 1) * 0.37) AS INT) + 1] AS q_higher,
        xs[CAST(floor((len(xs) - 1) * 0.37 + 0.5) AS INT) + 1] AS q_nearest,
        round((xs[CAST(floor((len(xs) - 1) * 0.37) AS INT) + 1]
             + xs[CAST(ceil((len(xs) - 1) * 0.37) AS INT) + 1]) / 2, 6) AS q_midpoint,
        round(xs[CAST(floor((len(xs) - 1) * 0.37) AS INT) + 1]
            + ((len(xs) - 1) * 0.37 - floor((len(xs) - 1) * 0.37))
              * (xs[CAST(ceil((len(xs) - 1) * 0.37) AS INT) + 1]
                 - xs[CAST(floor((len(xs) - 1) * 0.37) AS INT) + 1]), 6) AS q_linear
      FROM g ORDER BY l_returnflag"""))

  // Joins beyond the reference's INNER/LEFT/SEMI/ANTI: CROSS, FULL,
  // RIGHT — Spark-native surface.
  private val q30 = Q(
    "q30_join_misc",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT 'cross' AS tag, count(*) AS n FROM nation CROSS JOIN region
        UNION ALL
        SELECT 'full_unmatched' AS tag, count(*) AS n
        FROM customer FULL JOIN orders ON c_custkey = o_custkey
        WHERE o_orderkey IS NULL OR c_custkey IS NULL
        UNION ALL
        SELECT 'right' AS tag, count(*) AS n
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        ORDER BY tag""")
    },
    Some("""SELECT 'cross' AS tag, count(*) AS n FROM nation CROSS JOIN region
      UNION ALL
      SELECT 'full_unmatched' AS tag, count(*) AS n
      FROM customer FULL JOIN orders ON c_custkey = o_custkey
      WHERE o_orderkey IS NULL OR c_custkey IS NULL
      UNION ALL
      SELECT 'right' AS tag, count(*) AS n
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      ORDER BY tag"""))

  // Null-safe equality (kBwEq), DECIMAL cast + arithmetic, explicit
  // NULLS FIRST ordering (SortField null positioning, Node.h:27).
  private val q31 = Q(
    "q31_nullsafe_decimal",
    (s, d) => {
      val ord = t(s, d, "orders").filter(col("o_totalprice") > 450000)
      t(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"), col("o_orderkey"),
          // round-before-cast: Spark's double→decimal cast rounds
          // HALF_UP, DuckDB's HALF_EVEN — a .005-boundary acctbal
          // diverges by a cent. round() semantics agree (half away
          // from zero), so rounding first makes the cast exact. The
          // decimal arithmetic stays internal; outputs final-cast to
          // DOUBLE because the driver comparator cannot hash decimal
          // columns across engines (exact: 2-dp values << 2^53/100).
          round(col("c_acctbal"), 2).cast("decimal(18,2)")
            .cast("double").as("bal_dec"),
          (round(col("c_acctbal"), 2).cast("decimal(18,2)") * 2)
            .cast("decimal(18,2)").cast("double").as("bal_x2"),
          col("o_orderkey") <=> lit(null).cast("long") as "o_is_null")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
        .limit(300)
    },
    Some("""SELECT c_custkey, o_orderkey,
      CAST(CAST(round(c_acctbal, 2) AS DECIMAL(18,2)) AS DOUBLE) AS bal_dec,
      CAST(CAST(CAST(round(c_acctbal, 2) AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2))
           AS DOUBLE) AS bal_x2,
      o_orderkey IS NOT DISTINCT FROM NULL AS o_is_null
      FROM customer
      LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST
      LIMIT 300"""))

  // array_agg (sorted for determinism) — ArrayExpr/array building. The
  // id array is emitted comma-joined because the driver's comparator
  // cannot hash array cells; the collect itself is a real array agg.
  private val q25c = Q(
    "q25c_array_agg",
    (s, d) =>
      t(s, d, "embeddings")
        .groupBy(col("label"))
        .agg(
          sort_array(collect_list(col("vec_id"))).as("ids_arr"),
          count(lit(1)).as("n"))
        .select(col("label"),
          array_join(col("ids_arr").cast("array<string>"), ",").as("ids"),
          col("n"))
        .orderBy(col("label")),
    Some("""SELECT label,
      array_to_string(list(vec_id ORDER BY vec_id), ',') AS ids, count(*) AS n
      FROM embeddings GROUP BY label ORDER BY label"""))

  // Gaps-and-islands sessionization in pure SQL-expressible form (the
  // oracle-checked batch twin of EventPipeline.sessionize; 30-min gap).
  // Timestamps are compared in microseconds: the parquet source is
  // nanos, Spark reads micros (floored), DuckDB epoch_us floors the
  // same way.
  private val q32 = Q(
    "q32_events_sessions",
    (s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sess = ev
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L || lag(col("us"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_s"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("sess_id"))
        .agg(
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"),
          count(lit(1)).as("n_events"),
          // decimal sum per SURVEY §4 rule 6
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
        .orderBy(col("user_id"), col("sess_id"))
    },
    Some("""WITH ev AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      marked AS (
        SELECT user_id, event_id, value, us,
          CASE WHEN us - lag(us) OVER w > 1800000000
                 OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      sess AS (
        SELECT user_id, us, value,
          -- CAST: DuckDB sum(int) is HUGEINT, Spark's BIGINT
          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM marked)
      SELECT user_id, sess_id,
        min(us) AS start_us, max(us) AS end_us,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sess GROUP BY user_id, sess_id
      ORDER BY user_id, sess_id"""))

  // TPC-H Q1 shape built through the pyhdk-style builder facade
  // (graft.builder.GraftBuilder) — proves the builder constructs the
  // same Catalyst plans as the raw DataFrame API.
  private val q33 = Q(
    "q33_builder",
    (s, d) => {
      val hdk = new graft.builder.GraftBuilder(s, d)
      hdk.scan("lineitem")
        .filter(col("l_quantity") > 10)
        .agg(Seq("l_returnflag", "l_linestatus"),
          "count", "count_distinct(l_partkey)",
          "min(l_extendedprice)", "max(l_extendedprice)")
        .sort(("l_returnflag", "asc"), ("l_linestatus", "asc"))
        .run()
    },
    Some("""SELECT l_returnflag, l_linestatus,
      count(*) AS count,
      count(DISTINCT l_partkey) AS l_partkey_count_distinct,
      min(l_extendedprice) AS l_extendedprice_min,
      max(l_extendedprice) AS l_extendedprice_max
      FROM lineitem WHERE l_quantity > 10
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // Scalar math/string functions from the reference's test corpus
  // (ArrowBasedExecuteTest.cpp: ABS/CEIL/FLOOR/SIGN/POWER/LOG/MOD/
  // SUBSTRING/COALESCE + TIMESTAMPDIFF). Transcendentals rounded at 6dp
  // — JVM and DuckDB libm may differ in the last ulp.
  private val q34 = Q(
    "q34_scalar_math",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT l_orderkey, l_linenumber,
        abs(l_discount - 0.05) AS abs_,
        ceil(l_extendedprice) AS ceil_,
        floor(l_extendedprice) AS floor_,
        sign(l_quantity - 25) AS sign_,
        round(power(l_quantity, 2), 6) AS pow_,
        round(sqrt(l_extendedprice), 6) AS sqrt_,
        round(ln(l_extendedprice), 6) AS ln_,
        round(log10(l_extendedprice), 6) AS log10_,
        round(exp(l_discount), 6) AS exp_,
        substring(l_returnflag, 1, 1) AS sub_,
        coalesce(nullif(l_discount, 0.0), -1.0) AS coal_,
        greatest(l_quantity, 25.0) AS great_,
        least(l_quantity, 25.0) AS least_
        FROM lineitem
        WHERE l_orderkey % 200 = 0
        ORDER BY l_orderkey, l_linenumber""")
    },
    Some("""SELECT l_orderkey, l_linenumber,
      abs(l_discount - 0.05) AS abs_,
      -- CASTs: Spark ceil/floor(double) return BIGINT (DuckDB: DOUBLE)
      -- and Spark sign returns DOUBLE (DuckDB: TINYINT) — align the
      -- dtypes or the driver comparator hash-mismatches on equal values
      CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_,
      CAST(floor(l_extendedprice) AS BIGINT) AS floor_,
      CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_,
      round(power(l_quantity, 2), 6) AS pow_,
      round(sqrt(l_extendedprice), 6) AS sqrt_,
      round(ln(l_extendedprice), 6) AS ln_,
      round(log10(l_extendedprice), 6) AS log10_,
      round(exp(l_discount), 6) AS exp_,
      substring(l_returnflag, 1, 1) AS sub_,
      coalesce(nullif(l_discount, 0.0), -1.0) AS coal_,
      greatest(l_quantity, 25.0) AS great_,
      least(l_quantity, 25.0) AS least_
      FROM lineitem
      WHERE l_orderkey % 200 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  // Trig/hyperbolic/angle family (ExtensionFunctions.hpp: Sin..Atanh,
  // degrees/radians/pi, Truncate). round(,6) masks last-ulp libm vs
  // JVM-intrinsic differences; atanh and numeric truncate are mirrored
  // by identity on the DuckDB side (it lacks atanh and the
  // hyperbolics; Spark's trunc is date-only).
  private val q34b = Q(
    "q34b_trig",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT l_orderkey, l_linenumber,
        round(sin(l_quantity), 6) AS sin_,
        round(cos(l_quantity), 6) AS cos_,
        round(tan(l_quantity), 6) AS tan_,
        round(cot(l_quantity), 6) AS cot_,
        round(asin(l_discount), 6) AS asin_,
        round(acos(l_discount), 6) AS acos_,
        round(atan(l_quantity), 6) AS atan_,
        round(atan2(l_quantity, l_discount + 1), 6) AS atan2_,
        round(sinh(l_discount), 6) AS sinh_,
        round(cosh(l_discount), 6) AS cosh_,
        round(tanh(l_discount), 6) AS tanh_,
        round(atanh(l_discount), 6) AS atanh_,
        round(degrees(l_discount), 6) AS deg_,
        round(radians(l_quantity), 6) AS rad_,
        round(pi(), 6) AS pi_,
        sign(l_discount - 0.05) * floor(abs(l_discount - 0.05) * 100) AS trunc_
        FROM lineitem WHERE l_orderkey % 200 = 0
        ORDER BY l_orderkey, l_linenumber""")
    },
    Some("""SELECT l_orderkey, l_linenumber,
      round(sin(l_quantity), 6) AS sin_,
      round(cos(l_quantity), 6) AS cos_,
      round(tan(l_quantity), 6) AS tan_,
      round(cot(l_quantity), 6) AS cot_,
      round(asin(l_discount), 6) AS asin_,
      round(acos(l_discount), 6) AS acos_,
      round(atan(l_quantity), 6) AS atan_,
      round(atan2(l_quantity, l_discount + 1), 6) AS atan2_,
      round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sinh_,
      round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS cosh_,
      round((exp(2 * l_discount) - 1) / (exp(2 * l_discount) + 1), 6) AS tanh_,
      round(0.5 * ln((1 + l_discount) / (1 - l_discount)), 6) AS atanh_,
      round(degrees(l_discount), 6) AS deg_,
      round(radians(l_quantity), 6) AS rad_,
      round(pi(), 6) AS pi_,
      sign(l_discount - 0.05) * trunc(abs(l_discount - 0.05) * 100) AS trunc_
      FROM lineitem WHERE l_orderkey % 200 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  // ROLLUP + GROUPING indicator (beyond-reference: HDK's test corpus
  // touches ROLLUP once; Spark/DuckDB both support it natively).
  private val q35 = Q(
    "q35_rollup",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus,
        grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        count(*) AS n,
        CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2)))
             AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
      CAST(grouping(l_linestatus) AS TINYINT) AS g_ls,
      count(*) AS n,
      CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2)))
           AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  // Time-of-day extracts + the exotic trunc fields (DateTime.h
  // DateExtractField/DateTruncField: kHour..kSecond, kDecade, kCentury,
  // kMillennium, kWeekSunday, kQuarterDay). Spark's date_trunc stops at
  // week/quarter, so the longer-period and anchored-week truncs are
  // year/epoch arithmetic; DuckDB verifies decade against its NATIVE
  // trunc field (century/millennium anchor at xx01 per the reference —
  // DateTruncate.cpp:242 — where DuckDB's natives anchor at xx00).
  private val q15b = Q(
    "q15b_extract_time",
    (s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          date_trunc("hour", col("ts")).as("t_hour"),
          date_trunc("minute", col("ts")).as("t_min"),
          date_trunc("second", col("ts")).as("t_sec"),
          date_trunc("week", col("ts")).as("t_week"),
          expr("ts::date - (dayofweek(ts) - 1)").as("t_week_sun"),
          to_timestamp(make_date((floor(year(col("ts")) / 10) * 10).cast("int"),
            lit(1), lit(1))).as("t_decade"),
          to_timestamp(make_date((floor((year(col("ts")) - 1) / 100) * 100 + 1).cast("int"),
            lit(1), lit(1))).as("t_century"),
          to_timestamp(make_date((floor((year(col("ts")) - 1) / 1000) * 1000 + 1).cast("int"),
            lit(1), lit(1))).as("t_millennium"),
          timestamp_seconds(expr("(unix_timestamp(ts) div 21600) * 21600"))
            .as("t_qday"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
      CAST(extract(hour FROM ts) AS INT) AS h,
      CAST(extract(minute FROM ts) AS INT) AS mi,
      CAST(extract(second FROM ts) AS INT) AS sec,
      CAST(date_trunc('hour', ts) AS TIMESTAMP) AS t_hour,
      CAST(date_trunc('minute', ts) AS TIMESTAMP) AS t_min,
      CAST(date_trunc('second', ts) AS TIMESTAMP) AS t_sec,
      CAST(date_trunc('week', ts) AS TIMESTAMP) AS t_week,
      CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INT) AS t_week_sun,
      CAST(date_trunc('decade', ts) AS TIMESTAMP) AS t_decade,
      -- the reference anchors century/millennium at xx01 (Jan 1 2001,
      -- DateTruncate.cpp:242); DuckDB's native fields anchor at xx00,
      -- so mirror the reference arithmetic instead
      CAST(make_date(CAST((extract(year FROM ts) - 1) // 100 * 100 + 1 AS INT), 1, 1) AS TIMESTAMP) AS t_century,
      CAST(make_date(CAST((extract(year FROM ts) - 1) // 1000 * 1000 + 1 AS INT), 1, 1) AS TIMESTAMP) AS t_millennium,
      CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP) AS t_qday
      FROM events ORDER BY event_id"""))

  // CUBE + GROUPING SETS (completing the grouping-set family started
  // by q35's ROLLUP; both engines support them natively).
  private val q35b = Q(
    "q35b_cube_sets",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT 'cube' AS src, l_returnflag, l_linestatus,
        grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'sets' AS src, l_returnflag, NULL AS l_linestatus,
        0 AS g_rf, 1 AS g_ls, count(*) AS n
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag))
        ORDER BY src, g_rf, g_ls, l_returnflag NULLS FIRST,
          l_linestatus NULLS FIRST""")
    },
    Some("""SELECT 'cube' AS src, l_returnflag, l_linestatus,
      CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
      CAST(grouping(l_linestatus) AS TINYINT) AS g_ls,
      count(*) AS n
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      UNION ALL
      SELECT 'sets' AS src, l_returnflag, NULL AS l_linestatus,
      CAST(0 AS TINYINT) AS g_rf, CAST(1 AS TINYINT) AS g_ls, count(*) AS n
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag))
      ORDER BY src, g_rf, g_ls, l_returnflag NULLS FIRST,
        l_linestatus NULLS FIRST"""))

  // EXISTS / NOT EXISTS through the SQL frontend (the DataFrame twins
  // are q07/q08's semi/anti joins; this proves the SQL surface parses
  // and plans correlated existence subqueries).
  private val q43 = Q(
    "q43_exists_sql",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_name,
        EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 400000) AS has_big
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderstatus = 'F')
        ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name,
      EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000) AS has_big
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  // Batch twin of the ST5 stream-stream interval join (EventPipeline
  // .purchaseAttribution): purchases attributed to same-user clicks in
  // the preceding hour — the watermark is a no-op on batch frames, so
  // the oracle checks exactly the code the stream runs.
  private val q44 = Q(
    "q44_stream_attr",
    (s, d) => {
      val ev = t(s, d, "events")
      graft.streaming.EventPipeline.purchaseAttribution(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("value"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    },
    Some("""SELECT c.user_id, c.event_id AS click_id,
      p.event_id AS purchase_id, p.value
      FROM events c JOIN events p
        ON c.event_type = 'click' AND p.event_type = 'purchase'
        AND c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
      ORDER BY c.user_id, click_id, purchase_id"""))

  // Batch twin of the ST7 LEFT-OUTER stream-stream interval join
  // (EventPipeline.purchaseAttributionOuter): every click appears,
  // converted or not — the filters sit on the join INPUTS (a left-side
  // predicate inside a LEFT JOIN's ON would not filter left rows, so
  // the oracle uses pre-filtered subqueries to state the same thing).
  private val q49 = Q(
    "q49_stream_attr_outer",
    (s, d) => {
      val ev = t(s, d, "events")
      graft.streaming.EventPipeline.purchaseAttributionOuter(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("value"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    },
    Some("""SELECT c.user_id, c.event_id AS click_id,
      p.event_id AS purchase_id, p.value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
      ORDER BY c.user_id, click_id, purchase_id"""))

  // PIVOT (wide aggregation by category) + UNPIVOT back to long form —
  // beyond-reference OLAP surface both engines support; the oracle
  // states the same computation relationally (FILTERed counts, then
  // the stack re-expressed as a UNION).
  private val q45 = Q(
    "q45_pivot",
    (s, d) => {
      val wide = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"), col("O").as("st_o"),
          col("F").as("st_f"), col("P").as("st_p"))
      wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("st_o"), col("st_f"), col("st_p")),
          "status_col", "n")
        .orderBy(col("o_orderpriority"), col("status_col"))
    },
    Some("""WITH wide AS (
        SELECT o_orderpriority,
          count(*) FILTER (o_orderstatus = 'O') AS st_o,
          count(*) FILTER (o_orderstatus = 'F') AS st_f,
          count(*) FILTER (o_orderstatus = 'P') AS st_p
        FROM orders GROUP BY 1)
      SELECT o_orderpriority, status_col, n FROM (
        SELECT o_orderpriority, 'st_o' AS status_col, st_o AS n FROM wide
        UNION ALL
        SELECT o_orderpriority, 'st_f', st_f FROM wide
        UNION ALL
        SELECT o_orderpriority, 'st_p', st_p FROM wide)
      ORDER BY o_orderpriority, status_col"""))

  // Native session windows (Spark's session_window — the declarative
  // twin of the flatMapGroupsWithState sessionization in ST2): same
  // 30-min gap the q32 gaps-and-islands query uses, so the oracle is
  // the same island construction with session_window's [min, max+gap)
  // bounds.
  private val q46 = Q(
    "q46_session_window",
    (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("start_us")),
    Some("""WITH ev AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      marked AS (
        SELECT user_id, value, us,
          CASE WHEN us - lag(us) OVER w > 1800000000
                 OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      sess AS (
        SELECT user_id, us, value,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM marked)
      SELECT user_id,
        min(us) AS start_us,
        max(us) + 1800000000 AS end_us,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sess GROUP BY user_id, sess_id
      ORDER BY user_id, start_us"""))

  // Aggregate-family widening: median, mode, bool_and/bool_or,
  // bit_and/bit_or/bit_xor — all native in both engines. mode targets
  // l_linenumber (frequency strictly decreasing in line number, so the
  // winner is unique and tie-break rules never fire).
  private val q47 = Q(
    "q47_more_aggs",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          median(col("l_quantity")).as("med_qty"),
          mode(col("l_linenumber")).as("mode_line"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_quantity") > 45).as("any_big"),
          bit_and(col("l_linenumber")).as("line_band"),
          bit_or(col("l_linenumber")).as("line_bor"),
          bit_xor(col("l_linenumber")).as("line_bxor"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      median(l_quantity) AS med_qty,
      mode(l_linenumber) AS mode_line,
      bool_and(l_quantity > 0) AS all_pos,
      bool_or(l_quantity > 45) AS any_big,
      bit_and(l_linenumber) AS line_band,
      bit_or(l_linenumber) AS line_bor,
      bit_xor(l_linenumber) AS line_bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // String-function family beyond the reference's CharLength/Lower
  // (Expr.h:528,591): case mapping, pad/trim, split/position, slicing,
  // reverse/repeat/translate, edit distance, concat — all codegen'd
  // builtins on both engines.
  private val q48 = Q(
    "q48_strings",
    (s, d) =>
      t(s, d, "customer")
        .filter(col("c_custkey") % 20 === 0)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up_"),
          lpad(col("c_name"), 25, "*").as("lp_"),
          rpad(col("c_name"), 25, "*").as("rp_"),
          split_part(col("c_name"), lit("#"), lit(2)).as("sp_"),
          instr(col("c_name"), "#").as("ip_"),
          substring(col("c_name"), 1, 8).as("l_"),
          col("c_name").substr(length(col("c_name")) - 4, lit(5)).as("r_"),
          reverse(col("c_name")).as("rev_"),
          repeat(lit("ab"), 3).as("rep_"),
          translate(col("c_name"), "#", "_").as("trn_"),
          levenshtein(col("c_name"), lit("Customer")).as("lev_"),
          concat_ws("-", col("c_name"), col("c_mktsegment")).as("cw_"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
      upper(c_name) AS up_,
      lpad(c_name, 25, '*') AS lp_,
      rpad(c_name, 25, '*') AS rp_,
      split_part(c_name, '#', 2) AS sp_,
      CAST(strpos(c_name, '#') AS BIGINT) AS ip_,
      left(c_name, 8) AS l_,
      right(c_name, 5) AS r_,
      reverse(c_name) AS rev_,
      repeat('ab', 3) AS rep_,
      translate(c_name, '#', '_') AS trn_,
      CAST(levenshtein(c_name, 'Customer') AS INT) AS lev_,
      concat_ws('-', c_name, c_mktsegment) AS cw_
      FROM customer WHERE c_custkey % 20 = 0
      ORDER BY c_custkey"""))

  // Quantified comparisons (Qualifier kAny/kAll, OpTypeEnums.h:75).
  // Spark has no ANY/ALL subquery syntax; the standard rewrite is
  // x > ANY(S) ⇔ x > min(S), x > ALL(S) ⇔ x > max(S) (S non-empty,
  // no NULLs — both hold for this predicate). The oracle runs DuckDB's
  // NATIVE ANY/ALL, proving the rewrite, not just mirroring it.
  private val q36 = Q(
    "q36_any_all",
    (s, d) => {
      Tables.registerAll(s, d)
      // single scan: min+max computed together in ONE uncorrelated
      // subquery cross-joined in (1 row) — at scale this halves the
      // subquery work vs two independent scalar subqueries.
      s.sql("""SELECT s_suppkey, s_name,
        s_acctbal > b.lo AS gt_any,
        s_acctbal > b.hi AS gt_all
        FROM supplier CROSS JOIN (
          SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi
          FROM customer WHERE c_nationkey = 5) b
        ORDER BY s_suppkey""")
    },
    Some("""SELECT s_suppkey, s_name,
      s_acctbal > ANY (SELECT c_acctbal FROM customer WHERE c_nationkey = 5) AS gt_any,
      s_acctbal > ALL (SELECT c_acctbal FROM customer WHERE c_nationkey = 5) AS gt_all
      FROM supplier ORDER BY s_suppkey"""))

  // As-of join (time-series; single-shuffle union+window plan) — the
  // oracle is DuckDB's NATIVE ASOF JOIN, so the operator's semantics
  // are checked against an independent implementation. Right side
  // pre-aggregated to one row per (user, ts) so ties are impossible.
  private val q37 = Q(
    "q37_asof_join",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("p_val"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("c_val"))
        .withColumn("c_ts", col("ts"))
      graft.operators.TimeJoins
        .asofJoin(purchases, clicks, "user_id", "ts", Seq("c_ts", "c_val"))
        .select(col("event_id"), col("user_id"), col("p_val"),
          col("asof_c_ts"), col("asof_c_val"))
        .orderBy(col("event_id"))
    },
    Some("""WITH p AS (
        SELECT event_id, user_id, ts, value AS p_val FROM events
        WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, ts AS c_ts, max(value) AS c_val FROM events
        WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.p_val,
        c.c_ts AS asof_c_ts, c.c_val AS asof_c_val
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.c_ts <= p.ts
      ORDER BY p.event_id"""))

  // Range/interval join with NO equi-key (clicks falling inside any
  // 10-minute error window) — bucketed-bin equi-join plan vs DuckDB's
  // plain BETWEEN join.
  private val q38 = Q(
    "q38_range_join",
    (s, d) => {
      val ev = t(s, d, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("err_start"),
          (col("ts") + expr("INTERVAL 10 MINUTE")).as("err_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))
      graft.operators.TimeJoins
        .rangeJoin(clicks, "ts", errors, "err_start", "err_end", 600L)
        .select(col("click_id"), col("error_id"))
        .orderBy(col("click_id"), col("error_id"))
    },
    Some("""SELECT c.event_id AS click_id, e.event_id AS error_id
      FROM events c JOIN events e
        ON c.event_type = 'click' AND e.event_type = 'error'
        AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
      ORDER BY 1, 2"""))

  // CSV roundtrip (IO2, hdk.py:2229 import_csv): dump nation to CSV,
  // re-import through the Importer with an explicit schema, and prove
  // value fidelity by hashing against the original table in DuckDB.
  private val q26 = Q(
    "q26_csv_roundtrip",
    (s, d) => {
      val nation = t(s, d, "nation")
      val dir = graft.GraftSession.scratchDir(
        "q26_csv_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      nation.write.mode("overwrite").option("header", "true").csv(dir)
      graft.sources.Importer
        .importCsv(s, dir, "q26_nation_csv", schema = Some(nation.schema))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey"""))

  // JSONL roundtrip (IO7, r6): dump nation to newline-delimited JSON,
  // re-import through the Importer with an explicit schema, and prove
  // value fidelity against the original table in DuckDB — the ingest
  // format every scrape/annotation dump arrives in.
  private val q50 = Q(
    "q50_jsonl_roundtrip",
    (s, d) => {
      val nation = t(s, d, "nation")
      val dir = graft.GraftSession.scratchDir(
        "q50_jsonl_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      nation.write.mode("overwrite").json(dir)
      graft.sources.Importer
        .importJsonl(s, dir, "q50_nation_jsonl", schema = Some(nation.schema))
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey"""))

  // Window frame specs beyond running totals (W3): sliding ROWS frame,
  // value-based RANGE frame, nth_value.
  private val q18b = Q(
    "q18b_winframes",
    (s, d) => {
      val base = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val sliding = base.rowsBetween(-2, 2)
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice")).rangeBetween(-10000, 0)
      t(s, d, "orders")
        .filter(col("o_custkey") % 10 === 1)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(avg(col("o_totalprice")).over(sliding), 6).as("mov_avg"),
          count(lit(1)).over(byPrice).as("n_close_below"),
          nth_value(col("o_orderkey"), 2).over(
            base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS mov_avg,
      count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_close_below,
      nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
      FROM orders WHERE o_custkey % 10 = 1
      ORDER BY o_custkey, o_orderkey"""))

  // Skew-mitigating salted join under the correctness gate: the salted
  // plan (hot key spread over 8 salts, small side replicated) must
  // produce EXACTLY the plain join's rows — the oracle is the plain
  // SQL join. l_returnflag (3 values) is the worst-case hot key.
  private val q40 = Q(
    "q40_salted_join",
    (s, d) => {
      val li = t(s, d, "lineitem").withColumnRenamed("l_returnflag", "rf")
      val dim = t(s, d, "lineitem")
        .select(col("l_returnflag").as("rf")).distinct()
        .withColumn("flag_tag", concat(lit("tag_"), col("rf")))
      graft.operators.Skew.saltedJoin(li, dim, keys = Seq("rf"),
          salt = 8, saltBy = col("l_orderkey"))
        .groupBy(col("rf"), col("flag_tag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("sum_qty"))
        .orderBy(col("rf"))
    },
    Some("""SELECT l_returnflag AS rf, 'tag_' || l_returnflag AS flag_tag,
      count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY 1, 2 ORDER BY rf"""))

  // Custom aggregates reachable from the SQL frontend (registered via
  // SparkSessionExtensions → FunctionRegistry, GraftExtensions) — the
  // analogue of the reference registering kTopK with Calcite.
  private val q39 = Q(
    "q39_sql_topk",
    (s, d) => {
      Tables.registerAll(s, d)
      // arrays emitted comma-joined (driver comparator can't hash
      // array cells); topk/bottomk themselves return real arrays
      s.sql("""SELECT l_returnflag,
        array_join(transform(topk(l_extendedprice, 3),
          x -> cast(cast(x as decimal(18,2)) as string)), ',') AS top3,
        array_join(transform(bottomk(l_extendedprice, 3),
          x -> cast(cast(x as decimal(18,2)) as string)), ',') AS bottom3
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
      array_to_string(list_transform((list(l_extendedprice ORDER BY l_extendedprice DESC))[1:3],
        x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS top3,
      array_to_string(list_transform((list(l_extendedprice ORDER BY l_extendedprice ASC))[1:3],
        x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS bottom3
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // LATERAL correlated subquery join (beyond the reference's join set;
  // Spark 3.2+/DuckDB both support it natively) — top-2 orders per
  // customer, the canonical lateral-limit shape.
  private val q41 = Q(
    "q41_lateral",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        WHERE c_custkey % 10 = 3
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },
    Some("""SELECT c_custkey, o_orderkey, o_totalprice
      FROM customer JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON TRUE
      WHERE c_custkey % 10 = 3
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""))

  // Map-typed columns: build a per-user event_type→count map with
  // map_from_entries, then operate on it (size, element_at, map_keys).
  // The map itself can't cross the comparator (dict cells), so the
  // driver-facing SELECT emits scalars + joined keys; the oracle
  // recomputes them relationally.
  private val q42 = Q(
    "q42_map",
    (s, d) => {
      val ev = t(s, d, "events")
      ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("event_type"), col("n"))))).as("m"))
        .select(
          col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          element_at(col("m"), "click").as("clicks"),
          element_at(col("m"), "purchase").as("purchases"),
          array_join(map_keys(col("m")), ",").as("types"))
        .orderBy(col("user_id"))
    },
    Some("""WITH c AS (
        SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_types,
        max(CASE WHEN event_type = 'click' THEN n END) AS clicks,
        max(CASE WHEN event_type = 'purchase' THEN n END) AS purchases,
        string_agg(event_type, ',' ORDER BY event_type) AS types
      FROM c GROUP BY user_id ORDER BY user_id"""))

  // MERGE / upsert (R16): apply a deterministic changeset — updates for
  // keys ≡ 0 (mod 7), deletes for the disjoint keys ≡ 3 (mod 11), and
  // inserts at shifted keys — through graft.operators.Merge in one
  // full-outer shuffle join; DuckDB replays the same changeset
  // relationally. The updated price is `+ 10.0` (one IEEE op, bit-equal
  // everywhere) rather than a multiply that would need rounding.
  private val q51 = Q(
    "q51_merge",
    (s, d) => {
      val orders = t(s, d, "orders")
      val upd = orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
        .withColumn("op", lit("U"))
      val del = orders
        .filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 11 === 3)
        .withColumn("op", lit("D"))
      val ins = orders.filter(col("o_orderkey") % 13 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("op", lit("I"))
      graft.operators.Merge
        .upsert(orders, upd.unionByName(del).unionByName(ins),
          Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          o_totalprice + 10.0 AS o_totalprice, 'U' AS op
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D'
        FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 = 3
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
          o_totalprice, 'I'
        FROM orders WHERE o_orderkey % 13 = 1),
      merged AS (
        SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
          CASE WHEN c.op IS NOT NULL THEN c.o_custkey
               ELSE b.o_custkey END AS o_custkey,
          CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
               ELSE b.o_orderstatus END AS o_orderstatus,
          CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
               ELSE b.o_totalprice END AS o_totalprice,
          c.op
        FROM orders b FULL OUTER JOIN changes c
          ON b.o_orderkey = c.o_orderkey)
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM merged WHERE op IS NULL OR op <> 'D'
      ORDER BY o_orderkey"""))

  // Time-series resample + forward fill (TimeJoins.resampleFfill): each
  // sampled user's irregular event stream regularized onto an hourly
  // grid with last-observation-carried-forward. DuckDB rebuilds the
  // grid with generate_series and fills with IGNORE NULLS last_value;
  // the last-in-bucket pick is deterministic on (µs ts, event_id) in
  // both engines.
  private val q52 = Q(
    "q52_resample",
    (s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") % 7 === 0)
      graft.operators.TimeJoins
        .resampleFfill(ev, "user_id", "ts", "value", "event_id", "hour")
        .orderBy(col("user_id"), col("bucket"))
    },
    Some("""WITH obs AS (
        SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
          epoch_us(ts) AS us, event_id, value
        FROM events WHERE user_id % 7 = 0),
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
        SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR))
          AS bucket FROM spans)
      SELECT user_id, bucket,
        last_value(v_last IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      FROM grid LEFT JOIN lastb USING (user_id, bucket)
      ORDER BY user_id, bucket"""))

  // SCD type-2 historize (Merge.historize): each customer's order
  // stream becomes versioned rows valid until the next order; lead()
  // per key, ties broken on o_orderkey so the chain is deterministic.
  private val q53 = Q(
    "q53_scd2",
    (s, d) => {
      val ch = t(s, d, "orders").filter(col("o_custkey") % 50 === 0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      graft.operators.Merge
        .historize(ch, Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
        CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS TIMESTAMP) AS valid_to,
        (lead(o_orderdate) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
      FROM orders WHERE o_custkey % 50 = 0
      ORDER BY o_custkey, valid_from, o_orderkey"""))

  // One-pass column profiler: every exact stat (nulls, min, max,
  // decimal-exact mean) for every profiled column in a SINGLE scan +
  // aggregate — the data-card utility for a table you can't afford to
  // re-scan per column at 100 TB. Approx NDV (HLL, 2% rsd) rides in the
  // same pass; the exact NDV it is gated against uses a second
  // expand-based aggregate (the gate's price, not the operator's —
  // production ships the approx).
  private val q54 = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    Q(
      "q54_profile",
      (s, d) =>
        // r12: the profiler body moved VERBATIM to Quality.profile so
        // the graft_profile TVF shares it; this key's oracle is
        // unchanged and now gates both surfaces
        graft.operators.Quality.profile(t(s, d, "lineitem"), cols),
      Some(cols.map(c => s"""SELECT '$c' AS col_name,
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
  }

  // Sequential conversion funnel (Funnel.funnel): deepest step of
  // view -> click -> purchase reached in order within 7 days of the
  // anchoring first view. DuckDB rebuilds the same chained min-ts
  // stages; strict ordering + the anchored window bound are exactly
  // mirrored, so an off-by-one in either bound hash-fails.
  private val q55 = Q(
    "q55_funnel",
    (s, d) =>
      graft.operators.Funnel
        .funnel(t(s, d, "events"), Seq("view", "click", "purchase"), "7 days")
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level")),
    Some("""WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1)
      SELECT 1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
          AS level,
        count(*) AS n_users
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      GROUP BY 1 ORDER BY 1"""))

  // Weekly cohort retention matrix (Funnel.retention): cohort = ISO
  // week of first event, n_users active per (cohort, week offset).
  // Both engines truncate weeks to Monday and the offset is exact
  // integer arithmetic on day differences (always a multiple of 7).
  private val q56 = Q(
    "q56_retention",
    (s, d) =>
      graft.operators.Funnel.retention(t(s, d, "events"))
        .orderBy(col("cohort_week"), col("week_offset")),
    Some("""WITH first AS (
        SELECT user_id,
          CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY 1),
      act AS (
        SELECT DISTINCT user_id,
          CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        FROM events)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset,
        count(*) AS n_users
      FROM act JOIN first USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Trailing-window EWMA per user (TimeJoins.ewma): bias-corrected
  // exponential smoothing over the last 20 events. The fold order and
  // the geometric-sum denominator are replayed verbatim by DuckDB
  // (list() over the identical ROWS frame), so frame bounds, ordering
  // ties, and FP fold order are all pinned cross-engine.
  private val q57 = Q(
    "q57_ewma",
    (s, d) =>
      graft.operators.TimeJoins
        .ewma(t(s, d, "events").filter(col("user_id") % 5 === 0),
          "user_id", "ts", "value", "event_id")
        .select(col("user_id"), col("event_id"), col("ewma"))
        .orderBy(col("user_id"), col("event_id")),
    Some("""WITH f AS (
        SELECT user_id, event_id,
          list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vs
        FROM events WHERE user_id % 5 = 0)
      SELECT user_id, event_id,
        round(list_reduce(list_prepend(CAST(0 AS DOUBLE), vs),
            (a, x) -> a * 0.9 + x)
          / ((1 - pow(0.9, len(vs))) / 0.1), 6) AS ewma
      FROM f ORDER BY user_id, event_id"""))

  // Event-type transition matrix (Funnel.transitions): first-order
  // Markov counts over each user's event-time-ordered stream. The lag
  // window partitions on the high-cardinality user key; ties pinned by
  // event_id in both engines.
  private val q58 = Q(
    "q58_transitions",
    (s, d) =>
      graft.operators.Funnel.transitions(t(s, d, "events"))
        .orderBy(col("from_type"), col("to_type")),
    Some("""WITH l AS (
        SELECT user_id,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS from_type,
          event_type AS to_type
        FROM events)
      SELECT from_type, to_type, count(*) AS n
      FROM l WHERE from_type IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Iterative graph analytics (Graph.pageRank): 3 power-iteration
  // rounds over the customer↔supplier bipartite graph derived from
  // orders⋈lineitem (node ids: custkey·2 even, suppkey·2+1 odd). The
  // oracle unrolls the identical three join+aggregate rounds; per-edge
  // contributions round 12dp and per-node sums run as DECIMAL(20,12)
  // in both engines, so no float-summation order can diverge.
  private val q59 = Q(
    "q59_pagerank",
    (s, d) => {
      val edges = t(s, d, "orders")
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      graft.operators.Graph.pageRank(edges, iters = 3)
        .orderBy(col("node_id"))
    },
    Some("""WITH e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM e0
        UNION ALL SELECT dst AS src, src AS dst FROM e0),
      deg AS (SELECT src AS node_id, count(*) AS deg FROM e GROUP BY 1),
      nn AS (SELECT count(*) AS n_nodes FROM deg),
      r0 AS (SELECT node_id, deg, n_nodes,
          round(1.0 / n_nodes, 12) AS rank
        FROM deg CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node_id,
          sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(20,12))) AS m
        FROM e JOIN r0 r ON e.src = r.node_id GROUP BY 1),
      r1 AS (SELECT r.node_id, r.deg, r.n_nodes,
          round((1.0 - 0.85) / r.n_nodes
            + 0.85 * CAST(s1.m AS DOUBLE), 12) AS rank
        FROM r0 r JOIN s1 USING (node_id)),
      s2 AS (SELECT e.dst AS node_id,
          sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(20,12))) AS m
        FROM e JOIN r1 r ON e.src = r.node_id GROUP BY 1),
      r2 AS (SELECT r.node_id, r.deg, r.n_nodes,
          round((1.0 - 0.85) / r.n_nodes
            + 0.85 * CAST(s2.m AS DOUBLE), 12) AS rank
        FROM r1 r JOIN s2 USING (node_id)),
      s3 AS (SELECT e.dst AS node_id,
          sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(20,12))) AS m
        FROM e JOIN r2 r ON e.src = r.node_id GROUP BY 1),
      r3 AS (SELECT r.node_id, r.deg, r.n_nodes,
          round((1.0 - 0.85) / r.n_nodes
            + 0.85 * CAST(s3.m AS DOUBLE), 12) AS rank
        FROM r2 r JOIN s3 USING (node_id))
      SELECT node_id, deg, round(rank, 8) AS rank
      FROM r3 ORDER BY node_id"""))

  // Funnel at the BUILDER surface (stretch r8): the full QueryNode
  // chain — scan → filter → funnel → agg mini-language → sort — with a
  // different step sequence, window, and population than q55, so the
  // builder path earns its own oracle instead of duplicating the
  // operator query. DuckDB rebuilds the chained min-ts stages with the
  // 3-day anchored window over the filtered population.
  private val q60 = Q(
    "q60_builder_funnel",
    (s, d) =>
      new graft.builder.GraftBuilder(s, d)
        .scan("events")
        .filter(pmod(col("user_id"), lit(3)) === 0)
        .funnel(Seq("signup", "view", "purchase"), window = "3 days")
        .agg(Seq("level"), "count")
        .sort(("level", "asc"))
        .run(),
    Some("""WITH ev AS (
        SELECT * FROM events WHERE user_id % 3 = 0),
      s1 AS (
        SELECT user_id, min(ts) AS t1 FROM ev
        WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM ev e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 3 DAY
        GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s1.t1 + INTERVAL 3 DAY
        GROUP BY 1)
      SELECT 1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
          AS level,
        count(*) AS count
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      GROUP BY 1 ORDER BY 1"""))

  // R24: UNPIVOT/melt — wide→long reshaping (the inverse of q45's
  // pivot), a LogicalValues-free relational reshape Spark serves
  // natively via Dataset.unpivot (MELT). Narrow: each input row emits
  // its value columns as (metric, value) rows in-place — zero shuffles;
  // the oracle replays the semantics as a UNION ALL of per-column
  // projections (the portable definition of UNPIVOT).
  private val q61 = Q(
    "q61_unpivot",
    (s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey") <= 300)
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size").cast("double").as("p_size")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric")),
    Some("""SELECT p_partkey, metric, value FROM (
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        FROM part WHERE p_partkey <= 300
        UNION ALL
        SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE)
        FROM part WHERE p_partkey <= 300)
      ORDER BY p_partkey, metric"""))

  // R25: connected components over a territory-sharded customer–
  // supplier order graph — the second first-class graph operator
  // (PageRank's structural sibling): which customers and suppliers are
  // linked through chains of shared orders. Edges are thinned (1-in-7
  // orders) and restricted to same-territory pairs (custkey ≡ suppkey
  // mod 20 — the sharded-marketplace shape) so the graph genuinely
  // FRAGMENTS (53 components / 420 nodes at sf0.01, measured): label
  // assignment is exercised per component instead of collapsing to one
  // giant min, and the oracle's transitive-closure CTE stays
  // output-proportional (0.4s at sf0.01 vs 2.7s unsharded). The oracle
  // recomputes min reachable id per node by recursive reachability
  // (the dedup_keep CTE idiom), which equals min-label CC by
  // definition.
  private val q62 = Q(
    "q62_components",
    (s, d) => {
      val edges = t(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && pmod(col("o_custkey"), lit(20)) === pmod(col("l_suppkey"), lit(20)))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      graft.operators.Graph.connectedComponents(edges)
        .orderBy(col("node_id"))
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0),
      edges AS (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst, src FROM e0),
      nodes AS (SELECT DISTINCT a AS node_id FROM edges),
      reach(src, dst) AS (
        SELECT node_id, node_id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      SELECT src AS node_id, min(dst) AS component FROM reach
      GROUP BY src ORDER BY node_id"""))

  // Exact triangle counts + clustering coefficient (Graph.triangles)
  // over the part co-occurrence graph: parts are adjacent iff some
  // order contains both. The oracle replays the identical
  // degree-oriented wedge closure — orientation CASE, (hi_deg, hi)
  // wedge order, and the (lo, hi) closure join — so each triangle is
  // counted exactly once in both engines; the coefficient is one IEEE
  // division on exact integers + a 6dp round.
  private val q63 = Q(
    "q63_triangles",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(3)) === 0)
        .select(col("l_orderkey").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.triangles(edges).orderBy(col("node_id"))
    },
    Some("""WITH li AS (
        SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
        FROM lineitem WHERE l_orderkey % 3 = 0),
      e0 AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      deg AS (SELECT x AS node_id, count(*) AS deg FROM (
          SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0) t
        GROUP BY 1),
      o AS (SELECT
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.u < e0.v)
            THEN e0.u ELSE e0.v END AS lo,
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.u < e0.v)
            THEN e0.v ELSE e0.u END AS hi,
          greatest(da.deg, db.deg) AS hi_deg
        FROM e0 JOIN deg da ON da.node_id = e0.u
          JOIN deg db ON db.node_id = e0.v),
      tri AS (SELECT w1.lo AS a, w1.hi AS b, w2.hi AS c
        FROM o w1 JOIN o w2 ON w1.lo = w2.lo
          AND (w1.hi_deg < w2.hi_deg
            OR (w1.hi_deg = w2.hi_deg AND w1.hi < w2.hi))
        JOIN o e ON e.lo = w1.hi AND e.hi = w2.hi),
      tn AS (SELECT x AS node_id, count(*) AS n_triangles FROM (
          SELECT a AS x FROM tri UNION ALL SELECT b AS x FROM tri
          UNION ALL SELECT c AS x FROM tri) t
        GROUP BY 1)
      SELECT d.node_id, d.deg,
        coalesce(tn.n_triangles, 0) AS n_triangles,
        CASE WHEN d.deg >= 2 THEN round(
            2.0 * coalesce(tn.n_triangles, 0) / (d.deg * (d.deg - 1.0)), 6)
          ELSE 0.0 END AS clustering
      FROM deg d LEFT JOIN tn USING (node_id)
      ORDER BY node_id"""))

  // Rolling z-score anomaly flag (TimeJoins.rollingZScore): each event
  // scored against the trailing 20 observations strictly before it,
  // per user. The oracle replays the identical exclusive ROWS frame,
  // 6dp mean/std rounds, and the 4dp z — booleans engine-exact.
  private val q64 = Q(
    "q64_anomaly",
    (s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("double").as("value"))
      graft.operators.TimeJoins.rollingZScore(ev, "user_id", "us",
          "value", "event_id")
        .orderBy(col("user_id"), col("us"), col("event_id"))
    },
    Some("""WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS us,
          CAST(value AS DOUBLE) AS value
        FROM events),
      sc AS (SELECT event_id, user_id, us, value,
          count(value) OVER w AS roll_n,
          round(avg(value) OVER w, 6) AS m6,
          round(stddev_samp(value) OVER w, 6) AS s6
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, us, value, roll_n,
        CASE WHEN roll_n >= 5 AND s6 > 0
          THEN round((value - m6) / s6, 4) END AS z,
        coalesce(abs(CASE WHEN roll_n >= 5 AND s6 > 0
          THEN round((value - m6) / s6, 4) END) > 3.0, false) AS flagged
      FROM sc ORDER BY user_id, us, event_id"""))

  // The SCD2 CONSUMER (R18's other half): fact rows enriched with the
  // dimension version valid AT their query time — an as-of join onto
  // the version chain (the valid_from/valid_to intervals historize
  // materializes are implicit in "latest version ≤ ts"). Versions
  // dedupe to one per (key, ts) so the as-of pick is deterministic.
  private val q65 = Q(
    "q65_scd2_asof",
    (s, d) => {
      val base = t(s, d, "orders")
        .filter(pmod(col("o_custkey"), lit(50)) === 0)
      val dim = base
        .groupBy(col("o_custkey"),
          col("o_orderdate").cast("timestamp").as("ts"))
        .agg(max(col("o_orderkey")).as("ver_orderkey"),
          expr("max_by(o_totalprice, o_orderkey)").as("ver_price"))
      val fact = base.select(col("o_custkey"), col("o_orderkey"),
        (col("o_orderdate").cast("timestamp")
          + expr("INTERVAL 30 DAY")).as("ts"))
      graft.operators.TimeJoins.asofJoin(fact, dim, "o_custkey", "ts",
          Seq("ver_orderkey", "ver_price"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("ts").as("query_ts"),
          col("asof_ver_orderkey"), col("asof_ver_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""WITH base AS (
        SELECT * FROM orders WHERE o_custkey % 50 = 0),
      dim AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
          max(o_orderkey) AS ver_orderkey,
          max_by(o_totalprice, o_orderkey) AS ver_price
        FROM base GROUP BY 1, 2),
      fact AS (SELECT o_custkey, o_orderkey,
          CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS ts
        FROM base)
      SELECT f.o_custkey, f.o_orderkey, f.ts AS query_ts,
        d.ver_orderkey AS asof_ver_orderkey,
        d.ver_price AS asof_ver_price
      FROM fact f ASOF LEFT JOIN dim d
        ON f.o_custkey = d.o_custkey AND d.ts <= f.ts
      ORDER BY f.o_custkey, f.o_orderkey"""))

  // CDC extraction (R29, Merge.snapshotDiff — the inverse of q51's
  // MERGE): two deterministic snapshot vintages of orders diff into
  // the I/U/D changeset. "next" drops keys ≡ 3 (mod 11), reprices keys
  // ≡ 0 (mod 7) by +10.0 (one IEEE op, bit-equal everywhere), and adds
  // shifted keys ≡ 1 (mod 13); the diff must recover exactly those
  // three classes with the NEW values on U rows. DuckDB replays the
  // full-outer join with null-safe per-column comparison.
  private val q66 = Q(
    "q66_cdc_diff",
    (s, d) => {
      val prev = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val next = prev
        .filter(col("o_orderkey") % 11 =!= 3)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(10.0))
            .otherwise(col("o_totalprice")))
        .unionByName(prev.filter(col("o_orderkey") % 13 === 1)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
      graft.operators.Merge.snapshotDiff(prev, next, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("op"), col("o_custkey"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH prev AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      next AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
               ELSE o_totalprice END AS o_totalprice
        FROM prev WHERE o_orderkey % 11 <> 3
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_totalprice
        FROM prev WHERE o_orderkey % 13 = 1),
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

  // Data-quality constraint audit (R30, Quality.audit): five rule
  // kinds over orders in their three cost classes — the three row
  // rules share ONE scan/aggregate, uniqueness is one partial-agg'd
  // shuffle, FK integrity is one broadcast anti-join. The FK dimension
  // drops c_custkey ≡ 3 (mod 10) so orphans exist and the range/set
  // bounds are chosen so real rows violate them — every count is
  // non-degenerate. DuckDB recomputes each count relationally.
  private val q67 = Q(
    "q67_dq_audit",
    (s, d) => {
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer")
        .filter(col("c_custkey") % 10 =!= 3)
      graft.operators.Quality.audit(orders, Seq(
        graft.operators.Quality.NotNull("o_custkey"),
        graft.operators.Quality.InRange("o_totalprice", 0.0, 200000.0),
        graft.operators.Quality.InSet("o_orderstatus", Seq("O", "F")),
        graft.operators.Quality.Unique(Seq("o_custkey")),
        graft.operators.Quality.RefIntegrity("o_custkey", cust,
          "c_custkey")))
        .orderBy(col("rule"))
    },
    Some("""WITH rowr AS (
        SELECT 'not_null(o_custkey)' AS rule,
          count(*) FILTER (WHERE o_custkey IS NULL) AS violations,
          count(*) AS total
        FROM orders
        UNION ALL
        SELECT 'in_range(o_totalprice,0.0,200000.0)',
          count(*) FILTER (WHERE o_totalprice IS NOT NULL
            AND (o_totalprice < 0.0 OR o_totalprice > 200000.0)),
          count(*) FILTER (WHERE o_totalprice IS NOT NULL)
        FROM orders
        UNION ALL
        SELECT 'in_set(o_orderstatus)',
          count(*) FILTER (WHERE o_orderstatus IS NOT NULL
            AND o_orderstatus NOT IN ('O', 'F')),
          count(*) FILTER (WHERE o_orderstatus IS NOT NULL)
        FROM orders),
      uq AS (
        SELECT 'unique(o_custkey)' AS rule,
          CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0)
            AS BIGINT) AS violations,
          CAST(coalesce(sum(n), 0) AS BIGINT) AS total
        FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)),
      fk AS (
        SELECT 'ref_integrity(o_custkey)' AS rule,
          (SELECT count(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_custkey % 10 <> 3)) AS violations,
          (SELECT count(*) FROM orders
            WHERE o_custkey IS NOT NULL) AS total)
      SELECT rule, violations, total, violations = 0 AS ok
      FROM (SELECT * FROM rowr UNION ALL
            SELECT * FROM uq UNION ALL
            SELECT * FROM fk)
      ORDER BY rule"""))

  // k-core peeling oracle: DuckDB can't aggregate over a recursive
  // reference, so the rounds unroll as chained CTEs — generated, not
  // hand-copied, so the per-round SQL cannot drift between rounds.
  // k=22 on this graph cascades for 6 rounds at sf0.01 and 9 rounds
  // (to 143 survivors) at sf0.001 (KCoreProbe — k=25 dissolves the
  // sf0.001 graph entirely, failing the smoke contract); 14 unrolled
  // rounds = measured fixpoint + margin (post-fixpoint rounds are
  // no-ops in both engines, so over-unrolling is safe).
  private def kcoreOracle(k: Int, rounds: Int): String = {
    // each round references its predecessor three times — without
    // MATERIALIZED, CTE inlining expands 3^rounds plan copies (the
    // first attempt hit DuckDB's file-handle limit re-opening the
    // parquet exponentially many times)
    val steps = (1 to rounds).map { i =>
      s""",
      n$i AS MATERIALIZED (SELECT x AS node_id FROM (
          SELECT u AS x FROM e${i - 1}
          UNION ALL SELECT v AS x FROM e${i - 1}) t
        GROUP BY 1 HAVING count(*) >= $k),
      e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
        WHERE u IN (SELECT node_id FROM n$i)
          AND v IN (SELECT node_id FROM n$i))"""
    }.mkString
    s"""WITH li AS (
        SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
        FROM lineitem WHERE l_orderkey % 3 = 0),
      e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS u, y.pk AS v
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk)$steps
      SELECT x AS node_id, count(*) AS core_deg FROM (
        SELECT u AS x FROM e$rounds
        UNION ALL SELECT v AS x FROM e$rounds) t
      GROUP BY 1 ORDER BY node_id"""
  }

  // k-core extraction (R31, Graph.kCore): the 22-core of the part
  // co-occurrence graph — the q63 graph one notch denser in demand.
  // 6 peel rounds at sf0.01 (a genuine cascade, not a one-pass
  // degree filter), 1,759 surviving parts.
  private val q68 = Q(
    "q68_kcore",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(3)) === 0)
        .select(col("l_orderkey").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.kCore(edges, k = 22).orderBy(col("node_id"))
    },
    Some(kcoreOracle(k = 22, rounds = 14)))

  // OHLC bars (R32, TimeJoins.ohlcBars): hourly open/high/low/close
  // per sampled user. The operator picks open/close via struct min/max
  // in ONE partial-agg'd aggregate; the oracle replays with the q52
  // row_number-per-bucket idiom — different plan, identical picks,
  // because (us, event_id) is unique per row.
  private val q69 = Q(
    "q69_ohlc",
    (s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") % 5 === 0)
      graft.operators.TimeJoins
        .ohlcBars(ev, "user_id", "ts", "value", "event_id", "hour")
        .orderBy(col("user_id"), col("bucket"))
    },
    Some("""WITH obs AS (
        SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
          epoch_us(ts) AS us, event_id, value
        FROM events WHERE user_id % 5 = 0),
      r AS (SELECT *,
          row_number() OVER (PARTITION BY user_id, bucket
            ORDER BY us, event_id) AS ra,
          row_number() OVER (PARTITION BY user_id, bucket
            ORDER BY us DESC, event_id DESC) AS rd
        FROM obs)
      SELECT user_id, bucket,
        max(CASE WHEN ra = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        max(CASE WHEN rd = 1 THEN value END) AS close,
        count(*) AS n_obs
      FROM r GROUP BY 1, 2 ORDER BY user_id, bucket"""))

  // Time-weighted average (R33, TimeJoins.twap): per sampled user over
  // their whole event span; exact µs weights, DECIMAL(38,6) weighted
  // sum, one 6dp-rounded IEEE division.
  private val q70 = Q(
    "q70_twap",
    (s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") % 7 === 0)
      graft.operators.TimeJoins
        .twap(ev, "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id"))
    },
    Some("""WITH obs AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
          round(value, 6) AS v
        FROM events WHERE user_id % 7 = 0),
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

  // Join-key skew profile (R34, Skew.keyProfile) over the events
  // event_type key — low-cardinality and uneven, exactly the key shape
  // the diagnostic exists to flag before a shuffle strategy is chosen.
  private val q71 = Q(
    "q71_skew_profile",
    (s, d) =>
      graft.operators.Skew
        .keyProfile(t(s, d, "events"), Seq("event_type"), topK = 5,
          saltThreshold = 4.0)
        .orderBy(col("rank")),
    Some("""WITH c AS (
        SELECT event_type, count(*) AS n_rows FROM events GROUP BY 1),
      g AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
          count(*) AS n_keys, max(n_rows) AS mx FROM c),
      r AS (SELECT event_type, n_rows,
          row_number() OVER (ORDER BY n_rows DESC, event_type) AS rank
        FROM c)
      SELECT r.event_type, r.n_rows, r.rank, g.n_total, g.n_keys,
        round(CAST(r.n_rows AS DOUBLE) / g.n_total, 6) AS share,
        round(CAST(g.n_total AS DOUBLE) / g.n_keys, 6) AS avg_rows,
        round(CAST(g.mx AS DOUBLE) * g.n_keys / g.n_total, 6)
          AS skew_factor,
        round(CAST(g.mx AS DOUBLE) * g.n_keys / g.n_total, 6) > 4.0
          AS salt_recommended
      FROM r, g WHERE r.rank <= 5 ORDER BY r.rank"""))

  // Chi-square independence (R35, Stats.chiSquare): is document
  // language independent of source? Full contingency diagnostic —
  // per-cell observed/expected/term with the denormalized verdict.
  private val q72 = Q(
    "q72_chi2",
    (s, d) =>
      graft.operators.Stats
        .chiSquare(t(s, d, "documents"), "lang", "source")
        .orderBy(col("lang"), col("source")),
    Some("""WITH cells AS (
        SELECT lang, source, count(*) AS observed
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY 1, 2),
      rt AS (SELECT lang, CAST(sum(observed) AS BIGINT) AS row_tot
        FROM cells GROUP BY 1),
      ct AS (SELECT source, CAST(sum(observed) AS BIGINT) AS col_tot
        FROM cells GROUP BY 1),
      g AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total,
          count(DISTINCT lang) AS na, count(DISTINCT source) AS nb
        FROM cells),
      e AS (SELECT rt.lang, ct.source,
          coalesce(c.observed, 0) AS observed,
          round(CAST(rt.row_tot AS DOUBLE) * ct.col_tot / g.n_total, 6)
            AS expected
        FROM rt CROSS JOIN ct
        LEFT JOIN cells c ON c.lang = rt.lang AND c.source = ct.source,
        g),
      tt AS (SELECT *,
          CAST(round(CAST(CAST((observed - expected) * (observed - expected)
            / expected AS VARCHAR) AS DECIMAL(38,20)), 12) AS DOUBLE) AS term
        FROM e),
      st AS (SELECT round(CAST(sum(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,12)))
          AS DOUBLE), 6) AS chi2 FROM tt)
      SELECT tt.lang, tt.source, tt.observed, tt.expected, tt.term,
        st.chi2, CAST((g.na - 1) * (g.nb - 1) AS BIGINT) AS dof
      FROM tt, st, g ORDER BY tt.lang, tt.source"""))

  // Welch's t-test (R36, Stats.welchTTest): do click and purchase
  // events carry different mean values? One conditional-aggregate
  // pass; t and dof from the 6dp-rounded moments.
  private val q73 = Q(
    "q73_welch",
    (s, d) =>
      graft.operators.Stats
        .welchTTest(t(s, d, "events"), "event_type", "click",
          "purchase", "value"),
    Some("""WITH a AS (SELECT
        count(*) FILTER (event_type = 'click') AS n_a,
        count(*) FILTER (event_type = 'purchase') AS n_b,
        round(avg(value) FILTER (event_type = 'click'), 6) AS mean_a,
        round(avg(value) FILTER (event_type = 'purchase'), 6) AS mean_b,
        round(var_samp(value) FILTER (event_type = 'click'), 6) AS var_a,
        round(var_samp(value) FILTER (event_type = 'purchase'), 6)
          AS var_b
      FROM events)
      SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
        CASE WHEN n_a >= 2 AND n_b >= 2
              AND (var_a / n_a + var_b / n_b) > 0
          THEN round((mean_a - mean_b)
            / sqrt(var_a / n_a + var_b / n_b), 4) END AS t_stat,
        CASE WHEN n_a >= 2 AND n_b >= 2
              AND (var_a / n_a + var_b / n_b) > 0
          THEN round(pow(var_a / n_a + var_b / n_b, 2)
            / (pow(var_a / n_a, 2) / (n_a - 1)
              + pow(var_b / n_b, 2) / (n_b - 1)), 4) END AS dof
      FROM a"""))

  // Benford first-digit conformance (R37, Stats.benford) over order
  // totals — integer-exact digit extraction (scaled-long string head),
  // all nine digits reported including never-observed ones.
  private val q74 = Q(
    "q74_benford",
    (s, d) =>
      graft.operators.Stats
        .benford(t(s, d, "orders"), "o_totalprice", scale = 2)
        .orderBy(col("digit")),
    Some("""WITH v AS (
        SELECT CAST(round(abs(o_totalprice) * 100, 0) AS BIGINT) AS v2
        FROM orders),
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

  // Batch twin of the streaming SCD2 historize (ST15, StreamScd2):
  // each user's event stream becomes versioned rows carrying the
  // payload, valid until the user's next event. Same Merge.historize
  // core as q53 but on the exact input/output shape the streaming
  // operator serves (user-keyed event rows with event_type/value
  // payload) — StreamingSpec proves stream ≡ this batch plan across a
  // microbatch cut; this key puts the shared semantics under the
  // DuckDB oracle.
  private val q75 = Q(
    "q75_scd2_stream_twin",
    (s, d) => {
      val ch = t(s, d, "events").filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
      graft.operators.Merge
        .historize(ch, Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, event_type,
        round(value, 6) AS value,
        CAST(ts AS TIMESTAMP) AS valid_from,
        CAST(lead(ts) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS TIMESTAMP) AS valid_to,
        (lead(ts) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) IS NULL) AS is_current
      FROM events WHERE user_id % 20 = 0
      ORDER BY user_id, valid_from, event_id"""))

  // Kolmogorov–Smirnov two-sample test (R38, Stats.ksTest): do click
  // and purchase values follow the same distribution? The D argmax
  // runs over exact integer cross-products; the prefix sums behind the
  // ECDFs use the two-phase bucket decomposition (no global sort).
  private val q76 = Q(
    "q76_ks",
    (s, d) =>
      graft.operators.Stats
        .ksTest(t(s, d, "events"), "event_type", "click", "purchase",
          "value"),
    Some("""WITH f AS (SELECT value AS v, event_type FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
      h AS (SELECT v,
          CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_a,
          CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_b
        FROM f GROUP BY 1),
      c AS (SELECT v, n_a, n_b,
          CAST(sum(n_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
          CAST(sum(n_b) OVER (ORDER BY v) AS BIGINT) AS cum_b FROM h),
      tot AS (SELECT CAST(coalesce(sum(n_a), 0) AS BIGINT) AS ta,
          CAST(coalesce(sum(n_b), 0) AS BIGINT) AS tb FROM h),
      dm AS (SELECT max(abs(CAST(c.cum_a AS HUGEINT) * tot.tb
            - CAST(c.cum_b AS HUGEINT) * tot.ta)) AS dnum
        FROM c, tot),
      st AS (SELECT tot.ta AS n_a, tot.tb AS n_b,
          CASE WHEN tot.ta > 0 AND tot.tb > 0 THEN
            round(CAST(dm.dnum AS DOUBLE)
              / (CAST(tot.ta AS DOUBLE) * tot.tb), 6) END AS d_stat
        FROM tot, dm)
      SELECT n_a, n_b, d_stat,
        CASE WHEN d_stat IS NOT NULL THEN
          round(d_stat * sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 4)
          END AS c_stat,
        CASE WHEN d_stat IS NOT NULL THEN
          round(d_stat * sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 4)
            > 1.358 END AS reject_05
      FROM st"""))

  // Mann–Whitney U / Wilcoxon rank-sum (R39, Stats.mannWhitney): the
  // rank-based companion of q73's Welch test. Midranks and the tie
  // term stay exact integers in both engines; only z is IEEE.
  private val q77 = Q(
    "q77_mwu",
    (s, d) =>
      graft.operators.Stats
        .mannWhitney(t(s, d, "events"), "event_type", "click",
          "purchase", "value"),
    Some("""WITH f AS (SELECT value AS v, event_type FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
      h AS (SELECT v,
          CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_a,
          CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_b
        FROM f GROUP BY 1),
      c AS (SELECT v, n_a, n_b,
          CAST(sum(n_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
          CAST(sum(n_b) OVER (ORDER BY v) AS BIGINT) AS cum_b FROM h),
      g AS (SELECT
          CAST(coalesce(sum(n_a), 0) AS BIGINT) AS ta,
          CAST(coalesce(sum(n_b), 0) AS BIGINT) AS tb,
          coalesce(sum(CAST(n_a AS HUGEINT)
            * (2 * (cum_a + cum_b - n_a - n_b) + (n_a + n_b) + 1)),
            0) AS r2a,
          coalesce(sum(CAST(n_a + n_b AS HUGEINT) * (n_a + n_b)
            * (n_a + n_b) - (n_a + n_b)), 0) AS ties
        FROM c),
      u AS (SELECT ta, tb, ties,
          r2a - CAST(ta AS HUGEINT) * (ta + 1) AS u2,
          CAST(ta AS HUGEINT) * tb AS mu2,
          CAST(ta AS DOUBLE) * tb / 12.0 * ((ta + tb + 1)
            - CAST(ties AS DOUBLE)
              / (CAST(ta + tb AS DOUBLE) * (ta + tb - 1))) AS varu
        FROM g)
      SELECT ta AS n_a, tb AS n_b,
        CASE WHEN ta > 0 AND tb > 0
          THEN CAST(u2 AS DOUBLE) / 2.0 END AS u_stat,
        CASE WHEN ta > 0 AND tb > 0 AND ta + tb > 1 AND varu > 0
          THEN round(CAST(u2 - mu2 AS DOUBLE) / 2.0 / sqrt(varu), 4)
          END AS z_stat,
        CASE WHEN ta > 0 AND tb > 0 AND ta + tb > 1 AND varu > 0
          THEN abs(round(CAST(u2 - mu2 AS DOUBLE) / 2.0 / sqrt(varu), 4))
            > 1.96 END AS reject_05
      FROM u"""))

  // Spearman rank correlation (A13, Stats.spearman): quantity vs
  // extended price over lineitem. Doubled midranks keep every moment
  // an exact integer in both engines; only the final rho is IEEE.
  private val q78 = Q(
    "q78_spearman",
    (s, d) =>
      graft.operators.Stats
        .spearman(t(s, d, "lineitem"), "l_quantity", "l_extendedprice"),
    Some("""WITH r AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
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

  // Classical additive seasonal decomposition (R40,
  // TimeJoins.seasonalDecompose): hourly event counts per type split
  // into trend (2×24 centered MA — the even-period branch) + daily
  // seasonal + residual. Counts are exact integers and every mean is
  // one IEEE division of DECIMAL-exact sums, so the whole
  // decomposition is bit-equal cross-engine.
  private val q79 = Q(
    "q79_seasonal",
    (s, d) => {
      val series = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .as("hr"))
        .agg(count(lit(1)).cast("double").as("value"))
      graft.operators.TimeJoins.seasonalDecompose(series, "event_type",
          "hr", "value", period = 24)
        .orderBy(col("event_type"), col("hr"))
    },
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      b AS (SELECT k, hr, CAST(round(v, 6) AS DECIMAL(18,6)) AS v6,
          CAST(CAST(round(v, 6) AS DECIMAL(18,6)) * 1000000 AS HUGEINT)
            AS v6i
        FROM s),
      w AS (SELECT k, hr, v6,
          count(v6) OVER win AS n_in,
          max(hr) OVER win - min(hr) OVER win AS span_in,
          sum(v6i) OVER win AS s_in,
          lag(v6i, 12) OVER wo AS lo,
          lead(v6i, 12) OVER wo AS hi,
          lag(hr, 12) OVER wo AS lot,
          lead(hr, 12) OVER wo AS hit,
          hr % 24 AS phase
        FROM b
        WINDOW win AS (PARTITION BY k ORDER BY hr
            ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING),
          wo AS (PARTITION BY k ORDER BY hr)),
      -- the trend quotient rounds via exact HUGEINT half-away division
      -- at micros scale (the operator's roundDiv6): round(x/d, 6) on
      -- the double quotient diverges cross-engine when the rational
      -- sits exactly on a .5e-6 boundary
      tr AS (SELECT k, hr, v6, phase,
          CASE WHEN n_in = 23 AND span_in = 22
              AND lot = hr - 12 AND hit = hr + 12
            THEN CAST(CASE WHEN s_in * 2 + lo + hi >= 0
                THEN (2*(s_in * 2 + lo + hi) + 48) // 96
                ELSE -((-2*(s_in * 2 + lo + hi) + 48) // 96) END
              AS DOUBLE) / 1000000.0
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
      SELECT tr.k AS event_type, tr.hr, CAST(tr.v6 AS DOUBLE) AS value,
        tr.phase, tr.trend, sc.seasonal,
        CASE WHEN tr.trend IS NOT NULL AND sc.seasonal IS NOT NULL
          THEN round(CAST(tr.v6 AS DOUBLE) - tr.trend - sc.seasonal, 6)
          END AS residual
      FROM tr LEFT JOIN sc ON tr.k = sc.k AND tr.phase = sc.phase
      ORDER BY event_type, hr"""))

  // Single-source BFS hop distance (R41, Graph.bfsHops) over the q62
  // customer–supplier graph, source = the minimum node id (a 1-row
  // aggregate frame, never a collected literal). Distances are exact
  // integers; the oracle walks the same graph with a bounded
  // recursive CTE and takes min(dist) per node.
  private val q80 = Q(
    "q80_bfs",
    (s, d) => {
      val edges = t(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && pmod(col("o_custkey"), lit(20)) === pmod(col("l_suppkey"), lit(20)))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
        // r16: materialize the derived edge set ONCE — the sources
        // aggregate below and bfsHops' adj frame otherwise each
        // re-execute the full orders⋈lineitem derivation
        .localCheckpoint()
      val src = edges.agg(min(col("src")).as("node_id"))
      graft.operators.Graph.bfsHops(edges, src)
        .orderBy(col("node_id"))
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0),
      edges AS (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst, src FROM e0),
      s AS (SELECT min(src) AS node_id FROM e0),
      r(node_id, dist) AS (
        SELECT node_id, CAST(0 AS BIGINT) FROM s
        UNION
        SELECT e.b, r.dist + 1 FROM r JOIN edges e ON r.node_id = e.a
          WHERE r.dist < 40)
      SELECT node_id, min(dist) AS dist FROM r
      GROUP BY 1 ORDER BY node_id"""))

  // Kendall tau-b (A14, Stats.kendallTau): quantity vs bucketed price
  // over lineitem — the y axis is width_bucket-discretized to meet the
  // operator's bounded-grid contract. Every pair count is exact
  // integer arithmetic over the 2D cumulative grid; only the final
  // tau is IEEE, rounded 6dp.
  private val q81 = Q(
    "q81_kendall",
    (s, d) => {
      val price = col("l_extendedprice").cast("double")
      val li = t(s, d, "lineitem")
        .select(col("l_quantity").as("x"),
          // explicit bucket arithmetic (identical IEEE expression in
          // the oracle — q22 proves width_bucket itself)
          when(price < 900.0, lit(0L))
            .when(price >= 105000.0, lit(65L))
            .otherwise(floor((price - 900.0) * 64.0 / 104100.0)
              .cast("long") + 1)
            .as("y"))
      graft.operators.Stats.kendallTau(li, "x", "y")
    },
    Some("""WITH r AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
          CAST(CASE WHEN CAST(l_extendedprice AS DOUBLE) < 900.0 THEN 0
            WHEN CAST(l_extendedprice AS DOUBLE) >= 105000.0 THEN 65
            ELSE CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0)
              * 64.0 / 104100.0) AS BIGINT) + 1 END AS DOUBLE) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
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

  // CUSUM mean-shift detection (R42, TimeJoins.cusum) on the q79
  // hourly count series. The oracle replays the prefix-sum/running-min
  // closed form of the textbook recursion exactly.
  private val q82 = Q(
    "q82_cusum",
    (s, d) => {
      val series = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .as("hr"))
        .agg(count(lit(1)).cast("double").as("value"))
      graft.operators.TimeJoins.cusum(series, "event_type", "hr",
          "value")
        .orderBy(col("event_type"), col("hr"))
    },
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      mu AS (SELECT k,
          round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6)))
            AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mu
        FROM s GROUP BY 1),
      c AS (SELECT s.k, hr, v, mu,
          count(*) OVER w AS i,
          CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6))) OVER w
            AS DECIMAL(38,6)) AS cs
        FROM s JOIN mu USING (k)
        WINDOW w AS (PARTITION BY s.k ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cc AS (SELECT k, hr, v,
          round(CAST(cs AS DOUBLE) - i * (mu + 0.5), 6) AS cup,
          round(-CAST(cs AS DOUBLE) + i * (mu - 0.5), 6) AS cdn
        FROM c),
      sc AS (SELECT k, hr, v,
          round(cup - least(0.0, min(cup) OVER w2), 6) AS cusum_up,
          round(cdn - least(0.0, min(cdn) OVER w2), 6) AS cusum_dn
        FROM cc WINDOW w2 AS (PARTITION BY k ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT k AS event_type, hr, v AS value, cusum_up, cusum_dn,
        cusum_up > 5.0 OR cusum_dn > 5.0 AS flagged
      FROM sc ORDER BY event_type, hr"""))

  // Autocorrelation at lags 1..25 (R43, TimeJoins.acf) on the same
  // series — the lag-24 row is the daily-cycle probe seasonal
  // decomposition relies on. The oracle builds lag pairs by a
  // row-number self-join instead of 25 window passes.
  private val q83 = Q(
    "q83_acf",
    (s, d) => {
      val series = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .as("hr"))
        .agg(count(lit(1)).cast("double").as("value"))
      graft.operators.TimeJoins.acf(series, "event_type", "hr",
          "value", maxLag = 25)
        .orderBy(col("event_type"), col("lag"))
    },
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      mu AS (SELECT k,
          round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6)))
            AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mu
        FROM s GROUP BY 1),
      d AS (SELECT s.k, hr,
          CAST(round(round(v, 6) - mu, 6) AS DECIMAL(18,6)) AS dd,
          row_number() OVER (PARTITION BY s.k ORDER BY hr) AS rn
        FROM s JOIN mu USING (k)),
      den AS (SELECT k,
          CAST(sum(dd * dd) AS DECIMAL(38,12)) AS ss
        FROM d GROUP BY 1),
      pairs AS (SELECT a.k, l.lag, a.dd AS da, b.dd AS db
        FROM d a
        CROSS JOIN (SELECT unnest(range(1, 26)) AS lag) l
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

  // Degree assortativity (R44, Graph.assortativity) over the q62
  // customer–supplier graph. Integer degree moments as HUGEINT; one
  // IEEE division.
  private val q84 = Q(
    "q84_assort",
    (s, d) => {
      val edges = t(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && pmod(col("o_custkey"), lit(20)) === pmod(col("l_suppkey"), lit(20)))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      graft.operators.Graph.assortativity(edges)
    },
    Some("""WITH e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0),
      canon AS (SELECT DISTINCT least(src, dst) AS u,
          greatest(src, dst) AS v
        FROM e0 WHERE src <> dst),
      deg AS (SELECT x AS node_id, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT u AS x FROM canon
          UNION ALL SELECT v AS x FROM canon) t GROUP BY 1),
      bid AS (SELECT u AS a, v AS b FROM canon
        UNION ALL SELECT v, u FROM canon),
      m AS (SELECT CAST(count(*) AS HUGEINT) AS n_ends,
          coalesce(sum(CAST(x.deg AS HUGEINT)), 0) AS s1,
          coalesce(sum(CAST(x.deg AS HUGEINT) * x.deg), 0) AS s2,
          coalesce(sum(CAST(x.deg AS HUGEINT) * y.deg), 0) AS s11
        FROM bid JOIN deg x ON bid.a = x.node_id
          JOIN deg y ON bid.b = y.node_id)
      SELECT CAST(n_ends AS BIGINT) AS n_ends,
        CASE WHEN n_ends >= 2
            AND CAST(n_ends * s2 - s1 * s1 AS DOUBLE) > 0
          THEN round(CAST(n_ends * s11 - s1 * s1 AS DOUBLE)
            / CAST(n_ends * s2 - s1 * s1 AS DOUBLE), 6) END
          AS assortativity
      FROM m"""))

  // Per-group OLS linear fit (R45, Stats.linearFit): extended price
  // regressed on quantity within each return flag. All moments exact
  // DECIMAL; slope/intercept/R² are IEEE on agreed operands, 6dp.
  private val q85 = Q(
    "q85_ols",
    (s, d) =>
      graft.operators.Stats
        .linearFit(t(s, d, "lineitem"), "l_returnflag", "l_quantity",
          "l_extendedprice")
        .orderBy(col("l_returnflag")),
    Some("""WITH r AS (SELECT l_returnflag AS k,
          CAST(round(CAST(l_quantity AS DOUBLE), 6) AS DECIMAL(18,6))
            AS x,
          CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      m AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
          CAST(sum(CAST(y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sy,
          CAST(sum(CAST(CAST(x AS DECIMAL(20,6)) * y AS DECIMAL(38,12)))
            AS DECIMAL(38,12)) AS sxy,
          CAST(sum(CAST(CAST(x AS DECIMAL(20,6)) * x AS DECIMAL(38,12)))
            AS DECIMAL(38,12)) AS sxx,
          CAST(sum(CAST(CAST(y AS DECIMAL(20,6)) * y AS DECIMAL(38,12)))
            AS DECIMAL(38,12)) AS syy
        FROM r GROUP BY 1),
      v AS (SELECT k, n,
          CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
          CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
          CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM m)
      SELECT k AS l_returnflag, n,
        CASE WHEN n >= 2 AND vx > 0 THEN round(cov / vx, 6) END
          AS slope,
        CASE WHEN n >= 2 AND vx > 0
          THEN round((syd - round(cov / vx, 6) * sxd)
            / CAST(n AS DOUBLE), 6) END AS intercept,
        CASE WHEN n >= 2 AND vx > 0 AND vy > 0
          THEN round(cov * cov / (vx * vy), 6) END AS r2
      FROM v ORDER BY l_returnflag"""))

  // HITS hubs/authorities (R46, Graph.hits) over the directed
  // customer→supplier graph. The oracle is GENERATED — one CTE block
  // per mutual-reinforcement round replaying the exact decimal sums,
  // exact maxes, and 8dp normalizing divisions.
  private def hitsOracle(iters: Int): String = {
    val head = """WITH e AS MATERIALIZED (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0),
      nodes AS MATERIALIZED (SELECT DISTINCT x AS node_id FROM
        (SELECT src AS x FROM e UNION ALL SELECT dst FROM e) t),
      s0 AS MATERIALIZED (SELECT node_id, CAST(1.0 AS DOUBLE) AS hub,
        CAST(1.0 AS DOUBLE) AS auth FROM nodes)"""
    val rounds = (1 to iters).map { r =>
      s"""
      asum$r AS MATERIALIZED (SELECT e.dst AS node_id,
          CAST(sum(CAST(p.hub AS DECIMAL(28,8))) AS DECIMAL(38,8)) AS s
        FROM e JOIN s${r - 1} p ON e.src = p.node_id GROUP BY 1),
      amax$r AS (SELECT max(s) AS m FROM asum$r),
      a$r AS MATERIALIZED (SELECT p.node_id, p.hub,
          coalesce(round(CAST(q.s AS DOUBLE)
            / CAST(amax$r.m AS DOUBLE), 8), 0.0) AS auth
        FROM s${r - 1} p LEFT JOIN asum$r q ON p.node_id = q.node_id
        CROSS JOIN amax$r),
      hsum$r AS MATERIALIZED (SELECT e.src AS node_id,
          CAST(sum(CAST(p.auth AS DECIMAL(28,8))) AS DECIMAL(38,8)) AS s
        FROM e JOIN a$r p ON e.dst = p.node_id GROUP BY 1),
      hmax$r AS (SELECT max(s) AS m FROM hsum$r),
      s$r AS MATERIALIZED (SELECT p.node_id,
          coalesce(round(CAST(q.s AS DOUBLE)
            / CAST(hmax$r.m AS DOUBLE), 8), 0.0) AS hub, p.auth
        FROM a$r p LEFT JOIN hsum$r q ON p.node_id = q.node_id
        CROSS JOIN hmax$r)"""
    }.mkString(",")
    head + "," + rounds +
      s"\n      SELECT node_id, hub, auth FROM s$iters ORDER BY node_id"
  }

  private val q86 = Q(
    "q86_hits",
    (s, d) => {
      val edges = t(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && pmod(col("o_custkey"), lit(20)) === pmod(col("l_suppkey"), lit(20)))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
      graft.operators.Graph.hits(edges).orderBy(col("node_id"))
    },
    Some(hitsOracle(3)))

  // Edit-distance similarity join (R47, Linkage.editDistancePairs) on
  // 32-char document prefixes — catches the planted near-dups at the
  // CHARACTER level. The oracle is the UNBLOCKED cross join (the P4c
  // discipline): a hash match proves the segment blocking has recall 1.
  private val q87 = Q(
    "q87_editdist",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id").as("id"),
          substring(lower(col("text")), 1, 32).as("s"))
      graft.operators.Linkage.editDistancePairs(docs, "id", "s", k = 2)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""WITH d AS (SELECT doc_id AS id, substr(lower(text), 1, 32) AS s
        FROM documents WHERE text IS NOT NULL)
      SELECT a.id AS a_id, b.id AS b_id,
        CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      FROM d a JOIN d b ON a.id < b.id
        AND abs(length(a.s) - length(b.s)) <= 2
      WHERE levenshtein(a.s, b.s) <= 2
      ORDER BY a_id, b_id"""))

  // Weighted SSSP (R48, Graph.weightedShortestPaths) on the q62 graph
  // with a deterministic per-supplier edge weight. The oracle is a
  // cost-bounded recursive CTE taking min(total weight) per node —
  // the bound (150) exceeds every true shortest distance, so pruning
  // longer walks cannot change any minimum.
  private val q88 = Q(
    "q88_sssp_weighted",
    (s, d) => {
      val edges = t(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && pmod(col("o_custkey"), lit(20)) === pmod(col("l_suppkey"), lit(20)))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
        .withColumn("w", expr("((dst - 1) div 2) % 5 + 1"))
        // r16: materialize once — see q80_bfs
        .localCheckpoint()
      val src = edges.agg(min(col("src")).as("node_id"))
      graft.operators.Graph.weightedShortestPaths(edges, src)
        .orderBy(col("node_id"))
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0),
      ew AS (SELECT src, dst, ((dst - 1) // 2) % 5 + 1 AS w FROM e0),
      edges AS (
        SELECT src AS a, dst AS b, w FROM ew
        UNION ALL SELECT dst, src, w FROM ew),
      s AS (SELECT min(src) AS node_id FROM e0),
      r(node_id, d) AS (
        SELECT node_id, CAST(0 AS BIGINT) FROM s
        UNION
        SELECT e.b, r.d + e.w FROM r JOIN edges e ON r.node_id = e.a
          WHERE r.d + e.w <= 150)
      SELECT node_id, min(d) AS dist FROM r
      GROUP BY 1 ORDER BY node_id"""))

  // Lead-lag cross-correlation (R49, TimeJoins.ccf): hourly event
  // volume vs hourly high-value volume per type, lags ±6. Both series
  // are exact integer counts; the oracle builds signed-lag pairs with
  // a row-number self-join.
  private val q89 = Q(
    "q89_ccf",
    (s, d) => {
      val series = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .as("hr"))
        .agg(count(lit(1)).cast("double").as("x"),
          count(when(col("value") > 50.0, 1)).cast("double").as("y"))
      graft.operators.TimeJoins.ccf(series, "event_type", "hr",
          "x", "y", maxLag = 6)
        .orderBy(col("event_type"), col("lag"))
    },
    Some("""WITH s AS (SELECT event_type AS k,
          epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS DOUBLE) AS x,
          CAST(count(*) FILTER (value > 50.0) AS DOUBLE) AS y
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
        CROSS JOIN (SELECT unnest(range(-6, 7)) AS lag) l
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

  // Winsorization at exact per-flag price quantiles (R50,
  // Quality.winsorize). The q19 percentile ≡ quantile_cont alignment
  // makes the bounds — and therefore every clamp — engine-exact.
  private val q90 = Q(
    "q90_winsorize",
    (s, d) =>
      graft.operators.Quality
        .winsorize(t(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_returnflag"),
              col("l_extendedprice").cast("double").as("price")),
          "l_returnflag", "price")
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""WITH b AS (SELECT l_returnflag AS k,
          round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05), 6)
            AS lo,
          round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 6)
            AS hi
        FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1)
      SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
        CAST(l.l_extendedprice AS DOUBLE) AS price, b.lo, b.hi,
        CASE WHEN l.l_extendedprice IS NULL THEN NULL
          ELSE least(greatest(CAST(l.l_extendedprice AS DOUBLE), b.lo),
            b.hi) END AS winsorized,
        coalesce(CAST(l.l_extendedprice AS DOUBLE) < b.lo
          OR CAST(l.l_extendedprice AS DOUBLE) > b.hi, false) AS clipped
      FROM lineitem l LEFT JOIN b ON l.l_returnflag = b.k
      ORDER BY l.l_orderkey, l.l_linenumber"""))

  // One-pass correlation matrix (R51, Stats.corrMatrix) over four
  // lineitem measures. All six pair correlations from one aggregate;
  // the oracle recomputes each from the same decimal moments.
  private val q91 = Q(
    "q91_corrmatrix",
    (s, d) =>
      graft.operators.Stats
        .corrMatrix(t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_x"), col("col_y")),
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val sums = cols.map(c =>
        s"""CAST(sum(CAST(CAST(round(CAST($c AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12))
            AS s_$c,
          CAST(sum(CAST(CAST(round(CAST($c AS DOUBLE), 6)
            AS DECIMAL(20,6)) * CAST(round(CAST($c AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12))
            AS ss_$c""").mkString(",\n          ")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val prods = pairs.map { case (a, b) =>
        s"""CAST(sum(CAST(CAST(round(CAST($a AS DOUBLE), 6)
            AS DECIMAL(20,6)) * CAST(round(CAST($b AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12))
            AS sp_${a}_$b""" }.mkString(",\n          ")
      val legs = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
          CASE WHEN n >= 2
              AND CAST(ss_$a AS DOUBLE) * n
                - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE) > 0
              AND CAST(ss_$b AS DOUBLE) * n
                - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE) > 0
            THEN round((CAST(sp_${a}_$b AS DOUBLE) * n
                - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
              / sqrt((CAST(ss_$a AS DOUBLE) * n
                  - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
                * (CAST(ss_$b AS DOUBLE) * n
                  - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)
            END AS corr
        FROM m"""
      }.mkString("\n        UNION ALL\n        ")
      s"""WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
          $sums,
          $prods
        FROM lineitem
        WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")})
        SELECT col_x, col_y, CAST(n AS BIGINT) AS n, corr FROM (
        $legs)
        ORDER BY col_x, col_y"""
    })

  // Mutual information (R52, Stats.mutualInformation) between order
  // status and priority — the how-many-nats companion of q72's
  // chi-square on a similar categorical pair.
  private val q92 = Q(
    "q92_mutual_info",
    (s, d) =>
      graft.operators.Stats
        .mutualInformation(t(s, d, "orders"), "o_orderstatus",
          "o_orderpriority"),
    Some("""WITH cells AS (SELECT o_orderstatus AS a,
          o_orderpriority AS b, CAST(count(*) AS BIGINT) AS nab
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
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

  // R53: Mann-Kendall monotonic trend per user over the event value
  // series (Stats.mannKendall). S and the tie-corrected variance
  // numerator are exact integers in both engines; z is one IEEE
  // expression rounded 6dp, and the trend label classifies the
  // ROUNDED z. The oracle replays the identical per-key pair join.
  private val q96 = Q(
    "q96_mann_kendall",
    (s, d) =>
      graft.operators.Stats
        .mannKendall(t(s, d, "events").filter(col("user_id") % 9 === 0),
          "user_id", "ts", "value", "event_id")
        .orderBy(col("user_id")),
    Some("""WITH obs AS (
        SELECT user_id AS k, ts AS t, event_id AS i, value AS v
        FROM events
        WHERE user_id % 9 = 0 AND value IS NOT NULL AND ts IS NOT NULL),
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

  // R54: Theil–Sen robust slope per user (Stats.theilSen) — the
  // magnitude companion of q96. Each pairwise slope is one IEEE
  // expression on exact operands; both engines sort the identical
  // doubles and take the same middle element(s), round 6dp, with a
  // +0.0 guard normalizing −0.0.
  private val q97 = Q(
    "q97_theil_sen",
    (s, d) =>
      graft.operators.Stats
        .theilSen(t(s, d, "events").filter(col("user_id") % 9 === 0),
          "user_id", "ts", "value")
        .orderBy(col("user_id")),
    Some("""WITH obs AS (
        SELECT user_id AS k, epoch_us(ts) AS us, value AS v
        FROM events
        WHERE user_id % 9 = 0 AND value IS NOT NULL AND ts IS NOT NULL),
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

  // Q2/SQL-first parity (r9 verdict #8): the analytics families reach
  // `spark.sql` through injected TABLE functions (GraftExtensions
  // injectTableFunction) that return the operator's own LogicalPlan —
  // one implementation, two surfaces. Each key below runs PURELY
  // through SQL text with parameters distinct from its operator twin
  // (q55/q59/q69), so it earns its own oracle; SqlSurfaceSpec asserts
  // the SQL and DataFrame paths optimize to the same plan.
  private val q93 = Q(
    "q93_sql_funnel",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT level, count(*) AS n_users
        FROM graft_funnel('events', 'signup,click,purchase', '5 days')
        GROUP BY level ORDER BY level""")
    },
    Some("""WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 5 DAY
        GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s1.t1 + INTERVAL 5 DAY
        GROUP BY 1)
      SELECT 1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
          AS level,
        count(*) AS n_users
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      GROUP BY 1 ORDER BY 1"""))

  // SQL-surface PageRank: the edge view is itself defined in SQL, then
  // `FROM graft_pagerank(...)` runs the operator's plan — 2 rounds
  // (vs q59's 3) so the unrolled oracle is genuinely distinct.
  private val q94 = Q(
    "q94_sql_pagerank",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW pr_edges AS
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey""")
      s.sql("""SELECT node_id, deg, rank
        FROM graft_pagerank('pr_edges', 2, 0.85)
        ORDER BY node_id""")
    },
    Some("""WITH e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM e0
        UNION ALL SELECT dst AS src, src AS dst FROM e0),
      deg AS (SELECT src AS node_id, count(*) AS deg FROM e GROUP BY 1),
      nn AS (SELECT count(*) AS n_nodes FROM deg),
      r0 AS (SELECT node_id, deg, n_nodes,
          round(1.0 / n_nodes, 12) AS rank
        FROM deg CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node_id,
          sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(20,12))) AS m
        FROM e JOIN r0 r ON e.src = r.node_id GROUP BY 1),
      r1 AS (SELECT r.node_id, r.deg, r.n_nodes,
          round((1.0 - 0.85) / r.n_nodes
            + 0.85 * CAST(s1.m AS DOUBLE), 12) AS rank
        FROM r0 r JOIN s1 USING (node_id)),
      s2 AS (SELECT e.dst AS node_id,
          sum(CAST(round(r.rank / r.deg, 12) AS DECIMAL(20,12))) AS m
        FROM e JOIN r1 r ON e.src = r.node_id GROUP BY 1),
      r2 AS (SELECT r.node_id, r.deg, r.n_nodes,
          round((1.0 - 0.85) / r.n_nodes
            + 0.85 * CAST(s2.m AS DOUBLE), 12) AS rank
        FROM r1 r JOIN s2 USING (node_id))
      SELECT node_id, deg, round(rank, 8) AS rank
      FROM r2 ORDER BY node_id"""))

  // SQL-surface OHLC: day bars over the full key space with the
  // population filter OUTSIDE the table function — Catalyst pushes it
  // through the aggregate (user_id is a grouping key), proving the TVF
  // plan composes with the optimizer like any other subquery.
  private val q95 = Q(
    "q95_sql_ohlc",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT user_id, bucket, open, high, low, close, n_obs
        FROM graft_ohlc('events', 'user_id', 'ts', 'value', 'event_id',
          'day')
        WHERE user_id % 3 = 0
        ORDER BY user_id, bucket""")
    },
    Some("""WITH obs AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
          epoch_us(ts) AS us, event_id, value
        FROM events WHERE user_id % 3 = 0),
      r AS (SELECT *,
          row_number() OVER (PARTITION BY user_id, bucket
            ORDER BY us, event_id) AS ra,
          row_number() OVER (PARTITION BY user_id, bucket
            ORDER BY us DESC, event_id DESC) AS rd
        FROM obs)
      SELECT user_id, bucket,
        max(CASE WHEN ra = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        max(CASE WHEN rd = 1 THEN value END) AS close,
        count(*) AS n_obs
      FROM r GROUP BY 1, 2 ORDER BY user_id, bucket"""))

  // ------------------------------------------------------------ r10:
  // SQL-first parity widened from 3 to 14 whole operators (r9 verdict
  // gap #1). Every key below runs PURELY through SQL text with params
  // DISTINCT from its DataFrame twin, so each earns its own full
  // oracle; SqlSurfaceSpec holds the plan/value parity and
  // malformed-arg contracts.

  // graft_components over a DIFFERENT sharded order graph than q62
  // (orderkey % 5, custkey/suppkey % 15).
  private val q98 = Q(
    "q98_sql_components",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW cc_edges AS
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 15 = l_suppkey % 15
        WHERE o_orderkey % 5 = 0""")
      s.sql("""SELECT node_id, component FROM graft_components('cc_edges', 40)
        ORDER BY node_id""")
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 15 = l_suppkey % 15
        WHERE o_orderkey % 5 = 0),
      edges AS (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst, src FROM e0),
      nodes AS (SELECT DISTINCT a AS node_id FROM edges),
      reach(src, dst) AS (
        SELECT node_id, node_id FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      SELECT src AS node_id, min(dst) AS component FROM reach
      GROUP BY src ORDER BY node_id"""))

  // graft_kcore at k=12 (q68 runs k=22; 12 keeps the core non-empty down to sf0.001 for the smoke gate) on the part co-occurrence
  // graph; the generated oracle unrolls the peel past its fixpoint.
  private val q99 = Q(
    "q99_sql_kcore",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW kc_edges AS
        SELECT x.pk AS src, y.pk AS dst FROM
          (SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
           FROM lineitem WHERE l_orderkey % 3 = 0) x
        JOIN
          (SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
           FROM lineitem WHERE l_orderkey % 3 = 0) y
        ON x.ok = y.ok AND x.pk < y.pk""")
      s.sql("""SELECT node_id, core_deg FROM graft_kcore('kc_edges', 12, 40)
        ORDER BY node_id""")
    },
    Some(kcoreOracle(k = 12, rounds = 16)))

  // graft_bfs from a min-node source frame over the orderkey % 5 graph
  // (q80 walks the % 7 graph).
  private val q100 = Q(
    "q100_sql_bfs",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW bfs_edges AS
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 5 = 0""")
      s.sql("""CREATE OR REPLACE TEMP VIEW bfs_src AS
        SELECT min(src) AS node_id FROM bfs_edges""")
      s.sql("""SELECT node_id, dist
        FROM graft_bfs('bfs_edges', 'bfs_src', true, 40)
        ORDER BY node_id""")
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 5 = 0),
      edges AS (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst, src FROM e0),
      s AS (SELECT min(src) AS node_id FROM e0),
      r(node_id, dist) AS (
        SELECT node_id, CAST(0 AS BIGINT) FROM s
        UNION
        SELECT e.b, r.dist + 1 FROM r JOIN edges e ON r.node_id = e.a
          WHERE r.dist < 40)
      SELECT node_id, min(dist) AS dist FROM r
      GROUP BY 1 ORDER BY node_id"""))

  // graft_sssp with a % 7 + 1 edge-weight formula (q88 uses % 5 + 1);
  // the oracle's recursion bound 210 exceeds every true distance.
  private val q101 = Q(
    "q101_sql_sssp",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW sssp_edges AS
        SELECT src, dst, ((dst - 1) div 2) % 7 + 1 AS w FROM (
          SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
            CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            AND o_custkey % 20 = l_suppkey % 20
          WHERE o_orderkey % 7 = 0)""")
      s.sql("""CREATE OR REPLACE TEMP VIEW sssp_src AS
        SELECT min(src) AS node_id FROM sssp_edges""")
      s.sql("""SELECT node_id, dist
        FROM graft_sssp('sssp_edges', 'sssp_src', true, 60)
        ORDER BY node_id""")
    },
    Some("""WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0),
      ew AS (SELECT src, dst, ((dst - 1) // 2) % 7 + 1 AS w FROM e0),
      edges AS (
        SELECT src AS a, dst AS b, w FROM ew
        UNION ALL SELECT dst, src, w FROM ew),
      s AS (SELECT min(src) AS node_id FROM e0),
      r(node_id, d) AS (
        SELECT node_id, CAST(0 AS BIGINT) FROM s
        UNION
        SELECT e.b, r.d + e.w FROM r JOIN edges e ON r.node_id = e.a
          WHERE r.d + e.w <= 210)
      SELECT node_id, min(d) AS dist FROM r
      GROUP BY 1 ORDER BY node_id"""))

  // graft_hits at 2 rounds (q86 runs 3) — the generated unrolled
  // oracle replays both rounds' decimal sums and 8dp max-normalizing
  // divisions.
  private val q102 = Q(
    "q102_sql_hits",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW hits_edges AS
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          AND o_custkey % 20 = l_suppkey % 20
        WHERE o_orderkey % 7 = 0""")
      s.sql("""SELECT node_id, hub, auth FROM graft_hits('hits_edges', 2)
        ORDER BY node_id""")
    },
    Some(hitsOracle(2)))

  // graft_chi2 over a DERIVED categorical pair (event type × a user
  // band) — q72's twin runs lang × source on documents.
  private val q103 = Q(
    "q103_sql_chi2",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW chi_input AS
        SELECT event_type, CAST(user_id % 3 AS BIGINT) AS user_band
        FROM events""")
      s.sql("""SELECT event_type, user_band, observed, expected, term,
          chi2, dof
        FROM graft_chi2('chi_input', 'event_type', 'user_band')
        ORDER BY event_type, user_band""")
    },
    Some("""WITH cells AS (
        SELECT event_type, CAST(user_id % 3 AS BIGINT) AS user_band,
          count(*) AS observed
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1, 2),
      rt AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS row_tot
        FROM cells GROUP BY 1),
      ct AS (SELECT user_band, CAST(sum(observed) AS BIGINT) AS col_tot
        FROM cells GROUP BY 1),
      g AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total,
          count(DISTINCT event_type) AS na,
          count(DISTINCT user_band) AS nb
        FROM cells),
      e AS (SELECT rt.event_type, ct.user_band,
          coalesce(c.observed, 0) AS observed,
          round(CAST(rt.row_tot AS DOUBLE) * ct.col_tot / g.n_total, 6)
            AS expected
        FROM rt CROSS JOIN ct
        LEFT JOIN cells c ON c.event_type = rt.event_type
          AND c.user_band = ct.user_band,
        g),
      tt AS (SELECT *,
          CAST(round(CAST(CAST((observed - expected) * (observed - expected)
            / expected AS VARCHAR) AS DECIMAL(38,20)), 12) AS DOUBLE) AS term
        FROM e),
      st AS (SELECT round(CAST(sum(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,12)))
          AS DOUBLE), 6) AS chi2 FROM tt)
      SELECT tt.event_type, tt.user_band, tt.observed, tt.expected,
        tt.term, st.chi2, CAST((g.na - 1) * (g.nb - 1) AS BIGINT) AS dof
      FROM tt, st, g ORDER BY tt.event_type, tt.user_band"""))

  // graft_welch comparing view vs click values (q73 compares click vs
  // purchase).
  private val q104 = Q(
    "q104_sql_welch",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat, dof
        FROM graft_welch('events', 'event_type', 'view', 'click', 'value')""")
    },
    Some("""WITH a AS (SELECT
        count(*) FILTER (event_type = 'view') AS n_a,
        count(*) FILTER (event_type = 'click') AS n_b,
        round(avg(value) FILTER (event_type = 'view'), 6) AS mean_a,
        round(avg(value) FILTER (event_type = 'click'), 6) AS mean_b,
        round(var_samp(value) FILTER (event_type = 'view'), 6) AS var_a,
        round(var_samp(value) FILTER (event_type = 'click'), 6)
          AS var_b
      FROM events)
      SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
        CASE WHEN n_a >= 2 AND n_b >= 2
              AND (var_a / n_a + var_b / n_b) > 0
          THEN round((mean_a - mean_b)
            / sqrt(var_a / n_a + var_b / n_b), 4) END AS t_stat,
        CASE WHEN n_a >= 2 AND n_b >= 2
              AND (var_a / n_a + var_b / n_b) > 0
          THEN round(pow(var_a / n_a + var_b / n_b, 2)
            / (pow(var_a / n_a, 2) / (n_a - 1)
              + pow(var_b / n_b, 2) / (n_b - 1)), 4) END AS dof
      FROM a"""))

  // graft_ks comparing view vs purchase value distributions (q76
  // compares click vs purchase).
  private val q105 = Q(
    "q105_sql_ks",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT n_a, n_b, d_stat, c_stat, reject_05
        FROM graft_ks('events', 'event_type', 'view', 'purchase', 'value')""")
    },
    Some("""WITH f AS (SELECT value AS v, event_type FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
      h AS (SELECT v,
          CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_a,
          CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_b
        FROM f GROUP BY 1),
      c AS (SELECT v, n_a, n_b,
          CAST(sum(n_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
          CAST(sum(n_b) OVER (ORDER BY v) AS BIGINT) AS cum_b FROM h),
      tot AS (SELECT CAST(coalesce(sum(n_a), 0) AS BIGINT) AS ta,
          CAST(coalesce(sum(n_b), 0) AS BIGINT) AS tb FROM h),
      dm AS (SELECT max(abs(CAST(c.cum_a AS HUGEINT) * tot.tb
            - CAST(c.cum_b AS HUGEINT) * tot.ta)) AS dnum
        FROM c, tot),
      st AS (SELECT tot.ta AS n_a, tot.tb AS n_b,
          CASE WHEN tot.ta > 0 AND tot.tb > 0 THEN
            round(CAST(dm.dnum AS DOUBLE)
              / (CAST(tot.ta AS DOUBLE) * tot.tb), 6) END AS d_stat
        FROM tot, dm)
      SELECT n_a, n_b, d_stat,
        CASE WHEN d_stat IS NOT NULL THEN
          round(d_stat * sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 4)
          END AS c_stat,
        CASE WHEN d_stat IS NOT NULL THEN
          round(d_stat * sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 4)
            > 1.358 END AS reject_05
      FROM st"""))

  // graft_mwu comparing view vs click ranks (q77 compares click vs
  // purchase).
  private val q106 = Q(
    "q106_sql_mwu",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT n_a, n_b, u_stat, z_stat, reject_05
        FROM graft_mwu('events', 'event_type', 'view', 'click', 'value')""")
    },
    Some("""WITH f AS (SELECT value AS v, event_type FROM events
        WHERE event_type IN ('view', 'click') AND value IS NOT NULL),
      h AS (SELECT v,
          CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_a,
          CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_b
        FROM f GROUP BY 1),
      c AS (SELECT v, n_a, n_b,
          CAST(sum(n_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
          CAST(sum(n_b) OVER (ORDER BY v) AS BIGINT) AS cum_b FROM h),
      g AS (SELECT
          CAST(coalesce(sum(n_a), 0) AS BIGINT) AS ta,
          CAST(coalesce(sum(n_b), 0) AS BIGINT) AS tb,
          coalesce(sum(CAST(n_a AS HUGEINT)
            * (2 * (cum_a + cum_b - n_a - n_b) + (n_a + n_b) + 1)),
            0) AS r2a,
          coalesce(sum(CAST(n_a + n_b AS HUGEINT) * (n_a + n_b)
            * (n_a + n_b) - (n_a + n_b)), 0) AS ties
        FROM c),
      u AS (SELECT ta, tb, ties,
          r2a - CAST(ta AS HUGEINT) * (ta + 1) AS u2,
          CAST(ta AS HUGEINT) * tb AS mu2,
          CAST(ta AS DOUBLE) * tb / 12.0 * ((ta + tb + 1)
            - CAST(ties AS DOUBLE)
              / (CAST(ta + tb AS DOUBLE) * (ta + tb - 1))) AS varu
        FROM g)
      SELECT ta AS n_a, tb AS n_b,
        CASE WHEN ta > 0 AND tb > 0
          THEN CAST(u2 AS DOUBLE) / 2.0 END AS u_stat,
        CASE WHEN ta > 0 AND tb > 0 AND ta + tb > 1 AND varu > 0
          THEN round(CAST(u2 - mu2 AS DOUBLE) / 2.0 / sqrt(varu), 4)
          END AS z_stat,
        CASE WHEN ta > 0 AND tb > 0 AND ta + tb > 1 AND varu > 0
          THEN abs(round(CAST(u2 - mu2 AS DOUBLE) / 2.0 / sqrt(varu), 4))
            > 1.96 END AS reject_05
      FROM u"""))

  // graft_ols per line status (q85 fits per return flag).
  private val q107 = Q(
    "q107_sql_ols",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT l_linestatus, n, slope, intercept, r2
        FROM graft_ols('lineitem', 'l_linestatus', 'l_quantity',
          'l_extendedprice')
        ORDER BY l_linestatus""")
    },
    Some("""WITH r AS (SELECT l_linestatus AS k,
          CAST(round(CAST(l_quantity AS DOUBLE), 6) AS DECIMAL(18,6))
            AS x,
          CAST(round(CAST(l_extendedprice AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      m AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
          CAST(sum(CAST(y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sy,
          CAST(sum(CAST(CAST(x AS DECIMAL(20,6)) * y AS DECIMAL(38,12)))
            AS DECIMAL(38,12)) AS sxy,
          CAST(sum(CAST(CAST(x AS DECIMAL(20,6)) * x AS DECIMAL(38,12)))
            AS DECIMAL(38,12)) AS sxx,
          CAST(sum(CAST(CAST(y AS DECIMAL(20,6)) * y AS DECIMAL(38,12)))
            AS DECIMAL(38,12)) AS syy
        FROM r GROUP BY 1),
      v AS (SELECT k, n,
          CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
          CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
          CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM m)
      SELECT k AS l_linestatus, n,
        CASE WHEN n >= 2 AND vx > 0 THEN round(cov / vx, 6) END
          AS slope,
        CASE WHEN n >= 2 AND vx > 0
          THEN round((syd - round(cov / vx, 6) * sxd)
            / CAST(n AS DOUBLE), 6) END AS intercept,
        CASE WHEN n >= 2 AND vx > 0 AND vy > 0
          THEN round(cov * cov / (vx * vy), 6) END AS r2
      FROM v ORDER BY l_linestatus"""))

  // graft_winsorize clamping quantity at the 10th/90th percentiles per
  // line status (q90 clamps price at 5/95 per return flag).
  private val q108 = Q(
    "q108_sql_winsorize",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW wz_input AS
        SELECT l_orderkey, l_linenumber, l_linestatus,
          CAST(l_quantity AS DOUBLE) AS qty
        FROM lineitem""")
      s.sql("""SELECT l_linestatus, l_orderkey, l_linenumber, qty, lo, hi,
          winsorized, clipped
        FROM graft_winsorize('wz_input', 'l_linestatus', 'qty', 0.1, 0.9)
        ORDER BY l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_linestatus AS k,
          round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.1), 6)
            AS lo,
          round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6)
            AS hi
        FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1)
      SELECT l.l_linestatus, l.l_orderkey, l.l_linenumber,
        CAST(l.l_quantity AS DOUBLE) AS qty, b.lo, b.hi,
        CASE WHEN l.l_quantity IS NULL THEN NULL
          ELSE least(greatest(CAST(l.l_quantity AS DOUBLE), b.lo),
            b.hi) END AS winsorized,
        coalesce(CAST(l.l_quantity AS DOUBLE) < b.lo
          OR CAST(l.l_quantity AS DOUBLE) > b.hi, false) AS clipped
      FROM lineitem l LEFT JOIN b ON l.l_linestatus = b.k
      ORDER BY l.l_orderkey, l.l_linenumber"""))

  // Kruskal–Wallis H (R55, Stats.kruskalWallis): quantity distribution
  // across the three return flags. Doubled per-group rank sums are
  // exact integers over the value histogram; the oracle replays them
  // in HUGEINT plus the identical IEEE/round ladder.
  private def kwOracle(tbl: String, g: String, v: String) =
    s"""WITH r AS (SELECT $g AS g, CAST($v AS DOUBLE) AS v
          FROM $tbl WHERE $g IS NOT NULL AND $v IS NOT NULL),
      gh AS (SELECT g, v, CAST(count(*) AS HUGEINT) AS n
        FROM r GROUP BY 1, 2),
      vt AS (SELECT v, sum(n) AS t FROM gh GROUP BY 1),
      bf AS (SELECT v, t, coalesce(sum(t) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        FROM vt),
      pg AS (SELECT g, sum(n) AS n_g, sum(n * (2 * bef + t + 1)) AS r2
        FROM gh JOIN bf USING (v) GROUP BY 1),
      mo AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
          CAST(coalesce(sum(n_g), 0) AS BIGINT) AS n_total,
          coalesce(list_reduce(list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
              / (CAST(n_g AS DOUBLE) * 4.0) ORDER BY g),
            (a, b) -> a + b), 0.0) AS srr
        FROM pg),
      ti AS (SELECT coalesce(sum(t * t * t - t), 0) AS tie3 FROM vt)
      SELECT n_groups, n_total,
        CASE WHEN n_groups >= 2 AND (1.0 - CAST(tie3 AS DOUBLE)
            / (CAST(n_total AS DOUBLE) * n_total * n_total - n_total)) > 0
          THEN round((12.0 * srr
              / (CAST(n_total AS DOUBLE) * (n_total + 1.0))
              - 3.0 * (n_total + 1.0))
            / (1.0 - CAST(tie3 AS DOUBLE)
              / (CAST(n_total AS DOUBLE) * n_total * n_total - n_total)),
            6) END AS h_stat,
        CASE WHEN n_groups >= 1 THEN CAST(n_groups - 1 AS BIGINT) END
          AS dof
      FROM mo CROSS JOIN ti"""

  private val q111 = Q(
    "q111_kw",
    (s, d) =>
      graft.operators.Stats
        .kruskalWallis(t(s, d, "lineitem"), "l_returnflag", "l_quantity"),
    Some(kwOracle("lineitem", "l_returnflag", "l_quantity")))

  // One-way ANOVA F (R56, Stats.anovaF): order totals across the five
  // priorities. Exact decimal moments per group; SSB/SSW terms one
  // IEEE expression each, 12dp, DECIMAL-summed.
  private def anovaOracle(tbl: String, g: String, v: String) =
    s"""WITH r AS (SELECT $g AS g,
          CAST(CAST(round(CAST($v AS DOUBLE), 6) AS DECIMAL(18,6))
            * 1000000 AS HUGEINT) AS v6i
        FROM $tbl WHERE $g IS NOT NULL AND $v IS NOT NULL),
      pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
          sum(v6i) AS s_g, sum(v6i * v6i) AS q_g
        FROM r GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
          CAST(coalesce(sum(n_g), 0) AS BIGINT) AS n_total,
          coalesce(sum(s_g), 0) AS s_tot
        FROM pg),
      tm AS (SELECT n_groups, n_total, g,
          CAST(n_g AS DOUBLE)
              * (round(CAST(s_g AS DOUBLE)
                  / (CAST(n_g AS DOUBLE) * 1e6), 6)
                - round(CAST(s_tot AS DOUBLE)
                  / (CAST(n_total AS DOUBLE) * 1e6), 6))
              * (round(CAST(s_g AS DOUBLE)
                  / (CAST(n_g AS DOUBLE) * 1e6), 6)
                - round(CAST(s_tot AS DOUBLE)
                  / (CAST(n_total AS DOUBLE) * 1e6), 6)) AS sb,
          greatest(CAST(q_g AS DOUBLE) / 1e12
              - (CAST(s_g AS DOUBLE) / 1e6) * (CAST(s_g AS DOUBLE) / 1e6)
                / n_g, 0.0) AS sw
        FROM pg CROSS JOIN tot),
      ag AS (SELECT n_groups, n_total,
          coalesce(list_reduce(list(sb ORDER BY g), (a, b) -> a + b),
            0.0) AS ssb,
          coalesce(list_reduce(list(sw ORDER BY g), (a, b) -> a + b),
            0.0) AS ssw
        FROM tm GROUP BY 1, 2)
      SELECT n_groups, n_total,
        ssb AS ss_between, ssw AS ss_within,
        CASE WHEN n_groups >= 2 AND n_total > n_groups AND ssw > 0
          THEN round((ssb / (CAST(n_groups AS DOUBLE) - 1.0))
            / (ssw / (CAST(n_total AS DOUBLE)
              - CAST(n_groups AS DOUBLE))), 4) END AS f_stat,
        CAST(n_groups - 1 AS BIGINT) AS dof_between,
        CAST(n_total - n_groups AS BIGINT) AS dof_within,
        CASE WHEN n_groups >= 2 AND (ssb + ssw) > 0
          THEN round(ssb / (ssb + ssw), 6) END AS eta_sq
      FROM ag"""

  private val q112 = Q(
    "q112_anova",
    (s, d) =>
      graft.operators.Stats
        .anovaF(t(s, d, "orders"), "o_orderpriority", "o_totalprice"),
    Some(anovaOracle("orders", "o_orderpriority", "o_totalprice")))

  // The SQL surface of both k-group tests (Q3 discipline: params
  // distinct from the DataFrame twins so each key earns its own
  // oracle).
  private val q113 = Q(
    "q113_sql_kw",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("SELECT * FROM graft_kw('orders', 'o_orderstatus', 'o_totalprice')")
    },
    Some(kwOracle("orders", "o_orderstatus", "o_totalprice")))

  private val q114 = Q(
    "q114_sql_anova",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("SELECT * FROM graft_anova('lineitem', 'l_linestatus', 'l_discount')")
    },
    Some(anovaOracle("lineitem", "l_linestatus", "l_discount")))

  // Brown–Forsythe variance homogeneity (R58, Stats.brownForsythe):
  // do the event types' value SPREADS differ? Oracle composes the
  // winsorize quantile_cont median replay with the ANOVA ladder.
  private val q116 = Q(
    "q116_brown_forsythe",
    (s, d) =>
      graft.operators.Stats
        .brownForsythe(t(s, d, "events"), "event_type", "value"),
    Some(anovaOracle(
      """(SELECT r.g AS grp, abs(round(r.v, 6) - m.med) AS adev
      FROM (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL) r
      JOIN (SELECT event_type AS g,
          round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY 1) m ON r.g = m.g) bfd""", "grp", "adev")))

  // Link prediction (R57, Graph.linkPredict) over the q63 part
  // co-occurrence graph: top-50 non-adjacent pairs by Adamic-Adar.
  // The oracle replays wedge generation, the hub cap, the
  // round-the-ln-first AA ladder, and the exact-decimal ranking cut.
  private val q115 = Q(
    "q115_linkpred",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(9)) === 0)
        .select(col("l_orderkey").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.linkPredict(edges, topN = 50,
          minCommonNeighbors = 2)
        .orderBy(col("node_u"), col("node_v"))
    },
    Some("""WITH li AS (
        SELECT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
        FROM lineitem WHERE l_orderkey % 9 = 0),
      e0 AS (SELECT DISTINCT x.pk AS u, y.pk AS v
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      deg AS (SELECT x AS node_id, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0) t
        GROUP BY 1),
      adjc AS (SELECT a.w, a.x, deg.deg AS dw FROM (
          SELECT u AS w, v AS x FROM e0
          UNION ALL SELECT v AS w, u AS x FROM e0) a
        JOIN deg ON deg.node_id = a.w WHERE deg.deg <= 10000),
      wg AS (SELECT a1.w, a1.dw, a1.x AS a, a2.x AS b
        FROM adjc a1 JOIN adjc a2 ON a1.w = a2.w AND a1.x < a2.x),
      na AS (SELECT * FROM wg WHERE NOT EXISTS (
        SELECT 1 FROM e0 WHERE e0.u = wg.a AND e0.v = wg.b)),
      sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
          CAST(sum(CAST(round(1.0 / round(ln(CAST(dw AS DOUBLE)), 12), 12)
            AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS aa
        FROM na GROUP BY 1, 2 HAVING count(*) >= 2),
      fin AS (SELECT sc.a AS node_u, sc.b AS node_v, common_neighbors,
          round(CAST(common_neighbors AS DOUBLE)
            / (da.deg + db.deg - common_neighbors), 6) AS jaccard,
          round(CAST(aa AS DOUBLE), 6) AS adamic_adar,
          CAST(da.deg * db.deg AS BIGINT) AS pref_attach, aa
        FROM sc JOIN deg da ON da.node_id = sc.a
          JOIN deg db ON db.node_id = sc.b),
      cut AS (SELECT * FROM fin
        ORDER BY aa DESC, node_u, node_v LIMIT 50)
      SELECT node_u, node_v, common_neighbors, jaccard, adamic_adar,
        pref_attach
      FROM cut ORDER BY node_u, node_v"""))

  // Per-key ROC-AUC (Stats.rocAuc) of a synthetic "classifier": score
  // = value, positive label = user_id % 3 == 0, keyed by event_type.
  // The oracle replays the tie-aware doubled concordance count as a
  // HUGEINT and the one agreed IEEE division.
  private val q117 = Q(
    "q117_auc",
    (s, d) =>
      graft.operators.Stats.rocAuc(
        t(s, d, "events")
          .withColumn("label",
            when(pmod(col("user_id"), lit(3)) === 0, 1).otherwise(0)),
        "event_type", "label", "value")
        .orderBy("event_type"),
    Some("""WITH e AS (SELECT event_type AS k,
          CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS lab,
          CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL),
      h AS (SELECT k, v,
          sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS np,
          sum(CASE WHEN lab = 0 THEN 1 ELSE 0 END) AS nn
        FROM e GROUP BY 1, 2),
      c AS (SELECT k, np, nn,
          sum(nn) OVER (PARTITION BY k ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nn
            AS below
        FROM h),
      a AS (SELECT k, CAST(sum(np) AS BIGINT) AS n_pos,
          CAST(sum(nn) AS BIGINT) AS n_neg,
          sum(CAST(np AS HUGEINT) * (2 * CAST(below AS HUGEINT) + nn))
            AS num2
        FROM c GROUP BY 1)
      SELECT k AS event_type, n_pos, n_neg,
        CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          round(CAST(num2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
        END AS auc,
        CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          round(CAST(num2 AS DOUBLE) / (1.0 * n_pos * n_neg) - 1.0, 6)
        END AS gini
      FROM a ORDER BY event_type"""))

  // Wilcoxon signed-rank (Stats.wilcoxonSignedRank) on the paired
  // difference l_quantity − 250·l_discount — sign-mixed, heavily tied
  // (integer quantities × 2dp discounts), so the midrank + tie-term
  // machinery is fully exercised. The oracle replays the doubled
  // midranks over distinct |d| as HUGEINTs.
  private val q118 = Q(
    "q118_wilcoxon",
    (s, d) =>
      graft.operators.Stats.wilcoxonSignedRank(
        t(s, d, "lineitem")
          .withColumn("y", lit(250.0) * col("l_discount").cast("double")),
        "l_quantity", "y"),
    Some("""WITH p AS (SELECT CAST(l_quantity AS DOUBLE) -
          250.0 * CAST(l_discount AS DOUBLE) AS d FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      h AS (SELECT abs(d) AS v, CAST(count(*) AS BIGINT) AS n,
          sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS np
        FROM p WHERE d <> 0.0 GROUP BY 1),
      c AS (SELECT v, n, np,
          sum(n) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
            AS below
        FROM h),
      a AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_pairs,
          coalesce(sum(CAST(np AS HUGEINT) * (2 * below + n + 1)), 0)
            AS w2,
          coalesce(sum(CAST(n AS HUGEINT) * n * n - n), 0) AS ties
        FROM c),
      z AS (SELECT n_pairs,
          (SELECT CAST(count(*) AS BIGINT) FROM p WHERE d = 0.0)
            AS n_zero,
          CASE WHEN n_pairs > 0 THEN CAST(w2 AS DOUBLE) / 2.0 END
            AS w_plus,
          CAST(n_pairs AS DOUBLE) * (n_pairs + 1) * (2 * n_pairs + 1)
            / 24.0 - CAST(ties AS DOUBLE) / 48.0 AS varw,
          w2 FROM a)
      SELECT n_pairs, n_zero, w_plus,
        CASE WHEN n_pairs > 0 AND varw > 0 THEN
          round(CAST(2 * w2 - CAST(n_pairs AS HUGEINT) * (n_pairs + 1)
            AS DOUBLE) / (4.0 * sqrt(varw)), 4)
        END AS z_stat,
        CASE WHEN n_pairs > 0 AND varw > 0 THEN
          abs(round(CAST(2 * w2 - CAST(n_pairs AS HUGEINT) *
            (n_pairs + 1) AS DOUBLE) / (4.0 * sqrt(varw)), 4)) > 1.96
        END AS reject_05
      FROM z"""))

  // McNemar paired-binary test (R61, Stats.mcnemar): two rule-based
  // "classifiers" judging the same lineitem rows — x = deep-discount
  // rule, y = high-tax rule. Counts are exact longs; the
  // continuity-corrected chi2 is one IEEE expression both engines
  // replay on those integers.
  private val q119 = Q(
    "q119_mcnemar",
    (s, d) =>
      graft.operators.Stats.mcnemar(
        t(s, d, "lineitem")
          .withColumn("x",
            (col("l_discount").cast("double") > 0.05).cast("int"))
          .withColumn("y",
            (col("l_tax").cast("double") > 0.04).cast("int")),
        "x", "y"),
    Some("""WITH p AS (SELECT
          CASE WHEN CAST(l_discount AS DOUBLE) > 0.05 THEN 1 ELSE 0 END
            AS x,
          CASE WHEN CAST(l_tax AS DOUBLE) > 0.04 THEN 1 ELSE 0 END AS y
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(coalesce(sum(CASE WHEN x > 0 AND y <= 0 THEN 1 ELSE 0 END),
            0) AS BIGINT) AS n_xy,
          CAST(coalesce(sum(CASE WHEN x <= 0 AND y > 0 THEN 1 ELSE 0 END),
            0) AS BIGINT) AS n_yx
        FROM p)
      SELECT n_pairs, n_xy, n_yx,
        CASE WHEN n_xy + n_yx > 0 THEN
          round((abs(CAST(n_xy AS DOUBLE) - n_yx) - 1.0)
            * (abs(CAST(n_xy AS DOUBLE) - n_yx) - 1.0)
            / (CAST(n_xy AS DOUBLE) + n_yx), 6) END AS chi2,
        CASE WHEN n_xy + n_yx > 0 THEN
          round((abs(CAST(n_xy AS DOUBLE) - n_yx) - 1.0)
            * (abs(CAST(n_xy AS DOUBLE) - n_yx) - 1.0)
            / (CAST(n_xy AS DOUBLE) + n_yx), 6) > 3.841459 END
          AS reject_05
      FROM a"""))

  // Cohen's kappa inter-annotator agreement (R62, Stats.cohensKappa):
  // two bucketed "raters" of the same lineitem rows — quantity band vs
  // price band, correlated so kappa lands strictly between 0 and 1.
  // The kappa ratio clears its denominators to exact HUGEINT integers.
  private val q120 = Q(
    "q120_kappa",
    (s, d) =>
      graft.operators.Stats.cohensKappa(
        t(s, d, "lineitem")
          .withColumn("ra",
            when(col("l_quantity") <= 17, "low")
              .when(col("l_quantity") <= 34, "mid").otherwise("high"))
          .withColumn("rb",
            when(col("l_extendedprice") <= 25000, "low")
              .when(col("l_extendedprice") <= 50000, "mid")
              .otherwise("high")),
        "ra", "rb"),
    Some("""WITH p AS (SELECT
          CASE WHEN l_quantity <= 17 THEN 'low'
            WHEN l_quantity <= 34 THEN 'mid' ELSE 'high' END AS a,
          CASE WHEN l_extendedprice <= 25000 THEN 'low'
            WHEN l_extendedprice <= 50000 THEN 'mid' ELSE 'high' END AS b
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      c AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS n FROM p
        GROUP BY 1, 2),
      ma AS (SELECT a, sum(n) AS ra FROM c GROUP BY 1),
      mb AS (SELECT b, sum(n) AS rb FROM c GROUP BY 1),
      pe AS (SELECT coalesce(sum(ra * rb), 0) AS pe2
        FROM ma JOIN mb ON ma.a = mb.b),
      t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_pairs,
          CAST(coalesce(sum(CASE WHEN a = b THEN n ELSE 0 END), 0)
            AS BIGINT) AS n_agree
        FROM c)
      SELECT n_pairs, n_agree,
        CASE WHEN n_pairs > 0 THEN
          round(CAST(n_agree AS DOUBLE) / n_pairs, 6) END AS po,
        CASE WHEN n_pairs > 0 THEN
          round(CAST(pe2 AS DOUBLE)
            / (CAST(n_pairs AS DOUBLE) * n_pairs), 6) END AS pe,
        CASE WHEN n_pairs > 0
            AND CAST(n_pairs AS HUGEINT) * n_pairs - pe2 <> 0 THEN
          round(CAST(CAST(n_pairs AS HUGEINT) * n_agree - pe2 AS DOUBLE)
            / CAST(CAST(n_pairs AS HUGEINT) * n_pairs - pe2 AS DOUBLE),
            6) END AS kappa
      FROM t CROSS JOIN pe"""))

  // Per-key classifier calibration (P30, Stats.calibration): treat
  // 10·l_discount as a [0,1] "score" predicting the high-tax label —
  // deliberately miscalibrated, so brier/ece are non-trivial. Brier's
  // squared errors are exact DECIMAL(38,12); ece clears its inner
  // division to an exact DECIMAL(38,6) numerator.
  private def calibBase = """SELECT l_returnflag AS k,
          CAST(l_discount AS DOUBLE) * 10.0 AS s,
          CASE WHEN CAST(l_tax AS DOUBLE) > 0.04 THEN 1 ELSE 0 END AS y
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
          AND l_returnflag IS NOT NULL"""

  // DuckDB has no width_bucket — replay Spark's formula (the q22
  // oracle idiom): floor(n·(v−min)/(max−min))+1, <min → 0, ≥max → n+1
  private def calibBins = s"""b AS (SELECT k,
          least(greatest(CASE WHEN s < 0.0 THEN 0
            WHEN s >= 1.0 THEN 11
            ELSE CAST(floor(10.0 * s / 1.0) AS BIGINT) + 1 END,
            1), 10) AS bin,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(y) AS BIGINT) AS n_pos,
          CAST(sum(CAST(round(s, 6) AS DECIMAL(18,6))) AS DECIMAL(38,6))
            AS ss
        FROM p GROUP BY 1, 2),
      bb AS (SELECT k, bin, n, n_pos,
          round(CAST(ss AS DOUBLE) / n, 6) AS mean_score,
          round(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos
        FROM b)"""

  private val q121 = Q(
    "q121_calibration",
    (s, d) =>
      graft.operators.Stats.calibration(
        t(s, d, "lineitem")
          .filter(col("l_returnflag").isNotNull)
          .withColumn("s", col("l_discount").cast("double") * 10.0)
          .withColumn("y",
            (col("l_tax").cast("double") > 0.04).cast("int")),
        "l_returnflag", "y", "s", nBins = 10)
        .withColumnRenamed("l_returnflag", "k")
        .orderBy(col("k")),
    Some(s"""WITH p AS ($calibBase),
      $calibBins,
      e AS (SELECT k,
          CAST(sum(CAST(n AS DECIMAL(18,0)) *
            abs(CAST(mean_score AS DECIMAL(18,6))
              - CAST(frac_pos AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS en
        FROM bb GROUP BY 1),
      g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(y) AS BIGINT) AS n_pos,
          CAST(sum(CAST(
            (CAST(round(s, 6) AS DECIMAL(18,6)) - y)
            * (CAST(round(s, 6) AS DECIMAL(18,6)) - y)
            AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS se
        FROM p GROUP BY 1)
      SELECT g.k, n, n_pos,
        round(CAST(se AS DOUBLE) / n, 6) AS brier,
        round(CAST(en AS DOUBLE) / n, 6) AS ece
      FROM g JOIN e ON g.k = e.k ORDER BY g.k"""))

  private val q122 = Q(
    "q122_calib_bins",
    (s, d) =>
      graft.operators.Stats.reliabilityBins(
        t(s, d, "lineitem")
          .filter(col("l_returnflag").isNotNull)
          .withColumn("s", col("l_discount").cast("double") * 10.0)
          .withColumn("y",
            (col("l_tax").cast("double") > 0.04).cast("int")),
        "l_returnflag", "y", "s", nBins = 10)
        .withColumnRenamed("l_returnflag", "k")
        .orderBy(col("k"), col("bin")),
    Some(s"""WITH p AS ($calibBase),
      $calibBins
      SELECT k, bin, n, n_pos, mean_score, frac_pos,
        round(abs(mean_score - frac_pos), 6) AS gap
      FROM bb ORDER BY k, bin"""))

  // Benjamini–Hochberg FDR (R63, Stats.bhFdr) composed with the
  // family it exists to correct: per-user Mann-Kendall z's (a wider
  // user slice than q96 so the keys aren't param twins) turn into
  // two-sided normal p's via the round-exp-first A&S ladder, then the
  // step-up adjustment runs across hypotheses. The oracle replays the
  // MK pair join, the p ladder, and both BH windows.
  private val q123 = Q(
    "q123_bh_fdr",
    (s, d) => {
      val mk = graft.operators.Stats.mannKendall(
        t(s, d, "events").filter(col("user_id") % 7 === 0),
        "user_id", "ts", "value", "event_id")
      val withP = mk.select(col("user_id"),
        graft.operators.Stats.twoSidedNormalP(col("z")).as("p"))
      graft.operators.Stats.bhFdr(withP, "user_id", "p", alpha = 0.05)
        .orderBy(col("user_id"))
    },
    Some("""WITH obs AS (
        SELECT user_id AS k, ts AS t, event_id AS i, value AS v
        FROM events
        WHERE user_id % 7 = 0 AND value IS NOT NULL AND ts IS NOT NULL),
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
      zz AS (SELECT k,
          CASE WHEN n >= 2 AND var_num > 0 THEN
            round((CASE WHEN s > 0 THEN s - 1
                WHEN s < 0 THEN s + 1 ELSE 0 END)
              / sqrt(CAST(var_num AS DOUBLE) / 18.0), 6) END AS z
        FROM j),
      tt AS (SELECT k, abs(z) AS az,
          1.0 / (1.0 + 0.2316419 * abs(z)) AS t
        FROM zz WHERE z IS NOT NULL),
      pp AS (SELECT k,
          round((2.0 * (round(exp(-0.5 * az * az), 12)
              / 2.5066282746310002))
            * (t * (0.319381530 + t * (-0.356563782
              + t * (1.781477937 + t * (-1.821255978
                + t * 1.330274429))))), 6) AS p
        FROM tt),
      mm AS (SELECT count(*) AS m FROM pp),
      rk AS (SELECT k, p,
          CAST(row_number() OVER (ORDER BY p, k) AS BIGINT) AS rank
        FROM pp),
      ad AS (SELECT k, p, rank,
          round(least(min((CAST(m AS DOUBLE) * p) / rank)
            OVER (ORDER BY p DESC, k DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            1.0), 6) AS adj_p
        FROM rk CROSS JOIN mm)
      SELECT k AS user_id, p AS p_value, rank, adj_p,
        adj_p <= 0.05 AS reject
      FROM ad ORDER BY user_id"""))

  // Lorenz/Gini concentration (R64, Stats.giniConcentration): how
  // concentrated document volume (n_chars) is across each source —
  // the corpus-inequality readout. Both sums are exact HUGEINTs over
  // the per-key value histogram; G is one IEEE ladder both engines
  // replay.
  private val q124 = Q(
    "q124_gini",
    (s, d) =>
      graft.operators.Stats.giniConcentration(
        t(s, d, "documents"), "source", "n_chars")
        .orderBy(col("source")),
    Some("""WITH r AS (SELECT source AS k,
          CAST(CAST(round(CAST(n_chars AS DOUBLE), 6) AS DECIMAL(18,6))
            * 1000000 AS HUGEINT) AS x
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      h AS (SELECT k, x, CAST(count(*) AS HUGEINT) AS t
        FROM r GROUP BY 1, 2),
      c AS (SELECT k, x, t,
          coalesce(sum(t) OVER (PARTITION BY k ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS bef
        FROM h),
      a AS (SELECT k, CAST(sum(t) AS BIGINT) AS n,
          sum(x * (2 * t * bef + t * (t + 1))) AS s12,
          sum(x * t) AS s,
          sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS nneg
        FROM c GROUP BY 1)
      SELECT k AS source, n,
        round(CAST(s AS DOUBLE) / 1000000.0, 6) AS total,
        CASE WHEN nneg = 0 AND CAST(s AS DOUBLE) > 0 THEN
          round(CAST(s12 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
            - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) END
          AS gini
      FROM a ORDER BY source"""))

  // Friedman repeated-measures rank test (R65, Stats.friedman):
  // blocks = users, treatments = event types, observation = the
  // user's exact-decimal value total per type; users missing a type
  // drop. Doubled midranks and rank sums are exact integers; the
  // tie-corrected chi2 ladder is replayed with the ordered fold.
  private val q125 = Q(
    "q125_friedman",
    (s, d) => {
      val obs = t(s, d, "events")
        .filter(col("user_id") % 11 === 0 && col("value").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("v"))
      graft.operators.Stats.friedman(obs, "user_id", "event_type", "v")
    },
    Some("""WITH raw AS (SELECT user_id AS b, event_type AS g,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events
        WHERE user_id % 11 = 0 AND value IS NOT NULL
          AND user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      kk AS (SELECT count(DISTINCT g) AS k FROM raw),
      pb AS (SELECT b, count(*) AS nb, count(DISTINCT g) AS db
        FROM raw GROUP BY 1),
      vb AS (SELECT b FROM pb CROSS JOIN kk
        WHERE nb = kk.k AND db = kk.k),
      dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        FROM pb CROSS JOIN kk WHERE NOT (nb = kk.k AND db = kk.k)),
      vv AS (SELECT * FROM raw WHERE b IN (SELECT b FROM vb)),
      gh AS (SELECT b, v, CAST(count(*) AS HUGEINT) AS t
        FROM vv GROUP BY 1, 2),
      rk AS (SELECT b, v, t,
          coalesce(sum(t) OVER (PARTITION BY b ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS bef
        FROM gh),
      rr AS (SELECT vv.g, (2 * rk.bef + rk.t + 1) AS r2
        FROM vv JOIN rk ON vv.b = rk.b AND vv.v = rk.v),
      pg AS (SELECT g, sum(CAST(r2 AS HUGEINT)) AS r2s
        FROM rr GROUP BY 1),
      sr AS (SELECT coalesce(list_reduce(
          list(CAST(r2s AS DOUBLE) * CAST(r2s AS DOUBLE) / 4.0
            ORDER BY g), (a, b) -> a + b), 0.0) AS srr
        FROM pg),
      nb2 AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM vb),
      ti AS (SELECT coalesce(sum(t*t*t - t), 0) AS tie3 FROM gh)
      SELECT n_blocks, n_dropped, CAST(kk.k AS BIGINT) AS k_treatments,
        CASE WHEN kk.k >= 2 AND n_blocks > 0
            AND (1.0 - CAST(tie3 AS DOUBLE)
              / (CAST(n_blocks AS DOUBLE)
                * (CAST(kk.k AS DOUBLE) * kk.k * kk.k - kk.k))) > 0
          THEN round(
            (12.0 * srr / (CAST(n_blocks AS DOUBLE)
                * CAST(kk.k AS DOUBLE) * (CAST(kk.k AS DOUBLE) + 1.0))
              - 3.0 * CAST(n_blocks AS DOUBLE)
                * (CAST(kk.k AS DOUBLE) + 1.0))
            / (1.0 - CAST(tie3 AS DOUBLE)
              / (CAST(n_blocks AS DOUBLE)
                * (CAST(kk.k AS DOUBLE) * kk.k * kk.k - kk.k))), 6)
          END AS chi2,
        CASE WHEN kk.k >= 1 THEN CAST(kk.k - 1 AS BIGINT) END AS dof
      FROM nb2 CROSS JOIN dr CROSS JOIN kk CROSS JOIN sr
        CROSS JOIN ti"""))

  // Holt linear-trend smoothing (R66, TimeJoins.holtSmooth): per-user
  // level+trend over the event value series with a 3-step forecast.
  // The recurrence is an ordered left fold — DuckDB replays the
  // identical IEEE sequence via list_reduce with a prepended init
  // struct (the bpeTrain fold discipline); alpha/beta chosen with
  // exact complements (0.25/0.75, 0.125/0.875).
  private val q126 = Q(
    "q126_holt",
    (s, d) =>
      graft.operators.TimeJoins.holtSmooth(
        t(s, d, "events").filter(col("user_id") % 13 === 0),
        "user_id", "ts", "value", "event_id",
        alpha = 0.25, beta = 0.125, horizon = 3)
        .orderBy(col("user_id")),
    Some("""WITH obs AS (SELECT user_id AS k, ts AS t, event_id AS i,
          CAST(value AS DOUBLE) AS v
        FROM events
        WHERE user_id % 13 = 0 AND value IS NOT NULL
          AND ts IS NOT NULL),
      g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
          list(v ORDER BY t, i) AS vs
        FROM obs GROUP BY 1),
      f AS (SELECT k, n, vs,
          -- state rides as [l, b]: DuckDB 1.0 list_reduce mutates a
          -- STRUCT accumulator field-by-field (the second field sees
          -- the first field's new value); a LIST accumulator folds
          -- cleanly
          CASE WHEN len(vs) >= 2 THEN list_reduce(
            list_prepend([vs[1], vs[2] - vs[1]],
              list_transform(vs[2:], x -> [x, 0.0e0])),
            (acc, x) -> [
              0.25e0 * x[1] + 0.75e0 * (acc[1] + acc[2]),
              0.125e0 * ((0.25e0 * x[1] + 0.75e0 * (acc[1] + acc[2]))
                - acc[1]) + 0.875e0 * acc[2]])
          END AS st
        FROM g)
      SELECT k AS user_id, n,
        CASE WHEN n = 1 THEN round(vs[1], 6)
          ELSE round(st[1], 6) END AS level,
        round(st[2], 6) AS trend,
        round(st[1] + 3.0e0 * st[2], 6) AS forecast
      FROM f ORDER BY user_id"""))

  // Cochran's Q (R67, Stats.cochranQ): per-user binary outcome "had a
  // high-value event of this type" across all five types. Q clears
  // every fraction to exact HUGEINT integers — one division, 6dp.
  private val q127 = Q(
    "q127_cochran",
    (s, d) => {
      val obs = t(s, d, "events")
        .filter(col("user_id") % 11 === 0 && col("value").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(when(max(col("value")) > 30, 1L).otherwise(0L).as("x"))
      graft.operators.Stats.cochranQ(obs, "user_id", "event_type", "x")
    },
    Some("""WITH raw AS (SELECT user_id AS b, event_type AS g,
          CASE WHEN max(value) > 30 THEN 1 ELSE 0 END AS x
        FROM events
        WHERE user_id % 11 = 0 AND value IS NOT NULL
          AND user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      kk AS (SELECT count(DISTINCT g) AS k FROM raw),
      pb AS (SELECT b, count(*) AS nb, count(DISTINCT g) AS db,
          sum(x) AS r
        FROM raw GROUP BY 1),
      vb AS (SELECT b, r FROM pb CROSS JOIN kk
        WHERE nb = kk.k AND db = kk.k),
      dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        FROM pb CROSS JOIN kk WHERE NOT (nb = kk.k AND db = kk.k)),
      ba AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
          coalesce(sum(r), 0) AS n,
          coalesce(sum(CAST(r AS HUGEINT) * r), 0) AS rr
        FROM vb),
      ga AS (SELECT coalesce(sum(CAST(c AS HUGEINT) * c), 0) AS cc
        FROM (SELECT g, sum(x) AS c FROM raw
          WHERE b IN (SELECT b FROM vb) GROUP BY 1))
      SELECT n_blocks, n_dropped, CAST(kk.k AS BIGINT) AS k_treatments,
        CASE WHEN kk.k >= 2 AND n_blocks > 0
            AND CAST(kk.k AS HUGEINT) * n - rr <> 0 THEN
          round(CAST((CAST(kk.k AS HUGEINT) - 1)
              * (CAST(kk.k AS HUGEINT) * cc
                - CAST(n AS HUGEINT) * n) AS DOUBLE)
            / CAST(CAST(kk.k AS HUGEINT) * n - rr AS DOUBLE), 6) END
          AS q_stat,
        CASE WHEN kk.k >= 1 THEN CAST(kk.k - 1 AS BIGINT) END AS dof
      FROM ba CROSS JOIN dr CROSS JOIN kk CROSS JOIN ga"""))

  // Cramér's V (R68, Stats.cramersV): effect-size summary of the
  // returnflag × ship-month contingency — chi2/dof replayed exactly as
  // in q72's ladder, V one sqrt expression on the agreed operands.
  private val q128 = Q(
    "q128_cramer",
    (s, d) =>
      graft.operators.Stats
        .cramersV(t(s, d, "lineitem")
          .withColumn("ship_month", month(col("l_shipdate"))),
          "l_returnflag", "ship_month"),
    Some("""WITH cells AS (
        SELECT l_returnflag AS a, month(l_shipdate) AS b,
          count(*) AS observed
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_shipdate IS NOT NULL
        GROUP BY 1, 2),
      rt AS (SELECT a, CAST(sum(observed) AS BIGINT) AS row_tot
        FROM cells GROUP BY 1),
      ct AS (SELECT b, CAST(sum(observed) AS BIGINT) AS col_tot
        FROM cells GROUP BY 1),
      g AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total,
          count(DISTINCT a) AS na, count(DISTINCT b) AS nb
        FROM cells),
      e AS (SELECT rt.a, ct.b, coalesce(c.observed, 0) AS observed,
          round(CAST(rt.row_tot AS DOUBLE) * ct.col_tot / g.n_total, 6)
            AS expected
        FROM rt CROSS JOIN ct
        LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b, g),
      tt AS (SELECT CAST(round(CAST(CAST((observed - expected) * (observed - expected)
            / expected AS VARCHAR) AS DECIMAL(38,20)), 12) AS DOUBLE)
          AS term FROM e),
      st AS (SELECT round(CAST(sum(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,12)))
          AS DOUBLE), 6) AS chi2 FROM tt)
      SELECT g.n_total, CAST(g.na AS BIGINT) AS n_a,
        CAST(g.nb AS BIGINT) AS n_b, st.chi2,
        CAST((g.na - 1) * (g.nb - 1) AS BIGINT) AS dof,
        CASE WHEN g.n_total > 0 AND least(g.na, g.nb) >= 2 THEN
          round(sqrt(st.chi2 / (CAST(g.n_total AS DOUBLE)
            * (least(g.na, g.nb) - 1))), 6) END AS cramers_v
      FROM g CROSS JOIN st"""))

  // Cronbach's alpha (R69, Stats.cronbachAlpha): are the five
  // per-user event-type value totals measuring one "activity"
  // construct? Exact 1e6-scale integer moments, ordered item folds,
  // one IEEE ladder — all replayed.
  private val q129 = Q(
    "q129_cronbach",
    (s, d) => {
      val obs = t(s, d, "events")
        .filter(col("user_id") % 11 === 0 && col("value").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("v"))
      graft.operators.Stats
        .cronbachAlpha(obs, "user_id", "event_type", "v")
    },
    Some("""WITH raw AS (SELECT user_id AS b, event_type AS g,
          CAST(CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)))
            AS DOUBLE), 6) AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS x
        FROM events
        WHERE user_id % 11 = 0 AND value IS NOT NULL
          AND user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      kk AS (SELECT count(DISTINCT g) AS k FROM raw),
      pb AS (SELECT b, count(*) AS nb, count(DISTINCT g) AS db,
          sum(x) AS t
        FROM raw GROUP BY 1),
      vb AS (SELECT b, t FROM pb CROSS JOIN kk
        WHERE nb = kk.k AND db = kk.k),
      dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        FROM pb CROSS JOIN kk WHERE NOT (nb = kk.k AND db = kk.k)),
      nb2 AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
          coalesce(sum(t), 0) AS ts,
          coalesce(sum(t * t), 0) AS tq
        FROM vb),
      it AS (SELECT g, sum(x) AS s, sum(x * x) AS q FROM raw
        WHERE b IN (SELECT b FROM vb) GROUP BY 1),
      isum AS (SELECT
          coalesce(list_reduce(list(CAST(q AS DOUBLE) * 1.0e-12
            ORDER BY g), (a, b) -> a + b), 0.0e0) AS sumq,
          coalesce(list_reduce(list((CAST(s AS DOUBLE) * 1.0e-6)
              * (CAST(s AS DOUBLE) * 1.0e-6) ORDER BY g),
            (a, b) -> a + b), 0.0e0) AS sumss
        FROM it)
      SELECT n_blocks, n_dropped, CAST(kk.k AS BIGINT) AS k_items,
        CASE WHEN kk.k >= 2 AND n_blocks >= 2
            AND (CAST(n_blocks AS DOUBLE)
                * (CAST(tq AS DOUBLE) * 1.0e-12)
              - (CAST(ts AS DOUBLE) * 1.0e-6)
                * (CAST(ts AS DOUBLE) * 1.0e-6))
              / (CAST(n_blocks AS DOUBLE)
                * (CAST(n_blocks AS DOUBLE) - 1.0)) > 0 THEN
          round(CAST(kk.k AS DOUBLE) / (CAST(kk.k AS DOUBLE) - 1.0)
            * (1.0 - ((CAST(n_blocks AS DOUBLE) * sumq - sumss)
                / (CAST(n_blocks AS DOUBLE)
                  * (CAST(n_blocks AS DOUBLE) - 1.0)))
              / ((CAST(n_blocks AS DOUBLE)
                  * (CAST(tq AS DOUBLE) * 1.0e-12)
                - (CAST(ts AS DOUBLE) * 1.0e-6)
                  * (CAST(ts AS DOUBLE) * 1.0e-6))
                / (CAST(n_blocks AS DOUBLE)
                  * (CAST(n_blocks AS DOUBLE) - 1.0)))), 6) END
          AS alpha
      FROM nb2 CROSS JOIN dr CROSS JOIN kk CROSS JOIN isum"""))

  // Partial correlation (R70, Stats.partialCorr): does quantity still
  // track the extended price once the discount is controlled? The
  // three r's replay q91's exact-moment ladder; the partial is one
  // IEEE expression on the rounded r's.
  private val q130 = Q(
    "q130_partial_corr",
    (s, d) =>
      graft.operators.Stats.partialCorr(t(s, d, "lineitem"),
        "l_quantity", "l_extendedprice", "l_discount"),
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val sums = cols.map(c =>
        s"""CAST(sum(CAST(CAST(round(CAST($c AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12))
            AS s_$c,
          CAST(sum(CAST(CAST(round(CAST($c AS DOUBLE), 6)
            AS DECIMAL(20,6)) * CAST(round(CAST($c AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12))
            AS ss_$c""").mkString(",\n          ")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val prods = pairs.map { case (a, b) =>
        s"""CAST(sum(CAST(CAST(round(CAST($a AS DOUBLE), 6)
            AS DECIMAL(20,6)) * CAST(round(CAST($b AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12))
            AS sp_${a}_$b""" }.mkString(",\n          ")
      def corrExpr(a: String, b: String) =
        s"""CASE WHEN n >= 2
            AND CAST(ss_$a AS DOUBLE) * n
              - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE) > 0
            AND CAST(ss_$b AS DOUBLE) * n
              - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE) > 0
          THEN round((CAST(sp_${a}_$b AS DOUBLE) * n
              - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
            / sqrt((CAST(ss_$a AS DOUBLE) * n
                - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
              * (CAST(ss_$b AS DOUBLE) * n
                - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)
          END"""
      s"""WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
          $sums,
          $prods
        FROM lineitem
        WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
      r AS (SELECT CAST(n AS BIGINT) AS n,
          ${corrExpr(cols(0), cols(1))} AS r_xy,
          ${corrExpr(cols(0), cols(2))} AS r_xz,
          ${corrExpr(cols(1), cols(2))} AS r_yz
        FROM m)
      SELECT n, r_xy, r_xz, r_yz,
        CASE WHEN r_xy IS NOT NULL AND r_xz IS NOT NULL
            AND r_yz IS NOT NULL
            AND (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) > 0 THEN
          round((r_xy - r_xz * r_yz)
            / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6) END
          AS r_partial
      FROM r"""
    })

  // SQL-twin keys for the r10 agreement/inequality TVFs (params
  // distinct from their DataFrame twins, the q113 discipline): the
  // whole operator runs through spark.sql and still earns a FULL
  // oracle.
  private val q131 = Q(
    "q131_sql_kappa",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW kap_v AS
        SELECT CASE WHEN l_quantity <= 10 THEN 'low'
            WHEN l_quantity <= 30 THEN 'mid' ELSE 'high' END AS ra,
          CASE WHEN l_extendedprice <= 20000 THEN 'low'
            WHEN l_extendedprice <= 40000 THEN 'mid'
            ELSE 'high' END AS rb
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL""")
      s.sql("SELECT * FROM graft_kappa('kap_v', 'ra', 'rb')")
    },
    Some("""WITH p AS (SELECT
          CASE WHEN l_quantity <= 10 THEN 'low'
            WHEN l_quantity <= 30 THEN 'mid' ELSE 'high' END AS a,
          CASE WHEN l_extendedprice <= 20000 THEN 'low'
            WHEN l_extendedprice <= 40000 THEN 'mid'
            ELSE 'high' END AS b
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      c AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS n FROM p
        GROUP BY 1, 2),
      ma AS (SELECT a, sum(n) AS ra FROM c GROUP BY 1),
      mb AS (SELECT b, sum(n) AS rb FROM c GROUP BY 1),
      pe AS (SELECT coalesce(sum(ra * rb), 0) AS pe2
        FROM ma JOIN mb ON ma.a = mb.b),
      t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_pairs,
          CAST(coalesce(sum(CASE WHEN a = b THEN n ELSE 0 END), 0)
            AS BIGINT) AS n_agree
        FROM c)
      SELECT n_pairs, n_agree,
        CASE WHEN n_pairs > 0 THEN
          round(CAST(n_agree AS DOUBLE) / n_pairs, 6) END AS po,
        CASE WHEN n_pairs > 0 THEN
          round(CAST(pe2 AS DOUBLE)
            / (CAST(n_pairs AS DOUBLE) * n_pairs), 6) END AS pe,
        CASE WHEN n_pairs > 0
            AND CAST(n_pairs AS HUGEINT) * n_pairs - pe2 <> 0 THEN
          round(CAST(CAST(n_pairs AS HUGEINT) * n_agree - pe2 AS DOUBLE)
            / CAST(CAST(n_pairs AS HUGEINT) * n_pairs - pe2 AS DOUBLE),
            6) END AS kappa
      FROM t CROSS JOIN pe"""))

  private val q132 = Q(
    "q132_sql_gini",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("SELECT * FROM graft_gini('lineitem', 'l_linestatus', 'l_quantity') ORDER BY l_linestatus")
    },
    Some("""WITH r AS (SELECT l_linestatus AS k,
          CAST(CAST(round(CAST(l_quantity AS DOUBLE), 6)
            AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS x
        FROM lineitem
        WHERE l_linestatus IS NOT NULL AND l_quantity IS NOT NULL),
      h AS (SELECT k, x, CAST(count(*) AS HUGEINT) AS t
        FROM r GROUP BY 1, 2),
      c AS (SELECT k, x, t,
          coalesce(sum(t) OVER (PARTITION BY k ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS bef
        FROM h),
      a AS (SELECT k, CAST(sum(t) AS BIGINT) AS n,
          sum(x * (2 * t * bef + t * (t + 1))) AS s12,
          sum(x * t) AS s,
          sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS nneg
        FROM c GROUP BY 1)
      SELECT k AS l_linestatus, n,
        round(CAST(s AS DOUBLE) / 1000000.0, 6) AS total,
        CASE WHEN nneg = 0 AND CAST(s AS DOUBLE) > 0 THEN
          round(CAST(s12 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
            - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) END
          AS gini
      FROM a ORDER BY l_linestatus"""))

  // Fleiss' kappa (R71, Stats.fleissKappa): each user's first five
  // events are a 5-member "panel" labeling the user with event types;
  // users with fewer than five events drop. Every fraction clears to
  // exact HUGEINT integers — one division, 6dp.
  private val q133 = Q(
    "q133_fleiss",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ratings = t(s, d, "events")
        .filter(col("user_id") % 5 === 0 && col("event_type").isNotNull
          && col("ts").isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
      graft.operators.Stats
        .fleissKappa(ratings, "user_id", "event_type", 5)
    },
    Some("""WITH r AS (SELECT user_id AS i, event_type AS c,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS rn
        FROM events
        WHERE user_id % 5 = 0 AND event_type IS NOT NULL
          AND ts IS NOT NULL AND user_id IS NOT NULL),
      rr AS (SELECT i, c FROM r WHERE rn <= 5),
      cells AS (SELECT i, c, CAST(count(*) AS HUGEINT) AS m
        FROM rr GROUP BY 1, 2),
      pi AS (SELECT i, sum(m) AS ni, sum(m * m) AS sq
        FROM cells GROUP BY 1),
      vi AS (SELECT i, sq FROM pi WHERE ni = 5),
      dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        FROM pi WHERE ni <> 5),
      ia AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
          coalesce(sum(sq), 0) AS a
        FROM vi),
      ca AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
          coalesce(sum(CAST(cj AS HUGEINT) * cj), 0) AS b
        FROM (SELECT c, sum(m) AS cj FROM cells
          WHERE i IN (SELECT i FROM vi) GROUP BY 1))
      SELECT n_items, n_dropped, CAST(5 AS BIGINT) AS n_raters,
        n_categories,
        CASE WHEN n_items > 0 THEN
          round(CAST(a - CAST(n_items AS HUGEINT) * 5 AS DOUBLE)
            / CAST(CAST(n_items AS HUGEINT) * 5 * 4 AS DOUBLE), 6) END
          AS p_bar,
        CASE WHEN n_items > 0 THEN
          round(CAST(b AS DOUBLE)
            / CAST(CAST(n_items AS HUGEINT) * 5
              * (CAST(n_items AS HUGEINT) * 5) AS DOUBLE), 6) END
          AS p_e,
        CASE WHEN n_items > 0
            AND (CAST(n_items AS HUGEINT) * 5
                * (CAST(n_items AS HUGEINT) * 5) - b)
              * (CAST(n_items AS HUGEINT) * 5) * 4 <> 0 THEN
          round(CAST((a - CAST(n_items AS HUGEINT) * 5)
              * (CAST(n_items AS HUGEINT) * 5)
              * (CAST(n_items AS HUGEINT) * 5)
            - b * (CAST(n_items AS HUGEINT) * 5) * 4 AS DOUBLE)
          / CAST((CAST(n_items AS HUGEINT) * 5
              * (CAST(n_items AS HUGEINT) * 5) - b)
            * (CAST(n_items AS HUGEINT) * 5) * 4 AS DOUBLE), 6) END
          AS kappa
      FROM ia CROSS JOIN dr CROSS JOIN ca"""))

  // Per-key Mann-Whitney U (R72, Stats.mannWhitneyByKey): the
  // slice-wise A/B fan-out bhFdr consumes — click vs view value
  // distributions per user cohort. Doubled rank sums and tie terms
  // are exact HUGEINTs per key; the z ladder replays the global
  // operator's exactly.
  private val q134 = Q(
    "q134_mwu_by_key",
    (s, d) =>
      graft.operators.Stats.mannWhitneyByKey(
        t(s, d, "events").withColumn("cohort", col("user_id") % 17),
        "cohort", "event_type", "click", "view", "value")
        .orderBy(col("cohort")),
    Some("""WITH r AS (SELECT user_id % 17 AS k, event_type AS g,
          CAST(value AS DOUBLE) AS v
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
          AND user_id IS NOT NULL),
      h AS (SELECT k, v,
          sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS na,
          sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS nb
        FROM r GROUP BY 1, 2),
      c AS (SELECT k, v, na, nb,
          coalesce(sum(na + nb) OVER (PARTITION BY k ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS bef
        FROM h),
      a AS (SELECT k, CAST(sum(na) AS BIGINT) AS n_a,
          CAST(sum(nb) AS BIGINT) AS n_b,
          coalesce(sum(CAST(na AS HUGEINT)
            * (2 * bef + (na + nb) + 1)), 0) AS r2a,
          coalesce(sum(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb)
            - (na + nb)), 0) AS ties
        FROM c GROUP BY 1),
      z AS (SELECT k, n_a, n_b, r2a, ties,
          r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
          CAST(n_a AS DOUBLE) * n_b / 12.0
            * (CAST(n_a + n_b + 1 AS DOUBLE)
              - CAST(ties AS DOUBLE)
                / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))
            AS varu
        FROM a)
      SELECT k AS cohort, n_a, n_b,
        CASE WHEN n_a > 0 AND n_b > 0 THEN
          CAST(u2 AS DOUBLE) / 2.0 END AS u_stat,
        CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 1 AND varu > 0
          THEN round(CAST(u2 - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
            / 2.0 / sqrt(varu), 4) END AS z_stat,
        CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 1 AND varu > 0
          THEN abs(round(CAST(u2 - CAST(n_a AS HUGEINT) * n_b
            AS DOUBLE) / 2.0 / sqrt(varu), 4)) > 1.96 END AS reject_05
      FROM z ORDER BY cohort"""))

  // The COMPLETE multiple-testing workflow in one oracled key (R72 →
  // R63): per-cohort MWU z's → the exp-first A&S normal-p bridge →
  // the BH step-up — the three composable operators a slice-wise A/B
  // analysis actually chains, end-to-end bit-equal to DuckDB.
  private val q135 = Q(
    "q135_mwu_fdr",
    (s, d) => {
      val mwu = graft.operators.Stats.mannWhitneyByKey(
        t(s, d, "events").withColumn("cohort", col("user_id") % 17),
        "cohort", "event_type", "click", "view", "value")
      val withP = mwu.select(col("cohort"),
        graft.operators.Stats.twoSidedNormalP(col("z_stat")).as("p"))
      graft.operators.Stats.bhFdr(withP, "cohort", "p", alpha = 0.05)
        .orderBy(col("cohort"))
    },
    Some("""WITH r AS (SELECT user_id % 17 AS k, event_type AS g,
          CAST(value AS DOUBLE) AS v
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
          AND user_id IS NOT NULL),
      h AS (SELECT k, v,
          sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS na,
          sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS nb
        FROM r GROUP BY 1, 2),
      c AS (SELECT k, v, na, nb,
          coalesce(sum(na + nb) OVER (PARTITION BY k ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS bef
        FROM h),
      a AS (SELECT k, CAST(sum(na) AS BIGINT) AS n_a,
          CAST(sum(nb) AS BIGINT) AS n_b,
          coalesce(sum(CAST(na AS HUGEINT)
            * (2 * bef + (na + nb) + 1)), 0) AS r2a,
          coalesce(sum(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb)
            - (na + nb)), 0) AS ties
        FROM c GROUP BY 1),
      z AS (SELECT k,
          CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 1
              AND CAST(n_a AS DOUBLE) * n_b / 12.0
                * (CAST(n_a + n_b + 1 AS DOUBLE)
                  - CAST(ties AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))
                > 0
            THEN round(CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
                - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
              / 2.0 / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                * (CAST(n_a + n_b + 1 AS DOUBLE)
                  - CAST(ties AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))),
              4) END AS zs
        FROM a),
      tt AS (SELECT k, abs(zs) AS az,
          1.0 / (1.0 + 0.2316419 * abs(zs)) AS t
        FROM z WHERE zs IS NOT NULL),
      pp AS (SELECT k,
          round((2.0 * (round(exp(-0.5 * az * az), 12)
              / 2.5066282746310002))
            * (t * (0.319381530 + t * (-0.356563782
              + t * (1.781477937 + t * (-1.821255978
                + t * 1.330274429))))), 6) AS p
        FROM tt),
      mm AS (SELECT count(*) AS m FROM pp),
      rk AS (SELECT k, p,
          CAST(row_number() OVER (ORDER BY p, k) AS BIGINT) AS rank
        FROM pp),
      ad AS (SELECT k, p, rank,
          round(least(min((CAST(m AS DOUBLE) * p) / rank)
            OVER (ORDER BY p DESC, k DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            1.0), 6) AS adj_p
        FROM rk CROSS JOIN mm)
      SELECT k AS cohort, p AS p_value, rank, adj_p,
        adj_p <= 0.05 AS reject
      FROM ad ORDER BY cohort"""))

  val all: Seq[Q] = Seq(q10b, q15b, q19c, q26, q30, q31, q25c, q32, q33, q34,
    q34b, q35, q35b, q36, q37, q38, q39, q40, q41, q42, q43, q44, q45,
    q46, q47, q48, q49, q50, q18b, q51, q52, q53, q54, q55, q56, q57,
    q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
    q71, q72, q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q83, q84, q85, q86, q87, q88, q89, q90, q91, q92,
    q93, q94, q95, q96, q97, q98, q99, q100, q101, q102, q103, q104,
    q105, q106, q107, q108, q111, q112, q113, q114, q115, q116, q117,
    q118, q119, q120, q121, q122, q123, q124, q125, q126, q127, q128, q129, q130, q131, q132, q133, q134, q135)
}
