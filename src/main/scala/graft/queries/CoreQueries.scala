package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational + expression coverage of the reference engine.
  *
  * Each query exercises reference capabilities from SURVEY.md §2
  * (IR nodes in omniscidb/IR/Node.h, ops in omniscidb/IR/OpTypeEnums.h,
  * exprs in omniscidb/IR/Expr.h, builder API in python/pyhdk/hdk.py)
  * re-expressed as declarative DataFrame plans that Catalyst optimizes
  * (filter/projection pushdown to parquet, broadcast joins for dims,
  * partial aggregation).
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *  - every oracle-checked query has a total ORDER BY;
  *  - money aggregates sum EXACT DECIMALS (then one deterministic
  *    cast/divide): double summation is partial-agg-order-dependent
  *    and rounding it leaves tie rows once accumulated ulp error
  *    reaches the rounding grain. Small-magnitude double aggs round
  *    at a grain that dominates their error bound;
  *  - scalar double ops (division etc.) are left UNROUNDED — identical
  *    IEEE operands give bit-identical results in every engine;
  *  - column names aliased identically on both sides.
  */
object CoreQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  private def ts(x: String): Column = lit(x).cast("timestamp")

  // ---------------------------------------------------------------- q01
  // Aggregate node (Node.h:373) + sum/avg/count (AggType kSum/kAvg/kCount)
  private val q01 = Q(
    "q01_agg",
    (s, d) => {
      val qdec = col("l_quantity").cast("decimal(12,2)")
      val pdec = col("l_extendedprice").cast("decimal(12,2)")
      val ddec = col("l_discount").cast("decimal(4,2)")
      val tdec = col("l_tax").cast("decimal(4,2)")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Exact decimal sums (then one deterministic cast/divide):
          // double summation is partial-agg-order-dependent, and ANY
          // fixed rounding of it has tie rows at large SF. Decimal
          // arithmetic is exact in both engines, so no rounding at all.
          sum(qdec).cast("double").as("sum_qty"),
          sum(pdec).cast("double").as("sum_base_price"),
          sum(pdec * (lit(1) - ddec)).cast("double").as("sum_disc_price"),
          sum(pdec * (lit(1) - ddec) * (lit(1) + tdec)).cast("double").as("sum_charge"),
          (sum(qdec).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(pdec).cast("double") / count(lit(1))).as("avg_price"),
          (sum(ddec).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  // Project (Node.h:291) + Filter (Node.h:634); predicates push to scan.
  private val q02 = Q(
    "q02_filter_proj",
    (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(5, 30) &&
          col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") > 0.02)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      round(l_extendedprice * (1 - l_discount), 4) AS net_price
      FROM lineitem
      WHERE l_quantity BETWEEN 5 AND 30
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount > 0.02
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q03
  // INNER Join (sqldefs.h:33) — dims broadcast, fact-fact shuffles on key.
  private val q03 = Q(
    "q03_join",
    (s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > ts("1996-06-30 00:00:00"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },
    Some("""SELECT l_orderkey, o_orderdate,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 20"""))

  // ---------------------------------------------------------------- q04
  // Sort + limit + offset (Node.h:693 Sort{limit,offset}) →
  // TakeOrderedAndProject physical op (no global sort materialized).
  private val q04 = Q(
    "q04_sort_limit",
    (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(5).limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10 OFFSET 5"""))

  // ---------------------------------------------------------------- q05
  // Multi-way join (TPC-H Q5 shape): 5 joins, all dims broadcast.
  private val q05 = Q(
    "q05_join_multi",
    (s, d) => {
      val region = t(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, d, "nation")
      val cust = t(s, d, "customer")
      val sup = t(s, d, "supplier")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val li = t(s, d, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  // ---------------------------------------------------------------- q06
  // CASE expr (Expr.h:840, hdk.py if_then_else:2924) inside aggregates,
  // logical and/or/not (OpType kAnd/kOr/kNot), HAVING.
  private val q06 = Q(
    "q06_cond_agg",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_totalprice") > 250000, 1).otherwise(0)).as("n_big"),
          // SURVEY §4 rule 6: sum money as DECIMAL (exact both engines),
          // cast to double once; rounding a double sum leaves tie rows.
          sum(when(col("o_orderstatus") === "F", col("o_totalprice").cast("decimal(12,2)"))
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double").as("sum_f"),
          (sum(when(!(col("o_orderstatus") === "O") || col("o_totalprice") > 100000,
            col("o_totalprice").cast("decimal(12,2)"))).cast("double") /
            count(when(!(col("o_orderstatus") === "O") || col("o_totalprice") > 100000,
              lit(1)))).as("avg_sel"))
        .filter(col("n_orders") > 10)
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      count(*) AS n_orders,
      -- CAST: DuckDB sum(int) is HUGEINT; Spark's is BIGINT — the
      -- driver comparator hashes the pandas dtypes differently
      CAST(sum(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2))
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS sum_f,
      CAST(sum(CASE WHEN NOT (o_orderstatus = 'O') OR o_totalprice > 100000
               THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
        / count(CASE WHEN NOT (o_orderstatus = 'O') OR o_totalprice > 100000
                THEN 1 END) AS avg_sel
      FROM orders
      GROUP BY o_orderpriority
      HAVING count(*) > 10
      ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q07
  // SEMI join (sqldefs.h:33 JoinType::SEMI) = EXISTS.
  private val q07 = Q(
    "q07_semi_join",
    (s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q08
  // ANTI join (JoinType::ANTI) = NOT EXISTS.
  private val q08 = Q(
    "q08_anti_join",
    (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name, c_nationkey
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q09
  // LEFT join (JoinType::LEFT) + IS NULL handling (OpType kIsNull).
  private val q09 = Q(
    "q09_left_join",
    (s, d) => {
      val ord = t(s, d, "orders")
      t(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          // decimal sum per SURVEY §4 rule 6 (exact both engines)
          coalesce(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"),
            lit(0.0)).as("total_spent"),
          max(col("o_orderkey").isNull).as("has_no_order"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
      count(o_orderkey) AS n_orders,
      coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total_spent,
      max(o_orderkey IS NULL) AS has_no_order
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q10
  // LogicalUnion / UNION ALL (Node.h:849).
  private val q10 = Q(
    "q10_union",
    (s, d) => {
      val ord = t(s, d, "orders")
      val a = ord.filter(col("o_totalprice") > 350000)
        .select(lit("high_value").as("tag"), col("o_orderkey"), col("o_totalprice"))
      val b = ord.filter(col("o_orderdate") >= ts("2001-01-01 00:00:00"))
        .select(lit("recent").as("tag"), col("o_orderkey"), col("o_totalprice"))
      a.unionByName(b)
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .orderBy(col("tag"))
    },
    Some("""SELECT tag, count(*) AS n,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM (
        SELECT 'high_value' AS tag, o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 350000
        UNION ALL
        SELECT 'recent' AS tag, o_orderkey, o_totalprice FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      GROUP BY tag ORDER BY tag"""))

  // ---------------------------------------------------------------- q11
  // COUNT(DISTINCT) exact (AggType kCount is_distinct).
  private val q11 = Q(
    "q11_distinct",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // kApproxCountDistinct (HLL). The sketch estimate is
  // algorithm-specific, so the DRIVER claim is the tolerance gate: the
  // estimate must land within 10% of the exact distinct count computed
  // in the same aggregate (default rsd 0.05; GateProbe r13 measured
  // rel_err ≤ 0.027 at sf0.001/0.01/0.1 — ≥ 3.7× margin). n_parts is
  // the exact count, genuinely recomputed by DuckDB.
  private val q11b = Q(
    "q11b_approx_distinct",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .select(col("l_returnflag"), col("n_parts"),
          (abs(col("approx") - col("n_parts"))
            <= col("n_parts") * 0.10).as("within_tol"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      count(DISTINCT l_partkey) AS n_parts, TRUE AS within_tol
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q12
  // Arithmetic/bitwise/cast coverage (OpType kPlus..kMod, kBwAnd..kBwNot,
  // kUMinus, kCast; hdk.py:703-1193).
  private val q12 = Q(
    "q12_arith",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") + col("l_partkey")).as("add_"),
          (col("l_orderkey") - col("l_suppkey")).as("sub_"),
          (col("l_linenumber") * 7).as("mul_"),
          // raw IEEE division: identical double operands give a
          // bit-identical quotient in every engine; rounding would
          // CREATE cross-engine ties (cents/q hits exact .5 ulps).
          (col("l_extendedprice") / col("l_quantity")).as("div_"),
          (col("l_partkey") % 13).as("mod_"),
          expr("l_partkey div 13").as("idiv_"),
          (-col("l_suppkey")).as("neg_"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_partkey").bitwiseAND(255).as("band_"),
          col("l_partkey").bitwiseOR(16).as("bor_"),
          col("l_partkey").bitwiseXOR(col("l_suppkey")).as("bxor_"),
          expr("~l_suppkey").as("bnot_"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber,
      l_orderkey + l_partkey AS add_,
      l_orderkey - l_suppkey AS sub_,
      l_linenumber * 7 AS mul_,
      l_extendedprice / l_quantity AS div_,
      l_partkey % 13 AS mod_,
      l_partkey // 13 AS idiv_,
      -l_suppkey AS neg_,
      CAST(l_quantity AS INT) AS qty_int,
      CAST(l_orderkey AS VARCHAR) AS key_str,
      l_partkey & 255 AS band_,
      l_partkey | 16 AS bor_,
      xor(l_partkey, l_suppkey) AS bxor_,
      ~l_suppkey AS bnot_
      FROM lineitem
      WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q13
  // IN list (InValues, Expr.h:444) + IN subquery (InSubquery, Expr.h:492).
  private val q13 = Q(
    "q13_in",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q14
  // LIKE / REGEXP (LikeExpr Expr.h:636, RegexpExpr Expr.h:671),
  // char_length + lower (Expr.h:528,591).
  private val q14 = Q(
    "q14_like",
    (s, d) =>
      t(s, d, "part")
        .filter(col("p_name").like("%red%") || col("p_type").rlike("^(ECONOMY|PROMO)"))
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lname"),
          length(col("p_name")).as("name_len"),
          col("p_brand"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, lower(p_name) AS lname,
      length(p_name) AS name_len, p_brand
      FROM part
      WHERE p_name LIKE '%red%' OR regexp_matches(p_type, '^(ECONOMY|PROMO)')
      ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q15
  // EXTRACT (DateExtractField: DateTimeEnums.h:63) + DATE_TRUNC
  // (DateTruncField: DateTimeEnums.h:42).
  private val q15 = Q(
    "q15_extract",
    (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          (dayofweek(col("o_orderdate")) - 1).as("dow0"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("wk"),
          expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("int").as("isodow"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      CAST(extract(year FROM o_orderdate) AS INT) AS y,
      CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
      CAST(extract(month FROM o_orderdate) AS INT) AS m,
      CAST(extract(day FROM o_orderdate) AS INT) AS dom,
      CAST(extract(dow FROM o_orderdate) AS INT) AS dow0,
      CAST(extract(doy FROM o_orderdate) AS INT) AS doy,
      CAST(extract(week FROM o_orderdate) AS INT) AS wk,
      CAST(extract(isodow FROM o_orderdate) AS INT) AS isodow,
      CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS epoch_s,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
      FROM orders ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q16
  // DateAdd / DateDiff (DateAddExpr Expr.h:889, DateDiffExpr Expr.h:915).
  private val q16 = Q(
    "q16_dates",
    (s, d) => {
      val ord = t(s, d, "orders")
      t(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
        .agg(
          count(lit(1)).as("n_lines"),
          round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 6).as("avg_ship_delay"),
          max(expr("o_orderdate + INTERVAL 30 DAY")).as("max_due"),
          max(expr("o_orderdate + INTERVAL 2 MONTH")).as("max_due_2m"))
        .orderBy(col("order_month"))
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
      count(*) AS n_lines,
      round(avg(date_diff('day', o_orderdate, l_shipdate)), 6) AS avg_ship_delay,
      max(o_orderdate + INTERVAL 30 DAY) AS max_due,
      max(o_orderdate + INTERVAL 2 MONTH) AS max_due_2m
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q17
  // Window: RowNumber/Rank/DenseRank + Lag/Lead/First/Last
  // (WindowFunctionKind, OpTypeEnums.h:96; hdk.py over:1456).
  private val q17 = Q(
    "q17_window",
    (s, d) => {
      val wUnique = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wPrio = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderpriority"))
      t(s, d, "orders")
        .filter(col("o_custkey") % 10 === 0)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(wUnique).as("rn"),
          rank().over(wPrio).as("rk"),
          dense_rank().over(wPrio).as("drk"),
          round(lag(col("o_totalprice"), 1).over(wUnique), 2).as("prev_price"),
          round(lead(col("o_totalprice"), 1).over(wUnique), 2).as("next_price"),
          first(col("o_orderkey")).over(wUnique).as("first_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      row_number() OVER w1 AS rn,
      rank() OVER w2 AS rk,
      dense_rank() OVER w2 AS drk,
      round(lag(o_totalprice, 1) OVER w1, 2) AS prev_price,
      round(lead(o_totalprice, 1) OVER w1, 2) AS next_price,
      first_value(o_orderkey) OVER w1 AS first_key
      FROM orders
      WHERE o_custkey % 10 = 0
      WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
      ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q18
  // Windowed aggregates + NTile/PercentRank/CumeDist with frames.
  private val q18 = Q(
    "q18_winagg",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") % 10 === 1)
        .select(
          col("o_custkey"), col("o_orderkey"),
          // decimal running sum: money summed as DECIMAL is order-free
          // exact (SURVEY §4 rule 6). Final cast to DOUBLE: the driver
          // comparator cannot hash decimal columns across engines; the
          // cast is exact (values << 2^53/100) and both engines produce
          // identical IEEE doubles from equal decimals (q28 pattern).
          sum(round(col("o_totalprice"), 2).cast("decimal(18,2)")).over(running)
            .cast("double").as("run_total"),
          round(avg(col("o_totalprice")).over(running), 6).as("run_avg"),
          round(min(col("o_totalprice")).over(running), 2).as("run_min"),
          round(max(col("o_totalprice")).over(running), 2).as("run_max"),
          count(lit(1)).over(running).as("run_n"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("prk"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) OVER wr
           AS DOUBLE) AS run_total,
      round(avg(o_totalprice) OVER wr, 6) AS run_avg,
      round(min(o_totalprice) OVER wr, 2) AS run_min,
      round(max(o_totalprice) OVER wr, 2) AS run_max,
      count(*) OVER wr AS run_n,
      ntile(4) OVER w AS quartile,
      round(percent_rank() OVER w, 6) AS prk,
      round(cume_dist() OVER w, 6) AS cdist
      FROM orders
      WHERE o_custkey % 10 = 1
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q19
  // Exact quantile w/ linear interpolation (AggType kQuantile),
  // stddev_samp (kStdDevSamp), corr (kCorr).
  private val q19 = Q(
    "q19_quantile",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
      round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price,
      round(stddev_samp(l_extendedprice), 4) AS sd_price,
      round(corr(l_extendedprice, l_quantity), 6) AS corr_pq
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // kApproxQuantile. The sketch median is algorithm-specific, so the
  // DRIVER claim is the rank-error gate: the approximate median must
  // land between the exact 45th and 55th percentiles computed in the
  // same aggregate — a ±5% rank bound where accuracy=1000 guarantees
  // ±0.1% (GateProbe r13: inside the bracket with wide room at all
  // three SFs). n_rows is genuinely DuckDB-recomputed.
  private val q19b = Q(
    "q19b_approx_quantile",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("am"),
          expr("percentile(l_extendedprice, 0.45)").as("p45"),
          expr("percentile(l_extendedprice, 0.55)").as("p55"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("n_rows"),
          (col("am") >= col("p45") && col("am") <= col("p55"))
            .as("rank_ok"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, count(*) AS n_rows, TRUE AS rank_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q20
  // kSingleValue: value constant within group (first + guard). Oracle
  // uses min() which is equivalent under the constant-per-group invariant.
  private val q20 = Q(
    "q20_single_value",
    (s, d) => {
      // the group key IS the join key, so the %50 predicate pushes to
      // both scans by hand (Catalyst doesn't infer modulo through the
      // aggregate) — 1/50th of both tables ever leaves the scan.
      val ord = t(s, d, "orders").filter(col("o_orderkey") % 50 === 0)
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          first(col("o_totalprice")).as("order_price"),
          first(col("o_orderstatus")).as("order_status"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey,
      min(o_totalprice) AS order_price,
      min(o_orderstatus) AS order_status,
      count(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey
      HAVING l_orderkey % 50 = 0
      ORDER BY l_orderkey"""))

  // kSample (arbitrary element per group) + SampleRatioExpr. The drawn
  // rows are engine-specific, so the DRIVER claim is the 3-part gate:
  // the per-group sample fraction lands within ±0.05 of the requested
  // 0.1 (GateProbe r13: dev ≤ 0.015 at sf0.001, ≤ 0.004 above), the
  // same seed re-draws the identical sample (count + min key equal
  // across two independent legs), and the sampled min key is a genuine
  // member of its group. n_total is DuckDB-recomputed.
  private val q20b = Q(
    "q20b_sample",
    (s, d) => {
      val li = t(s, d, "lineitem")
      def leg(n: String, k: String) =
        li.sample(withReplacement = false, 0.1, seed = 42)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as(n), min(col("l_orderkey")).as(k))
      val tot = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_total"))
      val members = li.select(col("l_returnflag"),
          col("l_orderkey").as("k1")).distinct()
        .withColumn("mem", lit(true))
      leg("n1", "k1").join(leg("n2", "k2"), Seq("l_returnflag"))
        .join(tot, Seq("l_returnflag"))
        .join(members, Seq("l_returnflag", "k1"), "left")
        .select(col("l_returnflag"), col("n_total"),
          (abs(col("n1") / col("n_total").cast("double") - 0.1) <= 0.05)
            .as("frac_ok"),
          (col("n1") === col("n2") && col("k1") === col("k2"))
            .as("stable_ok"),
          coalesce(col("mem"), lit(false)).as("member_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n_total, TRUE AS frac_ok,
      TRUE AS stable_ok, TRUE AS member_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q21
  // kTopK / bottom_k (hdk.py:301,328) via graft's native Catalyst
  // TypedImperativeAggregate (bounded heap, O(k) memory + shuffle).
  // The arrays are emitted as canonical comma-joined strings (elements
  // cast to DECIMAL(18,2) both sides) because the driver's comparator
  // cannot hash array cells; the aggregate itself returns real arrays.
  private val q21 = Q(
    "q21_topk",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.topk(col("l_extendedprice"), 5).as("top5_arr"),
          graft.functions.bottomk(col("l_extendedprice"), 5).as("bottom5_arr"))
        .select(
          col("l_returnflag"),
          array_join(expr("transform(top5_arr, x -> cast(cast(x as decimal(18,2)) as string))"), ",").as("top5_price"),
          array_join(expr("transform(bottom5_arr, x -> cast(cast(x as decimal(18,2)) as string))"), ",").as("bottom5_price"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      array_to_string(list_transform((list(l_extendedprice ORDER BY l_extendedprice DESC))[1:5],
        x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS top5_price,
      array_to_string(list_transform((list(l_extendedprice ORDER BY l_extendedprice ASC))[1:5],
        x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS bottom5_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q22
  // WidthBucketExpr (Expr.h:698). DuckDB lacks width_bucket → oracle
  // emulates the standard definition with a CASE.
  private val q22 = Q(
    "q22_width_bucket",
    (s, d) =>
      t(s, d, "orders")
        .select(expr("width_bucket(o_totalprice, 0.0, 500000.0, 10)").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
    Some("""SELECT CASE WHEN o_totalprice < 0 THEN 0
                   WHEN o_totalprice >= 500000 THEN 11
                   ELSE CAST(floor(o_totalprice * 10 / 500000.0) AS BIGINT) + 1 END AS bucket,
      count(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q23
  // LogicalValues (Node.h:785): inline literal relation joined to a table.
  private val q23 = Q(
    "q23_values",
    (s, d) => {
      val statuses = s.createDataFrame(Seq(
        ("O", "open"), ("F", "fulfilled"), ("P", "pending")))
        .toDF("code", "status_name")
      t(s, d, "orders")
        .join(broadcast(statuses), col("o_orderstatus") === col("code"))
        .groupBy(col("status_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status_name"))
    },
    Some("""SELECT status_name, count(*) AS n
      FROM orders
      JOIN (VALUES ('O','open'),('F','fulfilled'),('P','pending'))
        AS v(code, status_name) ON o_orderstatus = code
      GROUP BY status_name ORDER BY status_name"""))

  // ---------------------------------------------------------------- q24
  // Scalar subquery (Expr.h:415) + correlated subquery
  // (Tests/CorrelatedSubqueryTest.cpp).
  private val q24 = Q(
    "q24_subquery",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
          AND c_custkey IN (
            SELECT o_custkey FROM orders
            WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = orders.o_custkey) * 1.5)
        ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
        AND c_custkey IN (
          SELECT o_custkey FROM orders
          WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = orders.o_custkey) * 1.5)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q25
  // Array ops: kArrayAt / Cardinality / element math (Expr.h:616,
  // hdk.py at:1402, cardinality:1433). Double math over float32 input is
  // exact-widening, summed left-to-right in both engines.
  private val q25 = Q(
    "q25_array",
    (s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_elem"),
          round(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2_norm"),
          col("label"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
      len(embedding) AS dim,
      round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
      round(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
      label
      FROM embeddings ORDER BY vec_id"""))

  // Unnest (OpType kUnnest, hdk.py:675) — explode with position.
  private val q25b = Q(
    "q25b_unnest",
    (s, d) =>
      t(s, d, "embeddings")
        .filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos"), round(col("val").cast("double"), 6).as("val"))
        .orderBy(col("vec_id"), col("pos")),
    Some("""SELECT vec_id, CAST(u.pos - 1 AS INT) AS pos,
      round(CAST(u.val AS DOUBLE), 6) AS val
      FROM (SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings WHERE vec_id < 3) u(vec_id, val, pos)
      ORDER BY vec_id, pos"""))

  // ---------------------------------------------------------------- q27
  // SQL frontend end-to-end (HDK.sql, hdk.py:2456 — Calcite there,
  // Spark SQL parser here): TPC-H Q10 shape.
  private val q27 = Q(
    "q27_sql",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    },
    Some("""SELECT c_custkey, c_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      n_name
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20"""))

  // ---------------------------------------------------------------- q28
  // Events table: time-bucketed aggregation (batch form of the
  // streaming pipeline in graft.streaming).
  private val q28 = Q(
    "q28_events_window",
    (s, d) =>
      t(s, d, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          // decimal sum per SURVEY §4 rule 6 (values are 2-decimal)
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
      count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q29
  // JSON props extraction (events.props is a JSON string).
  private val q29 = Q(
    "q29_json",
    (s, d) =>
      t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k_mod")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      count(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q11b, q12, q13, q14, q15, q16, q17, q18, q19, q19b,
    q20, q20b, q21, q22, q23, q24, q25, q25b, q27, q28, q29)
}
