package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected TABLE functions (GraftExtensions.injectTableFunction)
  * are thin delegates: `FROM graft_funnel(...)` must be the SAME
  * Catalyst plan the DataFrame operator builds, not a second
  * implementation — the reference is SQL-first (pyhdk hdk.py:2456) and
  * this is the parity contract for its analytics families (verdict r8
  * next-round #8).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  Tables.registerAll(spark, TestSpark.sf)

  test("graft_funnel SQL path optimizes to the operator's plan") {
    val sqlPlan = spark
      .sql("SELECT * FROM graft_funnel('events', 'view,click,purchase', '7 days')")
      .queryExecution.optimizedPlan
    val opPlan = graft.operators.Funnel
      .funnel(spark.table("events"), Seq("view", "click", "purchase"),
        "7 days")
      .queryExecution.optimizedPlan
    assert(sqlPlan.sameResult(opPlan),
      s"SQL and operator funnel plans diverge:\n$sqlPlan\nvs\n$opPlan")
  }

  test("graft_ohlc SQL path optimizes to the operator's plan") {
    val sqlPlan = spark
      .sql("SELECT * FROM graft_ohlc('events', 'user_id', 'ts', 'value', 'event_id', 'hour')")
      .queryExecution.optimizedPlan
    val opPlan = graft.operators.TimeJoins
      .ohlcBars(spark.table("events"), "user_id", "ts", "value",
        "event_id", "hour")
      .queryExecution.optimizedPlan
    assert(sqlPlan.sameResult(opPlan))
  }

  test("graft_pagerank SQL path reproduces the operator's result") {
    // pageRank materializes its edge frame via localCheckpoint, so the
    // two plans root at distinct LogicalRDDs and sameResult cannot
    // apply; the contract here is value equality on a pinned graph.
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_edges AS
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        CAST(o_custkey % 50 + 100000 AS BIGINT) AS dst
      FROM orders WHERE o_orderkey % 7 = 0""")
    val viaSql = spark
      .sql("SELECT * FROM graft_pagerank('sqs_edges', 2, 0.85) ORDER BY node_id")
      .collect().toSeq
    val viaOp = graft.operators.Graph
      .pageRank(spark.table("sqs_edges"), iters = 2, d = 0.85)
      .orderBy(col("node_id")).collect().toSeq
    assert(viaSql == viaOp)
  }

  test("a filter outside graft_ohlc pushes below the aggregate") {
    val df = spark.sql("""SELECT * FROM
      graft_ohlc('events', 'user_id', 'ts', 'value', 'event_id', 'day')
      WHERE user_id % 3 = 0""")
    val agg = df.queryExecution.optimizedPlan
      .collectFirst { case a: Aggregate => a }
    assert(agg.isDefined, "no Aggregate in the ohlc plan")
    val pushed = agg.get.collectFirst {
      case f: Filter if f.condition.references.map(_.name)
        .exists(_ == "user_id") => f
    }
    assert(pushed.isDefined,
      "the user_id filter did not push through the TVF's aggregate:\n" +
        df.queryExecution.optimizedPlan)
  }

  test("table functions reject malformed arguments") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_funnel('events', 'only_one_step', '7 days')")
        .collect()
    }
    assert(e1.getMessage.contains("at least two steps") ||
      e1.getCause != null)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_pagerank('events', 99, 0.85)").collect()
    }
    assert(e2.getMessage.contains("iters") || e2.getCause != null)
  }
}
