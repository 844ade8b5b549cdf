package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` table: the windowFunnel /
  * cohort-retention class of queries an OLAP engine serves for product
  * analytics (ClickHouse's windowFunnel/retention are the household
  * names; the reference's users run the same shapes as chained
  * self-joins — RelCompound over kLe/kGe predicates, omniscidb
  * IR/Node.h RelFilter + RelAggregate).
  *
  * Scale design: every stage is a groupBy/join keyed on the
  * HIGH-cardinality user column, so all shuffles hash-partition on a
  * key with ~uniform fan-out — no window over a low-cardinality
  * partition anywhere. Each funnel step touches the events table once
  * with a pushed-down `event_type` filter, and each per-step frame is
  * one user-keyed row, so the join fan-in at step i is |users who
  * reached step i| — monotonically shrinking.
  */
object Funnel {

  /** Sequential conversion funnel: for each user, the deepest step of
    * `steps` reached IN ORDER, where step 1 anchors the window (a later
    * step counts only if its earliest qualifying timestamp lies in
    * (t_prev, t_1 + window]). Returns one row per user who performed
    * step 1: (userCol, t_1, level) with level in [1, steps.length].
    *
    * Each step is min(ts) per user of rows strictly after the previous
    * step's chosen timestamp and within the anchored window — the
    * standard "strict order, bounded window" funnel semantics. A user
    * missing step i contributes NULL t_{i+1}, and all deeper steps stay
    * NULL (the strictly-after predicate on a NULL bound filters
    * everything), so `level` is the count of non-null step timestamps.
    */
  def funnel(ev: DataFrame, steps: Seq[String], window: String = "7 days",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val s1 = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val chained = steps.tail.zipWithIndex.foldLeft(s1) {
      case (acc, (step, i)) =>
        val prev = s"t${i + 1}"
        val cur = s"t${i + 2}"
        val bounds = (Seq(userCol, "t1") ++ Seq(prev).filter(_ != "t1"))
          .map(col)
        val nxt = ev.filter(col(typeCol) === step)
          .join(acc.select(bounds: _*), Seq(userCol))
          .filter(col(tsCol) > col(prev) &&
            col(tsCol) <= col("t1") + expr(s"INTERVAL $window"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
        acc.join(nxt, Seq(userCol), "left")
    }
    val level = (1 to steps.size - 1)
      .map(i => col(s"t${i + 1}").isNotNull.cast("int"))
      .foldLeft(lit(1))(_ + _)
    chained.select(col(userCol), col("t1"), level.as("level"))
  }

  /** Event-type transition matrix (first-order Markov counts): how
    * often each event type follows each other type within a user's
    * event-time-ordered stream — the path-analysis primitive behind
    * "what do users do after X". One lag window per HIGH-cardinality
    * user plus an output-sized (from, to) rollup.
    */
  def transitions(ev: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    ev.withColumn("from_type", lag(col(typeCol), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort week, week offset) the number of
    * cohort users active in that later week. The product-analytics
    * retention matrix.
    *
    * Plan: one user-keyed aggregate for the cohort frame, one narrow
    * distinct on (user, week) — already user-keyed, so AQE coalesces
    * the reuse — then a user-keyed join and a small (cohort, offset)
    * aggregate. Nothing partitions on a low-cardinality key until the
    * final output-sized rollup.
    */
  def retention(ev: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val first = ev.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = ev
      .select(col(userCol), date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    active.join(first, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
