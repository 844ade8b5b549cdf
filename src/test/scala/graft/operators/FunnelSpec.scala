package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("funnel: strict order + anchored window semantics") {
    val ev = Seq(
      // u1 completes all three steps in order within the window
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-02 00:00:00"), "click"),
      (1L, ts("2024-01-03 00:00:00"), "purchase"),
      // u2: purchase BEFORE click — strict order stops it at level 2
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-03 00:00:00"), "click"),
      (2L, ts("2024-01-02 00:00:00"), "purchase"),
      // u3: click outside the 7-day anchored window
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-09 00:00:01"), "click"),
      // u4: never views — not in the funnel at all
      (4L, ts("2024-01-01 00:00:00"), "click"),
      // u5: click at exactly t1 (not strictly after) doesn't count;
      // a later one does
      (5L, ts("2024-01-01 00:00:00"), "view"),
      (5L, ts("2024-01-01 00:00:00"), "click"),
      (5L, ts("2024-01-02 00:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, Seq("view", "click", "purchase"), "7 days")
      .select("user_id", "level").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 5L -> 2))
  }

  test("funnel: window boundary is inclusive at t1 + window") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-08 00:00:00"), "click") // exactly t1 + 7 days
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, Seq("view", "click"), "7 days")
      .select("user_id", "level").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2))
  }

  test("transitions: lag pairs per user, cross-user pairs excluded") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", 1L),
      (1L, ts("2024-01-01 00:01:00"), "click", 2L),
      (1L, ts("2024-01-01 00:02:00"), "click", 3L),
      (2L, ts("2024-01-01 00:03:00"), "purchase", 4L) // no prev for u2
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.transitions(ev)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("view", "click", 1L), ("click", "click", 1L)))
  }

  test("retention: cohort weeks and offsets") {
    val ev = Seq(
      // u1 first active week of Jan 1 (Mon), active again wk+1, wk+3
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-23 10:00:00")),
      // u2 first active wk of Jan 8, active only then (two events)
      (2L, ts("2024-01-08 00:00:00")),
      (2L, ts("2024-01-10 00:00:00"))
    ).toDF("user_id", "ts")
    val got = Funnel.retention(ev)
      .select($"cohort_week".cast("string"), $"week_offset", $"n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01 00:00:00", 0, 1L),
      ("2024-01-01 00:00:00", 1, 1L),
      ("2024-01-01 00:00:00", 3, 1L),
      ("2024-01-08 00:00:00", 0, 1L)))
  }
}
