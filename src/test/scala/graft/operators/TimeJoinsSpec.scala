package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TimeJoinsSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before the left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:01:00"), 50.0)
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:05:00")), // equal ts → inclusive match
      (11L, 1L, ts("2024-01-01 10:03:00")), // between the two quotes
      (12L, 2L, ts("2024-01-01 10:00:00")), // before any quote → null
      (13L, 3L, ts("2024-01-01 10:00:00"))  // key with no right rows
    ).toDF("trade_id", "user_id", "ts")
    val got = TimeJoins.asofJoin(trades, quotes, "user_id", "ts", Seq("px"))
      .select("trade_id", "asof_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(10L -> Some(101.0), 11L -> Some(100.0),
      12L -> None, 13L -> None))
  }

  test("range join: inclusive start, exclusive end, bucket straddling") {
    val intervals = Seq(
      (100L, ts("2024-01-01 10:07:00"), ts("2024-01-01 10:17:00"))
    ).toDF("iv_id", "s", "e")
    val points = Seq(
      (1L, ts("2024-01-01 10:07:00")), // == start → in
      (2L, ts("2024-01-01 10:16:59")), // just inside (different bucket)
      (3L, ts("2024-01-01 10:17:00")), // == end → out
      (4L, ts("2024-01-01 10:06:59"))  // just before → out
    ).toDF("pt_id", "ts")
    val got = TimeJoins.rangeJoin(points, "ts", intervals, "s", "e", 600L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L)))
  }

  test("resampleFfill: full grid per key, ffill, deterministic in-bucket pick") {
    val obs = Seq(
      // key 1: observations at 10:xx and 13:xx — 11:00 and 12:00 filled
      (1L, ts("2024-01-01 10:10:00"), 1.0, 100L),
      (1L, ts("2024-01-01 10:40:00"), 2.0, 101L), // later in same bucket wins
      (1L, ts("2024-01-01 13:05:00"), 9.0, 102L),
      // key 2: single observation → single grid row
      (2L, ts("2024-01-02 00:30:00"), 5.0, 103L),
      // key 3: equal ts in one bucket → higher tie id wins
      (3L, ts("2024-01-01 08:15:00"), 7.0, 104L),
      (3L, ts("2024-01-01 08:15:00"), 8.0, 105L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = TimeJoins
      .resampleFfill(obs, "user_id", "ts", "value", "event_id", "hour")
      .as[(Long, java.sql.Timestamp, Double)].collect()
      .map { case (k, b, v) => (k, b.toString, v) }.toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00.0", 2.0),
      (1L, "2024-01-01 11:00:00.0", 2.0),
      (1L, "2024-01-01 12:00:00.0", 2.0),
      (1L, "2024-01-01 13:00:00.0", 9.0),
      (2L, "2024-01-02 00:00:00.0", 5.0),
      (3L, "2024-01-01 08:00:00.0", 8.0)))
  }

  test("range join matches a BETWEEN cross join on events") {
    val ev = graft.Tables.load(spark, graft.TestSpark.sf, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 10 MINUTE")).as("e"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts"))
    val bucketed = TimeJoins.rangeJoin(clicks, "ts", errors, "s", "e", 600L)
      .select("click_id", "error_id").as[(Long, Long)].collect().toSet
    val naive = clicks.join(errors,
        col("ts") >= col("s") && col("ts") < col("e"))
      .select("click_id", "error_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty, "fixture produced no ranged pairs")
  }

  test("ewma: bias-corrected trailing smoothing, frame truncation") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 01:00:00"), 2.0, 2L),
      (1L, ts("2024-01-01 02:00:00"), 3.0, 3L),
      (2L, ts("2024-01-01 00:00:00"), 10.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = TimeJoins.ewma(obs, "user_id", "ts", "value", "event_id",
        alpha = 0.5, span = 2)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    // row1: 1.0; row2: (1*0.5+2)/(0.5+1)=1.666667; row3 (frame drops
    // row1): (2*0.5+3)/1.5=2.666667; single-row user: 10.0
    assert(got == Map(1L -> 1.0, 2L -> 1.666667, 3L -> 2.666667,
      4L -> 10.0))
  }

  test("holtSmooth: perfect line invariant, hand noisy case, 1-obs NULLs") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // perfect line slope 2 under alpha=beta=0.5: level tracks exactly,
    // trend stays 2, forecast extrapolates l + h·b
    val line = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, ts("2024-01-01 01:00:00"), 12.0, 2L),
      (1L, ts("2024-01-01 02:00:00"), 14.0, 3L),
      (1L, ts("2024-01-01 03:00:00"), 16.0, 4L),
      // noisy key: l=[10,12,12.5], b=[2,2,1.25] → forecast 13.75
      (2L, ts("2024-01-01 00:00:00"), 10.0, 5L),
      (2L, ts("2024-01-01 01:00:00"), 12.0, 6L),
      (2L, ts("2024-01-01 02:00:00"), 11.0, 7L),
      // single observation: trend/forecast honestly NULL
      (3L, ts("2024-01-01 00:00:00"), 7.0, 8L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = TimeJoins.holtSmooth(line, "user_id", "ts", "value",
        "event_id", alpha = 0.5, beta = 0.5, horizon = 2)
      .select("user_id", "n", "level", "trend", "forecast")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4L, Some(16.0), Some(2.0), Some(20.0))))
    assert(got(2L) == ((3L, Some(12.5), Some(1.25), Some(15.0))))
    assert(got(3L) == ((1L, Some(7.0), None, None)))
    // the fold respects (ts, tie) order, not input order
    val shuffled = Seq(
      (9L, ts("2024-01-01 02:00:00"), 11.0, 3L),
      (9L, ts("2024-01-01 00:00:00"), 10.0, 1L),
      (9L, ts("2024-01-01 01:00:00"), 12.0, 2L)
    ).toDF("user_id", "ts", "value", "event_id")
    val s = TimeJoins.holtSmooth(shuffled, "user_id", "ts", "value",
        "event_id", alpha = 0.5, beta = 0.5, horizon = 2)
      .select("level", "trend").as[(Double, Double)].head()
    assert(s == ((12.5, 1.25)))
  }

  test("ohlcBars: first/last by (ts, tie), hi/lo/count per bucket") {
    val obs = Seq(
      // one bucket, same-second ties broken by event_id
      (1L, ts("2024-01-01 10:00:05"), 2L, 105.0),
      (1L, ts("2024-01-01 10:00:05"), 1L, 104.0), // open (tie: lower id)
      (1L, ts("2024-01-01 10:59:59"), 4L, 99.0),
      (1L, ts("2024-01-01 10:59:59"), 5L, 101.0), // close (tie: higher id)
      (1L, ts("2024-01-01 10:30:00"), 3L, 110.0), // high
      // second bucket, single row: open=close=high=low
      (1L, ts("2024-01-01 11:10:00"), 6L, 50.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeJoins
      .ohlcBars(obs, "user_id", "ts", "value", "event_id", "hour")
      .select("bucket", "open", "high", "low", "close", "n_obs")
      .as[(java.sql.Timestamp, Double, Double, Double, Double, Long)]
      .collect().map(r => r._1.toString -> ((r._2, r._3, r._4, r._5, r._6)))
      .toMap
    assert(got("2024-01-01 10:00:00.0") == ((104.0, 110.0, 99.0, 101.0, 5L)))
    assert(got("2024-01-01 11:00:00.0") == ((50.0, 50.0, 50.0, 50.0, 1L)))
  }

  test("twap: holding-period weights, last row unweighted, degenerate NULL") {
    val obs = Seq(
      // 10 held for 3s, 20 held for 1s, 30 unobserved-holding (last)
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:00:03"), 2L, 20.0),
      (1L, ts("2024-01-01 00:00:04"), 3L, 30.0),
      // single observation → NULL (no holding period at all)
      (2L, ts("2024-01-01 00:00:00"), 4L, 7.0),
      // two rows at the SAME instant → span 0 → NULL, not ÷0
      (3L, ts("2024-01-01 00:00:00"), 5L, 1.0),
      (3L, ts("2024-01-01 00:00:00"), 6L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeJoins.twap(obs, "user_id", "ts", "value", "event_id")
      .select("user_id", "n_obs", "twap")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // (10*3 + 20*1) / 4 = 12.5 — NOT the simple mean 20
    assert(got(1L) == ((3L, Some(12.5))))
    assert(got(2L) == ((1L, None)))
    assert(got(3L) == ((2L, None)))
  }

  test("cusum: closed form equals the textbook recursion on a step series") {
    // 10,10,10,10,10 then 13,13,13,13,13 — global mean 11.5, slack 0.5.
    // Hand recursion (S=max(0,S+(x-12))): up side 0 through t5 then
    // 1,2,3,4,5; down side (S=max(0,S+(11-x))) 1..5 then decaying 3,1,0.
    val obs = (1L to 10L).map(t0 =>
      (1L, t0, if (t0 <= 5) 10.0 else 13.0)).toDF("k", "t", "value")
    val got = TimeJoins.cusum(obs, "k", "t", "value",
        slack = 0.5, threshold = 4.0)
      .select("t", "cusum_up", "cusum_dn", "flagged")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (1L to 5L).foreach(t0 => assert(got(t0)._1 == 0.0, s"up at $t0"))
    (6L to 10L).foreach(t0 =>
      assert(got(t0)._1 == (t0 - 5).toDouble, s"up at $t0"))
    (1L to 5L).foreach(t0 =>
      assert(got(t0)._2 == t0.toDouble, s"dn at $t0"))
    assert(got(6L)._2 == 3.0 && got(7L)._2 == 1.0 && got(8L)._2 == 0.0)
    // threshold 4: down side crosses at t5, up side at t10
    assert(got(5L)._3 && got(10L)._3 && !got(4L)._3 && !got(9L)._3)
  }

  test("acf: alternating series has negative lag-1, positive lag-2; constant NULL") {
    val obs = (1L to 8L).map(t0 =>
      (1L, t0, if (t0 % 2 == 1) 1.0 else -1.0)).toDF("k", "t", "value")
    val got = TimeJoins.acf(obs, "k", "t", "value", maxLag = 3)
      .select("lag", "n_pairs", "acf")
      .as[(Int, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // mean 0, all deviations ±1: r(1) = -7/8, r(2) = 6/8, r(3) = -5/8
    assert(got(1) == ((7L, Some(-0.875))))
    assert(got(2) == ((6L, Some(0.75))))
    assert(got(3) == ((5L, Some(-0.625))))
    val const = (1L to 6L).map(t0 => (1L, t0, 2.0)).toDF("k", "t", "value")
    val gc = TimeJoins.acf(const, "k", "t", "value", maxLag = 2)
      .select("acf").as[Option[Double]].collect()
    assert(gc.forall(_.isEmpty), "constant series has no variance")
  }

  test("ccf: planted 2-step lead peaks at +2, reversed series at -2") {
    // y_t = x_{t-2} on an APERIODIC series: x LEADS y by 2, so the
    // ccf peak must sit uniquely at lag +2
    val vals = Seq(5.0, 1.0, 4.0, 2.0, 8.0, 3.0, 9.0, 2.0, 7.0, 1.0,
      6.0, 4.0)
    val obs = (1 to 12).map { t0 =>
      (1L, t0.toLong, vals(t0 - 1),
        if (t0 > 2) vals(t0 - 3) else 0.0)
    }.toDF("k", "t", "x", "y")
    val got = TimeJoins.ccf(obs, "k", "t", "x", "y", maxLag = 3)
      .select("lag", "ccf").as[(Int, Option[Double])].collect().toMap
    val peak = got.collect { case (l, Some(v)) => l -> v }
    assert(peak.maxBy(_._2)._1 == 2, s"peak must sit at +2: $got")
    assert(got(2).exists(_ > 0.8), s"strong positive at +2: ${got(2)}")
    assert(got(0).exists(v => v < got(2).get), "lag 0 is weaker")
  }

  test("seasonalDecompose: odd period recovers a planted phase effect") {
    // v = 10 + s(t mod 3), s = (0, 3, -3) — trend must be flat 10,
    // seasonal must recover s exactly, residual 0, edges NULL.
    val obs = (0L to 8L).map(t0 =>
      (1L, t0, 10.0 + Seq(0.0, 3.0, -3.0)((t0 % 3).toInt)))
      .toDF("k", "t", "value")
    val got = TimeJoins.seasonalDecompose(obs, "k", "t", "value", 3)
      .select("t", "trend", "seasonal", "residual")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L)._1.isEmpty && got(8L)._1.isEmpty) // edges
    (1L to 7L).foreach { t0 =>
      assert(got(t0)._1.contains(10.0), s"trend at $t0")
      assert(got(t0)._3.contains(0.0), s"residual at $t0")
    }
    assert(got(3L)._2.contains(0.0))  // phase 0
    assert(got(4L)._2.contains(3.0))  // phase 1
    assert(got(5L)._2.contains(-3.0)) // phase 2
  }

  test("seasonalDecompose: even period 2xm MA is exact on a linear series") {
    // v = t is pure trend: the half-weighted endpoints make the 2×4 MA
    // reproduce t exactly; seasonal collapses to 0 everywhere.
    val obs = (0L to 7L).map(t0 => (1L, t0, t0.toDouble))
      .toDF("k", "t", "value")
    val got = TimeJoins.seasonalDecompose(obs, "k", "t", "value", 4)
      .select("t", "trend", "seasonal", "residual")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (0L to 1L).foreach(t0 => assert(got(t0)._1.isEmpty))
    (6L to 7L).foreach(t0 => assert(got(t0)._1.isEmpty))
    (2L to 5L).foreach { t0 =>
      assert(got(t0)._1.contains(t0.toDouble), s"trend at $t0")
      assert(got(t0)._2.contains(0.0), s"seasonal at $t0")
      assert(got(t0)._3.contains(0.0), s"residual at $t0")
    }
  }

  test("seasonalDecompose: a gap NULLs the straddling trends, not the phases") {
    // Same planted pattern with bucket 4 missing: a blind ROWS frame
    // would fabricate trends at t=3 and t=5; the span guard NULLs them.
    val obs = Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L).map(t0 =>
      (1L, t0, 10.0 + Seq(0.0, 3.0, -3.0)((t0 % 3).toInt)))
      .toDF("k", "t", "value")
    val got = TimeJoins.seasonalDecompose(obs, "k", "t", "value", 3)
      .select("t", "trend", "seasonal")
      .as[(Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(3L)._1.isEmpty && got(5L)._1.isEmpty) // straddle the gap
    Seq(1L, 2L, 6L).foreach(t0 =>
      assert(got(t0)._1.contains(10.0), s"trend at $t0"))
    // phases stay calendar-anchored: seasonal still recovers s exactly
    assert(got(6L)._2.contains(0.0))
    assert(got(1L)._2.contains(3.0))
    assert(got(2L)._2.contains(-3.0))
  }
}
