package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("audit: planted violations per rule kind, NULL scoping") {
    val t = Seq(
      (1L, Some(10.0), Some("O")),
      (2L, Some(-5.0), Some("X")),  // range + set violations
      (2L, None, None),             // dup key; NULLs out of range/set scope
      (3L, Some(999.0), Some("F")), // range violation (hi)
      (2L, Some(50.0), Some("O"))   // third copy of key 2
    ).toDF("k", "v", "s")
    val dim = Seq(1L, 3L).toDF("pk")
    val got = report(Quality.audit(t, Seq(
      Quality.NotNull("v"),
      Quality.InRange("v", 0.0, 100.0),
      Quality.InSet("s", Seq("O", "F")),
      Quality.Unique(Seq("k")),
      Quality.RefIntegrity("k", dim, "pk"))))
    assert(got("not_null(v)") == ((1L, 5L, false)))
    // NULL v is not a range violation; -5 and 999 are; scope = 4 non-null
    assert(got("in_range(v,0.0,100.0)") == ((2L, 4L, false)))
    assert(got("in_set(s)") == ((1L, 4L, false)))
    // key 2 appears 3x -> 2 surplus rows
    assert(got("unique(k)") == ((2L, 5L, false)))
    // keys 2,2,2 orphaned vs dim {1,3}
    assert(got("ref_integrity(k)") == ((3L, 5L, false)))
  }

  test("audit: clean table is all-ok and FK ignores NULL fks") {
    val t = Seq((1L, Some(1L)), (2L, None: Option[Long])).toDF("k", "fk")
    val dim = Seq(1L).toDF("pk")
    val got = report(Quality.audit(t, Seq(
      Quality.NotNull("k"),
      Quality.Unique(Seq("k")),
      Quality.RefIntegrity("fk", dim, "pk"))))
    assert(got.values.forall(_._3 == true))
    // NULL fk is out of referential scope (NotNull's business)
    assert(got("ref_integrity(fk)") == ((0L, 1L, true)))
  }

  test("audit: row rules share one aggregate over one scan") {
    val t = Seq((1L, 2.0, "O")).toDF("k", "v", "s")
    val plan = Quality.audit(t, Seq(
      Quality.NotNull("k"), Quality.NotNull("v"),
      Quality.InRange("v", 0.0, 10.0),
      Quality.InSet("s", Seq("O"))))
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    assert(plan.collect { case a: Aggregate => a }.size == 1,
      s"4 row rules must fold into one Aggregate:\n$plan")
  }

  test("audit rejects an empty rule list") {
    val t = Seq((1L, "x")).toDF("k", "s")
    assert(intercept[IllegalArgumentException] {
      Quality.audit(t, Seq.empty)
    }.getMessage.contains("rule"))
  }

  test("winsorize: tails clamp to the interpolated bounds, middle and NULLs pass") {
    // values 1..10: lo = 1 + 0.05*9 = 1.45, hi = 9.55 (linear interp)
    val rows = (1 to 10).map(i => ("g", Some(i.toDouble))) :+
      (("g", Option.empty[Double]))
    val got = Quality.winsorize(rows.toDF("k", "v"), "k", "v")
      .select("v", "winsorized", "clipped")
      .as[(Option[Double], Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(Some(1.0)) == ((Some(1.45), true)), "low tail clamps up")
    assert(got(Some(10.0)) == ((Some(9.55), true)), "high tail clamps down")
    assert(got(Some(5.0)) == ((Some(5.0), false)), "middle untouched")
    assert(got(None) == ((None, false)), "NULL passes through unflagged")
  }
}
