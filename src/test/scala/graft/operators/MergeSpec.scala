package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("upsert: update, delete, insert, pass-through, delete-of-absent") {
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
    ).toDF("k", "s", "v")
    val changes = Seq(
      (2L, "B", 21.0, "U"),  // update
      (3L, "c", 30.0, "D"),  // delete
      (4L, "d", 40.0, "I"),  // insert
      (9L, "x", 99.0, "D")   // delete of an absent key: no-op
    ).toDF("k", "s", "v", "op")
    val got = Merge.upsert(base, changes, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)))
  }

  test("upsert raises on duplicate change keys instead of fanning out") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val dup = Seq((1L, "x", "U"), (1L, "y", "U")).toDF("k", "s", "op")
    val e = intercept[Exception] {
      Merge.upsert(base, dup, Seq("k")).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
      .contains("duplicate keys"))
    // and the guard can be waived explicitly
    assert(Merge.upsert(base, dup, Seq("k"), requireUniqueKeys = false)
      .count() == 2)
  }

  test("historize: version chain per key, tie broken deterministically") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ch = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 11L, ts("2024-02-01 00:00:00"), "b"),
      (1L, 12L, ts("2024-02-01 00:00:00"), "c"), // same ts → tie on id
      (2L, 20L, ts("2024-03-01 00:00:00"), "z")
    ).toDF("k", "id", "ts", "v")
    val got = Merge.historize(ch, Seq("k"), "ts", Seq("id"))
      .select("k", "id", "valid_to", "is_current")
      .as[(Long, Long, Option[java.sql.Timestamp], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3.map(_.toString), r._4)))
      .toMap
    assert(got((1L, 10L)) == ((Some("2024-02-01 00:00:00.0"), false)))
    assert(got((1L, 11L)) == ((Some("2024-02-01 00:00:00.0"), false)))
    assert(got((1L, 12L)) == ((None, true)))
    assert(got((2L, 20L)) == ((None, true)))
  }

  test("upsert validates the changeset schema") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val bad = Seq((1L, "U")).toDF("k", "op") // missing data column s
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(base, bad, Seq("k"))
    }
    assert(e.getMessage.contains("changeset"))
  }
}
