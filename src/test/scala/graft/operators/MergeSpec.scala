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

  test("snapshotDiff: I/U/D classes, null-safe compare, round-trip") {
    val prev = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0),
      (5L, Some("e"), 50.0)
    ).toDF("k", "s", "v")
    val next = Seq(
      (1L, Some("a"), 10.0),             // unchanged → no row
      (2L, Some("B"), 20.0),             // changed value → U
      (3L, None: Option[String], 30.0),  // NULL == NULL → no row
      (4L, None: Option[String], 40.0),  // value → NULL IS a change → U
      (6L, Some("f"), 60.0)              // new key → I; 5 gone → D
    ).toDF("k", "s", "v")
    val diff = Merge.snapshotDiff(prev, next, Seq("k"))
    val got = diff.as[(Long, String, Option[String], Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      2L -> (("U", Some("B"), 20.0)),
      4L -> (("U", None, 40.0)),
      5L -> (("D", Some("e"), 50.0)),
      6L -> (("I", Some("f"), 60.0))))
    // round-trip contract: prev + diff == next
    val replayed = Merge.upsert(prev, diff, Seq("k"))
      .as[(Long, Option[String], Double)].collect().toSet
    val want = next.as[(Long, Option[String], Double)].collect().toSet
    assert(replayed == want)
  }

  test("snapshotDiff rejects mismatched schemas and clashing op column") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, 2.0)).toDF("k", "v")
    assert(intercept[IllegalArgumentException] {
      Merge.snapshotDiff(a, b, Seq("k"))
    }.getMessage.contains("schema"))
    val c = Seq((1L, "x", "U")).toDF("k", "s", "op")
    assert(intercept[IllegalArgumentException] {
      Merge.snapshotDiff(c, c, Seq("k"))
    }.getMessage.contains("op"))
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
