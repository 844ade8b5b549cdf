package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class LinkageSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("matchEntities recovers planted truth; sub-threshold stays NULL") {
    val clean = (0L until 20L).map { i =>
      (i, (1 to 40).map(j => s"c${i}tok$j").mkString(" "))
    }.toDF("clean_id", "text")
    // dirty 0..4: clean text with 3 tokens replaced (high sim to source,
    // low to everything else); dirty 99: unrelated → below threshold
    val dirty = ((0L until 5L).map { i =>
      (i + 100, (1 to 40).map(j =>
        if (j % 13 == 0) s"x$j" else s"c${i}tok$j").mkString(" "))
    } :+ ((99L, (1 to 40).map(j => s"zzz$j").mkString(" "))))
      .toDF("dirty_id", "text")
    val out = Linkage.matchEntities(dirty, clean, threshold = 0.5)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (0L until 5L).foreach { i =>
      val (m, s) = out(i + 100)
      assert(m.contains(i), s"dirty ${i + 100} matched $m")
      assert(s.exists(_ >= 0.5))
    }
    assert(out(99L) == ((None, None)), "unrelated record must stay NULL")
  }

  test("matchEntities argmax ties break to the lowest clean id") {
    // two identical clean records: the dirty copy must match the
    // lower id deterministically
    val clean = Seq(
      (7L, (1 to 30).map(j => s"t$j").mkString(" ")),
      (3L, (1 to 30).map(j => s"t$j").mkString(" ")),
      (9L, (1 to 30).map(j => s"other$j").mkString(" "))
    ).toDF("clean_id", "text")
    val dirty = Seq((1L, (1 to 30).map(j => s"t$j").mkString(" ")))
      .toDF("dirty_id", "text")
    val out = Linkage.matchEntities(dirty, clean, threshold = 0.5)
      .as[(Long, Option[Long], Option[Double])].head()
    assert(out._2.contains(3L) && out._3.contains(1.0))
  }
}
