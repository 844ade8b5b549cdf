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

  test("band leg equals prefix leg on the driver er_match shape") {
    // the regime switch must be a PERFORMANCE decision, not a semantic
    // one: on the driver corpus the minhash-band leg's argmax must
    // equal the exact prefix leg's (banding recall ~0.9999 at τ=0.5
    // with r=2/b=32 — a miss here means the constants regressed)
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val dirty = graft.pipeline.TextAnalysis.withTokenDropout(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), dropBp = 800,
        epoch = 2)
      .select(col("doc_id").as("dirty_id"), col("aug_text").as("text"))
    val clean = docs.select(col("doc_id").as("clean_id"), col("text"))
    def run(strategy: String) =
      Linkage.matchEntities(dirty, clean, threshold = 0.5,
          strategy = strategy)
        .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(run("bands") == run("prefix"))
  }

  test("auto strategy stays exact on a saturated vocabulary") {
    // tiny vocabulary → every prefix token is high-df → collision mass
    // blows the per-record budget → auto takes the band leg; the
    // output must still equal the exact leg's argmax
    val words = (1 to 12).map(i => s"w$i")
    def text(seed: Long, n: Int) = (1 to n).map { j =>
      words(((seed * 31 + j * 7) % 12).toInt.abs)
    }.mkString(" ")
    val clean = (0L until 60L).map(i => (i, text(i, 30)))
      .toDF("clean_id", "text")
    val dirty = (0L until 15L).map { i =>
      // dirty copy = clean text with the tail 3 words changed
      (i + 500, text(i, 27) + " zz1 zz2 zz3")
    }.toDF("dirty_id", "text")
    def run(strategy: String) =
      Linkage.matchEntities(dirty, clean, threshold = 0.4,
          strategy = strategy, medianDfThreshold = 2)
        .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(run("auto") == run("prefix"))
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

  test("editDistancePairs: substitutions, INDELS (shifted segments), tiny strings") {
    val rows = Seq(
      (1L, "warehouse"),
      (2L, "warehouze"),   // 1 substitution
      (3L, "warehousse"),  // 1 insertion — later segments SHIFT right
      (4L, "warhouse"),    // 1 deletion — later segments shift left
      (5L, "completely different"),
      (6L, "ab"), (7L, "b"), (8L, "")  // below k+1 segments: fallback
    ).toDF("id", "s")
    val got = Linkage.editDistancePairs(rows, "id", "s", k = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1L && got((1L, 3L)) == 1L && got((1L, 4L)) == 1L)
    assert(got((2L, 3L)) == 2L && got((2L, 4L)) == 2L && got((3L, 4L)) == 2L)
    assert(got((6L, 7L)) == 1L && got((6L, 8L)) == 2L && got((7L, 8L)) == 1L)
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      "the far string matches nothing")
    assert(got.size == 9, s"exactly the true pair set, got ${got.keySet}")
  }

  test("editDistancePairs plan: every join is an equi-join — no cartesian, no BNLJ") {
    // the operator's whole point is avoiding the n² cross join; lock
    // the physical plan so a future refactor can't quietly reintroduce
    // one behind the same answers
    val rows = Seq((1L, "abcdef"), (2L, "abcdxf")).toDF("id", "s")
    val p = graft.operators.Linkage.editDistancePairs(rows, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "segment blocking must stay an equi-join:\n" + p.take(3000))
  }

  test("editDistancePairs: recall 1 vs the brute-force pair set on real prefixes") {
    val docs = graft.Tables
      .load(spark, graft.TestSpark.sf, "documents")
      .select(col("doc_id").as("id"),
        substring(lower(col("text")), 1, 24).as("s"))
    val blocked = Linkage.editDistancePairs(docs, "id", "s", k = 2)
      .select("a_id", "b_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    val d2 = docs.select(col("id").as("b_id"), col("s").as("s2"))
    val brute = docs.join(d2, col("id") < col("b_id"))
      .withColumn("dist", levenshtein(col("s"), col("s2")))
      .filter(col("dist") <= 2)
      .select(col("id"), col("b_id"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == brute,
      s"blocked ${blocked.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "expected planted near-dup prefixes")
  }

  test("editDistancePairs: shared-prefix probe warns, diverse corpus is quiet") {
    // 64 strings sharing a 30-char constant prefix: with k=2 every
    // index segment of the prefix region is identical across the
    // same-length group, so the median segment-key df ≈ group size —
    // the measured degeneracy the scaladoc used to only describe
    val pfx = "customer record id number 30ch"
    val planted = (0 until 64)
      .map(i => (i.toLong, pfx + f"$i%02d")).toDF("id", "s")
    val warned = captureWarnings("graft.operators.Linkage") {
      Linkage.editDistancePairs(planted, "id", "s", k = 2).collect()
    }
    assert(warned.exists(_.contains("low-entropy")),
      s"expected the segment-entropy warning, got: $warned")
    // diverse strings (the q87 shape): median df ~1 → silent
    val diverse = (0 until 64)
      .map(i => (i.toLong, s"doc $i body ${i * 7919} tail ${i * 104729}"))
      .toDF("id", "s")
    val quiet = captureWarnings("graft.operators.Linkage") {
      Linkage.editDistancePairs(diverse, "id", "s", k = 2).collect()
    }
    assert(!quiet.exists(_.contains("low-entropy")))
  }

  /** Capture WARN+ log lines emitted by `loggerName` while `body` runs. */
  private def captureWarnings(loggerName: String)(body: => Unit): Seq[String] = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val app = new AbstractAppender("graft-capture-" + System.nanoTime(),
        null, null, false, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.WARN))
          buf.synchronized { buf += e.getMessage.getFormattedMessage }
    }
    app.start()
    val logger = LogManager.getLogger(loggerName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val prevLevel = logger.getLevel
    logger.addAppender(app)
    logger.setLevel(Level.WARN)
    try body
    finally {
      logger.removeAppender(app); logger.setLevel(prevLevel); app.stop()
    }
    buf.toSeq
  }

  test("editDistancePairs: non-numeric string ids survive the pipeline") {
    // the r9 form cast idCol to long — "Customer#000001"-style ids
    // became NULL and the operator silently returned an EMPTY result;
    // ids now keep their original type end to end
    val rows = Seq(
      ("Customer#000001", "mitchell street 42"),
      ("Customer#000002", "mitchel street 42"), // one deletion
      ("Customer#000003", "completely different text")
    ).toDF("cust", "addr")
    val got = Linkage.editDistancePairs(rows, "cust", "addr", k = 2)
      .select("a_id", "b_id", "dist")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("Customer#000001", "Customer#000002", 1L)))
  }
}
