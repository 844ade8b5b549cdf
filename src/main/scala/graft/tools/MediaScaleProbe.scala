package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

/** Scaling probe for the AUDIO/VIDEO near-dup family (dev tool, not
  * part of the driver contract) — the r14 verdict's #6: P11i/P11j had
  * no GenScale rows, so their exponents were asserted, not measured.
  * Times, at the given SF dir (base or a [[GenScale]] output):
  *
  *  - audio_pairs: [[Multimodal.audioHashPairs]] over the audio slice
  *    + planted re-ingests (the multimodal_audiodup shape);
  *  - audio_edges: [[Multimodal.hashDedupEdges]] over the same
  *    fingerprints (the keep path);
  *  - video_pairs: [[Multimodal.videoNearDupPairs]] (complete
  *    relation, the reporting surface);
  *  - video_edges: [[Multimodal.videoDedupEdges]] (the linear keep
  *    path);
  *  - video_edges_flood: video_edges with 1,000 EXTRA copies of one
  *    clip's text planted — the flood case the linear path exists
  *    for; a healthy run stays within ~2× of video_edges while the
  *    complete relation would add ~500k pairs.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.MediaScaleProbe [--reps N]"
  */
object MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.sliding(2).collectFirst {
      case Array("--reps", n) => n.toInt
    }.getOrElse(3)
    val spark = GraftSession.build("mediascale")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("text"))

    def planted(mod: Int) = docs
      .filter(pmod(col("doc_id"), lit(30)) === mod)
      .withColumn("doc_id", col("doc_id") + lit(999999L))
    val audio = docs.unionByName(planted(1))
    val video = docs.unionByName(planted(2))
    // flood: 1,000 re-crawls of ONE video doc (distinct ids, same
    // text → byte-identical synthesized clip); +2000001 ≡ 0 (mod 3)
    // and the 3·i stride keep every copy on the video slice
    val oneClip = docs.filter(pmod(col("doc_id"), lit(3)) === 2).limit(1)
    val flood = video.unionByName(
      oneClip.crossJoin(spark.range(1, 1001).select(col("id")))
        .select((col("doc_id") + lit(2000001L) + col("id") * lit(3L))
          .as("doc_id"), col("text")))

    val probes: Seq[(String, () => Long)] = Seq(
      "audio_pairs" -> (() =>
        Multimodal.audioHashPairs(audio, maxHamming = 3).count()),
      "audio_edges" -> (() => Multimodal.hashDedupEdges(
        Multimodal.audioFingerprint(audio).localCheckpoint(),
        maxHamming = 3).count()),
      "video_pairs" -> (() => Multimodal.videoNearDupPairs(
        video, stride = 10, maxHamming = 3, minMatches = 1).count()),
      "video_edges" -> (() => Multimodal.videoDedupEdges(
        video, stride = 10, maxHamming = 3).count()),
      "video_edges_flood" -> (() => Multimodal.videoDedupEdges(
        flood, stride = 10, maxHamming = 3).count()))

    probes.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        val t0 = System.nanoTime()
        val n = fn()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"[mediascale] $name%-18s min-of-$reps $best%7.2f s " +
        f"(${times.head._2} rows) sf=$d")
    }
    spark.stop()
  }
}
