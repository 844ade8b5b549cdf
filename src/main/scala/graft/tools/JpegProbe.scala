package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev tool: measure the JPEG fidelity gate margin (max mean-abs-err
  * across the corpus) and confirm the planted truncation faults. */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("jpeg-probe")
    args.foreach { d =>
      val docs = Tables.load(spark, d, "documents")
      val feats = graft.pipeline.Multimodal
        .jpegDecodedFeatures(docs, tol = 0.0) // tol 0 -> fidelity_ok false everywhere; we read the raw booleans separately below
      val n = feats.count()
      val nBad = feats.filter(!col("decode_ok")).count()
      val nTrunc = feats.filter(col("doc_id") % 89 === 0).count()
      val badIsTrunc = feats.filter(!col("decode_ok"))
        .filter(col("doc_id") % 89 =!= 0).count()
      println(s"[jpeg] $d n=$n quarantined=$nBad planted=$nTrunc offPlan=$badIsTrunc")
      // raw MAE distribution: recompute with the internals
      val recs = graft.pipeline.Multimodal.jpegTable(docs)
        .filter(col("doc_id") % 89 =!= 0)
        .collect()
      var maxMae = 0.0
      recs.foreach { r =>
        val seed = r.getLong(1)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
        val w = img.getWidth; val h = img.getHeight
        val src = {
          val m = graft.pipeline.Multimodal.getClass
            .getDeclaredMethod("lcgBytes", classOf[Long], classOf[Int])
          m.setAccessible(true)
          m.invoke(graft.pipeline.Multimodal, seed.asInstanceOf[AnyRef],
            (w * h).asInstanceOf[AnyRef]).asInstanceOf[Array[Byte]]
        }
        val raster = img.getRaster
        var absErr = 0L
        for (y <- 0 until h; x <- 0 until w)
          absErr += math.abs(raster.getSample(x, y, 0)
            - java.lang.Byte.toUnsignedInt(src(y * w + x)))
        maxMae = maxMae max (absErr.toDouble / (w * h))
      }
      println(f"[jpeg] $d maxMae=$maxMae%.2f over ${recs.length} ok images")
    }
    spark.stop()
  }
}
