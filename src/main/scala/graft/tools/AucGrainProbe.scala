package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the histogram-family `grain` parameter (SURVEY §5;
  * the r11 verdict's ask #4): q117's 25×-notch 0.84 exponent is the
  * histogram degenerating on a continuous double domain (|V| ≈ n).
  * This probe times rocAuc over the same shape at a stated grain so
  * the sub-linear regime is MEASURED as a parameter, not argued.
  *
  * Usage: sbt "runMain graft.tools.AucGrainProbe <dir> <grain> [reps]"
  */
object AucGrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val grain = args(1).toDouble
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the q117_auc shape: per-cohort AUC of a score against a
    // click-label over the events table. The score is made genuinely
    // CONTINUOUS (a deterministic per-row epsilon on top of value) so
    // |V| grows with n — the tiled twins replicate `value` verbatim,
    // which would otherwise hold the distinct-value histogram constant
    // across tiers and hide exactly the degeneration this probe
    // exists to measure.
    val obs = graft.Tables.load(spark, dir, "events")
      .select(pmod(col("user_id"), lit(5)).as("cohort"),
        (col("event_type") === "click").cast("int").as("label"),
        (col("value") +
          pmod(xxhash64(col("event_id"), col("user_id")), lit(1000000L))
            .cast("double") / lit(1.0e9)).as("score"))
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.operators.Stats
        .rocAuc(obs, "cohort", "label", "score", grain = grain).count()
      println(f"[aucprobe] grain=$grain rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n keys)")
    }
    spark.stop()
  }
}
