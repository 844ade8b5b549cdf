package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the theilSen scale legs (SURVEY §5; the r11 verdict's
  * ask): a PLANTED HOT KEY — one third of all event rows land on key 0,
  * the rest spread over 97 keys — so the exact leg's O(n_k²) regime is
  * actually entered at the 5×/25× tiers while the sampled leg must hold
  * a flat exponent under its m(m−1)/2 ≤ maxPairsPerKey bound. The
  * exact leg is only run where its pair mass is affordable (pass
  * `exact` explicitly and a small tier); its probe warning firing on
  * the hot key is part of the contract being demonstrated.
  *
  * Usage: sbt "runMain graft.tools.TheilSenProbe <dir> [sampled|exact] [reps]"
  */
object TheilSenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val strategy = if (args.length > 1) args(1) else "sampled"
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
    val obs = graft.Tables.load(spark, dir, "events")
      .select(
        when(pmod(col("event_id"), lit(3)) === 0, lit(0L))
          .otherwise(pmod(col("event_id"), lit(97)) + 1).as("k"),
        col("ts"), col("value").as("v"))
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val res = graft.operators.Stats
        .theilSen(obs, "k", "ts", "v", strategy = strategy)
      val n = res.count()
      val hot = res.filter(col("k") === 0)
        .select(col("n"), col("n_pairs")).head()
      println(f"[tsprobe] $strategy%s rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"($n keys; hot key n=${hot.getLong(0)} pairs=${hot.getLong(1)})")
    }
    spark.stop()
  }
}
