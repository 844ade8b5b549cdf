package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the q115 25×-notch diagnosis: runs linkPredict on the
  * tiled co-occurrence graph under different shuffle-partition counts
  * to separate PLAN cost (linear wedge mass, measured) from the
  * fixed-32-partitions spill artifact local[32] introduces at 25×.
  * Usage: sbt "runMain graft.tools.LinkPredProbe <sfDir> <parts1,parts2,...>"
  */
object LinkPredProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val parts = args(1).split(",").map(_.toInt)
    val reps = if (args.length > 2) args(2).toInt else 2
    val bcMb = if (args.length > 3) args(3).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        s"${bcMb * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    parts.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        val li = graft.Tables.load(spark, dir, "lineitem")
          .filter(pmod(col("l_orderkey"), lit(9)) === 0)
          .select(col("l_orderkey").as("ok"),
            col("l_partkey").cast("long").as("pk"))
        val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
          .filter(col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        val t0 = System.nanoTime()
        val n = graft.operators.Graph
          .linkPredict(edges, topN = 50, minCommonNeighbors = 2).count()
        println(f"[lpprobe] parts=$p rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
