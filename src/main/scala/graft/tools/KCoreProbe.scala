package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev probe: peel-round counts and survivor sizes for Graph.kCore on
  * the q63 part co-occurrence graph, across candidate k — picks the
  * operating point (and the oracle's unroll depth) for q68_kcore.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt "runMain graft.tools.KCoreProbe 10 20 30 40"
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val ks = if (args.isEmpty) Seq(10, 20, 30, 40) else args.map(_.toInt).toSeq
    val spark = GraftSession.build("kcore-probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val li = Tables.load(spark, d, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(3)) === 0)
      .select(col("l_orderkey").as("ok"),
        col("l_partkey").cast("long").as("pk"))
    val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
      .filter(col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    println(s"[kcore-probe] distinct canonical edges: " +
      s"${edges.select(least(col("src"), col("dst")), greatest(col("src"), col("dst"))).distinct().count()}")
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val core = graft.operators.Graph.kCore(edges, k)
      val n = core.count()
      println(f"[kcore-probe] k=$k%3d survivors=$n%6d " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
