package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev probe: scaling behavior of Graph.bfsHops along the dimension
  * that actually grows at 100 TB — the size of the source's connected
  * component. The GenScaleRel tiles shift keys per copy, so a tiled
  * twin is `mult` DISJOINT copies and BFS from one source still walks
  * the 1× component (measured: identical 181-row result at 5×); this
  * probe instead loosens the q80 edge-filter modulus, which multiplies
  * the edges and frontier mass of the ONE component the walk touches.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.BfsProbe 7 3 1"
  */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val mods = if (args.isEmpty) Seq(7, 3, 1) else args.map(_.toInt).toSeq
    val spark = GraftSession.build("bfs-probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mods.foreach { m =>
      val edges = Tables.load(spark, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(m)) === 0)
        .join(Tables.load(spark, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && pmod(col("o_custkey"), lit(20)) === pmod(col("l_suppkey"), lit(20)))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      val ne = edges.count()
      val src = edges.agg(min(col("src")).as("node_id"))
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.operators.Graph.bfsHops(edges, src).count()
        println(f"[bfs-probe] mod=$m%2d edges=$ne%8d rep$rep " +
          f"reached=$n%6d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
