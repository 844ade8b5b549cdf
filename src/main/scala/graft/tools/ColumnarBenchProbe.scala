package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool (r13 verdict ask #4): measure the columnar path's win on
  * the TPC-H q01 shape — the one query whose scan-adjacent trio
  * (projection, filter, partial aggregate) the ColumnarRule covers —
  * across scale tiers, flag off vs on. ColumnarSpec proves bit-parity;
  * this records whether the demonstrator is actually FASTER, which
  * bounds what a SIMD/GPU plugin buys on this shape.
  *
  *   sbt "runMain graft.tools.ColumnarBenchProbe /root/testdata/sf0.1 \
  *     target/relgen5 target/relgen25"
  */
object ColumnarBenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("columnar-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    val fn = SparkEntry.queries("q01_agg")
    args.foreach { d =>
      Seq(false, true).foreach { on =>
        spark.conf.set(graft.plans.Columnar.EnabledKey, on.toString)
        val times = (1 to 3).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        spark.conf.unset(graft.plans.Columnar.EnabledKey)
        println(f"[colbench] $d columnar=$on reps=${times.map(t => f"$t%.2f").mkString("/")} min=${times.min}%.2f s")
      }
    }
    spark.stop()
  }
}
