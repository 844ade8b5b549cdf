package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc single-query row dump (dev tool, not part of the driver
  * contract) — for eyeballing gate booleans and small results at an SF
  * the correctness run doesn't cover. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ShowQ q54_profile [maxRows]"
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val maxRows = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = GraftSession.build("showq")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    SparkEntry.queries(name)(spark, d).show(maxRows, truncate = false)
    spark.stop()
  }
}
