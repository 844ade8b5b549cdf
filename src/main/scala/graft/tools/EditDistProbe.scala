package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev tool (r13 verdict ask #5): decompose q87_editdist's ~linear 25×
  * exponent into its drivers — candidate-pair mass vs verified-result
  * mass vs wall time — to establish whether the cost is OUTPUT-bound
  * (candidates/results grow ~linearly with the corpus, so ~1.0 is the
  * true floor for an exact-recall join) or a blocking defect. Prints,
  * per tier: index rows, the df-weighted segment bucket statistic,
  * candidate pairs (pre-verify), result pairs, wall seconds.
  *
  *   sbt "runMain graft.tools.EditDistProbe /root/testdata/sf0.1 \
  *     target/sfgen5 target/sfgen25"
  */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("editdist-probe")
    val k = 2
    val k1 = k + 1
    args.foreach { d =>
      val base = Tables.load(spark, d, "documents")
        .select(col("doc_id").as("id"),
          substring(lower(col("text")), 1, 32).as("s"))
        .filter(col("s").isNotNull)
        .localCheckpoint()
      val nDocs = base.count()
      def segStart(iExpr: String, lExpr: String) =
        s"(($iExpr * $lExpr) div $k1)"
      val segLen = (i: String, l: String) =>
        s"(${segStart(s"($i + 1)", l)} - ${segStart(i, l)})"
      val idx = base.select(col("id").as("s_id"), length(col("s")).as("l"),
        explode(expr(
          s"""transform(sequence(0, $k), i -> named_struct(
               'gi', i,
               'sub', substring(s, ${segStart("i", "length(s)")} + 1,
                 ${segLen("i", "length(s)")})))""")).as("seg"))
        .select(col("s_id"), col("l"), col("seg.gi").as("gi"),
          col("seg.sub").as("sub"))
      val wdf = idx.groupBy(col("l"), col("gi"), col("sub"))
        .agg(count(lit(1)).as("df"))
        .agg((sum(col("df") * col("df")).cast("double") / sum(col("df")))
          .as("wdf")).head().getDouble(0)
      val probe = base.select(col("id").as("t_id"),
        explode(expr(
          s"""flatten(flatten(
               transform(sequence(greatest(length(s) - $k, 0), length(s) + $k),
                 L -> transform(sequence(0, $k), i ->
                   filter(
                     transform(sequence(${segStart("i", "L")} - $k,
                         ${segStart("i", "L")} + $k),
                       p -> named_struct('l', L, 'gi', i, 'p', p,
                         'sub', substring(s, p + 1, ${segLen("i", "L")}))),
                     x -> x.p >= 0
                       and x.p + ${segLen("i", "L")} <= length(s))))))"""))
          .as("pr"))
        .select(col("t_id"), col("pr.l").as("l"), col("pr.gi").as("gi"),
          col("pr.sub").as("sub"))
        .distinct()
      val nCand = idx.join(probe, Seq("l", "gi", "sub"))
        .filter(col("s_id") =!= col("t_id"))
        .select(least(col("s_id"), col("t_id")).as("a"),
          greatest(col("s_id"), col("t_id")).as("b"))
        .distinct().count()
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        val nRes = graft.operators.Linkage
          .editDistancePairs(base, "id", "s", k = k).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[editdist] $d n=$nDocs wdf=$wdf%.2f cand=$nCand " +
          f"res=$nRes rep$rep $secs%6.2f s")
      }
    }
    spark.stop()
  }
}
