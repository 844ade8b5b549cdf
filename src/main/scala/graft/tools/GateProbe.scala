package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: measure the raw tolerance/precision/recall quantities
  * behind the r13 gate conversions of the hash-specific keys
  * (q11b/q19b/q20b, dedup_minhash/simhash) so the thresholded booleans
  * ship with wide measured margins. Not part of the contract.
  *
  *   sbt "runMain graft.tools.GateProbe /root/testdata/sf0.001 ..."
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("gate-probe")
    args.foreach { d =>
      val li = Tables.load(spark, d, "lineitem")

      // q11b: HLL relative error per group
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("exact"))
        .select(col("l_returnflag"),
          (abs(col("approx") - col("exact")) / col("exact")).as("rel_err"))
        .orderBy("l_returnflag").collect()
        .foreach(r => println(f"[q11b] $d ${r.getString(0)} rel_err=${r.getDouble(1)}%.4f"))

      // q19b: approx median vs exact p45/p55 bracket
      li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
          expr("percentile(l_extendedprice, 0.45)").as("p45"),
          expr("percentile(l_extendedprice, 0.55)").as("p55"))
        .orderBy("l_returnflag").collect()
        .foreach(r => println(s"[q19b] $d ${r.getString(0)} am=${r.get(1)} p45=${r.get(2)} p55=${r.get(3)} in=${
          r.getDouble(2) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(3)}"))

      // q20b: sample fraction deviation + min-key stability across legs
      val s1 = li.sample(withReplacement = false, 0.1, seed = 42)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n1"), min(col("l_orderkey")).as("k1"))
      val s2 = li.sample(withReplacement = false, 0.1, seed = 42)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n2"), min(col("l_orderkey")).as("k2"))
      val tot = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("nt"))
      s1.join(s2, Seq("l_returnflag")).join(tot, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (abs(col("n1") / col("nt").cast("double") - 0.1)).as("dev"),
          (col("n1") === col("n2") && col("k1") === col("k2")).as("stable"))
        .orderBy("l_returnflag").collect()
        .foreach(r => println(f"[q20b] $d ${r.getString(0)} dev=${r.getDouble(1)}%.4f stable=${r.getBoolean(2)}"))

      // minhash / simhash candidate quality vs exact n-gram Jaccard
      val docs = Tables.load(spark, d, "documents")
      def pr(tag: String, cand: DataFrame, exact: DataFrame): Unit = {
        val c = cand.select("a_id", "b_id").persist()
        val e = exact.select("a_id", "b_id").persist()
        val nC = c.count(); val nE = e.count()
        val nI = c.join(e, Seq("a_id", "b_id")).count()
        println(f"[$tag] $d nC=$nC nE=$nE inter=$nI recall=${if (nE == 0) 1.0 else nI.toDouble / nE}%.3f precision=${if (nC == 0) 1.0 else nI.toDouble / nC}%.3f")
        c.unpersist(); e.unpersist()
      }
      val exact05 = Dedup.ngramJaccardPairs(docs, 0.5)
      pr("minhash@0.5", Dedup.minhashPairs(docs, threshold = 0.5), exact05)
      val exact08 = Dedup.ngramJaccardPairs(docs, 0.8)
      pr("simhash-vs08", Dedup.simhashPairs(docs, maxHamming = 7), exact08)
      pr("simhash-vs05", Dedup.simhashPairs(docs, maxHamming = 7), exact05)
    }
    spark.stop()
  }
}
