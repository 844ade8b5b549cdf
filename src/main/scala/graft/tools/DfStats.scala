package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.pipeline.{Dedup, TextAnalysis}

/** Dev tool: df-distribution stats of the er_match token space —
  * decides which saturation statistic the Linkage regime probe uses.
  * Prints mean/median/p90 df and exact prefix collision mass. */
object DfStats {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("dfstats")
    val docs = Tables.load(spark, d, "documents")
    val dirty = TextAnalysis.withTokenDropout(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), dropBp = 800,
        epoch = 2)
      .select(col("doc_id").as("rid"), col("aug_text").as("text"))
    val clean = docs.select(col("doc_id").as("rid"), col("text"))
    def tok(df: org.apache.spark.sql.DataFrame) =
      df.select(col("rid"), explode(Dedup.shingleHashes(col("text"))).as("h"))
    val dTok = tok(dirty).persist()
    val cTok = tok(clean).persist()
    val dfTab = dTok.select("h").unionAll(cTok.select("h"))
      .groupBy("h").agg(count(lit(1)).as("df")).persist()
    val stats = dfTab.agg(
      count(lit(1)).as("v"), sum("df").as("occ"), avg("df").as("mean"),
      expr("median(df)").as("median"),
      expr("percentile(df, 0.9)").as("p90")).head()
    println(s"[dfstats] $d vocab=${stats.getLong(0)} occ=${stats.getLong(1)} " +
      f"mean=${stats.getDouble(2)}%.1f median=${stats.getDouble(3)}%.1f p90=${stats.getDouble(4)}%.1f")
    // exact prefix collision mass at tau=0.5
    val tauBp = 5000
    def prefixSide(t: org.apache.spark.sql.DataFrame) =
      t.join(dfTab, Seq("h")).groupBy("rid")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"),
          count(lit(1)).as("sz"))
        .withColumn("p", (col("sz") - floor((col("sz") * tauBp + lit(9999))
          / lit(10000.0)) + 1).cast("int"))
        .select(col("rid"), posexplode(slice(col("ord"), lit(1), col("p"))))
        .select(col("rid"), col("col.h").as("h"))
    val mass = prefixSide(dTok).groupBy("h").agg(count(lit(1)).as("nd"))
      .join(prefixSide(cTok).groupBy("h").agg(count(lit(1)).as("nc")), Seq("h"))
      .agg(coalesce(sum(col("nd") * col("nc")), lit(0L))).head().getLong(0)
    val nRec = dirty.count() + clean.count()
    println(s"[dfstats] mass=$mass nRec=$nRec perRecord=${mass / nRec}")
    spark.stop()
  }
}
