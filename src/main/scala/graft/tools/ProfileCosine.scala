package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Dev tool: compare all-pairs cosine join shapes at sf0.1 — the
  * conditioned BroadcastNestedLoopJoin (no codegen) vs an
  * unconditioned cross join with the pair filter kept OUT of the join
  * (codegen-able). Prints timings + whether codegen ids appear. */
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile-cosine", 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.load(spark, d, "embeddings")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[cos] $name%-12s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }
    val e = Dedup.normalized(emb)
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
    def score(df: org.apache.spark.sql.DataFrame) = df
      .select(col("a_id"), col("b_id"),
        round(graft.functions.dotp(col("va"), col("vb"))
          / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.44)

    val conditioned = score(a.join(b, col("a_id") < col("b_id")))
    // rand(0) >= 0 is always true but marks the predicate nondeterministic,
    // which bars Catalyst from pushing it into the join condition — the
    // join stays an unconditioned cross (codegen-supported) and the pair
    // filter runs inside the codegen'd consume loop
    val guarded = score(a.crossJoin(b)
      .filter(rand(0) >= 0 && col("a_id") < col("b_id")))
    val control = score(a.crossJoin(b).filter(col("a_id") < col("b_id")))

    println("conditioned plan has codegen id: " +
      conditioned.queryExecution.executedPlan.toString.contains("codegen id"))
    println("guarded plan has codegen id: " +
      guarded.queryExecution.executedPlan.toString.contains("codegen id"))
    conditioned.count() // warmup
    time("conditioned") { conditioned.count() }
    time("guarded") { guarded.count() }
    time("control") { control.count() }
    spark.stop()
  }
}
