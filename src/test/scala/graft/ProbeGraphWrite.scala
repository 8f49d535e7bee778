package graft

import org.apache.spark.sql.functions._

/** Dev probe: isolate which GraphAnn stage's plan trips Catalyst's
  * UnionBase.rewriteConstraints under the verify writer's coalesce(1).
  */
object ProbeGraphWrite {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSuite.spark
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def w(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      try {
        df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/pgw/$name")
        println(s"[pgw] $name OK")
      } catch { case e: Throwable =>
        println(s"[pgw] $name FAILED: ${e.getMessage}")
      }
    val g = operators.GraphAnn.knnGraph(emb, 64,
      m = operators.GraphAnn.RegM)
    w("graph")(g)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    w("beam1")(operators.GraphAnn.beamSearch(g, emb, q, 5, rounds = 1))
    w("beam4")(operators.GraphAnn.beamSearch(g, emb, q, 5,
      rounds = operators.GraphAnn.RegRounds))
    w("registered")(SparkEntry.queries("ss13_graph_topk")(spark, dir))
    if (args.length > 1 && args(1) == "nosweep") { spark.stop(); return }
    // operating-point sweep: mean recall@5 per (m, beam, rounds, entry)
    val exact = operators.Similarity.bruteForceTopK(emb, q, 5)
    for ((m, beam, rounds, entry) <- Seq((16, 48, 4, 32))) {
      val gm = operators.GraphAnn.knnGraph(emb, 64, m)
      val rec = operators.Similarity.recallAtK(exact,
          operators.GraphAnn.beamSearch(gm, emb, q, 5, beam, rounds, entry))
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"[pgw] m=$m beam=$beam rounds=$rounds entry=$entry recall=$rec%.3f")
    }
    spark.stop()
  }
}
