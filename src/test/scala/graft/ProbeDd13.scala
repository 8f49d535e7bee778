package graft

import org.apache.spark.sql.functions._

/** Dev probe for dd13: the tx-embedding cosine distribution of the
  * LEXICAL (jaccard >= 0.8) near-dup pairs per SF — sets dd13's semantic
  * threshold and its gate floor against measurement.
  */
object ProbeDd13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val lex = graft.operators.Dedup.ngramJaccardPairs(docs, "text", 3, 0.8)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      val m = graft.llm.TinyTransformer()
      val embedUdf = udf((t: String) => m.embed(t))
      val emb = docs.repartition(8)
        .select(col("doc_id"), embedUdf(col("text")).as("e"))
      val cosExpr = graft.functions.cosineSimilarityF(col("ea"), col("eb"))
      val stats = lex
        .join(emb.select(col("doc_id").as("id_a"), col("e").as("ea")), "id_a")
        .join(emb.select(col("doc_id").as("id_b"), col("e").as("eb")), "id_b")
        .select(cosExpr.as("c"))
        .agg(count(lit(1)), min(col("c")), avg(col("c"))).head()
      println(f"PROBEDD13 $sf n=${stats.getLong(0)} " +
        f"minCos=${stats.getDouble(1)}%.4f avgCos=${stats.getDouble(2)}%.4f")
      val sem = graft.operators.Dedup.embeddingCosinePairsLsh(
        emb.select(col("doc_id").as("vec_id"), col("e").as("embedding")),
        0.93, m.dim)
      println(s"PROBEDD13 $sf semPairs93=" + sem.count())
      // centered: lexical-pair cosine floor + background volume
      val cent = graft.operators.Similarity.centerEmbeddings(
        emb.select(col("doc_id").as("vec_id"), col("e").as("embedding")))
      val ce = cent.select(col("vec_id"), col("embedding"))
      val cstats = lex
        .join(ce.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
        .join(ce.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
        .select(cosExpr.as("c"))
        .agg(count(lit(1)), min(col("c")), avg(col("c"))).head()
      println(f"PROBEDD13 $sf CENTERED n=${cstats.getLong(0)} " +
        f"minCos=${cstats.getDouble(1)}%.4f avgCos=${cstats.getDouble(2)}%.4f")
      val sem08 = graft.operators.Dedup.embeddingCosinePairsLsh(cent, 0.8, m.dim)
        .select(col("id_a"), col("id_b"))
      val hit = lex.join(sem08, Seq("id_a", "id_b"), "left_semi").count()
      println(s"PROBEDD13 $sf CENTERED lexRecall@0.8=" + hit + "/" + lex.count())
    }
    spark.stop()
  }
}
