package graft

import org.apache.spark.sql.functions._

/** Dev probe: sign-LSH bucket-size distribution and candidate-pair mass
  * for the graph build at a given corpus — sizes the knnGraph bucket cap.
  */
object ProbeGraphBuckets {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf100x"
    val spark = SparkSuite.spark
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val k = operators.Dedup.autoPlanes(n)
    println(s"[pgb] n=$n autoPlanes=$k")
    import graft.functions.vecNormF
    val base = emb.select(col("vec_id").as("id"), col("embedding"),
      vecNormF(col("embedding")).as("norm"))
    val sizes = operators.Similarity.lshBucketed(base, 64, 8, k)
      .groupBy(col("tbl"), col("bkt")).count()
    val stats = sizes.agg(
      count(lit(1)).as("n_buckets"),
      max(col("count")).as("max_sz"),
      expr("percentile_approx(count, array(0.5, 0.9, 0.99), 1000)").as("pct"),
      sum(col("count") * (col("count") - 1) / 2).as("pair_mass_uncapped"),
      sum(when(col("count") <= 1024,
        col("count") * (col("count") - 1) / 2).otherwise(0))
        .as("pair_mass_cap1024"),
      sum(when(col("count") <= 128,
        col("count") * (col("count") - 1) / 2).otherwise(0))
        .as("pair_mass_cap128"),
      sum(when(col("count") > 1024, 1).otherwise(0)).as("over_1024"))
    stats.show(truncate = false)
    spark.stop()
  }
}
