package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Dev-only: sweep IVF-PQ operating points (ksub / nProbe / shortlist /
  * Lloyd iterations) against the exact ss1 baseline at the driver SFs, to
  * pick the registered ss8 configuration and its recall-gate floor. The
  * corpus is adversarial (near-uniform unit vectors — weak cells AND
  * maximal ADC distortion), so these are worst-case numbers.
  * Usage: runMain graft.ProbeSs8 <sfDir>...
  */
object ProbeSs8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // (ksub, nProbe, shortlist, iterations)
    val configs = Seq(
      (16, 6, 150, 2),  // registered r7 point
      (64, 6, 150, 2),
      (64, 6, 250, 2),
      (64, 8, 250, 2),
      (64, 8, 250, 4),
      (256, 8, 250, 2))
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val exact = Similarity.bruteForceTopK(emb, q, 5)
      for ((ksub, nProbe, shortlist, iters) <- configs) {
        val t0 = System.nanoTime()
        val approx = Pq.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = nProbe,
          m = 8, ksub = ksub, iterations = iters, trainSampleMod = 4,
          shortlist = shortlist)
        val mean = Similarity.recallAtK(exact, approx)
          .agg(avg(col("recall"))).head.getDouble(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE_SS8 $dir%-26s ksub=$ksub%3d nProbe=$nProbe " +
          f"shortlist=$shortlist%3d iters=$iters mean_recall=$mean%.4f ${sec}%.1fs")
      }
    }
    spark.stop()
  }
}
