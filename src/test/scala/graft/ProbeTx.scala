package graft

import org.apache.spark.sql.functions.col

/** Dev probe behind the tx_gate floors and the dc5 scale claim.
  *
  *  1. Prints tx_gate's RAW aggregates (max reversed cosine, near-dup win
  *     rate, determinism min) at sf0.001/0.01/0.1 so the gate's 0.9999 /
  *     0.90 floors are set against measured margins, not hope.
  *  2. Times dc5's semanticDecontamReport with the benchmark side PINNED
  *     to the sf0.1 slice while the corpus scales 1x/10x/100x — the
  *     operator's actual contract (an eval suite does not grow with the
  *     training corpus), so the honest slope is linear-in-corpus; the
  *     registered query's own 100x point (66 s) grows bench WITH corpus
  *     and is quadratic by construction.
  *
  * Usage: sbt "Test/runMain graft.ProbeTx"
  */
object ProbeTx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val r = SparkEntry.txGateStats(spark, s"/root/testdata/$sf").head()
      println(f"PROBETX gate $sf bad_self=${r.getInt(0)} " +
        f"max_rev=${r.getDouble(1)}%.4f nd_rate=${r.getDouble(2)}%.4f " +
        f"det_min=${r.getInt(3)} n=${r.getLong(4)}")
    }
    val bench = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .filter(col("vec_id") % 17 === 0)
    for ((label, dir) <- Seq(
        "1x" -> "/root/testdata/sf0.1/embeddings.parquet",
        "10x" -> "/tmp/graft_sf1x/embeddings.parquet",
        "100x" -> "/tmp/graft_sf100x/embeddings.parquet")) {
      if (new java.io.File(dir.stripSuffix("/embeddings.parquet")).exists()) {
        val corpus = spark.read.parquet(dir).filter(col("vec_id") % 17 =!= 0)
        val t0 = System.nanoTime()
        graft.operators.Dedup.semanticDecontamReport(corpus, bench, 0.45)
          .write.mode("overwrite").format("noop").save()
        println(f"PROBETX dc5_fixed_bench $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
