package graft

import org.apache.spark.sql.functions._

/** Dev-only (SCALE.md): measure the batched BPE merge loop against the
  * strictly sequential one — wall time AND driver-synchronized round
  * count for a given vocab size, on a given corpus dir.
  *
  * Usage: sbt "Test/runMain graft.ProbeBpeScale [dir] [numMerges]"
  */
object ProbeBpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSuite.spark
    // dir == "self": train on this repo's own source text — a natural
    // (Zipfian) token-frequency distribution, unlike the synthetic
    // 31-word testdata vocabulary whose uniform counts tie constantly and
    // serialize the exact-bound batching on purpose
    val docs =
      if (dir == "self") {
        import spark.implicits._
        val files = java.nio.file.Files.walk(
            java.nio.file.Paths.get("src/main/scala"))
          .filter(p => p.toString.endsWith(".scala"))
          .toArray.map(_.toString).sorted
        files.zipWithIndex.map { case (p, i) =>
          (i.toLong, new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8"))
        }.toSeq.toDF("doc_id", "text")
      } else spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
    for ((label, cap) <- Seq("sequential" -> 1, "batched" -> 256)) {
      val t0 = System.nanoTime()
      val (merges, rounds) = graft.operators.BpeTrain
        .trainMergesWithRounds(docs, numMerges, maxMergesPerRound = cap)
      val learned = merges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BPE $label: $learned merges in $rounds rounds, $sec%.2f s" +
        f" ($dir, cap=$cap)")
    }
    spark.stop()
  }
}
