package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.CorpusOps

/** Dev tool: per-round timing of the critique collapse loop to localize
  * pipe_critique's cost (scalar CPU vs driver actions vs shuffle).
  */
object ProfileCritique {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[critique] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val cfg = Pipelines.TestCfg
    val strategies = Pipelines.strategies()
    val docs = Pipelines.docs(spark, sfDir)

    // replicate mapReduceCritique's phases with timing
    val chunks = CorpusOps.chunkDocs(docs, cfg)
    val summarizeUdf = udf((t: String) =>
      if (t == null) "" else graft.llm.ExtractiveSummarizer.summarize(t, cfg.maxSummaryTokens))
    val mapped = chunks
      .withColumn("text", summarizeUdf(col("text")))
      .withColumn("n_tokens", graft.functions.tokenCount(col("text")))
      .select("doc_id", "chunk_idx", "text", "n_tokens")

    var cur = mapped.persist(StorageLevel.MEMORY_AND_DISK)
    val halfBudget = math.max(cfg.tokenMax / 2, 1).toLong
    def overDocsOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("doc_id").agg(sum("n_tokens").as("t"))
        .filter(col("t") > halfBudget).select("doc_id")
    var overDocs = overDocsOf(cur).persist(StorageLevel.MEMORY_AND_DISK)
    var overCount = time("round 0: map + overcount")(overDocs.count())
    println(s"[critique] over-budget docs after map: $overCount")
    var round = 0
    val judge = graft.llm.CoverageJudge()
    val critUdf = udf { (source: String) =>
      if (source == null) ""
      else {
        val summarize = graft.llm.ExtractiveSummarizer.prepared(source)
        val crit = judge.preparedCritique(source)
        var budget = cfg.maxSummaryTokens
        var s = summarize(budget)
        var it = 0
        while (it < cfg.maxCritiqueIterations &&
               !crit(s).contains(graft.llm.Judge.NoIssues)) {
          budget = budget + math.max(budget / 2, 1)
          s = summarize(budget)
          it += 1
        }
        s
      }
    }
    while (round < cfg.maxCollapseRounds && overCount > 0) {
      val over = cur.join(overDocs, Seq("doc_id"), "left_semi")
      val under = cur.join(overDocs, Seq("doc_id"), "left_anti")
      val collapsed = CorpusOps.concatBins(CorpusOps.binPack(over, cfg.tokenMax).toDF())
        .select(col("doc_id"), col("bin").cast("int").as("chunk_idx"),
          critUdf(col("text")).as("text"))
        .withColumn("n_tokens", graft.functions.tokenCount(col("text")))
        .select("doc_id", "chunk_idx", "text", "n_tokens")
      val next = under.unionByName(collapsed).persist(StorageLevel.MEMORY_AND_DISK)
      val nextOver = overDocsOf(next).persist(StorageLevel.MEMORY_AND_DISK)
      overCount = time(s"round ${round + 1}: collapse + overcount")(nextOver.count())
      println(s"[critique] over-budget docs: $overCount")
      cur.unpersist(); overDocs.unpersist()
      cur = next; overDocs = nextOver
      round += 1
    }
    val fin = cur.groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("chunk_idx"), col("text")))),
        s => s.getField("text")), "\n\n").as("text"))
      .select(col("doc_id"), critUdf(col("text")).as("summary"))
    time("final reduce + noop write")(
      fin.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
