package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based file skipping — the OPERATIONAL consumer of the
  * per-partition ANALYZE stats ([[TableQuality.partitionStats]]): what
  * Delta/Iceberg do with file-level min/max in the transaction log
  * instead of parquet footers. A footer-pruning scan still OPENS every
  * file to read its footer; at 100 TB (hundreds of thousands of files on
  * an object store) the listing + footer round-trips dominate a selective
  * scan, so the planner must decide from a STATS TABLE — metadata-scale
  * rows maintained incrementally (the s16c append discipline: new files
  * sketch once, stats merge forever) — and touch only the chosen files.
  *
  * The decision rule is the same box intersection the s13d gate measures
  * from real footers, so "files the stats table chooses" ==
  * "files a footer-pruning planner reads" is itself gate-checkable.
  */
object FileSkipping {

  /** Per-FILE stats rows in ONE scan: [[TableQuality.partitionStats]]
    * grouped by `input_file_name()` — one mergeable row per physical
    * file (`__file` column carries the path). This is the table a
    * lakehouse log keeps per data file; union rows for new files on
    * append, never rescan old ones.
    */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame =
    TableQuality.partitionStats(
      df.withColumn("__file", input_file_name()), "__file", cols)

  /** Stats-driven pruned read over long-keyed range predicates: keep the
    * files whose typed [min, max] intersects [lo, hi] on EVERY listed
    * column (a file missing any range cannot hold a matching row — the
    * conjunctive pruning rule), then read ONLY those paths. The stats
    * scan and the file-list collect are metadata-scale; no unchosen
    * file is opened. Returns the unfiltered union of the chosen files —
    * the caller applies its row predicate on top (pruning is a superset
    * guarantee, files still hold non-matching rows). Empty selection
    * returns an empty frame with the schema read from the stats table's
    * column list being impossible — so the caller passes `schema` for
    * that edge (a fully-pruned scan must not fail).
    */
  def prunedParquet(spark: SparkSession, stats: DataFrame,
      ranges: Seq[(String, Long, Long)],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(ranges.nonEmpty, "prunedParquet: no ranges")
    val keep = ranges.map { case (c, lo, hi) =>
      col(s"__max_$c").cast("long") >= lo &&
        col(s"__min_$c").cast("long") <= hi
    }.reduce(_ && _)
    val files = stats.filter(keep)
      .select(col("__file").cast("string"))
      .collect().map(_.getString(0))
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.toSeq: _*)
  }
}
