package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization + lineage truncation for driver fixed-point loops
  * (connected components, curation) — the plans there reference their own
  * output several times per round, so un-truncated lineage grows
  * exponentially in rounds and OOMs the driver long before data size
  * matters.
  *
  * Two modes, selected per session by `spark.graft.checkpointDir`:
  *  - unset (default, local/test runs): `localCheckpoint(eager)` — blocks
  *    live on executor storage; fast, but lost if an executor dies.
  *  - set (cluster jobs): reliable `checkpoint(eager)` to that directory —
  *    survives executor loss, the form a multi-hour 100 TB CC job needs
  *    (a lost localCheckpoint block would otherwise force a full job
  *    restart, since truncated lineage cannot recompute).
  *
  * The SparkContext checkpoint dir is set lazily from the conf on first
  * use, so callers only set one session conf, not two.
  */
object Materialize {

  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }
}
