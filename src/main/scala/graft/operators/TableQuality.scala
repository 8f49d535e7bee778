package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational data-quality primitives a 100 TB ingestion runs before
  * anything downstream trusts a drop: rule EXPECTATIONS (the dbt-test /
  * Deequ / Delta-constraints shape) and per-column TABLE STATS (the
  * ANALYZE primitive that feeds CBO join sizing and file-skipping
  * decisions). Both are pure column math over one or two passes, so the
  * whole report — not just the verdict — replays in oracle SQL.
  */
object TableQuality {

  /** One expectation: `name` + a row predicate; a row violates the rule
    * when the predicate is false OR null (SQL three-valued logic would
    * otherwise let a null sneak past a range check silently — the
    * classic constraint-validation bug).
    */
  final case class Rule(name: String, predicate: Column)

  /** Row-rule expectations over one table, FUSED into a single aggregate
    * pass: (rule, n_checked, n_violations, pass) per rule. However many
    * rules, the scan count stays 1 — the property that makes running the
    * whole rulebook on every ingest affordable at corpus scale.
    */
  def expectations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: no rules")
    require(rules.map(_.name).distinct.length == rules.length,
      s"duplicate rule names: ${rules.map(_.name).mkString(",")}")
    val aggs = count(lit(1)).as("__n") +:
      rules.map(r => sum(when(coalesce(r.predicate, lit(false)), 0L)
        .otherwise(1L)).as(s"__v_${r.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r =>
      s"'${r.name}', `__v_${r.name}`").mkString(", ")
    row.select(col("__n"),
      expr(s"stack(${rules.length}, $stacked) AS (rule, n_violations)"))
      .select(col("rule"), col("__n").as("n_checked"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
      .orderBy(col("rule"))
  }

  /** Referential expectation: child keys that do not exist in the parent
    * — one anti-join (broadcast when the parent's keys are small,
    * shuffle otherwise; Catalyst/AQE decide). Same output shape as one
    * [[expectations]] rule so reports union cleanly.
    */
  def referential(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame = {
    val n = child.count()
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .count()
    val spark = child.sparkSession
    import spark.implicits._
    Seq((name, n, orphans, if (orphans == 0L) 1 else 0))
      .toDF("rule", "n_checked", "n_violations", "pass")
  }

  /** Uniqueness expectation: rows beyond the first per key tuple count
    * as violations — one hash aggregate on the key.
    */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "unique: no key columns")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = df.groupBy(keyCols.map(col): _*).count()
      .agg(coalesce(sum(col("count")), lit(0L)).as("n"),
        coalesce(sum(col("count") - 1L), lit(0L)).as("extra"))
      .head()
    val (n, extra) = (agg.getLong(0), agg.getLong(1))
    Seq((name, n, extra, if (extra == 0L) 1 else 0))
      .toDF("rule", "n_checked", "n_violations", "pass")
  }

  /** Quarantine routing — the production shape of [[expectations]]: a
    * single projection tags every row with the comma-joined names of the
    * rules it fails (empty string = clean), then one filter each side
    * splits the flow. Violating rows carry WHY they were quarantined (the
    * dead-letter contract: a re-ingest after a rule fix replays exactly
    * the affected rows), clean rows proceed untouched. Scale shape: one
    * map-only pass, no shuffle — the tag column is a when-chain over the
    * same predicates the report aggregates, so report and routing can
    * never disagree.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "quarantine: no rules")
    require(rules.map(_.name).distinct.length == rules.length,
      s"duplicate rule names: ${rules.map(_.name).mkString(",")}")
    // build the tag from the non-empty parts via array+filter (a plain
    // concat_ws would leave stray separators around passing rules)
    val failedArr = filter(array(rules.map(r =>
      when(coalesce(r.predicate, lit(false)), lit(""))
        .otherwise(lit(r.name))): _*), x => x =!= "")
    val tagged = df.withColumn("failed_rules",
      array_join(failedArr, ","))
    (tagged.filter(col("failed_rules") === "").drop("failed_rules"),
      tagged.filter(col("failed_rules") =!= ""))
  }

  /** Per-column table statistics in ONE aggregate pass: row count, null
    * count, exact distinct count, min and max (rendered as strings so
    * heterogeneous columns share a schema; restrict to types whose
    * string form is engine-portable — integers, dates, strings). The
    * ANALYZE shape: these five numbers per column are what a cost-based
    * optimizer sizes joins with and what a file-skipping planner builds
    * from.
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame =
    tableStatsImpl(df, cols, approxNdv = false, rsd = 0.0)

  /** The 100 TB form of [[tableStats]]: NDV via HyperLogLog++
    * (approx_count_distinct) instead of exact COUNT(DISTINCT). The exact
    * form's N distinct aggregates force an Expand ×(N+1) — at the 60M-row
    * decade probe that was a 360M-row shuffle and 183 s; the sketch form
    * is ONE map-side-combinable pass, no Expand (measured 12× cheaper
    * there). Exact stays the oracle anchor; this is what ANALYZE runs on
    * a corpus, gated by `s16b`'s relative-error bound.
    */
  def tableStatsApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.02): DataFrame =
    tableStatsImpl(df, cols, approxNdv = true, rsd = rsd)

  private def tableStatsImpl(df: DataFrame, cols: Seq[String],
      approxNdv: Boolean, rsd: Double): DataFrame = {
    require(cols.nonEmpty, "tableStats: no columns")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val ndv =
        if (approxNdv) approx_count_distinct(col(c), rsd)
        else count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        ndv.as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `__nulls_$c`, `__ndv_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    row.select(col("__n"), expr(s"stack(${cols.length}, $stacked) " +
        "AS (column_name, n_nulls, ndv, min_value, max_value)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("ndv"), lit(0L)).as("ndv"),
        col("min_value"), col("max_value"))
      .orderBy(col("column_name"))
  }
}
