package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (VERDICT r9 #7): run registry queries across the decade probe
  * corpora (1x = sf0.1, 10x = /tmp/graft_sf1x, 100x = /tmp/graft_sf100x —
  * see [[ScaleProbeGen]]) and emit the probe table as a machine-diffable
  * JSON artifact, so per-round scale slopes are a checked-in file
  * (SCALEPROBE_r{N}.json) instead of SCALE.md prose.
  *
  * Usage:
  *   sbt "Test/runMain graft.ScaleProbeTable OUT.json q1,q2,... [decades]"
  * `decades` defaults to "1x,10x,100x"; pass e.g. "1x,10x" for entries
  * whose 100x point is a documented skip. Each cell runs the REGISTERED
  * query (SparkEntry.queries) against that corpus dir and forces it with
  * a noop write (the Bench convention), recording seconds and row count.
  */
object ScaleProbeTable {
  private val DecadeDirs = Map(
    "1x" -> "/root/testdata/sf0.1",
    "10x" -> "/tmp/graft_sf1x",
    "100x" -> "/tmp/graft_sf100x")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleProbeTable OUT.json q1,q2,... [decades=1x,10x,100x]")
    val out = args(0)
    val queries = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val decades = args.lift(2).getOrElse("1x,10x,100x")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    decades.foreach(d => require(DecadeDirs.contains(d), s"unknown decade $d"))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("scale-probe-table").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cells = for (q <- queries.toSeq) yield {
      val per = for (d <- decades.toSeq) yield {
        val dir = DecadeDirs(d)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val rows = df.count()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // the Bench block-leak sweep: Materialize-backed queries leave
        // localCheckpoint blocks persisted; across a multi-cell probe run
        // those accumulate until a 100x cell OOMs on execution memory
        // (measured: dd13r-100x died at 8 GB after 21 prior cells, and
        // completes alone) — drop them before the next cell
        spark.sparkContext.getPersistentRDDs
          .foreach(_._2.unpersist(blocking = false))
        println(f"[scale-probe] $q%-30s $d%-5s ${sec}%9.2f s  $rows rows")
        f""""$d":{"sec":$sec%.2f,"rows":$rows}"""
      }
      s""""$q":{${per.mkString(",")}}"""
    }
    val json = s"""{"probes":{${cells.mkString(",")}},""" +
      s""""decade_dirs":{${DecadeDirs.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[scale-probe] wrote $out")
    spark.stop()
  }
}
