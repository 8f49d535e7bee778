package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (JVM-wide; Test/fork
  * runs all suites in a single forked JVM, so getOrCreate dedups).
  */
object SparkSuite {
  private var cached: SparkSession = _

  def spark: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      cached = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      cached.sparkContext.setLogLevel("ERROR")
    }
    cached
  }
}
