package graft

import java.nio.file.{Files, Paths}

/** Dev-only: dump ONE registered query + its oracle entry to outDir so
  * tools/check_oracle.py can compare it in isolation (fast iteration on a
  * new oracle without running the full Verify sweep).
  * Usage: runMain graft.ProbeOne <name> <sfDir> <outDir>
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSuite.spark
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = SparkEntry.oracleSql.get(name)
      .map(v => s"${q(name)}: ${q(v)}").getOrElse("")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), s"{$sql}")
    spark.stop()
  }
}
