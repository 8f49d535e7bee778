package graft

/** Dev-only: print a registered query's output row count (slope probes
  * need output cardinality to separate plan cost from semantic output
  * growth). Usage: runMain graft.ProbeCount <name> <sfDir>
  */
object ProbeCount {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args.take(2)
    val spark = SparkSuite.spark
    println(s"COUNT $name $dir ${SparkEntry.queries(name)(spark, dir).count()}")
    spark.stop()
  }
}
