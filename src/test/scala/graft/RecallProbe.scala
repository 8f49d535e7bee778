package graft
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      for (name <- Seq("ss2_recall", "ss3_recall", "dd6b_recall")) {
        val rows = SparkEntry.queries(name)(spark, sf).collect()
        println(s"PROBE $sf $name -> " + rows.map(_.toString).mkString(" | "))
      }
    }
    spark.stop()
  }
}
