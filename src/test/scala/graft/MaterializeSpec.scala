package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Materialize}

/** Reliable-checkpoint mode for the driver fixed-point loops: with
  * `spark.graft.checkpointDir` set, Materialize routes through
  * `checkpoint(dir)` (fault-tolerant, survives executor loss) instead of
  * `localCheckpoint`; results must be identical either way.
  */
class MaterializeSpec extends AnyFunSuite {

  private lazy val spark = SparkSuite.spark

  private def components(): Map[Long, Long] = {
    import spark.implicits._
    // two components: a 4-chain {1,2,3,4} and a pair {10, 11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    // smallGraphEdges = 0: the subject is the distributed loop's per-round
    // materialization, which the driver union-find fast path never touches
    Dedup.connectedComponents(pairs, smallGraphEdges = 0)
      .as[(Long, Long)].collect().toMap
  }

  test("reliable checkpoint(dir) mode: same labels, files in the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    spark.conf.set(Materialize.ConfKey, dir)
    try {
      val got = components()
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L))
      // the checkpoint actually landed in the configured directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("default mode (no conf): localCheckpoint path, same labels") {
    assert(spark.conf.getOption(Materialize.ConfKey).isEmpty)
    assert(components() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }
}
