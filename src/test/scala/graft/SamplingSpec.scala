package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("SP1 assignSplits: total, deterministic, partition-layout-independent") {
    val docs = ids(2000)
    val a = Sampling.assignSplits(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a.size == 2000) // every row assigned exactly one split
    val b = Sampling.assignSplits(docs.repartition(7))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b) // keyed hash, not rand(): layout cannot change splits
    // 0.9/0.05/0.05 within loose tolerance on 2000 draws
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.05)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.03)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.03)
  }

  test("SP1 assignSplits: weights normalize (2x weights => same assignment)") {
    val docs = ids(500)
    val a = Sampling.assignSplits(docs,
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.assignSplits(docs,
      Seq("train" -> 1.0, "test" -> 1.0))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("SP1 assignSplits: append-stable — a doc keeps its split forever") {
    val small = Sampling.assignSplits(ids(100))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val grown = Sampling.assignSplits(ids(5000))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => grown(id) == s })
  }

  test("SP4 componentSplits: near-dup clusters share a split, singletons match SP1") {
    val docs = ids(500)
    // pair graph: {1,2,3} chained, {10,11} — everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Sampling.componentSplits(docs, pairs)
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 500)
    // whole cluster keys on the min id and shares one split
    assert(Seq(1L, 2L, 3L).map(got(_)) == Seq.fill(3)(got(1L)))
    assert(got(1L)._1 == 1L && got(10L) == got(11L) && got(10L)._1 == 10L)
    // singletons are bit-identical to per-doc assignSplits (same seed)
    val sp1 = Sampling.assignSplits(docs,
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    docs.as[Long].collect().filterNot(Set(2L, 3L, 11L)).foreach { id =>
      assert(got(id)._2 == sp1(id), s"doc $id")
    }
    // layout independence
    val got2 = Sampling.componentSplits(docs.repartition(7), pairs.repartition(3))
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got2 == got)
  }

  test("MX1 weightedResample: integer weights copy exactly, 0 drops, frac samples") {
    val docs = ids(400)
    val w = when(col("doc_id") % 4 === 0, 2.0)
      .when(col("doc_id") % 4 === 1, 1.0)
      .when(col("doc_id") % 4 === 2, 0.0)
      .otherwise(0.5)
    val out = Sampling.weightedResample(docs, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy").as("mx"))
      .as[(Long, Long, Int)].collect()
    val byId = out.map(r => r._1 -> (r._2, r._3)).toMap
    // exact-integer weights never roll the fractional extra
    assert((0L until 400L by 4).forall(byId(_) == ((2L, 2))))
    assert((1L until 400L by 4).forall(byId(_) == ((1L, 1))))
    assert((2L until 400L by 4).forall(!byId.contains(_))) // w=0 dropped
    val halves = (3L until 400L by 4).count(byId.contains)
    assert(halves > 20 && halves < 80) // ~50 of 100 at w=0.5
    assert((3L until 400L by 4).filter(byId.contains).forall(byId(_) == ((1L, 1))))
  }

  test("MX1 weightedResample: deterministic across partition layouts") {
    val docs = ids(300)
    val w = lit(1.5)
    val a = Sampling.weightedResample(docs, w)
      .select("doc_id", "copy").as[(Long, Int)].collect().toSet
    val b = Sampling.weightedResample(docs.repartition(11), w)
      .select("doc_id", "copy").as[(Long, Int)].collect().toSet
    assert(a == b)
    assert(a.size > 300 && a.size < 600) // 1.5x: between 1 and 2 copies each
  }

  test("SH1 deterministicShuffle: dense 0..n-1, md5 order, layout-independent") {
    val docs = ids(300)
    val got = Sampling.deterministicShuffle(docs)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq == (0L until 300L)) // dense, no dups
    // matches the single-threaded reference rank over (md5, id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = md.digest(s"epoch0:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (0L until 300L).sortBy(id => (hex(id), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got.forall { case (id, pos) => expected(id) == pos })
    // partition layout cannot change the order
    val b = Sampling.deterministicShuffle(docs.repartition(17))
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toSet
    assert(got.toSet == b)
    // a different epoch seed produces a different permutation
    val e1 = Sampling.deterministicShuffle(docs, seed = "epoch1")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert((0L until 300L).exists(id => e1(id) != expected(id)))
  }

  test("MX2 temperatureMixture: flattening, clamp, determinism, target size") {
    // skewed domains: 'big' 12/16 of rows, 'mid' 3/16, 'tiny' 1/16
    val docs = ids(1600).withColumn("dom",
      when(col("doc_id") % 16 < 12, "big")
        .when(col("doc_id") % 16 < 15, "mid").otherwise("tiny"))
    val out = Sampling.temperatureMixture(docs, col("dom"),
      alpha = 0.5, targetFraction = 0.5)
    val rates = out.groupBy("dom").agg(first(col("keep_rate")).as("r"))
      .as[(String, Double)].collect().toMap
    // alpha<1 flattens: the head domain is cut hardest, the tail clamps at 1
    assert(rates("big") < rates("mid"))
    assert(rates("tiny") == 1.0) // q_tiny*T > n_tiny => keep everything
    val tinyKept = out.filter(col("dom") === "tiny").count()
    assert(tinyKept == 100L) // clamp means ALL tiny rows survive
    // overall size lands near the target fraction
    val n = out.count()
    assert(n > 600 && n < 1000, s"kept $n of 1600 at target 0.5")
    // keyed hash: partition layout cannot change the sample
    val again = Sampling.temperatureMixture(docs.repartition(13), col("dom"),
      alpha = 0.5, targetFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // alpha=1 is proportional sampling: every domain gets the same rate
    val prop = Sampling.temperatureMixture(docs, col("dom"),
      alpha = 1.0, targetFraction = 0.5)
      .groupBy("dom").agg(first(col("keep_rate")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(prop.values.toSet.size == 1)
  }

  test("SP2 stratifiedSample: fraction 1 keeps stratum, default 0 drops rest") {
    val docs = ids(200)
    val stratum = when(col("doc_id") % 2 === 0, "even").otherwise("odd")
    val kept = Sampling.stratifiedSample(docs, stratum, Map("even" -> 1.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 200L by 2).toSet)
    val half = Sampling.stratifiedSample(docs, stratum,
      Map("even" -> 1.0, "odd" -> 0.5)).count()
    assert(half > 120 && half < 180)
  }

  test("MX3 unimaxMixture: water level, epoch cap, budget met, layout-independent") {
    // caps at maxEpochs=2: A 2, B 20, C 20; budget 24. Waterfall:
    // i=1 A: share 24/3=8 > cap 2 -> capped, alloc 2
    // i=2 B: share (24-2)/2=11, cap 20 >= 11 -> s*=11
    // i=3 C: share (24-22)/1=2 would UNDERSHOOT — s* must come from the
    //        FIRST uncapped index, pinning the arg-min-by-i bug class
    // allocs (2, 11, 11): epochs A=2 (cap), B=C=1.1
    val docs = ((0L until 1L).map((_, "A")) ++
      (10L until 20L).map((_, "B")) ++
      (30L until 40L).map((_, "C"))).toDF("doc_id", "dom")
    val got = Sampling.unimaxMixture(docs, col("dom"), budget = 24.0,
      maxEpochs = 2.0)
    val eps = got.select("dom", "target_epochs").distinct()
      .as[(String, Double)].collect().toMap
    assert(eps("A") == 2.0 && eps("B") == 1.1 && eps("C") == 1.1)
    // capped domain: exactly cap copies; fractional: n*1 <= emitted <= n*2
    val byDom = got.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("A") == 2L)
    assert(byDom("B") >= 10L && byDom("B") <= 20L)
    // expectation sums to the budget; the keyed-hash draw is the only noise
    assert(got.count() >= 22L && got.count() <= 26L)
    // budget >= total capacity: every domain at the epoch cap exactly
    val all = Sampling.unimaxMixture(docs, col("dom"), budget = 1000.0,
      maxEpochs = 2.0)
    assert(all.count() == 42L) // 2 * 21 docs
    assert(all.select("target_epochs").distinct().as[Double].collect()
      .toSeq == Seq(2.0))
    // deterministic across partition layouts
    val a = got.select("doc_id", "copy").as[(Long, Int)].collect().sorted.toSeq
    val b = Sampling.unimaxMixture(docs.repartition(7), col("dom"),
        budget = 24.0, maxEpochs = 2.0)
      .select("doc_id", "copy").as[(Long, Int)].collect().sorted.toSeq
    assert(a == b)
  }

  test("SP3 fixedSample: exact size, dense ranks, layout-independent, reference order") {
    val docs = ids(1000)
    val a = Sampling.fixedSample(docs, 50)
      .select("doc_id", "sample_rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(a.length == 50)
    assert(a.map(_._2).toSeq == (1 to 50)) // dense 1-based ranks
    // reference: the 50 smallest md5("sample:<id>") keys, locally computed
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"sample:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (0L until 1000L).sortBy(key).take(50)
    assert(a.map(_._1).toSeq == want)
    // layout cannot change membership or ranks
    val b = Sampling.fixedSample(docs.repartition(7), 50)
      .select("doc_id", "sample_rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(a.toSeq == b.toSeq)
    // n > corpus keeps everything; different seeds pick different sets
    assert(Sampling.fixedSample(ids(30), 50).count() == 30)
    val other = Sampling.fixedSample(docs, 50, seed = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(other != a.map(_._1).toSet)
  }
}
