package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Every curation stage fires on an engineered corpus: language gate,
  * stopword-quality gate, exact prefix dedup, near-dup component keeper
  * selection. (On the driver's synthetic corpus the near-dup stage is
  * data-vacuous at sf0.01 — prefix dedup already removes the lookalikes —
  * so this spec is where the stage's keeper semantics are pinned.)
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val en = "the cat and the dog sat in the house of it is that warm sun"
  // same shingles as `en` with one tail edit -> jaccard >= 0.5 near-dup
  private val enNear = "the cat and the dog sat in the house of it is that cold rain"
  // > 100 chars so substr(text, 1, 100) collides for docs 6 and 7
  private val sharedPrefix =
    "the quick brown fox jumps over the lazy dog while the rain falls on " +
      "the old wooden bridge in the quiet town"

  test("each gate and both dedup stages change the outcome") {
    val docs = Seq(
      1L -> en, // kept: canonical of the near-dup component
      2L -> enNear, // dropped: near-dup loser (component label = 1)
      3L -> ("der hund und die katze ist nicht ein zu " * 2), // dropped: lang de
      4L -> "alpha beta gamma delta epsilon zeta eta theta", // dropped: und
      5L -> "too few the", // dropped: n_tokens < 5
      6L -> (sharedPrefix + " morning air feels crisp today"),
      7L -> (sharedPrefix + " evening light fades away slowly"),
      // 6 and 7 share their (>100-char) prefix -> exact dedup keeps 6; the
      // shared prefix is unrelated to `en`, so 6 is NOT a near-dup of 1
      8L -> ("plain words with zero stop markers " * 3) // dropped: und (no markers)
    ).toDF("doc_id", "text")
    val kept = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("lshPrefilter=true curates identically when banding recall is 1.0") {
    val docs = Seq(
      1L -> en, 2L -> enNear,
      3L -> ("der hund und die katze ist nicht ein zu " * 2),
      4L -> "alpha beta gamma delta epsilon zeta eta theta",
      5L -> "too few the",
      6L -> (sharedPrefix + " morning air feels crisp today"),
      7L -> (sharedPrefix + " evening light fades away slowly"),
      8L -> ("plain words with zero stop markers " * 3)
    ).toDF("doc_id", "text")
    val exact = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    val lsh = Curation.curate(docs, lshPrefilter = true)
      .select("doc_id").as[Long].collect().toSet
    assert(lsh == exact,
      "the LSH-prefiltered near-dup stage must keep the same docs here")
  }

  test("funnel report: per-stage counts match hand-count and curate()") {
    val docs = Seq(
      1L -> en,                 // survives everything
      2L -> enNear,             // lang+gate pass; near-dup loser
      3L -> ("der hund und die katze ist nicht ein zu " * 2), // fails lang
      4L -> "alpha beta gamma delta epsilon zeta eta theta",  // fails lang (und)
      5L -> "too few the",      // lang en, fails min-tokens
      6L -> (sharedPrefix + " morning air feels crisp today"),
      7L -> (sharedPrefix + " evening light fades away slowly") // exact-dup loser
    ).toDF("doc_id", "text")
    val f = Curation.funnelReport(docs).collect().head
    assert(f.getAs[Long]("n_total") == 7L)
    assert(f.getAs[Long]("n_lang_pass") == 5L)  // 1,2,5,6,7
    assert(f.getAs[Long]("n_gate_pass") == 4L)  // 5 drops on min-tokens
    assert(f.getAs[Long]("n_exact_keep") == 3L) // 7 drops on shared prefix
    assert(f.getAs[Long]("n_curated") == 2L)    // 2 drops as near-dup of 1
    // the funnel's terminal count IS curate()'s cardinality
    assert(f.getAs[Long]("n_curated") == Curation.curate(docs).count())
    // one-pass form: same curated rows AND same funnel as the separate calls
    val (curated, funnel) = Curation.curateWithFunnel(docs)
    assert(curated.select("doc_id").as[Long].collect().toSet ==
      Curation.curate(docs).select("doc_id").as[Long].collect().toSet)
    assert(funnel.head() == f)
  }

  test("curate materializes once: returned plan re-scans no source") {
    // The gate + exact-dedup subtree feeds both the near-dup edge set and
    // the final anti-join; curate persists it and checkpoints the curated
    // result, so consuming the returned frame N times costs N cache reads,
    // never a second corpus scan. Pin that: the optimized plan must be a
    // bare (local-checkpoint) scan with no join/aggregate/source-relation
    // left to re-execute.
    val docs = Seq(1L -> en, 2L -> enNear).toDF("doc_id", "text")
    val plan = Curation.curate(docs).queryExecution.optimizedPlan
    val kinds = plan.collect { case n => n.nodeName }.toSet
    assert(!kinds.exists(k => k.contains("Join") || k.contains("Aggregate")),
      s"curate() returned an unmaterialized plan: $kinds")
  }

  test("incremental curation: every drop rule against the existing corpus fires") {
    val existing = Seq(
      100L -> en,
      102L -> (sharedPrefix + " morning air feels crisp today"))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      1L -> enNear, // dropped: near-dup of EXISTING doc 100
      3L -> (sharedPrefix + " evening light fades away slowly"), // dropped: prefix-fp already in existing (102)
      5L -> "it is that the sun and the moon share the sky in the evening of day", // kept: genuinely new
      7L -> "the small ship sails on the wide sea and the wind is of the north",
      9L -> "the small ship sails on the wide sea and the wind is of the south"
      // 7/9 near-dup each other only -> purely-new component keeps min (7)
    ).toDF("doc_id", "text")
    val kept = Curation.curateIncremental(newBatch, existing)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 7L))
  }

  test("incremental curation: lshPrefilter=true drops and keeps identically") {
    // same engineered corpus as the exact-path spec above: the shingle-hash
    // MinHash banding (8x2) must surface BOTH kinds of near-dup pair — the
    // new↔existing contamination edge (1↔100) and the purely-new component
    // (7↔9) — or the curated set diverges from the exact inverted-index form
    val existing = Seq(
      100L -> en,
      102L -> (sharedPrefix + " morning air feels crisp today"))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      1L -> enNear,
      3L -> (sharedPrefix + " evening light fades away slowly"),
      5L -> "it is that the sun and the moon share the sky in the evening of day",
      7L -> "the small ship sails on the wide sea and the wind is of the north",
      9L -> "the small ship sails on the wide sea and the wind is of the south")
      .toDF("doc_id", "text")
    val exact = Curation.curateIncremental(newBatch, existing)
      .select("doc_id").as[Long].collect().toSet
    val lsh = Curation.curateIncremental(newBatch, existing,
        lshPrefilter = true)
      .select("doc_id").as[Long].collect().toSet
    assert(lsh == exact && lsh == Set(5L, 7L))
    // and the persisted-shingle fast path composes with the LSH stage
    val lshPre = Curation.curateIncremental(newBatch, existing,
        existingShingles =
          Some(graft.operators.Dedup.shingleTable(existing)),
        lshPrefilter = true)
      .select("doc_id").as[Long].collect().toSet
    assert(lshPre == exact)
  }

  test("jaccardVerifiedPairsFromShingles == exact pairs on the fixture") {
    import graft.operators.Dedup
    val docs = Seq(
      1L -> en, 2L -> enNear,
      7L -> "the small ship sails on the wide sea and the wind is of the north",
      9L -> "the small ship sails on the wide sea and the wind is of the south",
      12L -> "it is that the sun and the moon share the sky in the evening of day")
      .toDF("doc_id", "text")
    val sh = Dedup.shingleTable(docs)
    val exact = Dedup.ngramJaccardPairsFromShingles(sh, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.jaccardVerifiedPairsFromShingles(sh, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    // subset by construction; equality == banding recall 1.0 here, with
    // identical verified jaccard values on every surviving pair
    assert(lsh == exact)
  }

  test("incremental curation: precomputed existing shingles == recompute path") {
    import graft.operators.Dedup
    val existing = Seq(100L -> en,
      102L -> (sharedPrefix + " morning air feels crisp today"))
      .toDF("doc_id", "text")
    val batch = Seq(
      1L -> enNear,
      5L -> "it is that the sun and the moon share the sky in the evening of day")
      .toDF("doc_id", "text")
    val recompute = Curation.curateIncremental(batch, existing)
      .select("doc_id").as[Long].collect().toSet
    val precomputed = Curation.curateIncremental(batch, existing,
        existingShingles = Some(Dedup.shingleTable(existing)))
      .select("doc_id").as[Long].collect().toSet
    assert(recompute == precomputed && recompute == Set(5L))
  }

  test("incremental curation with empty existing == batch curate on the batch") {
    val batch = Seq(1L -> en, 2L -> enNear,
      3L -> "it is that the sun and the moon share the sky in the evening of day")
      .toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val incr = Curation.curateIncremental(batch, empty)
      .select("doc_id").as[Long].collect().toSet
    val full = Curation.curate(batch)
      .select("doc_id").as[Long].collect().toSet
    assert(incr == full)
  }

  test("keeper invariants: kept set is prefix-unique and jaccard-sparse") {
    val docs = Seq(
      10L -> en, 11L -> enNear,
      12L -> "it is that the sun and the moon share the sky in the evening of day")
      .toDF("doc_id", "text")
    val kept = Curation.curate(docs)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(10L) && !ids.contains(11L)) // min-id keeper wins
    assert(ids.contains(12L)) // non-dup survivor untouched
    // output schema is the curated stats row
    assert(kept.columns.toSeq ==
      Seq("doc_id", "lang_pred", "n_tokens", "n_chars", "stopword_ratio"))
    assert(kept.select("lang_pred").as[String].collect().forall(_ == "en"))
  }

  test("DSIR: target-like docs outweigh dissimilar ones, exactly k selected, deterministic") {
    import org.apache.spark.sql.functions.col
    val target = Seq(
      (100L, "the cat sat on the mat and the cat slept"),
      (101L, "a cat and a dog sat on the mat together"))
      .toDF("doc_id", "text")
    // raw pool: two docs sharing the target's n-grams, two disjoint
    val raw = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog sat on the mat"),
      (3L, "quantum flux capacitors oscillate rapidly"),
      (4L, "zebra xylophone quark jabberwocky vortex"))
      .toDF("doc_id", "text")
    val rep = graft.operators.Curation.dsirSelect(raw, target, k = 2)
      .select("doc_id", "log_weight", "selected")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep.size == 4 && rep.values.map(_._2).sum == 2)
    // importance weights: target-overlapping docs strictly above disjoint
    assert(math.min(rep(1L)._1, rep(2L)._1) >
      math.max(rep(3L)._1, rep(4L)._1))
    // k >= pool size selects everything
    val all = graft.operators.Curation.dsirSelect(raw, target, k = 10)
      .select("selected").as[Int].collect()
    assert(all.length == 4 && all.forall(_ == 1))
    // layout-independent: a repartitioned pool yields identical rows
    val rep2 = graft.operators.Curation
      .dsirSelect(raw.repartition(7), target.repartition(3), k = 2)
      .select("doc_id", "log_weight", "selected")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep2 == rep)
    intercept[IllegalArgumentException] {
      graft.operators.Curation.dsirSelect(raw, target, k = 0)
    }
    // a feature-less doc (no tokens) never competes for a slot — even
    // with k >= pool size it stays selected = 0 (weight 0 would otherwise
    // outrank every negative-log-ratio doc)
    val withEmpty = raw.union(Seq((5L, "   "), (6L, "")).toDF("doc_id", "text"))
    val sel = graft.operators.Curation.dsirSelect(withEmpty, target, k = 10)
      .select("doc_id", "selected")
      .as[(Long, Int)].collect().toMap
    assert(sel.size == 6 && sel(5L) == 0 && sel(6L) == 0)
    assert((1L to 4L).forall(sel(_) == 1))
  }

  test("excess-loss: structured docs outrank order-free ones, exactly k, deterministic") {
    import org.apache.spark.sql.functions.col
    // structured docs: word ORDER is perfectly predictable (every bigram
    // deterministic), so the bigram reference crushes the unigram model.
    // noise docs: same unigram profile per doc but every arrangement
    // different, so bigrams spread and the reference gains far less.
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "c d e f g h c d e f g h"),
      (4L, "c e g d f h e c g f d h"),
      (5L, "g c f h d e h f c e g d"),
      (6L, "solo")) // one token: no bigram score, must not compete
      .toDF("doc_id", "text")
    val got = Curation.excessLossSelect(docs, k = 2)
      .select("doc_id", "excess", "selected")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got.contains(6L) && got.size == 5)
    assert(got.values.map(_._2).sum == 2)
    // the two perfectly-ordered docs carry the highest excess and win
    assert(got(1L)._1 == got(2L)._1)
    assert(math.min(got(1L)._1, got(2L)._1) >
      Seq(got(3L)._1, got(4L)._1, got(5L)._1).max)
    assert(got(1L)._2 == 1 && got(2L)._2 == 1)
    // k >= pool: everything with a bigram score selects
    val all = Curation.excessLossSelect(docs, k = 10)
      .select("selected").as[Int].collect()
    assert(all.length == 5 && all.forall(_ == 1))
    // layout independence
    val got2 = Curation.excessLossSelect(docs.repartition(7), k = 2)
      .select("doc_id", "excess", "selected")
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got2 == got)
  }
}
