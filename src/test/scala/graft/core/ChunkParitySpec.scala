package graft.core

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Reference chunk-count parity (BASELINE.md throughput table: ds2
  * mapreduce, 29 docs -> 118 chunks).
  *
  * Operating point, from the archived run config
  * (evaluation_results/second_dataset/mapreduce/
  * pipeline_results_20250608_022112.json -> pipeline_info.config):
  * RecursiveCharacterTextSplitter with chunk_size=1200, chunk_overlap=50,
  * token-aware length function (run_full_evaluation_pipeline.py:344-361).
  * NOTE: BASELINE.md's "12000/200" note refers to the older standalone
  * runner (runners/run_summarization_ollama_mapreduce.py:213-217, character
  * split); the 118-chunk figure was produced at 1200/50 token-aware.
  *
  * The ds2 corpus texts are not published (data/doc is absent from the
  * reference repo) and neither is its exact tokenizer, so bit-exact per-doc
  * replication is impossible. What IS checkable: the reference archived
  * per-doc (token_count, chunk_count) for all 29 docs. This spec token-
  * matches 29 synthetic paragraph-structured docs to those counts under our
  * BPE tokenizer, splits at the same 1200/50 token-aware point, and pins
  * the invariants any faithful splitter must reproduce:
  *   - cap: every chunk <= 1200 tokens;
  *   - lower bound: chunks >= ceil(tokens / 1200);
  *   - single-chunk rule: tokens <= 1200 -> exactly 1 chunk;
  *   - packing band: multi-chunk docs average 780..1200 tokens/chunk
  *     (the reference's measured band is 849..1097);
  *   - per-doc parity: within max(1, 5%) — splitting measures length with
  *     [[BpeTokenizer.lengthFnBos]], reproducing the reference's per-piece
  *     special-token inflation (length_function = len(tokenizer.encode(t)),
  *     which counts Llama's BOS per measured piece); with it, every ds2 doc
  *     lands within ±1 chunk and the corpus total is exactly 118;
  *   - corpus total within 5% of the reference's 118 (measured: exact).
  */
class ChunkParitySpec extends AnyFunSuite {

  /** (token_count, chunk_count) per ds2 doc, from
    * results.summarization."llama3.2:3b".processing_details (identical
    * chunk counts across all four models — chunking is model-independent).
    */
  private val ds2: Vector[(Int, Int)] = Vector(
    (9808, 10), (3104, 3), (3962, 4), (2815, 3), (2872, 3), (2673, 3),
    (2120, 2), (1005, 1), (2696, 3), (469, 1), (3604, 4), (2754, 3),
    (843, 1), (1165, 2), (857, 1), (788, 1), (1327, 2), (2194, 2),
    (15654, 15), (14574, 14), (1450, 2), (966, 1), (6795, 8), (7090, 7),
    (10475, 11), (2897, 3), (1888, 2), (4952, 5), (851, 1))

  private val ChunkSize = 1200
  private val Overlap = 50
  private val bpe = Bpe.demo

  private val vocab = Vector(
    "the", "court", "shall", "provide", "under", "article", "person",
    "liable", "contract", "party", "agreement", "state", "law", "decree",
    "within", "days", "notice", "right", "property", "tax", "case",
    "decision", "authority", "pursuant", "regulation", "section", "clause")

  /** Paragraph-structured doc whose BPE token count lands within ~1% of
    * `target`: sentences of 8..14 words (plus a '.' token), grouped 6..9
    * sentences per paragraph.
    */
  private def mkDoc(rng: Random, target: Int): String = {
    val paras = Vector.newBuilder[String]
    var sentences = Vector.newBuilder[String]
    var inPara = 0
    var total = 0
    while (total < target) {
      // near the target, drop to 1-2 word sentences so the overshoot stays
      // within a few tokens (words are multi-token under BPE)
      val n = if (target - total < 60) 1 + rng.nextInt(2) else 8 + rng.nextInt(7)
      val s = Vector.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ") + "."
      total += bpe.count(s)
      sentences += s
      inPara += 1
      if (inPara >= 6 + rng.nextInt(4)) {
        paras += sentences.result().mkString(" ")
        sentences = Vector.newBuilder[String]
        inPara = 0
      }
    }
    val rest = sentences.result()
    if (rest.nonEmpty) paras += rest.mkString(" ")
    paras.result().mkString("\n\n")
  }

  private lazy val results: Vector[(Int, Int, Int, Vector[String])] = {
    val rng = new Random(42)
    ds2.map { case (refTokens, refChunks) =>
      val doc = mkDoc(rng, refTokens)
      val myTokens = bpe.count(doc)
      val chunks = Splitter.recursiveSplit(doc, ChunkSize, Overlap,
        Splitter.DefaultSeparators, bpe.lengthFnBos)
      (refTokens, refChunks, myTokens, chunks)
    }
  }

  test("DIAG per-doc parity table") {
    results.foreach { case (refTokens, refChunks, myTokens, chunks) =>
      info(f"ref($refTokens%6d tok -> $refChunks%2d ch)  mine($myTokens%6d tok -> ${chunks.size}%2d ch)")
    }
    info(s"ds2 total: mine ${results.map(_._4.size).sum} vs ref 118")
  }

  test("fixture docs token-match the reference's per-doc counts") {
    results.foreach { case (refTokens, _, myTokens, _) =>
      val drift = math.abs(myTokens - refTokens) / refTokens.toDouble
      assert(drift <= 0.03, s"fixture drift $myTokens vs $refTokens")
    }
  }

  test("every chunk respects the 1200-token cap under the BOS measure") {
    results.foreach { case (_, _, _, chunks) =>
      chunks.foreach(c => assert(bpe.lengthFnBos(c) <= ChunkSize))
    }
  }

  test("chunk count >= ceil(tokens / chunk_size)") {
    results.foreach { case (_, _, myTokens, chunks) =>
      assert(chunks.size >= math.ceil(myTokens / ChunkSize.toDouble).toInt)
    }
  }

  test("docs at or under one chunk budget produce exactly one chunk") {
    results.foreach { case (_, _, myTokens, chunks) =>
      if (myTokens <= ChunkSize)
        assert(chunks.size == 1, s"$myTokens tokens -> ${chunks.size} chunks")
    }
  }

  test("greedy invariant: non-final chunks fill to within one piece of the cap") {
    // a flush happens only when the next piece would overflow, so every
    // emitted (non-final) chunk carries > chunkSize - largest_piece tokens
    results.foreach { case (_, _, _, chunks) =>
      if (chunks.size > 1) {
        val doc = chunks // paragraphs are the pieces; bound via their max
        val maxPiece = doc.flatMap(_.split("\n\n")).map(bpe.count).max
        chunks.dropRight(1).foreach { c =>
          assert(bpe.count(c) > ChunkSize - maxPiece - 1,
            s"underfilled non-final chunk: ${bpe.count(c)} tokens")
        }
      }
    }
  }

  test("many-chunk packing density stays in the reference band") {
    // docs barely over one budget legitimately average ~total/2 (the
    // reference's 1327-token doc averages 663); the density claim is for
    // docs where packing dominates — the reference's own >=4-chunk docs
    // all land in 849..1044 tokens/chunk
    results.foreach { case (_, _, myTokens, chunks) =>
      if (chunks.size >= 4) {
        val perChunk = myTokens / chunks.size.toDouble
        assert(perChunk >= 780 && perChunk <= ChunkSize,
          s"packing $perChunk tokens/chunk over ${chunks.size} chunks")
      }
    }
  }

  test("per-doc chunk counts match the reference within max(1, 5%)") {
    // the BOS-aware length function (r4 verdict missing-#1) collapsed the
    // band from 25% to: every doc within ±1 chunk of the archived count
    results.foreach { case (refTokens, refChunks, _, chunks) =>
      val tol = math.max(1, math.ceil(refChunks * 0.05).toInt)
      assert(math.abs(chunks.size - refChunks) <= tol,
        s"doc($refTokens tok): ${chunks.size} chunks vs reference $refChunks")
    }
  }

  test("corpus total chunk count within 5% of the reference's 118") {
    // measured with lengthFnBos: exactly 118 (the +1s and -1s of the three
    // ±1 docs cancel); the 5% band is slack for fixture regeneration
    val total = results.map(_._4.size).sum
    assert(math.abs(total - 118) <= 6, s"total chunks $total vs 118")
  }

  test("BOS piece-counting is what makes a sub-cap doc split (the 1165->2 case)") {
    // the reference's 1165-token doc yields 2 chunks at a 1200 cap: its
    // measured length exceeds the cap only because every piece (and the
    // separator) carries the +1 special token. Reproduce the mechanism on
    // a doc of the same token count structured as many short pieces
    // (legal-clause shape): plain counting -> 1 chunk, BOS counting -> 2.
    val rng = new Random(1165)
    val paras = Vector.newBuilder[String]
    var total = 0
    while (total < 1150) {
      val n = 3 + rng.nextInt(4)
      val s = Vector.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ") + "."
      total += bpe.count(s)
      paras += s
    }
    val doc = paras.result().mkString("\n\n")
    val tokens = bpe.count(doc)
    assert(tokens <= ChunkSize, s"fixture overshot: $tokens")
    val plain = Splitter.recursiveSplit(doc, ChunkSize, Overlap,
      Splitter.DefaultSeparators, bpe.lengthFn)
    val bos = Splitter.recursiveSplit(doc, ChunkSize, Overlap,
      Splitter.DefaultSeparators, bpe.lengthFnBos)
    assert(plain.size == 1, s"plain split gave ${plain.size}")
    assert(bos.size == 2, s"BOS split gave ${bos.size}")
  }

  // ------------------------------------------------------------------ ds1
  // The PRODUCTION operating point: ds1 (VN-LongSum) iterative run,
  // chunk_size=12000 / overlap=200 token-aware (old/iterative_refinement/
  // pipeline_results_20250606_062829.json -> pipeline_info.config; 151
  // docs -> 759 chunks). Every 5th doc's archived (token_count,
  // chunk_count), deterministic 31-doc sample to keep the spec fast.
  // Reference behavior at this point: single-chunk docs up to 8881 tokens,
  // multi-chunk from 11411, tokens/chunk band 5706..11816.

  private val ds1Sample: Vector[(Int, Int)] = Vector(
    (28209, 3), (47607, 5), (53896, 5), (4525, 1), (33603, 3), (31375, 3),
    (35479, 4), (41123, 4), (29923, 3), (34799, 3), (42713, 4), (57278, 5),
    (43354, 4), (88795, 8), (81905, 8), (89247, 8), (93602, 9), (89343, 8),
    (81070, 7), (45079, 4), (69001, 6), (98940, 9), (60550, 6), (58494, 5),
    (81676, 7), (56104, 5), (68234, 6), (42996, 4), (22111, 2), (23664, 3),
    (43345, 4))

  private val Ds1ChunkSize = 12000
  private val Ds1Overlap = 200

  private lazy val ds1Results: Vector[(Int, Int, Int, Int)] = {
    val rng = new Random(7)
    ds1Sample.map { case (refTokens, refChunks) =>
      val doc = mkDoc(rng, refTokens)
      val chunks = Splitter.recursiveSplit(doc, Ds1ChunkSize, Ds1Overlap,
        Splitter.DefaultSeparators, bpe.lengthFnBos)
      (refTokens, refChunks, bpe.count(doc), chunks.size)
    }
  }

  test("ds1 production point (12000/200): per-doc chunk counts within max(1, 5%)") {
    ds1Results.foreach { case (refTokens, refChunks, _, myChunks) =>
      val tol = math.max(1, math.ceil(refChunks * 0.05).toInt)
      assert(math.abs(myChunks - refChunks) <= tol,
        s"doc($refTokens tok): $myChunks chunks vs reference $refChunks")
    }
  }

  test("ds1 production point: cap, lower bound, single-chunk rule") {
    ds1Results.foreach { case (_, _, myTokens, myChunks) =>
      assert(myChunks >= math.ceil(myTokens / Ds1ChunkSize.toDouble).toInt)
      if (myTokens <= Ds1ChunkSize) assert(myChunks == 1)
    }
  }

  test("ds1 production point: sampled total within 5% of the reference's") {
    val refTotal = ds1Sample.map(_._2).sum
    val myTotal = ds1Results.map(_._4).sum
    assert(math.abs(myTotal - refTotal) <= refTotal * 0.05,
      s"sampled total $myTotal vs reference $refTotal")
  }
}
