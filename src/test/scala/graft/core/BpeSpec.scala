package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** F3 exact-tokenizer suite: known-answer greedy merges, trainer
  * determinism, the HF tokenizer.json loader, byte-level coverage, and —
  * the reference behavior this closes (SURVEY §7.4.7, BASELINE.md
  * throughput table's 29 docs -> 118 chunks accounting) — chunk boundaries
  * driven by exact token counts instead of the whitespace proxy.
  */
class BpeSpec extends AnyFunSuite {

  test("known-answer: demo merges reproduce the hand-traced segmentation") {
    val t = Bpe.demo
    // 'the': t+h -> th, th+e -> the (rank 1 beats e-pairs)
    assert(t.encode("the") == Vector("the"))
    // 'thing': th, then i+n -> in, then in+g -> ing
    assert(t.encode("thing") == Vector("th", "ing"))
    // 'mother': th first (rank 0), then th+e (rank 1, beats e+r rank 5),
    // then the+r (rank 25) => m o ther
    assert(t.encode("mother") == Vector("m", "o", "ther"))
    // 'there': th, the, then r+e (rank 7) BEATS the+r (rank 25) => the re
    assert(t.encode("there") == Vector("the", "re"))
    assert(t.count("the thing in the north") == 8)
    assert(t.count("mother there 123 a+b") == 11)
    assert(t.count("") == 0)
    assert(t.count("   \n\t ") == 0)
  }

  test("leftmost-lowest-rank tie-break: 'aaa' under merge (a,a)") {
    val t = new BpeTokenizer(Vector(("a", "a")), Bpe.SimplePretokenizer, byteLevel = false)
    // leftmost occurrence merges first: [aa, a], not [a, aa]
    assert(t.encode("aaa") == Vector("aa", "a"))
    assert(t.encode("aaaa") == Vector("aa", "aa"))
  }

  test("trainer: most-frequent pair first, deterministic ties, merges replay") {
    // corpus engineered so (l,o) is the unique most frequent pair
    val corpus = Seq("low low low lower lowest", "slow slower low")
    val t = Bpe.train(corpus, numMerges = 4, byteLevel = false,
      pretokenRegex = Bpe.SimplePretokenizer)
    assert(t.merges.head == ("l", "o"))
    // training twice is bit-identical (deterministic tie-break)
    val t2 = Bpe.train(corpus, numMerges = 4, byteLevel = false,
      pretokenRegex = Bpe.SimplePretokenizer)
    assert(t.merges == t2.merges)
    // the learned table compresses its own training corpus
    assert(t.count("low lower lowest") < "low lower lowest".replace(" ", "").length)
  }

  test("tokenizer.json loader: vocab + merges, both HF merge encodings") {
    val json =
      """{"version":"1.0","model":{"type":"BPE",
        |  "vocab":{"h":0,"e":1,"l":2,"o":3,"he":4,"ll":5,"hell":6,"hello":7},
        |  "merges":["h e","l l",["he","ll"],["hell","o"]]}}""".stripMargin
    val t = Bpe.fromTokenizerJson(json)
    assert(t.merges == Vector(("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")))
    assert(t.byteLevel)
    assert(t.encode("hello") == Vector("hello"))
    assert(t.encodeIds("hello") == Vector(7))
    assert(t.encodeIds("hell") == Vector(6))
    // unknown symbol surfaces as -1, not silently dropped
    assert(t.encodeIds("z") == Vector(-1))
  }

  test("byte-level mode: every byte is representable; non-ASCII counts by bytes") {
    val t = new BpeTokenizer(Vector.empty, Bpe.Gpt2Pretokenizer, byteLevel = true)
    // no merges: token count = UTF-8 byte count of each pretoken
    assert(t.count("ab") == 2)
    assert(t.count("é") == 2) // 2 UTF-8 bytes
    assert(t.count("tiếng") == 7) // ế is 3 bytes
    // byte mapping is a bijection over 0..255
    assert(Bpe.byteEncoder.distinct.length == 256)
  }

  test("gpt2 pretokenizer: contractions and space-prefixed runs") {
    val t = new BpeTokenizer(Vector.empty, Bpe.Gpt2Pretokenizer, byteLevel = false)
    assert(t.pretokens("I'll go, won't you?") ==
      Vector("I", "'ll", " go", ",", " won", "'t", " you", "?"))
  }

  test("F3 closes the whitespace-proxy deviation: chunk boundaries move") {
    // 40 'words' of 12 chars: whitespace-length says 40 tokens; BPE (no
    // merges, char-level) says 480 — the exact-count chunker must split
    // where the proxy would not. Reference shape: chunk counts are driven
    // by HF token counts (run_full_evaluation_pipeline.py:347-361), which
    // is why BASELINE.md's 29 docs explode to 118 chunks at size 12000.
    val doc = (1 to 40).map(i => f"abcdefghij$i%02d").mkString(" ")
    val noMerge = new BpeTokenizer(Vector.empty, Bpe.SimplePretokenizer, byteLevel = false)
    val byWs = Splitter.recursiveSplit(doc, 60, 6, lengthFn = Text.tokenCount)
    val byBpe = Splitter.recursiveSplit(doc, 60, 6, lengthFn = noMerge.lengthFn)
    assert(byWs.size == 1) // 40 ws-tokens fit one 60-budget chunk
    assert(byBpe.size > 1) // 480 BPE tokens cannot
    assert(byBpe.forall(c => noMerge.count(c) <= 60))
    // every chunk honors the budget in the tokenizer's OWN unit, and
    // the split is loss-bounded: all words survive chunking
    val words = byBpe.flatMap(_.split("\\s+")).toSet
    assert(doc.split("\\s+").toSet.subsetOf(words))
  }

  test("29-docs chunk accounting in the exact-token unit (BASELINE shape)") {
    // 29 deterministic docs, lengths spread like a corpus; chunk at
    // budget 48 BPE tokens with the demo table; expected chunk count per
    // doc derived from an independent greedy re-walk of sentence counts
    val docs = (1 to 29).map { d =>
      (1 to (d % 7) * 12 + 8).map(i => s"sentence $d$i has the thing.").mkString(" ")
    }
    val t = Bpe.demo
    val total = docs.map(doc =>
      Splitter.recursiveSplit(doc, 48, 4, lengthFn = t.lengthFn).size).sum
    val oneEach = docs.count(doc => t.count(doc) <= 48)
    // every doc over budget produced >= ceil(count/48) chunks; totals are
    // stable (pinned) so a tokenizer regression shows up as a count shift
    val expectedMin = docs.map(doc => math.max(1,
      math.ceil(t.count(doc) / 48.0).toInt)).sum
    assert(total >= expectedMin)
    assert(docs.size == 29 && oneEach < 29)
    assert(total == PinnedChunkTotal,
      s"29-doc chunk total drifted: $total != $PinnedChunkTotal")
  }

  // golden total for the 29-doc corpus above — regenerate via the printed
  // value if the demo merge table or splitter semantics change on purpose
  private val PinnedChunkTotal = 427

  test("chunkDocs recursive_bpe: boundaries and n_tokens in the BPE unit") {
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val doc = (1 to 40).map(i => f"abcdefghij$i%02d").mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val cfg = PipelineConfig(chunkSize = 60, chunkOverlap = 6,
      chunker = "recursive_bpe")
    val chunks = graft.operators.CorpusOps.chunkDocs(df, cfg).collect()
    assert(chunks.length > 1) // whitespace proxy would say one chunk
    chunks.foreach { r =>
      val txt = r.getAs[String]("text")
      val n = r.getAs[Long]("n_tokens")
      assert(n == Bpe.demo.count(txt)) // budget unit == boundary unit
      assert(n <= 60)
    }
  }

  test("spark parity: bpeCountUdf equals driver-side counts") {
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val texts = Seq("the thing in the north", "mother there 123 a+b",
      "", "tiếng Việt with mixed 42 tokens!")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.functions.udfs.bpeCountUdf(Bpe.demo)(org.apache.spark.sql.functions.col("text"))
    val rows = df.select(org.apache.spark.sql.functions.col("doc_id"), got.as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i.toLong) == Bpe.demo.count(t), s"doc $i")
    }
  }
}
