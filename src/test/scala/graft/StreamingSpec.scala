package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{SessionEvent, SessionedEvent}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("sessionize carries state across micro-batches (streaming mode)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: two events 10 min apart -> one session
      input.addData(SessionEvent(1L, 1L, us(0)), SessionEvent(1L, 2L, us(10)))
      q.processAllAvailable()
      // batch 2: 20 min after the last event -> SAME session (state carried);
      // then a 90-min gap -> new session
      input.addData(SessionEvent(1L, 3L, us(30)), SessionEvent(1L, 4L, us(120)))
      q.processAllAvailable()
      val got = spark.table("sessions_out").as[SessionedEvent].collect()
        .map(e => e.event_id -> e.session_id).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    } finally q.stop()
  }

  test("sessionize batch mode matches the window-cumsum formulation") {
    import spark.implicits._
    val events = Seq(
      SessionEvent(1L, 1L, us(0)), SessionEvent(1L, 2L, us(10)),
      SessionEvent(1L, 3L, us(120)), // 110-min gap -> session 2
      SessionEvent(2L, 4L, us(5))).toDS()
    val got = EventStreams.sessionize(events, 30).collect()
      .map(e => (e.user_id, e.event_id) -> e.session_id).toMap
    assert(got == Map((1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 2L, (2L, 4L) -> 1L))
  }

  test("windowedAgg over a stream: tumbling hour windows, exact sums") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedAgg(df, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      input.addData((t(1, 10), "click", 1.5), (t(1, 40), "click", 2.5), (t(2, 5), "view", 4.0))
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("win.start").cast("string"), col("event_type"), col("n"), col("total_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(got == Set(
        ("2026-01-01 01:00:00", "click", 2L, 4.0),
        ("2026-01-01 02:00:00", "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionWindowAgg: native gap-merge, cross-batch merge, boundary semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionWindowAgg(df, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      // batch 1 opens a session; batch 2's first event is 20 min after the
      // last -> MERGES across the micro-batch boundary (window end
      // extends); the second is EXACTLY 30 min after that -> also merges
      // (inclusive end — the ev2 `> gap` split, pinned here); the third
      // is 30m01s after -> finally a new session
      input.addData((1L, t(1, 0), 1.0), (1L, t(1, 10), 2.0))
      q.processAllAvailable()
      input.addData((1L, t(1, 30), 4.0), (1L, t(2, 0), 8.0),
        (1L, java.sql.Timestamp.valueOf("2026-01-01 02:30:01"), 16.0))
      q.processAllAvailable()
      val got = spark.table("sw_out")
        .select(col("user_id"), col("win.start").cast("string"),
          col("win.end").cast("string"), col("n_events"), col("total_value"))
        .as[(Long, String, String, Long, Double)].collect().toSet
      assert(got == Set(
        (1L, "2026-01-01 01:00:00", "2026-01-01 02:30:00", 4L, 15.0),
        (1L, "2026-01-01 02:30:01", "2026-01-01 03:00:01", 1L, 16.0)))
    } finally q.stop()
  }

  test("dedupStream keeps first occurrence per content hash") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.dedupStream(df, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
      input.addData((t0, 1L, "same"), (t0, 2L, "same"), (t0, 3L, "other"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(got.size == 2)
      assert(got.contains(3L))
      assert(got.intersect(Set(1L, 2L)).size == 1)
    } finally q.stop()
  }

  test("IndexStreams: streamed inverted file == batch build, replay idempotent, servable") {
    import spark.implicits._
    import graft.operators.Similarity
    import graft.streaming.IndexStreams
    import org.apache.spark.sql.DataFrame
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = (0 until 12).map { i =>
      val v = Array.fill(4)(0f); v(i % 4) = 1f; v((i + 1) % 4) = 0.1f * (i % 3)
      (i.toLong, v)
    }
    val all = vecs.toDF("vec_id", "embedding")
    val (batchIdx, cs) = Similarity.buildIvfIndex(all, nCells = 4, iterations = 1)
    val root = java.nio.file.Files.createTempDirectory("graft_sia_t").toString
    val appender = new IndexStreams.IvfAppender(cs, s"$root/idx")
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) => appender(b, id) }
      .outputMode("append").start()
    try {
      input.addData(vecs.take(6): _*); q.processAllAvailable()
      input.addData(vecs.drop(6): _*); q.processAllAvailable()
    } finally q.stop()
    def streamedSet() = IndexStreams.readIndex(spark, s"$root/idx")
      .select("vec_id", "cell").as[(Long, Int)].collect().toSet
    // raw row count alongside the set compare: toSet would collapse a
    // duplicated row, hiding exactly the exactly-once defect under test
    def streamedCount() = IndexStreams.readIndex(spark, s"$root/idx").count()
    val want = batchIdx.select("vec_id", "cell").as[(Long, Int)].collect().toSet
    assert(streamedSet() == want && want.size == 12 && streamedCount() == 12L)
    // failure-replay idempotence: rewriting batch 0 under its original
    // batchId (crash between parquet write and offset commit) overwrites
    // its own partition — the index is unchanged, row count included
    appender(vecs.take(6).toDF("vec_id", "embedding"), 0L)
    assert(streamedSet() == want && streamedCount() == 12L)
    // the streamed store serves ivfSearch as-is (drop batch_id is inside
    // readIndex); the identical-vector query tops its own list
    val hits = Similarity.ivfSearch(
        IndexStreams.readIndex(spark, s"$root/idx"), cs,
        Seq((100L, vecs(3)._2)).toDF("query_id", "embedding"), 2, nProbe = 2)
      .orderBy(col("rank")).select("vec_id").as[Long].collect()
    assert(hits.nonEmpty && hits.head == 3L)
  }

  test("StreamObservability: recorder captures every trigger, metrics match ground truth") {
    import spark.implicits._
    import graft.streaming.StreamObservability
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val rec = StreamObservability.attach(spark)
    val q = EventStreams.dedupStream(df, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
      input.addData((t0, 1L, "a"), (t0, 2L, "a"), (t0, 3L, "b"))
      q.processAllAvailable()
      input.addData((t0, 4L, "b"), (t0, 5L, "c"))
      q.processAllAvailable()
      // ring-buffer source: exact accounting — 5 input rows over the
      // data batches, dedup state holds the 3 distinct hashes
      val m = StreamObservability.stateMetrics(spark, q)
        .orderBy("batch_id")
        .select("batch_id", "input_rows", "state_rows")
        .as[(Long, Long, Long)].collect()
      // sums stay exact even though a no-data trigger can REPEAT the
      // last batch_id with 0 input rows (ring-buffer semantics)
      assert(m.map(_._2).sum == 5L)
      assert(m.last._3 == 3L)
      // listener source (async bus): eventually sees the same batches
      val qid = q.id.toString
      def recorded() = rec.snapshot.filter(_.query_id == qid)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (recorded().map(_.input_rows).sum < 5L &&
          System.nanoTime() < deadline) Thread.sleep(50)
      val r = recorded()
      assert(r.map(_.input_rows).sum == 5L)
      assert(r.maxBy(_.batch_id).state_rows == 3L)
      assert(rec.droppedEvents == 0L)
      assert(rec.stateMetrics(spark).columns.toSeq == Seq("query_id",
        "batch_id", "input_rows", "state_operators", "state_rows",
        "state_bytes", "rows_updated", "rows_removed"))
    } finally {
      q.stop()
      StreamObservability.detach(spark, rec)
    }
    // bounded buffer: overflow drops oldest, counts drops, never throws
    val tiny = new StreamObservability.ProgressRecorder(maxEvents = 1)
    intercept[IllegalArgumentException] {
      new StreamObservability.ProgressRecorder(maxEvents = 0)
    }
    assert(tiny.snapshot.isEmpty && tiny.droppedEvents == 0L)
  }

  test("curateStream: gates + prefix dedup over a stream, batch-gate parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // > 100 chars so the docs 1/2 prefix fingerprints collide
    val en = "the cat and the dog sat in the house of it is that warm sun " +
      "while the birds fly over the tall green trees outside"
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = graft.streaming.CorpusStreams.curateStream(df)
      .writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
      input.addData(
        (t0, 1L, en),
        (t0, 2L, en + " x"), // same 100-char window -> prefix dup of 1
        (t0, 3L, "der hund und die katze ist nicht ein zu der hund die katze"),
        (t0, 4L, "it is that the sun and the moon share the sky in the evening"))
      q.processAllAvailable()
      val got = spark.table("curate_out")
      val ids = got.select("doc_id").as[Long].collect().toSet
      assert(ids.intersect(Set(1L, 2L)).size == 1) // one of the prefix dups
      assert(ids.contains(4L) && !ids.contains(3L)) // lang gate drops German
      // stream output schema matches the batch gate columns (minus fp/punct)
      assert(got.columns.toSet ==
        Set("ts", "doc_id", "text", "lang_pred", "n_tokens", "n_chars",
          "stopword_ratio"))
      // batch parity on the gate decision itself
      val batchIds = graft.operators.Curation.gate(
          Seq((1L, en), (3L, "der hund und die katze ist nicht ein zu der hund die katze"),
            (4L, "it is that the sun and the moon share the sky in the evening"))
            .toDF("doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(batchIds == Set(1L, 4L))
    } finally q.stop()
  }

  test("funnelStream: cross-batch state, pre-head step dead, horizon, no-change silence") {
    import spark.implicits._
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{FunnelEvent, FunnelRow}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStream(input.toDS(),
        Seq("view", "click", "purchase"), Some(1000L))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      input.addData(FunnelEvent(1L, "click", 50L), FunnelEvent(1L, "view", 100L),
        FunnelEvent(2L, "purchase", 10L))
      q.processAllAvailable()
      val r1 = spark.table("funnel_out").as[FunnelRow].collect().toSeq
      // pre-view click is dead; headless user 2 emits nothing
      assert(r1 == Seq(FunnelRow(1L, Some(100L), None, None, 1)))
      // later batch advances the funnel from carried state
      input.addData(FunnelEvent(1L, "click", 200L), FunnelEvent(1L, "purchase", 300L))
      q.processAllAvailable()
      assert(spark.table("funnel_out").as[FunnelRow].collect()
        .contains(FunnelRow(1L, Some(100L), Some(200L), Some(300L), 3)))
      // horizon inclusive at t1+h, exclusive one past
      input.addData(
        FunnelEvent(3L, "view", 0L), FunnelEvent(3L, "click", 10L),
        FunnelEvent(3L, "purchase", 1000L),
        FunnelEvent(4L, "view", 0L), FunnelEvent(4L, "click", 10L),
        FunnelEvent(4L, "purchase", 1001L))
      q.processAllAvailable()
      val byUser = spark.table("funnel_out").as[FunnelRow].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.steps_completed)).toMap
      assert(byUser(3L) == FunnelRow(3L, Some(0L), Some(10L), Some(1000L), 3))
      assert(byUser(4L) == FunnelRow(4L, Some(0L), Some(10L), None, 2))
      // a batch that changes nothing emits nothing
      val n = spark.table("funnel_out").count()
      input.addData(FunnelEvent(1L, "view", 999L)) // later view: t1 stays
      q.processAllAvailable()
      assert(spark.table("funnel_out").count() == n)
    } finally q.stop()
  }

  test("ccingest composition: WARC files -> parse -> extract -> gate -> cross-batch dedup") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    import graft.operators.{TextAnalysis, Warc}
    val en = "the cat and the dog sat in the house of it is that warm sun " +
      "while the birds fly over the tall green trees outside"
    val en2 = "it is that the sun and the moon share the sky in the evening " +
      "while the quiet river runs past the old stone bridge below"
    val de = "der hund und die katze ist nicht ein zu der hund die katze " +
      "und der vogel ist nicht ein zu der baum und das haus"
    def wrap(text: String) =
      s"<html><body><p>$text</p><script>var x < 2;</script></body></html>"
    val dir = java.nio.file.Files.createTempDirectory("cci_spec_").toString
    // two separate files -> two micro-batches at maxFilesPerTrigger=1;
    // doc 11 (second file) is an exact extracted-text dup of doc 1
    Warc.buildShards(Seq((1L, wrap(en)), (3L, wrap(de)))
      .toDF("doc_id", "text"), 1).write.mode("append").parquet(dir)
    Warc.buildShards(Seq((11L, wrap(en)), (5L, wrap(en2)))
      .toDF("doc_id", "text"), 1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val blobs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val docs = TextAnalysis.extractHtml(Warc.parseShards(blobs), "text")
      .select(col("doc_id"), col("clean_text").as("text"))
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("doc_id").cast("long")))
    val q = graft.streaming.CorpusStreams.curateStream(docs)
      .writeStream.format("memory").queryName("cci_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cci_out")
      val ids = got.select("doc_id").as[Long].collect().toSet
      // extraction is exact: the gate saw the unwrapped prose
      val texts = got.select("text").as[String].collect().toSet
      assert(texts.subsetOf(Set(en, en2)))
      assert(ids.intersect(Set(1L, 11L)).size == 1) // cross-batch dedup
      assert(ids.contains(5L) && !ids.contains(3L)) // lang gate fires
      // genuinely multi-batch (one file per trigger)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()
  }

  test("stream decontaminator: Bloom + exact verify per batch, batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val clean1 = "completely unrelated material about ships and the wide sea"
    val clean2 = "it is that the sun and the moon share the sky at dusk"
    val dirty = "intro words then the quick brown fox jumps over everything"
    val allRows = Seq((1L, clean1), (2L, dirty), (3L, clean2))
    val batchIds = graft.operators.Dedup.decontaminate(
        allRows.toDF("doc_id", "text"), bench, "text", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(batchIds == Set(1L, 3L))
    // parity at a tight AND a deliberately lossy Bloom sizing: fpp 0.3
    // floods the prefilter with false positives, the exact verify join
    // must remove every one — the kept set is fpp-independent
    for (fpp <- Seq(0.01, 0.3)) {
      val decontam = graft.streaming.CorpusStreams.decontaminator(
        bench, "text", ngramSize = 5, fpp = fpp)
      val got = scala.collection.mutable.Set.empty[Long]
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = decontam(b).select("doc_id").as[Long].collect()
          got.synchronized { got ++= ids }
          ()
        }
        .start()
      try {
        input.addData((1L, clean1), (2L, dirty))
        q.processAllAvailable()
        input.addData((3L, clean2)) // second micro-batch reuses the state
        q.processAllAvailable()
        assert(got.toSet == batchIds,
          s"stream keep-set ${got.toSet} must equal batch $batchIds at fpp $fpp")
      } finally { q.stop(); decontam.close() }
    }
  }

  test("near-dup deduper: cross-batch store drops, replay idempotence, batch parity") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_snd_t_").toString
    val dd = graft.streaming.CorpusStreams.nearDupDeduper(store)
    val keptIds = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id").as[Long].collect().sorted.toSeq
    // batch 0: a dup pair (min id 1 wins) + one distinct doc
    val b0 = Seq(
      (4L, "a b c d e f g h"), (1L, "a b c d e f g h"),
      (2L, "q r s t u v w x")).toDF("doc_id", "text")
    assert(keptIds(dd(b0, 0L)) == Seq(1L, 2L))
    // single-batch == the batch operator (the stream_neardup oracle claim)
    assert(keptIds(dd(b0, 0L)) ==
      keptIds(graft.operators.Dedup.lshDedupGreedy(b0)))
    // batch 1: a dup of batch 0's KEPT doc and of its DROPPED doc both
    // drop (the store holds every seen band key); a new token-disjoint
    // doc is kept (disjoint shingle sets cannot band-collide: equal band
    // keys would need an md5 collision)
    val b1 = Seq(
      (10L, "a b c d e f g h"), (11L, "q r s t u v w x"),
      (12L, "i j k l m n o p")).toDF("doc_id", "text")
    assert(keptIds(dd(b1, 1L)) == Seq(12L))
    // replay batch 1 under the SAME id (crash between store write and
    // sink commit): the snapshot excludes the batch's own keys, so the
    // answer is unchanged — no self-collision, no duplicate drops
    assert(keptIds(dd(b1, 1L)) == Seq(12L))
    // and a LATER batch still sees batch 1's keys exactly once
    val b2 = Seq((20L, "i j k l m n o p"), (21L, "z0 z1 z2 z3 z4 z5 z6 z7"))
      .toDF("doc_id", "text")
    assert(keptIds(dd(b2, 2L)) == Seq(21L))
  }

  test("attributionJoin: stream-stream join, cross-batch state, window bounds") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // offset from epoch 0: a row whose event time EQUALS the initial
    // watermark (1970-01-01T00:00:00) sits exactly on the state-eviction
    // boundary — a fixture artifact, not a semantics case worth pinning
    def ts(min: Long) = new java.sql.Timestamp((100000L + min) * 60000L)
    val pIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val cIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val joined = EventStreams.attributionJoin(
        pIn.toDF().toDF("p_ts", "user_id", "purchase_id"),
        cIn.toDF().toDF("c_ts", "c_user", "click_id"))
      .select("purchase_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // batch 1: clicks only — user 1 at t=0 and t=40, user 2 at t=5
      cIn.addData((ts(0), 1L, 100L), (ts(40), 1L, 101L), (ts(5), 2L, 200L))
      q.processAllAvailable()
      // batch 2: purchase user1@30 joins click@0 (inclusive 30-min edge)
      // but NOT click@40 (future click); CROSS-BATCH — clicks are state
      pIn.addData((ts(30), 1L, 1L))
      q.processAllAvailable()
      // batch 3: purchase@50 joins click@40 only (click@0 outside window);
      // purchase@41 joins click@40 too (fan-in onto one click);
      // user 3 purchase never matches
      pIn.addData((ts(50), 1L, 2L), (ts(41), 1L, 4L), (ts(10), 3L, 3L))
      q.processAllAvailable()
      val got = spark.table("attr_out").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L), (2L, 101L), (4L, 101L)))
    } finally q.stop()
    // batch mode: watermarks no-op, same operator = plain equi+range join
    val pB = Seq((ts(30), 1L, 1L), (ts(50), 1L, 2L))
      .toDF("p_ts", "user_id", "purchase_id")
    val cB = Seq((ts(0), 1L, 100L), (ts(40), 1L, 101L))
      .toDF("c_ts", "c_user", "click_id")
    val batch = EventStreams.attributionJoin(pB, cB)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 100L), (2L, 101L)))
  }

  test("attributionJoinOuter: matched rows emit live, unmatched only past the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp((100000L + min) * 60000L)
    val pIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val cIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val joined = EventStreams.attributionJoinOuter(
        pIn.toDF().toDF("p_ts", "user_id", "purchase_id"),
        cIn.toDF().toDF("c_ts", "c_user", "click_id"),
        watermarkDelay = "10 minutes")
      .select($"purchase_id", $"click_id")
    val q = joined.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      // batch 1: user1's purchase@30 matches click@20; user3's purchase@30
      // matches nothing — its null row must NOT emit yet (a click could
      // still arrive inside watermark+window)
      cIn.addData((ts(20), 1L, 100L))
      pIn.addData((ts(30), 1L, 1L), (ts(30), 3L, 3L))
      q.processAllAvailable()
      val early = spark.table("attr_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(early == Set((1L, Some(100L))),
        s"unmatched row leaked before the watermark: $early")
      // batch 2: far-future rows push the watermark past purchase@30's
      // match horizon -> the unmatched purchase flushes with a null click
      cIn.addData((ts(500), 9L, 900L))
      pIn.addData((ts(500), 9L, 9L))
      q.processAllAvailable()
      val late = spark.table("attr_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(late.contains((3L, None)),
        s"unmatched purchase never flushed after watermark advance: $late")
    } finally q.stop()
    // batch mode: plain left outer equi+range join
    val pB = Seq((ts(30), 1L, 1L), (ts(30), 3L, 3L))
      .toDF("p_ts", "user_id", "purchase_id")
    val cB = Seq((ts(20), 1L, 100L)).toDF("c_ts", "c_user", "click_id")
    val batch = EventStreams.attributionJoinOuter(pB, cB)
      .select($"purchase_id", $"click_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(batch == Set((1L, Some(100L)), (3L, None)))
  }

  test("attribution join state store is watermark-bounded: rows evict as event time advances") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp((100000L + min) * 60000L)
    for (outer <- Seq(false, true)) {
      val pIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
      val cIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
      val p = pIn.toDF().toDF("p_ts", "user_id", "purchase_id")
      val c = cIn.toDF().toDF("c_ts", "c_user", "click_id")
      val joined =
        if (outer) EventStreams.attributionJoinOuter(p, c)
        else EventStreams.attributionJoin(p, c)
      val q = joined.writeStream.format("memory")
        .queryName(s"attr_state_$outer").outputMode("append").start()
      try {
        // 8 waves, each 1000 min of event time apart — far past the
        // 1 h watermark + 30 min window horizon, so every wave's rows
        // become unmatchable (hence evictable) as soon as the next wave
        // advances the watermark. 40 clicks + 10 purchases per wave.
        val waves = 8
        val rowsPerWave = 50L
        val stateRows = (0 until waves).map { w =>
          val base = w * 1000L
          cIn.addData((0 until 40).map(i =>
            (ts(base + i), (i % 7).toLong, w * 100L + i)))
          pIn.addData((0 until 10).map(i =>
            (ts(base + 30 + i), (i % 7).toLong, w * 100L + 90 + i)))
          q.processAllAvailable()
          q.recentProgress.lastOption
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
        }
        // without eviction the store would accumulate ~waves x rowsPerWave
        // (400) rows; the range-bound-derived state watermark must keep it
        // to ~one wave's horizon at any time
        assert(stateRows.max <= 3L * rowsPerWave,
          s"outer=$outer: state grew past the watermark horizon: $stateRows")
        assert(stateRows.last <= 3L * rowsPerWave,
          s"outer=$outer: final state not evicted: $stateRows")
        // and rows were actively REMOVED by eviction, not merely never kept
        val removed = q.recentProgress
          .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
        assert(removed >= (waves - 3L) * rowsPerWave,
          s"outer=$outer: expected most of ${waves * rowsPerWave} state rows" +
            s" removed by the watermark, saw $removed")
      } finally q.stop()
    }
  }

  test("attributionJoinBinned == plain form, inner and outer, across bucket edges") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp((100000L + min) * 60000L)
    // clicks straddle 30-min bucket boundaries; purchase@59 must reach a
    // click@31 in the PREVIOUS bucket (the explode-to-next-bucket path);
    // purchase@60 sits exactly on a boundary; user 3 never matches
    val p = Seq((ts(59), 1L, 1L), (ts(60), 1L, 2L), (ts(30), 2L, 3L),
      (ts(45), 3L, 4L)).toDF("p_ts", "user_id", "purchase_id")
    val c = Seq((ts(31), 1L, 100L), (ts(60), 1L, 101L), (ts(29), 1L, 102L),
      (ts(0), 2L, 200L), (ts(30), 2L, 201L))
      .toDF("c_ts", "c_user", "click_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"purchase_id", $"click_id").as[(Long, Option[Long])]
      .collect().sorted.toSeq
    val plainI = rows(EventStreams.attributionJoin(p, c))
    val binnedI = rows(EventStreams.attributionJoinBinned(p, c))
    assert(plainI.nonEmpty && binnedI == plainI)
    val plainO = rows(EventStreams.attributionJoinOuter(p, c))
    val binnedO = rows(EventStreams.attributionJoinBinned(p, c, outer = true))
    assert(binnedO == plainO)
    assert(plainO.contains((4L, None))) // the outer row survives binning
  }

  test("IndexRebuild appender: rebuild on flag only, replay never re-rebuilds, " +
      "cache follows the pointer") {
    import spark.implicits._
    import graft.operators.{Similarity, Sinks}
    import graft.streaming.{IndexDrift, IndexRebuild}
    val rnd = new java.util.Random(5)
    val base = (0L until 40L)
      .map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val emb = base.toDF("vec_id", "embedding")
    val (cells0, cs0) = Similarity.buildIvfIndex(emb, 4, 2)
    val prof0 = IndexDrift.profile(cells0, cs0)
    val root = java.nio.file.Files.createTempDirectory("idxreb_").toString
    val (snap, store, driftDir) = (s"$root/snap", s"$root/store", s"$root/drift")
    assert(IndexRebuild.publishIndex(cells0, cs0, prof0, -1L, snap) == 0L)
    cells0.write.mode("overwrite").parquet(s"$store/batch_id=-1")
    val app = new IndexRebuild.RebuildingIvfAppender(snap, store, driftDir,
      nCells = 4, iterations = 2)
    // batch 0: same-distribution copies — logged, unflagged, no rebuild
    val clean = base.take(20).map { case (i, e) => (i + 100L, e) }
      .toDF("vec_id", "embedding")
    app(clean, 0L)
    assert(Sinks.currentVersion(snap).contains(0L))
    // batch 1: the uncovered direction — flags and rebuilds to v1
    val ood = IndexDrift.uncoveredDirection(cs0)
    val planted = (0 until 10).map(i => (200L + i, ood))
      .toDF("vec_id", "embedding")
    app(planted, 1L)
    assert(Sinks.currentVersion(snap).contains(1L))
    val v1 = IndexRebuild.loadIndex(spark, snap)
    assert(v1.coveredMaxBatch == 1L)
    assert(v1.cells.count() == 70L) // 40 seed + 20 clean + 10 planted
    // REPLAY batch 1 (crash between publish and offset commit): the
    // batch re-lands against v1 — it may re-flag in the drift log (a
    // single-cell batch skews occupancy TV against any profile) but the
    // rebuild must NOT repeat: v1 already covers it
    app(planted, 1L)
    assert(Sinks.currentVersion(snap).contains(1L))
    val replayRow = IndexRebuild.readDrift(spark, driftDir)
      .filter(col("batch_id") === 1L)
      .select("model_version").as[Long].collect()
    assert(replayRow.toSeq == Seq(1L)) // overwritten, measured against v1
    // a FRESH appender (cold cache) follows the pointer to v1
    val app2 = new IndexRebuild.RebuildingIvfAppender(snap, store, driftDir,
      nCells = 4, iterations = 2)
    val clean2 = base.slice(20, 35).map { case (i, e) => (i + 300L, e) }
      .toDF("vec_id", "embedding")
    app2(clean2, 2L)
    assert(Sinks.currentVersion(snap).contains(1L)) // clean: no rebuild
    val d2 = IndexRebuild.readDrift(spark, driftDir)
      .filter(col("batch_id") === 2L)
      .select("model_version", "drifted").as[(Long, Int)].head()
    assert(d2 == ((1L, 0)))
    // served = v1 cells + the post-rebuild delta, complete and disjoint
    val (served, _) = IndexRebuild.servedIndex(spark, snap, store)
    assert(served.count() == 85L) // 70 covered + 15 delta
    assert(served.select("vec_id").distinct().count() == 85L)
    // pre-swap version stays intact and validating
    assert(IndexRebuild.loadIndex(spark, snap, Some(0L)).cells.count() == 40L)
    // a reader PINNED to v0 serves v0's cells ONLY (a consistent
    // historical read — later store batches were assigned under newer
    // models, so a pinned serve must not mix cell spaces) and returns
    // identical results across re-reads after the swap
    val q0 = base.take(3).map { case (i, e) => (i + 900L, e) }
      .toDF("query_id", "embedding")
    def searchV0() = {
      val (c0, cs0pin) = IndexRebuild.servedIndex(spark, snap, store,
        version = Some(0L))
      assert(c0.count() == 40L) // v0 cells only, no mixed-model delta
      Similarity.ivfSearch(c0, cs0pin, q0, 3, 2)
        .select("query_id", "vec_id", "cosine")
        .as[(Long, Long, Double)].collect().toSet
    }
    val duringV1 = searchV0() // pointer is at v1; the pin overrides it
    assert(duringV1.nonEmpty)
    // and a re-read is stable (v0's files untouched by the publish)
    assert(searchV0() == duringV1)
  }

  test("streamStateGate accounting survives far more than 100 triggers") {
    import spark.implicits._
    // 110 single-file batches (maxFilesPerTrigger = 1): past the
    // recentProgress ring-buffer default of 100 — without the
    // numRecentProgressUpdates pin inside the gate, the early batches'
    // input_rows would vanish from the sum and input_match would
    // false-fail (r11 verdict wrong #2). Duplicated texts keep the
    // dedup-state check meaningful.
    val dir = java.nio.file.Files.createTempDirectory("ssg_many_").toString
    val docs = (0L until 220L).map(i => (i, s"text-${i % 77}"))
      .toDF("doc_id", "text")
    docs.repartition(110).write.mode("overwrite").parquet(dir)
    val nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles == 110, s"expected 110 files, got $nFiles")
    val got = SparkEntry.streamStateGateCore(spark, dir, "*.parquet",
        spark.read.parquet(dir), maxFilesPerTrigger = 1)
      .as[(Int, Int, Int)].head()
    assert(got == ((1, 1, 1)), s"gate flags: $got")
  }

  test("CorpusStreams: file-source map-reduce processes each doc exactly once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("corpus_stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val strategies = Pipelines.strategies()
    def writeWave(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    // wave 1
    writeWave(Seq((1L, "alpha beta gamma delta. epsilon zeta eta theta."),
      (2L, "one two three four five six seven eight.")))
    val schema = spark.read.parquet(in).schema
    val docsStream = graft.streaming.CorpusStreams.readDocStream(spark, in, schema)
    val q1 = graft.streaming.CorpusStreams.mapReducePerBatch(
      docsStream, strategies, out, ckpt)
    q1.awaitTermination()
    // wave 2: only the new doc is processed (checkpoint remembers wave 1)
    writeWave(Seq((3L, "nine ten eleven twelve thirteen fourteen.")))
    val q2 = graft.streaming.CorpusStreams.mapReducePerBatch(
      graft.streaming.CorpusStreams.readDocStream(spark, in, schema),
      strategies, out, ckpt)
    q2.awaitTermination()

    def readOut(): Map[Long, String] = spark.read.parquet(out)
      .select("doc_id", "summary").as[(Long, String)].collect().toMap
    val got = readOut()
    assert(got.keySet == Set(1L, 2L, 3L)) // each doc exactly once
    assert(got.values.forall(_.nonEmpty))
    // batch and streaming runs agree per doc
    val batch = strategies.mapReduce(
      spark.read.parquet(in)).as[(Long, String)].collect().toMap
    assert(got == batch)

    // Failure-replay idempotence: re-running a batch under its original
    // batchId (what the engine does after a crash between parquet write and
    // offset commit) overwrites that batch's partition — no duplicates.
    val wave2 = Seq((3L, "nine ten eleven twelve thirteen fourteen."))
      .toDF("doc_id", "text")
    graft.streaming.CorpusStreams.writeSummaryBatch(
      strategies.mapReduce(wave2), out, batchId = 1L)
    assert(readOut() == got)
  }

  test("IndexDrift: uncovered direction is orthogonal, clean batches " +
      "stay unflagged, planted batch flags") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val emb = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat))).toDF(
      "vec_id", "embedding")
    val (assigned, cs) =
      graft.operators.Similarity.buildIvfIndex(emb, 4, 2)
    val prof = graft.streaming.IndexDrift.profile(assigned, cs)
    assert(prof.meanDist > 0 && prof.p95Dist >= prof.meanDist)
    assert(math.abs(prof.cellShare.values.sum - 1.0) < 1e-9)
    // orthogonality: |cos(ood, c)| ~ 0 for every centroid
    val ood = graft.streaming.IndexDrift.uncoveredDirection(cs)
    cs.foreach { c =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      c.indices.foreach { i =>
        dot += c(i) * ood(i); na += c(i) * c(i); nb += ood(i) * ood(i)
      }
      assert(math.abs(dot) / math.sqrt(na * nb) < 1e-5)
    }
    // a clean re-draw of the SAME distribution does not flag
    val clean = graft.operators.Similarity.ivfAssign(
      emb.filter($"vec_id" % 2 === 0), cs)
    val dClean = graft.streaming.IndexDrift.batchDrift(clean, cs, prof, 0L)
    assert(dClean.drifted == 0, s"clean batch flagged: $dClean")
    // the planted uncovered-direction batch flags on BOTH signals
    val planted = graft.operators.Similarity.ivfAssign(
      (0 until 50).map(i => (1000L + i, ood)).toDF("vec_id", "embedding"),
      cs)
    val dBad = graft.streaming.IndexDrift.batchDrift(planted, cs, prof, 1L)
    assert(dBad.drifted == 1 && dBad.mean_dist > prof.p95Dist &&
      dBad.occ_tv > 0.5, s"planted batch not flagged: $dBad")
    // empty batch: zero row, unflagged
    val dEmpty = graft.streaming.IndexDrift.batchDrift(
      clean.filter(lit(false)), cs, prof, 2L)
    assert(dEmpty.n == 0L && dEmpty.drifted == 0)
  }

  test("SnapshotIngest.commitBatch: versions accrete by link+append, replay is a no-op") {
    import spark.implicits._
    import graft.operators.Sinks
    import graft.streaming.SnapshotIngest
    val root = java.nio.file.Files.createTempDirectory("graft_ssi_spec_")
    val snap = s"$root/snap"
    val b0 = (1L to 50L).map(i => (i, i * 2L)).toDF("doc_id", "n_chars")
    val b1 = (51L to 80L).map(i => (i, i * 2L)).toDF("doc_id", "n_chars")
    val v0 = SnapshotIngest.commitBatch(b0, 0L, snap, s"$root/sc",
      statCols = Seq("doc_id"))
    assert(v0.contains(0L))
    val v1 = SnapshotIngest.commitBatch(b1, 1L, snap, s"$root/sc",
      statCols = Seq("doc_id"))
    assert(v1.contains(1L))
    // replays of BOTH already-committed ids are no-ops (a retry after a
    // crash between publish and checkpoint commit, and a stale restart)
    assert(SnapshotIngest.commitBatch(b1, 1L, snap, s"$root/sc2",
      statCols = Seq("doc_id")).isEmpty)
    assert(SnapshotIngest.commitBatch(b0, 0L, snap, s"$root/sc2",
      statCols = Seq("doc_id")).isEmpty)
    assert(Sinks.currentVersion(snap).contains(1L))
    // v1 = union; v0 pinned intact; v0's files carried into v1 as links
    val cur = Sinks.readSnapshot(spark, snap, Some(1L))
    assert(cur("data").count() == 80L)
    assert(Sinks.readSnapshot(spark, snap, Some(0L))("data").count() == 50L)
    val v0names = Sinks.committedFilePaths(snap, "data", Some(0L))
      .map(_.replaceAll(".*/", "")).toSet
    val v1names = Sinks.committedFilePaths(snap, "data", Some(1L))
      .map(_.replaceAll(".*/", "")).toSet
    assert(v0names.subsetOf(v1names) && v1names.size > v0names.size)
    // stats accreted: one row per (file, column) over v1's whole file set
    val statFiles = cur("file_stats").select("__file")
      .as[String].collect().toSet
    assert(statFiles == v1names)
    // the batch-id guard survives expiry of old versions
    assert(Sinks.expireVersions(snap, 1) == Seq(0L))
    assert(SnapshotIngest.commitBatch(b0, 1L, snap, s"$root/sc3",
      statCols = Seq("doc_id")).isEmpty)
    assert(SnapshotIngest.commitBatch(b0.limit(1), 2L, snap, s"$root/sc3",
      statCols = Seq("doc_id")).contains(2L))
    assert(Sinks.readSnapshot(spark, snap)("data").count() == 81L)
  }

  test("commitChangelogBatch: file-granular apply, flat merged manifest, replay no-op") {
    import spark.implicits._
    import graft.operators.Sinks
    import graft.streaming.SnapshotIngest
    val root = java.nio.file.Files.createTempDirectory("graft_cdcb_")
    val snap = s"$root/snap"
    def ch(rows: Seq[(Long, String, String)], seq: Long) =
      rows.toDF("doc_id", "op", "text").withColumn("seq", lit(seq))
    // bootstrap 1..100 into 4 range files
    val b0 = ch((1L to 100L).map(i => (i, "insert", s"t$i")), 0L)
    val v0 = SnapshotIngest.commitChangelogBatch(b0, 0L, snap, s"$root/s0",
      "doc_id", Seq("doc_id"), bootstrapPartitions = 4)
    assert(v0.contains(0L))
    assert(Sinks.committedFilePaths(snap, "data", Some(0L)).size == 4)
    // band-local mutation: keys 1-10 only — exactly one file touched,
    // three carried; the commit manifest merges (carried xors + one
    // rewritten file scan) and the validating read proves it
    val b1 = ch(Seq((3L, "update", "T3"), (7L, "delete", "")), 1L)
    val v1 = SnapshotIngest.commitChangelogBatch(b1, 1L, snap, s"$root/s1",
      "doc_id", Seq("doc_id"))
    assert(v1.contains(1L))
    val f0 = Sinks.committedFilePaths(snap, "data", Some(0L))
      .map(_.replaceAll(".*/", "")).toSet
    val f1 = Sinks.committedFilePaths(snap, "data", Some(1L))
      .map(_.replaceAll(".*/", "")).toSet
    assert((f0 intersect f1).size == 3,
      s"band-local mutation must carry 3 of 4 files: ${f0 intersect f1}")
    val got = Sinks.readSnapshot(spark, snap, Some(1L))("data")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.size == 99 && got(3L) == "T3" && !got.contains(7L))
    // pure insert past every range: all files carry, manifest merges
    val b2 = ch(Seq((200L, "insert", "t200")), 2L)
    assert(SnapshotIngest.commitChangelogBatch(b2, 2L, snap, s"$root/s2",
      "doc_id", Seq("doc_id")).contains(2L))
    val f2 = Sinks.committedFilePaths(snap, "data", Some(2L))
      .map(_.replaceAll(".*/", "")).toSet
    assert(f1.subsetOf(f2) && f2.size == f1.size + 1)
    assert(Sinks.readSnapshot(spark, snap)("data").count() == 100L)
    // replays of every committed id are no-ops
    assert(SnapshotIngest.commitChangelogBatch(b1, 1L, snap, s"$root/s3",
      "doc_id", Seq("doc_id")).isEmpty)
    assert(SnapshotIngest.commitChangelogBatch(b2, 2L, snap, s"$root/s3",
      "doc_id", Seq("doc_id")).isEmpty)
    // empty heartbeat batch commits nothing
    assert(SnapshotIngest.commitChangelogBatch(
      ch(Seq.empty, 3L), 3L, snap, s"$root/s3", "doc_id",
      Seq("doc_id")).isEmpty)
    assert(Sinks.currentVersion(snap).contains(2L))
  }
}
