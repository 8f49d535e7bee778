package graft.llm

/** Hermetic model-backed embedding fixture: a tiny deterministic
  * word-vector model served over the public embeddings-endpoint shape
  * (POST `{model, prompt}` -> `{"embedding": [..]}`), so the
  * [[HttpEmbedder]] -> Spark-task -> M3 integration path runs in every
  * `sbt test` with NO external model server (the container ships none,
  * and the env-gated live test used to cancel).
  *
  * The model is a recorded fixture, not a trained network, but it has
  * the one property the test needs a MODEL for and that the default
  * hashing-TF embedder structurally lacks: semantically-related surface
  * forms (cat/kitten, sat/sits, mat/rug) share a direction, so a
  * paraphrase with ZERO token overlap still scores high while unrelated
  * text scores near zero. Vectors: per-word cluster vector (cluster
  * axis + a small word-unique component), function words near-zero,
  * unknown words a deterministic hash direction; sentence embedding =
  * mean pool, L2-normalized — the standard sentence-transformer pooling
  * (reference: evaluate/evaluate_summaries_semantic.py:128-139).
  */
object FixtureEmbedServer {

  val Dim = 16

  private def axis(i: Int, scale: Double = 1.0): Array[Double] = {
    val v = new Array[Double](Dim)
    v(i) = scale
    v
  }

  private def cluster(ax: Int, uniq: Int): Array[Double] = {
    val v = axis(ax)
    v(8 + (uniq % 8)) = 0.15 // word-unique wiggle, same cluster direction
    v
  }

  /** The recorded vocabulary: three content clusters + finance terms +
    * near-zero function words.
    */
  private val Vocab: Map[String, Array[Double]] = Map(
    "cat" -> cluster(0, 0), "kitten" -> cluster(0, 1),
    "feline" -> cluster(0, 2), "cats" -> cluster(0, 3),
    "sat" -> cluster(1, 0), "sitting" -> cluster(1, 1),
    "sits" -> cluster(1, 2), "sit" -> cluster(1, 3),
    "mat" -> cluster(2, 0), "rug" -> cluster(2, 1),
    "carpet" -> cluster(2, 2),
    "revenue" -> cluster(3, 0), "quarterly" -> cluster(4, 0),
    "percent" -> cluster(5, 0), "grew" -> cluster(6, 0),
    "profit" -> cluster(3, 1),
    "alpha" -> cluster(0, 4), "beta" -> cluster(1, 4),
    "gamma" -> cluster(2, 4),
    "the" -> axis(15, 0.05), "a" -> axis(15, 0.05),
    "an" -> axis(15, 0.05), "on" -> axis(15, 0.05),
    "is" -> axis(15, 0.05), "of" -> axis(15, 0.05),
    "upon" -> axis(15, 0.05))

  /** Unknown word: deterministic hash direction (identical text must
    * embed identically; distinct unknowns should not collide with the
    * recorded clusters).
    */
  private def hashVec(tok: String): Array[Double] = {
    val h = scala.util.hashing.MurmurHash3.stringHash(tok, 7)
    val v = new Array[Double](Dim)
    v(8 + math.floorMod(h, 8)) = if (((h >>> 16) & 1) == 0) 0.7 else -0.7
    v
  }

  def embed(text: String): Array[Double] = {
    val toks = Option(text).getOrElse("").toLowerCase
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    val acc = new Array[Double](Dim)
    toks.foreach { t =>
      val v = Vocab.getOrElse(t, hashVec(t))
      var i = 0
      while (i < Dim) { acc(i) += v(i); i += 1 }
    }
    val norm = math.sqrt(acc.map(x => x * x).sum)
    if (norm > 0) acc.map(_ / norm) else acc
  }

  /** Start the fixture server, run `f` with the endpoint URL, stop it. */
  def withServer[T](f: String => T): T = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/embeddings",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val prompt = mapper.readTree(exchange.getRequestBody)
          .get("prompt").asText
        val resp = mapper.createObjectNode()
        val arr = resp.putArray("embedding")
        embed(prompt).foreach(arr.add)
        val bytes = resp.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        exchange.getResponseHeaders.add("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/embeddings")
    finally server.stop(0)
  }
}
