package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{HttpSummarizer, Prompts}
import graft.strategy.Strategies

/** Exercises the HTTP scalar against an in-process stub server (no
  * network egress): the stub implements the generate-endpoint shape and
  * returns a deterministic function of the prompt, so the full
  * chunk -> HTTP map -> collapse -> HTTP reduce pipeline is testable
  * offline, including executor-side client usage inside Spark tasks.
  */
class HttpSummarizerSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def withStubServer[T](f: String => T): T = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/generate", (exchange: com.sun.net.httpserver.HttpExchange) => {
      val req = mapper.readTree(exchange.getRequestBody)
      val prompt = req.get("prompt").asText
      val numPredict = req.get("options").get("num_predict").asInt
      // deterministic "model": echo the first num_predict words after the
      // template preamble, wrapped in a thinking block to test cleaning
      val content = prompt.linesIterator.drop(1).mkString(" ").trim
      val summary = content.split("\\s+").filter(_.nonEmpty).take(numPredict).mkString(" ")
      val resp = mapper.createObjectNode()
      resp.put("response", s"<think>internal</think>$summary")
      val bytes = resp.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/generate")
    finally server.stop(0)
  }

  test("summarize: posts generate-shape request, parses response, cleans thinking tags") {
    withStubServer { url =>
      val s = HttpSummarizer(url, "stub-model")
      val out = s.summarize("alpha beta gamma delta epsilon", 3)
      assert(out == "alpha beta gamma")
      assert(!out.contains("think"))
    }
  }

  test("failure isolation: unreachable endpoint yields empty string, not an exception") {
    val s = HttpSummarizer("http://127.0.0.1:9/api/generate", "m", timeoutMillis = 500)
    assert(s.summarize("anything", 5) == "")
  }

  test("full map-reduce pipeline over the HTTP scalar inside Spark tasks") {
    import spark.implicits._
    withStubServer { url =>
      val strategies = new Strategies(
        HttpSummarizer(url, "stub-model"), cfg = Pipelines.TestCfg)
      val docs = Seq(
        (1L, "one two three. four five six. seven eight nine. ten eleven twelve."),
        (2L, "aa bb cc. dd ee ff."))
        .toDF("doc_id", "text")
      val out = strategies.mapReduce(docs).as[(Long, String)].collect().toMap
      assert(out.keySet == Set(1L, 2L))
      assert(out.values.forall(_.nonEmpty))
      assert(out.values.forall(!_.contains("think")))
    }
  }

  /** Stub that fails the first `failures` calls with `failStatus`, then
    * answers 200 with a fixed response; counts attempts.
    */
  private def withFlakyServer[T](failures: Int, failStatus: Int)
      (f: (String, java.util.concurrent.atomic.AtomicInteger) => T): T = {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/generate", (exchange: com.sun.net.httpserver.HttpExchange) => {
      exchange.getRequestBody.readAllBytes()
      val n = calls.incrementAndGet()
      val (status, body) =
        if (n <= failures) (failStatus, """{"error":"throttled"}""")
        else (200, """{"response":"recovered summary"}""")
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(status, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/generate", calls)
    finally server.stop(0)
  }

  test("retry: 503 twice then 200 — summarizer recovers within its budget") {
    withFlakyServer(failures = 2, failStatus = 503) { (url, calls) =>
      val s = HttpSummarizer(url, "m", maxRetries = 3, backoffMillis = 1L)
      assert(s.summarize("anything", 5) == "recovered summary")
      assert(calls.get == 3) // 2 failures + 1 success, not more
    }
  }

  test("retry: non-retryable 400 gives up after ONE attempt") {
    withFlakyServer(failures = 100, failStatus = 400) { (url, calls) =>
      val s = HttpSummarizer(url, "m", maxRetries = 5, backoffMillis = 1L)
      assert(s.summarize("anything", 5) == "")
      assert(calls.get == 1) // a 400 will be a 400 again — no retry
    }
  }

  test("retry: budget exhausted on persistent 429 — fails isolated, bounded") {
    withFlakyServer(failures = 100, failStatus = 429) { (url, calls) =>
      val s = HttpSummarizer(url, "m", maxRetries = 2, backoffMillis = 1L)
      assert(s.summarize("anything", 5) == "")
      assert(calls.get == 3) // first call + 2 retries
    }
  }

  test("retry: judge critique recovers from a 429 and normalizes the verdict") {
    withFlakyServer(failures = 1, failStatus = 429) { (url, calls) =>
      val j = graft.llm.HttpJudge(url, "m", maxRetries = 2, backoffMillis = 1L,
        passMarkers = Seq(graft.llm.Judge.NoIssues, "recovered"))
      assert(j.critique("sum", "src") == graft.llm.Judge.NoIssues)
      assert(calls.get == 2)
    }
  }

  test("prompt templates fill slots and leave unknown markers intact") {
    val t = Prompts.refine.fill(
      "current_summary" -> "S", "critique" -> "C", "reference_content" -> "R")
    assert(t.contains("S") && t.contains("C") && t.contains("R"))
    assert(!t.contains("{current_summary}"))
    assert(Prompts.map.fill("nope" -> "x").contains("{content}"))
  }
}
