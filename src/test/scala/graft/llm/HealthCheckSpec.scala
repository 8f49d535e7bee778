package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** S7 backend pre-flight against an in-process stub tags endpoint
  * (reference semantics: run_full_evaluation_pipeline.py:199-233).
  */
class HealthCheckSpec extends AnyFunSuite {

  private def withTagsServer[T](body: String, status: Int = 200)(f: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/tags", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/tags")
    finally server.stop(0)
  }

  private val twoModels =
    """{"models":[{"name":"llama3:8b"},{"name":"qwen2:7b"}]}"""

  test("all required models present -> Right with the available list") {
    withTagsServer(twoModels) { url =>
      assert(HealthCheck.checkBackend(url, Seq("llama3:8b")) ==
        Right(Seq("llama3:8b", "qwen2:7b")))
    }
  }

  test("missing model -> Left naming it") {
    withTagsServer(twoModels) { url =>
      val r = HealthCheck.checkBackend(url, Seq("llama3:8b", "phi3:mini"))
      assert(r.isLeft && r.swap.exists(_.contains("phi3:mini")))
    }
  }

  test("non-200 and unreachable backends -> Left, never a throw") {
    withTagsServer("oops", status = 503) { url =>
      assert(HealthCheck.checkBackend(url, Nil).isLeft)
    }
    assert(HealthCheck.checkBackend(
      "http://127.0.0.1:9/api/tags", Nil, timeoutMillis = 300).isLeft)
  }
}
