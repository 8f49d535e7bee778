package graft.llm

/** S7: backend pre-flight check (reference:
  * run_full_evaluation_pipeline.py:199-233 — GET `{url}/api/tags`, parse
  * the model list, fail if any required model is missing). Driver-side by
  * design, exactly like the reference: this runs once before a pipeline
  * is submitted, not per task.
  */
object HealthCheck {

  /** Right(available models) when the backend is up and every required
    * model is present; Left(reason) otherwise.
    */
  def checkBackend(
      tagsEndpoint: String,
      requiredModels: Seq[String],
      timeoutMillis: Long = 10000L): Either[String, Seq[String]] =
    try {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
        .build()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(tagsEndpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .GET()
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) Left(s"backend returned ${resp.statusCode()}")
      else {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val names = Vector.newBuilder[String]
        mapper.readTree(resp.body()).path("models").forEach { m =>
          names += m.path("name").asText
        }
        val available = names.result()
        val missing = requiredModels.filterNot(available.contains)
        if (missing.nonEmpty) Left(s"missing models: ${missing.mkString(", ")}")
        else Right(available)
      }
    } catch {
      case e: Exception => Left(s"backend check failed: ${e.getMessage}")
    }
}
