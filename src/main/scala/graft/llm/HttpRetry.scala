package graft.llm

/** Bounded retry with exponential backoff for the HTTP scalar family
  * (F6/M4). Production LLM backends throttle (429) and flap (5xx); the
  * reference rides a single 600 s request with no retry
  * (runners/run_summarization_ollama_mapreduce_hierarchical.py:64-65), so
  * a throttled call there fails the whole case — this is the documented
  * improvement over that behavior, not a semantic deviation.
  *
  * Semantics: up to `maxRetries` re-attempts after the first call, only on
  * retryable outcomes — transport/parse exceptions or HTTP
  * {408, 429, 5xx}. Any other status (200 handled by the caller, 4xx)
  * resolves immediately: a 400 is a malformed request and will be a 400
  * again. Backoff doubles per attempt from `baseBackoffMillis`, capped at
  * 30 s. Sleeping on the executor task thread is deliberate: with dozens
  * of concurrent tasks per executor, a blanket sleep sheds exactly the
  * load the throttled backend asked to be rid of.
  */
private[llm] object HttpRetry {

  def retryable(status: Int): Boolean =
    status == 408 || status == 429 || status >= 500

  /** Run `once` until Right / non-retryable Left / attempts exhausted.
    * `once` signals an HTTP-level failure as Left(status) and may throw on
    * transport failure (both count against `maxRetries`).
    */
  def run[A](maxRetries: Int, baseBackoffMillis: Long)
      (once: () => Either[Int, A]): Option[A] = {
    var attempt = 0
    var out = Option.empty[A]
    var settled = false
    while (!settled) {
      val outcome =
        try once().left.map(s => retryable(s))
        catch { case _: Exception => Left(true) }
      outcome match {
        case Right(a) => out = Some(a); settled = true
        case Left(false) => settled = true
        case Left(true) =>
          if (attempt >= maxRetries) settled = true
          else {
            val sleep = math.min(baseBackoffMillis << attempt, 30000L)
            if (sleep > 0) Thread.sleep(sleep)
            attempt += 1
          }
      }
    }
    out
  }
}
