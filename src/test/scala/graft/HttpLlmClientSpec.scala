package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{HttpLlmClient, MiniJson}

/** Hermetic spec for the OpenAI-compatible HTTP adapter: a JDK HttpServer
  * stub implements `/v1/completions` deterministically (batch generation
  * with shuffled choice indexes, echo+logprobs scoring with per-token
  * offsets, and an injectable 500 for the retry path). No sockets leave
  * localhost; no external model anywhere.
  */
class HttpLlmClientSpec extends AnyFunSuite {

  import MiniJson._

  /** Whitespace "tokenizer": token t scores logprob −0.01·len(t). */
  private def stubTokens(text: String): Seq[(Int, String)] = {
    val out = Seq.newBuilder[(Int, String)]
    var off = 0
    text.split(" ", -1).foreach { w =>
      out += ((off, w))
      off += w.length + 1
    }
    out.result()
  }

  private def completionsHandler(failFirst: AtomicInteger)(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    if (failFirst.getAndDecrement() > 0) {
      ex.sendResponseHeaders(500, -1); ex.close(); return
    }
    val req = parse(body)
    val resp = req.obj("prompt") match {
      case JArr(ps) => // batch generate: answer "gen:<prompt>", indexes reversed
        JObj(Seq("choices" -> JArr(
          ps.zipWithIndex.reverse.map { case (p, i) =>
            JObj(Seq("index" -> JNum(i), "text" -> JStr("gen:" + p.str)))
          })))
      case JStr(p) => // echo scoring
        val toks = stubTokens(p)
        JObj(Seq("choices" -> JArr(Seq(JObj(Seq(
          "index" -> JNum(0),
          "text" -> JStr(p),
          "logprobs" -> JObj(Seq(
            "text_offset" -> JArr(toks.map(t => JNum(t._1))),
            "token_logprobs" -> JArr(JNull +: toks.tail.map(t =>
              JNum(-0.01 * t._2.length)))))))))))
      case other => sys.error(s"unexpected prompt shape: $other")
    }
    val bytes = resp.render.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def withServer(failFirst: Int)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val failures = new AtomicInteger(failFirst)
    server.createContext("/v1/completions", completionsHandler(failures)(_))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/completions")
    finally server.stop(0)
  }

  test("generate re-orders shuffled choices by index and round-trips escapes") {
    withServer(failFirst = 0) { url =>
      val c = new HttpLlmClient(url, "m", maxRetries = 0)
      val out = c.generate(Seq("alpha", "with \"quotes\"\nand newline", "gamma"))
      assert(out == Seq("gen:alpha", "gen:with \"quotes\"\nand newline", "gen:gamma"))
    }
  }

  test("scoreCandidates sums logprobs past the prompt and normalizes to a simplex") {
    withServer(failFirst = 0) { url =>
      val c = new HttpLlmClient(url, "m", maxRetries = 0)
      val prompt = "pick one: " // 10 chars; "one:" token starts at offset 5 < 10
      val scored = c.scoreCandidates(prompt, Seq("aa", "bbbb"))
      // candidate tokens are exactly those at offset >= len(prompt):
      // p(aa) = exp(-0.02), p(bbbb) = exp(-0.04) → aa ranks first
      val pA = math.exp(-0.02)
      val pB = math.exp(-0.04)
      assert(scored.map(_._1) == Seq("aa", "bbbb"))
      assert(math.abs(scored(0)._2 - pA / (pA + pB)) < 1e-12)
      assert(math.abs(scored.map(_._2).sum - 1.0) < 1e-12)
    }
  }

  test("a 500 response is retried (reference's retry loop, bounded)") {
    withServer(failFirst = 1) { url =>
      val c = new HttpLlmClient(url, "m", maxRetries = 2)
      assert(c.generate(Seq("x")) == Seq("gen:x"))
    }
    withServer(failFirst = 10) { url =>
      val c = new HttpLlmClient(url, "m", maxRetries = 1)
      intercept[Exception](c.generate(Seq("x")))
    }
  }

  test("live endpoint round-trip (env-gated: set GRAFT_LLM_ENDPOINT to enable)") {
    // Integration smoke against a REAL OpenAI-compatible completions
    // server (e.g. vLLM's /v1/completions). Hermetic CI has no endpoint,
    // so the test self-cancels unless GRAFT_LLM_ENDPOINT is set; with one
    // set it proves the adapter speaks the live wire format end-to-end:
    //   GRAFT_LLM_ENDPOINT=http://host:8000/v1/completions \
    //   GRAFT_LLM_MODEL=<served-model> [GRAFT_LLM_API_KEY=...] sbt \
    //   "testOnly graft.HttpLlmClientSpec -- -z live"
    val ep = sys.env.get("GRAFT_LLM_ENDPOINT")
    assume(ep.isDefined, "GRAFT_LLM_ENDPOINT not set — live smoke skipped")
    val model = sys.env.getOrElse("GRAFT_LLM_MODEL", "default")
    val key = sys.env.get("GRAFT_LLM_API_KEY")
    val c = new HttpLlmClient(ep.get, model, maxNewTokens = 8,
      apiKey = key, maxRetries = 1)
    // batch generate: both prompts answered, order preserved by index
    val outs = c.generate(Seq("Say OK.", "Say YES."))
    assert(outs.size == 2, s"expected 2 completions, got $outs")
    // echo+logprobs scoring (vLLM supports echo; OpenAI's newer APIs do
    // not — this smoke documents the adapter's server requirement)
    val scored = c.scoreCandidates("The capital of France is",
      Seq(" Paris", " Berlin"))
    assert(scored.size == 2)
    assert(math.abs(scored.map(_._2).sum - 1.0) < 1e-6,
      s"scores not normalized: $scored")
  }

  test("MiniJson parses nested structures, escapes, numbers and rejects garbage") {
    val v = parse("""{"a": [1, 2.5, -3e2], "b": {"c": "xA\n"}, "d": null, "e": true}""")
    assert(v.obj("a").arr.map(_.num) == Seq(1.0, 2.5, -300.0))
    assert(v.obj("b").obj("c").str == "xA\n")
    assert(v.obj("d") == JNull && v.obj("e") == JBool(true))
    assert(parse("[]").arr.isEmpty && parse("{}") == JObj(Nil))
    intercept[Exception](parse("""{"a": }"""))
    intercept[Exception](parse("""[1, 2"""))
    // render/parse round-trip incl. control chars
    val s = JStr("line\nquote\" tab\t")
    assert(parse(s.render) == s)
  }
}
