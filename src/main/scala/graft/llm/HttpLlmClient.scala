package graft.llm

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Thin OpenAI-compatible HTTP adapter behind [[LlmClient]] — the
  * "real model" implementation slot (ref behavior: llm_classes.py:95-185
  * drives a local transformers pipeline; production deployments put the
  * same contract behind a vLLM/OpenAI-style `/v1/completions` endpoint).
  * JDK-only (HttpURLConnection + a minimal JSON codec) — no dependencies,
  * constructible per partition via [[HttpLlmClient.Factory]] so the
  * connection/session is never serialized.
  *
  *  - `generate`: one batched completions call (`prompt` as an array),
  *    responses re-ordered by choice `index` — the adapter twin of
  *    call_llm_with_prompt's batch path.
  *  - `scoreCandidates`: per candidate, `prompt+candidate` with
  *    `max_tokens: 0, echo: true, logprobs: 0`, summing token logprobs at
  *    text offsets past the prompt — the completions-API translation of
  *    attempt_llm_logits (per-token probs → exp(Σ log p)), normalized to
  *    a simplex and sorted (score desc, candidate asc) like the mock.
  *  - Retries with a 1 s sleep, matching the reference's
  *    attempt_llm_request loop, but bounded (`maxRetries`) so a dead
  *    endpoint fails the task instead of spinning forever.
  */
final class HttpLlmClient(
    endpoint: String,
    model: String,
    maxNewTokens: Int = 256,
    temperature: Double = 0.0,
    apiKey: Option[String] = None,
    maxRetries: Int = 3) extends LlmClient {

  import MiniJson._

  override def generate(prompts: Seq[String]): Seq[String] = {
    if (prompts.isEmpty) return Nil
    val body = obj(
      "model" -> JStr(model),
      "prompt" -> JArr(prompts.map(JStr.apply)),
      "max_tokens" -> JNum(maxNewTokens),
      "temperature" -> JNum(temperature))
    val resp = parse(post(body.render))
    val choices = resp.obj("choices").arr
    // choices may interleave across the batch — re-order by index
    choices.map(c => (c.obj("index").num.toInt, c.obj("text").str))
      .sortBy(_._1).map(_._2)
  }

  override def scoreCandidates(
      prompt: String, candidates: Seq[String]): Seq[(String, Double)] = {
    if (candidates.isEmpty) return Nil
    val raw = candidates.map { cand =>
      val body = obj(
        "model" -> JStr(model),
        "prompt" -> JStr(prompt + cand),
        "max_tokens" -> JNum(0),
        "echo" -> JBool(true),
        "logprobs" -> JNum(0))
      val resp = parse(post(body.render))
      val lp = resp.obj("choices").arr.head.obj("logprobs")
      val offsets = lp.obj("text_offset").arr.map(_.num.toInt)
      val logprobs = lp.obj("token_logprobs").arr.map {
        case JNull => 0.0 // first token: API reports null
        case v     => v.num
      }
      // candidate tokens = those whose text offset is past the prompt
      val sum = offsets.zip(logprobs)
        .collect { case (o, l) if o >= prompt.length => l }.sum
      cand -> math.exp(sum)
    }
    val z = raw.map(_._2).sum
    val normed =
      if (z > 0.0) raw.map { case (c, p) => c -> p / z }
      else raw.map { case (c, _) => c -> 1.0 / raw.length }
    normed.sortBy { case (c, s) => (-s, c) }
  }

  private def post(body: String): String = {
    var attempt = 0
    while (true) {
      var conn: HttpURLConnection = null
      try {
        conn = URI.create(endpoint).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        apiKey.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
        conn.setDoOutput(true)
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(600000)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        conn.setFixedLengthStreamingMode(bytes.length)
        val os = conn.getOutputStream
        try { os.write(bytes); os.flush() } finally os.close()
        val code = conn.getResponseCode
        if (code / 100 != 2) sys.error(s"HTTP $code from $endpoint")
        return readAll(conn.getInputStream)
      } catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(1000L) // ref: attempt_llm_request sleeps 1 s per retry
      } finally {
        if (conn != null) conn.disconnect()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def readAll(in: InputStream): String = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toString("UTF-8")
  }
}

object HttpLlmClient {
  /** Serializable factory — ships endpoint config, builds per partition. */
  final case class Factory(
      endpoint: String,
      model: String,
      maxNewTokens: Int = 256,
      temperature: Double = 0.0,
      apiKey: Option[String] = None,
      maxRetries: Int = 3) extends LlmClientFactory {
    override def create(): LlmClient =
      new HttpLlmClient(endpoint, model, maxNewTokens, temperature, apiKey,
        maxRetries)
  }
}

/** Minimal recursive JSON codec for the completions wire format — objects,
  * arrays, strings (with escapes incl. \uXXXX), numbers, booleans, null.
  * Hand-rolled because the engine takes no dependencies beyond Spark and
  * [[graft.ops.Parsers.parseJsonMap]] is deliberately flat.
  */
private[graft] object MiniJson {

  sealed trait JValue {
    def render: String = this match {
      case JNull       => "null"
      case JBool(b)    => b.toString
      case JNum(n)     =>
        if (n == n.floor && !n.isInfinite && math.abs(n) < 1e15)
          n.toLong.toString
        else n.toString
      case JStr(s)     =>
        val sb = new StringBuilder("\"")
        s.foreach {
          case '"'          => sb.append("\\\"")
          case '\\'         => sb.append("\\\\")
          case '\n'         => sb.append("\\n")
          case '\r'         => sb.append("\\r")
          case '\t'         => sb.append("\\t")
          case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
          case c            => sb.append(c)
        }
        sb.append('"').toString
      case JArr(vs)    => vs.map(_.render).mkString("[", ",", "]")
      case JObj(kvs)   =>
        kvs.map { case (k, v) => JStr(k).render + ":" + v.render }
          .mkString("{", ",", "}")
    }
    def obj(key: String): JValue = this match {
      case JObj(kvs) => kvs.collectFirst { case (k, v) if k == key => v }
        .getOrElse(sys.error(s"missing key '$key'"))
      case other => sys.error(s"not an object: $other")
    }
    def arr: Seq[JValue] = this match {
      case JArr(vs) => vs
      case other    => sys.error(s"not an array: $other")
    }
    def str: String = this match {
      case JStr(s) => s
      case other   => sys.error(s"not a string: $other")
    }
    def num: Double = this match {
      case JNum(n) => n
      case other   => sys.error(s"not a number: $other")
    }
  }
  case object JNull extends JValue
  final case class JBool(b: Boolean) extends JValue
  final case class JNum(n: Double) extends JValue
  final case class JStr(s: String) extends JValue
  final case class JArr(vs: Seq[JValue]) extends JValue
  final case class JObj(kvs: Seq[(String, JValue)]) extends JValue

  def obj(kvs: (String, JValue)*): JObj = JObj(kvs.toSeq)

  def parse(s: String): JValue = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def ch: Char = s.charAt(pos)
    private def expect(c: Char): Unit = {
      require(!eof && ch == c, s"expected '$c' at $pos"); pos += 1
    }
    def value(): JValue = {
      ws()
      require(!eof, "unexpected end of JSON")
      ch match {
        case '{' => jobj()
        case '[' => jarr()
        case '"' => JStr(jstr())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _   => jnum()
      }
    }
    private def lit(l: String): Unit = {
      require(s.regionMatches(pos, l, 0, l.length), s"bad literal at $pos")
      pos += l.length
    }
    private def jobj(): JObj = {
      expect('{'); ws()
      val out = Seq.newBuilder[(String, JValue)]
      if (!eof && ch == '}') { pos += 1; return JObj(out.result()) }
      var done = false
      while (!done) {
        ws()
        val k = jstr(); ws(); expect(':')
        out += k -> value()
        ws()
        if (!eof && ch == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(out.result())
    }
    private def jarr(): JArr = {
      expect('['); ws()
      val out = Seq.newBuilder[JValue]
      if (!eof && ch == ']') { pos += 1; return JArr(out.result()) }
      var done = false
      while (!done) {
        out += value()
        ws()
        if (!eof && ch == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(out.result())
    }
    private def jstr(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          pos += 1
          ch match {
            case 'n' => sb.append('\n'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 'b' => sb.append('\b'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 5
            case c   => sb.append(c); pos += 1
          }
        } else { sb.append(ch); pos += 1 }
      }
      pos += 1
      sb.toString
    }
    private def jnum(): JNum = {
      val start = pos
      while (!eof && (ch.isDigit || "+-.eE".indexOf(ch) >= 0)) pos += 1
      JNum(s.substring(start, pos).toDouble)
    }
  }
}
