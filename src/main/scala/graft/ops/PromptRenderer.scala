package graft.ops

import graft.core.Model._

/** Deterministic prompt rendering + ICL selection (SURVEY §2.F8/F9; shapes
  * of `prompt/PromptReprTemplate.py:291-400` N2One_Json,
  * `Serializers.JSON:130-197`, `PromptICLTemplate.py:195-219` token-budget
  * packing — re-expressed as pure Scala string builders applied via
  * `Dataset.map`).
  */
object PromptRenderer {

  /** JSON schema serialization: columns with type/description, plus sampled
    * values (ref: PromptReprTemplate.py:258-282).
    */
  def schemaJson(cols: Seq[ColumnMeta], samples: Map[String, Seq[String]]): String = {
    val fields = cols.map { c =>
      val vs = samples.getOrElse(c.name, Nil).map(v => "\"" + esc(v) + "\"").mkString(", ")
      s"""{"name": "${esc(c.name)}", "type": "${esc(c.dataType)}"""" +
        (if (c.description.nonEmpty) s""", "description": "${esc(c.description)}"""" else "") +
        s""", "samples": [$vs]}"""
    }
    fields.mkString("[", ", ", "]")
  }

  /** N2One question: one prompt per target attribute; candidates are the
    * source columns, rendered one per "- " line (the MockLlmClient contract)
    * with an explicit no-match sentinel (ref: PromptReprTemplate.py:307-327).
    */
  def n2oneQuestion(
      tc: TestCase,
      targetAttr: String,
      samples: Map[String, Seq[String]],
      icl: Seq[(String, String)] = Nil): Question = {
    val cands = tc.sourceSchema.map(_.name)
    val demos = icl.map { case (q, a) => s"Q: $q\nA: $a" }.mkString("", "\n", "\n")
    val prompt =
      s"""${if (icl.nonEmpty) demos else ""}Source schema: ${schemaJson(tc.sourceSchema, samples)}
         |Target attribute: "${esc(targetAttr)}"
         |Which source column matches the target attribute? Answer as {"matches": [...]}.
         |Options:
         |${cands.map(c => s"- $c").mkString("\n")}
         |- there is no match.""".stripMargin
    Question(tc.id, targetAttr, prompt, cands)
  }

  /** Numbered-MCQ repr (Logits 1..N family, ref:
    * PromptReprTemplate.py:18-119): candidates as `1. <col>`, answer is the
    * number — pairs with `LlmClient.scoreCandidates` over the option texts.
    */
  def mcqQuestion(tc: TestCase, targetAttr: String): Question = {
    val cands = tc.sourceSchema.map(_.name) :+ "There is no match."
    val opts = cands.zipWithIndex.map { case (c, i) => s"${i + 1}. $c" }.mkString("\n")
    val prompt =
      s"""Target attribute: "${esc(targetAttr)}"
         |Which option matches? Reply with the option number.
         |$opts""".stripMargin
    Question(tc.id, targetAttr, prompt, cands)
  }

  /** Confidence-scoring MCQ with A..F letters (ref:
    * PromptReprTemplate.py:460-566): asks for a letter AND a 0-100
    * confidence — parsed by `Parsers.parseMcqLetter` /
    * `Parsers.parseConfidence`.
    */
  def confidenceMcq(tc: TestCase, targetAttr: String): Question = {
    // cap at 6 options INCLUDING the sentinel — the no-match option must
    // survive even for wide schemas
    val cands = tc.sourceSchema.map(_.name).take(5) :+ "None of the options"
    val opts = cands.zipWithIndex
      .map { case (c, i) => s"${('A' + i).toChar}. $c" }.mkString("\n")
    val prompt =
      s"""Target attribute: "${esc(targetAttr)}"
         |$opts
         |Answer with the letter of the best match, then "Confidence: <0-100>".""".stripMargin
    Question(tc.id, targetAttr, prompt, cands)
  }

  /** TaDa-style yes/no repr (ref: PromptReprTemplate.py:123-207): one
    * question per (source, target) pair, answered yes/no — feeds
    * `Ensemble.yesNoMajority`.
    */
  def tadaQuestion(tc: TestCase, srcAttr: String, targetAttr: String): Question =
    Question(tc.id, targetAttr,
      s"""Do source column "${esc(srcAttr)}" and target column "${esc(targetAttr)}"
         |represent the same attribute? Answer yes or no.""".stripMargin,
      Seq("yes", "no"))

  /** Whitespace token count — the budget proxy (the real tokenizer lives
    * behind the LlmClient boundary; ref counts with a HF tokenizer,
    * PromptICLTemplate.py:24-25).
    */
  def tokenEstimate(s: String): Int = s.split("\\s+").count(_.nonEmpty)

  /** F9 token-budget packing: accept demos one at a time while the re-rendered
    * prompt stays within budget (ref: PromptICLTemplate.py:195-219 verifies
    * tokens + max_answer <= max_seq after EACH added example).
    */
  def packIcl(
      render: Seq[(String, String)] => String,
      demos: Seq[(String, String)],
      maxTokens: Int,
      maxAnswerTokens: Int = 32): Seq[(String, String)] = {
    var kept = Vector.empty[(String, String)]
    for (d <- demos) {
      val trial = kept :+ d
      if (tokenEstimate(render(trial)) + maxAnswerTokens <= maxTokens) kept = trial
    }
    kept
  }

  /** F9 nearest-demo selection by 1-D coverage-ratio distance
    * (ref: ExampleSelectorTemplate.py:117-146).
    */
  def nearestDemos(
      targetRatio: Double,
      pool: Seq[(String, Double)],
      k: Int): Seq[String] =
    pool.sortBy { case (id, r) => (math.abs(r - targetRatio), id) }.take(k).map(_._1)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
}
