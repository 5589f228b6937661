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

  /** Whitespace token count — the coarse budget proxy; kept as the default
    * so pinned pipelines don't churn (ref counts with a HF tokenizer,
    * PromptICLTemplate.py:24-25 — see [[wordpieceCount]] for the faithful
    * counter).
    */
  def tokenEstimate(s: String): Int = s.split("\\s+").count(_.nonEmpty)

  /** Tokenizer-FAITHFUL counting: greedy longest-prefix wordpiece over a
    * vocab — the exact mechanics of q127's recursive-CTE tokenizer, here as
    * the in-JVM counter for [[packIcl]]'s verify-before-accept loop. Per
    * whitespace word: repeatedly consume the longest vocab piece prefixing
    * the remainder, or one `<unk>` character when nothing matches. A
    * vocab-file-driven count diverges from the whitespace estimate exactly
    * where a real tokenizer does (long words explode into pieces), which is
    * what the reference's budget check actually guards against.
    */
  def wordpieceCount(vocab: Set[String])(text: String): Int = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max
    var total = 0
    for (w <- text.split("\\s+") if w.nonEmpty) {
      var i = 0
      while (i < w.length) {
        var l = math.min(maxLen, w.length - i)
        while (l > 1 && !vocab.contains(w.substring(i, i + l))) l -= 1
        i += (if (vocab.contains(w.substring(i, i + l))) l else 1)
        total += 1
      }
    }
    total
  }

  /** q127's fixed merge vocab — one definition shared with specs so the
    * in-JVM counter and the recursive-CTE tokenizer stay in lockstep.
    */
  val subwordVocab: Set[String] = Set(
    "tion", "ing", "ion", "ent", "ter", "the", "and", "er", "ed", "in",
    "th", "he", "re", "on", "an", "at", "en", "es", "or", "st", "ar",
    "le", "nd")

  /** F9 token-budget packing: accept demos one at a time while the re-rendered
    * prompt stays within budget (ref: PromptICLTemplate.py:195-219 verifies
    * tokens + max_answer <= max_seq after EACH added example). `countTokens`
    * plugs the tokenizer: whitespace proxy by default, or
    * `wordpieceCount(vocab)` for model-faithful budgets.
    */
  def packIcl(
      render: Seq[(String, String)] => String,
      demos: Seq[(String, String)],
      maxTokens: Int,
      maxAnswerTokens: Int = 32,
      countTokens: String => Int = tokenEstimate): Seq[(String, String)] = {
    var kept = Vector.empty[(String, String)]
    for (d <- demos) {
      val trial = kept :+ d
      if (countTokens(render(trial)) + maxAnswerTokens <= maxTokens) kept = trial
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

  /** One MM demo-pool entry: a prior answer plus the free-text evaluation
    * whose TRAILING CHARACTER carries the 0-9 rating.
    */
  final case class RatedDemo(caseId: String, question: String, answer: String, evalText: String)

  /** Rating from the last character of an eval text (ref:
    * eval_MatchMaker.py:174-184 `get_last_char_as_int` — `int(s[-1])`, None
    * on empty/non-digit; its `rate <= 5 or rate >= 0` bound check is
    * always true, so every digit 0-9 passes — behavior matched, not the
    * presumably-intended `and`).
    */
  def lastCharRating(s: String): Option[Int] =
    // Character.digit mirrors Python's int(s[-1]): a Unicode decimal digit
    // (e.g. '٤') parses to its VALUE — naive `c - '0'` arithmetic would
    // produce a garbage rating that outranks every real one
    s.lastOption.map(c => Character.digit(c, 10)).filter(_ >= 0)

  /** MatchMaker rating-sorted ICL demo selection (ref:
    * eval_MatchMaker.py:188-208 `get_demo` filters rating >= minRating;
    * :453 sorts by rating DESCENDING — Python's stable sort, so pool order
    * breaks ties; ExampleSelectorTemplate.py:60-64 `get_examples` skips the
    * target case and stops only once `len(examples) > num_example`, i.e. it
    * takes numExample+1 demos — that off-by-one is reference behavior and
    * is reproduced, cited, here).
    */
  def ratedDemos(
      pool: Seq[RatedDemo],
      targetCaseId: String,
      numExample: Int,
      minRating: Int = 4): Seq[(String, String)] =
    pool
      .flatMap(d => lastCharRating(d.evalText).filter(_ >= minRating).map(r => (d, r)))
      .sortBy { case (_, r) => -r }
      .iterator
      .filter { case (d, _) => d.caseId != targetCaseId }
      .take(numExample + 1)
      .map { case (d, _) => (d.question, d.answer) }
      .toSeq

  /** C6/F9 distributed form of [[nearestDemos]]: global top-k by
    * |ratio − target| with id tie-break. orderBy+limit plans as
    * TakeOrderedAndProject — per-partition heaps, no full sort, so a
    * billion-row demo pool costs one narrow pass.
    */
  def nearestDemosDf(
      pool: org.apache.spark.sql.DataFrame,
      idCol: String, ratioCol: String,
      targetRatio: Double, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    pool.orderBy(abs(col(ratioCol) - targetRatio), col(idCol)).limit(k)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
}
