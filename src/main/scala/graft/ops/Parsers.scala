package graft.ops

import scala.util.matching.Regex
import scala.util.Try

/** Free-text LLM-response parsers (SURVEY §2.F7; behavior of
  * `Stable Schema Matching/eval/eval_utils.py:50-196,420-450`,
  * `eval_MatchMaker.py:44-83`, `AnalysisUtils/Experiment.py:101-130` —
  * re-expressed, precision-critical first-valid-wins semantics kept).
  *
  * Pure functions (usable as UDFs or in `Dataset.map`); no Spark imports so
  * they unit-test without a session.
  */
object Parsers {

  private val fencedCode: Regex = """(?s)```(?:json|sql|sqlite|datalog)?\s*(.*?)```""".r
  // select-list capture stops at the first FROM (word-bounded): an optional
  // trailing group like (FROM (\w+))? would backtrack on "FROM t AS alias"
  // and spill the whole FROM clause into the alias scan
  private val createView: Regex =
    """(?is)CREATE\s+VIEW\s+(\w+)\s+AS\s+SELECT\s+(.*?)(?:\s+FROM\b.*)?$""".r
  private val aliasPair: Regex = """(?i)(\w+)\s+AS\s+(\w+)""".r
  private val mcqLetter: Regex = """(?m)^\s*(?:Answer|Best Match)\s*[:\-]?\s*([A-F])\b""".r
  private val confidence: Regex = """(?i)(?:confidence|score)\s*[:=]?\s*(\d{1,3})""".r

  /** First balanced {...} block in free text — the reference scans for the
    * first JSON-parseable candidate (first-valid-wins, eval_utils.py:429-444).
    */
  def firstJsonBlock(text: String): Option[String] = {
    var i = text.indexOf('{')
    while (i >= 0) {
      var depth = 0
      var j = i
      var end = -1
      while (j < text.length && end < 0) {
        text.charAt(j) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) end = j
          case _ =>
        }
        j += 1
      }
      if (end > i) {
        val cand = text.substring(i, end + 1)
        if (parseJsonMap(cand).isDefined) return Some(cand)
      }
      i = text.indexOf('{', i + 1)
    }
    None
  }

  /** Minimal JSON object parser: string keys to (string | array-of-string)
    * values — the shapes the pipeline emits ({"matches": [...]}, score
    * maps). Lenient about whitespace; rejects malformed input with None.
    */
  def parseJsonMap(s: String): Option[Map[String, Seq[String]]] = Try {
    val t = s.trim
    require(t.startsWith("{") && t.endsWith("}"))
    var i = 1
    val out = Map.newBuilder[String, Seq[String]]
    def ws(): Unit = while (i < t.length && t.charAt(i).isWhitespace) i += 1
    def str(): String = {
      require(t.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (t.charAt(i) != '"') {
        if (t.charAt(i) == '\\') { i += 1 }
        sb.append(t.charAt(i)); i += 1
      }
      i += 1
      sb.toString
    }
    def scalar(): String = {
      val start = i
      while (i < t.length && !",]}".contains(t.charAt(i))) i += 1
      t.substring(start, i).trim
    }
    ws()
    while (t.charAt(i) != '}') {
      val k = str(); ws()
      require(t.charAt(i) == ':'); i += 1; ws()
      val v: Seq[String] = t.charAt(i) match {
        case '[' =>
          i += 1; ws()
          val items = Seq.newBuilder[String]
          while (t.charAt(i) != ']') {
            ws()
            items += (if (t.charAt(i) == '"') str() else scalar())
            ws()
            if (t.charAt(i) == ',') { i += 1; ws() }
          }
          i += 1
          items.result()
        case '"' => Seq(str())
        case _   => Seq(scalar())
      }
      out += k -> v
      ws()
      if (t.charAt(i) == ',') { i += 1; ws() }
    }
    out.result()
  }.toOption

  /** {"matches": ["col1", ...]} → candidate list (N2One_Json repr). */
  def parseMatches(text: String): Seq[String] =
    firstJsonBlock(text).flatMap(parseJsonMap).flatMap(_.get("matches")).getOrElse(Nil)

  /** CREATE VIEW v AS SELECT a AS x, b AS y ... → (source, target) alias
    * alignments (ref: eval_utils.py:50-158).
    */
  def parseViewAlignments(text: String): Seq[(String, String)] =
    createView.findFirstMatchIn(text).toSeq.flatMap { m =>
      aliasPair.findAllMatchIn(m.group(2)).map(p => (p.group(1), p.group(2))).toSeq
    }

  /** Fenced code blocks (```sql ... ```), in order
    * (ref: Experiment.py:101-130).
    */
  def parseFencedBlocks(text: String): Seq[String] =
    fencedCode.findAllMatchIn(text).map(_.group(1).trim).filter(_.nonEmpty).toSeq

  /** MCQ letter answer A..F (ConfidenceScoring prompts,
    * PromptReprTemplate.py:492-506).
    */
  def parseMcqLetter(text: String): Option[String] =
    mcqLetter.findFirstMatchIn(text).map(_.group(1))

  /** 0-100 confidence score; out-of-range rejected
    * (ref: PromptReprTemplate.py:513-518).
    */
  def parseConfidence(text: String): Option[Int] =
    confidence.findFirstMatchIn(text).map(_.group(1).toInt).filter(v => v >= 0 && v <= 100)

  /** Candidate-refinement list: comma/newline separated; reject > maxItems
    * or entries outside `allowed` (case-insensitive)
    * (ref: eval_utils.py:25-48 validate_MM_candidates).
    */
  def validateCandidates(raw: String, allowed: Set[String], maxItems: Int = 5): Option[Seq[String]] = {
    val items = raw.split("[,\n]").map(_.trim).filter(_.nonEmpty).toSeq
    val lower = allowed.map(_.toLowerCase)
    if (items.isEmpty || items.size > maxItems) None
    else if (items.forall(x => lower.contains(x.toLowerCase))) Some(items)
    else None
  }

  /** Membership of a predicted attribute in a schema, case-insensitive
    * (ref: eval_utils.py:228-231 column_in_schema).
    */
  def columnInSchema(column: String, schemaCols: Seq[String]): Boolean =
    schemaCols.exists(_.equalsIgnoreCase(column.trim))
}
