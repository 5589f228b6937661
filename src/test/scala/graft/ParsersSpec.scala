package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Parsers

class ParsersSpec extends AnyFunSuite {

  test("parseMatches extracts the candidate list from chatty output") {
    val text = "Sure! Based on the schema, here is my answer:\n" +
      """{"matches": ["patient_id", "person_id"]} hope that helps"""
    assert(Parsers.parseMatches(text) == Seq("patient_id", "person_id"))
  }

  test("first-valid-wins: malformed JSON before a valid block is skipped") {
    val text = """{broken json oops} then {"matches": ["a"]}"""
    assert(Parsers.parseMatches(text) == Seq("a"))
  }

  test("parseMatches returns empty on no JSON at all") {
    assert(Parsers.parseMatches("no structured answer here").isEmpty)
  }

  test("parseJsonMap handles scalar, string, and array values") {
    val m = Parsers.parseJsonMap("""{"a": "x", "b": [ "y" , "z" ], "c": 42}""").get
    assert(m == Map("a" -> Seq("x"), "b" -> Seq("y", "z"), "c" -> Seq("42")))
  }

  test("parseViewAlignments extracts alias pairs from CREATE VIEW") {
    val sql = "CREATE VIEW mapping AS SELECT subject_id AS person_id, hadm_id AS visit_id FROM admissions;"
    assert(Parsers.parseViewAlignments(sql) ==
      Seq(("subject_id", "person_id"), ("hadm_id", "visit_id")))
  }

  test("parseViewAlignments ignores table aliases in the FROM clause") {
    // regression: an optional-FROM regex group used to backtrack and spill
    // "admissions AS adm" into the alias scan
    val sql = "CREATE VIEW m AS SELECT subject_id AS person_id FROM admissions AS adm;"
    assert(Parsers.parseViewAlignments(sql) == Seq(("subject_id", "person_id")))
  }

  test("parseFencedBlocks returns fenced SQL in order") {
    val text = "First:\n```sql\nINSERT INTO t VALUES (1);\n```\nthen\n```\nSELECT 1\n```"
    assert(Parsers.parseFencedBlocks(text) == Seq("INSERT INTO t VALUES (1);", "SELECT 1"))
  }

  test("parseMcqLetter reads the answer letter") {
    assert(Parsers.parseMcqLetter("Reasoning...\nAnswer: C\n").contains("C"))
    assert(Parsers.parseMcqLetter("Best Match: A").contains("A"))
    assert(Parsers.parseMcqLetter("no letter").isEmpty)
  }

  test("parseConfidence bounds to 0-100") {
    assert(Parsers.parseConfidence("Confidence: 85").contains(85))
    assert(Parsers.parseConfidence("score = 200").isEmpty)
  }

  test("validateCandidates rejects oversize and unknown entries") {
    val allowed = Set("a", "b", "c", "d", "e", "f")
    assert(Parsers.validateCandidates("a, b", allowed).contains(Seq("a", "b")))
    assert(Parsers.validateCandidates("a, z", allowed).isEmpty)
    assert(Parsers.validateCandidates("a,b,c,d,e,f", allowed).isEmpty) // > 5
    assert(Parsers.validateCandidates("A, B", allowed).contains(Seq("A", "B"))) // case-insensitive
  }

  test("columnInSchema is case-insensitive with trim") {
    assert(Parsers.columnInSchema(" Patient_ID ", Seq("patient_id", "x")))
    assert(!Parsers.columnInSchema("nope", Seq("patient_id")))
  }
}
