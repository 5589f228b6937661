package graft

import graft.core.Model.Question
import graft.llm._

class LlmOperatorSpec extends SparkSpec {

  private def questions = {
    val s = spark
    import s.implicits._
    s.createDataset(Seq(
      Question("c1", "person_id", "match it\nOptions:\n- subject_id\n- dob", Seq("subject_id", "dob")),
      Question("c1", "visit_id", "match it\nOptions:\n- hadm_id\n- dob", Seq("hadm_id", "dob")),
      Question("c2", "x", "no options here", Nil)))
  }

  test("mock generation is deterministic and parseable") {
    val out1 = LlmOperator.generate(questions, MockLlmClient.Factory()).collect()
      .map(g => (g.caseId, g.queryAttr) -> g.response).toMap
    val out2 = LlmOperator.generate(questions, MockLlmClient.Factory()).collect()
      .map(g => (g.caseId, g.queryAttr) -> g.response).toMap
    assert(out1 == out2)
    val parsed = graft.ops.Parsers.parseMatches(out1(("c1", "person_id")))
    assert(parsed.size == 1 && Set("subject_id", "dob").contains(parsed.head))
    assert(out1(("c2", "x")) == "{\"matches\": []}")
  }

  test("scoring yields a normalized simplex per question, sorted desc") {
    val scored = LlmOperator.score(questions, MockLlmClient.Factory()).collect()
      .groupBy(s => (s.caseId, s.queryAttr))
    val s1 = scored(("c1", "person_id")).map(_.score)
    assert(math.abs(s1.sum - 1.0) < 1e-9)
    assert(s1.sorted.reverse.toSeq == s1.toSeq)
  }

  test("bounded retry recovers from transient failures") {
    val out = LlmOperator.generate(questions.repartition(1), FlakyFactory(failures = 2),
      batchSize = 10, maxRetries = 3).collect()
    assert(out.length == 3)
    assert(out.head.attempts == 3) // 2 failures + 1 success
  }

  test("exhausted retries surface the error") {
    val e = intercept[org.apache.spark.SparkException] {
      LlmOperator.generate(questions.repartition(1), FlakyFactory(failures = 10),
        batchSize = 10, maxRetries = 2).collect()
    }
    assert(e.getMessage.contains("LLM generate failed") ||
      Option(e.getCause).exists(_.getMessage.contains("LLM generate failed")))
  }
}

final case class FlakyFactory(failures: Int) extends LlmClientFactory {
  override def create(): LlmClient = new FlakyLlmClient(new MockLlmClient(), failures)
}
