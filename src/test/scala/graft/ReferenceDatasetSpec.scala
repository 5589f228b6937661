package graft

import java.nio.file.{Files, Paths}
import graft.core.Readers
import graft.llm.{LlmOperator, MockLlmClient}
import graft.ops.{Parsers, PromptRenderer}

/** Integration: the engine's readers and pipeline run against the
  * REFERENCE'S OWN dataset files (read-only, data not code). Skipped when
  * the reference checkout is absent so the repo stays standalone.
  */
class ReferenceDatasetSpec extends SparkSpec {

  private val ehr = "/root/reference/Stable Schema Matching/data/ehr/ehr_dataset.json"
  private val synthea = "/root/reference/Stable Schema Matching/data/synthea/synthea_dataset.json"

  private def available(p: String) = Files.exists(Paths.get(p))

  test("ehr dataset: 52 schema-pair cases parse with gold mappings intact") {
    assume(available(ehr), "reference checkout not present")
    val cases = Readers.schemaPairJson(spark, ehr)
    assert(cases.length == 52)
    val adm = cases.find(_.id == "mimic-iii:ADMISSIONS|omop:VISIT_OCCURRENCE").get
    assert(adm.goldMapping.contains("SUBJECT_ID" -> "person_id"))
    assert(adm.sourceSchema.exists(_.name == "subject_id"))
    assert(cases.forall(c => c.sourceSchema.nonEmpty && c.targetSchema.nonEmpty))
    // every gold endpoint resolves against its schema (case-insensitive) —
    // the validation predicate the eval pipeline relies on
    val resolvable = cases.flatMap(c => c.goldMapping.map { case (s, t) =>
      Parsers.columnInSchema(s, c.sourceSchema.map(_.name)) &&
        Parsers.columnInSchema(t, c.targetSchema.map(_.name))
    })
    assert(resolvable.count(identity).toDouble / resolvable.size > 0.95,
      "gold endpoints should overwhelmingly resolve against their schemas")
  }

  test("synthea dataset parses and round-trips shuffle/swap semantics") {
    assume(available(synthea), "reference checkout not present")
    val cases = Readers.schemaPairJson(spark, synthea)
    assert(cases.length == 12)
    val tc = cases.head
    val shuffled = Readers.shuffleCase(tc, seed = 7564)
    assert(shuffled.sourceSchema.toSet == tc.sourceSchema.toSet)
    assert(Readers.shuffleCase(tc, 7564) == shuffled, "shuffle must be seeded-deterministic")
    assert(Readers.shuffleCase(tc, 333) != shuffled || tc.sourceSchema.size <= 1)
    val swapped = Readers.swapCase(tc)
    assert(swapped.sourceSchema == tc.targetSchema)
    assert(swapped.goldMapping == tc.goldMapping.map(_.swap))
    assert(Readers.swapCase(swapped) == tc)
  }

  test("full mock pipeline runs distributed over the real ehr cases") {
    assume(available(ehr), "reference checkout not present")
    val s = spark
    import s.implicits._
    val cases = Readers.schemaPairJson(spark, ehr).take(8)
    val questions = s.createDataset(for {
      tc <- cases
      tgt <- tc.targetSchema.map(_.name).take(5)
    } yield PromptRenderer.n2oneQuestion(tc, tgt, Map.empty))
    val out = LlmOperator.generate(questions, MockLlmClient.Factory()).collect()
    assert(out.length == questions.count())
    val parsed = out.map(g => Parsers.parseMatches(g.response))
    assert(parsed.forall(_.size <= 1))
    assert(parsed.count(_.nonEmpty) > out.length / 2,
      "most questions should yield a candidate answer")
  }
}
