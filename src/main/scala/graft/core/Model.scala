package graft.core

import org.apache.spark.sql.types._

/** Typed data model for the schema-matching / schema-mapping pipelines
  * (SURVEY.md §1.1). These are the Dataset element types the operators in
  * graft.operators / graft.llm / graft.ops exchange.
  *
  * ref shapes: test case `utils/data_builder.py:16-43`; column dict
  * `utils/data_builder.py:133-185`; question record
  * `prompt/PromptICLTemplate.py:245-276`; relation/attribute + constraints
  * `Schema Mapping/DatabaseUtils/Schema.py:3-203`.
  */
object Model {

  /** One column of a relation, schema-as-data (columns are ROWS here —
    * the matching pipeline manipulates them relationally).
    */
  final case class ColumnMeta(
      name: String,
      dataType: String,
      description: String = "",
      isPk: Boolean = false)

  /** A schema-pair test case: align `sourceSchema` columns to
    * `targetSchema` columns; `goldMapping` holds (srcCol, tgtCol) pairs.
    * `id` encodes `db:table|db:table`.
    */
  final case class TestCase(
      id: String,
      sourceSchema: Seq[ColumnMeta],
      targetSchema: Seq[ColumnMeta],
      goldMapping: Seq[(String, String)])

  /** A rendered LLM question (one per target attribute in n-prompts mode). */
  final case class Question(
      caseId: String,
      queryAttr: String,
      prompt: String,
      candidates: Seq[String])

  /** One scored candidate alignment produced by inference. */
  final case class ScoredCandidate(
      caseId: String,
      queryAttr: String,
      candAttr: String,
      score: Double)

  /** A predicted alignment pair. */
  final case class Alignment(caseId: String, srcAttr: String, tgtAttr: String)

  /** Confusion counts for one evaluation unit. */
  final case class EvalCounts(caseId: String, tp: Long, fp: Long, fn: Long, tn: Long)

  // ---- schema-mapping side (relational schema + constraints) -------------

  /** Supertype lattice of the mapping side: TEXT / INTEGER / DOUBLE
    * (ref: Schema.py:16-22).
    */
  def superType(declared: String): String = declared.toLowerCase match {
    case t if t.contains("int") => "INTEGER"
    case t if t.contains("float") || t.contains("real") || t.contains("double") => "DOUBLE"
    case _ => "TEXT"
  }

  final case class Attribute(
      name: String,
      dataType: String,
      size: Option[Int] = None,
      nullable: Boolean = true,
      meaningful: Boolean = true,
      description: String = "")

  /** A relation with the constraint side-model Spark doesn't enforce
    * natively (PK/unique/FK kept as data, checked by audit queries —
    * SURVEY §2.D9/D10).
    */
  final case class Relation(
      name: String,
      attributes: Seq[Attribute],
      primaryKey: Seq[String] = Nil,
      uniques: Seq[Seq[String]] = Nil,
      foreignKeys: Seq[ForeignKey] = Nil) {

    def attr(n: String): Attribute =
      attributes.find(_.name.equalsIgnoreCase(n))
        .getOrElse(sys.error(s"no attribute $n in $name"))

    def toStructType: StructType = StructType(attributes.map { a =>
      val dt = superType(a.dataType) match {
        case "INTEGER" => LongType
        case "DOUBLE"  => DoubleType
        case _         => StringType
      }
      StructField(a.name, dt, a.nullable)
    })

    /** Spark DDL (constraint enforcement stays in the side model;
      * ref emits SQLite STRICT DDL, Schema.py:106-134).
      */
    def ddl(database: String): String = {
      val cols = attributes.map { a =>
        val dt = superType(a.dataType) match {
          case "INTEGER" => "BIGINT"
          case "DOUBLE"  => "DOUBLE"
          case _         => "STRING"
        }
        s"`${a.name}` $dt" + (if (!a.nullable) " NOT NULL" else "")
      }
      s"CREATE TABLE IF NOT EXISTS `$database`.`$name` (${cols.mkString(", ")}) USING PARQUET"
    }
  }

  final case class ForeignKey(
      attrs: Seq[String], refRelation: String, refAttrs: Seq[String])

  final case class Schema(relations: Seq[Relation]) {
    def relation(n: String): Relation =
      relations.find(_.name.equalsIgnoreCase(n))
        .getOrElse(sys.error(s"no relation $n"))
    def tableNames: Set[String] = relations.map(_.name.toLowerCase).toSet
  }
}
