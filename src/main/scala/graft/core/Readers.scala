package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.core.Model._

/** Ingest readers (SURVEY §2.A1/A2/A6):
  *   - schema-pair dataset JSON → typed TestCases (ref:
  *     `utils/data_builder.py:16-43`, shapes of `data/ehr/ehr_dataset.json`);
  *   - all-string CSV with declared-schema reconciliation (ref:
  *     `prompt/InstanceDataHandler.py:104-410`): lowercase headers, rename
  *     map, missing declared columns added as NULL, projection to schema
  *     order, column-count parity assertion;
  *   - JSONL ingest with NULL-token normalization + dedup (ref:
  *     `DataLoader.py:140-209`).
  */
object Readers {

  /** A1: schema-pair dataset JSON. Two dialects accepted (the reference's
    * datasets use the nested one — FIXTURES.md §A1):
    *   - nested: `source_schema: {name, description, columns: [{name, type,
    *     column_description, is_pk: "YES"/"NO"}]}`;
    *   - flat:   `source_schema: [{name, type, column_description, is_pk}]`.
    */
  def schemaPairJson(spark: SparkSession, path: String): Seq[TestCase] = {
    import spark.implicits._
    val df = spark.read.option("multiLine", true).json(path)
    // optional fields (column_description, is_pk) may be absent from the
    // inferred struct entirely — reference dataset JSON is loose about them
    def cols(field: String) = {
      val (arrayExpr, st) = df.schema(field).dataType match {
        case at: org.apache.spark.sql.types.ArrayType =>
          (field, at.elementType.asInstanceOf[StructType])
        case obj: StructType => // nested dialect: the array is under .columns
          (s"$field.columns",
            obj("columns").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType.asInstanceOf[StructType])
        case other => sys.error(s"unexpected $field type: $other")
      }
      val desc = if (st.fieldNames.contains("column_description"))
        "coalesce(c.column_description, '')" else "''"
      // is_pk is a boolean in the flat dialect, "YES"/"NO" in the nested one
      val pk = if (st.fieldNames.contains("is_pk"))
        "coalesce(lower(CAST(c.is_pk AS STRING)) IN ('yes', 'true'), false)"
      else "false"
      expr(s"transform($arrayExpr, c -> struct(c.name as name, c.type as type, " +
        s"$desc as description, $pk as is_pk))")
    }
    df.select(
        $"id".cast("string"),
        expr("transform(gold_mapping, p -> struct(p[0] as s, p[1] as t))").as("gold"),
        cols("source_schema").as("src"),
        cols("target_schema").as("tgt"))
      .as[(String, Seq[(String, String)], Seq[(String, String, String, Boolean)], Seq[(String, String, String, Boolean)])]
      .collect()
      .map { case (id, gold, src, tgt) =>
        def meta(xs: Seq[(String, String, String, Boolean)]) =
          xs.map(x => ColumnMeta(x._1, x._2, x._3, x._4))
        TestCase(id, meta(src), meta(tgt), gold)
      }.toSeq
  }

  /** A1 post-load transforms (ref: `utils/data_builder.py:16-43`): seeded
    * per-example column shuffle for prompt-order robustness, and the
    * source↔target swap that ALSO swaps every gold pair. The permutation is
    * the md5 order of (seed, case id, side, column name) — deterministic
    * regardless of load order AND replayable by the DuckDB oracle
    * (`ORDER BY md5(concat_ws('|', ...))`, q129), which JVM `Random.shuffle`
    * keyed on hashCode was not.
    */
  def shuffleCase(tc: TestCase, seed: Long): TestCase = {
    def key(side: String)(c: ColumnMeta): String =
      Det.md5hex(s"$seed|${tc.id}|$side|${c.name}")
    tc.copy(
      sourceSchema = tc.sourceSchema.sortBy(key("s")),
      targetSchema = tc.targetSchema.sortBy(key("t")))
  }

  def swapCase(tc: TestCase): TestCase =
    tc.copy(
      sourceSchema = tc.targetSchema,
      targetSchema = tc.sourceSchema,
      goldMapping = tc.goldMapping.map { case (s, t) => (t, s) })

  /** A2: CSV as all-string with declared-schema reconciliation. */
  def csvAllString(
      spark: SparkSession,
      path: String,
      declaredCols: Seq[String],
      renames: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.read.option("header", true).csv(path)
    val lowered = raw.toDF(raw.columns.map(_.toLowerCase): _*)
    val renamed = renames.foldLeft(lowered) { case (df, (from, to)) =>
      if (df.columns.contains(from.toLowerCase)) df.withColumnRenamed(from.toLowerCase, to) else df
    }
    val stringed = renamed.select(renamed.columns.map(c => col(c).cast("string").as(c)): _*)
    val declared = declaredCols.map(_.toLowerCase)
    val withMissing = declared.foldLeft(stringed)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(StringType)))
    val out = withMissing.select(declared.map(col): _*)
    require(out.columns.length == declared.length,
      s"column-count mismatch: ${out.columns.length} vs ${declared.length}")
    out
  }

  /** A6: JSONL with NULL-token normalization ('', 'null', '\\n' → NULL) and
    * duplicate-line dedup.
    */
  def jsonlNormalized(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = spark.read.schema(schema).json(path).dropDuplicates()
    df.select(df.columns.map { c =>
      val sc = col(c).cast("string")
      when(lower(trim(sc)).isin("", "null", "\\n"), lit(null)).otherwise(col(c)).as(c)
    }: _*)
  }

  /** All-string StructType for a declared column list. */
  def allStringSchema(cols: Seq[String]): StructType =
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))
}
