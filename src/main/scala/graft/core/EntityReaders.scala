package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-splitting ingest readers (SURVEY §2.A5/A7/A8; behavior of
  * `Schema Mapping/DatabaseUtils/DataLoader.py:89-559`): semi-structured
  * publication data normalized into relational tables with surrogate keys.
  */
object EntityReaders {

  /** A5: BibTeX → (publications, authors, pub_authors). Entries are parsed
    * with a pure function (usable in a parser UDF over `spark.read.text`);
    * surrogate author keys are first-seen-order dense ids derived by a
    * range-partitioned sort (scale-safe, like q20).
    */
  final case class BibEntry(
      entryType: String, citeKey: String, fields: Map[String, String])

  private val entryRe = """(?s)@(\w+)\s*\{\s*([^,\s]+)\s*,(.*)""".r
  private val fieldRe = """(?s)(\w+)\s*=\s*[{"]([^}"]*)[}"]\s*,?""".r

  def parseBib(text: String): Seq[BibEntry] =
    text.split("(?m)^@").toSeq.filter(_.trim.nonEmpty).flatMap { chunk =>
      ("@" + chunk) match {
        case entryRe(t, key, body) =>
          val fields = fieldRe.findAllMatchIn(body)
            .map(m => m.group(1).toLowerCase -> m.group(2).trim).toMap
          Some(BibEntry(t.toLowerCase, key, fields))
        case _ => None
      }
    }

  final case class BibTables(
      publications: DataFrame, authors: DataFrame, pubAuthors: DataFrame)

  /** Normalize parsed entries into relations: explode " and "-separated
    * authors (title-cased like the reference's `DataLoader.py:323-324`),
    * dedup into an author dimension with dense surrogate ids, and build the
    * join table.
    */
  def bibTables(spark: SparkSession, entries: Seq[BibEntry]): BibTables = {
    import spark.implicits._
    val pubs = entries.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.entryType, e.citeKey,
        e.fields.getOrElse("title", ""), e.fields.get("year"),
        e.fields.getOrElse("author", ""))
    }.toDF("pub_id", "entry_type", "cite_key", "title", "year", "author_str")
    val rawAuthors = pubs
      .select($"pub_id", explode(split($"author_str", " and ")).as("a"))
      .select($"pub_id", initcap(trim($"a")).as("author_name"))
      .filter($"author_name" =!= "")
    val authors = graft.functions.SurrogateKeys.denseIds(rawAuthors, "author_name", "author_id")
    val pubAuthors = rawAuthors.join(authors, "author_name")
      .select($"pub_id", $"author_id")
    BibTables(pubs.drop("author_str"), authors, pubAuthors)
  }

  /** A7: DBLP-style publication JSON: dispatch by publication type, single-
    * vs multi-valued author handling, first-of-list rule for multi-valued
    * scalar attributes (ref: DataLoader.py:471-559).
    */
  def dblpTables(spark: SparkSession, jsonPath: String): BibTables = {
    import spark.implicits._
    val raw = spark.read.json(jsonPath)
    def has(c: String) = raw.columns.contains(c)
    def opt(c: String) =
      if (has(c)) col(c) else lit(null).cast("string")
    val authorsCol =
      if (has("authors")) col("authors") // array
      else array(col("author")) // single
    val eeCol =
      if (!has("ee")) lit(null).cast("string")
      else raw.schema("ee").dataType.typeName match {
        case "array" => element_at(col("ee"), 1) // first-of-list rule
        case _       => col("ee").cast("string")
      }
    val pubs = raw.select(
      monotonically_increasing_id().as("pub_id"),
      coalesce(opt("type"), lit("article")).as("entry_type"),
      opt("title").as("title"), opt("year").cast("string").as("year"),
      eeCol.as("ee"), authorsCol.as("authors_arr"))
    val rawAuthors = pubs
      .select($"pub_id", explode($"authors_arr").as("author_name"))
      .filter($"author_name".isNotNull && trim($"author_name") =!= "")
    val authors = graft.functions.SurrogateKeys.denseIds(rawAuthors, "author_name", "author_id")
    val pubAuthors = rawAuthors.join(authors, "author_name")
      .select($"pub_id", $"author_id")
    BibTables(pubs.drop("authors_arr"), authors, pubAuthors)
  }

  /** A8: CSV with int-vs-varchar inference from the first data row and
    * all-empty-row dropping (ref: DataLoader.py:89-132).
    */
  def csvTypedByFirstRow(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", true).csv(path)
    val nonEmpty = raw.filter(
      concat_ws("", raw.columns.map(c => coalesce(col(c), lit(""))): _*) =!= "")
    val first = nonEmpty.head()
    val typed = raw.columns.zipWithIndex.map { case (c, i) =>
      val v = if (first.isNullAt(i)) "" else first.getString(i)
      if (v.matches("^-?[0-9]+$")) col(c).cast("long").as(c) else col(c).as(c)
    }
    nonEmpty.select(typed: _*)
  }
}
