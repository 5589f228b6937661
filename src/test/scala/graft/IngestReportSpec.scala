package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.core.EntityReaders
import graft.eval.{Metrics, Report}
import graft.mapping.SchemaXml
import graft.operators.Sampling

class SchemaXmlSpec extends SparkSpec {

  private val schemaXml =
    """<schema>
      |  <relation name="person">
      |    <attribute name="id" type="int" size="10" nullable="false" description="pk"/>
      |    <attribute name="name" type="varchar" size="20"/>
      |    <primaryKey><attr>id</attr></primaryKey>
      |    <unique><attr>name</attr></unique>
      |  </relation>
      |  <relation name="chartevents_1"><attribute name="x" type="int"/></relation>
      |  <relation name="visit">
      |    <attribute name="pid" type="int"/>
      |    <foreignKey relation="person"><from>pid</from><to>id</to></foreignKey>
      |  </relation>
      |</schema>""".stripMargin

  test("XML schema scan: relations, attrs, constraints, partition skip") {
    val s = SchemaXml.parseSchema(schemaXml, skipRelations = _.startsWith("chartevents_"))
    assert(s.relations.map(_.name) == Seq("person", "visit"))
    val p = s.relation("person")
    assert(p.primaryKey == Seq("id") && p.uniques == Seq(Seq("name")))
    assert(!p.attr("id").nullable && p.attr("id").size.contains(10))
    assert(p.attr("id").description == "pk")
    assert(s.relation("visit").foreignKeys.head ==
      graft.core.Model.ForeignKey(Seq("pid"), "person", Seq("id")))
    // DDL generation from the parsed model
    assert(p.ddl("target") ==
      "CREATE TABLE IF NOT EXISTS `target`.`person` (`id` BIGINT NOT NULL, `name` STRING) USING PARQUET")
  }

  test("mapping XML + cluster grouping with subsumption removal") {
    val xml =
      """<mappings>
        |  <mapping id="m1"><sourceRelation>a</sourceRelation><targetRelation>x</targetRelation>
        |    <goldSql>INSERT INTO x SELECT * FROM a</goldSql></mapping>
        |  <mapping id="m2"><sourceRelation>a</sourceRelation><sourceRelation>b</sourceRelation>
        |    <targetRelation>x</targetRelation><goldSql>INSERT 2</goldSql></mapping>
        |  <mapping id="m3"><sourceRelation>c</sourceRelation><targetRelation>y</targetRelation>
        |    <goldSql>INSERT 3</goldSql></mapping>
        |</mappings>""".stripMargin
    val clusters = SchemaXml.parseMappings(xml)
    assert(clusters.map(_.id) == Seq("m1", "m2", "m3"))
    // m1 ⊂ m2 → dropped; groups of 2 merge relation sets
    val grouped = SchemaXml.groupClusters(clusters, groupSize = 2, seed = 7)
    assert(grouped.flatMap(_.goldSql).toSet == Set("INSERT 2", "INSERT 3"))
    assert(grouped.head.sourceRelations.toSet.subsetOf(Set("a", "b", "c")))
    // seeded: deterministic
    assert(SchemaXml.groupClusters(clusters, 2, 7) == grouped)
  }
}

class EntityReadersSpec extends SparkSpec {

  test("BibTeX ingest: entry parse, author explode, dense surrogate keys") {
    val bib =
      """@article{smith2020,
        |  title = {A Study},
        |  author = {John Smith and jane doe},
        |  year = {2020},
        |}
        |@inproceedings{doe2021,
        |  title = {Another},
        |  author = {jane doe},
        |  year = {2021},
        |}""".stripMargin
    val entries = EntityReaders.parseBib(bib)
    assert(entries.map(_.citeKey) == Seq("smith2020", "doe2021"))
    assert(entries.head.fields("year") == "2020")
    val t = EntityReaders.bibTables(spark, entries)
    assert(t.publications.count() == 2)
    val authors = t.authors.orderBy("author_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(authors.toSeq == Seq((1L, "Jane Doe"), (2L, "John Smith"))) // initcap + dedup
    assert(t.pubAuthors.count() == 3)
  }

  test("DBLP JSON ingest: multi-author explode + first-of-list rule") {
    val dir = Files.createTempDirectory("graft-dblp")
    Files.writeString(dir.resolve("pubs.json"),
      """{"type": "article", "title": "T1", "year": 2020, "authors": ["A One", "B Two"], "ee": ["http://x", "http://y"]}
        |{"type": "article", "title": "T2", "year": 2021, "authors": ["A One"], "ee": ["http://z"]}
        |""".stripMargin)
    val t = EntityReaders.dblpTables(spark, dir.toString)
    assert(t.publications.count() == 2)
    assert(t.publications.select("ee").orderBy("title").collect().map(_.getString(0)).toSeq ==
      Seq("http://x", "http://z")) // first of list
    assert(t.authors.count() == 2 && t.pubAuthors.count() == 3)
  }

  test("typed CSV inference from first row + all-empty-row dropping") {
    val dir = Files.createTempDirectory("graft-csvt")
    Files.writeString(dir.resolve("c.csv"), "id,label\n1,abc\n,\n2,def\n")
    val df = EntityReaders.csvTypedByFirstRow(spark, dir.toString)
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("label").dataType.typeName == "string")
    assert(df.count() == 2) // all-empty row dropped
  }
}

class ReportRangeSpec extends SparkSpec {

  test("markdown/tsv report rendering") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0.5), ("b", 1.0)).toDF("k", "f1")
    val md = Report.markdown(df)
    assert(md.startsWith("| k | f1 |"))
    assert(md.contains("| a | 0.5000 |"))
    assert(Report.tsv(df).linesIterator.toSeq == Seq("k\tf1", "a\t0.5", "b\t1.0"))
  }

  test("csv sink round-trips a report frame") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-csvout").resolve("report")
    Report.writeCsv(Seq(("a", 0.5), ("b", 1.0)).toDF("k", "f1"), dir.toString)
    val back = s.read.option("header", true).csv(dir.toString)
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq == Seq(("a", "0.5"), ("b", "1.0")))
  }

  test("xlsx sink writes a valid one-sheet workbook with typed cells") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-xlsx").resolve("report.xlsx")
    Report.xlsx(Seq(("a & <b>", 0.5, 3L), ("c", 1.0, 4L))
      .toDF("name", "f1", "n"), path.toString)
    val zf = new java.util.zip.ZipFile(path.toFile)
    try {
      val names = zf.entries().asIterator().asScala.map(_.getName).toSet
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml").subsetOf(names),
        s"missing xlsx parts: $names")
      val sheet = scala.xml.XML.load(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val rows = (sheet \ "sheetData" \ "row").map { r =>
        (r \ "c").map { c =>
          if ((c \@ "t") == "inlineStr") (c \ "is" \ "t").text else (c \ "v").text
        }
      }
      assert(rows == Seq(
        Seq("name", "f1", "n"),
        Seq("a & <b>", "0.5", "3"), // XML-escaped on write, unescaped on read
        Seq("c", "1.0", "4")))
    } finally zf.close()
  }

  test("row-range window is stable and bounded") {
    val li = graft.core.Tables(spark, sfDir, "lineitem")
    val r = Sampling.rowRange(li, Seq("l_orderkey", "l_linenumber"), 10, 14)
    val idx = r.select("row_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    val again = Sampling.rowRange(li.repartition(7), Seq("l_orderkey", "l_linenumber"), 10, 14)
    assert(r.select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet ==
      again.select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet)
  }

  test("pass-rate: fraction perfect per group, then best over configs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("g1", "cfgA", 1.0), ("g1", "cfgA", 0.5),
      ("g1", "cfgB", 1.0), ("g1", "cfgB", 1.0),
      ("g2", "cfgA", 0.0)
    ).toDF("grp", "cfg", "f1")
    val r = Metrics.passRate(df, Seq("grp"), "cfg", "f1")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("g1" -> 1.0, "g2" -> 0.0))
  }

  test("token stats aggregate with t-CI") {
    val s = spark
    import s.implicits._
    val df = Seq(100L, 200L, 300L).toDF("tokens")
    val r = Metrics.tokenStats(df, "tokens", tQuantile = 4.303).head()
    assert(r.getLong(0) == 600L && r.getDouble(1) == 200.0)
    assert(math.abs(r.getDouble(3) - 4.303 * 100.0 / math.sqrt(3)) < 1e-9)
  }
}
