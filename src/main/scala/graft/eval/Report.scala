package graft.eval

import org.apache.spark.sql.DataFrame

/** Tabular report sinks (SURVEY §2.A12; ref: `eval/eval_dataset.py:443-584`,
  * `eval/eval_ensemble.py:334-381` print tsv/markdown/excel). Aggregate
  * frames are tiny by construction — render on the driver from collect(),
  * write csv distributed.
  */
object Report {

  def markdown(df: DataFrame, maxRows: Int = 1000): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows).collect().map(_.toSeq.map {
      case null => ""
      case d: Double => f"$d%.4f"
      case v => v.toString
    })
    val header = cols.mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    (Seq(header, sep) ++ rows.map(_.mkString("| ", " | ", " |"))).mkString("\n")
  }

  def tsv(df: DataFrame, maxRows: Int = 1000): String = {
    val rows = df.limit(maxRows).collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("\t"))
    (df.columns.mkString("\t") +: rows).mkString("\n")
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true).csv(path)

  /** A12 xlsx sink (ref: `eval/eval_ensemble.py:356` — `eval_df.to_excel`,
    * one sheet, header row, no index). Dependency-free Office Open XML:
    * an .xlsx is a zip of XML parts, so the writer emits the four
    * required parts plus one worksheet; numeric cells are typed values,
    * everything else an inline string (no sharedStrings table needed).
    * Driver-side like markdown/tsv — aggregate frames are tiny by
    * construction.
    */
  def xlsx(df: DataFrame, path: String, maxRows: Int = 1000): Unit = {
    def colRef(i: Int): String = { // 0→A … 25→Z, 26→AA (bijective base 26)
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case c => c.toString
    }
    def cell(r: Int, c: Int, v: Any): String = v match {
      case null => ""
      case d: Double if d.isNaN || d.isInfinite => // <v> must be finite
        s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t>$d</t></is></c>"""
      case n @ (_: Double | _: Float | _: Int | _: Long | _: Short | _: Byte |
                _: java.math.BigDecimal) =>
        s"""<c r="${colRef(c)}${r + 1}"><v>$n</v></c>"""
      case other =>
        s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
    }
    val header = df.columns.zipWithIndex
      .map { case (n, i) => cell(0, i, n) }.mkString
    val body = df.limit(maxRows).collect().zipWithIndex.map { case (row, i) =>
      s"""<row r="${i + 2}">""" +
        row.toSeq.zipWithIndex.map { case (v, c) => cell(i + 1, c, v) }.mkString +
        "</row>"
    }.mkString
    val xmlDecl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    val parts = Seq(
      "[Content_Types].xml" -> (xmlDecl +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        "</Types>"),
      "_rels/.rels" -> (xmlDecl +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"),
      "xl/workbook.xml" -> (xmlDecl +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" -> (xmlDecl +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        "</Relationships>"),
      "xl/worksheets/sheet1.xml" -> (xmlDecl +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"""<sheetData><row r="1">$header</row>$body</sheetData></worksheet>"""))
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
