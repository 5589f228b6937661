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
}
