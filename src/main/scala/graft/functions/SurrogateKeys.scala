package graft.functions

import org.apache.spark.sql.DataFrame

/** Dense surrogate-key assignment (SURVEY §2.F4): distinct values get
  * 1-based ids in global sort order via range-partitioned sort +
  * zipWithIndex — NEVER a partition-less Window (which collapses the whole
  * keyspace into one task). Shared by q20, the BibTeX/DBLP author
  * dimensions, and any future dimension build.
  */
object SurrogateKeys {

  /** (value, id) for the distinct values of `column`, ids dense from 1 in
    * ascending value order.
    */
  def denseIds(df: DataFrame, column: String, idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(column).distinct()
      .orderBy(column)
      .rdd.map(_.getString(0)).zipWithIndex()
      .map { case (v, i) => (i + 1, v) }
      .toDF(idCol, column)
  }
}
