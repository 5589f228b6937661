package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated test tables (TESTDATA.md).
  *
  * All engine queries take `(SparkSession, sfDir)` and resolve tables through
  * here so the same code runs at any scale factor. At cluster scale the same
  * contract points at a distributed FS path; nothing here is local-mode-only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
