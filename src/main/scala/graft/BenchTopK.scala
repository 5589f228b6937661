package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Micro-benchmark: heap-based TopKPerKey vs window row_number on a
  * synthetic skewed table. Run: sbt "runMain graft.BenchTopK [nRows]".
  */
object BenchTopK {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate(); spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(n).select(
      (col("id") % 1000).as("key"),
      (col("id") * 2654435761L % 1000000007L).as("score"),
      col("id"),
      // a realistic wide payload makes the per-partition sort pay for data
      // movement, which is what the bounded heap avoids
      concat(lit("payload-"), col("id"), lit("-"), md5(col("id").cast("string"))).as("text"))
    def time(label: String)(f: => Long): Unit = {
      // warm + 2 measured runs
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[topkbench] $label: ${ts.min}%.2f s (n=$n, 1000 keys, k=5)")
    }
    // aggregate over the payload so column pruning cannot drop it — the
    // whole row must travel through the sort / heap
    time("window row_number") {
      val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
      df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .agg(sum(length($"text"))).head().getLong(0)
    }
    time("TopKPerKey heap") {
      graft.plans.TopK.perKey(df, Seq("key"),
        Seq(graft.plans.TopK.Order("score", ascending = false), graft.plans.TopK.Order("id")), 5)
        .agg(sum(length($"text"))).head().getLong(0)
    }
    spark.stop()
  }
}
