package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark 3.4+ `InjectRuntimeFilter`):
  * when one join side is selective, Catalyst builds a bloom filter over its
  * join keys and pushes a `might_contain` probe onto the OTHER side's scan
  * — rows that cannot match are dropped before the shuffle. At 100 TB this
  * is the difference between shuffling the full fact table and shuffling
  * only the fraction that survives the dimension's predicate. The
  * thresholds default to production sizes (10 MB creation side), so the
  * spec lowers them to demonstrate the plan shape at test scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dimension join injects a bloom-filter probe on the fact side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast joins skip runtime filters (the
      // broadcast itself already prunes on the stream side)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = graft.core.Tables(spark, sfDir, "lineitem")
      val sup = graft.core.Tables(spark, sfDir, "supplier")
        .filter(col("s_acctbal") > 9000) // selective build side
      val j = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(sum(col("l_quantity")).as("q"))
      val opt = j.queryExecution.optimizedPlan.toString()
      assert(opt.contains("bloom_filter") || opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n$opt")
      assert(j.count() >= 0) // plan executes with the probe in place
    }
  }
}
