package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY r17 measurement probe (deleted before round end): splits a
  * query's cold cost into plan-build (analysis), physical planning, and
  * execution, then times a second warm run.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
    graft.core.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.core.Tables(spark, sfDir, "region").count()
    // per-job wall + executor-task-time accounting
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stageTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageN = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
            " stages=" + j.stageIds.mkString(",")))
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) stageTask.synchronized {
          stageTask.put(t.stageId,
            stageTask.getOrDefault(t.stageId, 0L) + t.taskMetrics.executorRunTime)
          stageN.put(t.stageId, stageN.getOrDefault(t.stageId, 0) + 1)
        }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobs.remove(j.jobId)
        if (s != null) done.add((j.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    })
    for (name <- args) {
      done.clear(); stageTask.clear()
      val fn = SparkEntry.queries(name)
      def ns = System.nanoTime()
      val t0 = ns
      val df = fn(spark, sfDir)
      val t1 = ns
      val ep = df.queryExecution.executedPlan
      val t2 = ns
      df.count()
      val t3 = ns
      // warm pass
      val w0 = ns
      val df2 = fn(spark, sfDir)
      df2.count()
      val w1 = ns
      graft.core.SessionHygiene.dropAllBlocks(spark)
      println(f"[probe] $name build ${(t1 - t0) / 1e9}%.2f plan ${(t2 - t1) / 1e9}%.2f exec ${(t3 - t2) / 1e9}%.2f warm ${(w1 - w0) / 1e9}%.2f")
      if (sys.env.contains("PROBE_JOBS")) {
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        done.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (id, sec, desc) =>
          println(f"[probe-job] $name job=$id wall=$sec%.2f $desc")
        }
        stageTask.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (sid, ms) =>
          println(f"[probe-stage] $name stage=$sid taskSec=${ms / 1e3}%.2f nTasks=${stageN.get(sid)}")
        }
        BenchListener.drain().foreach { b =>
          println(s"[probe-batch] $name rows=${b.inputRows} triggerMs=${b.triggerMs}")
        }
      }
    }
    spark.stop()
  }
}
