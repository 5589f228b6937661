package graft

// TEMPORARY measurement probe for the r16 optimization round — not part of
// the engine surface; deleted before the round ends.
object ScratchBuf {
  val buf = new scala.collection.mutable.ArrayBuffer[String]()
}

class ScratchListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = {}
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {}
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    ScratchBuf.buf.synchronized { ScratchBuf.buf += e.progress.json }
}

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = args(0)
    val b = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    b.config("spark.sql.streaming.streamingQueryListeners",
      "graft.BenchListener,graft.ScratchListener")
    sys.env.get("SCRATCH_RAWFS").foreach(_ =>
      b.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem"))
    sys.env.get("SCRATCH_ROCKS").foreach(_ =>
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    sys.env.get("SCRATCH_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 3).foreach { i =>
      ScratchBuf.buf.synchronized { ScratchBuf.buf.clear() }
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"RUN$i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.SessionHygiene.dropAllBlocks(spark)
    }
    ScratchBuf.buf.foreach(println) // last run's progress only
    spark.stop()
  }
}
