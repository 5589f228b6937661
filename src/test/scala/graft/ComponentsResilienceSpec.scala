package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.functions._
import graft.operators.Components

/** r17 (VERDICT r16 item 2): the iterative kernels must survive losing
  * their per-round persisted blocks mid-loop. The r16 formulation used
  * localCheckpoint (block loss fatal: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND —
  * the q264 error in the driver's concurrent bench) and released rounds
  * via a GLOBAL getPersistentRDDs delta (concurrent kernels could free
  * each other's live blocks). Now rounds persist WITH lineage and release
  * exactly their own RDD, so both eviction paths degrade to recompute.
  */
class ComponentsResilienceSpec extends SparkSpec {

  // a path graph needs ~diameter min-label rounds — many eviction windows
  private def pathEdges(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
  }

  test("kernels converge while every persisted block is evicted after every job") {
    val sc = spark.sparkContext
    val evictor = new SparkListener {
      override def onJobEnd(end: SparkListenerJobEnd): Unit =
        // the hostile version of SessionHygiene firing concurrently: drop
        // EVERY persisted RDD the moment any job completes
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    sc.addSparkListener(evictor)
    try {
      val cc = Components.connectedComponents(pathEdges(24), maxIter = 30)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(cc.length == 24 && cc.forall(_._2 == 0L),
        s"path graph must collapse to component 0: ${cc.filter(_._2 != 0L).take(5).mkString(",")}")
      val kc = Components.kCore(pathEdges(12), k = 2, rounds = 8)
      assert(kc.count() == 0L, "a path has an empty 2-core")
      val lp = Components.labelPropagationCanonical(
        Components.canonicalize(pathEdges(8)), rounds = 4)
      assert(lp.count() == 8L)
    } finally {
      sc.removeSparkListener(evictor)
      // the listener bus may still deliver a queued event; give it a beat
      Thread.sleep(200)
    }
  }

  test("two kernels looping concurrently never free each other's rounds") {
    // the driver's mixed concurrent bench in miniature: kCore and
    // connectedComponents interleave rounds on one SparkContext. Under the
    // old global-delta release this raced (one loop frees blocks the other
    // still reads); with per-round exact RDD tracking both must converge
    // with correct output every time.
    val s = spark
    import s.implicits._
    val clique = (for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j))
      .toDF("a", "b")
    val results = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val threads = Seq(
      new Thread(() => {
        try {
          val cc = Components.connectedComponents(pathEdges(20), maxIter = 25)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          results.put("cc",
            if (cc.length == 20 && cc.forall(_._2 == 0L)) "ok" else s"bad: ${cc.take(3).mkString(",")}")
        } catch { case e: Throwable => results.put("cc", s"threw: ${e.getMessage}") }
      }),
      new Thread(() => {
        try {
          val kc = Components.kCore(clique, k = 3, rounds = 6)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          results.put("kc",
            if (kc.length == 8 && kc.forall(_._2 == 7L)) "ok" else s"bad: ${kc.take(3).mkString(",")}")
        } catch { case e: Throwable => results.put("kc", s"threw: ${e.getMessage}") }
      }))
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(results.get("cc") == "ok", s"concurrent cc: ${results.get("cc")}")
    assert(results.get("kc") == "ok", s"concurrent kCore: ${results.get("kc")}")
  }
}
