package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.KMeans

/** Determinism contract of the distributed Lloyd trainer: micro-quantized
  * long sums make the learned centroids BIT-IDENTICAL under any input
  * partitioning — the property that lets a trained model hash-match across
  * cluster sizes (and the reason q133 is oracle-checkable at all).
  */
class KMeansSpec extends SparkSpec {

  private def vecs(parts: Int) = {
    graft.expressions.VectorExpressions.register(spark)
    graft.core.Tables(spark, sfDir, "embeddings")
      .repartition(parts)
      .select(col("vec_id"), col("embedding"),
        normFast(col("embedding")).as("nrm"))
  }

  private def seeds(parts: Int) = {
    val v = vecs(parts)
    v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("nrm").as("cn"))
  }

  private def centroids(parts: Int, iters: Int): Map[Long, Seq[Double]] =
    KMeans.train(spark, vecs(parts), seeds(parts), iters)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      .toMap

  test("two-iteration training is bit-identical under different partitionings") {
    val a = centroids(parts = 3, iters = 2)
    val b = centroids(parts = 13, iters = 2)
    assert(a.keySet == b.keySet)
    a.foreach { case (cid, cv) =>
      assert(cv == b(cid), s"centroid $cid drifted with partitioning")
    }
  }

  test("every vector is assigned exactly once, to an existing centroid") {
    val cents = KMeans.train(spark, vecs(4), seeds(4), iters = 1)
    val cids = cents.select("cid").collect().map(_.getLong(0)).toSet
    val asg = KMeans.assign(spark, vecs(4), cents)
      .select("vec_id", "cid").collect()
    val n = graft.core.Tables(spark, sfDir, "embeddings").count()
    assert(asg.length == n, "an input vector was dropped or duplicated")
    assert(asg.map(_.getLong(1)).forall(cids.contains), "assignment to a ghost centroid")
  }

  test("training moves the centroids off their seeds") {
    val s0 = seeds(4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val t1 = centroids(parts = 4, iters = 1)
    assert(t1.exists { case (cid, cv) => s0.get(cid).exists(_ != cv) },
      "one Lloyd step left every centroid exactly on its seed vector")
  }
}
