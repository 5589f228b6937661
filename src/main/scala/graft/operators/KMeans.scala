package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Distributed Lloyd training for the IVF coarse quantizer (the library
  * form of q93's step and q133's train→assign→search stack).
  *
  * Determinism contract (what makes a TRAINED model hash-checkable):
  *   - assignment argmax breaks ties on cid (max cosine, then lowest id);
  *   - per-dim means come from micro-quantized exact LONG sums, so the
  *     (cid, dim) shuffle is associative-exact at any parallelism — two
  *     runs with different partitioning yield bit-identical centroids
  *     (pinned by `KMeansSpec`);
  *   - every dot product is a row-local left-to-right double fold.
  *
  * Scale shape per iteration: broadcast k centroids (metadata-sized), one
  * map-side assignment pass, one (cid, dim, long) partial-sum shuffle.
  * Iterations repeat the same plan; `localCheckpoint` truncates the tiny
  * centroid lineage so Catalyst analysis stays flat across rounds (the
  * q73 lesson applied to the training loop).
  */
object KMeans {

  /** vecs: (vec_id, embedding[float], nrm). cents: (cid, cv, cn). Returns
    * each vector's max-cosine centroid: (vec_id, embedding, nrm, cid).
    */
  def assign(s: SparkSession, vecs: DataFrame, cents: DataFrame): DataFrame = {
    import s.implicits._
    val aw = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cid")
    vecs.join(broadcast(cents))
      .select($"vec_id", $"embedding", $"nrm", $"cid",
        (dotFast($"cv", $"embedding") / ($"cn" * $"nrm")).as("ccos"))
      .withColumn("arn", row_number().over(aw))
      .filter($"arn" === 1)
      .select($"vec_id", $"embedding", $"nrm", $"cid")
  }

  /** One Lloyd iteration: assign, then recompute per-dim means from
    * 1e-3-quantized exact long sums. Returns new (cid, cv, cn). An empty
    * cluster simply vanishes (no row to average) — callers that must keep
    * k fixed re-seed, as production trainers do.
    */
  def lloydStep(s: SparkSession, vecs: DataFrame, cents: DataFrame): DataFrame = {
    import s.implicits._
    val means = assign(s, vecs, cents)
      .select($"cid", posexplode($"embedding").as(Seq("dim", "v")))
      .withColumn("q", round($"v".cast("double") * 1000.0).cast("long"))
      .groupBy($"cid", $"dim")
      .agg(sum($"q").as("sq"), count(lit(1)).as("n"))
      .select($"cid", $"dim", ($"sq".cast("double") / 1000.0 / $"n").as("m"))
    means.groupBy($"cid")
      .agg(array_sort(collect_list(struct($"dim", $"m"))).as("sm"))
      .select($"cid", expr("transform(sm, x -> x.m)").as("cv"))
      .withColumn("cn", sqrt(dotFast($"cv", $"cv")))
  }

  /** Fixed-iteration training from seed centroids. */
  def train(s: SparkSession, vecs: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    var cents = seeds
    var i = 0
    while (i < iters) {
      cents = lloydStep(s, vecs, cents).localCheckpoint(true)
      i += 1
    }
    cents
  }
}
