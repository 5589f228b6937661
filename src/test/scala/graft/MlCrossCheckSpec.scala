package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Independent-library validation: Spark ML's own MinHashLSH (seeded, so
  * deterministic) referees the engine's md5-minhash LSH on the same
  * 3-gram shingle sets. Exact Jaccard is the shared ground truth; at
  * sf0.001 the corpus contains 27 pairs with exact J >= 0.9 (generated
  * near-dups). Both implementations must surface that high-similarity
  * core, and neither may report a confident similarity that exact Jaccard
  * contradicts — the two-sided check that catches a silently-broken hash
  * family in either direction.
  */
class MlCrossCheckSpec extends SparkSpec {

  private lazy val shingled = {
    val d = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    d.select(col("doc_id"), array_distinct(col("sh")).as("sh"))
  }

  /** exact pairwise Jaccard over distinct shingles (the ground truth). */
  private lazy val exactJaccard: Map[(Long, Long), Double] = {
    val ex = shingled.select(col("doc_id"), explode(col("sh")).as("s")).distinct()
    val n = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter.join(n.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(n.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("both LSH families surface the exact-Jaccard >= 0.9 near-dup core") {
    val hi = exactJaccard.filter(_._2 >= 0.9).keySet
    assert(hi.size >= 20, s"expected a generated near-dup core, got ${hi.size} pairs")

    // engine side: q23's banded candidates
    val ours = SparkEntry.queries("q23_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oursMissed = hi -- ours
    // 4 bands x 4 rows: per-pair collision is ~98.6% at J=0.9, and the
    // md5 family is deterministic, so this count is dataset-pinned
    assert(oursMissed.size <= hi.size / 10,
      s"engine LSH missed ${oursMissed.size} of ${hi.size} high-sim pairs: $oursMissed")

    // referee side: spark.ml MinHashLSH (8 tables, fixed seed) over the
    // same shingle sets, distance threshold 0.5 (J >= 0.5)
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    val cv = new CountVectorizer().setInputCol("sh").setOutputCol("features")
      .setBinary(true).fit(shingled)
    val vecs = cv.transform(shingled)
    val lsh = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    val ml = lsh.approxSimilarityJoin(vecs, vecs, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mlMissed = hi -- ml
    assert(mlMissed.isEmpty,
      s"spark.ml MinHashLSH missed high-sim pairs: $mlMissed")

    // precision, both directions: a confident estimate must not contradict
    // exact Jaccard (estimated >= 14/16 agreement => exact >= 0.5)
    val confident = SparkEntry.queries("q23_minhash_lsh")(spark, sfDir)
      .filter(col("est_jaccard") >= 14.0 / 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    confident.foreach { p =>
      assert(exactJaccard.getOrElse(p, 0.0) >= 0.5,
        s"engine pair $p estimated >=0.875 but exact J=${exactJaccard.getOrElse(p, 0.0)}")
    }
  }

  test("q22's df-filtered index keeps the high-similarity core with faithful scores") {
    val hi = exactJaccard.filter(_._2 >= 0.9)
    val q22 = SparkEntry.queries("q22_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    hi.foreach { case (pair, exact) =>
      assert(q22.contains(pair),
        s"df filter dropped high-sim pair $pair (exact J=$exact)")
      // the df<=100 filter can only shrink the shingle universe; at this
      // scale nothing crosses the cap, so scores match near-exactly
      assert(math.abs(q22(pair) - exact) < 0.05,
        s"pair $pair: q22 J=${q22(pair)} vs exact $exact")
    }
  }

  test("q144 quantized moments agree with ml.stat.Summarizer within quantization error") {
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.ml.stat.Summarizer
    val toVec = udf((xs: Seq[Float]) =>
      Vectors.dense(xs.map(_.toDouble).toArray))
    val vecs = graft.core.Tables(spark, sfDir, "embeddings")
      .select(toVec(col("embedding")).as("v"))
    val row = vecs.select(
      Summarizer.metrics("mean", "variance").summary(col("v")).as("s"))
      .select("s.mean", "s.variance").head()
    val mlMean = row.getAs[org.apache.spark.ml.linalg.Vector](0)
    val mlVar = row.getAs[org.apache.spark.ml.linalg.Vector](1)
    val n = graft.core.Tables(spark, sfDir, "embeddings").count().toDouble
    val ours = SparkEntry.queries("q144_embedding_moments")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
    ours.foreach { case (dim, mean, varPop) =>
      assert(math.abs(mean - mlMean(dim)) < 2e-3,
        s"dim $dim: mean $mean vs Summarizer ${mlMean(dim)}")
      // Summarizer reports SAMPLE variance; ours is population
      assert(math.abs(varPop * n / (n - 1) - mlVar(dim)) < 2e-3,
        s"dim $dim: variance $varPop vs Summarizer ${mlVar(dim)}")
    }
  }
}
