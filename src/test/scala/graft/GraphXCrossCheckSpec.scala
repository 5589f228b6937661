package graft

import org.apache.spark.sql.functions._

/** Independent-library validation of the iterative connected-components
  * operator: GraphX's `ConnectedComponents` (Pregel, lowest-vertex-id
  * label — the same contract as `Components.connectedComponents`) referees
  * q73 on the SAME edge set. The edges are reconstructed from q23's gated
  * output (est_jaccard >= 0.5 is exactly q73's `agree >= nPerms/2` rule),
  * so this also pins that the two queries share one candidate definition.
  */
class GraphXCrossCheckSpec extends SparkSpec {

  test("q73 components equal GraphX ConnectedComponents on the same edges") {
    val edges = SparkEntry.queries("q23_minhash_lsh")(spark, sfDir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "no LSH edges at this scale factor — vacuous test")

    val ours = SparkEntry.queries("q73_dedup_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val g = org.apache.spark.graphx.Graph.fromEdgeTuples(
      spark.sparkContext.parallelize(edges.toSeq), defaultValue = 0)
    val gx = org.apache.spark.graphx.lib.ConnectedComponents.run(g)
      .vertices.collect().map { case (v, c) => v -> c }.toMap

    assert(ours.keySet == gx.keySet,
      s"vertex sets differ: ours-only=${ours.keySet -- gx.keySet} gx-only=${gx.keySet -- ours.keySet}")
    ours.foreach { case (doc, comp) =>
      assert(gx(doc) == comp,
        s"doc $doc: engine component $comp, GraphX ${gx(doc)}")
    }
  }
}
