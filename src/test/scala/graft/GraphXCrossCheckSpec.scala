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

  test("q174 quantized PageRank tracks graphx.lib.PageRank on the same edges") {
    // same undirected edge set (both directions fed as directed edges so
    // GraphX outDegree == undirected degree); staticPageRank runs the
    // identical unnormalized iteration (r0 = 1, r' = 0.15 + 0.85·inflow)
    // in doubles — our micro-long floor divisions may lag by at most a
    // few micro per iteration, so agreement within 1e-3 is the contract
    val pairs = SparkEntry.queries("q23_minhash_lsh")(spark, sfDir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no LSH edges at this scale factor — vacuous test")
    val und = pairs ++ pairs.map { case (a, b) => (b, a) }

    val ours = SparkEntry.queries("q174_dup_pagerank")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1) / 1e6).toMap

    val g = org.apache.spark.graphx.Graph.fromEdgeTuples(
      spark.sparkContext.parallelize(und.toSeq), defaultValue = 0)
    val gx = org.apache.spark.graphx.lib.PageRank.run(g, numIter = 3, resetProb = 0.15)
      .vertices.collect().map { case (v, pr) => v -> pr }.toMap

    assert(ours.keySet == gx.keySet,
      s"vertex sets differ: ours-only=${ours.keySet -- gx.keySet} gx-only=${gx.keySet -- ours.keySet}")
    ours.foreach { case (doc, rank) =>
      assert(math.abs(rank - gx(doc)) <= 1e-3,
        s"doc $doc: engine rank $rank, GraphX ${gx(doc)}")
    }
  }

  test("q197 star components equal GraphX ConnectedComponents on the same edges") {
    val edges = SparkEntry.queries("q23_minhash_lsh")(spark, sfDir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "no LSH edges at this scale factor — vacuous test")

    val ours = SparkEntry.queries("q197_cc_star")(spark, sfDir)
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

  test("star components converge on a 300-node path where min-label propagation cannot") {
    // the pathological-diameter case the star algorithm exists for: a path
    // 0-1-2-…-299 has diameter 299, so min-label needs ~299 rounds; the
    // star contraction must finish inside a 15-round budget (log²(300)≈68
    // is the worst-case bound; observed is far lower). Min-label at the
    // SAME budget is asserted NOT converged — pinning that q197 is a
    // different algorithm, not a relabeled copy of q73's loop.
    val n = 300
    val path = spark.createDataFrame(
      (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))).toDF("a", "b")
    val star = graft.operators.Components.starComponents(path, maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.keySet == (0L until n).toSet)
    star.foreach { case (node, comp) =>
      assert(comp == 0L, s"node $node labeled $comp after star contraction")
    }
    val minLabel = graft.operators.Components
      .connectedComponents(path, maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(minLabel.values.exists(_ != 0L),
      "min-label propagation converged a 300-diameter path in 15 rounds — " +
        "the path fixture no longer exercises the diameter pathology")
  }

  test("triangleCounts: K4, a disjoint triangle, a chain, and an open star") {
    // K4 on 0-3 (every node in C(3,2)=3 triangles), triangle 10-11-12,
    // chain 20-21-22 (a wedge, NO triangle), star 30-{31,32,33} (no
    // triangle; also the hub shape degree-ordering must not hot-spot on),
    // plus duplicate and reversed edge entries the canonicalizer must fold
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (21L, 22L),
      (30L, 31L), (30L, 32L), (30L, 33L),
      (1L, 0L), (0L, 1L)) // noise: reversed + duplicate
    val df = spark.createDataFrame(edges).toDF("a", "b")
    val got = graft.operators.Components.triangleCounts(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L to 3L).foreach { v =>
      assert(got(v) == (3L, 3L), s"K4 node $v: ${got(v)}, expected (3,3)")
    }
    Seq(10L, 11L, 12L).foreach { v =>
      assert(got(v) == (2L, 1L), s"triangle node $v: ${got(v)}")
    }
    assert(got(21L) == (2L, 0L), "chain center must see the wedge but no triangle")
    assert(got(20L) == (1L, 0L) && got(22L) == (1L, 0L))
    assert(got(30L) == (3L, 0L), "star hub has degree 3 and no triangles")
    Seq(31L, 32L, 33L).foreach(v => assert(got(v) == (1L, 0L)))
    assert(got.size == 14)
  }

  // ---- independent in-memory referees for the round-budgeted graph
  //      kernels (q264 k-core, q265 LPA). The brute force implements the
  //      same FIXED-ROUND definition the DuckDB oracles unroll, so these
  //      also pin that the engine's early-exit-at-fixpoint (kCore) is
  //      output-equivalent to running the full budget. --------------------

  /** Exactly `rounds` synchronous peel rounds, straight from the paper. */
  private def bruteKCore(edges: Set[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2)
    for (_ <- 1 to rounds) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      es = es.filter(e => keep(e._1) && keep(e._2))
    }
    es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  /** Exactly `rounds` synchronous LPA rounds, neighbor mode with
    * (count desc, label asc) tie-break.
    */
  private def bruteLpa(edges: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2)
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nbrs.keySet.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = nbrs.map { case (u, ns) =>
        val counts = ns.toSeq.map(lbl).groupBy(identity)
          .view.mapValues(_.size).toSeq
        u -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  /** Deterministic LCG edge generator — seeded, no Random state leakage. */
  private def lcgGraph(seed: Long, n: Int, m: Int): Set[(Long, Long)] = {
    var x = seed
    def next(bound: Int): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.floorMod(x >>> 33, bound).toLong
    }
    (1 to m).map(_ => (next(n), next(n))).filter(e => e._1 != e._2).toSet
  }

  test("kCore equals an in-memory fixed-round peel (random, path, clique)") {
    val graphs: Seq[(String, Set[(Long, Long)])] = Seq(
      "sparse" -> lcgGraph(1L, 30, 25),
      "medium" -> lcgGraph(2L, 30, 60),
      "dense" -> lcgGraph(3L, 20, 80),
      // 30-node path: k=2 peels one node per END per round, so an 8-round
      // budget STOPS before the (empty) fixpoint — both sides must agree
      // on the partial peel, which is what makes the oracle contract safe
      "path" -> (0L until 29L).map(i => (i, i + 1)).toSet,
      "clique+tail" -> ((for (i <- 0L to 4L; j <- i + 1 to 5L) yield (i, j)).toSet
        ++ Set((5L, 100L), (100L, 101L), (101L, 102L))))
    for ((name, es) <- graphs; k <- Seq(2, 3); rounds <- Seq(3, 8)) {
      val df = spark.createDataFrame(es.toSeq).toDF("a", "b")
      val got = graft.operators.Components.kCore(df, k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = bruteKCore(es, k, rounds)
      assert(got == want, s"$name k=$k rounds=$rounds: got $got want $want")
    }
  }

  test("kCore core nesting: (k+1)-core nodes are a subset of the k-core's") {
    val es = lcgGraph(7L, 40, 120)
    val df = spark.createDataFrame(es.toSeq).toDF("a", "b")
    val cores = (1 to 4).map(k =>
      k -> graft.operators.Components.kCore(df, k, rounds = 40)
        .collect().map(_.getLong(0)).toSet).toMap
    for (k <- 1 to 3)
      assert(cores(k + 1).subsetOf(cores(k)),
        s"${k + 1}-core ⊄ $k-core: ${cores(k + 1) -- cores(k)}")
    // at a fixpoint-sized budget every surviving degree is >= k
    val deg3 = graft.operators.Components.kCore(df, 3, rounds = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    deg3.foreach { case (v, d) => assert(d >= 3, s"node $v degree $d < 3") }
  }

  test("labelPropagation equals an in-memory synchronous LPA") {
    val graphs: Seq[(String, Set[(Long, Long)])] = Seq(
      "sparse" -> lcgGraph(11L, 30, 25),
      "medium" -> lcgGraph(12L, 30, 60),
      // two 4-cliques bridged by one edge: LPA must keep them as two
      // communities where connected components would merge them
      "bridged-cliques" -> ((for (i <- 0L to 2L; j <- i + 1 to 3L) yield (i, j)).toSet
        ++ (for (i <- 10L to 12L; j <- i + 1 to 13L) yield (i, j)).toSet
        + ((3L, 10L))),
      // even cycle: the bipartite shape where synchronous LPA oscillates —
      // the fixed-round definition must still be reproducible
      "cycle" -> ((0L until 10L).map(i => (i, (i + 1) % 10)).toSet))
    for ((name, es) <- graphs; rounds <- Seq(2, 4)) {
      val df = spark.createDataFrame(es.toSeq).toDF("a", "b")
      val got = graft.operators.Components.labelPropagation(df, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = bruteLpa(es, rounds)
      assert(got == want, s"$name rounds=$rounds: got $got want $want")
    }
  }

  test("q264 cross-query invariant: triangle participants live in the 2-core") {
    // a triangle is a cycle, and no peel round can delete a cycle node
    // while the cycle is intact — so q200's n_tri > 0 nodes must all
    // survive q264's k=2 peel (the converse is false: a square is in the
    // 2-core with zero triangles)
    val inTri = SparkEntry.queries("q200_triangles")(spark, sfDir)
      .filter(col("n_tri") > 0).collect().map(_.getLong(0)).toSet
    val core2 = SparkEntry.queries("q264_kcore_dedup")(spark, sfDir)
      .filter(col("k") === 2).collect().map(_.getLong(1)).toSet
    assert(inTri.subsetOf(core2),
      s"triangle nodes outside the 2-core: ${inTri -- core2}")
  }

  test("q265 communities refine q73 components on the gated edge set") {
    val comp = SparkEntry.queries("q73_dedup_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpa = SparkEntry.queries("q265_label_communities")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa.keySet == comp.keySet,
      "LPA and CC must label the same incident-node set")
    // a community never spans two components (refinement direction)
    lpa.groupBy(_._2).values.foreach { members =>
      val comps = members.keySet.map(comp)
      assert(comps.size == 1,
        s"community ${members.values.head} spans components $comps")
    }
  }
}
