package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over an undirected edge list — the dedup-cluster
  * step of a near-duplicate pipeline: LSH/Jaccard emits PAIRS, but
  * survivor selection needs the transitive GROUP (a~b, b~c ⇒ keep one of
  * {a,b,c}). The reference has no distributed analogue (its dedup is
  * row-level drop_duplicates, `DataLoader.py:190-196`); this is the
  * Spark-native extension of that family.
  *
  * Algorithm: iterative min-label propagation. comp(v) starts at v; each
  * round sets comp(v) = min(comp(v), min over neighbors comp(u)); fixpoint
  * after eccentricity(min node) rounds. Near-dup clusters have tiny
  * diameters (dups of a page look like each other), so rounds ≈ 2-4 in
  * practice; `maxIter` caps pathological chains. At 100 TB this is the
  * textbook approach (GraphX/GraphFrames CC is the same loop); for graphs
  * with giant diameters switch to large-star/small-star contraction — not
  * needed for dedup clusters.
  *
  * Each round REFERENCES the previous labels twice (neighbor-min join +
  * left-join base), so without lineage truncation the logical plan doubles
  * per round and Catalyst analysis goes exponential (measured 3 s → 42 s
  * per round by round 4 on a 69-node graph). Each round therefore ends in
  * [[ckTruncate]]: the round's rows are materialized into a persisted RDD
  * and re-wrapped as a LogicalRDD LEAF — per-round Catalyst cost stays
  * flat and the loop is one shuffle per round. Each round's blocks are
  * unpersisted EAGERLY once the next round has materialized — waiting for
  * the ContextCleaner would let O(rounds × |labels|) copies pile up in
  * executor storage.
  *
  * r17 (VERDICT r16 item 2): this used to be `localCheckpoint(eager)`
  * with block ids harvested from a GLOBAL `sc.getPersistentRDDs` delta.
  * Two kernels looping concurrently (the driver's mixed concurrent bench)
  * could capture each other's ids in the delta and release blocks the
  * other loop still needed — and a localCheckpoint block loss is FATAL
  * (`CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`: lineage is discarded), which is
  * exactly the q264 error in BENCH_r16's concurrent block, and on a real
  * cluster is what any executor loss does to a localCheckpoint loop. Now
  * each round holds a direct reference to ITS OWN persisted RDD (nothing
  * cross-thread to misattribute) and the RDD keeps its lineage, so an
  * evicted block — concurrent hygiene, memory pressure, executor loss —
  * is recomputed instead of killing the query (spec: ComponentsSpec
  * evicts every persisted block after every job mid-loop and the kernels
  * still converge).
  */
object Components {

  /** One round's rows, materialized eagerly into a persisted RDD and
    * re-wrapped as a leaf plan (see the object comment). Returns the leaf
    * DataFrame plus the exact RDD to release once the NEXT round has
    * materialized. Shared by every round-loop kernel in this object.
    */
  private def ckTruncate(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    import org.apache.spark.sql.GraftSqlBridge
    val rdd = GraftSqlBridge.internalRdd(df).map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager: materialized before the caller drops the previous round
    (GraftSqlBridge.fromRdd(df, rdd), rdd)
  }

  /** Undirected canonical form: (lo, hi) with lo < hi, distinct, self-loops
    * dropped — the input contract of the `*Canonical` kernel entry points.
    */
  def canonicalize(edges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = edges
    .select(least(col(aCol), col(bCol)).as("lo"),
      greatest(col(aCol), col(bCol)).as("hi"))
    .filter(col("lo") =!= col("hi")).distinct()

  /** (node, component) for every node incident to an edge; component = the
    * minimum node id reachable from the node (deterministic survivor key).
    */
  def connectedComponents(
      edges: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIter: Int = 20): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    val und = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().persist()
    und.count()
    var (labels, prevRdd) = ckTruncate(
      und.select(col("src").as("node")).distinct().withColumn("comp", col("node")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und.join(labels, und("dst") === labels("node"))
        .groupBy(und("src").as("nb_node")).agg(min(col("comp")).as("nbr_comp"))
      // convergence detection piggybacks on the checkpoint's own
      // materialization job via an accumulator in a narrow pass-through —
      // one job per round instead of checkpoint + separate changed-count
      // scan. Task retries can over-count; only zero-vs-nonzero is read,
      // and a retried task that saw a change still reports nonzero.
      val acc = sc.longAccumulator(s"cc-changed-$iter")
      val stepPlan = labels.withColumnRenamed("comp", "old_comp")
        .join(nbrMin, col("node") === col("nb_node"), "left")
        .select(col("node"), col("old_comp"),
          least(col("old_comp"), coalesce(col("nbr_comp"), col("old_comp"))).as("comp"))
      val enc = org.apache.spark.sql.Encoders.row(stepPlan.schema)
      val compIdx = stepPlan.schema.fieldIndex("comp")
      val oldIdx = stepPlan.schema.fieldIndex("old_comp")
      val instrumented = stepPlan.mapPartitions { it =>
        it.map { r =>
          if (r.get(compIdx) != r.get(oldIdx)) acc.add(1L)
          r
        }
      }(enc)
      val (step, stepRdd) = ckTruncate(instrumented.toDF())
      // the new round is materialized — release the previous round's blocks
      prevRdd.unpersist(false)
      prevRdd = stepRdd
      converged = acc.value == 0L
      labels = step.select("node", "comp")
      iter += 1
    }
    und.unpersist()
    labels
  }

  /** Large-star/small-star connected components (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014) — the diameter-safe
    * alternative to `connectedComponents`. Min-label propagation needs
    * O(diameter) rounds (a 10⁶-node chain ⇒ 10⁶ shuffles); the star
    * algorithm CONTRACTS the graph toward per-component stars and provably
    * converges in O(log² n) rounds regardless of diameter — the right
    * kernel when the near-dup graph degenerates into long chains (template
    * drift: doc₁~doc₂~…~docₙ where only adjacent pairs are similar).
    *
    * One round = Large-Star ∘ Small-Star, each a single groupBy shuffle:
    *   Large-Star: per node u, m = min(Γ(u) ∪ {u}); emit (v, m) for every
    *     STRICTLY LARGER neighbor v > u (connectivity-preserving).
    *   Small-Star: orient edges large→small; per node u over its smaller
    *     neighborhood N(u), m = min(N(u)); emit (x, m) for x ∈ N(u) ∪ {u},
    *     x ≠ m.
    * Fixpoint: every component is a star rooted at its minimum node; the
    * edge list IS the (node → component-min) labeling. Convergence is
    * detected with an order-independent (count, Σ xxhash64) fingerprint of
    * the canonicalized edge set — one aggregate instead of a set-difference
    * join. Same per-round `localCheckpoint` lineage truncation as the
    * min-label loop (the plan would otherwise double every round).
    *
    * Output contract is identical to `connectedComponents`: (node, comp)
    * for every node incident to an edge, comp = min reachable node —
    * equivalence is spec'd on random graphs AND on a path graph where
    * min-label propagation at the same round budget has NOT converged.
    */
  def starComponents(
      edges: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIter: Int = 25): DataFrame = {
    // canonical undirected form (lo, hi), self-loops dropped
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("x"), col("y")).as("lo"), greatest(col("x"), col("y")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    def fingerprint(e: DataFrame): (Long, String) = {
      // Σ over a decimal(38,0) widening: order-independent AND exact under
      // ANSI mode (a raw long Σ of xxhash64 values overflows immediately)
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("lo"), col("hi")).cast(DecimalType(38, 0)))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))
      val m = sym.groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("mv"))
      canon(sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("x"), col("mv").as("y")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // already oriented large→small: (hi, lo); N(hi) = {lo}
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("mv"))
      canon(e.join(m, "hi").select(col("lo").as("x"), col("mv").as("y"))
        .unionByName(m.select(col("hi").as("x"), col("mv").as("y"))))
    }
    var (cur, prevRdd) = ckTruncate(
      canon(edges.select(col(aCol).as("x"), col(bCol).as("y"))))
    var fp = fingerprint(cur)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val (next, nextRdd) = ckTruncate(smallStar(largeStar(cur)))
      val nfp = fingerprint(next)
      prevRdd.unpersist(false)
      prevRdd = nextRdd
      cur = next
      converged = nfp == fp
      fp = nfp
      iter += 1
    }
    // at fixpoint (hi, lo) edges are (node, component-min) stars; roots
    // label themselves
    cur.select(col("hi").as("node"), col("lo").as("comp"))
      .unionByName(cur.select(col("lo"), col("lo")).distinct()
        .toDF("node", "comp"))
      .groupBy(col("node")).agg(min(col("comp")).as("comp"))
  }

  /** k-core PEELING: repeatedly delete nodes of degree < k (recomputing
    * degrees on the shrinking subgraph) — the density filter of the dedup
    * graph family. Template farms (one page copied many times) are
    * near-cliques and survive any small k; drift chains (a~b~c~… where only
    * adjacent pairs are similar) are trees/paths and the 2-core already
    * deletes them — so "in the k-core" separates the two near-dup regimes
    * that q200's triangle counts diagnose, as a SUBGRAPH rather than a
    * per-node statistic.
    *
    * Round budget semantics (what makes the operator oracle-replayable):
    * the result is DEFINED as `rounds` peel rounds. A converged peel round
    * is the identity, so the early `break` when an iteration deletes no
    * edge is output-equivalent to running the full budget — the DuckDB twin
    * unrolls exactly `rounds` rounds with no convergence test and both
    * engines compute the same function even on a graph that has NOT
    * converged in budget. Each round is two shuffles (degree aggregate +
    * semi-join restriction), both keyed on node id; per-round
    * `localCheckpoint` cuts the doubling lineage exactly like
    * [[connectedComponents]], with the same eager block release. Peel depth
    * in practice: ends of a chain erode by one node per round, so rounds ≈
    * half the longest chain; near-dup graphs converge in 1-3.
    *
    * Returns (node, degree): every node of the surviving subgraph with its
    * degree IN that subgraph (≥ k at fixpoint, by construction).
    */
  def kCore(
      edges: DataFrame, k: Int, rounds: Int = 8,
      aCol: String = "a", bCol: String = "b"): DataFrame =
    kCoreCanonical(canonicalize(edges, aCol, bCol), k, rounds)

  /** [[kCore]] body for input ALREADY in canonical (lo, hi) form — callers
    * that re-peel one materialized edge set (q264 runs three k values)
    * skip re-canonicalizing (a distinct shuffle) per call.
    */
  def kCoreCanonical(canon: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("lo").as("v")).unionByName(e.select(col("hi").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    var (cur, prevRdd) = ckTruncate(canon)
    var edgeCount = cur.count()
    var iter = 0
    var converged = false
    while (!converged && iter < rounds) {
      val keep = degrees(cur).filter(col("deg") >= k).select(col("v"))
      val (next, nextRdd) = ckTruncate(cur
        .join(keep.withColumnRenamed("v", "lo"), Seq("lo"), "left_semi")
        .join(keep.withColumnRenamed("v", "hi"), Seq("hi"), "left_semi")
        .select(col("lo"), col("hi")))
      val nextCount = next.count()
      prevRdd.unpersist(false)
      prevRdd = nextRdd
      converged = nextCount == edgeCount
      edgeCount = nextCount
      cur = next
      iter += 1
    }
    // materialize the result BEFORE releasing the final round's blocks —
    // consumers then read the result's own persisted rows
    val (out, _) = ckTruncate(degrees(cur)
      .select(col("v").as("node"), col("deg").cast("long").as("degree")))
    prevRdd.unpersist(false)
    out
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), made DETERMINISTIC: every node starts labeled with its own id;
    * each round every node simultaneously adopts the most frequent label
    * among its NEIGHBORS, ties broken by smallest label. Communities are
    * finer than connected components (q73/q197 merge everything reachable;
    * LPA splits a component along sparse cuts) — the distinction a dedup
    * pipeline needs when one LSH component contains two template families
    * bridged by a single drifted pair.
    *
    * Classic LPA is nondeterministic (random tie-breaks, random visit
    * order) and synchronous LPA can OSCILLATE on bipartite structures — so
    * the operator is DEFINED as exactly `rounds` synchronous rounds (no
    * convergence cut), which makes it a pure function of the edge set that
    * a SQL twin replays by unrolling the same number of rounds. The
    * argmax-by-(count, smallest-label) is ONE aggregate, no window: the
    * composite integer key `cnt·2³² − lbl` is strictly monotone in count
    * and strictly anti-monotone in label, so `max(struct(key, lbl))` IS the
    * deterministic mode (requires 0 ≤ label < 2³¹ — node ids here are doc
    * ids). Per round: one join keyed on node id + one (node, lbl)
    * map-side-combined count + one node-keyed argmax — all on the same
    * shuffle key; `localCheckpoint` per round cuts the doubling lineage.
    *
    * Returns (node, lbl) for every node incident to an edge.
    */
  def labelPropagation(
      edges: DataFrame, rounds: Int,
      aCol: String = "a", bCol: String = "b"): DataFrame =
    labelPropagationCanonical(canonicalize(edges, aCol, bCol), rounds)

  /** [[labelPropagation]] body for input already in canonical (lo, hi)
    * form (same contract as [[kCoreCanonical]]).
    */
  def labelPropagationCanonical(canon: DataFrame, rounds: Int): DataFrame = {
    val sym = canon.select(col("lo").as("u"), col("hi").as("v"))
      .unionByName(canon.select(col("hi").as("u"), col("lo").as("v")))
      .persist()
    sym.count()
    // The composite argmax key cnt·2³² − lbl is only injective while
    // 0 ≤ lbl < 2³¹; enforce it (one cheap agg on the cached edges)
    // rather than silently corrupting the tie-break past that domain.
    val idRow = sym.agg(max(col("u").cast("long")),
      min(col("u").cast("long"))).head()
    if (!idRow.isNullAt(0)) {
      val (maxId, minId) = (idRow.getLong(0), idRow.getLong(1))
      require(minId >= 0 && maxId < (1L << 31),
        s"labelPropagation needs node ids in [0, 2^31); got [$minId, $maxId]")
    }
    var (labels, prevRdd) = ckTruncate(
      sym.select(col("u").as("node")).distinct().withColumn("lbl", col("node")))
    var iter = 0
    while (iter < rounds) {
      val counts = sym.join(labels, sym("v") === labels("node"))
        .groupBy(sym("u").as("cu"), col("lbl")).agg(count(lit(1)).as("cnt"))
      val (next, nextRdd) = ckTruncate(counts
        .groupBy(col("cu").as("node"))
        .agg(max(struct((col("cnt") * lit(1L << 32) - col("lbl")).as("key"),
          col("lbl").as("lbl"))).as("m"))
        .select(col("node"), col("m.lbl").as("lbl")))
      prevRdd.unpersist(false)
      prevRdd = nextRdd
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Per-node triangle participation + degree over an undirected edge list
    * (canonicalized and de-duped internally). Degree-ordered orientation:
    * every edge points low→high in (degree, id) order, so wedge enumeration
    * fans out by ORIENTED out-degree — O(√m) bounded on any graph (the
    * arboricity argument), immune to the hub nodes an id-ordered
    * enumeration would hot-spot on. Each triangle is found exactly once
    * (its two lowest-order corners form the wedge), then exploded to its
    * 3 corners. Returns (node, degree, n_tri); nodes in no triangle get 0.
    */
  def triangleCounts(
      edges: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("v")).unionByName(canon.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val e = canon
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(fwd, col("a")).otherwise(col("b")).as("src"),
        when(fwd, col("b")).otherwise(col("a")).as("dst"),
        when(fwd, col("db")).otherwise(col("da")).as("dst_deg"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.src") === col("e2.src") &&
        (col("e1.dst_deg") < col("e2.dst_deg") ||
          (col("e1.dst_deg") === col("e2.dst_deg") && col("e1.dst") < col("e2.dst"))))
      .join(e.as("e3"), col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    val perNode = tri.select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("node"), col("deg").cast("long").as("degree"),
        coalesce(col("n_tri"), lit(0L)).cast("long").as("n_tri"))
  }
}
