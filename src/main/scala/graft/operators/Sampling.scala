package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded sampling operators (SURVEY §2.F2/F3, D1-D3; ref:
  * `prompt/InstanceDataHandler.py:412-493`, `PromptBuilder.py:45-110`).
  *
  * Determinism design (SURVEY §4): the reference threads ONE sequential RNG
  * through loops — unreproducible under parallelism. Here every "random"
  * draw is a pure hash of (seed, group, value), so results are identical
  * for any partitioning, any executor count, any scale. That is the only
  * sound way to do seeded sampling on a cluster; outputs are pinned by
  * golden tests rather than bit-matching NumPy.
  */
object Sampling {

  /** Modulus for the hash-derived uniform draw (shared with the SQL mirror). */
  val detRandP: Long = 1000000007L

  /** Deterministic uniform(0,1) "random" keyed by (seed, cols): first 15 hex
    * chars of md5 over the '|'-joined key → 60-bit integer mod p, then
    * (h + 0.5) / p. md5 — not xxhash64 — so the DuckDB oracle reproduces the
    * exact same draw ([[detRandSql]]); both engines stringify integer key
    * columns identically inside concat_ws.
    */
  def detRand(seed: Long, cols: Column*): Column = {
    val h = conv(substring(md5(concat_ws("|", lit(seed) +: cols: _*)), 1, 15), 16, 10)
      .cast("long") % detRandP
    (h.cast("double") + lit(0.5)) / lit(detRandP.toDouble)
  }

  /** DuckDB mirror of [[detRand]]: hex→BIGINT via bit-shift powers (a double
    * 16^k polynomial would lose bits past 2^53 — same trick as
    * `TextFunctions.baseHashSql`).
    */
  def detRandSql(seed: Long, colExprs: Seq[String]): String = {
    val key = (seed.toString +: colExprs).mkString("concat_ws('|', ", ", ", ")")
    val poly = graft.functions.TextFunctions.hexPolySql(15, key)
    s"((CAST($poly % $detRandP AS DOUBLE) + 0.5) / $detRandP.0)"
  }

  /** Deterministic train/val/test split: the split label is a pure function
    * of (seed, key), so the assignment is identical for any partitioning,
    * executor count, or scale — unlike `DataFrame.randomSplit`, whose
    * per-partition RNG re-deals rows whenever the input splits differently.
    * Row-local (zero shuffle); fractions are expected proportions, exact in
    * distribution, not exact counts.
    */
  def datasetSplit(df: DataFrame, seed: Long, keyCols: Seq[String],
      valFrac: Double = 0.05, testFrac: Double = 0.05): DataFrame = {
    val r = detRand(seed, keyCols.map(col): _*)
    df.withColumn("split",
      when(r < 1.0 - valFrac - testFrac, "train")
        .when(r < 1.0 - testFrac, "val")
        .otherwise("test"))
  }

  /** Uniform sample of n rows per group, without replacement
    * (ref: InstanceDataHandler.py:412-424 rng.choice replace=False).
    */
  def uniformPerGroup(df: DataFrame, groupCols: Seq[String], n: Int, seed: Long,
      keyCols: Seq[String]): DataFrame = {
    // tie-break on ALL key columns: the hash has only ~1e9 buckets, so
    // collisions are certain at scale and a partial tie-break would make
    // the boundary rows partition-dependent. The per-group cut runs on the
    // heap-based TopKPerKey operator: same single key-shuffle as the
    // row_number window, but O(groups·n) state instead of a full
    // partition sort — a billion-row group streams through one heap.
    import graft.plans.TopK
    val withU = df.withColumn("__u", detRand(seed, keyCols.map(col): _*))
    val cut =
      if (groupCols.isEmpty) // global draw: orderBy+limit plans as TakeOrdered (bounded heap)
        withU.orderBy(col("__u") +: keyCols.map(col): _*).limit(n)
      else TopK.perKey(withU, groupCols,
        TopK.Order("__u") +: keyCols.map(TopK.Order(_)), n)
    cut.drop("__u")
  }

  /** Distinct values per column, n each (ref: :459-474 unique variant).
    * The global cut plans as `orderBy(...).limit(n)` → TakeOrdered (bounded
    * per-partition heap + driver merge of n rows), NOT a `row_number` window:
    * an unpartitioned window funnels every distinct value of a corpus-scale
    * column through one task, while the heap streams each partition in O(n)
    * memory. Same output — identical ordering key, identical cut.
    */
  def distinctValues(df: DataFrame, column: String, n: Int, seed: Long): DataFrame = {
    val d = df.select(col(column)).filter(col(column).isNotNull).distinct()
    d.orderBy(detRand(seed, col(column)), col(column)).limit(n)
  }

  /** Weighted sampling without replacement, n per group —
    * Efraimidis–Spirakis A-ES: key = u^(1/w), take top-n by key. With
    * deterministic u this is exactly one pass + one per-group top-n window
    * (no sequential state; ref: InstanceDataHandler.py:428-457 draws
    * sequentially with inverse-frequency weights).
    */
  def weightedPerGroup(df: DataFrame, groupCols: Seq[String], weightCol: String,
      n: Int, seed: Long, keyCols: Seq[String]): DataFrame = {
    // heap-based per-group cut (see uniformPerGroup): the A-ES key ranks
    // descending, keyCols break exact-key ties ascending
    import graft.plans.TopK
    val u = detRand(seed, keyCols.map(col): _*)
    val key = pow(u, lit(1.0) / greatest(col(weightCol).cast("double"), lit(1e-12)))
    // fanout (r16): same reasoning as uniformPerGroup — md5 + pow + the
    // partial heap are scan-side; spread them when the scan under-splits
    val withK = graft.core.Tables.fanout(df).withColumn("__k", key)
    val cut =
      if (groupCols.isEmpty) // global draw: orderBy+limit plans as TakeOrdered (bounded heap)
        withK.orderBy(col("__k").desc +: keyCols.map(col): _*).limit(n)
      else TopK.perKey(withK, groupCols,
        TopK.Order("__k", ascending = false) +: keyCols.map(TopK.Order(_)), n)
    cut.drop("__k")
  }

  /** Inverse-frequency weights per (group, value): rarer values more likely
    * (ref: InstanceDataHandler.py:443-449 `(1-freq)` normalized).
    */
  def inverseFrequencyWeights(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val counts = df.groupBy(g :+ col(valueCol): _*).agg(count(lit(1)).as("__n"))
    val totals = Window.partitionBy(g: _*)
    counts
      .withColumn("__tot", sum(col("__n")).over(totals))
      .withColumn("weight", lit(1.0) - col("__n").cast("double") / col("__tot"))
      .drop("__n", "__tot")
  }

  /** Value truncation for prompt rendering
    * (ref: PromptBuilder.py:18,103-104 — 100 chars + ellipsis).
    */
  def truncate(c: Column, maxLen: Int = 100): Column =
    when(length(c) > maxLen, concat(substring(c, 1, maxLen), lit("..."))).otherwise(c)

  /** B8: stable row-index window [start, end] over a deterministic sort
    * order — the resume/limit window of `ask_LLM.py:156-160`, re-keyed on a
    * sort instead of file position (file order is not stable on a cluster).
    */
  def rowRange(df: DataFrame, sortCols: Seq[String], start: Long, end: Long): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val indexed = df.orderBy(sortCols.map(col): _*).rdd.zipWithIndex()
      .filter { case (_, i) => i >= start && i <= end }
      .map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed,
      schema.add("row_idx", org.apache.spark.sql.types.LongType, nullable = false))
  }
}
