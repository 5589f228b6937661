package graft

/** Physical-plan shape assertions: the optimizations the 100 TB design
  * depends on must actually appear in the executed plan — filter/column
  * pushdown into the parquet scan, broadcast joins for small sides, no
  * cartesian products.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.queryExecution.executedPlan.toString()
  }

  test("q02: predicate and projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,45"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"),
      "projection not pruned — scan reads unused columns")
  }

  test("q07: small dimensions join via broadcast, no shuffle of nation/region") {
    val p = plan("q07_region_revenue")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q04: semi-join stays a semi-join") {
    assert(plan("q04_semi_join_active").contains("LeftSemi"))
  }

  test("q23: minhash signatures are row-local (r16) — array_min kernel, one explode") {
    val p = plan("q23_minhash_lsh")
    assert(p.contains("array_min"),
      s"row-local minhash kernel absent — signature pipeline regressed to a shuffle:\n$p")
    // structural (ADVICE r16 #3 — a column-name substring was brittle):
    // the only Generates in the plan are the bands explode, once per side
    // of the candidate self-join; the old formulation ALSO exploded the
    // shingle strings below each signature subtree, so a regression shows
    // up as extra Generate nodes in the tree section (detail paragraphs
    // repeat the name but start with "(n) Generate", excluded here)
    val generates = "(?m)^[-+:* ]*Generate ".r.findAllIn(p).size
    assert(generates == 2,
      s"expected the two band explodes only, found $generates Generate nodes:\n$p")
  }

  test("q30: query side broadcast, no cartesian product") {
    val p = plan("q30_cosine_topk")
    assert(p.contains("Broadcast"), s"query set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no partial aggregation:\n$p")
  }

  test("q33: one shuffle on user_id serves both the window and the session agg") {
    val p = plan("q33_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges:\n$p")
  }

  test("q58: nearest-demo top-k plans as TakeOrdered, not a global sort") {
    val p = plan("q58_nearest_demos")
    assert(p.contains("TakeOrdered"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("q59: schema-membership joins broadcast; classification is row-local") {
    val p = plan("q59_error_categories")
    assert(p.contains("BroadcastHashJoin"), s"membership join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"membership join shuffled:\n$p")
  }

  test("q52: cross-seed CI is two partial+final aggregations, no window") {
    val p = plan("q52_cross_seed_ci")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no partial aggregation:\n$p")
    assert(!p.contains("Window"), s"unexpected window operator:\n$p")
  }

  test("q55: yes/no majority is one aggregation with a pushed-down filter-free scan") {
    val p = plan("q55_yes_no_majority")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q75: as-of join shuffles the union once (plus the right-side pre-agg), no range join") {
    val p = plan("q75_asof_join")
    // exchange 1: purchases pre-aggregate on (user_id, ts) — q75's own
    // uniqueness step; exchange 2: the as-of union partitions on user_id.
    // The final ORDER BY is rangepartitioning, not counted here.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"as-of join should shuffle at most twice, got $hashEx:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join fell back to a product join:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected running-window fill:\n$p")
  }

  test("q79: rollup is one aggregation pass (Expand), not one scan per level") {
    val p = plan("q79_rollup_revenue")
    assert(p.contains("Expand"), s"rollup should plan an Expand:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"rollup re-scanned inputs, $scans scans:\n$p")
  }

  test("q80: explicit-value pivot is a single scan — no distinct pre-scan job") {
    val p = plan("q80_pivot_events")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"pivot should scan events once, got $scans:\n$p")
    // pivot = two chained aggregations (count on (user, type), then
    // pivotfirst on user) — two hash exchanges is the canonical shape
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"pivot should need at most two exchanges, got $hashEx:\n$p")
  }

  test("q81: split label is row-local — zero hash exchanges before the audit agg") {
    val p = plan("q81_dataset_split")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"split labeling must not shuffle, got $hashEx:\n$p")
    assert(!p.contains("Window"), s"unexpected window in split plan:\n$p")
  }

  test("q85: winnowing fingerprints are row-local — no shuffle before the final sort") {
    val p = plan("q85_winnowing")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 0, s"winnowing must not shuffle, got $hashEx:\n$p")
  }

  test("q87: df join is shuffled but the corpus-count join is broadcast") {
    val p = plan("q87_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row corpus count should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus count fell back to cartesian:\n$p")
  }

  test("q94: interval join is one hash join on user_id, not a product join") {
    val p = plan("q94_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a product join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join on user_id:\n$p")
  }

  test("q95: funnel as-of shuffles the signup/purchase union once on user_id") {
    val p = plan("q95_funnel")
    // exchange 1: the user_id window; exchange 2: the signup-day agg
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"funnel should shuffle at most twice, got $hashEx:\n$p")
    assert(!p.contains("Join"), s"forward as-of must not plan a join:\n$p")
  }

  test("q90: stratified cut runs on the heap-based TopKPerKey operator") {
    val p = plan("q90_stratified_sample")
    assert(p.contains("TopKPerKey"), s"expected the custom physical operator:\n$p")
  }

  test("q36/q50: sampling cuts run on TopKPerKey, not a window sort") {
    for (q <- Seq("q36_weighted_sample", "q50_uniform_sample")) {
      val p = plan(q)
      assert(p.contains("TopKPerKey"), s"$q: expected the custom physical operator:\n$p")
      assert(!p.contains("Window"), s"$q: window sort should be gone:\n$p")
    }
  }

  test("q98: PQ codebook is broadcast; distances are map-side") {
    val p = plan("q98_pq_encode")
    assert(p.contains("Broadcast"), s"codebook not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"codebook join shuffled:\n$p")
  }

  test("q115: chunking is row-local — no shuffle before the presentation sort") {
    val p = plan("q115_rag_chunks")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunk fan-out must not shuffle:\n$p")
    assert(!p.contains("Join"), s"chunking must not plan a join:\n$p")
  }

  test("q116: bigram count tables broadcast; no positional self-join of tokens") {
    val p = plan("q116_bigram_logprob")
    assert(p.contains("BroadcastHashJoin"), s"count tables not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token-level shuffle join at bench scale:\n$p")
  }

  test("q118: mixture resample is a broadcast-probe map-side filter") {
    val p = plan("q118_mixture_resample")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"lang counts not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for a 5-row dim:\n$p")
  }

  test("q121: shard manifest is one partial+final aggregation on shard_id") {
    val p = plan("q121_shard_manifest")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no map-side combine:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"expected <=1 hash exchange, got $hashEx:\n$p")
  }

  test("q122: incremental dedup probes via equi-joins, never a product join") {
    val p = plan("q122_incremental_dedup")
    assert(!p.contains("CartesianProduct"), s"chunk probe fell back to cartesian:\n$p")
  }

  test("q123: int8 quantization is row-local — no shuffle before the sort") {
    val p = plan("q123_int8_quantize")
    assert(!p.contains("Exchange hashpartitioning"),
      s"quantization must not shuffle:\n$p")
    assert(!p.contains("Join"), s"quantization must not plan a join:\n$p")
  }

  test("q124: both rank lists broadcast the query set; corpus never shuffles") {
    val p = plan("q124_matryoshka_recall")
    assert(p.contains("Broadcast"), s"query set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q125: lang filter becomes a partition filter on the partitioned layout") {
    val p = plan("q125_partitioned_write")
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"lang filter did not prune partitions:\n$p")
  }

  test("q126: zipf rank window runs over the bounded top-256, after TakeOrdered") {
    val p = plan("q126_zipf_audit")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-256 should plan as TakeOrdered, not a global sort:\n$p")
  }

  test("q117: quantile window runs over distinct-value counts, ranks broadcast back") {
    val p = plan("q117_quantile_audit")
    assert(p.contains("Window"), s"expected the cumulative-count window:\n$p")
    assert(p.contains("Broadcast"), s"rank probes should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"rank probe fell back to cartesian:\n$p")
  }

  test("q135: the dim filter reaches the fact scan as a dynamicpruning partition filter") {
    val p = plan("q135_dynamic_partition_pruning")
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery on the fact scan:\n$p")
    assert(p.contains("PartitionFilters"), s"fact scan lists all partitions:\n$p")
  }

  test("q133: trained-IVF stack broadcasts only centroids + query set; corpus never cartesians") {
    val p = plan("q133_ivf_trained")
    assert(p.contains("Broadcast"), s"centroid/query set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus-side cartesian:\n$p")
  }

  test("q140/q142/q143: ANN variants broadcast only the query set; corpus never cartesians") {
    for (q <- Seq("q140_ivf_multiprobe", "q142_hard_negatives", "q143_knn_label_audit")) {
      val p = plan(q)
      assert(p.contains("Broadcast"), s"$q: query set not broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: corpus-side cartesian:\n$p")
    }
  }

  test("q144/q146: moments shuffle exact longs once; classifier is row-local") {
    val pm = plan("q144_embedding_moments")
    assert(pm.contains("partial_sum") || pm.contains("partial_count"),
      s"moments lack map-side combine:\n$pm")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(pm).size
    assert(hashEx <= 1, s"moments should shuffle once, got $hashEx:\n$pm")
    val pc = plan("q146_quality_classifier")
    assert(!pc.contains("Exchange hashpartitioning"),
      s"classifier inference must not shuffle:\n$pc")
    assert(!pc.contains("Join"), s"classifier must not plan a join:\n$pc")
  }

  test("q145/q147: rebalance and survivor windows share one key shuffle") {
    for ((q, key) <- Seq("q145_source_rebalance" -> "source",
        "q147_quality_survivors" -> "fingerprint")) {
      val p = plan(q)
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashEx <= 1, s"$q: both $key windows should share one exchange, got $hashEx:\n$p")
    }
  }

  test("q149: global prefix sum never plans an unpartitioned corpus window") {
    val df = SparkEntry.queries("q149_global_token_offsets")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    // the corpus-side window must be keyed by the range id; the only
    // unpartitioned window allowed is the 8-row base-offset cumsum
    assert(p.contains("Broadcast"), s"base offsets not broadcast back:\n$p")
    assert(!p.contains("CartesianProduct"))
    val windowSpecs = "Window \\[[^\\]]*\\]".r.findAllIn(
      df.queryExecution.optimizedPlan.toString()).toList
    // optimized plan shows two Window nodes; the corpus one partitions by pid
    assert(windowSpecs.exists(_.contains("pid")),
      s"corpus cumsum lost its range partitioning:\n$windowSpecs")
  }

  test("q148: batch rollup keeps map-side combine after the bucket window") {
    val p = plan("q148_length_buckets")
    assert(p.contains("partial_count") || p.contains("partial_sum") ||
      p.contains("partial_max"), s"no partial aggregation:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"expected <=2 hash exchanges, got $hashEx:\n$p")
  }

  test("q152/q153: pair mining TakeOrders; vocab probe broadcasts, corpus never shuffles for it") {
    val pb = plan("q152_bpe_pairs")
    assert(pb.contains("TakeOrderedAndProject"),
      s"merge argmax should plan as TakeOrdered, not a global sort:\n$pb")
    val pv = plan("q153_vocab_coverage")
    assert(pv.contains("BroadcastHashJoin"), s"vocab probe not broadcast:\n$pv")
    assert(!pv.contains("SortMergeJoin"), s"corpus shuffled for a 100-row vocab:\n$pv")
  }

  test("q154: rerank broadcasts the candidate list; corpus never shuffles for stage 2") {
    val p = plan("q154_ann_rerank")
    assert(p.contains("TopKPerKey"), s"stage-1 cut should run on the heap operator:\n$p")
    assert(p.contains("Broadcast"), s"candidate list not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"rerank fell back to cartesian:\n$p")
  }

  test("q150: CDC compaction is ONE partial+final argmax aggregate, no window sort") {
    val p = plan("q150_cdc_upsert")
    assert(p.contains("partial_max"), s"argmax lacks map-side combine:\n$p")
    assert(!p.contains("Window"), s"compaction must not window-sort the corpus:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"expected one key shuffle, got $hashEx:\n$p")
  }

  test("q103/q105/q116: unbounded-table joins carry NO broadcast hint — AQE size-gates") {
    // At 100 TB the component table (web dedup: 30-50% of docs clustered),
    // the unigram vocab (hundreds of millions of entries) and the bigram
    // count table (strictly larger than vocab) all outgrow a broadcast. A
    // hint would force a driver-side build that cannot size-gate; un-hinted,
    // AQE broadcasts only when the runtime-measured size is small. The only
    // hint these plans may carry is the 1-row corpus-total scalar.
    def hints(q: String): Int = {
      val df = SparkEntry.queries(q)(spark, sfDir)
      "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).size
    }
    assert(hints("q103_dedup_survivors") == 0,
      "q103: the component-table join must be un-hinted")
    assert(hints("q105_unigram_logprob") == 1,
      "q105: only the 1-row total may be hinted, not the vocab")
    assert(hints("q116_bigram_logprob") == 1,
      "q116: only the 1-row total may be hinted, not the count tables")
  }

  test("q164: the line-df join is un-hinted (boilerplate table is vocab-sized at 100 TB)") {
    val df = SparkEntry.queries("q164_boilerplate_lines")(spark, sfDir)
    assert("ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).isEmpty,
      "q164: the df-table join must be un-hinted so AQE size-gates it")
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("partial_count"), s"line-df aggregation not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q165: the Bloom build aggregates to fixed-size words with map-side combine") {
    val df = SparkEntry.queries("q165_bloom_membership")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    // the filter build must partially aggregate bit_or — the shuffle then
    // carries at most m/32 word rows per task regardless of corpus size
    assert(p.contains("partial_bit_or"), s"Bloom word build not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the only broadcast hint anywhere is the 1-row doc_id cut scalar
    val hinted = "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).size
    assert(hinted == 3, // the 1-row cut, referenced via `all` by existing/probe/exact
      s"q165: unexpected hint count $hinted — only the 1-row cut may be hinted")
  }

  test("q166: the CMS cell build is partial+final; probe join never cartesians") {
    val p = plan("q166_cms_frequency")
    assert(p.contains("partial_count"), s"cell build not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrdered"), s"probe top-20 should plan as TakeOrdered:\n$p")
  }

  test("q167: selection ranks within weight buckets — no unpartitioned corpus window") {
    val df = SparkEntry.queries("q167_dsir_resample")(spark, sfDir)
    val windowSpecs = "Window \\[[^\\]]*\\]".r.findAllIn(
      df.queryExecution.optimizedPlan.toString()).toList
    // the corpus-sized rank partitions by the coarse bucket; the only
    // unpartitioned window is the cumsum over the bounded bucket table
    assert(windowSpecs.exists(_.contains("bk")),
      s"within-bucket rank lost its partitioning:\n$windowSpecs")
    assert(!df.queryExecution.executedPlan.toString().contains("CartesianProduct"))
  }

  test("q175: semantic-dup candidates stay cluster-restricted — no cartesian") {
    val p = plan("q175_semdedup")
    assert(!p.contains("CartesianProduct"),
      s"pairwise threshold join degenerated to all-pairs:\n$p")
    assert(p.contains("Broadcast"), s"centroid table not broadcast:\n$p")
  }

  test("q176: the corpus-component join is un-hinted (component table is corpus-scale at web dedup rates)") {
    val df = SparkEntry.queries("q176_dedup_aware_split")(spark, sfDir)
    val hints = df.queryExecution.logical.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h.name
    }
    assert(hints.isEmpty, s"unexpected join hints on the split join: $hints")
    assert(!df.queryExecution.executedPlan.toString().contains("CartesianProduct"))
  }

  test("q177: tertile ranks partition by (lang, bucket) — no per-lang corpus sort") {
    val df = SparkEntry.queries("q177_perplexity_buckets")(spark, sfDir)
    val windowSpecs = "Window \\[[^\\]]*\\]".r.findAllIn(
      df.queryExecution.optimizedPlan.toString()).toList
    // the corpus-sized row_number partitions by (lang, bk); the only
    // lang-partitioned window is the cumsum over the bounded bucket table
    assert(windowSpecs.exists(w => w.contains("bk") && w.contains("row_number")),
      s"within-bucket rank lost its bucket partitioning:\n$windowSpecs")
    assert(!df.queryExecution.executedPlan.toString().contains("CartesianProduct"))
  }

  test("q178: gradient sums are partial+final; weights flow as 1-row broadcasts") {
    val p = plan("q178_logreg_train")
    assert(p.contains("partial_sum"), s"gradient reduce not map-side combined:\n$p")
    assert(p.contains("Broadcast"), s"weight row not broadcast:\n$p")
  }

  test("q179: recall audit joins stay equi-keyed — no cartesian product") {
    val p = plan("q179_lsh_recall_audit")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      s"unexpected cartesian in the audit joins:\n$p")
    // the only condition-less joins are the two 1-row aggregate combines
    val cart = "CartesianProduct".r.findAllIn(p).size
    assert(cart == 0, s"expected 0 CartesianProduct nodes, got $cart:\n$p")
  }

  test("q180: NFC normalization is row-local — no shuffle before the sort") {
    val p = plan("q180_nfc_normalize")
    assert(p.contains("nfc_normalize"), s"custom expression absent from plan:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 0, s"normalization must not shuffle, got $hashEx:\n$p")
    // codegen participation is pinned in NfcNormalizeSpec (CodegenMode
    // explain — the AQE isFinalPlan=false string never shows stage marks)
  }

  test("q181: co-bucketed merge join has NO exchange on either fact side") {
    val p = plan("q181_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
    // the ONLY hash exchange allowed is the final small groupBy on
    // o_orderpriority — the join itself reads co-located buckets
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"bucketed join must not shuffle its inputs, got $hashEx:\n$p")
    assert(p.contains("Bucketed: true"), s"scan did not use bucketing:\n$p")
  }

  test("q182: PMI pair expansion is row-local on broadcast-restricted word sets") {
    val p = plan("q182_pmi_collocations")
    assert(!p.contains("CartesianProduct"), s"PMI must never cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"vocab restriction should broadcast the top-V set:\n$p")
  }

  test("q183: nDCG audit broadcasts only query-sized sides; corpus never cartesians") {
    val p = plan("q183_ann_ndcg")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"query set should broadcast:\n$p")
  }

  test("q185: char entropy is row-local — no shuffle before the presentation sort") {
    val p = plan("q185_char_entropy")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 0, s"entropy must not shuffle, got $hashEx:\n$p")
  }

  test("q185's char split yields code points — surrogate pairs stay whole") {
    // DuckDB's string_split(text, '') splits code points; Java's empty-
    // pattern split halves astral chars into surrogate code units. The
    // (?<=.) lookbehind form must agree with DuckDB on non-ASCII input.
    import org.apache.spark.sql.functions.{array_remove, split => ssplit, col, lit}
    val row = spark.range(1).select(lit("a😀b").as("text"))
      .select(array_remove(ssplit(col("text"), "(?<=.)"), "").as("cs"))
      .head()
    val cs = row.getSeq[String](0)
    assert(cs == Seq("a", "😀", "b"),
      s"expected 3 code points, got ${cs.map(c => c.map(_.toInt).mkString("+"))}")
  }

  test("q292: packing is one shard exchange, then a streaming partition fold") {
    val p = plan("q292_sequence_packing")
    // exactly one hash exchange (the repartition on shard); the next-fit
    // fold itself is mapPartitions — no window, no second shuffle before
    // the 16-row result sort
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shard exchange, got $exchanges:\n$p")
    assert(!p.contains("Window"), s"packing planned a window:\n$p")
  }

  test("q293: both delta-customer joins broadcast the batch side") {
    val p = plan("q293_incremental_join")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"expected the two ΔC joins to broadcast, got $bhj:\n$p")
    assert(!p.contains("CartesianProduct"), s"product join:\n$p")
  }

  test("q298: the layout decision lands in the ledger with executed evidence") {
    // the quintet contract: the decision operator records (estimate,
    // threshold, branch, evidence-from-the-executed-layout) at the moment
    // it decides, and the gated row agrees with the record
    val (rows, ledger) = graft.ops.DecisionLog.withCapture {
      SparkEntry.queries("q298_layout_decision")(spark, sfDir).collect()
    }
    assert(rows.length == 1)
    val r = rows.head
    val ds = ledger.filter(_.op == "layout_curve")
    assert(ds.size == 1, s"expected one layout decision, got $ledger")
    val d = ds.head
    assert(d.branch == r.getAs[String]("chosen"))
    assert(d.evidence ==
      s"partitionBy=b_${d.branch.head},files=${r.getAs[Long]("n_files")}",
      s"evidence '${d.evidence}' disagrees with the gated row")
    assert(d.estimate ==
      r.getAs[Long]("cost_h").toDouble / r.getAs[Long]("cost_z").toDouble)
    assert((d.estimate <= d.threshold) == (d.branch == "hilbert"))
  }

  test("no registered query plans an unpartitioned window over unbounded input") {
    // The one scale-killer class Catalyst won't warn about at plan time: a
    // window with no PARTITION BY funnels the whole input through ONE task.
    // Allowed only when the input is provably bounded — an aggregate
    // (group-cardinality-sized), a limit, or a literal relation. Streaming
    // queries are excluded: invoking them runs the micro-batch harness, and
    // their returned frame is a memory-sink read (shape pinned in
    // StreamingSpec); every batch query's optimized plan is swept here.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit,
      LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Window => LWindow}
    def bounded(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
      case _: LocalRelation | _: OneRowRelation => true
      case _ => false
    }
    val streaming = (n: String) => n.contains("streaming") || n.contains("tws") ||
      Set("q39_streaming_sessions", "q41_streaming_tumbling", "q44_session_window",
        "q45_sliding_window", "q77_streaming_dedup")(n)
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if !streaming(name)
      w <- fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }
    } yield s"$name: ${w.simpleString(80)}"
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input:\n${offenders.mkString("\n")}")
  }

  test("q186: PCA iterate flows as broadcasts; per-dim aggs are partial+final") {
    val p = plan("q186_pca_power")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"per-dim sums must map-side combine:\n$p")
    // the 64-row iterate and the 1-row norms broadcast back; the only
    // corpus-keyed shuffles are the dim/vec_id aggregations
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"iterate should broadcast:\n$p")
  }

  test("q210: KMV k-cuts run on TakeOrdered heaps over map-side-combined hashes") {
    val p = plan("q210_kmv_distinct")
    // every orderBy(u).limit(k) must be a bounded per-partition heap, not a
    // global sort; the DISTINCT over hashes must combine map-side
    assert(p.contains("TakeOrderedAndProject"), s"k-cut lost its heap:\n$p")
    assert(!p.contains("GlobalSort") && !"Sort \\[u".r.findFirstIn(p).exists(_ => p.contains("Exchange rangepartitioning")),
      s"sketch cut became a global sort:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"distinct lacks map-side combine:\n$p")
  }

  test("q218: octile planning never global-sorts; corpus histogram joins broadcast") {
    val p = plan("q218_range_partition_plan")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // the ONLY range-sort allowed is the 8-row output ORDER BY pid; sample
    // ranks must come from coarse buckets, never a range sort on v
    val ranges = "Exchange rangepartitioning\\(([a-z_]+)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(ranges.forall(_ == "pid"),
      s"range sort on a non-output column (sample rank went global): $ranges\n$p")
    assert(p.contains("Broadcast"), s"bounds/totals should broadcast:\n$p")
  }

  test("q219: neighbor pairing is shuffle equi-joins on rank, never a range join") {
    val p = plan("q219_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rank-offset join degenerated to a non-equi plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi join on grank:\n$p")
  }

  test("q224: phrase probes are equi joins over filtered postings slices") {
    val p = plan("q224_phrase_search")
    assert(!p.contains("CartesianProduct"), s"position join fell to cartesian:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi join on (doc_id, pos):\n$p")
  }

  test("q226: outlier audit is two window-free scans with a broadcast stats table") {
    val p = plan("q226_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"), s"5-row stats table not broadcast:\n$p")
    assert(!p.contains("Window"), s"unexpected window operator:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"sufficient statistics lack map-side combine:\n$p")
  }

  test("q227: rollup is ONE Expand + partial/final aggregation pass") {
    val p = plan("q227_rollup_revenue")
    assert(p.contains("Expand"), s"rollup should plan a single Expand:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"rollup aggregate lacks map-side combine:\n$p")
    assert(!p.contains("Union"), s"rollup must not re-scan per level:\n$p")
  }

  test("q228: chi-square contingency cells combine map-side, no windows") {
    val p = plan("q228_chi_square")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"cell counts lack map-side combine:\n$p")
    assert(!p.contains("Window"), s"unexpected window operator:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q229/q234: behavioral folds shuffle on user_id with hash joins only") {
    for (q <- Seq("q229_rfm_segments", "q234_retention_cohorts")) {
      val p = plan(q)
      // 1-row anchor/total frames cross-join as broadcast nested loops by
      // design — only a real cartesian over data-scale frames is a defect
      assert(!p.contains("CartesianProduct"),
        s"$q: event join degenerated to a cartesian:\n$p")
      assert(p.contains("partial_count") || p.contains("partial_min") ||
        p.contains("partial_max"),
        s"$q: event-scale aggregate lacks map-side combine:\n$p")
    }
    // the retention triangle's size join-back must broadcast (calendar-
    // bounded), never shuffle the counts frame a second time
    assert(plan("q234_retention_cohorts").contains("BroadcastHashJoin"),
      "q234: cohort-size join-back not broadcast")
  }

  test("q232: basket pair generation is a key-local equi self-join") {
    val p = plan("q232_association_rules")
    assert(!p.contains("CartesianProduct"),
      s"pair generation fell to all-pairs:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"no equi join on the basket key:\n$p")
    // the basket-size cap's count window must partition on the basket key
    // — an unpartitioned cap window would funnel the corpus through one
    // task before any pair is generated
    assert("Window \\[[^\\]]*l_orderkey".r.findFirstIn(p).isDefined ||
      "windowspecdefinition\\(l_orderkey".r.findFirstIn(p.toLowerCase).isDefined,
      s"cap window not partitioned by the basket key:\n$p")
  }

  test("q233: every cascade level is a semi/anti hash join, never a rewrite") {
    val p = plan("q233_delete_propagation")
    assert(p.contains("LeftAnti") && p.contains("LeftSemi"),
      s"cascade levels should plan semi/anti joins:\n$p")
    // the 1-row count frames cross-join as broadcast nested loops by
    // design; the FK-keyed cascade joins themselves must stay hash joins
    assert(!p.contains("CartesianProduct"),
      s"cascade join degenerated to a cartesian:\n$p")
  }

  test("q235: OHLC bars are partial+final min_by/max_by aggregates, no windows") {
    val p = plan("q235_ohlc_bars")
    assert(!p.contains("Window"),
      s"resample must not window per (type, day):\n$p")
    assert(p.contains("partial_min_by") || p.contains("min_by"),
      s"open/close lost the argmin aggregate:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_max"),
      s"bar aggregate lacks map-side combine:\n$p")
  }

  test("q236: MAD audit joins broadcast stats tables, never windows") {
    val p = plan("q236_mad_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"O(types) median/MAD tables not broadcast:\n$p")
    assert(!p.contains("Window"), s"unexpected window operator:\n$p")
  }

  test("q238: KM folds event-scale once; windows only over the bounded time table") {
    val p = plan("q238_kaplan_meier")
    assert(!p.contains("CartesianProduct"),
      s"unexpected cartesian:\n$p")
    // the at-risk cumsum and rn windows must sit above an Aggregate (the
    // <=30-row lifetime table), never the raw event scan
    assert(p.contains("Window"), s"at-risk cumsum window missing:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"per-user fold lacks map-side combine:\n$p")
  }

  test("q240: first-3 cut is the TopKPerKey heap, not a per-session window") {
    val p = plan("q240_session_paths")
    assert(p.contains("TopKPerKey"),
      s"first-3 cut lost the bounded heap operator:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 path cut should be a TakeOrdered heap:\n$p")
  }

  test("q242: CF neighbor cut is the TopKPerKey heap over key-local pairs") {
    val p = plan("q242_cf_item_neighbors")
    assert(p.contains("TopKPerKey"),
      s"top-5 neighbor cut lost the bounded heap operator:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair generation fell to all-pairs:\n$p")
  }

  test("q243: wedge and closing-edge joins stay equi joins") {
    val p = plan("q243_clustering_coefficient")
    assert(!p.contains("CartesianProduct"),
      s"triangle join degenerated to a cartesian:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi join in triangle path:\n$p")
  }

  test("q245: trailing stats window sits on the calendar-bounded counts table") {
    val p = plan("q245_volume_control_chart")
    // exactly one aggregation below the window: the (type, day) counts —
    // the sliding frame must never scan raw events
    assert(p.contains("Window"), s"trailing frame missing:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"counts fold lacks map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q246/q248: fold/stat frames broadcast; sufficient stats combine map-side") {
    for (q <- Seq("q246_ewma_smoothing", "q248_cuped")) {
      val p = plan(q)
      assert(p.contains("Broadcast"),
        s"$q: bounded stats/array frame not broadcast:\n$p")
      assert(p.contains("partial_count") || p.contains("partial_sum") ||
        p.contains("partial_min"),
        s"$q: event-scale aggregate lacks map-side combine:\n$p")
    }
  }

  test("q249: funnel steps chain user_id-keyed hash joins, no cartesian on data") {
    val p = plan("q249_funnel_steps")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"step joins lost their equi form:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"data-scale cartesian in funnel:\n$p")
  }

  test("q250/q251: monitoring queries never cartesian; counts combine map-side") {
    for (q <- Seq("q250_rolling_active_users", "q251_cusum_changepoint")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: data-scale cartesian:\n$p")
      assert(p.contains("partial_count") || p.contains("partial_min"),
        s"$q: event fold lacks map-side combine:\n$p")
    }
    // the CUSUM fold array and threshold tables are O(types) — broadcast
    assert(plan("q251_cusum_changepoint").contains("Broadcast"),
      "q251: bounded stats frames not broadcast")
  }

  test("q254: HLL registers are partial+final max aggregates, no window, no cartesian on data") {
    val p = plan("q254_hll_registers")
    assert(p.contains("partial_max") || p.contains("partial_count"),
      s"register construction lacks map-side combine:\n$p")
    assert(!p.contains("Window"), s"unexpected window in sketch build:\n$p")
    // summarize + exact-distinct join back on the 3-row group frame is
    // hash/broadcast; nothing data-scale may cartesian
    assert(!p.contains("CartesianProduct"), s"data-scale cartesian:\n$p")
  }

  test("q192: CDC chunking explodes once — no nested-HOF expression blowup") {
    val q = SparkEntry.queries("q192_cdc_chunks")(spark, sfDir)
    // the round-7 regression fixed: the analyzed tree must stay small
    // (the original collapsed-HOF form exceeded 100k nodes and cost
    // ~270 s of planning; the explode+lag form is a few hundred)
    val nodes = q.queryExecution.analyzed.map(_ => 1).sum
    assert(nodes < 2000, s"q192 logical plan exploded to $nodes nodes")
    val p = q.queryExecution.executedPlan.toString()
    // r17: the chunk derivation is a row-local typed kernel — the dup
    // rollup still explodes the chunk lists once, but no Window (lag /
    // prefix-count) may reappear anywhere in the physical plan
    assert(p.contains("Generate"), s"q192 lost the single explode:\n$p")
    assert(!p.contains("Window"),
      s"q192 regressed to the window-based chunk derivation:\n$p")
  }

  test("q259: both range predicates push into the read-back parquet scan; layout prunes most files") {
    // the default 100-char metadata cap truncates the 6-entry PushedFilters
    // list mid-string — widen it so the assertion sees the full list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan("q259_zorder_skipping")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // the two-sided window must reach the z-ordered layout's scan as
    // footer-stats-usable bounds on BOTH dimensions — that pushdown is
    // what makes the footer walk in the query the real pruning decision
    for (frag <- Seq("GreaterThanOrEqual(x,", "LessThanOrEqual(x,",
        "GreaterThanOrEqual(y,", "LessThanOrEqual(y,"))
      assert(p.contains(frag), s"predicate $frag not pushed:\n$p")
    assert(p.contains("PushedFilters:"), s"no pushed filters:\n$p")
    // and the layout must actually prune: central-quarter window on both
    // dimensions over a z-ordered layout should skip >= half the files
    val r = SparkEntry.queries("q259_zorder_skipping")(spark, sfDir).head()
    val (nFiles, pruned) = (r.getAs[Long]("n_files"), r.getAs[Long]("files_pruned"))
    assert(nFiles >= 16, s"degenerate layout: only $nFiles files")
    assert(pruned * 2 >= nFiles,
      s"z-order layout pruned only $pruned of $nFiles files for a central-quarter window")
  }

  test("q260: sketch-derived decision executes broadcast under the real threshold, shuffle when forced") {
    // default threshold (10M keys): the HLL estimate of customer's key
    // count is far below it at every test sf → broadcast branch
    val pb = graft.queries.SketchQueries
      .plannedJoin(spark, sfDir, graft.queries.SketchQueries.BroadcastKeyThreshold)
      .queryExecution.executedPlan.toString()
    assert(pb.contains("BroadcastHashJoin"), s"broadcast branch not broadcast:\n$pb")
    assert(!pb.contains("ShuffledHashJoin"), s"broadcast branch shuffled:\n$pb")
    // forced threshold 1: estimate exceeds it → SHUFFLE_HASH branch (the
    // hint outranks Catalyst's size-based auto-broadcast, so the pin
    // proves the DECISION drove the plan, not the 30 KB table size)
    // one invocation serves both assertions — each plannedJoin call runs
    // the HLL register pass and two KMV sketch jobs eagerly, so a second
    // identical call would double the test's Spark work for nothing
    val forced = graft.queries.SketchQueries.plannedJoin(spark, sfDir, 1L)
    val ps = forced.queryExecution.executedPlan.toString()
    assert(ps.contains("ShuffledHashJoin"), s"shuffle branch not shuffle-hash:\n$ps")
    assert(forced.select("chosen").head().getString(0) == "shuffle")
  }

  test("q273: skew decision executes plain join under the real threshold, salted when forced") {
    // default threshold (10M rows on the hottest key): the sampled-count
    // estimate is ~2k at test sf → plain branch, no salt column anywhere
    val plain = graft.queries.EventQueries
      .skewPlannedJoin(spark, sfDir, graft.queries.EventQueries.SaltRowThreshold)
    val pp = plain.queryExecution.executedPlan.toString()
    assert(!pp.contains("__salt"), s"plain branch carries salt plumbing:\n$pp")
    assert(plain.select("chosen").head().getString(0) == "plain")
    // forced threshold 0: estimate exceeds it → the q76 salt kernel (dim
    // exploded over 16 buckets, join keyed on event_type+__salt) — the
    // pin proves the DECISION drove the plan, not table sizes
    val forced = graft.queries.EventQueries.skewPlannedJoin(spark, sfDir, 0L)
    val pf = forced.queryExecution.executedPlan.toString()
    assert(pf.contains("__salt"), s"salted branch lost its salt keys:\n$pf")
    assert(pf.contains("Expand") || pf.contains("explode"),
      s"salted branch lost the dim explode:\n$pf")
    assert(forced.select("chosen").head().getString(0) == "salted")
    // salt never affects the algebra: identical join rows from both
    // branches (drop the 4 decision columns — threshold/chosen differ)
    assert(plain.collect().toSeq.map(_.toSeq.drop(4)) ==
      forced.collect().toSeq.map(_.toSeq.drop(4)))
  }

  test("q278: equality probe on the bucket column scans ONE of 16 buckets, agg shuffle-free") {
    val df = SparkEntry.queries("q278_bucket_pruned_lookup")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
      s"bucket pruning did not fire:\n$plan")
    // the keyed aggregate must ride the bucket layout: the only Exchange
    // allowed is the final presentation sort's range partitioning
    val aggPart = plan.split("rangepartitioning").last
    assert(!aggPart.contains("Exchange hashpartitioning"),
      s"bucketed aggregate still shuffled:\n$plan")
  }

  test("q280: HLL estimate picks the band count; coarser bandings nest inside finer") {
    import graft.queries.TextQueries
    // real ladder: ~550 docs at test sf → recall mode (8 bands of 2)
    val r8 = TextQueries.lshPlannedBands(spark, sfDir,
      TextQueries.LshBandT8, TextQueries.LshBandT4).head()
    assert(r8.getInt(1) == 8, s"default ladder picked ${r8.getInt(1)} bands")
    // forced thresholds pin the other two branches through the SAME body
    val r4 = TextQueries.lshPlannedBands(spark, sfDir, 0.0, 200000.0).head()
    assert(r4.getInt(1) == 4)
    val r2 = TextQueries.lshPlannedBands(spark, sfDir, 0.0, 0.0).head()
    assert(r2.getInt(1) == 2)
    // contiguous-run banding nests: every coarse-band collision implies
    // all its fine sub-bands collide, so candidates (and the agree>=8
    // survivors among them) can only GROW with the band count
    val (c2, c4, c8) = (r2.getLong(4), r4.getLong(4), r8.getLong(4))
    val (s2, s4, s8) = (r2.getLong(5), r4.getLong(5), r8.getLong(5))
    assert(c2 <= c4 && c4 <= c8, s"candidate nesting broken: $c2, $c4, $c8")
    assert(s2 <= s4 && s4 <= s8, s"survivor nesting broken: $s2, $s4, $s8")
    assert(c8 > 0 && s8 > 0, "recall mode found nothing — banding broken")
  }

  test("q275: sampled-size estimate drives the executed exchange's partition count") {
    // real 64 MB/partition target: the sampled estimate is KBs at test
    // scale → exactly 1 partition, and the decision column says so
    val real = graft.queries.TextQueries.adaptivePartitioning(
      spark, sfDir, graft.queries.TextQueries.TargetPartitionBytes)
    assert(real.select("n_partitions").head().getInt(0) == 1)
    // forced 4 KB target: estimate >> target → a many-partition plan; the
    // derived n must appear verbatim in the executed ShuffleExchange
    // (explicit repartition numPartitions — AQE respects it)
    val forced = graft.queries.TextQueries.adaptivePartitioning(spark, sfDir, 4096L)
    val n = forced.select("n_partitions").head().getInt(0)
    assert(n > 1, s"forced target still derived n=$n")
    forced.collect()
    val plan = forced.queryExecution.executedPlan.toString()
    assert(("hashpartitioning\\(doc_id#\\d+L?, " + n + "\\)").r
      .findFirstIn(plan).isDefined,
      s"derived n=$n not in the executed exchange:\n$plan")
    // the decision never changes the aggregate (drop the 3 decision cols)
    assert(real.collect().toSeq.map(_.toSeq.drop(3)) ==
      forced.collect().toSeq.map(_.toSeq.drop(3)))
  }

  test("q284: decision ledger captures the quartet with plan-derived evidence, scope-isolated") {
    import graft.ops.DecisionLog
    // capture scope: exactly the decisions made inside it, none leak out
    DecisionLog.drain()
    val (_, ds) = DecisionLog.withCapture {
      graft.queries.SketchQueries.plannedJoin(spark, sfDir,
        graft.queries.SketchQueries.BroadcastKeyThreshold)
      graft.queries.TextQueries.adaptivePartitioning(spark, sfDir, 4096L)
    }
    assert(ds.map(_.op) == Seq("broadcast_join", "partition_count"))
    val bj = ds.head
    assert(bj.branch == "broadcast" && bj.evidence == "BroadcastHashJoin",
      s"evidence not read from the built plan: $bj")
    // the evidence is the EXECUTED exchange's count, not the request
    val pc = ds(1)
    assert(pc.branch.startsWith("repartition-") &&
      pc.evidence == "hashpartitioning=" + pc.branch.stripPrefix("repartition-"),
      s"partition evidence diverged from branch: $pc")
    assert(DecisionLog.drain().isEmpty, "capture scope leaked into global ledger")
    // reentrancy: a nested capture must restore the OUTER sink — later
    // outer-scope decisions may not leak to the global ledger
    val (_, outer) = DecisionLog.withCapture {
      DecisionLog.record("a", 1, 1, "x", "e")
      val (_, inner) = DecisionLog.withCapture {
        DecisionLog.record("b", 2, 2, "y", "e")
      }
      assert(inner.map(_.op) == Seq("b"))
      DecisionLog.record("c", 3, 3, "z", "e")
    }
    assert(outer.map(_.op) == Seq("a", "c"),
      s"nested capture broke the outer sink: ${outer.map(_.op)}")
    assert(DecisionLog.drain().isEmpty, "reentrant capture leaked globally")
    // outside a scope, decisions land in the global operational ledger
    graft.queries.EventQueries.skewPlannedJoin(spark, sfDir, 0L)
    val g = DecisionLog.drain()
    assert(g.map(_.op) == Seq("skew_salt") && g.head.branch == "salted" &&
      g.head.evidence == "join-keys=event_type,__salt", s"global ledger: $g")
  }

  test("q266: cube is ONE scan through Expand with map-side partial aggregation") {
    val df = SparkEntry.queries("q266_cube_subtotals")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    // the operator-choice claim: all 8 grouping sets from a single Expand
    // over a single lineitem scan — not a union of 8 re-scans
    assert(p.contains("Expand"), s"cube lost its Expand shape:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"cube re-scans the fact table:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"cube aggregate lacks map-side combine:\n$p")
    assert(!p.contains("Union"), s"cube planned as a union of group-bys:\n$p")
  }
}
