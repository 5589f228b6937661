package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 corpus-curation operators — the
  * properties the oracle hash cannot state directly.
  */
class CurationOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q103: survivors are exactly one per component, and q73 labels agree") {
    val rows = q("q103_dedup_survivors")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly one keeper per component, and it is the min doc_id
    val byComp = rows.groupBy(_._2)
    assert(byComp.forall { case (comp, members) =>
      members.count(_._3 == 1L) == 1 &&
        members.filter(_._3 == 1L).head._1 == comp &&
        comp == members.map(_._1).min
    })
    // clustered docs carry the same label q73 assigns them
    val cc = q("q73_dedup_components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.forall { case (doc, comp) =>
      rows.find(_._1 == doc).exists(_._2 == comp)
    })
  }

  test("q23: r16 row-local minhash + packed band keys ≡ explode/distinct/groupBy + string keys") {
    // the pre-r16 formulation, rebuilt inline from the same TextFunctions
    // kernels: shingle explode → DISTINCT → per-doc min aggregate, and
    // "_"-joined string band keys. The r16 kernel (row-local array_min
    // over the hashed shingle array; band keys packed as h_i·P + h_{i+1})
    // must produce the IDENTICAL candidate set and estimates — dropping
    // the distinct is exact because min over a multiset is min over its
    // set, and the key packing is a bijection since every h_j < P.
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions._
    val docs = graft.core.Tables(s, sfDir, "documents")
    val sh = docs.select($"doc_id",
      explode(wordShingles(split($"text", " "), 3)).as("shingle")).distinct()
    val aggs = (0 until 16).map(j => minhashAgg($"hm", j).as(s"h$j"))
    val mh = sh.withColumn("hm", baseHash($"shingle"))
      .groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until 4).map(j => col(s"h${4 * b + j}")): _*).as("bkey"))
    }
    val bands = mh.select($"doc_id", explode(array(bandStructs: _*)).as("bb"))
      .select($"doc_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val agree = (0 until 16)
      .map(j => when(col(s"ma.h$j") === col(s"mb.h$j"), 1).otherwise(0))
      .reduce(_ + _)
    val ref = cand
      .join(mh.as("ma"), col("doc_a") === col("ma.doc_id"))
      .join(mh.as("mb"), col("doc_b") === col("mb.doc_id"))
      .select($"doc_a", $"doc_b", (agree.cast("double") / 16).as("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ours = q("q23_minhash_lsh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ours == ref,
      s"row-local minhash diverged: only-new=${(ours -- ref).take(5)} only-old=${(ref -- ours).take(5)}")
  }

  test("q104: no benchmark docs in output; hits imply a genuinely shared shingle") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables(s, sfDir, "documents")
    val benchIds = docs.filter($"source".isin("src0", "src1"))
      .select($"doc_id").as[Long].collect().toSet
    val out = q("q104_decontaminate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(r => !benchIds.contains(r._1)), "benchmark doc leaked into output")
    assert(out.forall(r => (r._2 > 0) == (r._3 == 1L)), "flag disagrees with hit count")
    // spot-check one contaminated doc end-to-end against a direct shingle overlap
    out.find(_._3 == 1L).foreach { case (docId, nHits, _) =>
      def shingles(ids: Set[Long]) = docs
        .filter($"doc_id".isInCollection(ids))
        .select(explode(graft.functions.TextFunctions.wordShingles(
          split($"text", " "), 3)).as("sh"))
        .as[String].collect().toSet
      val overlap = shingles(Set(docId)) intersect shingles(benchIds)
      assert(overlap.size.toLong == nHits,
        s"doc $docId: counted $nHits, direct overlap ${overlap.size}")
    }
  }

  test("q105: probabilities are valid (logprob < 0) and a uniform doc scores ln(freq/total)") {
    val out = q("q105_unigram_logprob")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.forall(_._2 < 0.0), "a log-probability must be negative")
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables(s, sfDir, "documents")
    val total = docs.select(explode(split(lower($"text"), " ")).as("t")).count()
    // 1e-6 slack: the query quantizes each logprob to micro-units
    // (round-half-away), which can push a value up to 5e-7 below true ln
    assert(out.forall { case (_, lp, _) => lp >= math.log(1.0 / total) - 1e-6 },
      "mean logprob below the rarest-token floor")
  }

  test("q106: offsets are contiguous per source and seq ids are monotone") {
    val rows = q("q106_sequence_pack")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    rows.foreach { case (src, ds) =>
      val ordered = ds.sortBy(_._2)
      var expect = 0L
      ordered.foreach { case (_, doc, n, start, seq) =>
        assert(start == expect, s"$src doc $doc: offset $start, expected $expect")
        assert(seq == start / 2048, s"$src doc $doc: seq id mismatch")
        expect += n
      }
    }
  }

  test("q107: shares are a probability vector prefix in descending order") {
    val out = q("q107_skew_audit")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val shareSum = out.map(_._2).sum
    assert(shareSum > 0.0 && shareSum <= 1.0 + 1e-9, s"share sum $shareSum")
  }

  test("q145: every source keeps exactly floor(sqrt(n)) docs, the lowest ids") {
    val rows = q("q145_source_rebalance")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val n = ds.head._3
      assert(ds.forall(_._3 == n), s"$src: inconsistent n_source_docs")
      val kept = ds.filter(_._4 == 1L).map(_._1).sorted
      assert(kept.length == math.floor(math.sqrt(n.toDouble)).toLong,
        s"$src: kept ${kept.length} of $n")
      // kept set is exactly the lowest doc_ids of the source
      assert(kept.sameElements(ds.map(_._1).sorted.take(kept.length)),
        s"$src: kept docs are not the lowest ids")
    }
  }

  test("q147: one survivor per fingerprint group, and it has the max quality") {
    // recompute the fingerprint key independently so survivors can be
    // grouped without trusting the query's own grouping
    val fp = SparkEntry.queries("q26_fingerprint")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("q147_quality_survivors")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(t => fp(t._1)).foreach { case (key, g) =>
      assert(g.count(_._4 == 1L) == 1, s"group $key: != 1 survivor")
      assert(g.forall(_._3 == g.length), s"group $key: n_same mismatch")
      val s = g.find(_._4 == 1L).get
      // survivor quality is maximal; doc_id breaks exact ties
      assert(g.forall(o => o._2 < s._2 || (o._2 == s._2 && o._1 >= s._1)),
        s"group $key: survivor is not the best-quality doc")
    }
  }

  test("q150: deletes vanish, upserts win with bumped payload, untouched rows keep v0") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = q("q150_cdc_upsert")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val ids = out.map(_._1).toSet
    assert(docs.keys.filter(_ % 13 == 0).forall(!ids.contains(_)), "a deleted id survived")
    out.foreach { case (id, nChars, version) =>
      if (id % 7 == 0) {
        assert(version == 1L && nChars == docs(id) + 1000L, s"doc $id: upsert did not win")
      } else {
        assert(version == 0L && nChars == docs(id), s"doc $id: base row mutated")
      }
    }
    assert(out.length == docs.size - docs.keys.count(_ % 13 == 0))
  }

  test("q151: per-user intervals are contiguous, non-overlapping, one current row") {
    val rows = q("q151_scd2_intervals")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (user, ivs) =>
      val sorted = ivs.sortBy(_._2.getTime)
      sorted.foreach { case (_, from, to, _) =>
        assert(from.getTime < to.getTime, s"user $user: empty/inverted interval")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.getTime == b._2.getTime,
            s"user $user: gap/overlap between intervals")
        case _ =>
      }
      assert(ivs.count(_._4 == 1L) == 1, s"user $user: != 1 current row")
      assert(sorted.last._4 == 1L, s"user $user: current row is not the latest")
    }
  }

  test("q154: reranked neighbors are a subset of the stage-1 candidate clusters, cosine-sorted") {
    val approx = q("q109_ivfpq_search")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = q("q154_ann_rerank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to sorted.length),
        s"query $qid: ranks not contiguous")
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4),
        s"query $qid: cosines not descending")
    }
    // both stages answer the same query set (the exact top-3 may share NO
    // neighbors with the approx top-3 — at an 8-code toy codebook the PQ
    // distortion is large, and reordering inside the 10-wide pool is
    // precisely what stage 2 is for)
    assert(rows.map(_._1).toSet == approx.map(_._1),
      "rerank answered a different query set than the approx search")
  }

  test("q155: every Z-bucket is an aligned 8x8 tile — both dimensions stay bounded") {
    // z div 64 drops the low 6 interleaved bits (3 of x, 3 of y), so each
    // bucket covers one aligned 8x8 tile of (x, y) — the data-skipping
    // property a single-column sort cannot give the second dimension
    val rows = q("q155_zorder_layout")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (zb, xs, ys) =>
      assert(xs <= 7 && ys <= 7, s"bucket $zb spans x=$xs y=$ys — tile broken")
    }
  }

  test("q144: per-dim variance is non-negative and n_vecs is the corpus size") {
    val n = graft.core.Tables(spark, sfDir, "embeddings").count()
    val rows = q("q144_embedding_moments")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(rows.length == 64)
    assert(rows.forall(_._2 == n))
    assert(rows.forall(_._3 >= 0.0), "negative variance")
  }

  test("q192: r17 row-local CDC kernel ≡ explode + lag-window + prefix-count formulation") {
    // the pre-r17 formulation rebuilt inline: posexplode to tokens, token
    // code from the md5 60-bit prefix, boundary flags via three lag
    // windows, chunk id as the prefix count of flags, chunk hash via two
    // collect_list aggregations. The typed mapPartitions kernel must
    // produce the IDENTICAL (doc_id -> ordered chunk hash list) map over
    // the sf corpus PLUS edge rows (empty text, null text, short docs,
    // adjacent boundaries are all reachable through the corpus + extras).
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.minhashP
    val extras = Seq((100001L, ""), (100002L, null.asInstanceOf[String]),
      (100003L, "one"), (100004L, "a b c d"),
      (100005L, (0 until 300).map(i => s"t${i % 41}").mkString(" ")))
      .toDF("doc_id", "text").select($"doc_id", $"text",
        lit("x").as("source"), lit(0L).as("n_chars"), lit("en").as("lang"))
    val d = graft.core.Tables(s, sfDir, "documents")
      .select($"doc_id", $"text", $"source", $"n_chars", $"lang")
      .unionByName(extras)
    val M = 1000003L
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val old = d.select($"doc_id",
        posexplode(split(lower(coalesce($"text", lit(""))), " ")).as(Seq("pos", "tk")))
      .withColumn("c",
        (conv(substring(md5($"tk"), 1, 15), 16, 10).cast("long") % minhashP) % M)
      .withColumn("bflag", when(
        (lag($"c", 3).over(w) * 29791L + lag($"c", 2).over(w) * 961L +
          lag($"c", 1).over(w) * 31L + $"c") % M % 16 === 0, 1L).otherwise(0L))
      .withColumn("cid", coalesce(sum($"bflag").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy($"doc_id", $"cid")
      .agg(expr("md5(concat_ws(' ', transform(array_sort(collect_list(struct(pos, tk))), x -> x.tk)))").as("chunk"))
      .groupBy($"doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(cid, chunk))), x -> x.chunk)").as("chunks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val neu = graft.queries.TextQueries.cdcChunks(s, d).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(neu.keySet == old.keySet, "doc sets differ")
    val bad = old.keys.filter(k => old(k) != neu(k))
    assert(bad.isEmpty, s"chunk lists differ for docs: ${bad.take(5).mkString(",")}")
  }

  test("q192: CDC chunks re-synchronize after a leading insertion (the property fixed-stride chunking lacks)") {
    val s = spark
    import s.implicits._
    val base = (0 until 200).map(i => s"tok${i % 37}w${(i * 7) % 23}").mkString(" ")
    val df = Seq((0L, base), (1L, "inserted " + base)).toDF("doc_id", "text")
    val ch = graft.queries.TextQueries.cdcChunks(spark, df).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val (a, b) = (ch(0L), ch(1L))
    assert(a.size >= 4, s"degenerate chunking: ${a.size} chunks for 200 tokens")
    // boundaries are content-defined, so every boundary of the original
    // past the perturbation reappears shifted by one in the edited doc —
    // all chunks after the first boundary are IDENTICAL hashes
    assert(b.takeRight(a.size - 1) == a.tail,
      "chunk tail did not survive a one-token head insertion")
    assert(a.head != b.head, "head chunk must absorb the insertion")
  }

  test("q193: verified pairs are ordered, sim-bounded and verdict-consistent") {
    val rows = q("q193_lev_neardup").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pair order broken")
    assert(rows.forall { r =>
      val sim = r.getDouble(4)
      sim <= 1.0 + 1e-9 &&
        ((sim >= 0.6) == (r.getString(5) == "dup"))
    }, "sim bound or verdict consistency broken")
  }

  test("q194: every (subspace, dim) slice partitions the full corpus across its 4 clusters") {
    val n = graft.core.Tables(spark, sfDir, "embeddings").count()
    val rows = q("q194_pq_train").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(4)))
    assert(rows.length == 4 * 4 * 16)
    rows.groupBy(r => (r._1, r._3)).foreach { case (k, rs) =>
      assert(rs.map(_._4).sum == n, s"cluster sizes at $k don't sum to corpus")
    }
  }

  test("q198: every funnel rule kills at least one crafted doc, and the funnel chains") {
    // the sf corpora never trip rules 2/4/5/6 (no digits, low repetition),
    // so cross-engine agreement alone can't prove those branches — this
    // fixture has one doc engineered to die at EACH rule plus one survivor
    // digit-free, pairwise-distinct filler words (digits would trip rule 4;
    // a repeating cycle would trip rules 5/6)
    def filler(i: Int): String = "w" * (3 + i % 5) + ('a' + i % 26).toChar
    val survivor = (Seq.fill(3)("the") ++ (0 until 37).map(filler)).mkString(" ")
    val shortDoc = "tiny text here now stop"
    val thinWords = (Seq("a") ++ Seq.fill(39)("b c").flatMap(_.split(" "))).take(40).mkString(" ")
    val noStops = (0 until 40).map(i => "plain" + ('a' + i % 7).toChar).mkString(" ")
    val digitHeavy = (Seq.fill(3)("the") ++ Seq.fill(37)("12345")).mkString(" ")
    val bigramLoop = (Seq.fill(3)("the") ++
      (0 until 37).map(i => if (i % 2 == 0) "foo" else "bar")).mkString(" ")
    val block = (Seq("the", "the") ++
      (0 until 28).map(i => "blk" + ('a' + i).toChar + "w")).mkString(" ")
    val triDup = block + " " + block
    val fixture = Seq(
      (1L, survivor), (2L, shortDoc), (3L, thinWords), (4L, noStops),
      (5L, digitHeavy), (6L, bigramLoop), (7L, triDup))
    val dir = java.nio.file.Files.createTempDirectory("q198fix").toString
    spark.createDataFrame(fixture.map { case (id, t) =>
      (id, t, "en", "fix", t.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val funnel = SparkEntry.queries("q198_filter_funnel")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(funnel.map(_._1).toSeq == (1L to 6L), s"expected 6 en rules, got $funnel")
    funnel.foreach { case (rule, docsIn, killed, surv) =>
      assert(killed >= 1, s"rule $rule killed nothing — its branch is untested")
      assert(docsIn - killed == surv, s"rule $rule ledger does not balance")
    }
    // the funnel chains: rule i+1's input is rule i's survivors; one doc left
    funnel.sliding(2).foreach { case Array((_, _, _, s), (r2, d2, _, _)) =>
      assert(s == d2, s"rule $r2 docs_in $d2 != previous survivors $s")
    }
    assert(funnel.last._4 == 1L, "exactly the engineered survivor should remain")
  }

  test("q202 prefix filtering keeps pairs whose shared shingles are ALL high-df") {
    // the false-negative mode of a df-capped inverted index (q22 drops
    // posting lists over 100 docs): near-dup pairs built ENTIRELY from
    // boilerplate shingles every doc shares. Here all 120 docs carry the
    // same 30-word boilerplate (every boilerplate shingle has df≥120);
    // docs 1 and 2 are identical. An index that drops high-df postings
    // never generates the (1,2) candidate; prefix filtering must.
    val boiler = (0 until 30).map(i => "boil" + ('a' + i % 26).toChar + i / 26).mkString(" ")
    val docsFixture = (1L to 120L).map { id =>
      val tail = if (id <= 2) "" else s" uniq${id}a uniq${id}b uniq${id}c"
      (id, boiler + tail, "en", "fix", (boiler + tail).length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("q202fix").toString
    spark.createDataFrame(docsFixture)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q202_setsim_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      s"identical boilerplate-only pair (1,2) missing from ${pairs.length} pairs")
    // every reported pair really is >= 0.5 (the exact verify held)
    pairs.foreach { case (a, b, j) =>
      assert(j >= 0.5, s"pair ($a,$b) reported below threshold: $j")
    }
  }
}
