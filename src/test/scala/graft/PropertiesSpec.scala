package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.StableMatcher
import graft.ops.Parsers

/** ScalaCheck properties (SURVEY §5.4): stable-matching invariants, parser
  * round-trips, candidate validation — pure-function layer, no Spark.
  */
object MatcherProperties extends Properties("StableMatcher") {

  private val attrs = Gen.oneOf("a", "b", "c", "d", "e")
  private val scores = Gen.choose(0.0, 1.0)

  private val prefsGen: Gen[StableMatcher.Prefs] =
    Gen.mapOf(Gen.zip(attrs,
      Gen.nonEmptyListOf(Gen.zip(attrs, scores)).map(_.distinctBy(_._1))))

  property("each round is a matching (src and tgt used at most once)") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      val byRound = StableMatcher.matchCase(fwd, bwd, maxRounds = 3).groupBy(_.round)
      byRound.values.forall { ms =>
        ms.map(_.srcAttr).distinct.size == ms.size &&
          ms.map(_.tgtAttr).distinct.size == ms.size
      }
    }

  property("matches only pair attrs present in both preference directions") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      val fwdPairs = for ((s, cs) <- fwd.toSet; (t, _) <- cs)
        yield (s.trim.toLowerCase, t.trim.toLowerCase)
      val bwdPairs = for ((t, cs) <- bwd.toSet; (s, _) <- cs)
        yield (s.trim.toLowerCase, t.trim.toLowerCase)
      StableMatcher.matchCase(fwd, bwd, 3)
        .forall(m => fwdPairs.contains((m.srcAttr, m.tgtAttr)) &&
          bwdPairs.contains((m.srcAttr, m.tgtAttr)))
    }

  property("deterministic: same input, same output") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      StableMatcher.matchCase(fwd, bwd, 3) == StableMatcher.matchCase(fwd, bwd, 3)
    }

  property("a pair never repeats across rounds") =
    forAll(prefsGen, prefsGen) { (fwd, bwd) =>
      val ms = StableMatcher.matchCase(fwd, bwd, 5)
      ms.map(m => (m.srcAttr, m.tgtAttr)).distinct.size == ms.size
    }

  // Unlike prefsGen (duplicate-FREE via distinctBy), this generator
  // INJECTS duplicated (query, cand) rows: extra copies of already-listed
  // candidates with fresh scores, interleaved before the originals.
  // Pins the clean()-time dedupe (VERDICT r9/r10 item 3) against the
  // equivalent best-score-per-candidate input.
  private val dupPrefsGen: Gen[StableMatcher.Prefs] =
    Gen.mapOf(Gen.zip(attrs, for {
      base <- Gen.nonEmptyListOf(Gen.zip(attrs, scores))
      extra <- Gen.nonEmptyListOf(Gen.zip(Gen.oneOf(base.map(_._1)), scores))
    } yield extra ++ base))

  private def bestScorePerCand(p: StableMatcher.Prefs): StableMatcher.Prefs =
    p.map { case (k, cs) =>
      k -> cs.groupBy(_._1).map { case (c, ss) => c -> ss.map(_._2).max }.toSeq
    }

  property("duplicated (query, cand) rows match exactly like the dedup'd input") =
    forAll(dupPrefsGen, dupPrefsGen) { (fwd, bwd) =>
      StableMatcher.matchCase(fwd, bwd, 5) ==
        StableMatcher.matchCase(bestScorePerCand(fwd), bestScorePerCand(bwd), 5)
    }

  property("with duplicates, each round is still a matching") =
    forAll(dupPrefsGen, dupPrefsGen) { (fwd, bwd) =>
      StableMatcher.matchCase(fwd, bwd, 3).groupBy(_.round).values.forall { ms =>
        ms.map(_.srcAttr).distinct.size == ms.size &&
          ms.map(_.tgtAttr).distinct.size == ms.size
      }
    }

  // ---- the q35 ORACLE's construction, refereed: the DuckDB replay runs
  // PREFIX-POOL batch deferred acceptance (each src offers to its first p
  // list entries, each tgt holds the best-scored offer, unmatched srcs
  // extend p to a fixed point) instead of the matcher's sequential
  // free-queue. McVitie–Wilson says they coincide whenever preferences
  // are STRICT — exactly the q35 data regime (distinct 48-bit hashes).
  // This property checks the theorem's claim on random strict instances,
  // including partial backward lists (None-safe rejections), for both
  // the single round and the two-round pair-removal protocol — so the
  // oracle's soundness argument rests on more than the five gate cases.

  /** Scala twin of the oracle SQL's gsRound/matchOf CTEs. */
  private def batchRound(fwdLists: Map[String, Vector[String]],
      bwd: Map[String, Map[String, Double]]): Set[(String, String)] = {
    if (fwdLists.isEmpty) return Set.empty
    val len = fwdLists.map { case (s, l) => s -> l.length }
    def offers(p: Map[String, Int]) = for {
      (s, pf) <- p.toSeq
      t <- fwdLists(s).take(pf)
      sc <- bwd.get(t).flatMap(_.get(s))
    } yield (t, s, sc)
    var p = fwdLists.keys.map(_ -> 1).toMap
    var stable = false
    while (!stable) {
      val matched = offers(p).groupBy(_._1)
        .map { case (_, os) => os.maxBy(_._3)._2 }.toSet
      val next = p.map { case (s, pf) =>
        s -> (if (matched(s) || pf >= len(s)) pf else pf + 1)
      }
      if (next == p) stable = true else p = next
    }
    offers(p).groupBy(_._1)
      .map { case (t, os) => (os.maxBy(_._3)._2, t) }.toSet
  }

  /** Two rounds with the matcher's pair-removal protocol, batch form. */
  private def batchTwoRounds(fwd: StableMatcher.Prefs,
      bwd: StableMatcher.Prefs): Map[Int, Set[(String, String)]] = {
    def fwdLists(p: StableMatcher.Prefs): Map[String, Vector[String]] =
      p.collect { case (k, cs) if cs.nonEmpty =>
        k -> cs.sortBy { case (c, s) => (-s, c) }.map(_._1).toVector
      }
    def bwdMap(p: StableMatcher.Prefs): Map[String, Map[String, Double]] =
      p.collect { case (k, cs) if cs.nonEmpty => k -> cs.toMap }
    val m1 = batchRound(fwdLists(fwd), bwdMap(bwd))
    if (m1.isEmpty) return Map(1 -> m1)
    val fwd2 = fwd.map { case (s, cs) =>
      s -> cs.filterNot { case (t, _) => m1.contains((s, t)) } }
    val bwd2 = bwd.map { case (t, cs) =>
      t -> cs.filterNot { case (srcA, _) => m1.contains((srcA, t)) } }
    Map(1 -> m1, 2 -> batchRound(fwdLists(fwd2), bwdMap(bwd2)))
  }

  // strict instances: per-list DISTINCT scores (drawn without replacement
  // from a shared grid), partial lists in both directions
  private val srcNames = Vector("s1", "s2", "s3", "s4", "s5", "s6")
  private val tgtNames = Vector("t1", "t2", "t3", "t4", "t5", "t6")
  private def strictSide(queries: Vector[String],
      cands: Vector[String]): Gen[StableMatcher.Prefs] =
    queries.foldLeft(Gen.const(Map.empty[String, Seq[(String, Double)]])) {
      (acc, q) =>
        for {
          m <- acc
          n <- Gen.choose(0, cands.length)
          cs <- Gen.pick(n, cands)
          ss <- Gen.pick(n, 1 to 1000)
        } yield if (n == 0) m
        else m + (q -> cs.toSeq.zip(ss.toSeq.map(_ / 1000.0)))
    }

  property("ORACLE construction: batch prefix-pool DA == sequential GS (strict prefs, 2 rounds)") =
    forAll(strictSide(srcNames, tgtNames), strictSide(tgtNames, srcNames)) {
      (fwd, bwd) =>
        val seq = StableMatcher.matchCase(fwd, bwd, maxRounds = 2)
          .groupBy(_.round).view
          .mapValues(_.map(m => (m.srcAttr, m.tgtAttr)).toSet).toMap
        val batch = batchTwoRounds(fwd, bwd).filter(_._2.nonEmpty)
        seq == batch.filter(_._2.nonEmpty) || {
          println(s"fwd=$fwd\nbwd=$bwd\nseq=$seq\nbatch=$batch"); false
        }
    }
}

object ParserProperties extends Properties("Parsers") {

  private val key = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val value = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("parseJsonMap round-trips rendered string/array maps") =
    forAll(Gen.mapOf(Gen.zip(key, Gen.nonEmptyListOf(value)))) { m =>
      val json = m.map { case (k, vs) =>
        s""""$k": [${vs.map(v => s""""$v"""").mkString(", ")}]"""
      }.mkString("{", ", ", "}")
      Parsers.parseJsonMap(json) == Some(m)
    }

  property("parseMatches finds the block regardless of surrounding prose") =
    forAll(value, Gen.alphaStr, Gen.alphaStr) { (v, pre, post) =>
      Parsers.parseMatches(s"""$pre {"matches": ["$v"]} $post""") == Seq(v)
    }

  property("validateCandidates accepts exactly the small allowed subsets") =
    forAll(Gen.someOf("a", "b", "c", "d", "e", "f", "g")) { subset =>
      val allowed = Set("a", "b", "c", "d", "e", "f", "g")
      val res = Parsers.validateCandidates(subset.mkString(", "), allowed)
      if (subset.isEmpty || subset.size > 5) res.isEmpty
      else res.contains(subset.toSeq)
    }

  property("parseConfidence only accepts 0-100") =
    forAll(Gen.choose(-500, 500)) { n =>
      val r = Parsers.parseConfidence(s"Confidence: $n")
      // the regex only matches 1-3 digit magnitudes; sign is not captured
      if (n >= 0 && n <= 100) r.contains(n)
      else r.forall(v => v >= 0 && v <= 100)
    }
}

/** md5-keyed metadata shuffle (A1/F11 determinism contract): the permutation
  * must be a pure function of (seed, identity), multiset-preserving, and
  * seed-sensitive — the properties the q129/q131 oracles rely on when they
  * replay the order with `ORDER BY md5(...)`.
  */
object DetShuffleProperties extends Properties("DetShuffle") {
  import graft.core.Model.{ColumnMeta, TestCase}
  import graft.core.Readers

  private val colName = Gen.choose(1, 30).map(i => s"col_$i")
  private val caseGen: Gen[TestCase] = for {
    id <- Gen.choose(0, 1000).map(i => s"case_$i")
    src <- Gen.nonEmptyListOf(colName).map(_.distinct.map(n => ColumnMeta(n, "text")))
    tgt <- Gen.nonEmptyListOf(colName).map(_.distinct.map(n => ColumnMeta(n, "int")))
  } yield TestCase(id, src, tgt, Seq.empty)

  property("shuffle preserves both column multisets") =
    forAll(caseGen, Gen.choose(0L, 1L << 40)) { (tc, seed) =>
      val sh = Readers.shuffleCase(tc, seed)
      sh.sourceSchema.sortBy(_.name) == tc.sourceSchema.sortBy(_.name) &&
        sh.targetSchema.sortBy(_.name) == tc.targetSchema.sortBy(_.name)
    }

  property("shuffle is a pure function of (seed, case)") =
    forAll(caseGen, Gen.choose(0L, 1L << 40)) { (tc, seed) =>
      Readers.shuffleCase(tc, seed) == Readers.shuffleCase(tc, seed)
    }

  property("different seeds permute differently (when permutable)") =
    forAll(caseGen) { tc =>
      tc.sourceSchema.size < 3 ||
        (0L to 20L).map(Readers.shuffleCase(tc, _).sourceSchema).distinct.size > 1
    }

  property("swap is an involution and reverses every gold pair") =
    forAll(caseGen, Gen.listOf(Gen.zip(colName, colName))) { (tc0, gold) =>
      val tc = tc0.copy(goldMapping = gold)
      val sw = Readers.swapCase(tc)
      Readers.swapCase(sw) == tc &&
        sw.goldMapping == tc.goldMapping.map(_.swap) &&
        sw.sourceSchema == tc.targetSchema
    }
}

/** F11 grouping invariants on arbitrary cluster sets: every kept cluster's
  * gold SQL appears exactly once in exactly one group; subsumed clusters
  * (both relation sets contained in a strictly larger cluster's) never
  * survive; the md5-seeded grouping is deterministic.
  */
object ClusterGroupProperties extends Properties("GroupClusters") {
  import graft.mapping.SchemaXml
  import graft.mapping.SchemaXml.MappingCluster

  private val rel = Gen.oneOf("r1", "r2", "r3", "r4", "r5")
  private val clusterGen: Gen[MappingCluster] = for {
    id <- Gen.choose(0, 9999).map(i => s"m_$i")
    src <- Gen.nonEmptyListOf(rel).map(_.distinct)
    tgt <- Gen.nonEmptyListOf(rel).map(_.distinct)
  } yield MappingCluster(id, src, tgt, Seq(s"SQL $id"), Seq.empty)

  private val clustersGen =
    Gen.listOf(clusterGen).map(_.distinctBy(_.id))

  property("grouping partitions the kept clusters' gold SQL") =
    forAll(clustersGen, Gen.choose(1, 4), Gen.choose(0L, 1L << 40)) { (cs, n, seed) =>
      val kept = cs.filterNot { c =>
        cs.exists(o => (o ne c) &&
          c.sourceRelations.toSet.subsetOf(o.sourceRelations.toSet) &&
          c.targetRelations.toSet.subsetOf(o.targetRelations.toSet) &&
          (o.sourceRelations.size > c.sourceRelations.size ||
            o.targetRelations.size > c.targetRelations.size))
      }
      val grouped = SchemaXml.groupClusters(cs, n, seed)
      grouped.flatMap(_.goldSql).sorted == kept.flatMap(_.goldSql).sorted &&
        grouped.forall(g => g.goldSql.size <= n)
    }

  property("grouping is a pure function of (clusters, n, seed)") =
    forAll(clustersGen, Gen.choose(1, 4), Gen.choose(0L, 1L << 40)) { (cs, n, seed) =>
      SchemaXml.groupClusters(cs, n, seed) == SchemaXml.groupClusters(cs, n, seed)
    }

  property("merged relation lists are duplicate-free and cover the group") =
    forAll(clustersGen, Gen.choose(1, 4), Gen.choose(0L, 1L << 40)) { (cs, n, seed) =>
      SchemaXml.groupClusters(cs, n, seed).forall { g =>
        g.sourceRelations.distinct == g.sourceRelations &&
          g.targetRelations.distinct == g.targetRelations
      }
    }
}

/** Codec fuzzing: the hand-written container formats must round-trip for
  * ANY parameters, and their decoders must stay total under arbitrary byte
  * corruption — either reject (None) or produce a structurally valid
  * result, never crash and never return a wrong-length frame. LZW
  * decoders are classically crash-prone on adversarial input; this is the
  * safety net for decoding 100 TB of crawled bytes.
  */
object CodecProperties extends Properties("MediaCodecs") {
  import graft.operators.Multimodal.MediaCodecs

  private val dims = Gen.zip(Gen.choose(1, 48), Gen.choose(1, 48))
  private val seeds = Gen.choose(Long.MinValue, Long.MaxValue)

  property("PNG round-trips for any dims/seed") =
    forAll(dims, seeds) { case ((w, h), seed) =>
      val Some((dw, dh, rgb)) = MediaCodecs.pngPixels(MediaCodecs.encodePng(w, h, seed))
      dw == w && dh == h && rgb.length == w * h * 3 &&
        rgb.zipWithIndex.forall { case (b, i) => (b & 0xff) == ((seed + i * 31) & 0xff) }
    }

  property("GIF LZW round-trips for any dims/frames/seed") =
    forAll(dims, Gen.choose(1, 5), seeds) { case ((w, h), nf, seed) =>
      val Some((dw, dh, fs)) = MediaCodecs.gifFrames(MediaCodecs.encodeGif(w, h, nf, seed))
      dw == w && dh == h && fs.length == nf &&
        fs.zipWithIndex.forall { case (px, f) =>
          px.length == w * h && px.zipWithIndex.forall { case (b, i) =>
            (b & 0xff) == ((seed + f * 17 + i.toLong * 31) & 0xff)
          }
        }
    }

  property("Y4M round-trips for any dims/frames/seed") =
    forAll(dims, Gen.choose(1, 5), seeds) { case ((w, h), nf, seed) =>
      val Some((dw, dh, fs)) = MediaCodecs.y4mFrames(MediaCodecs.encodeY4m(w, h, nf, seed))
      dw == w && dh == h && fs.length == nf && fs.forall(_.length == w * h * 3)
    }

  property("decoders are total under arbitrary byte corruption") =
    forAll(dims, seeds, Gen.choose(0, 10000), Gen.choose(0, 255)) {
      case ((w, h), seed, at, v) =>
        // corrupt one byte of each container at a pseudo-random position;
        // decode must terminate with None or a structurally valid result
        def corrupted(bytes: Array[Byte]): Array[Byte] = {
          val c = bytes.clone(); c(at % c.length) = v.toByte; c
        }
        val gifOk = MediaCodecs.gifFrames(corrupted(
          MediaCodecs.encodeGif(w, h, 2, seed))) match {
          case None => true
          case Some((dw, dh, fs)) => fs.forall(_.length == dw * dh)
        }
        val pngOk = MediaCodecs.pngPixels(corrupted(
          MediaCodecs.encodePng(w, h, seed))) match {
          case None => true
          case Some((dw, dh, rgb)) => rgb.length == dw * dh * 3
        }
        val y4mOk = MediaCodecs.y4mFrames(corrupted(
          MediaCodecs.encodeY4m(w, h, 2, seed))) match {
          case None => true
          case Some((dw, dh, fs)) => fs.forall(_.length == dw * dh * 3)
        }
        gifOk && pngOk && y4mOk
    }
}
