package graft

import graft.operators.StableMatcher
import graft.operators.StableMatcher.Match

class StableMatcherSpec extends SparkSpec {

  private def prefs(m: (String, Seq[(String, Double)])*): StableMatcher.Prefs = m.toMap

  test("mutual best preferences match in round 1") {
    val fwd = prefs("s1" -> Seq("t1" -> 0.9, "t2" -> 0.1), "s2" -> Seq("t2" -> 0.8, "t1" -> 0.2))
    val bwd = prefs("t1" -> Seq("s1" -> 0.9, "s2" -> 0.2), "t2" -> Seq("s2" -> 0.8, "s1" -> 0.1))
    val m = StableMatcher.matchCase(fwd, bwd, maxRounds = 1)
    assert(m.toSet == Set(Match("s1", "t1", 1), Match("s2", "t2", 1)))
  }

  test("a challenger with an EQUAL score does not displace (strict >)") {
    // both sources want t1 equally from t1's perspective: first engaged stays
    val fwd = prefs("s1" -> Seq("t1" -> 0.9), "s2" -> Seq("t1" -> 0.9))
    val bwd = prefs("t1" -> Seq("s1" -> 0.5, "s2" -> 0.5))
    val m = StableMatcher.matchCase(fwd, bwd, maxRounds = 1)
    // s1 proposes first (sorted free queue); s2's equal score must not win
    assert(m == Seq(Match("s1", "t1", 1)))
  }

  test("a strictly better challenger displaces the incumbent") {
    val fwd = prefs("s1" -> Seq("t1" -> 0.9), "s2" -> Seq("t1" -> 0.9))
    val bwd = prefs("t1" -> Seq("s1" -> 0.4, "s2" -> 0.6))
    val m = StableMatcher.matchCase(fwd, bwd, maxRounds = 1)
    assert(m == Seq(Match("s2", "t1", 1)))
  }

  test("sentinel no-match options are dropped up front") {
    val fwd = prefs("s1" -> Seq("There is no match." -> 1.0, "t1" -> 0.3))
    val bwd = prefs("t1" -> Seq("s1" -> 0.3))
    val m = StableMatcher.matchCase(fwd, bwd, maxRounds = 1)
    assert(m == Seq(Match("s1", "t1", 1)))
  }

  test("a proposer absent from the target's list cannot engage it") {
    val fwd = prefs("s1" -> Seq("t1" -> 0.9))
    val bwd = prefs("t1" -> Seq("s2" -> 0.5)) // s1 not listed
    assert(StableMatcher.matchCase(fwd, bwd, maxRounds = 3).isEmpty)
  }

  test("round 2 yields second-tier matches after pair removal") {
    val fwd = prefs("s1" -> Seq("t1" -> 0.9, "t2" -> 0.5))
    val bwd = prefs("t1" -> Seq("s1" -> 0.9), "t2" -> Seq("s1" -> 0.5))
    val m = StableMatcher.matchCase(fwd, bwd, maxRounds = 2)
    assert(m == Seq(Match("s1", "t1", 1), Match("s1", "t2", 2)))
    // round slicing keeps the top tier only
    assert(StableMatcher.matchCase(fwd, bwd, maxRounds = 1) == Seq(Match("s1", "t1", 1)))
  }

  test("terminates when a round produces no new match") {
    val fwd = prefs("s1" -> Seq("t1" -> 0.9))
    val bwd = prefs("t1" -> Seq("s1" -> 0.9))
    val m = StableMatcher.matchCase(fwd, bwd, maxRounds = 100)
    assert(m == Seq(Match("s1", "t1", 1)))
  }

  test("names are lowercased on entry") {
    val fwd = prefs("S1" -> Seq("T1" -> 0.9))
    val bwd = prefs("t1" -> Seq("s1" -> 0.9))
    assert(StableMatcher.matchCase(fwd, bwd, 1) == Seq(Match("s1", "t1", 1)))
  }

  test("distributed mapGroups form agrees with the in-memory matcher") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("c1", "fwd", "s1", "t1", 0.9), ("c1", "fwd", "s1", "t2", 0.1),
      ("c1", "fwd", "s2", "t2", 0.8),
      ("c1", "bwd", "t1", "s1", 0.9), ("c1", "bwd", "t2", "s2", 0.8),
      ("c1", "bwd", "t2", "s1", 0.1),
      ("c2", "fwd", "a", "b", 1.0), ("c2", "bwd", "b", "a", 1.0)
    ).toDF("case_id", "direction", "query_attr", "cand_attr", "score")
    val out = StableMatcher.matchCases(rows, maxRounds = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    // must agree exactly with the in-memory matcher on the same prefs
    val c1 = StableMatcher.matchCase(
      prefs("s1" -> Seq("t1" -> 0.9, "t2" -> 0.1), "s2" -> Seq("t2" -> 0.8)),
      prefs("t1" -> Seq("s1" -> 0.9), "t2" -> Seq("s2" -> 0.8, "s1" -> 0.1)),
      maxRounds = 2).map(m => ("c1", m.srcAttr, m.tgtAttr, m.round))
    val c2 = StableMatcher.matchCase(
      prefs("a" -> Seq("b" -> 1.0)), prefs("b" -> Seq("a" -> 1.0)),
      maxRounds = 2).map(m => ("c2", m.srcAttr, m.tgtAttr, m.round))
    assert(out == (c1 ++ c2).toSet)
    assert(out.contains(("c1", "s1", "t1", 1)) && out.contains(("c2", "a", "b", 1)))
  }

  test("no blocking pair under score order in round-1 output (stability)") {
    // property sample: random-ish fixed prefs; verify no (s,t) both prefer
    // each other over their round-1 assignments
    val fwd = prefs(
      "s1" -> Seq("t1" -> 0.9, "t2" -> 0.8, "t3" -> 0.1),
      "s2" -> Seq("t2" -> 0.7, "t1" -> 0.6),
      "s3" -> Seq("t1" -> 0.5, "t3" -> 0.4))
    val bwd = prefs(
      "t1" -> Seq("s2" -> 0.9, "s1" -> 0.8, "s3" -> 0.1),
      "t2" -> Seq("s1" -> 0.9, "s2" -> 0.3),
      "t3" -> Seq("s3" -> 0.9, "s1" -> 0.2))
    val r1 = StableMatcher.matchCase(fwd, bwd, 1)
    val srcOf = r1.map(m => m.tgtAttr -> m.srcAttr).toMap
    val tgtOf = r1.map(m => m.srcAttr -> m.tgtAttr).toMap
    def fwdScore(srv: String, t: String) = fwd(srv).toMap.get(t)
    def bwdScore(t: String, sc: String) = bwd(t).toMap.get(sc)
    val blocking = for {
      (sc, cands) <- fwd.toSeq
      (t, _) <- cands
      if tgtOf.get(sc) != Some(t)
      sPrefers = (fwdScore(sc, t), tgtOf.get(sc).flatMap(fwdScore(sc, _))) match {
        case (Some(a), Some(b)) => a > b
        case (Some(_), None)    => true
        case _                  => false
      }
      tPrefers = (bwdScore(t, sc), srcOf.get(t).flatMap(bwdScore(t, _))) match {
        case (Some(a), Some(b)) => a > b
        case (Some(_), None)    => true
        case _                  => false
      }
      if sPrefers && tPrefers
    } yield (sc, t)
    assert(blocking.isEmpty, s"blocking pairs: $blocking")
  }

  test("q190's certificate SQL flags an unstable matching and clears a stable one") {
    // The certificate must be FALSIFIABLE: run the exact SQL q190 ships on a
    // hand-built case where a-x and b-y is the unique stable outcome, once
    // with the stable pairs (all zeros) and once with the crossed pairs
    // (a-y, b-x) — a and x strictly prefer each other, so n_blocking > 0.
    val s = spark
    import s.implicits._
    Seq(
      ("c1", "fwd", "a", "x", 0.9), ("c1", "fwd", "a", "y", 0.1),
      ("c1", "fwd", "b", "x", 0.2), ("c1", "fwd", "b", "y", 0.8),
      ("c1", "bwd", "x", "a", 0.9), ("c1", "bwd", "x", "b", 0.2),
      ("c1", "bwd", "y", "a", 0.1), ("c1", "bwd", "y", "b", 0.8))
      .toDF("case_id", "direction", "query_attr", "cand_attr", "score")
      .createOrReplaceTempView("cert_pr")
    def cert(matches: Seq[(String, String, String, Int)]): Map[Long, Long] = {
      matches.toDF("case_id", "src_attr", "tgt_attr", "round")
        .createOrReplaceTempView("cert_mt")
      s.sql(graft.queries.PipelineQueries.stableCertSql("cert_pr", "cert_mt"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    val stable = cert(Seq(("c1", "a", "x", 1), ("c1", "b", "y", 1)))
    assert(stable(1L) == 0L, s"stable matching flagged: $stable")
    val crossed = cert(Seq(("c1", "a", "y", 1), ("c1", "b", "x", 1)))
    assert(crossed(1L) > 0L, s"unstable matching not flagged: $crossed")
    s.catalog.dropTempView("cert_pr"); s.catalog.dropTempView("cert_mt")
  }

  test("a 1000x1000 adversarial case completes in under a second") {
    // VERDICT r7 item 4: wide warehouse tables produce 1000-column cases;
    // the matcher must stay near-linear in total proposals. Preferences
    // are built adversarially misaligned (src i ranks targets rotated by
    // i, targets rank sources in the reverse rotation), which maximizes
    // displacement chains — the worst shape for proposal count.
    val n = 1000
    val tgts = (0 until n).map(j => f"t$j%04d")
    val srcs = (0 until n).map(i => f"s$i%04d")
    val fwd: StableMatcher.Prefs = srcs.zipWithIndex.map { case (sname, i) =>
      sname -> (0 until n).map { k =>
        val j = (i + k) % n
        (tgts(j), (n - k).toDouble)
      }
    }.toMap
    val bwd: StableMatcher.Prefs = tgts.zipWithIndex.map { case (tname, j) =>
      tname -> (0 until n).map { k =>
        val i = (j - k + n) % n
        (srcs(i), (n - k).toDouble)
      }
    }.toMap
    val t0 = System.nanoTime()
    val out = StableMatcher.matchCase(fwd, bwd, maxRounds = 2)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 2 rounds × n matches each (every side lists every counterpart, so
    // all participants pair up both rounds)
    assert(out.count(_.round == 1) == n, s"round-1 matches: ${out.size}")
    assert(out.count(_.round == 2) == n)
    // generous 5x headroom over the <1 s target to keep CI noise out
    assert(elapsedMs < 5000.0, f"1k x 1k matchCase took $elapsedMs%.0f ms")
    assert(elapsedMs < 1000.0 || {
      // re-run once before failing the tight bound — first run may pay JIT
      val t1 = System.nanoTime()
      StableMatcher.matchCase(fwd, bwd, maxRounds = 2)
      (System.nanoTime() - t1) / 1e6 < 1000.0
    }, "1k x 1k matchCase exceeded 1 s even after JIT warm-up")
  }

  test("duplicated (query, cand) rows yield exactly the dedup'd input's matches") {
    // VERDICT r9/r10 item 3: clean() dedupes duplicated candidate entries
    // keeping the best score (StableMatcher.scala clean/distinctBy). The
    // monotone proposal cursor assumes distinct targets per list — a
    // surviving duplicate would let s1 re-propose to t1 within one round.
    // Duplicates are placed BEFORE and AFTER the best-scored copy, and on
    // both the forward and backward side.
    val fwdDup = prefs(
      "s1" -> Seq("t1" -> 0.2, "t2" -> 0.5, "t1" -> 0.9, "t1" -> 0.4),
      "s2" -> Seq("t1" -> 0.8, "t1" -> 0.8))
    val bwdDup = prefs(
      "t1" -> Seq("s2" -> 0.1, "s2" -> 0.7, "s1" -> 0.3),
      "t2" -> Seq("s1" -> 0.6, "s1" -> 0.6))
    val fwdDedup = prefs(
      "s1" -> Seq("t1" -> 0.9, "t2" -> 0.5),
      "s2" -> Seq("t1" -> 0.8))
    val bwdDedup = prefs(
      "t1" -> Seq("s2" -> 0.7, "s1" -> 0.3),
      "t2" -> Seq("s1" -> 0.6))
    val got = StableMatcher.matchCase(fwdDup, bwdDup, maxRounds = 3)
    val want = StableMatcher.matchCase(fwdDedup, bwdDedup, maxRounds = 3)
    assert(got == want, s"dup-input matches diverge: got=$got want=$want")
    assert(got.nonEmpty)
    // each round is still a matching even with duplicated inputs
    got.groupBy(_.round).values.foreach { ms =>
      assert(ms.map(_.srcAttr).distinct.size == ms.size)
      assert(ms.map(_.tgtAttr).distinct.size == ms.size)
    }
  }
}
