package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's self-adjudication pieces, refereed on synthetic
  * artifacts — including the demonstrated streaming slowdown VERDICT r11
  * item 6 asked for (a prior artifact with 10× the throughput must flag).
  */
class BenchAdjudicateSpec extends AnyFunSuite {

  private val priorArtifact =
    """{"metric":"total","value":100.0,"unit":"sec",
      |"queries_warm":{"q01_agg":0.512,"q02_filter":1.25,"q74_stream":2.0},
      |"canary_best_sec":0.420,
      |"streaming_metrics":{
      |  "q74_stream":{"input_rows":2000,"trigger_ms":100,"rows_per_trigger_sec":20000.0,"prior_rows_per_trigger_sec":19000.0,"prior_ratio":0.950},
      |  "q75_stream":{"input_rows":2000,"trigger_ms":400,"rows_per_trigger_sec":5000.0},
      |  "q76_stream":{"input_rows":0,"trigger_ms":0,"rows_per_trigger_sec":0.000,"prior_rows_per_trigger_sec":12.0}},
      |"sf":"/root/testdata/sf0.1"}""".stripMargin

  test("parses prior warm timings, streaming rates, and canary") {
    val warm = BenchAdjudicate.parseQueriesWarm(priorArtifact)
    assert(warm == Map("q01_agg" -> 0.512, "q02_filter" -> 1.25, "q74_stream" -> 2.0))
    // q74/q76 carry the r12+ prior_* fields AFTER the rate — the parser
    // must read the rate (not the prior, despite the shared suffix) and
    // must not require a closing brace right after the number; a regex
    // anchored on '}' would self-disable the gate one round after priors
    // first appear in the artifact
    val rates = BenchAdjudicate.parseStreamingRates(priorArtifact)
    assert(rates == Map("q74_stream" -> 20000.0, "q75_stream" -> 5000.0,
      "q76_stream" -> 0.0))
    assert(BenchAdjudicate.parsePriorCanary(priorArtifact).contains(0.420))
    assert(BenchAdjudicate.parseQueriesWarm("") == Map.empty[String, Double])
    assert(BenchAdjudicate.parseStreamingRates("{}") == Map.empty[String, Double])
    assert(BenchAdjudicate.parsePriorCanary("{}").isEmpty)
  }

  test("adjudicated total takes min(warm, warm_retry) per query") {
    val warm = Seq("a" -> 5.0, "b" -> 1.0, "c" -> 2.0)
    val retry = Map("a" -> 0.8, "c" -> 3.0) // c's retry was SLOWER: keep 2.0
    assert(math.abs(BenchAdjudicate.adjudicatedTotal(warm, retry) - 3.8) < 1e-9)
    assert(BenchAdjudicate.adjudicatedTotal(warm, Map.empty) == 8.0)
  }

  test("streaming gate flags a synthetic 10x throughput drop, not jitter") {
    val prior = BenchAdjudicate.parseStreamingRates(priorArtifact)
    // q74 collapsed 10x (flag), q75 wobbled 1.5x (no flag — inside 2x),
    // q76 was and is rate 0 (skip: correctness problem, not throughput),
    // q77 is new this round (no prior — nothing to compare)
    val current = Map("q74_stream" -> 2000.0, "q75_stream" -> 3400.0,
      "q76_stream" -> 0.0, "q77_stream" -> 9000.0)
    val drops = BenchAdjudicate.streamingDrops(prior, current)
    assert(drops == Map("q74_stream" -> (20000.0, 2000.0)))
    // exactly-2x sits on the boundary and must NOT flag (strict past-2x)
    assert(BenchAdjudicate.streamingDrops(
      Map("q" -> 10.0), Map("q" -> 5.0)).isEmpty)
    assert(BenchAdjudicate.streamingDrops(
      Map("q" -> 10.0), Map("q" -> 4.999)).nonEmpty)
  }

  test("canary pressure: within-run drift and vs-prior both detected") {
    // quiet box: flat canary, matches prior
    assert(BenchAdjudicate.pressure(0.42, 0.43, Some(0.42)) < 1.1)
    // load arrived mid-suite: end drifted 2x over start
    assert(BenchAdjudicate.pressure(0.42, 0.84, Some(0.42)) >= 2.0)
    // uniformly loaded suite (the r11 failure mode): start == end but both
    // 1.8x the prior round's quiet reading — only the prior comparison
    // can catch this, and it must
    assert(BenchAdjudicate.pressure(0.76, 0.76, Some(0.42)) > 1.7)
    // first round with a canary: no prior, drift only
    assert(BenchAdjudicate.pressure(0.42, 0.44, None) < 1.1)
    // start slower than end is JVM tier-up, NOT pressure (one-sided drift)
    assert(BenchAdjudicate.pressure(0.60, 0.42, Some(0.42)) == 1.0)
    // quieter than the prior round floors at 1.0, never below
    assert(BenchAdjudicate.pressure(0.30, 0.31, Some(0.42)) >= 1.0)
  }

  test("pressure peak names load that cleared mid-run (ADVICE r12)") {
    // start slow + end quiet: the primary metric reads 1.0 (one-sided
    // drift, min vs prior) — the PEAK signal must still name the loaded
    // first half
    assert(BenchAdjudicate.pressure(0.84, 0.42, Some(0.42)) == 1.0)
    assert(BenchAdjudicate.pressurePeak(0.84, 0.42, Some(0.42)) >= 2.0)
    // quiet box: peak stays at 1.0 (floored)
    assert(BenchAdjudicate.pressurePeak(0.42, 0.43, Some(0.43)) < 1.1)
    // no prior artifact: no peak comparison
    assert(BenchAdjudicate.pressurePeak(0.84, 0.42, None) == 1.0)
  }

  test("drift block: session factor from canaries, corrected speedups divide it out (r16 item 8)") {
    // session ran 1.2x slower than the prior artifact's canary floor
    assert(BenchAdjudicate.sessionDrift(0.504, Some(0.42)).exists(d =>
      math.abs(d - 1.2) < 1e-9))
    // no prior canary (first round / host change): no drift estimate
    assert(BenchAdjudicate.sessionDrift(0.504, None).isEmpty)
    assert(BenchAdjudicate.sessionDrift(0.504, Some(0.0)).isEmpty)
    // an untouched query that merely inherited the 1.2x session drift
    // (2.0 s -> 2.4 s) must read as flat once corrected...
    val corr = BenchAdjudicate.driftCorrected(
      Map("untouched" -> 2.4, "improved" -> 1.0, "noprior" -> 3.0),
      Map("untouched" -> 2.0, "improved" -> 2.0), drift = 1.2)
    assert(math.abs(corr("untouched") - 1.0) < 1e-9)
    // ...while a real 2x win still reads as a win on top of the drift
    assert(math.abs(corr("improved") - 2.4) < 1e-9)
    // queries without a prior are omitted, zero/negative guarded
    assert(!corr.contains("noprior"))
    assert(BenchAdjudicate.driftCorrected(
      Map("q" -> 1.0), Map("q" -> 2.0), drift = 0.0).isEmpty)
    assert(BenchAdjudicate.driftCorrected(
      Map("q" -> 0.0), Map("q" -> 2.0), drift = 1.0).isEmpty)
  }

  test("host fingerprint round-trips through the artifact; parse sanity flags empty parses") {
    val fp = BenchAdjudicate.hostFingerprint()
    assert(fp.contains("/") && fp.endsWith("cpu"))
    val txt = s"""{"canary_best_sec":0.42,"host_fingerprint":"$fp"}"""
    assert(BenchAdjudicate.parseHostFingerprint(txt).contains(fp))
    assert(BenchAdjudicate.parseHostFingerprint("{}").isEmpty)
    // parse sanity (ADVICE r12): markers present + empty parse = the
    // format drifted and the gates would silently run blind
    // a writer change to units-in-strings: marker present, zero entries parse
    val drifted = """{"queries_warm":{"q01":"1.234s"},""" +
      """"streaming_metrics":{"q41":{"rows_per_trigger_sec":5.0}}}"""
    val warm = BenchAdjudicate.parseQueriesWarm(drifted)
    val strm = BenchAdjudicate.parseStreamingRates(drifted)
    val warnings = BenchAdjudicate.parseSanity(drifted, warm, strm)
    assert(warnings.contains("queries_warm"), s"warm drift not flagged: $warnings")
    // healthy artifact: no warnings; empty prior: no warnings
    val healthy = """{"queries_warm":{"q01":1.0},""" +
      """"streaming_metrics":{"q41":{"rows_per_trigger_sec":5.0}}}"""
    assert(BenchAdjudicate.parseSanity(healthy,
      BenchAdjudicate.parseQueriesWarm(healthy),
      BenchAdjudicate.parseStreamingRates(healthy)).isEmpty)
    assert(BenchAdjudicate.parseSanity("", Map.empty, Map.empty).isEmpty)
  }

  test("provisional prior falls back to the last quiet artifact (r13 item 4)") {
    val loud = """{"ambient_pressure":1.44,"provisional":true,"queries_warm":{"q01":2.0}}"""
    val quiet = """{"ambient_pressure":1.02,"provisional":false,"queries_warm":{"q01":1.0}}"""
    assert(BenchAdjudicate.parseProvisional(loud))
    assert(!BenchAdjudicate.parseProvisional(quiet))
    // pre-r14 artifacts have no stamp: treated as quiet (no fallback)
    assert(!BenchAdjudicate.parseProvisional("""{"ambient_pressure":1.44}"""))
    assert(BenchAdjudicate.selectPrior(loud, quiet) == (quiet, "BENCH_QUIET.json"))
    assert(BenchAdjudicate.selectPrior(quiet, loud) == (quiet, "BENCH_FULL.json"))
    // provisional prior but no quiet fallback yet: use what exists
    assert(BenchAdjudicate.selectPrior(loud, "") == (loud, "BENCH_FULL.json"))
    assert(BenchAdjudicate.selectPrior("", "") == ("", "BENCH_FULL.json"))
  }

  test("concurrent pool assignment: deterministic, complete, balanced") {
    val names = (1 to 23).map(i => f"q$i%03d_x")
    val a = BenchAdjudicate.poolAssignment(names, 4)
    assert(a.keySet == names.toSet)
    assert(a.values.forall(p => p >= 0 && p < 4))
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
    // stable across calls and input order
    assert(BenchAdjudicate.poolAssignment(names.reverse, 4) == a)
  }

  test("mixed concurrent pass: picks cover three state-store families " +
      "and are registered streaming queries; contention gate flags a " +
      "collapse past pools+1, not FAIR-sharing slowdown") {
    val picks = BenchAdjudicate.ConcurrentStreamingPicks
    assert(picks.size == 3 && picks.distinct == picks)
    assert(picks.toSet.subsetOf(SparkEntry.streamingQueries),
      s"picks not registered: ${picks.filterNot(SparkEntry.streamingQueries)}")
    val seq = Map("q41_streaming_tumbling" -> 3000.0,
      "q108_streaming_decontaminate" -> 600.0,
      "q184_tws_running_totals" -> 1500.0)
    val conc = Map(
      "q41_streaming_tumbling" -> 700.0, // 4.3x slower: inside pools+1=5
      "q108_streaming_decontaminate" -> 90.0, // 6.7x: contention collapse
      "q184_tws_running_totals" -> 1400.0) // barely moved
    val drops = BenchAdjudicate.contentionDrops(seq, conc, factor = 5.0)
    assert(drops.keySet == Set("q108_streaming_decontaminate"), s"got $drops")
    assert(drops("q108_streaming_decontaminate") == (600.0, 90.0))
    // a missing sequential rate never flags
    assert(BenchAdjudicate.contentionDrops(Map.empty, conc).isEmpty)
  }

  test("Fs.cleanupStale sweeps only old graft dirs, keeps fresh + scale corpora") {
    val root = java.nio.file.Files.createTempDirectory("cleanup-spec").toString
    def mk(name: String, old: Boolean): java.nio.file.Path = {
      val p = java.nio.file.Paths.get(root, name)
      java.nio.file.Files.createDirectories(p)
      if (old) java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 48L * 3600 * 1000))
      p
    }
    val oldFixture = mk("graft-csv12345", old = true)
    val oldStream = mk("graft_stream999", old = true)
    val fresh = mk("graft-jsonl777", old = false)      // newest run's dir
    val corpus = mk("graft_sf10", old = true)          // keep: scale corpus
    val other = mk("unrelated-dir", old = true)        // not ours
    // an old FILE with the prefix is never touched (only directories)
    val f = java.nio.file.Paths.get(root, "graft_note.md")
    java.nio.file.Files.writeString(f, "x")
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    val removed = graft.core.Fs.cleanupStale(root = root)
    assert(removed == 2, s"removed $removed")
    assert(!java.nio.file.Files.exists(oldFixture) &&
      !java.nio.file.Files.exists(oldStream))
    assert(java.nio.file.Files.exists(fresh) && java.nio.file.Files.exists(corpus) &&
      java.nio.file.Files.exists(other) && java.nio.file.Files.exists(f))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
