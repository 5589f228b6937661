package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Many-to-many Gale–Shapley-style stable matcher over dual-direction
  * scored preference lists (SURVEY §2.F1; behavior of
  * `Stable Schema Matching/stable_match.py:27-222`, re-implemented from its
  * observed contract — no code copied).
  *
  * Semantics preserved (SURVEY §7.4 quirks):
  *   - attribute names lowercased on entry (`stable_match.py:9-34`);
  *   - sentinel "no match" options dropped up front (`:40-43,62-68`);
  *   - a proposal beats an existing match only with STRICTLY greater score,
  *     missing scores treated as None-safe losses (`:4-7,133-161`);
  *   - each round both sides' free sets reset; pairs matched in earlier
  *     rounds are REMOVED from both working preference lists, so round k
  *     yields each side's k-th choice tier (`:90-91,173-198`);
  *   - terminates after `maxRounds` rounds or a round with no new match
  *     (`:215-217`).
  *
  * Scale: the distributed form groups by caseId and runs the in-memory
  * matcher per group (`groupByKey.mapGroups`) — embarrassingly parallel
  * across the millions of cases a 100 TB corpus would hold, no cross-case
  * state. Within a case the matcher is near-linear in total proposals:
  * backward scores are hash-indexed at clean() time and each proposer
  * walks its list with a monotone cursor, so a 1000×1000-attr case (wide
  * warehouse tables) completes in well under a second
  * (StableMatcherSpec pins the bound).
  */
object StableMatcher {

  type Prefs = Map[String, Seq[(String, Double)]]

  val defaultSentinels: Set[String] =
    Set("none of the options", "there is no match.", "there is no match")

  /** One matched pair with the round (1-based) it was produced in. */
  final case class Match(srcAttr: String, tgtAttr: String, round: Int)

  /** Run the matcher on one case's forward (src→tgt candidates) and
    * backward (tgt→src candidates) preference lists.
    */
  def matchCase(
      forward: Prefs,
      backward: Prefs,
      maxRounds: Int,
      sentinels: Set[String] = defaultSentinels): Seq[Match] = {

    def clean(p: Prefs): mutable.Map[String, mutable.ArrayBuffer[(String, Double)]] = {
      val m = mutable.Map.empty[String, mutable.ArrayBuffer[(String, Double)]]
      for ((k, cands) <- p) {
        val kept = cands.collect {
          case (c, s) if !sentinels.contains(c.trim.toLowerCase) =>
            (c.trim.toLowerCase, s)
        }
        // Dedupe candidates keeping the best-scored entry (first after the
        // (-score, name) sort). The monotone proposal cursor assumes each
        // list entry is a DISTINCT target: a duplicated (query, cand) input
        // row would otherwise let a src re-propose to the same target a
        // second time within one round — the old tried-set skipped those,
        // and the backward map already keeps best-score-per-candidate.
        if (kept.nonEmpty)
          m(k.trim.toLowerCase) = mutable.ArrayBuffer(
            kept.sortBy { case (c, s) => (-s, c) }.distinctBy(_._1): _*)
      }
      m
    }

    val fwd = clean(forward)
    // The backward side is only ever consulted as a (tgt, src) score
    // lookup, so it is hash-indexed at clean() time instead of scanned
    // linearly per proposal — a 1000-column case would otherwise spend
    // O(|list|) per lookup inside the proposal loop. A duplicate
    // candidate keeps its best score, exactly what collectFirst over the
    // (-score, name)-sorted list returned.
    val bwd = mutable.Map.empty[String, mutable.Map[String, Double]]
    for ((tgt, lst) <- clean(backward)) {
      val m = mutable.Map.empty[String, Double]
      for ((c, s) <- lst) if (!m.contains(c)) m(c) = s
      bwd(tgt) = m
    }
    // score of src in tgt's backward list; None-safe: absent = loses
    def tgtScoreOf(tgt: String, src: String): Option[Double] =
      bwd.get(tgt).flatMap(_.get(src))

    val out = mutable.ArrayBuffer.empty[Match]
    var round = 1
    var progressed = true
    while (round <= maxRounds && progressed) {
      // fresh free sets each round; engaged state is per-round
      val engaged = mutable.Map.empty[String, String] // tgt -> src
      val free = mutable.Queue.empty[String]
      free ++= fwd.keys.toSeq.sorted
      // each src proposes down its (static within a round) sorted list and
      // never re-proposes, so "already tried" is always a prefix — a
      // monotone per-src index replaces the tried-set + collectFirst scan
      // (O(1) per proposal instead of O(|list|))
      val nextIdx = mutable.Map.empty[String, Int]

      while (free.nonEmpty) {
        val src = free.dequeue()
        val i = nextIdx.getOrElse(src, 0)
        fwd.get(src).filter(i < _.length).map(_.apply(i)) match {
          case None => // exhausted its list this round
          case Some((tgt, _)) =>
            nextIdx(src) = i + 1
            engaged.get(tgt) match {
              case None =>
                // target accepts only if the proposer appears in its list
                if (tgtScoreOf(tgt, src).isDefined) engaged(tgt) = src
                else free.enqueue(src)
              case Some(current) =>
                val challenger = tgtScoreOf(tgt, src)
                val incumbent = tgtScoreOf(tgt, current)
                // strictly-greater wins; None-safe (missing challenger loses)
                val wins = (challenger, incumbent) match {
                  case (Some(c), Some(i)) => c > i
                  case (Some(_), None)    => true
                  case _                  => false
                }
                if (wins) { engaged(tgt) = src; free.enqueue(current) }
                else free.enqueue(src)
            }
        }
      }

      progressed = engaged.nonEmpty
      for ((tgt, src) <- engaged.toSeq.sortBy(_._1)) {
        out += Match(src, tgt, round)
        // remove the matched pair from BOTH working preference structures
        fwd(src) = fwd(src).filterNot(_._1 == tgt)
        if (fwd(src).isEmpty) fwd.remove(src)
        bwd.get(tgt).foreach { m =>
          m.remove(src)
          if (m.isEmpty) bwd.remove(tgt)
        }
      }
      round += 1
    }
    out.toSeq
  }

  /** Distributed form. Input long-form scores:
    * (case_id, direction∈{fwd,bwd}, query_attr, cand_attr, score).
    * Output: (case_id, src_attr, tgt_attr, round).
    */
  def matchCases(scores: DataFrame, maxRounds: Int): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    val grouped = scores
      .select($"case_id".cast("string"), $"direction".cast("string"),
        $"query_attr".cast("string"), $"cand_attr".cast("string"),
        $"score".cast("double"))
      .as[(String, String, String, String, Double)]
      .groupByKey(_._1)
    grouped.flatMapGroups { (caseId, rows) =>
      val all = rows.toSeq
      def prefs(dir: String): Prefs =
        all.filter(_._2 == dir)
          .groupBy(_._3)
          .map { case (q, rs) => q -> rs.map(r => (r._4, r._5)) }
      matchCase(prefs("fwd"), prefs("bwd"), maxRounds)
        .map(m => (caseId, m.srcAttr, m.tgtAttr, m.round))
    }.toDF("case_id", "src_attr", "tgt_attr", "round")
  }

  /** E2/E3 round slicing: keep matches from the first r rounds
    * (ref: ask_StableMatcher.py:428-447).
    */
  def topRounds(matches: DataFrame, r: Int): DataFrame =
    matches.filter(col("round") <= r)
}
