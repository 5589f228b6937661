package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter sketch as a mergeable typed [[Aggregator]] —
  * the bounded-memory answer to "which tokens dominate a 100 TB corpus"
  * when the exact groupBy's keyspace (the full vocabulary) is itself too
  * large to shuffle cheaply. Per partition the sketch keeps at most k
  * counters (reduce); partial sketches merge associatively by summing
  * counts and re-pruning to k via the (k+1)-th-largest subtraction
  * (Agarwal et al., "Mergeable Summaries", PODS 2012) — so Spark's
  * partial+final aggregation path applies and no executor ever holds more
  * than k entries.
  *
  * Guarantees (any partitioning, any merge order), with N = stream size:
  *   - every item with true count > N/(k+1) IS in the summary;
  *   - every estimate e(x) satisfies  true(x) − N/(k+1) ≤ e(x) ≤ true(x).
  * The CONTENTS beyond that are arrival-order-dependent — which is why
  * q201 gates the deterministic implications (membership + bounds against
  * exact counts) rather than the raw summary, the same audit shape as the
  * q51-family `approx_count_distinct` verdict.
  *
  * Decrement is implemented as the textbook "charge 1 against all k
  * counters" (reduce) / "subtract the (k+1)-th largest" (merge); both are
  * O(k) with k a small constant, row-local, no shuffle beyond the final
  * single-row combine.
  */
object MisraGries {

  final case class MGBuf(counts: Map[String, Long])
  final case class MGOut(counts: Map[String, Long])

  def of(k: Int): Aggregator[String, MGBuf, MGOut] =
    new Aggregator[String, MGBuf, MGOut] {
      require(k >= 1, "Misra-Gries capacity must be >= 1")

      override def zero: MGBuf = MGBuf(Map.empty)

      override def reduce(b: MGBuf, t: String): MGBuf = {
        val m = b.counts
        m.get(t) match {
          case Some(c) => MGBuf(m.updated(t, c + 1))
          case None if m.size < k => MGBuf(m.updated(t, 1L))
          case None =>
            // charge the new item against every counter; drop exhausted ones
            MGBuf(m.flatMap { case (key, c) =>
              if (c > 1) Some(key -> (c - 1)) else None
            })
        }
      }

      override def merge(a: MGBuf, b: MGBuf): MGBuf = {
        val summed = b.counts.foldLeft(a.counts) { case (m, (key, c)) =>
          m.updated(key, m.getOrElse(key, 0L) + c)
        }
        if (summed.size <= k) MGBuf(summed)
        else {
          // subtract the (k+1)-th largest count from everything; ≤ k survive
          val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          MGBuf(summed.flatMap { case (key, c) =>
            if (c > cut) Some(key -> (c - cut)) else None
          })
        }
      }

      override def finish(b: MGBuf): MGOut = MGOut(b.counts)

      override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
      override def outputEncoder: Encoder[MGOut] = Encoders.product[MGOut]
    }
}
