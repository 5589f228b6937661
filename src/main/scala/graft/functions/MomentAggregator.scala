package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact one-pass moments as a typed [[Aggregator]] — the custom-AGGREGATE
  * half of the UDF surface (SURVEY §2.K), complementing the scalar
  * Catalyst expressions (`vec_dot`, `nfc_normalize`) and the
  * mapGroups/mapPartitions operators.
  *
  * Input is the value pre-quantized to exact 1e-3 longs (millis), and ALL
  * buffer arithmetic is integer (count, Σm, Σm², min, max) — so
  * `merge` is associative AND commutative and the result is bit-identical
  * under any partitioning / AQE coalescing, unlike a naive Welford fold
  * whose double accumulators drift with merge order. Mean/variance
  * materialize as doubles only in `finish`, one division each — the same
  * numbers a sequential oracle computes.
  *
  * Σm² headroom: |value| ≤ ~10⁶ ⇒ m² ≤ 10¹⁸/10⁶; overflow needs ~10⁷ rows
  * per group at that magnitude — at larger group sizes coarsen the
  * quantum or split the group (salt + re-merge), same playbook as the
  * q46 salted aggregation. Past the headroom the exact ops THROW
  * (multiplyExact/addExact) instead of wrapping into silently-wrong
  * moments — the failure mode the exact-integer contract demands.
  */
object MomentAggregator {

  final case class MomBuf(n: Long, sum: Long, sumSq: Long, mn: Long, mx: Long)
  final case class MomOut(
      n: Long, mean: Double, variance: Double, vmin: Double, vmax: Double)

  val of: Aggregator[Long, MomBuf, MomOut] =
    new Aggregator[Long, MomBuf, MomOut] {
      override def zero: MomBuf = MomBuf(0L, 0L, 0L, Long.MaxValue, Long.MinValue)

      override def reduce(b: MomBuf, m: Long): MomBuf =
        MomBuf(b.n + 1, Math.addExact(b.sum, m),
          Math.addExact(b.sumSq, Math.multiplyExact(m, m)),
          math.min(b.mn, m), math.max(b.mx, m))

      override def merge(a: MomBuf, b: MomBuf): MomBuf =
        MomBuf(a.n + b.n, Math.addExact(a.sum, b.sum),
          Math.addExact(a.sumSq, b.sumSq),
          math.min(a.mn, b.mn), math.max(a.mx, b.mx))

      override def finish(b: MomBuf): MomOut = {
        val n = b.n.toDouble
        val mean = b.sum.toDouble / n / 1000.0
        // population variance in value² units: E[m²]/1e6 − (E[m]/1e3)²
        val variance = b.sumSq.toDouble / n / 1e6 - (b.sum.toDouble / n / 1000.0) * (b.sum.toDouble / n / 1000.0)
        MomOut(b.n, mean, variance, b.mn.toDouble / 1000.0, b.mx.toDouble / 1000.0)
      }

      override def bufferEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
      override def outputEncoder: Encoder[MomOut] = Encoders.product[MomOut]
    }

  /** [[of]] with the RAW buffer as the output — the stored-state form for
    * incremental maintenance (q282): a snapshot persists (n, Σm, Σm²,
    * min, max) per key, which [[merger]] later absorbs. finish is the
    * identity, everything else is the same exact-integer fold.
    */
  val raw: Aggregator[Long, MomBuf, MomBuf] =
    new Aggregator[Long, MomBuf, MomBuf] {
      override def zero: MomBuf = of.zero
      override def reduce(b: MomBuf, m: Long): MomBuf = of.reduce(b, m)
      override def merge(a: MomBuf, b: MomBuf): MomBuf = of.merge(a, b)
      override def finish(b: MomBuf): MomBuf = b
      override def bufferEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
      override def outputEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
    }

  /** State-merging form: input rows ARE buffers (a stored snapshot plus
    * fresh batch partials) and reduce IS [[of]]'s merge — so the
    * incremental path exercises exactly the merge the one-shot aggregate
    * uses, and merge ≡ recompute becomes a gateable claim (q282).
    */
  val merger: Aggregator[MomBuf, MomBuf, MomOut] =
    new Aggregator[MomBuf, MomBuf, MomOut] {
      override def zero: MomBuf = of.zero
      override def reduce(b: MomBuf, st: MomBuf): MomBuf = of.merge(b, st)
      override def merge(a: MomBuf, b: MomBuf): MomBuf = of.merge(a, b)
      override def finish(b: MomBuf): MomOut = of.finish(b)
      override def bufferEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
      override def outputEncoder: Encoder[MomOut] = Encoders.product[MomOut]
    }
}
