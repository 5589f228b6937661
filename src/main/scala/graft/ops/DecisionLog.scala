package graft.ops

/** Driver-side ledger of sketch→plan DECISIONS (VERDICT r12 item 8): the
  * decision quartet — broadcast-vs-shuffle (q260), skew salting (q273),
  * adaptive partition count (q275), LSH band precision (q280) — each emit
  * their estimate/threshold/choice inline in their own gated rows; a
  * pipeline at 100 TB wants ONE place to read every planning decision a
  * run made. Each decision operator appends here (estimate, threshold,
  * chosen branch, executed-plan evidence) without changing its own gate;
  * q284 surfaces a run's ledger as a gated query whose oracle replays
  * every estimate, threshold comparison, branch and expected evidence
  * from the raw rows — the decisions stay deterministic sketches, so the
  * whole ledger is a pure function of the data.
  *
  * Records land in a THREAD-LOCAL sink when a capture scope is active
  * (q284 wraps its four decision calls in one, so concurrently running
  * sessions/specs can't interleave rows into its gate), else in the
  * process-wide ledger that an operator/monitoring surface would drain.
  */
object DecisionLog {

  final case class Decision(op: String, estimate: Double, threshold: Double,
      branch: String, evidence: String)

  private val global = new java.util.concurrent.ConcurrentLinkedQueue[Decision]
  private val local = new ThreadLocal[scala.collection.mutable.Buffer[Decision]]

  /** Append one decision — called by the decision operators at the point
    * their driver-side choice is made, with evidence read back from the
    * plan they actually built.
    */
  def record(op: String, estimate: Double, threshold: Double,
      branch: String, evidence: String): Unit = {
    val d = Decision(op, estimate, threshold, branch, evidence)
    val sink = local.get()
    if (sink != null) sink += d else global.add(d)
  }

  /** Run `f` with a fresh thread-local sink; return its result plus
    * exactly the decisions `f`'s call tree recorded on this thread.
    * Reentrant: a nested capture restores the OUTER sink on exit, so the
    * outer scope keeps receiving its later decisions (a plain remove()
    * would silently divert them to the global ledger).
    */
  def withCapture[T](f: => T): (T, Seq[Decision]) = {
    val outer = local.get()
    val buf = scala.collection.mutable.Buffer.empty[Decision]
    local.set(buf)
    try { val r = f; (r, buf.toSeq) }
    finally { if (outer != null) local.set(outer) else local.remove() }
  }

  /** Drain the process-wide ledger (operational surface; the gate path
    * uses [[withCapture]] instead).
    */
  def drain(): Seq[Decision] = {
    val b = Seq.newBuilder[Decision]
    var d = global.poll()
    while (d != null) { b += d; d = global.poll() }
    b.result()
  }
}
