package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface (SURVEY §2.J — extension; the reference is
  * strictly batch). The batch q32/q33 semantics re-expressed incrementally:
  * the SAME logical aggregation runs over an unbounded source with
  * watermark-bounded state.
  *
  * Scale: state is keyed (window×type / user), partitioned by key across
  * executors; the watermark bounds state size — late events beyond it are
  * dropped, so memory is O(active keys), not O(stream length).
  */
object StreamingOps {

  /** Bounded-feed size for the streaming gate queries (VERDICT r13
    * item 3). The gate/bench feed is the fixed default; StreamingLadder
    * raises it (with the scaled corpus as the source) to measure whether
    * per-query throughput survives a feed and key-space scale-up — the
    * state-growth risk watermark maps / RocksDB state / interval-join
    * buffers carry at 100 TB. A knob instead of an env var because the
    * ladder flips it per-measurement inside one JVM; queries read it at
    * plan-build time only.
    */
  private val feedLimitVar = new scala.util.DynamicVariable[Option[Int]](None)
  def feedLimit: Int = feedLimitVar.value.getOrElse(2000)

  /** Run `body` with the feed limit overridden ON THIS THREAD only
    * (DynamicVariable, not a process-global var — ADVICE r14: a query
    * planned concurrently in the same JVM must not inherit a ladder
    * measurement's scaled feed size).
    */
  def withFeedLimit[T](limit: Option[Int])(body: => T): T =
    feedLimitVar.withValue(limit)(body)

  /** Dedicated child session for a streaming harness run: the 4-partition
    * state conf and the memory-sink temp view live HERE, never in the
    * shared session — a query planned concurrently on the parent would
    * otherwise silently pick up the reduced partition count (ADVICE r5).
    * Cached blocks still belong to the shared SparkContext/SharedState, so
    * SessionHygiene.dropAllBlocks continues to cover them.
    */
  def streamSession(s: org.apache.spark.sql.SparkSession,
      parts: Int = 4): org.apache.spark.sql.SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
    ss
  }

  /** Tumbling 1-hour event-time aggregation (streaming twin of q32). */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** CHAINED stateful operators in ONE streaming query (the Spark ≥3.5
    * multiple-stateful-operator path): a tumbling 1-hour event-time count
    * per type, re-aggregated into 6-hour roll-ups by windowing over
    * `window_time` of the first aggregate's window (end − 1 µs, so an
    * hour window lands in the 6-hour bucket containing it — epoch-aligned
    * in both stages). One watermark drives both states; in append mode a
    * roll-up row emits only once the watermark passes its 6-hour end,
    * which the harness forces with far-future sentinel batches. Scale
    * contract: stage-1 state is (hour × type) counters, stage-2 state is
    * (6-hour × type) — both bounded by time × cardinality, never by
    * event volume, and the stage-2 input is stage-1's FINALIZED rows
    * (cardinality windows-per-day, not events), so the chain costs one
    * extra bounded shuffle.
    */
  def chainedWindowCounts(events: DataFrame,
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_hour"))
      .groupBy(window(window_time(col("window")), "6 hours"),
        col("event_type"))
      .agg(sum(col("n_hour")).as("n_events"),
        count(lit(1)).as("n_active_hours"),
        max(col("n_hour")).as("max_hourly"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("n_active_hours"), col("max_hourly"))

  /** Streaming HLL: distinct-user estimate per hour window via mergeable
    * registers held in streaming state — the only affordable form on a
    * 100 TB stream (exact distinct state is O(users × windows); register
    * state is O(windows × 128) ints, watermark-evicted). Two chained
    * event-time aggregations on ONE watermark (the q196 pattern): max-of-
    * rho per (window, bucket), then the per-window fold to the EXACT
    * scaled harmonic denominator and the single-division estimate —
    * byte-identical math to q254's batch kernel, so the DuckDB batch twin
    * replays the stream's output bit-for-bit.
    */
  def windowedHllDistinct(events: DataFrame,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    import graft.functions.HyperLogLog
    val h = HyperLogLog.hash60("hll", col("user_id"))
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), HyperLogLog.bucketOf(h).as("bkt"),
        HyperLogLog.rhoOf(h).as("rho"))
      .groupBy(window(col("ts"), "1 hour"), col("bkt"))
      .agg(max(col("rho")).as("reg"))
      .groupBy(window(window_time(col("window")), "1 hour"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HyperLogLog.RhoMax} - reg)"))
          .as("d_present"))
      .select(col("window.start").as("window_start"),
        (lit(HyperLogLog.M) - col("n_buckets")).cast("long").as("v_empty"),
        (col("d_present") + (lit(HyperLogLog.M) - col("n_buckets"))
          * lit(1L << HyperLogLog.RhoMax)).as("d_scaled"))
      .withColumn("hll_estimate", HyperLogLog.estimate(col("d_scaled")))
  }

  /** Streaming COUNT-MIN sketch: per-hour key-frequency cells held in
    * streaming state — q166's d×w counter build run incrementally. Exact
    * per-key counts are O(keys × windows) state and unbounded on a real
    * stream; CMS state is O(windows × d × w) longs, watermark-evicted.
    * The cells are SUMS — order-free and mergeable — so micro-batch
    * increments land on exactly the batch build's counters: same md5
    * column family (`cms<j>:<key>`), same totals, hence the same DuckDB
    * replay as the batch sketch. Emits the sketch itself, one row per
    * (window, j, c) non-empty cell (q254's registers pattern: the sketch
    * is the deliverable; point estimates are a downstream min-join).
    */
  def windowedCmsCells(events: DataFrame, keyCol: String = "event_type",
      depth: Int = 4, width: Int = 16,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val rc = array((0 until depth).map(j =>
      struct(lit(j.toLong).as("j"), expr(
        s"cast(conv(substring(md5(concat('cms$j:', $keyCol)), 1, 12), 16, 10) as bigint) % $width"
      ).as("c"))): _*)
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), explode(rc).as("rc"))
      .groupBy(window(col("ts"), "1 hour"),
        col("rc.j").as("j"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cell"))
      .select(col("window.start").as("window_start"),
        col("j"), col("c"), col("cell"))
  }

  /** Streaming exact dedup: watermark-bounded per-KEY dedup — the
    * incremental twin of q21's hash-groupBy dedup. State holds one entry
    * per key within the watermark horizon, and a redelivered duplicate is
    * dropped even when its timestamp was re-stamped
    * (`dropDuplicatesWithinWatermark` keys on the columns alone; a plain
    * `dropDuplicates(key :+ ts)` would let re-stamped copies through).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join (streaming twin of q94): each purchase
    * joined to the same user's clicks in the preceding `lookbackMinutes`.
    * Both sides carry watermarks and the join predicate is time-bounded in
    * BOTH directions, so Spark can expire buffered rows: click state is
    * retained only `lookback + watermark` past the event time, purchase
    * state until its lookback window can no longer match. Left-outer
    * null-padding for click-less purchases is emitted once the watermark
    * passes the purchase's window — the same rows the batch LEFT JOIN
    * produces, delivered incrementally.
    *
    * Column contract: purchases(p_user, purchase_id, p_ts),
    * clicks(c_user, c_ts).
    */
  def intervalJoin(
      purchases: DataFrame,
      clicks: DataFrame,
      lookbackMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermarkDelay)
    val c = clicks.withWatermark("c_ts", watermarkDelay)
    p.join(c, expr(
      s"""c_user = p_user
          AND c_ts >= p_ts - INTERVAL $lookbackMinutes MINUTES
          AND c_ts < p_ts"""), "leftOuter")
      .select(col("p_user"), col("purchase_id"), col("p_ts"), col("c_ts"))
  }

  /** Stream-static decontamination probe (streaming twin of q104's check):
    * each arriving doc's shingles probe a STATIC benchmark shingle set.
    * Stream-static inner joins are stateless — no watermark, no state
    * store — and with the static side broadcast the probe is map-side, so
    * the stream never shuffles: exactly how an ingest pipeline screens new
    * crawl batches against eval suites at 100 TB.
    */
  def decontaminateStream(docShingles: DataFrame, benchShingles: DataFrame): DataFrame =
    docShingles.join(broadcast(benchShingles), Seq("shingle"))

  final case class Evt(user_id: Long, ts: Timestamp)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)
  final case class SessState(startUs: Long, endUs: Long, n: Long)

  // java.sql.Timestamp ↔ epoch-micros without precision loss: the events
  // table carries µs-resolution times, and ms truncation (getTime alone)
  // would silently shift session bounds off the batch twin's min/max(ts)
  private def toUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization via flatMapGroupsWithState (streaming twin of
    * q33): a session closes when `gapMinutes` pass without an event —
    * either observed in-batch, or via event-time timeout once the watermark
    * passes the gap horizon. All arithmetic is µs-resolution except the
    * timeout timestamp (the GroupState API is ms-based, matching Spark's
    * ms-based watermark).
    */
  def sessionize(
      events: Dataset[Evt],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60 * 1000000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evts: Iterator[Evt], state: GroupState[SessState]) =>
          if (evts.isEmpty && state.hasTimedOut) {
            // watermark passed the gap horizon: close the open session
            val s = state.get
            state.remove()
            Iterator(Session(uid, fromUs(s.startUs), fromUs(s.endUs), s.n))
          } else {
            val sorted = evts.map(e => toUs(e.ts)).toSeq.sorted
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            for (t <- sorted) {
              cur match {
                case Some(s) if t - s.endUs <= gapUs =>
                  // fold BOTH bounds: an in-watermark late event can arrive
                  // in a later batch with t < startUs — batch gaps-and-islands
                  // would extend the session backwards, so the stream must too
                  cur = Some(s.copy(startUs = math.min(s.startUs, t),
                    endUs = math.max(s.endUs, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(uid, fromUs(s.startUs), fromUs(s.endUs), s.n)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60 * 1000L)
              case None => // timed-out call with no state handled above
            }
            closed.result().iterator
          }
      }
  }

  final case class UserStat(user_id: Long, n_events: Long, sum_micro: Long)

  /** Per-user running totals on the Spark 4 `transformWithState` API — the
    * modern arbitrary-state surface (typed per-key `ValueState` on the
    * RocksDB store, optional TTL / timers / composite List-/MapState)
    * replacing `flatMapGroupsWithState`'s single-blob `GroupState`. Each
    * batch folds the key's rows into the state and emits one updated
    * (count, micro-quantized sum) snapshot row — the incremental twin of a
    * batch groupBy count/sum, with state partitioned by key across
    * executors exactly like the shuffle it replaces. Values flow as exact
    * 1e-6 longs so the fold is addition-order-independent (the repo-wide
    * quantize contract; parallel double accumulation would diverge from
    * any sequential oracle).
    *
    * Requires the RocksDB state-store provider on the session running the
    * stream (`transformWithState` does not support the default HDFS-backed
    * store) — see q184's harness.
    */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, Long), UserStat] {
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[UserStat] = {
      var (n, sm) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { case (_, v) => n += 1; sm += v }
      st.update((n, sm))
      Iterator.single(UserStat(key, n, sm))
    }
  }

  /** Streaming Misra-Gries: one bounded sketch per hash BUCKET (the
    * transformWithState key), each batch re-emitting the bucket's snapshot.
    * Buckets PARTITION the token space, so the union of the final bucket
    * sketches is itself an MG summary: per-bucket error ≤ N_b/(k+1) ≤
    * N/(k+1), and a global heavy hitter lands in exactly one bucket whose
    * local threshold it also clears — the mergeable-summaries argument
    * (same theorem the batch q201 audits), shard-parallel. `reduce` IS
    * `functions.MisraGries.of(k).reduce` — one kernel, batch and
    * streaming. State per key: one ≤k-entry map in a ValueState cell +
    * the bucket's exact arrival count (the snapshot sequence number the
    * gate uses to pick the LAST emission per bucket).
    */
  final case class BucketSketch(bucket: Int, n_seen: Long, counts: Map[String, Long])

  class HeavyHitterProcessor(k: Int)
      extends StatefulProcessor[Int, (Int, String), BucketSketch] {
    @transient private var st: ValueState[graft.functions.MisraGries.MGBuf] = _
    @transient private var nSt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[graft.functions.MisraGries.MGBuf]("mg",
        org.apache.spark.sql.Encoders.product[graft.functions.MisraGries.MGBuf],
        TTLConfig.NONE)
      nSt = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[BucketSketch] = {
      val agg = graft.functions.MisraGries.of(k)
      var buf = if (st.exists()) st.get() else agg.zero
      var n = if (nSt.exists()) nSt.get() else 0L
      rows.foreach { case (_, tok) => buf = agg.reduce(buf, tok); n += 1 }
      st.update(buf)
      nSt.update(n)
      Iterator.single(BucketSketch(key, n, buf.counts))
    }
  }

  /** Bounded per-key event REPLAY BUFFER on `ListState` — the composite-
    * state member of the transformWithState family (q184 ValueState cell,
    * q206 sketch-in-ValueState, q188 event-time timers): every user keeps
    * only their k most-recent events BY EVENT TIME, the "recent context"
    * a serving layer reads without replaying the log. Rows within a
    * micro-batch reach the processor in no guaranteed order, so the
    * buffer is an order-INDEPENDENT bounded fold: keep the k largest
    * (ts_us, event_id) keys — commutative, so the final state is a pure
    * function of the fed set at any parallelism. State is O(k) per key on
    * the RocksDB store; each batch emits the key's snapshot sequence-
    * numbered by the exact arrival count and the gate keeps the last
    * (q184's max-struct trick).
    */
  final case class ReplaySnap(user_id: Long, n_seen: Long, last_ids: String)

  class ReplayBufferProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, Long, Long), ReplaySnap] {
    @transient private var buf: ListState[(Long, Long)] = _
    @transient private var nSt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Long)]("buf",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
      nSt = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[ReplaySnap] = {
      val cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      buf.get().foreach(cur += _)
      var n = if (nSt.exists()) nSt.get() else 0L
      rows.foreach { case (_, tsUs, eid) => cur += ((tsUs, eid)); n += 1 }
      val kept = cur.sorted.takeRight(k)
      buf.put(kept.toArray)
      nSt.update(n)
      Iterator.single(ReplaySnap(key, n, kept.map(_._2).mkString(",")))
    }
  }

  /** (user_id, ts_us, event_id) stream → per-key last-k snapshot rows. */
  def replayBuffer(rows: Dataset[(Long, Long, Long)], k: Int): Dataset[ReplaySnap] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new ReplayBufferProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-window KMV (bottom-k-by-hash distinct) snapshot, sequence-
    * numbered by the exact arrival count so the gate keeps the last
    * ([[ReplaySnap]]'s trick — u_k is NOT monotone while the set is
    * filling, so a min/max over the update log can't reconstruct the
    * final state; the arrival counter can).
    */
  final case class KmvSnap(window_s: Long, n_seen: Long, k_got: Int, u_k: Double)

  /** Streaming KMV: ≤ k smallest DISTINCT deterministic hash draws per
    * window in a RocksDB list — min-k of a union IS min-k of per-batch
    * min-ks (q210's mergeable-summary contract), so batch boundaries and
    * in-batch order vanish from the final state. State is O(windows·k)
    * doubles where exact distinct is O(users·windows) and unbounded.
    */
  class KmvProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, Double), KmvSnap] {
    @transient private var mins: ListState[Double] = _
    @transient private var nSt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      mins = getHandle.getListState[Double]("mins",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
      nSt = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[KmvSnap] = {
      val cur = scala.collection.mutable.SortedSet.empty[Double]
      mins.get().foreach(cur += _)
      var n = if (nSt.exists()) nSt.get() else 0L
      rows.foreach { case (_, u) => n += 1; cur += u } // set semantics dedup
      val kept = cur.take(k).toArray // the KMV merge: min-k of the union
      mins.put(kept)
      nSt.update(n)
      Iterator.single(KmvSnap(key, n, kept.length, kept.last))
    }
  }

  /** (window_s, hash-draw) stream → per-window bottom-k snapshots. */
  def kmvDistinct(rows: Dataset[(Long, Double)], k: Int): Dataset[KmvSnap] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new KmvProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** (bucket, token) stream → per-bucket MG sketch snapshots. */
  def heavyHitters(rows: Dataset[(Int, String)], k: Int): Dataset[BucketSketch] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new HeavyHitterProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** (user_id, value_micro) stream → per-key running-total snapshots. */
  def runningTotals(rows: Dataset[(Long, Long)]): Dataset[UserStat] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Gap sessionization on `transformWithState` with EVENT-TIME TIMERS —
    * the modern twin of [[sessionize]]'s flatMapGroupsWithState form, and
    * deliberately the SAME emission contract so q39's oracle logic carries
    * over: a session closes when a later in-batch event exceeds the gap,
    * or when the watermark passes end+gap (here: a registered event-time
    * timer fires, vs GroupState's setTimeoutTimestamp). The open session's
    * pending timer is re-registered as events extend it (delete-then-
    * register — GroupState's implicit single timeout made this invisible;
    * the explicit API is what also enables MULTIPLE timers per key, which
    * GroupState cannot express). State and timers live on the RocksDB
    * provider.
    */
  final case class SessTimerState(startUs: Long, endUs: Long, n: Long, timerMs: Long)

  class SessionTimerProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, Evt, Session] {
    private val gapUs = gapMinutes * 60 * 1000000L
    private val gapMs = gapMinutes * 60 * 1000L
    @transient private var st: ValueState[SessTimerState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessTimerState]("sess",
        org.apache.spark.sql.Encoders.product[SessTimerState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, evts: Iterator[Evt],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = evts.map(e => toUs(e.ts)).toSeq.sorted
      val closed = Seq.newBuilder[Session]
      var cur: Option[SessTimerState] = if (st.exists()) Some(st.get()) else None
      val oldTimer = cur.map(_.timerMs)
      for (t <- sorted) {
        cur match {
          case Some(s) if t - s.endUs <= gapUs =>
            // fold BOTH bounds (see sessionize): a cross-batch late event
            // inside the watermark may precede the recorded session start
            cur = Some(s.copy(startUs = math.min(s.startUs, t),
              endUs = math.max(s.endUs, t), n = s.n + 1))
          case Some(s) =>
            closed += Session(uid, fromUs(s.startUs), fromUs(s.endUs), s.n)
            cur = Some(SessTimerState(t, t, 1, 0L))
          case None =>
            cur = Some(SessTimerState(t, t, 1, 0L))
        }
      }
      cur.foreach { s =>
        val newTimer = s.endUs / 1000 + gapMs
        if (!oldTimer.contains(newTimer)) {
          oldTimer.filter(_ > 0).foreach(getHandle.deleteTimer)
          getHandle.registerTimer(newTimer)
        }
        st.update(s.copy(timerMs = newTimer))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      if (st.exists()) {
        val s = st.get()
        // only the CURRENT session's timer closes it: a stale timer that
        // raced the delete-then-register would otherwise clip a live session
        if (s.timerMs == expiredTimerInfo.getExpiryTimeInMs()) {
          st.clear()
          Iterator.single(Session(uid, fromUs(s.startUs), fromUs(s.endUs), s.n))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Evt stream → closed sessions via event-time-timer transformWithState. */
  def sessionizeTws(events: Dataset[Evt], gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-(user, event_type) running counts on `transformWithState`
    * MAPSTATE — the composite-state surface (ValueState: q184, timers:
    * q188, MapState: here). The map is keyed by event_type WITHIN the
    * user's state partition: updating one type touches ONE RocksDB cell,
    * not a serialized blob of all types — `GroupState` would rewrite the
    * whole map per batch, which is the practical difference once per-key
    * state grows past a few entries. Emits the key's full updated
    * snapshot per batch; counts are exact longs, so batch boundaries and
    * in-batch order cannot move the final answer.
    */
  class TypeCountsProcessor
      extends StatefulProcessor[Long, (Long, String), TypeCount] {
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("type_counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[TypeCount] = {
      rows.foreach { case (_, tpe) =>
        val cur = if (st.containsKey(tpe)) st.getValue(tpe) else 0L
        st.updateValue(tpe, cur + 1L)
      }
      st.iterator().map { case (tpe, n) => TypeCount(uid, tpe, n) }
    }
  }

  /** (user_id, event_type) stream → per-(user, type) count snapshots. */
  def typeCounts(rows: Dataset[(Long, String)]): Dataset[TypeCount] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[streamSession]] child with the RocksDB state-store provider —
    * required by every `transformWithState` query/spec; one definition so
    * the provider class name lives in exactly one place.
    */
  def rocksSession(parent: org.apache.spark.sql.SparkSession,
      parts: Int = 4): org.apache.spark.sql.SparkSession = {
    val ss = streamSession(parent, parts)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss
  }

  /** Shared MemoryStream harness: feed `data` as two batches (the repo's
    * standard driven-to-completion shape), drain each, and return the
    * memory sink's rows detached from the stopped stream. The child
    * session (and its conf: 4 state partitions, RocksDB when the caller
    * built one via [[rocksSession]]) comes from the caller so specs that
    * need per-batch inspection can keep driving manually — this helper is
    * the six-line tail every gate query was duplicating.
    */
  def driveTwoBatches[I](ss: org.apache.spark.sql.SparkSession, data: Seq[I],
      mode: OutputMode)(build: Dataset[I] => Dataset[_])(
      implicit enc: org.apache.spark.sql.Encoder[I]): DataFrame = {
    implicit val sqlCtx = ss.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[I]
    val qn = s"graft_drive_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val query = build(mem.toDS())
      .writeStream.format("memory").queryName(qn).outputMode(mode).start()
    try {
      val (b1, b2) = data.splitAt(data.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      // detach from the stopped stream; coalesce(1) first (r17) — the
      // sink holds a feed-bounded handful of rows, but toRdd of the
      // memory table parallelizes to defaultParallelism, so the eager
      // checkpoint burned one trivial task PER CORE (32 on the bench box,
      // ~0.15 s each of pure task overhead) at every detach site
      ss.table(qn).coalesce(1).localCheckpoint(eager = true)
    } finally query.stop()
  }
}
