package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Evt, Session}

/** Hermetic Structured Streaming specs over MemoryStream — the streaming
  * twins of q32/q33 must agree with their batch semantics.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("chained window aggs: two stateful operators in one query, correct roll-up") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val qn = s"chain_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = StreamingOps.chainedWindowCounts(mem.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (ts("2024-01-01 01:05:00"), "click"),   // bucket 00:00, hour 01
        (ts("2024-01-01 01:40:00"), "click"),
        (ts("2024-01-01 04:10:00"), "click"),   // bucket 00:00, hour 04
        (ts("2024-01-01 07:10:00"), "view"))    // bucket 06:00
      q.processAllAvailable()
      // flush: sentinel far past every window end + watermark delay
      mem.addData((ts("2024-01-10 00:00:00"), "zz"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-20 00:00:00"), "zz"))
      q.processAllAvailable()
      // the one streaming query genuinely ran TWO stateful operators
      assert(q.lastProgress.stateOperators.size == 2,
        s"expected 2 state operators, got ${q.lastProgress.stateOperators.size}")
      val rows = s.table(qn).filter($"event_type" =!= "zz")
        .orderBy($"bucket_start", $"event_type")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(rows.toSeq == Seq(
        ("2024-01-01 00:00:00.0", "click", 3L, 2L, 2L),
        ("2024-01-01 06:00:00.0", "view", 1L, 1L, 1L)))
    } finally q.stop()
  }

  test("streaming tumbling counts equal the batch aggregation (complete mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.tumblingCounts(df)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2.5),
        (ts("2024-01-01 11:05:00"), "click", 4.0),
        (ts("2024-01-01 10:30:00"), "view", 1.0))
      q.processAllAvailable()
      val out = s.table("tumbling")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(out == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.5),
        ("2024-01-01 11:00:00.0", "click", 1L, 4.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "event_id", "payload")
    val q = StreamingOps.dedupStream(df, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a"),
        (ts("2024-01-01 10:00:00"), 1L, "a-dup"),
        (ts("2024-01-01 10:01:00"), 2L, "b"))
      q.processAllAvailable()
      // redelivered duplicate with a RE-STAMPED timestamp, still within the
      // watermark horizon — must be dropped (per-key dedup, not per key+ts)
      mem.addData((ts("2024-01-01 10:05:00"), 1L, "a-restamped"))
      q.processAllAvailable()
      val out = s.table("dedup").collect().map(r => (r.getLong(1), r.getString(2)))
      assert(out.map(_._1).sorted.toSeq == Seq(1L, 2L))
      assert(out.toMap.apply(1L) == "a") // first occurrence wins
    } finally q.stop()
  }

  test("stream-stream interval join matches q94's batch semantics incrementally") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val purch = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val q = StreamingOps.intervalJoin(
        purch.toDF().toDF("p_user", "purchase_id", "p_ts"),
        clicks.toDF().toDF("c_user", "c_ts"))
      .writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two clicks inside the 30-min lookback, one exactly ON the
      // purchase instant (excluded: c_ts < p_ts is strict), one before the
      // window. user 2: purchase with no clicks at all.
      clicks.addData(
        (1L, ts("2024-01-01 09:50:00")), (1L, ts("2024-01-01 09:59:00")),
        (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 09:20:00")))
      purch.addData((1L, 100L, ts("2024-01-01 10:00:00")),
        (2L, 200L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val inner = s.table("ivj").filter($"c_ts".isNotNull)
        .collect().map(r => (r.getLong(1), r.getTimestamp(3).toString)).toSet
      assert(inner == Set((100L, "2024-01-01 09:50:00.0"), (100L, "2024-01-01 09:59:00.0")))

      // advance both watermarks far past user 2's window; the next batch
      // emits the null-padded row the batch LEFT JOIN would produce
      clicks.addData((9L, ts("2024-01-01 12:00:00")))
      purch.addData((9L, 900L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-01 12:30:00")))
      purch.addData((9L, 901L, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val unmatched = s.table("ivj").filter($"c_ts".isNull)
        .collect().map(_.getLong(1)).toSet
      assert(unmatched.contains(200L), "click-less purchase must null-pad after watermark")
    } finally q.stop()
  }

  test("file streaming source → aggregate → parquet sink roundtrip") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val (in, out, ck) = (s"$base/in", s"$base/out", s"$base/ck")
    // two parquet drops = two discovered micro-batches
    Seq((ts("2024-01-01 10:05:00"), "click", 1.0))
      .toDF("ts", "event_type", "value").write.parquet(s"$in/b1")
    Seq((ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 3.0))
      .toDF("ts", "event_type", "value").write.parquet(s"$in/b2")
    val src = s.readStream
      .schema("ts timestamp, event_type string, value double")
      .option("recursiveFileLookup", "true").parquet(in)
    val q = StreamingOps.tumblingCounts(src)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; force the 10:00
      // window shut with a late-hour drop, then one more discovery pass
      Seq((ts("2024-01-01 13:00:00"), "view", 9.0))
        .toDF("ts", "event_type", "value").write.parquet(s"$in/b3")
      q.processAllAvailable()
    } finally q.stop()
    val got = s.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)),
      s"10:00 click window missing from file sink: $got")
  }

  test("streaming sessionization closes sessions on in-batch gap and on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Evt]
    val q = StreamingOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two sessions for user 1 — the 2h gap closes the first in-batch
      mem.addData(
        Evt(1L, ts("2024-01-01 10:00:00")), Evt(1L, ts("2024-01-01 10:10:00")),
        Evt(1L, ts("2024-01-01 12:30:00")),
        Evt(2L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val closed1 = s.table("sessions").as[Session].collect().toSet
      // user 1's first session closes on the in-batch 2h gap; user 2's may
      // ALSO close already — the batch's own max event time (12:30) pushes
      // the watermark past user 2's gap horizon
      assert(closed1.contains(
        Session(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2)))
      assert(!closed1.exists(s0 => s0.user_id == 1L && s0.session_start == ts("2024-01-01 12:30:00")))

      // batch 2: advance the watermark far past everyone's gap horizon —
      // the open sessions for users 1 and 2 must time out and emit
      mem.addData(Evt(3L, ts("2024-01-02 09:00:00")))
      q.processAllAvailable()
      // one more batch so the new watermark triggers the timeouts
      mem.addData(Evt(3L, ts("2024-01-02 09:01:00")))
      q.processAllAvailable()
      val closedAll = s.table("sessions").as[Session].collect().toSet
      assert(closedAll.contains(
        Session(1L, ts("2024-01-01 12:30:00"), ts("2024-01-01 12:30:00"), 1)))
      assert(closedAll.contains(
        Session(2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1)))
    } finally q.stop()
  }

  test("streaming queries never leak conf or temp views into the shared session") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val viewsBefore = spark.catalog.listTables().count()
    SparkEntry.queries("q41_streaming_tumbling")(spark, sfDir).count()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "q41 leaked its 4-partition conf into the shared session")
    assert(spark.catalog.listTables().count() == viewsBefore,
      "q41 leaked its memory-sink temp view into the shared session")
  }

  test("timer-based TWS sessionization equals flatMapGroupsWithState on the same feed") {
    // the two stateful APIs implement ONE emission contract; feed both the
    // same two batches and compare closed-session sets exactly
    def run(build: org.apache.spark.sql.Dataset[Evt] => org.apache.spark.sql.Dataset[Session],
        rocks: Boolean): Set[(Long, Timestamp, Timestamp, Long)] = {
      val ss = if (rocks) StreamingOps.rocksSession(spark)
               else StreamingOps.streamSession(spark)
      import ss.implicits._
      implicit val sqlCtx = ss.sqlContext
      val mem = MemoryStream[Evt]
      val qn = s"sess_eq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = build(mem.toDS())
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(
          Evt(1, ts("2024-01-01 10:00:00")), Evt(1, ts("2024-01-01 10:10:00")),
          Evt(2, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        mem.addData(
          Evt(1, ts("2024-01-01 12:00:00")), // gap > 30 min: closes session 1
          Evt(2, ts("2024-01-01 10:05:00")),
          Evt(3, ts("2024-01-02 09:00:00"))) // advances watermark far past all
        q.processAllAvailable()
        ss.table(qn).as[Session].collect()
          .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      } finally q.stop()
    }
    val viaTimers = run(StreamingOps.sessionizeTws(_, gapMinutes = 30), rocks = true)
    val viaGroupState = run(StreamingOps.sessionize(_, gapMinutes = 30), rocks = false)
    assert(viaTimers == viaGroupState,
      s"APIs diverged:\ntimers: $viaTimers\ngroupState: $viaGroupState")
    assert(viaTimers.exists(_._1 == 1L), "user 1's closed session missing")
  }

  test("in-watermark late event EXTENDS the session start in both stateful APIs") {
    // user 2's first event (10:05) arrives in batch 1; batch 2 delivers an
    // OLDER event (10:01) still above the watermark (batch-1 max 10:10 −
    // 10 min = 10:00). The merge must fold startUs = min(start, t), matching
    // what batch gaps-and-islands computes over the union — a max-only fold
    // would leave session_start at 10:05 with n = 2.
    def run(build: org.apache.spark.sql.Dataset[Evt] => org.apache.spark.sql.Dataset[Session],
        rocks: Boolean): Set[(Long, Timestamp, Timestamp, Long)] = {
      val ss = if (rocks) StreamingOps.rocksSession(spark)
               else StreamingOps.streamSession(spark)
      import ss.implicits._
      implicit val sqlCtx = ss.sqlContext
      val mem = MemoryStream[Evt]
      val qn = s"sess_late_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = build(mem.toDS())
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(Evt(2, ts("2024-01-01 10:05:00")), Evt(1, ts("2024-01-01 10:10:00")))
        q.processAllAvailable()
        mem.addData(Evt(2, ts("2024-01-01 10:01:00"))) // late but in-watermark
        q.processAllAvailable()
        mem.addData(Evt(3, ts("2024-01-02 09:00:00"))) // push watermark far out
        q.processAllAvailable()
        mem.addData(Evt(3, ts("2024-01-02 09:01:00"))) // trigger the timeouts
        q.processAllAvailable()
        ss.table(qn).as[Session].collect()
          .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      } finally q.stop()
    }
    for (rocks <- Seq(true, false)) {
      val out = if (rocks) run(StreamingOps.sessionizeTws(_, gapMinutes = 30), rocks = true)
                else run(StreamingOps.sessionize(_, gapMinutes = 30), rocks = false)
      assert(out.contains((2L, ts("2024-01-01 10:01:00"), ts("2024-01-01 10:05:00"), 2L)),
        s"rocks=$rocks: late event did not extend the session backwards: $out")
    }
  }

  test("transformWithState MapState keeps per-type cells across batches") {
    val ss = StreamingOps.rocksSession(spark)
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.typeCounts(mem.toDS())
      .writeStream.format("memory").queryName("tws_types")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, "click"), (1L, "view"), (1L, "click"))
      q.processAllAvailable()
      val b1 = ss.table("tws_types").as[(Long, String, Long)].collect().toSet
      assert(b1 == Set((1L, "click", 2L), (1L, "view", 1L)), s"batch-1 wrong: $b1")
      // batch 2 updates ONE cell; the untouched cell's count must persist
      mem.addData((1L, "click"))
      q.processAllAvailable()
      val all = ss.table("tws_types").as[(Long, String, Long)].collect()
      assert(all.contains((1L, "click", 3L)), s"click cell not incremented: ${all.toSeq}")
      assert(all.count { case (_, t, n) => t == "view" && n == 1L } >= 1,
        "view cell lost across batches")
    } finally q.stop()
  }

  test("transformWithState running totals fold ValueState across batches") {
    val ss = StreamingOps.rocksSession(spark)
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingOps.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("tws_totals")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, 10L), (1L, 20L), (2L, 5L))
      q.processAllAvailable()
      val afterB1 = ss.table("tws_totals").as[(Long, Long, Long)].collect().toSet
      assert(afterB1 == Set((1L, 2L, 30L), (2L, 1L, 5L)),
        s"batch-1 snapshots wrong: $afterB1")
      // batch 2: state must carry over (not restart from zero), and keys
      // absent from the batch must emit nothing new
      mem.addData((1L, 5L), (3L, 7L))
      q.processAllAvailable()
      val all = ss.table("tws_totals").as[(Long, Long, Long)].collect()
      val b2 = all.diff(afterB1.toSeq)
      assert(b2.toSet == Set((1L, 3L, 35L), (3L, 1L, 7L)),
        s"batch-2 snapshots wrong: ${b2.toSet}")
      assert(all.count(_._1 == 2L) == 1, "key 2 re-emitted without input")
    } finally q.stop()
  }

  test("windowed aggregation state survives a checkpoint restart (complete mode)") {
    // q286 gates the dedup state type; this covers the window-agg store:
    // batch 1 → STOP → new query from the same checkpoint → batch 2. The
    // final Complete-mode table must aggregate BOTH batches — a restart
    // that lost the state store would count only batch 2.
    val ss = StreamingOps.streamSession(spark)
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-agg")
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def start(qn: String) = StreamingOps.tumblingCounts(
        mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Complete).start()
    val q1 = start("restart_agg_a")
    try {
      mem.addData((ts("2024-01-01 10:05:00"), "click", 1.5),
        (ts("2024-01-01 10:40:00"), "click", 2.5))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start("restart_agg_b")
    try {
      mem.addData((ts("2024-01-01 10:55:00"), "click", 3.0),
        (ts("2024-01-01 11:10:00"), "view", 1.0))
      q2.processAllAvailable()
      val out = ss.table("restart_agg_b")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(out == Set(
        (ts("2024-01-01 10:00:00"), "click", 3L, 7.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 1.0)),
        s"restarted window agg lost pre-restart state: $out")
    } finally q2.stop()
  }

  test("transformWithState ValueState survives a checkpoint restart (RocksDB)") {
    // the third state type (q286 dedup, above window agg): running totals
    // fold (n, sum) in RocksDB ValueState; the post-restart emission for
    // key 1 must continue from the restored (2, 30), not restart at zero
    val ss = StreamingOps.rocksSession(spark)
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-tws")
    val mem = MemoryStream[(Long, Long)]
    // the memory sink refuses recovery outside Complete mode; foreachBatch
    // is the recovery-capable Update-mode sink (it rides the same commit
    // log a production idempotent writer would)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]
    def start() = StreamingOps.runningTotals(mem.toDS())
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.UserStat], _: Long) =>
        df.collect().foreach(s => emitted.add((s.user_id, s.n_events, s.sum_micro)))
      }
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Update).start()
    val q1 = start()
    try {
      mem.addData((1L, 10L), (1L, 20L), (2L, 5L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emitted.toArray.toSet == Set((1L, 2L, 30L), (2L, 1L, 5L)),
      s"pre-restart snapshots wrong: ${emitted.toArray.toSet}")
    emitted.clear()
    val q2 = start()
    try {
      mem.addData((1L, 5L))
      q2.processAllAvailable()
      // post-restart emission must CONTINUE from the restored (2, 30)
      // state, not restart at zero
      val out = emitted.toArray(Array.empty[(Long, Long, Long)]).toSet
      assert(out == Set((1L, 3L, 35L)),
        s"restarted TWS did not resume from restored state: $out")
    } finally q2.stop()
  }

  test("streaming KMV final state is batch-split and in-batch-order invariant") {
    // q297's contract: min-k of a union is min-k of per-batch min-ks, so
    // neither the micro-batch split nor in-batch order can move the final
    // (k_got, u_k); the sequence-numbered snapshot selection recovers it.
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, Double)] = (0 until 500).map { i =>
      ((i % 3).toLong,
        (java.lang.Long.parseLong(graft.core.Det.md5hex(s"kmv$i").take(12), 16)
          % 1000000L).toDouble / 1000000d)
    }
    def finalState(splits: Seq[Seq[(Long, Double)]]): Seq[(Long, Long, Int, Double)] = {
      val ss = StreamingOps.rocksSession(s)
      import ss.implicits._
      implicit val sqlCtx = ss.sqlContext
      val mem = MemoryStream[(Long, Double)]
      val qn = s"skmv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = StreamingOps.kmvDistinct(mem.toDS(), 64)
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Update).start()
      try {
        splits.foreach { b => mem.addData(b); q.processAllAvailable() }
        import org.apache.spark.sql.functions.{max, max_by, col}
        ss.table(qn).groupBy(col("window_s"))
          .agg(max(col("n_seen")).as("n"),
            max_by(col("k_got"), col("n_seen")).as("k"),
            max_by(col("u_k"), col("n_seen")).as("u"))
          .orderBy(col("window_s"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSeq
      } finally q.stop()
    }
    val oneShot = finalState(Seq(rows))
    val shuffled = finalState(Seq(
      rows.drop(200).reverse, rows.take(200).sortBy(_._2)))
    assert(oneShot == shuffled, s"KMV state moved with the feed order:\n" +
      s"$oneShot\n$shuffled")
    // and it equals the plain batch min-k on the same rows
    val batch = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (w, rs) =>
      val ks = rs.map(_._2).distinct.sorted.take(64)
      (w, rs.size.toLong, ks.size, ks.last)
    }
    assert(oneShot == batch, s"stream fold != batch min-k:\n$oneShot\n$batch")
  }

  test("streaming HLL is batch-split invariant and equals the batch register fold") {
    // the two facts q255 rests on: (a) for an IN-ORDER feed the windowed
    // register state folds incrementally to the SAME summary no matter
    // how the feed is split into micro-batches (max is associative+
    // commutative; out-of-order feeds are a different contract — the
    // watermark late-drops stragglers by design, which q244 audits), and
    // (b) that summary equals the batch HyperLogLog kernel on the same
    // rows.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows: Seq[(Timestamp, Long)] = (0 until 300).map { i =>
      (ts(f"2024-01-01 ${i % 3}%02d:${(i * 7) % 60}%02d:00"), (i % 113).toLong)
    }.sortBy(_._1.getTime)
    def run(splits: Seq[Seq[(Timestamp, Long)]]): Seq[(String, Long, Long, Double)] = {
      val mem = MemoryStream[(Timestamp, Long)]
      val qn = s"shll_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = StreamingOps.windowedHllDistinct(mem.toDF().toDF("ts", "user_id"))
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        splits.foreach { b => mem.addData(b); q.processAllAvailable() }
        mem.addData(Seq((ts("2024-02-01 00:00:00"), -1L))); q.processAllAvailable()
        mem.addData(Seq((ts("2024-03-01 00:00:00"), -1L))); q.processAllAvailable()
        s.table(qn).filter($"window_start" < ts("2024-01-02 00:00:00"))
          .orderBy($"window_start")
          .collect()
          .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq
      } finally q.stop()
    }
    val oneShot = run(Seq(rows))
    val threeWay = run(Seq(rows.take(50), rows.slice(50, 230), rows.drop(230)))
    assert(oneShot == threeWay, "summary depends on micro-batch split")
    assert(oneShot.size == 3, s"expected 3 hour windows, got ${oneShot.size}")

    // batch twin: same rows through the batch register kernel
    import org.apache.spark.sql.functions.{col, date_trunc}
    val batch = graft.functions.HyperLogLog.summarize(
        graft.functions.HyperLogLog.registers(
          rows.toDF("ts", "user_id")
            .withColumn("w", date_trunc("hour", col("ts"))),
          Seq("w"), graft.functions.HyperLogLog.hash60("hll", col("user_id"))),
        Seq("w"))
      .orderBy(col("w"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getAs[Long]("v_empty"),
        r.getAs[Long]("d_scaled"), r.getAs[Double]("hll_estimate"))).toSeq
    assert(oneShot == batch, s"stream fold != batch kernel:\n$oneShot\n$batch")
  }
}
