package graft

import org.apache.spark.sql.functions._
import graft.functions.SkewAgg
import graft.operators.{AsOfJoin, Components}

class AsOfSkewJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf attaches the most recent prior-or-equal right row per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100L),
      (1L, ts("2026-01-01 12:00:00"), 101L),
      (1L, ts("2026-01-01 12:30:00"), 102L),
      (2L, ts("2026-01-01 09:00:00"), 200L)
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2026-01-01 09:30:00"), 1.0),
      (1L, ts("2026-01-01 12:00:00"), 2.0), // equal ts: inclusive match
      (2L, ts("2026-01-01 09:30:00"), 9.0)  // after the only left row
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts")
      .select($"lid", $"r_ts", $"r_v")
      .collect().map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap

    assert(got(100L) == ((Some(ts("2026-01-01 09:30:00")), Some(1.0))))
    assert(got(101L) == ((Some(ts("2026-01-01 12:00:00")), Some(2.0)))) // ts tie → match
    assert(got(102L) == ((Some(ts("2026-01-01 12:00:00")), Some(2.0))))
    assert(got(200L) == ((None, None))) // left-outer: no prior right row
  }

  test("asOf carries a NULL right payload VALUE atomically — no field mixing") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2026-01-01 11:30:00"), 100L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), Some(1.0)),
      (1L, ts("2026-01-01 11:00:00"), None) // latest right row: v IS NULL
    ).toDF("k", "ts", "v")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "ts")
      .select($"r_ts", $"r_v").head()
    // the 11:00 row must attach AS A WHOLE: (11:00, NULL) — a per-column
    // ignoreNulls fill would fabricate (11:00, 1.0), a row that never existed
    assert(r.getTimestamp(0) == ts("2026-01-01 11:00:00"))
    assert(r.isNullAt(1), s"expected NULL r_v, got ${r.get(1)}")
  }

  test("asOf NULL keys match nothing, like an equi-join") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (Option.empty[Long], ts("2026-01-01 12:00:00"), 100L),
      (Option(1L), ts("2026-01-01 12:00:00"), 101L)
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (Option.empty[Long], ts("2026-01-01 11:00:00"), 5.0),
      (Option(1L), ts("2026-01-01 11:00:00"), 7.0)
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts")
      .collect().map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("r_v"))).toMap
    assert(got(101L) == Some(7.0))
    assert(got(100L).isEmpty, "NULL-key left row must not match NULL-key right rows")
  }

  test("saltedJoin keeps rows whose salt source is NULL") {
    val s = spark
    import s.implicits._
    val big = Seq(("hot", Option(1L)), ("hot", Option.empty[Long]), ("cold", Option(3L)))
      .toDF("k", "seed")
    val dim = Seq(("hot", 2.0), ("cold", 3.0)).toDF("k", "w")
    val salted = SkewAgg.saltedJoin(big, dim, Seq("k"), pmod($"seed", lit(97)))
    assert(salted.count() == 3, "NULL salt source must not drop the row")
  }

  test("asOf is partitioning-invariant (shuffled input, same result)") {
    val s = spark
    import s.implicits._
    val left = (1 to 50).map(i => (i.toLong % 5, ts(f"2026-01-01 ${10 + i % 8}%02d:00:00"), i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 20).map(i => (i.toLong % 5, ts(f"2026-01-01 ${9 + i % 9}%02d:30:00"), i.toDouble))
      .toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max("v").as("v")) // unique per (key, ts)
    def run(lp: Int, rp: Int) = AsOfJoin.asOf(
        left.repartition(lp), right.repartition(rp), Seq("k"), "ts")
      .orderBy("lid").collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(run(1, 7) == run(13, 2))
  }

  test("saltedJoin equals the plain join exactly") {
    val s = spark
    import s.implicits._
    val big = (1 to 500).map(i => (if (i % 10 == 0) "cold" else "hot", i.toLong))
      .toDF("k", "id") // 90% of rows share one key — the skew shape
    val dim = Seq(("hot", 2.0), ("cold", 3.0), ("absent", 9.9)).toDF("k", "w")
    val salted = SkewAgg.saltedJoin(big, dim, Seq("k"), xxhash64($"id"), buckets = 8)
      .orderBy("id").collect().map(_.toSeq.map(String.valueOf)).toSeq
    val plain = big.join(dim, Seq("k"))
      .orderBy("id").collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(salted == plain)
    assert(salted.size == 500) // inner join; 'absent' matches nothing
  }

  test("connectedComponents: empty edges, self-loops, and a maxIter cap") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(empty).count() == 0)

    val selfLoop = Seq((5L, 5L), (5L, 6L)).toDF("a", "b")
    val comps = Components.connectedComponents(selfLoop)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(5L -> 5L, 6L -> 5L))

    // a 12-node path needs ~11 rounds to reach the far end; maxIter = 3
    // must terminate (capped) with every label still a valid node id —
    // the cap trades exactness for a bound on pathological diameters
    val chain = (0 until 11).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val capped = Components.connectedComponents(chain, maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.size == 12)
    assert(capped.values.forall(v => v >= 0L && v <= 11L))
    assert(capped(0L) == 0L)
    // and with enough rounds the same graph fully converges
    val full = Components.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.forall(_ == 0L))
  }
}
