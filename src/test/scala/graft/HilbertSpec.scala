package graft

import graft.functions.{Hilbert, ZOrder}
import org.apache.spark.sql.functions._

/** Hilbert index: the defining curve properties against the plain-Scala
  * twin, and the SQL stage-chain (the form the queries and the DuckDB
  * oracle run) against that twin.
  */
class HilbertSpec extends SparkSpec {

  test("base quadrant order is the canonical U") {
    assert(Hilbert.xy2d(1, 0, 0) == 0L)
    assert(Hilbert.xy2d(1, 0, 1) == 1L)
    assert(Hilbert.xy2d(1, 1, 1) == 2L)
    assert(Hilbert.xy2d(1, 1, 0) == 3L)
  }

  test("bijective on the full grid") {
    for (bits <- Seq(2, 4)) {
      val n = 1 << bits
      val ds = for (x <- 0 until n; y <- 0 until n) yield Hilbert.xy2d(bits, x, y)
      assert(ds.distinct.size == n * n)
      assert(ds.min == 0L && ds.max == n.toLong * n - 1)
    }
  }

  test("continuity: consecutive indices are Manhattan-1 neighbours") {
    // the property Z-order lacks (its power-of-2 boundary jumps are the
    // locality cost q291 measures) — check every consecutive pair
    val bits = 5
    val n = 1 << bits
    val byD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      byD(Hilbert.xy2d(bits, x, y).toInt) = (x, y)
    for (d <- 1 until n * n) {
      val (x0, y0) = byD(d - 1)
      val (x1, y1) = byD(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
    // counter-property: the Z curve DOES jump (so the comparison in q291
    // is between genuinely different locality classes)
    val zByD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val z = (0 until bits).map(i =>
        (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))).sum
      zByD(z) = (x, y)
    }
    val zJumps = (1 until n * n).count { d =>
      val (x0, y0) = zByD(d - 1)
      val (x1, y1) = zByD(d)
      math.abs(x1 - x0) + math.abs(y1 - y0) > 1
    }
    assert(zJumps > 0, "Z curve unexpectedly continuous")
  }

  test("SQL stage-chain matches the Scala twin on the full 8-bit grid") {
    val spark = this.spark
    import spark.implicits._
    val grid = spark.range(256).select($"id".cast("int").as("x"))
      .crossJoin(spark.range(256).select($"id".cast("int").as("y")))
    val got = Hilbert.withIndex(grid, "x", "y", "hd")
      .select($"x", $"y", $"hd").as[(Int, Int, Long)].collect()
    assert(got.length == 65536)
    got.foreach { case (x, y, hd) =>
      assert(hd == Hilbert.xy2d(8, x, y), s"($x, $y): $hd")
    }
  }

  test("withIndex keeps the stage chain inside codegen (no shuffle)") {
    val spark = this.spark
    import spark.implicits._
    val df = Hilbert.withIndex(
      spark.range(100).select(($"id" % 16).cast("int").as("x"),
        ($"id" % 13).cast("int").as("y")), "x", "y", "hd")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"hilbert chain shuffled:\n$plan")
  }

  test("deep-level flip constant is the GRID size, not the level size") {
    // the classic-bug pin: rotating with s−1−x instead of n−1−x still
    // yields a bijection on some inputs but breaks continuity; this pair
    // sits exactly where the two disagree
    val bits = 3
    val n = 1 << bits
    val byD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      byD(Hilbert.xy2d(bits, x, y).toInt) = (x, y)
    assert(byD.toSeq.distinct.size == n * n)
  }
}
