package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{H264, H264Cabac}

/** Pins for the CABAC intra path (q314): engine-table structure, a
  * randomized encode∘decode = id sweep over the raw arithmetic engine,
  * the repo's pinned Table 9-39 bin-context conventions, and the
  * stream-level construction-inverse gate.
  */
class H264CabacSpec extends AnyFunSuite {

  // ------------------------------------------------------------------
  // engine tables
  // ------------------------------------------------------------------

  test("rangeTabLPS: shape, endpoint rows, column/row monotonicity") {
    val t = H264Cabac.RangeTabLPS
    assert(t.length == 64 && t.forall(_.length == 4))
    assert(t(0).sameElements(Array(128, 176, 208, 240)), "state-0 row")
    assert(t(63).sameElements(Array(2, 2, 2, 2)), "terminate row")
    for (q <- 0 until 4; s <- 1 until 64)
      assert(t(s)(q) <= t(s - 1)(q), s"column $q must fall at state $s")
    for (s <- 0 until 63; q <- 1 until 4)
      assert(t(s)(q) > t(s)(q - 1), s"row $s must rise across qIdx")
    assert(t.flatten.forall(v => v >= 2 && v <= 240))
  }

  test("state transitions: LPS monotone non-decreasing, below MPS; " +
      "MPS closed form; 63 absorbing") {
    val lps = H264Cabac.TransIdxLPS
    assert(lps.length == 64)
    assert(lps(0) == 0 && lps(63) == 63)
    for (s <- 1 until 64) assert(lps(s) >= lps(s - 1), s"lps($s)")
    // an LPS never increases confidence past an MPS step
    for (s <- 0 until 62) assert(lps(s) <= s, s"lps($s) must not exceed s")
    for (s <- 0 until 62) assert(H264Cabac.transIdxMPS(s) == s + 1)
    assert(H264Cabac.transIdxMPS(62) == 62 && H264Cabac.transIdxMPS(63) == 63)
  }

  // ------------------------------------------------------------------
  // raw engine: randomized encode -> decode identity
  // ------------------------------------------------------------------

  test("arithmetic engine round-trips random decision/bypass mixes " +
      "over adaptive contexts (uniform init)") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 50) {
      val n = 200 + rnd.nextInt(800)
      // (kind, ctxIdx, bin): kind 0 decision, 1 bypass
      val plan = Array.fill(n)((rnd.nextInt(2), rnd.nextInt(40),
        rnd.nextInt(2)))
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w)
      plan.foreach {
        case (0, c, b) => e.decision(c, b)
        case (_, _, b) => e.bypass(b)
      }
      e.terminate(1)
      w.alignByte()
      val bytes = w.result()
      val d = new H264Cabac.Decoder(bytes, 0)
      plan.zipWithIndex.foreach {
        case ((0, c, b), i) =>
          assert(d.decision(c) == b, s"trial $trial decision $i")
        case ((_, _, b), i) =>
          assert(d.bypass() == b, s"trial $trial bypass $i")
      }
      assert(d.terminate() == 1, s"trial $trial terminate")
    }
  }

  test("interleaved end_of_slice terminates decode mid-stream exactly " +
      "where encoded") {
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w)
    for (i <- 0 until 64) {
      e.decision(i % 8, i % 2)
      e.terminate(0)
    }
    e.decision(3, 1)
    e.terminate(1)
    w.alignByte()
    val d = new H264Cabac.Decoder(w.result(), 0)
    for (i <- 0 until 64) {
      assert(d.decision(i % 8) == i % 2)
      assert(d.terminate() == 0, s"premature terminate at $i")
    }
    assert(d.decision(3) == 1)
    assert(d.terminate() == 1)
  }

  // ------------------------------------------------------------------
  // stream-level construction-inverse gate
  // ------------------------------------------------------------------

  test("CABAC intra streams: encode -> decode BIT-EXACT planes and " +
      "gate sums; UEG0 escape, full CBP sweep, both MB kinds hit") {
    var sawEscape = false // a |level| > 15 forces the EG0 bypass suffix
    var sawZeroCbp = false
    var sawFullCbp = false
    for (id <- 0L until 24L) {
      val wMb = (2 + id % 2).toInt
      val hMb = (1 + (id / 2) % 2).toInt
      val nf = (1 + id % 2).toInt
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264Cabac.encode(id, wMb, hMb, nf, qp)
      val st = H264Cabac.decode(bytes).getOrElse(fail(s"id=$id -> None"))
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f levels")
        assert(got.modeSum == exp.modeSum)
        assert(got.chromaModeSum == exp.chromaModeSum)
        assert(got.i4ModeSum == exp.i4ModeSum)
        assert(got.nI4Mbs == exp.nI4Mbs)
        assert(got.cbpSum == exp.cbpSum, s"id=$id f=$f cbp")
        assert(got.binChecksum == exp.binChecksum, s"id=$id f=$f bins")
      }
      for (f <- 0 until nf; mb <- 0 until wMb * hMb) {
        if (H264.ConstructH.isI4(id, mb)) {
          val cbp = H264Cabac.ConstructC.cbpI4(id, mb)
          if (cbp == 0) sawZeroCbp = true
          if (cbp == 47) sawFullCbp = true
        } else if (H264Cabac.ConstructC.wideDc(id, f, mb).exists(v =>
          math.abs(v) > 15)) sawEscape = true
      }
    }
    assert(sawEscape, "construction never escaped into the EG0 suffix")
    assert(sawZeroCbp && sawFullCbp, "CBP sweep missed an endpoint")
  }

  test("rejection: truncation, CAVLC/CABAC cross-decode, corrupted " +
      "alignment all fall through") {
    val (bytes, _) = H264Cabac.encode(5L, 2, 2, 1, 24)
    assert(H264Cabac.decode(bytes).isDefined)
    assert(H264Cabac.decode(bytes.take(bytes.length - 6)).isEmpty)
    // the CAVLC decoder must reject a CABAC PPS and vice versa
    assert(H264.decode(bytes).isEmpty, "CAVLC decoder accepted CABAC")
    val (cavlc, _) = H264.encode(5L, 2, 2, 1, 24)
    assert(H264Cabac.decode(cavlc).isEmpty, "CABAC decoder accepted CAVLC")
    // flip a bit inside the arithmetic payload: either the engine
    // desynchronizes (bad syntax -> None) or recon sums change; find a
    // byte whose flip kills the decode or changes the level checksum
    val mid = bytes.length - 8
    val corrupted = bytes.clone()
    corrupted(mid) = (corrupted(mid) ^ 0x40).toByte
    val d = H264Cabac.decode(corrupted)
    val orig = H264Cabac.decode(bytes).get
    assert(d.isEmpty ||
      d.get.frames.map(_.levelChecksum) != orig.frames.map(_.levelChecksum) ||
      !d.get.frames.head.y.sameElements(orig.frames.head.y),
      "bit flip in the payload went unnoticed")
  }
}
