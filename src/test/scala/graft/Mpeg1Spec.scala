package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mpeg1

class Mpeg1Spec extends AnyFunSuite {

  private def encode(w: Int, h: Int, n: Int, seed: Long, qscale: Int = 2) =
    Mpeg1.encodeIFrames(w, h, n, qscale,
      lumaOf = (p, row, col) => {
        val k = seed + p * 7919L + row * 131L + col
        ((40 + math.floorMod(k, 176)).toInt, (4 + math.floorMod(k, 9)).toInt)
      },
      chromaOf = p => ((64 + (seed + p) % 128).toInt, (200 - (seed + p) % 128).toInt))

  private def expectedLuma(seed: Long, p: Int, row: Int, col: Int): (Int, Int) = {
    val k = seed + p * 7919L + row * 131L + col
    ((40 + math.floorMod(k, 176)).toInt, (4 + math.floorMod(k, 9)).toInt)
  }

  test("construction-inverse roundtrip: bounded per-pixel error on every plane") {
    // the q157/q272 gate shape at unit level: known macroblocks in, full
    // entropy decode out, per-pixel deviation bounded by the quantization
    // budget (qscale 2, one low-frequency AC per block → error well under 8)
    for ((w, h, n, seed) <- Seq((32, 16, 1, 5L), (48, 32, 3, 977L), (16, 16, 2, 31L))) {
      val bytes = encode(w, h, n, seed)
      val (meta, pics) = Mpeg1.decodeIFrames(bytes).get
      assert(meta == Mpeg1.SeqMeta(w, h, n))
      assert(pics.size == n)
      for ((pic, p) <- pics.zipWithIndex) {
        var maxDevY = 0
        for (row <- 0 until h / 16; col <- 0 until w / 16) {
          val (base, amp) = expectedLuma(seed, p, row, col)
          for (yy <- 0 until 16; xx <- 0 until 16) {
            val want = math.max(0, math.min(255,
              base + math.round(amp * math.cos((2 * (xx % 8) + 1) * math.Pi / 16.0)).toInt))
            val got = pic.y((row * 16 + yy) * w + col * 16 + xx)
            maxDevY = math.max(maxDevY, math.abs(got - want))
          }
        }
        assert(maxDevY <= 8, s"pic $p: luma deviation $maxDevY exceeds the lossy bound")
        val cbWant = (64 + (seed + p) % 128).toInt
        val crWant = (200 - (seed + p) % 128).toInt
        val devCb = pic.cb.map(v => math.abs(v - cbWant)).max
        val devCr = pic.cr.map(v => math.abs(v - crWant)).max
        assert(devCb <= 2 && devCr <= 2,
          s"pic $p: chroma deviation ($devCb, $devCr) — constant blocks are DC-exact ±rounding")
      }
    }
  }

  test("per-slice DC prediction: distinct macroblock rows decode independently") {
    // every slice resets the predictors to 128; a decoder that carried a
    // predictor across slices would shift whole rows. Row bases differ by
    // construction, so this catches the bug.
    val bytes = encode(32, 48, 1, 271L)
    val (_, pics) = Mpeg1.decodeIFrames(bytes).get
    val pic = pics.head
    for (row <- 0 until 3) {
      val (base, _) = expectedLuma(271L, 0, row, 0)
      val got = pic.y((row * 16 + 3) * 32 + 4) // off-phase sample point
      assert(math.abs(got - base) <= 15, s"row $row decoded base $got vs $base")
    }
  }

  test("escape-coded levels roundtrip (levels past the VLC table)") {
    // amp 20 → AC level ≈ round(8·5.657·20 / (2·16)) ≈ 28 > 15: must take
    // the 6-bit-run escape path and still reconstruct within the bound
    val bytes = Mpeg1.encodeIFrames(16, 16, 1, 2,
      lumaOf = (_, _, _) => (100, 20), chromaOf = _ => (128, 128))
    val (_, pics) = Mpeg1.decodeIFrames(bytes).get
    val pic = pics.head
    var maxDev = 0
    for (yy <- 0 until 16; xx <- 0 until 16) {
      val want = math.max(0, math.min(255,
        100 + math.round(20 * math.cos((2 * (xx % 8) + 1) * math.Pi / 16.0)).toInt))
      maxDev = math.max(maxDev, math.abs(pic.y(yy * 16 + xx) - want))
    }
    assert(maxDev <= 8, s"escape path deviation $maxDev")
  }

  test("VLC alphabets are prefix-free (incl. EOB and the escape prefix)") {
    def bitstring(code: Int, bits: Int): String =
      (bits - 1 to 0 by -1).map(i => (code >> i) & 1).mkString
    // the dct_coeff_next alphabet: every table code + sign is joined by
    // EOB '10' and the escape prefix '000001' — all must be prefix-free
    val acField = classOf[Mpeg1.type].getDeclaredField("AcCodes")
    acField.setAccessible(true)
    val ac = acField.get(Mpeg1).asInstanceOf[Array[(Int, Int, Int, Int)]]
      .map { case (_, _, c, b) => bitstring(c, b) }
    val alphabet = ac.toSeq :+ "10" :+ "000001"
    assert(alphabet.distinct.size == alphabet.size, "duplicate AC codes")
    for (a <- alphabet; b <- alphabet if a != b)
      assert(!b.startsWith(a), s"'$a' is a prefix of '$b'")
    // DC size tables
    for (name <- Seq("DcLumaCodes", "DcChromaCodes")) {
      val f = classOf[Mpeg1.type].getDeclaredField(name)
      f.setAccessible(true)
      val codes = f.get(Mpeg1).asInstanceOf[Array[(Int, Int)]]
        .map { case (c, b) => bitstring(c, b) }
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: '$a' prefixes '$b'")
    }
    // P-side alphabets (the r13 review found drift exactly here — the
    // construction-inverse gates can't see a shared-table error):
    // MBA codes + stuffing + escape; motion prefixes + the lone '1';
    // CBP subset; P macroblock types — each prefix-free AND the P-type
    // table carrying the normative quant-row semantics
    def codesOf(name: String): Seq[String] = {
      val f = classOf[Mpeg1.type].getDeclaredField(name)
      f.setAccessible(true)
      f.get(Mpeg1) match {
        case a: Array[(Int, Int) @unchecked] =>
          a.toSeq.map { case (c, b) => bitstring(c, b) }
        case _ => Seq.empty
      }
    }
    def assertPrefixFree(name: String, codes: Seq[String]): Unit = {
      assert(codes.distinct.size == codes.size, s"$name: duplicate codes")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: '$a' prefixes '$b'")
    }
    assertPrefixFree("MbaCodes+escape+stuffing",
      codesOf("MbaCodes") :+ "00000001111" :+ "00000001000")
    assertPrefixFree("MotionPrefix+zero", codesOf("MotionPrefix") :+ "1")
    val cbpF = classOf[Mpeg1.type].getDeclaredField("CbpCodes")
    cbpF.setAccessible(true)
    assertPrefixFree("CbpCodes", cbpF.get(Mpeg1)
      .asInstanceOf[Array[(Int, Int, Int)]].toSeq
      .map { case (_, c, b) => bitstring(c, b) })
    val pF = classOf[Mpeg1.type].getDeclaredField("PMbTypes")
    pF.setAccessible(true)
    val ptypes = pF.get(Mpeg1)
      .asInstanceOf[Array[(Int, Int, Boolean, Boolean, Boolean, Boolean)]]
    assertPrefixFree("PMbTypes",
      ptypes.toSeq.map { case (c, b, _, _, _, _) => bitstring(c, b) })
    // normative quant-row semantics (ISO 11172-2 Table B.2b): '00010' is
    // quant + MC + coded, '00001' is quant + coded without MC
    val byCode = ptypes.map { case (c, b, q, mf, pat, in) =>
      bitstring(c, b) -> (q, mf, pat, in) }.toMap
    assert(byCode("00010") == (true, true, true, false),
      "'00010' must be quant+MC+coded")
    assert(byCode("00001") == (true, false, true, false),
      "'00001' must be quant+coded without MC")
    // normative intra-matrix anchor values (mid-band rows the r13 review
    // found drifted): raster [3][1]=22, [4][4]=32, [5][3]=32
    val qF = classOf[Mpeg1.type].getDeclaredField("IntraQ")
    qF.setAccessible(true)
    val iq = qF.get(Mpeg1).asInstanceOf[Array[Int]]
    assert(iq(3 * 8 + 1) == 22 && iq(4 * 8 + 4) == 32 && iq(5 * 8 + 3) == 32,
      "default intra quantizer matrix drifted from the normative table")
    // B macroblock types (Table B.2c): prefix-free and carrying the
    // normative direction semantics — '10'/'11' interpolated, '01x'
    // backward, '001x' forward, '00011' intra
    val bF = classOf[Mpeg1.type].getDeclaredField("BMbTypes")
    bF.setAccessible(true)
    val btypes = bF.get(Mpeg1)
      .asInstanceOf[Array[(Int, Int, Boolean, Boolean, Boolean, Boolean, Boolean)]]
    assertPrefixFree("BMbTypes",
      btypes.toSeq.map { case (c, b, _, _, _, _, _) => bitstring(c, b) })
    val bByCode = btypes.map { case (c, b, q, mf, mb, pat, in) =>
      bitstring(c, b) -> (q, mf, mb, pat, in) }.toMap
    assert(bByCode("10") == (false, true, true, false, false) &&
      bByCode("11") == (false, true, true, true, false),
      "'1x' must be the interpolated (fwd+bwd) rows")
    assert(bByCode("010") == (false, false, true, false, false) &&
      bByCode("011") == (false, false, true, true, false),
      "'01x' must be the backward rows")
    assert(bByCode("0010") == (false, true, false, false, false) &&
      bByCode("0011") == (false, true, false, true, false),
      "'001x' must be the forward rows")
    assert(bByCode("00011") == (false, false, false, false, true),
      "'00011' must be B intra")
  }

  test("P-picture: full/half-pel MC, residual, intra refresh, skip — all within bounds") {
    import Mpeg1._
    // frame 0: flat macroblocks (amp 0) → DC-exact decode, so frame 1's
    // expectation is computable by an INDEPENDENT reference MC inline here
    val w = 48; val h = 48; val q = 2
    def base0(row: Int, col: Int) = 60 + row * 40 + col * 13
    val plan1: (Int, Int) => MbPlan = {
      case (0, 0) => PredMb(0, 0, 0)
      case (0, 1) => SkipMb
      case (0, 2) => PredMb(0, 0, 0)
      case (1, 0) => PredMb(2, 0, 0)   // full-pel right by 1
      case (1, 1) => PredMb(1, 0, 0)   // HALF-pel right
      case (1, 2) => PredMb(0, 0, 5)   // zero-MV + luma residual +5
      case (2, 0) => IntraMb(77, 0)    // intra refresh inside P
      case (2, 1) => PredMb(0, -2, 0)  // full-pel up by 1
      case (2, 2) => PredMb(0, 0, -7)  // negative residual
      case _      => PredMb(0, 0, 0)
    }
    val bytes = encodeStream(w, h, q, Seq(
      IFrame((r, c) => (base0(r, c), 0), (128, 128)), PFrame(plan1)))
    val (meta, pics) = decodeIFrames(bytes).get
    assert(meta == SeqMeta(w, h, 2) && pics.size == 2)
    // reference frame 0 (exact for flat blocks)
    val f0 = Array.tabulate(h, w)((y, x) => base0(y / 16, x / 16))
    // independent reference prediction for frame 1
    def mc(y: Int, x: Int, dyH: Int, dxH: Int): Int = {
      val (fy, fx) = (dyH >> 1, dxH >> 1)
      val (hy, hx) = (dyH & 1, dxH & 1)
      val p00 = f0(y + fy)(x + fx)
      if (hy == 0 && hx == 0) p00
      else if (hy == 0) (p00 + f0(y + fy)(x + fx + 1) + 1) >> 1
      else if (hx == 0) (p00 + f0(y + fy + 1)(x + fx) + 1) >> 1
      else (p00 + f0(y + fy)(x + fx + 1) + f0(y + fy + 1)(x + fx) +
        f0(y + fy + 1)(x + fx + 1) + 2) >> 2
    }
    val want = Array.tabulate(h, w) { (y, x) =>
      plan1(y / 16, x / 16) match {
        case SkipMb => f0(y)(x)
        case IntraMb(b, _) => b
        case PredMb(dx, dy, d) =>
          val delta = if (d == 0) 0 else residualPixel(residualLevel(d, q), q)
          math.max(0, math.min(255, mc(y, x, dy, dx) + delta))
        case other => fail(s"unexpected plan $other in a P-picture test")
      }
    }
    var maxDev = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDev = math.max(maxDev, math.abs(pics(1).y(y * w + x) - want(y)(x)))
    assert(maxDev <= 2, s"P reconstruction deviates by $maxDev")
    // chroma: constant 128 everywhere (copied, skipped or intra-refreshed)
    assert(pics(1).cb.forall(v => math.abs(v - 128) <= 2) &&
      pics(1).cr.forall(v => math.abs(v - 128) <= 2), "chroma drifted")
  }

  test("P-chain: the reference frame advances (frame 2 predicts from frame 1)") {
    import Mpeg1._
    val w = 32; val h = 32; val q = 2
    def base0(row: Int, col: Int) = 50 + row * 60 + col * 25
    // every frame shifts content right by one full pel via MV (+2, 0) on
    // column 1 and keeps column 0 — after TWO P frames, the column-1 block
    // has sampled through frame 1, not frame 0 (distinguishable because
    // frame 1's (1,1) block already mixes in a residual)
    val plan: (Int, Int) => MbPlan = {
      case (r, 0) => PredMb(0, 0, 0)
      case (1, 1) => PredMb(-2, 0, 10)
      case _      => PredMb(-2, 0, 0)
    }
    val bytes = encodeStream(w, h, q, Seq(
      IFrame((r, c) => (base0(r, c), 0), (128, 128)), PFrame(plan), PFrame(plan)))
    val (_, pics) = decodeIFrames(bytes).get
    assert(pics.size == 3)
    val delta = residualPixel(residualLevel(10, q), q)
    // pixel (y=24, x=24): frame1 = f0(24, 23) + delta; frame2 samples
    // frame1 at x=23 (same block, residual applied again)
    val f0v = base0(1, 23 / 16) // x=23 → column block 1
    val want1 = math.min(255, f0v + delta)
    val got1 = pics(1).y(24 * w + 24)
    assert(math.abs(got1 - want1) <= 2, s"frame1: $got1 vs $want1")
    val want2 = math.min(255, want1 + delta) // frame2 = frame1 shifted + delta again
    val got2 = pics(2).y(24 * w + 24)
    assert(math.abs(got2 - want2) <= 2,
      s"frame2 did not predict from frame1: $got2 vs $want2")
  }

  test("B-picture: fwd/bwd/interpolated MC, B-skip vector repeat, intra, reorder") {
    import Mpeg1._
    // display order I0 B1 P2; anchors flat (DC-exact), so every B path is
    // computable EXACTLY by an independent simulator: forward from I0,
    // backward from P2, interpolated (a+b+1)>>1, residuals, intra refresh,
    // and the B-skip rule (repeat the PREVIOUS macroblock's direction and
    // vectors — at (1,2) that is (1,1)'s fwd (+2,0), which differs from a
    // zero-vector copy by the inter-block boundary shift)
    val w = 64; val h = 48; val q = 2
    def base0(row: Int, col: Int) = 40 + row * 30 + col * 17
    val planP: (Int, Int) => MbPlan = {
      case (1, 1) => IntraMb(200, 0)
      case (1, 2) => PredMb(2, 0, 5)
      case _      => PredMb(0, 0, 0)
    }
    val planB: (Int, Int) => MbPlan = {
      case (0, 0) => BPredMb(Some((0, 0)), None, 0)
      case (0, 1) => BPredMb(None, Some((0, 0)), 0)
      case (0, 2) => BPredMb(Some((0, 0)), Some((0, 0)), 0)
      case (0, 3) => BPredMb(Some((0, 0)), None, 7)
      case (1, 0) => IntraMb(100, 0)
      case (1, 1) => BPredMb(Some((2, 0)), None, 0)
      case (1, 2) => SkipMb
      case (1, 3) => BPredMb(None, Some((0, 0)), -4)
      case (2, 1) => BPredMb(Some((-1, -1)), Some((-1, 0)), 0)
      case (2, 2) => BPredMb(Some((0, 0)), Some((0, 0)), 6)
      case _      => BPredMb(Some((0, 0)), None, 0)
    }
    val bytes = encodeStream(w, h, q, Seq(
      IFrame((r, c) => (base0(r, c), 0), (128, 128)),
      BFrame(planB), PFrame(planP)))
    val (meta, pics) = decodeIFrames(bytes).get
    assert(meta == SeqMeta(w, h, 3) && pics.size == 3)
    val expI = Array.tabulate(h, w)((y, x) => base0(y / 16, x / 16))
    def mcOf(ref: Array[Array[Int]])(y: Int, x: Int, dyH: Int, dxH: Int): Int = {
      val (fy, fx) = (dyH >> 1, dxH >> 1)
      val (hy, hx) = (dyH & 1, dxH & 1)
      val p00 = ref(y + fy)(x + fx)
      if (hy == 0 && hx == 0) p00
      else if (hy == 0) (p00 + ref(y + fy)(x + fx + 1) + 1) >> 1
      else if (hx == 0) (p00 + ref(y + fy + 1)(x + fx) + 1) >> 1
      else (p00 + ref(y + fy)(x + fx + 1) + ref(y + fy + 1)(x + fx) +
        ref(y + fy + 1)(x + fx + 1) + 2) >> 2
    }
    def residual(d: Int): Int =
      if (d == 0) 0 else residualPixel(residualLevel(d, q), q)
    val expP = Array.tabulate(h, w) { (y, x) =>
      planP(y / 16, x / 16) match {
        case IntraMb(b, _) => b
        case PredMb(dx, dy, d) =>
          math.max(0, math.min(255, mcOf(expI)(y, x, dy, dx) + residual(d)))
        case other => fail(s"unexpected P plan $other")
      }
    }
    val expB = Array.tabulate(h, w) { (y, x) =>
      val plan = planB(y / 16, x / 16) match {
        case SkipMb => // repeat previous macroblock's direction + vectors
          planB(y / 16, x / 16 - 1) match {
            case BPredMb(f, b, _) => BPredMb(f, b, 0)
            case other => fail(s"B-skip after non-predicted $other")
          }
        case p => p
      }
      plan match {
        case IntraMb(b, _) => b
        case BPredMb(f, b, d) =>
          val pf = f.map { case (dx, dy) => mcOf(expI)(y, x, dy, dx) }
          val pb = b.map { case (dx, dy) => mcOf(expP)(y, x, dy, dx) }
          val pred = (pf, pb) match {
            case (Some(a), Some(c)) => (a + c + 1) >> 1
            case (Some(a), None) => a
            case (None, Some(c)) => c
            case _ => fail("directionless B plan")
          }
          math.max(0, math.min(255, pred + residual(d)))
        case other => fail(s"unexpected B plan $other")
      }
    }
    for ((exp, idx) <- Seq(expI, expB, expP).zipWithIndex) {
      var maxDev = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDev = math.max(maxDev, math.abs(pics(idx).y(y * w + x) - exp(y)(x)))
      assert(maxDev == 0, s"display frame $idx deviates by $maxDev")
    }
    assert(pics(1).cb.forall(_ == 128) && pics(1).cr.forall(_ == 128),
      "B chroma drifted")
  }

  test("multi-B run decodes through the transmission reorder in display order") {
    import Mpeg1._
    // display I0 B1 B2 P3 → transmission I0 P3 B1 B2; each picture gets a
    // distinct residual so a mis-ordered or mis-referenced decode is visible
    val w = 32; val h = 32; val q = 2
    def base0(row: Int, col: Int) = 60 + row * 50 + col * 20
    val bytes = encodeStream(w, h, q, Seq(
      IFrame((r, c) => (base0(r, c), 0), (128, 128)),
      BFrame((_, _) => BPredMb(Some((0, 0)), None, 3)),  // fwd: from I0
      BFrame((_, _) => BPredMb(None, Some((0, 0)), 6)),  // bwd: from P3
      PFrame((_, _) => PredMb(0, 0, 10))))
    val (meta, pics) = decodeIFrames(bytes).get
    assert(meta == SeqMeta(w, h, 4) && pics.size == 4)
    def r(d: Int) = residualPixel(residualLevel(d, q), q)
    val i0 = base0(0, 0)
    val want = Seq(i0, i0 + r(3), i0 + r(10) + r(6), i0 + r(10))
    val got = pics.map(_.y(5 * w + 5))
    assert(got == want, s"display-order pixel chain $got != $want")
  }

  test("malformed streams are rejected, not misdecoded") {
    // not MPEG at all
    assert(Mpeg1.decodeIFrames("plainly not a video".getBytes).isEmpty)
    // truncated mid-slice: must throw/None, never return a picture
    val ok = encode(32, 16, 1, 7L)
    val cut = java.util.Arrays.copyOf(ok, ok.length / 2)
    val r = try Mpeg1.decodeIFrames(cut) catch { case _: Exception => None }
    assert(r.isEmpty, "truncated stream produced pictures")
    // missing sequence end code
    val noEnd = java.util.Arrays.copyOf(ok, ok.length - 4)
    val r2 = try Mpeg1.decodeIFrames(noEnd) catch { case _: Exception => None }
    assert(r2.isEmpty, "stream without sequence_end_code accepted")
  }

  test("HeaderCodec routes MPEG-1 streams to the real decoder") {
    val bytes = encode(32, 32, 2, 99L)
    val codec = new graft.operators.Multimodal.HeaderCodec
    val d = codec.decode("video", "video/mpeg", bytes)
    assert((d.width, d.height, d.nFrames) == (32, 32, 2),
      s"HeaderCodec fell through to the stub: $d")
  }
}
