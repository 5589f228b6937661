package graft

import graft.operators.H264
import org.scalatest.funsuite.AnyFunSuite

/** H.264 baseline I_16x16 intra codec pair — table integrity, CAVLC
  * round-trips, transform identities, full-stream bit-exact
  * reconstruction, rejection alphabet.
  */
class H264Spec extends AnyFunSuite {

  private def assertPrefixFree(codes: Iterable[String], what: String): Unit = {
    val cs = codes.toSeq
    assert(cs.distinct.size == cs.size, s"$what: duplicate codes")
    for (a <- cs; b <- cs if a != b)
      assert(!b.startsWith(a), s"$what: '$a' is a prefix of '$b'")
  }

  test("every transcribed VLC table is prefix-free") {
    assertPrefixFree(H264.CoeffTokenNc0.values, "coeff_token nC<2")
    assertPrefixFree(H264.CoeffTokenNc2.values, "coeff_token 2<=nC<4")
    assertPrefixFree(H264.CoeffTokenChromaDc.values, "coeff_token chroma DC")
    H264.TotalZeros4x4.foreach { case (tc, row) =>
      assertPrefixFree(row, s"total_zeros TC=$tc")
    }
    H264.TotalZerosChromaDc.foreach { case (tc, row) =>
      assertPrefixFree(row, s"chroma total_zeros TC=$tc")
    }
    H264.RunBefore.foreach { case (zl, row) =>
      assertPrefixFree(row, s"run_before zl=$zl")
    }
  }

  test("canonically-cited codewords match the transcription") {
    // the sample codewords every CAVLC tutorial walks through
    assert(H264.CoeffTokenNc0((0, 0)) == "1")
    assert(H264.CoeffTokenNc0((1, 1)) == "01")
    assert(H264.CoeffTokenNc0((2, 2)) == "001")
    assert(H264.CoeffTokenNc0((3, 3)) == "00011")
    assert(H264.CoeffTokenNc0((0, 1)) == "000101")
    assert(H264.CoeffTokenChromaDc((1, 1)) == "1")
    assert(H264.TotalZeros4x4(1)(0) == "1" && H264.TotalZeros4x4(1)(3) == "0011")
    assert(H264.RunBefore(2) == IndexedSeq("1", "01", "00"))
    // zigzag: the canonical 4x4 order
    assert(H264.Zigzag4x4.take(6).toSeq ==
      Seq((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)))
    // LevelScale row 0 is the (10, 16, 13) triple
    assert(H264.levelScale(0, 0, 0) == 10 && H264.levelScale(0, 1, 1) == 16 &&
      H264.levelScale(0, 0, 1) == 13)
  }

  test("CAVLC residual round-trips over every (pattern, nC) in scope") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 2000) {
      val nC = Seq(-1, 0, 1, 2, 3)(trial % 5)
      val maxCoeffs = if (nC == -1) 4 else if (trial % 2 == 0) 15 else 16
      val n = rng.nextInt(4) // 0..3
      val coeffs = new Array[Int](maxCoeffs)
      val positions = rng.shuffle((0 until maxCoeffs).toList).take(n).sorted
      positions.foreach { p =>
        // magnitudes up to 25 exercise suffix-length adaptation and the
        // prefix-14 4-bit suffix form
        var v = 1 + rng.nextInt(25)
        if (rng.nextBoolean()) v = -v
        coeffs(p) = v
      }
      val w = new H264.BitWriter
      H264.writeResidual(w, coeffs, nC)
      w.rbspTrailing()
      val r = new H264.BitReader(w.result())
      val (got, tc) = H264.readResidual(r, maxCoeffs, nC)
      assert(got.toSeq == coeffs.toSeq, s"trial $trial nC=$nC: ${coeffs.toSeq} -> ${got.toSeq}")
      assert(tc == n)
    }
  }

  test("inverse transform identities: zero block, flat DC") {
    val zero = H264.inverse4x4(new Array[Int](15), 24, acOnly = true, dcOverride = 0)
    assert(zero.forall(_ == 0))
    // DC-only: residual is flat at (dc + 32) >> 6
    val flat = H264.inverse4x4(new Array[Int](15), 24, acOnly = true, dcOverride = 640)
    assert(flat.forall(_ == (640 + 32) >> 6))
    // luma DC of a single level at scan 0 spreads uniformly after Hadamard
    val dc = new Array[Int](16); dc(0) = 2
    val scaled = H264.lumaDc(dc, 20) // qp 20: qp/6=3, LevelScale(2,0,0)=13
    val expect = (2 * 13 + (1 << 2)) >> 3
    assert(scaled.flatten.forall(_ == expect))
    // chroma DC distributes the 2x2 Hadamard
    val cdc = H264.chromaDc(Array(3, 0, 0, 0), 20)
    assert(cdc.distinct.size == 1 && cdc(0) == ((3 * 13) << 3) >> 5)
  }

  test("emulation prevention round-trips and protects start codes") {
    val payloads = Seq(
      Array[Byte](0, 0, 0, 0, 1, 2, 3),
      Array[Byte](0, 0, 1),
      Array[Byte](0, 0, 2, 0, 0, 3, 0, 0, 0),
      Array.fill[Byte](64)(0),
      (0 until 200).map(_.toByte).toArray)
    payloads.foreach { p =>
      val e = H264.emulationPrevent(p)
      // no 00 00 00 / 00 00 01 / 00 00 02 survives in the EBSP (00 00 03
      // is the emulation byte itself and is legal, §7.4.1.1)
      (0 until e.length - 2).foreach { i =>
        assert(!(e(i) == 0 && e(i + 1) == 0 && (e(i + 2) & 0xff) <= 2),
          s"unprotected sequence at $i in ${e.toSeq}")
      }
      assert(H264.emulationStrip(e).toSeq == p.toSeq)
    }
  }

  test("encode -> decode is BIT-EXACT on planes, checksums and mode sums") {
    for (id <- Seq(1L, 5L, 12L, 23L, 40L)) {
      val (wMb, hMb) = H264.ConstructH.dims(id, id * 3 + 1)
      val nf = H264.ConstructH.nFrames(id)
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264.encode(id, wMb, hMb, nf, qp)
      val st = H264.decode(bytes).getOrElse(fail(s"id=$id: decode None"))
      assert(st.widthMb == wMb && st.heightMb == hMb && st.qp == qp)
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.toSeq == exp.y.toSeq, s"id=$id f=$f luma differs")
        assert(got.cb.toSeq == exp.cb.toSeq, s"id=$id f=$f Cb differs")
        assert(got.cr.toSeq == exp.cr.toSeq, s"id=$id f=$f Cr differs")
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f checksum")
        assert(got.modeSum == exp.modeSum && got.chromaModeSum == exp.chromaModeSum)
      }
    }
  }

  test("the construction stays inside the transcribed-table bounds") {
    // every block the construction can emit has TotalCoeff <= 3 (so nC
    // <= 3 and total_zeros rows 1..3 suffice) and magnitudes <= 3
    for (id <- 0L until 30L; f <- 0 until 2; mb <- 0 until 6;
        (tag, n) <- Seq((0, 16), (5, 15), (17, 4), (21, 15))) {
      val l = H264.ConstructH.blockLevels(id, f, mb, tag, n)
      assert(l.count(_ != 0) <= 3)
      assert(l.forall(v => math.abs(v) <= 3))
    }
  }

  test("I_4x4 mixed slices: encode -> decode BIT-EXACT; mode machinery exercised") {
    for (id <- Seq(2L, 6L, 11L, 24L, 39L)) {
      val (wMb, hMb) = H264.ConstructH.dims(id, id * 3 + 1)
      val nf = H264.ConstructH.nFrames(id)
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264.encode(id, wMb, hMb, nf, qp, mixed = true)
      val st = H264.decode(bytes).getOrElse(fail(s"id=$id: decode None"))
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.toSeq == exp.y.toSeq, s"id=$id f=$f luma differs")
        assert(got.cb.toSeq == exp.cb.toSeq && got.cr.toSeq == exp.cr.toSeq)
        assert(got.levelChecksum == exp.levelChecksum)
        assert(got.i4ModeSum == exp.i4ModeSum && got.nI4Mbs == exp.nI4Mbs)
        // mixed means BOTH MB classes appear whenever there are >= 2 MBs
        if (wMb * hMb >= 2) assert(got.nI4Mbs > 0 && got.nI4Mbs < wMb * hMb)
      }
    }
    // across the id sweep, every 4x4 prediction mode 0..8 is exercised
    val modes = (for {
      id <- 0L until 24L; mb <- 0 until 6; blk <- 0 until 16
    } yield H264.ConstructH.i4Mode(id, mb, blk, hasLeft = true, hasTop = true)).toSet
    assert(modes == (0 to 8).toSet, s"modes hit: $modes")
  }

  test("I_4x4 neighbor rules: top-right availability and mode prediction") {
    // the canonical unavailable set inside an MB: blkIdx 3, 7, 11, 13, 15
    val unavailInner = (0 until 16).filterNot { b =>
      val (x4, y4) = H264.blkPos(b)
      H264.topRightAvail(mbX = 1, mbY = 1, x4, y4, wMb = 4)
    }
    assert(unavailInner == Seq(3, 7, 11, 13, 15), s"got $unavailInner")
    // blk (3,0) depends on the above-RIGHT MB: last MB column → unavailable
    assert(!H264.topRightAvail(mbX = 3, mbY = 1, x4 = 3, y4 = 0, wMb = 4))
    assert(H264.topRightAvail(mbX = 2, mbY = 1, x4 = 3, y4 = 0, wMb = 4))
    // top MB row: nothing above
    assert(!H264.topRightAvail(mbX = 1, mbY = 0, x4 = 1, y4 = 0, wMb = 4))
    // blkIdx <-> position round-trips
    (0 until 16).foreach { b =>
      val (x, y) = H264.blkPos(b)
      assert(H264.blkIdxOf(x, y) == b)
    }
    // allowed-mode sets by availability
    assert(H264.i4Allowed(hasLeft = true, hasTop = true) == (0 to 8))
    assert(H264.i4Allowed(hasLeft = false, hasTop = true) == Seq(0, 2, 3, 7))
    assert(H264.i4Allowed(hasLeft = true, hasTop = false) == Seq(1, 2, 8))
    assert(H264.i4Allowed(hasLeft = false, hasTop = false) == Seq(2))
  }

  test("I_4x4 prediction formulas: DC fallbacks and flat-neighbor identity") {
    // flat neighbors: every mode must predict the flat value
    val t = Array.fill(8)(100); val l = Array.fill(4)(100)
    for (m <- 0 to 8) {
      val p = H264.predict4(m, t, l, 100, hasLeft = true, hasTop = true)
      assert(p.forall(_ == 100), s"mode $m not flat: ${p.toSeq}")
    }
    // DC availability fallbacks
    assert(H264.predict4(2, t, l, 0, hasLeft = false, hasTop = false)
      .forall(_ == 128))
    assert(H264.predict4(2, Array.fill(8)(60), l, 0, hasLeft = false,
      hasTop = true).forall(_ == 60))
  }

  test("rejection: truncation, corruption, non-baseline, CABAC, qp bound") {
    val (ok, _) = H264.encode(7L, 2, 1, 1, 22)
    assert(H264.decode(ok).isDefined)
    assert(H264.decode(ok.take(ok.length / 2)).isEmpty, "truncated accepted")
    assert(H264.decode(Array.emptyByteArray).isEmpty)
    assert(H264.decode("not a NAL stream".getBytes).isEmpty)
    // flip profile_idc (first RBSP byte after the SPS NAL header at 0..4)
    val badProfile = ok.clone(); badProfile(5) = 77 // main profile
    assert(H264.decode(badProfile).isEmpty, "non-baseline accepted")
    // corrupt a slice byte: either parse failure (None) or a decode that
    // differs from the clean one — never a silent identical pass
    val corrupt = ok.clone()
    corrupt(ok.length - 3) = (corrupt(ok.length - 3) ^ 0x40).toByte
    H264.decode(corrupt) match {
      case None => ()
      case Some(st) =>
        val clean = H264.decode(ok).get
        assert(st.frames.last.levelChecksum != clean.frames.last.levelChecksum ||
          st.frames.last.y.toSeq != clean.frames.last.y.toSeq,
          "corrupted stream decoded identically")
    }
  }

  // ------------------------------------------------------------------
  // r15 CAVLC widening (q312): 4<=nC<8 context, derived nC>=8 FLC,
  // total_zeros rows 4-7, full-16 blocks, I_PCM
  // ------------------------------------------------------------------

  test("widened tables: Nc4 prefix-free; total_zeros rows 4-7 prefix-free " +
      "AND Kraft-complete; FLC coeff_token is a derived bijection") {
    assertPrefixFree(H264.CoeffTokenNc4.values, "coeff_token 4<=nC<8")
    for (tc <- 4 to 7) {
      val row = H264.TotalZeros4x4(tc)
      assert(row.size == 16 - tc + 1, s"row $tc arity")
      assertPrefixFree(row, s"total_zeros TC=$tc")
      // completeness: a full prefix code sums 2^-len to exactly 1 —
      // catches most transcription slips structurally
      assert(row.map(c => math.pow(2.0, -c.length)).sum == 1.0, s"row $tc Kraft")
    }
    // FLC: every legal (t1 <= min(3, tc)) pair has a distinct 6-bit code
    val codes = for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)
                     if !(tc == 0 && t1 > 0))
      yield H264.coeffTokenFlc(t1, tc)
    assert(codes.distinct.size == codes.size)
    assert(codes.forall(c => c >= 0 && c < 64))
    codes.zip(for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)
                   if !(tc == 0 && t1 > 0)) yield (t1, tc)).foreach {
      case (c, (t1, tc)) =>
        assert(H264.coeffTokenFlcDecode(c) == (t1, tc), s"FLC roundtrip ($t1,$tc)")
    }
  }

  test("CAVLC round-trips in the widened contexts: TC up to 16, large " +
      "levels through suffix escalation, total_zeros rows 4-7") {
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 3000) {
      val nC = Seq(4, 5, 6, 7, 8, 12, 16)(trial % 7)
      val tc =
        if (nC >= 8) Seq(0, 4, 5, 6, 7, 16)(trial % 6)
        else rng.nextInt(4) // table context subset: TC <= 3
      val coeffs = new Array[Int](16)
      if (tc == 16) {
        for (i <- 0 until 16)
          coeffs(i) = (rng.nextInt(25) + 1) * (if (rng.nextBoolean()) 1 else -1)
      } else if (tc > 0) {
        val tz = rng.nextInt(16 - tc + 1)
        // contiguous low positions + one displaced top coefficient:
        // exercises the transcribed total_zeros rows and run_before
        for (k <- 0 until tc - 1)
          coeffs(k) = (rng.nextInt(19) + 1) * (if (rng.nextBoolean()) 1 else -1)
        coeffs(tc - 1 + tz) = (rng.nextInt(19) + 1) * (if (rng.nextBoolean()) 1 else -1)
      }
      val w = new H264.BitWriter
      H264.writeResidual(w, coeffs, nC)
      w.rbspTrailing()
      val r = new H264.BitReader(w.result())
      val (got, gotTc) = H264.readResidual(r, 16, nC)
      assert(gotTc == tc && got.sameElements(coeffs),
        s"trial $trial nC=$nC tc=$tc: ${coeffs.toSeq} -> ${got.toSeq}")
    }
  }

  test("I_PCM + dense slices (q312): encode -> decode BIT-EXACT; the " +
      "construction hits every new context class") {
    var sawPcm = false; var sawTc16 = false; var sawTc47 = false
    var sawMidNc = false
    for (id <- 0L until 16L) {
      val wMb = (2 + id % 2).toInt; val hMb = (1 + id % 2).toInt
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264.encode(id, wMb, hMb, 1, qp,
        mixed = true, pcmMode = true)
      val st = H264.decode(bytes).getOrElse(fail(s"id=$id decode None"))
      st.frames.zip(expect).foreach { case (got, exp) =>
        assert(got.y.sameElements(exp.y), s"id=$id luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr))
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id levels")
        assert(got.nPcm == exp.nPcm && got.pcmChecksum == exp.pcmChecksum)
        assert(got.i4ModeSum == exp.i4ModeSum && got.nI4Mbs == exp.nI4Mbs)
        sawPcm ||= got.nPcm > 0
      }
      for (mbY <- 0 until hMb if (id + mbY) % 2 == 0; b <- Seq(0, 2, 8, 10)) {
        val mbIdx = mbY * wMb + 1
        val tc = H264.ConstructH.denseTc(id, mbIdx, b)
        if (tc == 16) sawTc16 = true
        if (tc >= 4 && tc <= 7) sawTc47 = true
      }
      // mid-nC arises when a block's neighbors are dense TC 4..7
      sawMidNc ||= (0 until hMb).exists(mbY => (id + mbY) % 2 == 0)
    }
    assert(sawPcm && sawTc16 && sawTc47 && sawMidNc)
  }

  test("I_PCM rejection: nonzero alignment bits fail the decode") {
    val (ok, _) = H264.encode(2L, 2, 2, 1, 24, mixed = true, pcmMode = true)
    assert(H264.decode(ok).isDefined)
    assert(H264.decode(ok.take(ok.length / 2)).isEmpty)
  }

  // ------------------------------------------------------------------
  // P-slice INTER path (q309)
  // ------------------------------------------------------------------

  test("inter CBP subset: distinct, in range, covers no-residual / " +
      "chroma-only / partial-luma classes") {
    val s = H264.CbpInterSubset
    assert(s.distinct.size == s.size && s.forall(c => c >= 0 && c <= 47))
    assert(s.head == 0, "codeNum 0 must be CBP 0 for inter (P_Skip-adjacent)")
    assert(s.contains(16) && s.contains(32), "chroma-only classes")
    assert(Seq(1, 2, 4, 8).forall(s.contains), "single-8x8 luma classes")
  }

  test("quarter-pel luma interpolation: constant plane is a fixed point " +
      "at every phase; 6-tap weights visible on an impulse") {
    val w = 12; val h = 10
    val const = Array.fill(w * h)(97)
    for (xF <- 0 until 4; yF <- 0 until 4; xI <- -2 to w + 1; yI <- -2 to h + 1)
      assert(H264.lumaSample(const, w, h, xI, yI, xF, yF) == 97,
        s"constant plane drifted at ($xI,$yI) phase ($xF,$yF)")
    // impulse at (5,5): half-pel b at (4..5, 5) sees tap weights 20/20
    val imp = Array.fill(w * h)(0)
    imp(5 * w + 5) = 64
    // b between (4,5)-(5,5): (1*0 -5*0 +20*0 +20*64 -5*0 +1*0 +16)>>5 = 40
    assert(H264.lumaSample(imp, w, h, 4, 5, 2, 0) == 40)
    // one further left: taps (x-2..x+3) hit the impulse on the -5 tap
    assert(H264.lumaSample(imp, w, h, 3, 5, 2, 0) == 0) // clipped -5*64+16>>5 < 0
    // full-pel identity
    assert(H264.lumaSample(imp, w, h, 5, 5, 0, 0) == 64)
    // chroma bilinear: exact weights (8-xF)(8-yF)/64 etc.
    val cimp = Array.fill(w * h)(0)
    cimp(3 * w + 3) = 64
    assert(H264.chromaSample(cimp, w, h, 3, 3, 2, 4) == (6 * 4 * 64 + 32) / 64)
    assert(H264.chromaSample(cimp, w, h, 2, 3, 6, 0) == (6 * 8 * 64 + 32) / 64)
  }

  test("independent interpolation replay: explicit half-pel upsampled " +
      "plane reproduces every lumaSample phase") {
    // Different formulation: materialize the 2x half-pel grid
    // up(2x,2y)=full-pel, up(2x+1,2y)=b, up(2x,2y+1)=h, up(2x+1,2y+1)=j
    // then derive each quarter-pel by Table 8-12's averaging pairs
    // ADDRESSED ON THAT GRID — cross-checks filter arithmetic AND the
    // phase layout of lumaSample's a..r switch.
    val w = 9; val h = 8
    val rng = new scala.util.Random(42)
    val ref = Array.fill(w * h)(rng.nextInt(256))
    def fp(x: Int, y: Int): Int =
      ref(math.max(0, math.min(h - 1, y)) * w + math.max(0, math.min(w - 1, x)))
    def clip255(v: Int): Int = math.max(0, math.min(255, v))
    def f6(v: Int => Int): Int = v(-2) - 5 * v(-1) + 20 * v(0) + 20 * v(1) - 5 * v(2) + v(3)
    def bRaw(x: Int, y: Int): Int = f6(d => fp(x + d, y))
    def hRaw(x: Int, y: Int): Int = f6(d => fp(x, y + d))
    // half-pel grid value at upsampled coords (even=full, odd=half);
    // Scala / truncates toward zero, so shift negatives via the even
    // numerator forms (ux-1 is even when ux is odd)
    def up(ux: Int, uy: Int): Int = ((ux & 1, uy & 1): @unchecked) match {
      case (0, 0) => fp(ux / 2, uy / 2)
      case (1, 0) => clip255((bRaw((ux - 1) / 2, uy / 2) + 16) >> 5)
      case (0, 1) => clip255((hRaw(ux / 2, (uy - 1) / 2) + 16) >> 5)
      case (1, 1) =>
        val x0 = (ux - 1) / 2; val y0 = (uy - 1) / 2
        clip255((f6(d => bRaw(x0, y0 + d)) + 512) >> 10)
    }
    for (xI <- -4 until w + 4; yI <- -4 until h + 4;
         xF <- 0 until 4; yF <- 0 until 4) {
      val got = H264.lumaSample(ref, w, h, xI, yI, xF, yF)
      val expected =
        if (xF % 2 == 1 && yF % 2 == 1) {
          // e/g/p/r: average of the DIAGONALLY nearest b/s and h/m
          // half-pels (spec pairing, not a 2D bilinear)
          val bFlavor = up(2 * xI + 1, 2 * yI + (yF / 2) * 2) // b (yF=1) or s (yF=3)
          val hFlavor = up(2 * xI + (xF / 2) * 2, 2 * yI + 1) // h (xF=1) or m (xF=3)
          (bFlavor + hFlavor + 1) >> 1
        } else {
          // even/even lands ON the grid; odd-in-one-axis averages the
          // two nearest grid points along that axis
          val lox = 2 * xI + xF / 2; val hix = 2 * xI + (xF + 1) / 2
          val loy = 2 * yI + yF / 2; val hiy = 2 * yI + (yF + 1) / 2
          if (lox == hix && loy == hiy) up(lox, loy)
          else (up(lox, loy) + up(hix, hiy) + 1) >> 1
        }
      assert(got == expected,
        s"replay mismatch at ($xI,$yI) phase ($xF,$yF): got $got expected $expected")
      assert(got >= 0 && got <= 255)
    }
  }

  test("MV prediction: median, single-refIdx shortcut, A-only fallback, " +
      "directional 16x8/8x16 rules") {
    val g = new H264.MotionGrid(12, 8)
    // no neighbors at all -> (0,0) via median of three unavailable
    assert(H264.mvPred(g, 0, 0, 4, 0, H264.PartKind.Full) == (0, 0))
    // A-only: left decoded, no top row anywhere
    g.fill(0, 0, 4, 4, 12, -4, 0)
    assert(H264.mvPred(g, 4, 0, 4, 0, H264.PartKind.Full) == (12, -4))
    // fill a top row with distinct MVs to get a true median
    g.fill(4, 0, 4, 4, 8, 20, 0) // will be A of the MB below-right
    g.fill(8, 0, 4, 4, -6, 2, 0) // B
    g.fill(4, 4, 4, 4, 0, 0, 0) // spacer left of target (A)
    // target MB at cells (8,4): A=(0,0) B=(-6,2) C=cells(12,3)=undecoded ->
    // D=cells(7,3)=(8,20): median x of (0,-6,8)=0, y of (0,2,20)=2
    assert(H264.mvPred(g, 8, 4, 4, 0, H264.PartKind.Full) == (0, 2))
    // single matching refIdx: same geometry but refIdx 1 only on B
    val g2 = new H264.MotionGrid(12, 8)
    g2.fill(0, 0, 4, 4, 3, 3, 0)
    g2.fill(4, 0, 4, 4, 7, -2, 1)
    g2.fill(0, 4, 4, 4, 5, 5, 0)
    // target MB at cells (4,4): A=cell(3,4)=(5,5) ref0, B=cell(4,3)=
    // (7,-2) ref1, C=cell(8,3) undecoded -> D=cell(3,3)=(3,3) ref0.
    // predicting refIdx=1: only B matches -> (7,-2)
    assert(H264.mvPred(g2, 4, 4, 4, 1, H264.PartKind.Full) == (7, -2))
    // directional: 16x8 top takes B when refIdx matches
    assert(H264.mvPred(g2, 4, 4, 4, 1, H264.PartKind.Top16x8) == (7, -2))
    // 16x8 bottom takes A (ref 0 matches) -> cell(3,4)'s (5,5)
    assert(H264.mvPred(g2, 4, 4, 4, 0, H264.PartKind.Bottom16x8) == (5, 5))
    // 8x16 left takes A on match; right takes C (here D-substituted)
    assert(H264.mvPred(g2, 4, 4, 2, 0, H264.PartKind.Left8x16) == (5, 5))
    // 8x16 right: C = cell(gx0+2, gy0-1) = cell(6,3), decoded ref1 ->
    // directional match for refIdx 1
    assert(H264.mvPred(g2, 4, 4, 2, 1, H264.PartKind.Right8x16) == (7, -2))
  }

  test("P_Skip motion: zero conditions and median fallthrough") {
    val g = new H264.MotionGrid(8, 8)
    // first MB: A and B missing -> zero MV
    assert(H264.skipMv(g, 0, 0) == (0, 0))
    g.fill(0, 0, 4, 4, 4, 4, 0)
    // B missing -> zero
    assert(H264.skipMv(g, 4, 0) == (0, 0))
    g.fill(4, 0, 4, 4, 8, 8, 0)
    g.fill(0, 4, 4, 4, 6, 2, 0)
    // MB at cells (4,4): A=cell(3,4)=(6,2), B=cell(4,3)=(8,8): both
    // available, neither zero-ref0 -> median pred with C=cell(8,3) out
    // of the 8-wide grid -> D=cell(3,3)=(4,4):
    // med(6,8,4)=6, med(2,8,4)=4
    assert(H264.skipMv(g, 4, 4) == (6, 4))
    // zero-motion ref-0 neighbor forces zero
    val g3 = new H264.MotionGrid(8, 4)
    g3.fill(0, 0, 4, 4, 0, 0, 0)
    g3.fill(4, 0, 4, 4, 9, 9, 0)
    val g4 = new H264.MotionGrid(8, 8)
    g4.fill(0, 0, 8, 4, 5, 5, 0) // top row nonzero
    g4.fill(0, 4, 4, 4, 0, 0, 0) // left neighbor zero-ref0
    assert(H264.skipMv(g4, 4, 4) == (0, 0))
  }

  test("IDR+P streams: encode -> decode BIT-EXACT planes and gate sums " +
      "across ids (all mb types, both refs, skip runs, edge MVs)") {
    var sawSkip = false; var sawAllTypes = Set.empty[Int]
    var sawRef1 = false
    for (id <- 0L until 24L) {
      val wMb = (1 + id % 3).toInt; val hMb = (1 + (id / 3) % 2).toInt
      val nf = H264.ConstructP.nFrames(id)
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264.encodeInter(id, wMb, hMb, nf, qp)
      val st = H264.decode(bytes).getOrElse(fail(s"id=$id: decode None"))
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f levels")
        assert(got.mvdChecksum == exp.mvdChecksum, s"id=$id f=$f mvd")
        assert(got.refSum == exp.refSum && got.nSkip == exp.nSkip &&
          got.typeSum == exp.typeSum, s"id=$id f=$f sums")
        if (f > 0) {
          sawSkip ||= got.nSkip > 0
          if (got.refSum > 0) sawRef1 = true
        }
      }
      for (f <- 1 until nf; mb <- 0 until wMb * hMb
           if !H264.ConstructP.isSkip(id, f, mb))
        sawAllTypes += H264.ConstructP.ptype(id, f, mb)
    }
    assert(sawSkip, "construction never skipped")
    assert(sawAllTypes == Set(0, 1, 2, 3), s"mb types seen: $sawAllTypes")
    assert(sawRef1, "second reference never used")
  }

  // ------------------------------------------------------------------
  // B-slice path (q313)
  // ------------------------------------------------------------------

  test("spatial direct (§8.4.1.2.2): zero-prediction at the slice " +
      "start, A-only refs, per-cell colZeroFlag zeroing") {
    val g0 = new H264.MotionGrid(8, 8)
    val g1 = new H264.MotionGrid(8, 8)
    // no neighbors at all -> directZeroPredictionFlag: bipred, zero MVs
    val dm0 = H264.directMotion(g0, g1, 0, 0, None)
    assert(dm0.use0 && dm0.use1)
    assert(dm0.mv0.forall(_ == ((0, 0))) && dm0.mv1.forall(_ == ((0, 0))))
    // left neighbor inter in L0 only -> L0 used (A-only MVP), L1 unused
    g0.fill(3, 0, 1, 4, 8, 4, 0)
    val dmA = H264.directMotion(g0, g1, 4, 0, None)
    assert(dmA.use0 && !dmA.use1)
    assert(dmA.mv0.forall(_ == ((8, 4))))
    // colZeroFlag: a colocated cell with refIdx 0 and |mv| <= 1 zeroes
    // exactly that cell; large colocated motion leaves the MVP in place
    val col = new H264.MotionGrid(8, 8)
    col.fill(0, 0, 8, 8, 40, 0, 0) // large motion everywhere...
    col.fill(4, 0, 1, 1, 1, -1, 0) // ...except the MB's cell (0,0)
    val dmC = H264.directMotion(g0, g1, 4, 0, Some(col))
    assert(dmC.mv0(0) == ((0, 0)), "colZero cell must zero")
    assert(dmC.mv0(1) == ((8, 4)), "non-colZero cells keep the MVP")
    // |mv| <= 1 is quarter-pel and componentwise: (2, 0) is NOT colZero
    col.fill(4, 0, 1, 1, 2, 0, 0)
    assert(H264.directMotion(g0, g1, 4, 0, Some(col)).mv0(0) == ((8, 4)))
    // nonzero colocated refIdx is NOT colZero even with zero motion
    col.fill(4, 0, 1, 1, 0, 0, 1)
    assert(H264.directMotion(g0, g1, 4, 0, Some(col)).mv0(0) == ((8, 4)))
  }

  test("I+P+B streams: encode -> decode BIT-EXACT; POC ordering, both " +
      "lists, biprediction all exercised") {
    var sawL0 = false; var sawL1 = false; var sawBi = false
    var sawSkipB = false; var sawDirect = false
    for (id <- 0L until 16L) {
      val wMb = (1 + id % 3).toInt; val hMb = (1 + (id / 3) % 2).toInt
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264.encodeBi(id, wMb, hMb, qp)
      val st = H264.decode(bytes).getOrElse(fail(s"id=$id decode None"))
      assert(st.frames.size == 4)
      // decode order I P B B; POCs 0 6 2 4 (display: I B B P)
      assert(st.frames.map(_.poc) == Vector(0L, 6L, 2L, 4L), s"id=$id pocs")
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.levelChecksum == exp.levelChecksum)
        assert(got.mvdChecksum == exp.mvdChecksum, s"id=$id f=$f mvd")
        assert(got.typeSum == exp.typeSum)
        assert(got.nSkip == exp.nSkip, s"id=$id f=$f nSkip")
        assert(got.nDirect == exp.nDirect, s"id=$id f=$f nDirect")
      }
      for (f <- 2 until 4; mb <- 0 until wMb * hMb) {
        if (H264.ConstructB.isSkipB(id, f, mb)) sawSkipB = true
        else if (H264.ConstructB.isDirectB(id, f, mb)) sawDirect = true
        else H264.ConstructB.btype(id, f, mb) match {
          case 1 => sawL0 = true
          case 2 => sawL1 = true
          case 3 => sawBi = true
        }
      }
    }
    assert(sawL0 && sawL1 && sawBi, "construction missed a B type")
    assert(sawSkipB, "construction never emitted B_Skip")
    assert(sawDirect, "construction never emitted B_Direct_16x16")
  }

  test("B rejection: truncation and B-without-future-ref fall through") {
    val (ok, _) = H264.encodeBi(3L, 2, 2, 24)
    assert(H264.decode(ok).isDefined)
    assert(H264.decode(ok.take(ok.length - 3)).isEmpty)
    // strip the P NAL (second type-1 NAL... simplest: cut after the IDR
    // then append only the B NALs -> B has no future ref -> None. Find
    // type-1 NAL starts:
    val starts = (0 until ok.length - 4).filter(i =>
      ok(i) == 0 && ok(i + 1) == 0 && ok(i + 2) == 1 &&
        (ok(i + 3) & 0x1f) == 1)
    assert(starts.size == 3) // P + 2 B
    val noP = ok.take(starts(0)) ++ ok.drop(starts(1)) // drop the P NAL
    assert(H264.decode(noP).isEmpty, "B without a future reference accepted")
  }

  test("P-stream rejection: truncation, unknown sub_mb_type, CBP outside " +
      "the transcribed subset") {
    val (ok, _) = H264.encodeInter(5L, 2, 2, 3, 24)
    assert(H264.decode(ok).isDefined)
    // truncate INSIDE the last P slice's payload (a cut at a NAL
    // boundary would be a legitimately valid shorter stream)
    assert(H264.decode(ok.take(ok.length - 3)).isEmpty)
    // a P stream whose SPS never arrived
    val firstSlice = {
      var idx = -1
      for (i <- (ok.length - 5) to 5 by -1
           if idx < 0 && ok(i) == 0 && ok(i + 1) == 0 && ok(i + 2) == 1 &&
             (ok(i + 3) & 0x1f) == 1) idx = i
      idx
    }
    assert(firstSlice > 0)
    assert(H264.decode(ok.drop(firstSlice)).isEmpty, "P slice without SPS/DPB accepted")
  }
}
