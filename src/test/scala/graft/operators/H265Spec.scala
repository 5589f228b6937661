package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the H.265 intra codec (q315): the transcribed transform
  * family, scan orders, MPM/chroma-mode derivations, residual-coder
  * round-trips (including the inferred-DC-significance corner the
  * deterministic construction cannot reach), full-stream bit-exact
  * reconstruction with construction-coverage assertions, and the
  * fall-through contract.
  */
class H265Spec extends AnyFunSuite {

  test("DCT family: DC row 64, published first column, embedded " +
      "subsets, row symmetry; DST matrix rows as specified") {
    // first column of the 32-point matrix (the published value list)
    val col0 = Array(64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78,
      75, 73, 70, 67, 64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22,
      18, 13, 9, 4)
    for (k <- 0 until 32)
      assert(H265.dctM(32, k, 0) == col0(k), s"32-pt row $k col 0")
    // 4-point matrix exactly as published
    val m4 = Array(
      Array(64, 64, 64, 64), Array(83, 36, -36, -83),
      Array(64, -64, -64, 64), Array(36, -83, 83, -36))
    for (k <- 0 until 4; n <- 0 until 4)
      assert(H265.dctM(4, k, n) == m4(k)(n), s"4-pt [$k][$n]")
    // the N-point matrix is rows 0, 32/N, 64/N ... of the 32-point one
    for (n0 <- Seq(4, 8, 16); k <- 0 until n0; n <- 0 until n0)
      assert(H265.dctM(n0, k, n) == H265.dctM(32, k * (32 / n0), n))
    // DCT-II symmetry: even rows symmetric, odd rows antisymmetric
    for (k <- 0 until 32; n <- 0 until 16) {
      val sign = if (k % 2 == 0) 1 else -1
      assert(H265.dctM(32, k, n) == sign * H265.dctM(32, k, 31 - n))
    }
    assert(H265.DstM.map(_.head).toSeq == Seq(29, 74, 84, 55))
    assert(H265.DstM(1).toSeq == Seq(74, 74, 0, -74))
  }

  test("scan orders: permutations; 4x4 up-right diagonal matches the " +
      "spec sequence; vertical/horizontal are transposes") {
    for (n <- Seq(4, 8, 16, 32); si <- 0 to 2) {
      val o = H265.scanOrder(n, si)
      assert(o.sorted.toSeq == (0 until n * n), s"n=$n scan $si")
    }
    val diag = H265.scanOrder(4, 0)
    val expect = Seq(
      (0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0), (0, 3), (1, 2),
      (2, 1), (3, 0), (1, 3), (2, 2), (3, 1), (2, 3), (3, 2), (3, 3))
      .map { case (x, y) => y * 4 + x }
    assert(diag.toSeq == expect)
    val hor = H265.scanOrder(4, 1)
    val ver = H265.scanOrder(4, 2)
    for (i <- 0 until 16) {
      val (x, y) = (hor(i) % 4, hor(i) / 4)
      assert(ver.indexOf(x * 4 + y) == i) // transpose relation
    }
  }

  test("mode-dependent scan selection: 6..14 vertical, 22..30 " +
      "horizontal, else diagonal, only at 4x4 (and 8x8 luma)") {
    assert(H265.scanIdxFor(2, luma = true, 10) == 2)
    assert(H265.scanIdxFor(2, luma = false, 26) == 1)
    assert(H265.scanIdxFor(3, luma = true, 6) == 2)
    assert(H265.scanIdxFor(3, luma = false, 6) == 0) // chroma 8x8: diagonal
    assert(H265.scanIdxFor(4, luma = true, 10) == 0) // 16x16: diagonal
    assert(H265.scanIdxFor(2, luma = true, 0) == 0)
    assert(H265.scanIdxFor(2, luma = true, 1) == 0)
    assert(H265.scanIdxFor(2, luma = true, 18) == 0)
  }

  test("MPM list (§8.4.2): equal non-angular -> {planar, DC, 26}; " +
      "equal angular -> +/-1 neighbors; distinct -> first absent of " +
      "{planar, DC, 26}") {
    assert(H265.mpmList(1, 1).toSeq == Seq(0, 1, 26))
    assert(H265.mpmList(0, 0).toSeq == Seq(0, 1, 26))
    assert(H265.mpmList(-1, -1).toSeq == Seq(0, 1, 26)) // unavailable -> DC
    assert(H265.mpmList(2, 2).toSeq == Seq(2, 33, 3)) // wrap low end
    assert(H265.mpmList(34, 34).toSeq == Seq(34, 33, 3)) // wrap high end
    assert(H265.mpmList(10, 26).toSeq == Seq(10, 26, 0))
    assert(H265.mpmList(0, 10).toSeq == Seq(0, 10, 1))
    assert(H265.mpmList(0, 1).toSeq == Seq(0, 1, 26))
    assert(H265.mpmList(1, 26).toSeq == Seq(1, 26, 0))
  }

  test("chroma candidates (§8.4.3): duplicate of luma becomes 34; " +
      "icpm 4 is the derived mode") {
    assert(H265.chromaMode(0, 0) == 34) // planar duplicated
    assert(H265.chromaMode(0, 10) == 0)
    assert(H265.chromaMode(1, 26) == 34) // vertical duplicated
    assert(H265.chromaMode(2, 10) == 34) // horizontal duplicated
    assert(H265.chromaMode(3, 1) == 34) // DC duplicated
    assert(H265.chromaMode(3, 17) == 1)
    assert(H265.chromaMode(4, 17) == 17)
  }

  test("residual coder round-trips crafted blocks: inferred DC " +
      "significance in a middle CG, an empty-but-walked DC group, " +
      "Rice escapes, every size and scan") {
    def roundTrip(nTbS: Int, luma: Boolean, scanIdx: Int,
        levels: Array[Int]): Unit = {
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w, H265.CtxCount)
      val lastE = H265.encodeResidual(e, levels, nTbS, luma, scanIdx)
      e.terminate(1)
      w.alignByte()
      val bytes = w.result()
      val d = new H264Cabac.Decoder(bytes, 0, H265.CtxCount)
      val (got, lastD) = H265.decodeResidual(d, nTbS, luma, scanIdx)
      assert(d.terminate() == 1)
      assert(lastE == lastD, s"last mismatch n=$nTbS scan=$scanIdx")
      assert(got.toSeq == levels.toSeq, s"levels n=$nTbS scan=$scanIdx")
    }
    // inferred DC significance: CG1's ONLY coefficient is its DC
    // (scan 16), with the last significant beyond it in CG2 — CG1's
    // csbf is explicit, all 15 higher sig flags decode zero, and the
    // DC must come back without a coded flag
    val order8 = H265.scanOrder(8, 0)
    val inferred = new Array[Int](64)
    inferred(order8(16)) = 2
    inferred(order8(35)) = 1
    roundTrip(8, luma = true, 0, inferred)
    // CG0 with NO coefficients still walks its significance map
    val emptyDc = new Array[Int](64)
    emptyDc(order8(17)) = 3
    emptyDc(order8(20)) = -1
    roundTrip(8, luma = true, 0, emptyDc)
    // a wide level escaping gt1/gt2 into the Rice/EG suffix, plus a
    // 9th+ significant coefficient (no gt1 flag -> baseLevel 1)
    val wide = new Array[Int](16)
    for (k <- 0 until 12) wide(k) = if (k == 0) 120 else (k % 3) + 1
    roundTrip(4, luma = true, 0, wide)
    roundTrip(4, luma = false, 2, wide)
    // every size/scan/component combination with a deterministic comb
    for (n <- Seq(4, 8, 16, 32); si <- 0 to 2; luma <- Seq(true, false)) {
      val order = H265.scanOrder(n, si)
      val lv = new Array[Int](n * n)
      var k = 0
      while (k * 3 < math.min(n * n, 40)) {
        lv(order(k * 3)) = (if (k % 2 == 0) 1 else -1) * (1 + k % 7)
        k += 1
      }
      roundTrip(n, luma, si, lv)
    }
  }

  test("intra streams: encode -> decode BIT-EXACT planes + gate sums; " +
      "construction covers NxN/DST, all CU sizes, all scans, a Rice " +
      "escape and a multi-CG TU") {
    var sawNxN = false
    var sawCu32 = false
    var sawWide = false
    var sawMultiCg = false
    val scansSeen = scala.collection.mutable.Set[Int]()
    for (id <- 0L until 24L) {
      val wCtb = (2 + id % 2).toInt
      val hCtb = (1 + (id / 2) % 2).toInt
      val nf = (1 + id % 2).toInt
      val qp = H265.ConstructV.qp(id)
      val (bytes, expect) = H265.encode(id, wCtb, hCtb, nf, qp)
      val st = H265.decode(bytes).getOrElse(fail(s"id=$id -> None"))
      assert(st.width == wCtb * 32 && st.height == hCtb * 32)
      assert(st.qp == qp)
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.nCus == exp.nCus && got.nNxN == exp.nNxN)
        assert(got.splitSum == exp.splitSum)
        assert(got.modeSum == exp.modeSum)
        assert(got.chromaModeSum == exp.chromaModeSum)
        assert(got.cbfSum == exp.cbfSum)
        assert(got.lastChecksum == exp.lastChecksum, s"id=$id f=$f last")
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f levels")
        if (got.nNxN > 0) sawNxN = true
      }
      // construction coverage, re-derived from the formulas
      for (f <- 0 until nf; c <- 0 until wCtb * hCtb) {
        if (!H265.ConstructV.split32(id, f, c)) {
          sawCu32 = true
          val cuX = (c % wCtb) * 32; val cuY = (c / wCtb) * 32
          val key = H265.ConstructV.cuKey(cuX, cuY)
          val mode = H265.ConstructV.lumaMode(id, f, cuX, cuY, 5, 0)
          scansSeen += H265.scanIdxFor(5, luma = true, mode)
          val tag = H265.ConstructV.tuTag(key, 0)
          if (H265.ConstructV.cbf(id, key, 0)) {
            if ((id + tag) % 7 == 0) sawWide = true
            val step = H265.ConstructV.step(id, tag)
            if (step * (H265.ConstructV.nSig(id, tag, 1023) - 1) > 15)
              sawMultiCg = true
          }
        }
      }
      // 4x4/8x8 blocks contribute the mode-dependent scans
      for (f <- 0 until nf; c <- 0 until wCtb * hCtb; q <- 0 until 4;
          s <- 0 until 4
          if H265.ConstructV.split32(id, f, c) &&
            H265.ConstructV.split16(id, f, c, q)) {
        val cuX = (c % wCtb) * 32 + (q % 2) * 16 + (s % 2) * 8
        val cuY = (c / wCtb) * 32 + (q / 2) * 16 + (s / 2) * 8
        val mode = H265.ConstructV.lumaMode(id, f, cuX, cuY, 3, 0)
        scansSeen += H265.scanIdxFor(3, luma = true, mode)
      }
    }
    assert(sawNxN, "construction never produced PART_NxN (no DST hit)")
    assert(sawCu32, "construction never kept a whole 32x32 CU")
    assert(sawWide, "construction never escaped into the Rice suffix")
    assert(sawMultiCg, "no TU ever spanned multiple coefficient groups")
    assert(scansSeen == Set(0, 1, 2), s"scans seen: $scansSeen")
  }

  test("inter filters: every row sums to 64, half-pel rows are " +
      "symmetric, quarter-pel rows mirror each other") {
    for (f <- H265Inter.LumaFilters) assert(f.sum == 64)
    for (f <- H265Inter.ChromaFilters) assert(f.sum == 64)
    assert(H265Inter.LumaFilters(2).toSeq ==
      H265Inter.LumaFilters(2).reverse.toSeq)
    assert(H265Inter.ChromaFilters(4).toSeq ==
      H265Inter.ChromaFilters(4).reverse.toSeq)
    assert(H265Inter.LumaFilters(1).reverse.toSeq ==
      H265Inter.LumaFilters(3).toSeq)
    for (p <- 1 to 7)
      assert(H265Inter.ChromaFilters(p).reverse.toSeq ==
        H265Inter.ChromaFilters(8 - p).toSeq)
    // integer-position MC is the identity; fractional stays in range
    val ref = Array.tabulate(64 * 32)(i => (i * 37) % 256)
    val out = new Array[Int](64 * 32)
    H265Inter.mc(ref, 64, 32, out, 64, 8, 8, 16, 16, 8, -16, luma = true)
    for (r <- 0 until 16; c <- 0 until 16)
      assert(out((8 + r) * 64 + 8 + c) == ref((4 + r) * 64 + 10 + c))
    H265Inter.mc(ref, 64, 32, out, 64, 8, 8, 16, 16, 5, 7, luma = true)
    for (r <- 0 until 16; c <- 0 until 16) {
      val v = out((8 + r) * 64 + 8 + c)
      assert(v >= 0 && v <= 255)
    }
  }

  test("merge/AMVP candidate lists: availability, pruning order, " +
      "zero fill; skip cells count as inter") {
    val mf = new H265Inter.MotionField(64, 32)
    // nothing decoded: all zero-fill
    assert(H265Inter.mergeCandidates(mf, 16, 16, 16) ==
      IndexedSeq((0, 0), (0, 0), (0, 0)))
    assert(H265Inter.amvpCandidates(mf, 16, 16, 16) ==
      IndexedSeq((0, 0), (0, 0)))
    // left CU inter (A1), above CU with a DIFFERENT mv (B1)
    mf.fill(0, 16, 16, 4, -8, 1)
    mf.fill(16, 0, 16, 12, 20, 2) // skip kind still counts as inter
    val m = H265Inter.mergeCandidates(mf, 16, 16, 16)
    assert(m(0) == (4, -8) && m(1) == (12, 20) && m(2) == (0, 0))
    // identical motion above -> pruned, only one real candidate
    val mf2 = new H265Inter.MotionField(64, 32)
    mf2.fill(0, 16, 16, 4, -8, 1)
    mf2.fill(16, 0, 16, 4, -8, 1)
    val m2 = H265Inter.mergeCandidates(mf2, 16, 16, 16)
    assert(m2(0) == (4, -8) && m2(1) == (0, 0))
    val a2 = H265Inter.amvpCandidates(mf2, 16, 16, 16)
    assert(a2 == IndexedSeq((4, -8), (0, 0)))
    // intra neighbors are unavailable
    val mf3 = new H265Inter.MotionField(64, 32)
    mf3.fill(0, 16, 16, 9, 9, 0) // intra kind
    assert(H265Inter.mergeCandidates(mf3, 16, 16, 16).head == (0, 0))
  }

  test("inter streams (q319): encode -> decode BIT-EXACT planes + " +
      "gate sums; skip/merge/AMVP/intra-in-P all hit, a fractional " +
      "phase in every direction, the cbf_luma inference fires") {
    var sawSkip = false; var sawMerge = false; var sawAmvp = false
    var sawIntraInP = false; var sawInference = false
    val phases = scala.collection.mutable.Set[(Int, Int)]()
    for (id <- 0L until 16L) {
      val wCtb = (2 + id % 2).toInt
      val hCtb = (1 + (id / 2) % 2).toInt
      val nf = (2 + id % 2).toInt
      val qp = H265.ConstructV.qp(id)
      val (bytes, expect) = H265Inter.encode(id, wCtb, hCtb, nf, qp)
      val st = H265Inter.decode(bytes).getOrElse(fail(s"id=$id -> None"))
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.nSkipCu == exp.nSkipCu && got.nMergeCu == exp.nMergeCu)
        assert(got.nAmvpCu == exp.nAmvpCu && got.nIntraCu == exp.nIntraCu)
        assert(got.mergeIdxSum == exp.mergeIdxSum)
        assert(got.mvdChecksum == exp.mvdChecksum, s"id=$id f=$f mvd")
        assert(got.rootCbfSum == exp.rootCbfSum)
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f levels")
        assert(got.cbfSum == exp.cbfSum && got.lastChecksum == exp.lastChecksum)
        assert(got.modeSum == exp.modeSum) // intra-in-P modes
        if (f > 0) {
          if (got.nSkipCu > 0) sawSkip = true
          if (got.nMergeCu > 0) sawMerge = true
          if (got.nAmvpCu > 0) sawAmvp = true
          if (got.nIntraCu > 0) sawIntraInP = true
        }
      }
      // construction coverage: mvd phases and the inference corner
      for (f <- 1 until nf; key <- 0 until 128) {
        if (H265Inter.ConstructVI.cuClass(id, f, key) >= 3) {
          phases += ((H265Inter.ConstructVI.mvdX(id, f, key) & 3,
            H265Inter.ConstructVI.mvdY(id, f, key) & 3))
          if (H265Inter.ConstructVI.rootCbf(id, f, key) &&
            !H265Inter.ConstructVI.cbfCb(id, key) &&
            !H265Inter.ConstructVI.cbfCr(id, key))
            sawInference = true
        }
      }
    }
    assert(sawSkip && sawMerge && sawAmvp && sawIntraInP,
      "a CU class never occurred")
    assert(phases.size == 16, s"mvd phases seen: ${phases.size}/16")
    assert(sawInference, "the cbf_luma inference corner never fired")
  }

  test("B slices (q320): bit-exact I/P/B round-trip; every CU class " +
      "occurs including BI; bi-prediction averages unrounded 14-bit " +
      "intermediates (differs from rounding each list separately)") {
    var sawBi = false; var sawL0 = false; var sawL1 = false
    var sawSkip = false; var sawMerge = false; var sawIntra = false
    for (id <- 0L until 16L) {
      val wCtb = (2 + id % 2).toInt
      val hCtb = (1 + (id / 2) % 2).toInt
      val qp = H265.ConstructV.qp(id)
      val (bytes, expect) = H265Inter.encodeGop(id, wCtb, hCtb, qp)
      val st = H265Inter.decodeGop(bytes).getOrElse(fail(s"id=$id -> None"))
      assert(st.frames.size == 3)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr))
        assert(got.mvdChecksum == exp.mvdChecksum)
        assert(got.predIdcSum == exp.predIdcSum)
        assert(got.mergeIdxSum == exp.mergeIdxSum)
        assert(got.levelChecksum == exp.levelChecksum)
      }
      // the plain decode must REJECT the B NAL (fall-through contract)
      assert(H265Inter.decode(bytes).isEmpty,
        "P-only decoder accepted a B picture")
      for (key <- 0 until 128) {
        H265Inter.ConstructVI.cuClassB(id, 2, key) match {
          case 0 => sawSkip = true
          case 1 => sawMerge = true
          case 2 => sawIntra = true
          case 3 => sawL0 = true
          case 4 => sawL1 = true
          case 5 => sawBi = true
        }
      }
    }
    assert(sawSkip && sawMerge && sawIntra && sawL0 && sawL1 && sawBi,
      "a B CU class never occurred")
    // the normative bi average: (a14 + b14 + 64) >> 7 on the raw
    // intermediates, not an average of the two rounded predictions
    val ref = Array.tabulate(64 * 32)(i => (i * 131) % 256)
    val a = H265Inter.mcRaw(ref, 64, 32, 8, 8, 8, 8, 1, 2, luma = true)
    val b = H265Inter.mcRaw(ref, 64, 32, 8, 8, 8, 8, 3, 1, luma = true)
    val out = new Array[Int](64 * 32)
    H265Inter.mcBi(ref, ref, 64, 32, out, 64, 8, 8, 8, 8, (1, 2), (3, 1),
      luma = true)
    var diffFromRounded = false
    for (r <- 0 until 8; c <- 0 until 8) {
      val bi = out((8 + r) * 64 + 8 + c)
      assert(bi == math.max(0, math.min(255,
        (a(r * 8 + c) + b(r * 8 + c) + 64) >> 7)))
      val roundedAvg = (((a(r * 8 + c) + 32) >> 6) +
        ((b(r * 8 + c) + 32) >> 6) + 1) >> 1
      if (bi != roundedAvg) diffFromRounded = true
    }
    assert(diffFromRounded,
      "bi average never differed from rounding each list first")
  }

  test("rejection: truncation, cross-standard decode, H.264 CABAC " +
      "stream, corrupted payload all fall through") {
    val (bytes, _) = H265.encode(5L, 2, 2, 1, 24)
    assert(H265.decode(bytes).isDefined)
    assert(H265.decode(bytes.take(bytes.length - 6)).isEmpty)
    // cross-standard: H.264 NAL types land outside the HEVC envelope
    val (avc, _) = H264Cabac.encode(5L, 2, 2, 1, 24)
    assert(H265.decode(avc).isEmpty, "HEVC decoder accepted H.264")
    assert(H264Cabac.decode(bytes).isEmpty, "H.264 decoder accepted HEVC")
    assert(H264.decode(bytes).isEmpty, "CAVLC decoder accepted HEVC")
    val mid = bytes.length - 8
    val corrupted = bytes.clone()
    corrupted(mid) = (corrupted(mid) ^ 0x40).toByte
    val d = H265.decode(corrupted)
    val orig = H265.decode(bytes).get
    assert(d.isEmpty ||
      d.get.frames.map(_.levelChecksum) != orig.frames.map(_.levelChecksum) ||
      !d.get.frames.head.y.sameElements(orig.frames.head.y),
      "bit flip in the payload went unnoticed")
  }
}
