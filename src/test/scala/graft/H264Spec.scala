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
}
