package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the CABAC P-slice codec (q316): bit-exact round-trips
  * with construction-coverage assertions (skip, every partition
  * shape, the full CBP sweep, UEG3 escapes), the mvd UEG3
  * binarization's structure, and the fall-through contract against
  * the CAVLC and intra-only decoders.
  */
class H264CabacInterSpec extends AnyFunSuite {

  test("CABAC P streams: encode -> decode BIT-EXACT planes + gate " +
      "sums; construction hits skip, all four P types, CBP endpoints " +
      "and a UEG3 mvd escape") {
    var sawSkip = false
    val typesSeen = scala.collection.mutable.Set[Int]()
    var sawZeroCbp = false
    var sawHighCbp = false
    var sawEscape = false
    var sawTwoRefs = false
    for (id <- 0L until 16L) {
      val (wMb, hMb) = H264.ConstructH.dims(id, id + 1)
      val nf = H264.ConstructP.nFrames(id)
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264CabacInter.encodeInter(id, wMb, hMb, nf, qp)
      val st = H264CabacInter.decode(bytes).getOrElse(fail(s"id=$id -> None"))
      assert(st.frames.size == nf)
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f levels")
        assert(got.mvdChecksum == exp.mvdChecksum, s"id=$id f=$f mvd")
        assert(got.refSum == exp.refSum)
        assert(got.nSkip == exp.nSkip)
        assert(got.typeSum == exp.typeSum)
        assert(got.cbpSum == exp.cbpSum, s"id=$id f=$f cbp")
        assert(got.modeSum == exp.modeSum) // intra frame 0 carries these
        assert(got.binChecksum == exp.binChecksum)
      }
      for (f <- 1 until nf; mb <- 0 until wMb * hMb) {
        if (H264.ConstructP.isSkip(id, f, mb)) sawSkip = true
        else {
          typesSeen += H264.ConstructP.ptype(id, f, mb)
          val cbp = H264CabacInter.ConstructPC.cbp48(id, f, mb)
          if (cbp == 0) sawZeroCbp = true
          if (cbp >= 40) sawHighCbp = true
          for (p <- 0 until 4) {
            if (math.abs(H264CabacInter.ConstructPC.mvdX(id, f, mb, p)) >= 9 ||
              math.abs(H264CabacInter.ConstructPC.mvdY(id, f, mb, p)) >= 9)
              sawEscape = true
          }
          if (f >= 2) sawTwoRefs = true
        }
      }
    }
    assert(sawSkip, "construction never skipped an MB")
    assert(typesSeen == Set(0, 1, 2, 3), s"P types seen: $typesSeen")
    assert(sawZeroCbp && sawHighCbp,
      "CBP sweep missed an endpoint (CAVLC's me(v) head bound is gone)")
    assert(sawEscape, "no |mvd| >= 9: the UEG3 EG3 suffix never fired")
    assert(sawTwoRefs, "no frame ever used two references")
  }

  test("CABAC B streams (q317): bit-exact planes + POC reorder + gate " +
      "sums; skip runs, direct MBs, all three explicit types and both " +
      "lists' mvd contexts exercised") {
    var sawSkip = false
    var sawDirect = false
    val btSeen = scala.collection.mutable.Set[Int]()
    for (id <- 0L until 16L) {
      val (wMb, hMb) = H264.ConstructH.dims(id, id + 1)
      val qp = H264.ConstructH.qp(id)
      val (bytes, expect) = H264CabacInter.encodeBi(id, wMb, hMb, qp)
      val st = H264CabacInter.decode(bytes).getOrElse(fail(s"id=$id -> None"))
      assert(st.frames.size == 4)
      // decode order I P B B; POCs 0 6 2 4 -> display order I B B P
      assert(st.frames.map(_.poc) == Vector(0L, 6L, 2L, 4L))
      st.frames.zip(expect).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr),
          s"id=$id f=$f chroma drift")
        assert(got.levelChecksum == exp.levelChecksum, s"id=$id f=$f levels")
        assert(got.mvdChecksum == exp.mvdChecksum, s"id=$id f=$f mvd")
        assert(got.typeSum == exp.typeSum)
        assert(got.cbpSum == exp.cbpSum)
        assert(got.nSkip == exp.nSkip)
        assert(got.nDirect == exp.nDirect)
      }
      for (f <- 2 until 4; mb <- 0 until wMb * hMb) {
        if (H264.ConstructB.isSkipB(id, f, mb)) sawSkip = true
        else if (H264.ConstructB.isDirectB(id, f, mb)) sawDirect = true
        else btSeen += H264.ConstructB.btype(id, f, mb)
      }
    }
    assert(sawSkip && sawDirect, "construction missed B_Skip or B_Direct")
    assert(btSeen == Set(1, 2, 3), s"B types seen: $btSeen")
  }

  test("TEMPORAL direct (q318): bit-exact round-trip; the flag " +
      "actually switches derivations (planes differ from the spatial " +
      "stream on some direct MB); scaled MVs match the closed form") {
    var sawDifference = false
    for (id <- 0L until 12L) {
      val (wMb, hMb) = H264.ConstructH.dims(id, id + 1)
      val qp = H264.ConstructH.qp(id)
      val (bt, expT) = H264CabacInter.encodeBi(id, wMb, hMb, qp,
        spatial = false)
      val st = H264CabacInter.decode(bt).getOrElse(fail(s"id=$id -> None"))
      st.frames.zip(expT).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.y.sameElements(exp.y), s"id=$id f=$f luma drift")
        assert(got.cb.sameElements(exp.cb) && got.cr.sameElements(exp.cr))
        assert(got.levelChecksum == exp.levelChecksum)
        assert(got.nDirect == exp.nDirect && got.nSkip == exp.nSkip)
      }
      val (bs, expS) = H264CabacInter.encodeBi(id, wMb, hMb, qp)
      // same transmitted residual/mvd syntax, different derivation: any
      // direct MB whose spatial and temporal motion disagree shows up
      // as a B-frame plane difference
      if (expT.drop(2).zip(expS.drop(2)).exists { case (t, sp) =>
        !t.y.sameElements(sp.y) }) sawDifference = true
      assert(bt.length != 0 && bs.length != 0)
    }
    assert(sawDifference,
      "temporal and spatial direct never produced different planes")
    // the §8.4.1.2.3 closed form at the plan's POCs (0, 6, cur 2):
    // td=6, tx=2731, DSF for tb=2 is 85 -> mvCol 32 scales to 10,
    // mvL1 = 10 - 32 = -22
    val g = new H264.MotionGrid(4, 4)
    g.fill(0, 0, 4, 4, 32, -32, 0)
    val dm = H264CabacInter.directMotionTemporal(Some(g), 0, 0, 2, 0, 6)
    assert(dm.use0 && dm.use1)
    assert(dm.mv0(0) == ((32 * 85 + 128) >> 8, ((-32) * 85 + 128) >> 8))
    assert(dm.mv1(0) == (dm.mv0(0)._1 - 32, dm.mv0(0)._2 + 32))
  }

  test("rejection: truncation, CAVLC inter cross-decode, intra-only " +
      "decoder on a P stream, corrupted payload all fall through") {
    val (bytes, _) = H264CabacInter.encodeInter(5L, 2, 2, 3, 24)
    assert(H264CabacInter.decode(bytes).isDefined)
    assert(H264CabacInter.decode(bytes.take(bytes.length - 6)).isEmpty)
    // the CAVLC inter decoder must reject a CABAC PPS and vice versa
    assert(H264.decode(bytes).isEmpty, "CAVLC decoder accepted CABAC inter")
    val (cavlc, _) = H264.encodeInter(5L, 2, 2, 3, 24)
    assert(H264CabacInter.decode(cavlc).isEmpty,
      "CABAC inter decoder accepted CAVLC")
    // the intra-only CABAC decoder must reject the P NAL units
    assert(H264Cabac.decode(bytes).isEmpty,
      "intra-only CABAC decoder accepted P slices")
    val mid = bytes.length - 8
    val corrupted = bytes.clone()
    corrupted(mid) = (corrupted(mid) ^ 0x40).toByte
    val d = H264CabacInter.decode(corrupted)
    val orig = H264CabacInter.decode(bytes).get
    assert(d.isEmpty ||
      d.get.frames.map(_.levelChecksum) != orig.frames.map(_.levelChecksum) ||
      !d.get.frames.last.y.sameElements(orig.frames.last.y),
      "bit flip in the payload went unnoticed")
  }

  test("mvd UEG3 binarization: TU prefix saturates at 9 with an EG3 " +
      "suffix and bypass sign — round-trips every magnitude 0..40") {
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, H264CabacInter.CtxCountP)
    val vals = (-40 to 40).toArray
    // private encode/decode are exercised through a synthetic slice of
    // pure mvd codes: encode all, terminate, decode all back
    vals.foreach(v => H264CabacInter.testEncodeMvd(e, v))
    e.terminate(1)
    w.alignByte()
    val bytes = w.result()
    val d = new H264Cabac.Decoder(bytes, 0, H264CabacInter.CtxCountP)
    vals.foreach { v =>
      assert(H264CabacInter.testDecodeMvd(d) == v, s"mvd $v")
    }
    assert(d.terminate() == 1)
  }
}
