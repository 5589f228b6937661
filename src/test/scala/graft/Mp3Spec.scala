package graft

import graft.operators.{Mp2, Mp3}
import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III codec pair — transcribed-table structural pins,
  * bit-exact Huffman/side-info/scale-factor round-trips, part2_3_length
  * exactness, requantization math, filterbank structure, rejection
  * alphabet (scope bounds documented in Mp3.scala).
  */
class Mp3Spec extends AnyFunSuite {

  test("Huffman table 1 is prefix-free AND Kraft-complete; canonical codes") {
    val codes = Mp3.Table1.values.toSeq
    for (a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"'$a' prefixes '$b'")
    // completeness: sum 2^-len == 1 (catches most transcription slips)
    assert(codes.map(c => math.pow(2.0, -c.length)).sum == 1.0)
    assert(Mp3.Table1((0, 0)) == "1" && Mp3.Table1((1, 0)) == "01")
  }

  test("count1 table B is a bijective 4-bit FLC (complement coding)") {
    val all = for (v <- 0 to 1; w <- 0 to 1; x <- 0 to 1; y <- 0 to 1)
      yield Mp3.count1BCode(v, w, x, y)
    assert(all.toSet == (0 until 16).toSet)
    assert(Mp3.count1BCode(0, 0, 0, 0) == 15) // all-zero quadruple -> 1111
    assert(Mp3.count1BCode(1, 1, 1, 1) == 0)
  }

  test("slen table: ranges, canonical entries; scfsi groups partition 0..20") {
    assert(Mp3.SlenTable.size == 16)
    assert(Mp3.SlenTable.forall { case (a, b) => a >= 0 && a <= 4 && b >= 0 && b <= 3 })
    assert(Mp3.SlenTable(0) == (0, 0) && Mp3.SlenTable(4) == (3, 0) &&
      Mp3.SlenTable(15) == (4, 3))
    assert(Mp3.ScfsiGroups.flatMap(_.toSeq) == (0 until 21))
  }

  test("alias-reduction constants: cs^2 + ca^2 = 1 (derived from c_i)") {
    (0 until 8).foreach { i =>
      val s = Mp3.AliasCs(i) * Mp3.AliasCs(i) + Mp3.AliasCa(i) * Mp3.AliasCa(i)
      assert(math.abs(s - 1.0) < 1e-12)
      assert(Mp3.AliasCa(i) < 0 && Mp3.AliasCs(i) > 0) // c_i are negative
    }
    // magnitudes strictly decreasing (the butterflies weaken with distance)
    (1 until 8).foreach(i =>
      assert(math.abs(Mp3.AliasC(i)) < math.abs(Mp3.AliasC(i - 1))))
  }

  test("encode -> decode round-trips every side-info field, scale factor " +
      "and spectral value across ids; scfsi sharing, short blocks and " +
      "the bit reservoir all exercised") {
    var sawShared = false
    var sawOwn = false
    var sawShort = false
    var sawLong = false
    var sawReservoir = false
    for (id <- 0L until 24L) {
      val bytes = Mp3.encode(id)
      assert(bytes.length == Mp3.ConstructM.NFrames * Mp3.FrameBytes)
      val st = Mp3.decode(bytes).getOrElse(fail(s"id=$id decode None"))
      assert(st.sampleRate == 48000 && st.bitrateKbps == 128)
      for (fi <- st.frames.indices; gr <- 0 until 2) {
        val g = st.frames(fi)(gr)
        val short = Mp3.ConstructM.isShort(id, fi, gr)
        assert(g.blockType == (if (short) 2 else 0), s"id=$id f=$fi gr=$gr bt")
        assert(g.mainDataBegin == Mp3.ConstructM.mainDataBegin(id, fi),
          s"id=$id f=$fi mdb")
        if (g.mainDataBegin > 0) sawReservoir = true
        assert(g.part23 == Mp3.part23Length(id, fi, gr), s"id=$id f=$fi gr=$gr part23")
        assert(g.bigValues == Mp3.ConstructM.bigValues(id, fi, gr))
        assert(g.globalGain == Mp3.ConstructM.globalGain(id, fi, gr))
        assert(g.scalefacCompress == Mp3.ConstructM.scalefacCompress(id, fi, gr))
        assert(g.scalefacScale == Mp3.ConstructM.scalefacScale(id, gr))
        if (short) {
          sawShort = true
          assert(g.scalefacs.length == 36)
          for (b <- 0 until 12; w <- 0 until 3)
            assert(g.scalefacs(b * 3 + w) ==
              Mp3.ConstructM.scalefacShort(id, fi, gr, b, w),
              s"id=$id f=$fi gr=$gr b=$b w=$w")
          for (w <- 0 until 3)
            assert(g.sbg(w) == Mp3.ConstructM.subblockGain(id, fi, gr, w))
        } else {
          sawLong = true
          assert(g.scalefacs.length == 21 && g.sbg.forall(_ == 0))
          // effective scale factors: granule 1's shared groups copy
          // granule 0's values (granule 0's slen widths); sharing is
          // forced off in frames containing a short granule
          for ((grp, gi) <- Mp3.ScfsiGroups.zipWithIndex; b <- grp) {
            val shared = gr == 1 && Mp3.ConstructM.scfsiEff(id, fi, gi) == 1
            if (shared) sawShared = true else if (gr == 1) sawOwn = true
            val useGr = if (shared) 0 else gr
            assert(g.scalefacs(b) == Mp3.ConstructM.scalefac(id, fi, useGr, b),
              s"id=$id f=$fi gr=$gr b=$b shared=$shared")
          }
        }
        (0 until Mp3.MaxLine).foreach { i =>
          assert(g.is(i) == Mp3.ConstructM.isVal(id, fi, gr, i),
            s"id=$id f=$fi gr=$gr line=$i")
        }
        // requantization closed form on the pre-alias/pre-reorder lines
        val mult = if (g.scalefacScale == 0) 0.5 else 1.0
        (0 until Mp3.MaxLine).foreach { i =>
          val isv = g.is(i)
          val gain =
            if (short) {
              val b = i / 12; val w = (i % 12) / 4
              (g.globalGain - 210) / 4.0 - 2.0 * g.sbg(w) -
                mult * g.scalefacs(b * 3 + w)
            } else (g.globalGain - 210) / 4.0 - mult * g.scalefacs(i / 4)
          val expect =
            if (isv == 0) 0.0
            else math.signum(isv.toDouble) *
              math.pow(math.abs(isv.toDouble), 4.0 / 3.0) *
              math.pow(2.0, gain)
          assert(math.abs(g.xr(i) - expect) <= 1e-12 * (1 + math.abs(expect)))
        }
        assert(g.pcm.length == 576 && g.pcm.forall(v => !v.isNaN && !v.isInfinite))
      }
    }
    assert(sawShared, "scfsi never shared a group")
    assert(sawOwn, "granule 1 never transmitted its own scale factors")
    assert(sawShort && sawLong, "construction missed a window family")
    assert(sawReservoir, "construction never used the bit reservoir")
  }

  test("bit reservoir: frame 2's main data lives in earlier frames' " +
      "slots — corrupting those slot bytes changes a LATER frame") {
    // find an id where frame 2's back-pointer reaches into frame 1
    val id = (0L until 64L)
      .find(i => Mp3.ConstructM.mainDataBegin(i, 2) > 4)
      .getOrElse(fail("no id with a deep frame-2 back-pointer"))
    val ok = Mp3.encode(id)
    val clean = Mp3.decode(ok).get
    val mdb = Mp3.ConstructM.mainDataBegin(id, 2)
    // frame 2's first main-data byte sits mdb bytes before its own slot
    // region, i.e. inside frame 1's PHYSICAL frame at the end
    val pos = 2 * Mp3.FrameBytes - mdb + 21 - Mp3.FrameBytes + Mp3.SlotBytes
    // = byte (2*SlotBytes - mdb) of the slot stream -> physical offset:
    val slotIdx = 2 * Mp3.SlotBytes - mdb
    val frameOf = slotIdx / Mp3.SlotBytes
    val physical = frameOf * Mp3.FrameBytes + 21 + slotIdx % Mp3.SlotBytes
    assert(frameOf == 1, "back-pointer should land in frame 1's slots")
    val bad = ok.clone()
    bad(physical) = (bad(physical) ^ 0x08).toByte
    Mp3.decode(bad) match {
      case None => () // desynchronized -> rejected
      case Some(st) =>
        val changed = st.frames(2).zip(clean.frames(2)).exists {
          case (a, b) => !a.is.sameElements(b.is) ||
            a.scalefacs.toSeq != b.scalefacs.toSeq
        }
        assert(changed, s"id=$id: frame-1 slot byte did not affect frame 2")
    }
    assert(pos > 0) // silence unused-val lint
  }

  test("hybrid filterbank perfect reconstruction: analysis∘synthesis " +
      "is the delayed identity within PrBound for BOTH window families") {
    for (id <- Seq(0L, 3L, 17L, 101L)) {
      val (errL, errS) = Mp3.prError(id)
      assert(errL <= Mp3.PrBound, s"id=$id long-chain PR error $errL")
      assert(errS <= Mp3.PrBound, s"id=$id short-chain PR error $errS")
    }
    // the bound is meaningful: a de-normalized analysis must fail it
    val xIn = Array.tabulate(36)(i => math.sin(0.3 * i))
    val bad = Mp3.mdctLong(xIn).map(_ * 1.01)
    val z = Mp3.imdctLong(bad)
    // even without overlap-add the 1% gain shows up far above PrBound
    assert(z.map(math.abs).max > Mp3.PrBound * 100)
  }

  test("IMDCT overlap-add state persists across granules and frames") {
    // a granule with content followed by an all-zero granule still rings
    // (the 36-sample IMDCT tail overlaps into the next granule); find an
    // id whose granule 1 is all-zero after a nonzero granule 0
    val id = (0L until 64L).find { id =>
      val z = (0 until Mp3.MaxLine).forall(l => Mp3.ConstructM.isVal(id, 0, 1, l) == 0)
      val nz = (0 until Mp3.MaxLine).exists(l => Mp3.ConstructM.isVal(id, 0, 0, l) != 0)
      z && nz
    }.getOrElse(fail("construction never produces nonzero->zero granules"))
    val st = Mp3.decode(Mp3.encode(id)).get
    val g1 = st.frames(0)(1)
    assert(g1.is.forall(_ == 0))
    assert(g1.pcm.exists(v => math.abs(v) > 1e-12),
      "zero granule after content should still carry overlap/filter tail")
  }

  test("part2_3_length is enforced exactly: corrupting main data fails " +
      "or changes the decode, never passes silently") {
    val ok = Mp3.encode(7L)
    assert(Mp3.decode(ok).isDefined)
    // flip a bit in the first granule's Huffman region (byte 25, after
    // the 4-byte header + 17-byte side info + some scalefactor bits)
    val bad = ok.clone(); bad(25) = (bad(25) ^ 0x10).toByte
    Mp3.decode(bad) match {
      case None => ()
      case Some(st) =>
        val clean = Mp3.decode(ok).get
        val changed = st.frames.flatten.zip(clean.frames.flatten).exists {
          case (a, b) => !a.is.sameElements(b.is) || a.scalefacs.toSeq != b.scalefacs.toSeq
        }
        assert(changed, "corrupted main data decoded identically")
    }
  }

  test("rejection: truncation, other layers, reservoir, padding, wrong rate") {
    val ok = Mp3.encode(3L)
    assert(Mp3.decode(ok.take(Mp3.FrameBytes - 1)).isEmpty)
    assert(Mp3.decode(Array.emptyByteArray).isEmpty)
    // a Layer II stream must fall through Mp3.decode (and vice versa)
    val mp2 = Mp2.encode(Seq(Mp2.Construct.frameSpec(1L, 0)))
    assert(Mp3.decode(mp2).isEmpty, "Layer II accepted by Mp3")
    assert(Mp2.decode(ok).isEmpty, "Layer III accepted by Mp2")
    def corrupt(i: Int, xor: Int): Array[Byte] = {
      val b = ok.clone(); b(i) = (b(i) ^ xor).toByte; b
    }
    assert(Mp3.decode(corrupt(1, 0x04)).isEmpty, "wrong layer accepted")
    assert(Mp3.decode(corrupt(2, 0x02)).isEmpty, "padding accepted")
    // frame 0 with main_data_begin = 256 points before the stream start
    assert(Mp3.decode(corrupt(4, 0x80)).isEmpty,
      "back-pointer before stream start accepted")
  }

  test("HeaderCodec routes Layer III payloads to the real decoder") {
    import graft.operators.Multimodal
    val d = Multimodal.MediaCodecs.decodeMp3Payload(Mp3.encode(5L))
    assert(d.contains(Multimodal.Decoded(0, 0, Mp3.ConstructM.NFrames, 48000)))
  }
}
