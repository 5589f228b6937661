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
      "and spectral value across ids; scfsi sharing exercised") {
    var sawShared = false
    var sawOwn = false
    for (id <- 0L until 24L) {
      val bytes = Mp3.encode(id)
      assert(bytes.length == Mp3.ConstructM.NFrames * Mp3.FrameBytes)
      val st = Mp3.decode(bytes).getOrElse(fail(s"id=$id decode None"))
      assert(st.sampleRate == 48000 && st.bitrateKbps == 128)
      for (fi <- st.frames.indices; gr <- 0 until 2) {
        val g = st.frames(fi)(gr)
        assert(g.part23 == Mp3.part23Length(id, fi, gr), s"id=$id f=$fi gr=$gr part23")
        assert(g.bigValues == Mp3.ConstructM.bigValues(id, fi, gr))
        assert(g.globalGain == Mp3.ConstructM.globalGain(id, fi, gr))
        assert(g.scalefacCompress == Mp3.ConstructM.scalefacCompress(id, fi, gr))
        assert(g.scalefacScale == Mp3.ConstructM.scalefacScale(id, gr))
        // effective scale factors: granule 1's shared groups copy
        // granule 0's values (granule 0's slen widths)
        for ((grp, gi) <- Mp3.ScfsiGroups.zipWithIndex; b <- grp) {
          val shared = gr == 1 && Mp3.ConstructM.scfsi(id, fi, gi) == 1
          if (shared) sawShared = true else if (gr == 1) sawOwn = true
          val useGr = if (shared) 0 else gr
          assert(g.scalefacs(b) == Mp3.ConstructM.scalefac(id, fi, useGr, b),
            s"id=$id f=$fi gr=$gr b=$b shared=$shared")
        }
        (0 until Mp3.MaxLine).foreach { i =>
          assert(g.is(i) == Mp3.ConstructM.isVal(id, fi, gr, i),
            s"id=$id f=$fi gr=$gr line=$i")
        }
        // requantization closed form on the pre-alias lines
        val mult = if (g.scalefacScale == 0) 0.5 else 1.0
        (0 until Mp3.MaxLine).foreach { i =>
          val isv = g.is(i)
          val expect =
            if (isv == 0) 0.0
            else math.signum(isv.toDouble) *
              math.pow(math.abs(isv.toDouble), 4.0 / 3.0) *
              math.pow(2.0, (g.globalGain - 210) / 4.0 - mult * g.scalefacs(i / 4))
          assert(math.abs(g.xr(i) - expect) <= 1e-12 * (1 + math.abs(expect)))
        }
        assert(g.pcm.length == 576 && g.pcm.forall(v => !v.isNaN && !v.isInfinite))
      }
    }
    assert(sawShared, "scfsi never shared a group")
    assert(sawOwn, "granule 1 never transmitted its own scale factors")
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
    // main_data_begin != 0 (first bit of byte 4): reservoir unsupported
    assert(Mp3.decode(corrupt(4, 0x80)).isEmpty, "bit reservoir accepted")
  }

  test("HeaderCodec routes Layer III payloads to the real decoder") {
    import graft.operators.Multimodal
    val d = Multimodal.MediaCodecs.decodeMp3Payload(Mp3.encode(5L))
    assert(d.contains(Multimodal.Decoded(0, 0, 2, 48000)))
  }
}
