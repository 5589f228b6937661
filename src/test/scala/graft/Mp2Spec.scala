package graft

import graft.operators.Mp2
import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Audio Layer II codec pair (ISO/IEC 11172-3) — the bit-level
  * decode chain must invert the encoder within the quantizer's half-step
  * bound, and the synthesis filterbank must show its normative structural
  * invariants (window-independent; see Mp2's scaladoc).
  */
class Mp2Spec extends AnyFunSuite {

  private def mkSpec(frame: Int, id: Long): Mp2.FrameSpec =
    Mp2.Construct.frameSpec(id, frame)

  test("derived Table B.4 constants reproduce the published rows") {
    // the published (C, D) pairs for every Layer II class — these are the
    // values the closed forms must land on exactly
    val published = Seq(
      3 -> (4.0 / 3, 0.5), 5 -> (1.6, 0.5), 7 -> (8.0 / 7, 0.25),
      9 -> (16.0 / 9, 0.5), 15 -> (16.0 / 15, 0.125),
      31 -> (32.0 / 31, 0.0625), 63 -> (64.0 / 63, 0.03125),
      127 -> (128.0 / 127, 0.015625), 255 -> (256.0 / 255, 0.0078125),
      511 -> (512.0 / 511, 0.00390625), 1023 -> (1024.0 / 1023, 0.001953125),
      2047 -> (2048.0 / 2047, 0.0009765625),
      4095 -> (4096.0 / 4095, 0.00048828125),
      8191 -> (8192.0 / 8191, 0.000244140625),
      16383 -> (16384.0 / 16383, 0.0001220703125),
      32767 -> (32768.0 / 32767, 0.00006103515625),
      65535 -> (65536.0 / 65535, 0.000030517578125))
    published.foreach { case (n, (c, d)) =>
      val q = Mp2.quantClass(n)
      assert(q.c == c && q.d == d, s"class $n: got (${q.c}, ${q.d})")
      assert(q.grouped == (n == 3 || n == 5 || n == 9))
    }
    // grouped triplets pack into 5/7/10 bits; ungrouped into 3·nb
    assert(Mp2.quantClass(3).bits == 5 && Mp2.quantClass(5).bits == 7 &&
      Mp2.quantClass(9).bits == 10 && Mp2.quantClass(7).bits == 9)
    // requant levels are uniform and symmetric: 3 levels → ±2/3
    val q3 = Mp2.quantClass(3)
    assert(math.abs(Mp2.requant(q3, 0) + 2.0 / 3) < 1e-12 &&
      Mp2.requant(q3, 1) == 0.0 &&
      math.abs(Mp2.requant(q3, 2) - 2.0 / 3) < 1e-12)
  }

  test("Table B.2a structure: nbal and row alphabets per subband band") {
    assert((0 until 3).forall(sb => Mp2.allocRow(sb)._2 == 4))
    assert((3 until 11).forall(sb => Mp2.allocRow(sb)._2 == 4))
    assert((11 until 23).forall(sb => Mp2.allocRow(sb)._2 == 3))
    assert((23 until 27).forall(sb => Mp2.allocRow(sb)._2 == 2))
    assert(Mp2.allocRow(0)._1.toSeq == Seq(0, 3, 7, 15, 31, 63, 127, 255,
      511, 1023, 2047, 4095, 8191, 16383, 32767, 65535))
    assert(Mp2.allocRow(5)._1.toSeq == Seq(0, 3, 5, 7, 9, 15, 31, 63, 127,
      255, 511, 1023, 2047, 4095, 8191, 65535))
    assert(Mp2.allocRow(15)._1.toSeq == Seq(0, 3, 5, 7, 9, 15, 31, 65535))
    assert(Mp2.allocRow(25)._1.toSeq == Seq(0, 3, 5, 65535))
    // every row fits its nbal and scale factors follow 2·2^(-i/3)
    (0 until 27).foreach { sb =>
      val (row, nbal) = Mp2.allocRow(sb)
      assert(row.length <= (1 << nbal))
    }
    assert(Mp2.scaleFactor(0) == 2.0 &&
      math.abs(Mp2.scaleFactor(3) - 1.0) < 1e-12 &&
      math.abs(Mp2.scaleFactor(62) - 2.0 * math.pow(2, -62.0 / 3)) < 1e-18)
  }

  test("the construction exercises every Layer II quantization class") {
    val classes = (for {
      id <- 0L until 20L; frame <- 0 until 3; sb <- 0 until Mp2.Sblimit
    } yield Mp2.allocRow(sb)._1(Mp2.Construct.allocIdx(id, frame, sb))).toSet
    assert(classes == Set(0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023,
      2047, 4095, 8191, 16383, 32767, 65535), s"missing: $classes")
  }

  test("decode inverts encode: every subband sample within half a step") {
    for (id <- Seq(1L, 7L, 13L, 40L)) {
      val specs = Seq(mkSpec(0, id), mkSpec(1, id), mkSpec(2, id))
      val bytes = Mp2.encode(specs)
      assert(bytes.length == 3 * Mp2.FrameBytes)
      val st = Mp2.decode(bytes).getOrElse(fail("decode returned None"))
      assert(st.sampleRate == 48000 && st.bitrateKbps == 192 &&
        st.frames.size == 3)
      st.frames.map(_.head).zipWithIndex.foreach { case (f, fi) =>
        // allocation round-trips exactly
        (0 until Mp2.Sblimit).foreach { sb =>
          val (row, _) = Mp2.allocRow(sb)
          val expIdx = Mp2.Construct.allocIdx(id, fi, sb)
          assert(f.allocNlevels(sb) == row(expIdx), s"alloc sb=$sb f=$fi")
        }
        // scale factors round-trip for every scfsi pattern
        (0 until Mp2.Sblimit).filter(sb => f.allocNlevels(sb) != 0).foreach { sb =>
          val expSf = Mp2.Construct.sfIdx(id, sb)
          assert(f.sfIdx(sb).forall(_ == expSf), s"sf sb=$sb f=$fi: ${f.sfIdx(sb).toSeq}")
        }
        // requantized values within the quantizer bound of the intent
        (0 until Mp2.Sblimit).foreach { sb =>
          val nlev = f.allocNlevels(sb)
          (0 until 36).foreach { t =>
            val uu = Mp2.Construct.u(id, fi, sb, t)
            if (nlev == 0)
              assert(f.subband(sb)(t) == 0.0)
            else {
              val q = Mp2.quantClass(nlev)
              val sf = Mp2.scaleFactor(Mp2.Construct.sfIdx(id, sb))
              val bound = Mp2.quantBound(q) * sf * (1 + 1e-9) + 1e-12
              assert(math.abs(f.subband(sb)(t) - uu * sf) <= bound,
                s"f=$fi sb=$sb t=$t nlev=$nlev err=${math.abs(f.subband(sb)(t) - uu * sf)} bound=$bound")
            }
          }
        }
      }
    }
  }

  test("synthesis: constant subband input reaches an EXACT period-32 steady state") {
    val id = 7L
    val st = Mp2.decode(Mp2.encode(Seq(mkSpec(0, id)))).get
    val pcm = st.frames(0)(0).pcm
    // the 1024-sample V FIFO fills after 16 identical granule-steps; from
    // sample 512 on, every 32-sample block is bit-identical (same doubles
    // through the same op order) — a wrong FIFO shift, re-index or window
    // phase breaks exact equality
    (640 until 1120).foreach(t => assert(pcm(t) == pcm(t + 32), s"t=$t"))
    assert(pcm.exists(v => math.abs(v) > 1e-6), "silent synthesis output")
  }

  test("synthesis is linear: scaling every subband scales the PCM") {
    // decode twice with scale factors 6 apart (exactly 4x amplitude);
    // constructed u values identical → PCM ratio must be exactly 4 in
    // the steady region (up to float rounding)
    val base = mkSpec(0, 9L)
    val quiet = base.copy(sfIdx = base.sfIdx.map(i => math.min(62, i + 6)))
    val loudPcm = Mp2.decode(Mp2.encode(Seq(base))).get.frames(0)(0).pcm
    val quietPcm = Mp2.decode(Mp2.encode(Seq(quiet))).get.frames(0)(0).pcm
    (640 until 1152).foreach { t =>
      assert(math.abs(loudPcm(t) - 4.0 * quietPcm(t)) <=
        1e-9 * (1.0 + math.abs(loudPcm(t))), s"t=$t")
    }
  }

  test("synthesis state persists across frames (no per-frame FIFO reset)") {
    // two frames with DIFFERENT constant subband content: frame 1's first
    // samples are a transient mixing both frames' content — if the FIFO
    // were reset per frame, frame 1 would already be periodic at its head.
    val f0 = mkSpec(0, 3L)
    val f1 = mkSpec(0, 21L)
    val st = Mp2.decode(Mp2.encode(Seq(f0, f1))).get
    val pcm1 = st.frames(1)(0).pcm
    val headPeriodic = (0 until 480).forall(t => pcm1(t) == pcm1(t + 32))
    assert(!headPeriodic, "frame 1 head already periodic — FIFO was reset")
    // and the tail of frame 1 IS periodic again (steady on f1's content)
    (640 until 1120).foreach(t => assert(pcm1(t) == pcm1(t + 32), s"t=$t"))
  }

  test("rejection: truncation, bad sync, wrong layer/bitrate/fs/mode") {
    val ok = Mp2.encode(Seq(mkSpec(0, 5L)))
    assert(Mp2.decode(ok).isDefined)
    assert(Mp2.decode(ok.take(Mp2.FrameBytes - 1)).isEmpty, "truncated frame accepted")
    assert(Mp2.decode(Array.emptyByteArray).isEmpty)
    def corrupt(byteIdx: Int, xor: Int): Array[Byte] = {
      val b = ok.clone(); b(byteIdx) = (b(byteIdx) ^ xor).toByte; b
    }
    assert(Mp2.decode(corrupt(0, 0x01)).isEmpty, "bad sync accepted")
    assert(Mp2.decode(corrupt(1, 0x06)).isEmpty, "wrong layer accepted")
    // bitrate idx 10 (1010) ^ 0xf0-nibble -> 0101 = 80k: valid Layer II
    // rate but not THIS stream's operating point - must reject
    assert(Mp2.decode(corrupt(2, 0xf0)).isEmpty, "wrong bitrate accepted")
    // fs '01' ^ flip both bits -> '10' = 32 kHz - must reject
    assert(Mp2.decode(corrupt(2, 0x0c)).isEmpty, "wrong fs accepted")
    assert(Mp2.decode(corrupt(3, 0xc0)).isEmpty, "non-mono mode accepted")
    assert(Mp2.decode("not audio at all".getBytes).isEmpty)
  }

  test("window is table-like: 512 taps, multiples of 2^-16, low-pass shape") {
    assert(Mp2.Window.length == 512)
    assert(Mp2.Window.forall(v => (v * 65536.0) == math.rint(v * 65536.0)))
    // energy concentrated at the center (prototype is a lowpass)
    val center = Mp2.Window.slice(192, 320).map(math.abs).sum
    val tails = Mp2.Window.take(64).map(math.abs).sum +
      Mp2.Window.takeRight(64).map(math.abs).sum
    assert(center > 10 * tails)
    // power complementarity across the band edge (the pseudo-QMF design
    // objective): A²(ω) + A²(π/32−ω) flat to well under 1%
    val h = Mp2.Window.map(_ / 32.0)
    def amp(w: Double): Double =
      (0 until 512).map(i => h(i) * math.cos(w * (i - 255.5))).sum
    val edge = math.Pi / 32
    val f = (0 to 32).map { m =>
      val w = edge * m / 32
      math.pow(amp(w), 2) + math.pow(amp(edge - w), 2)
    }
    assert(f.max / f.min - 1 < 0.01, s"power ripple ${f.max / f.min - 1}")
  }

  // ------------------------------------------------------------------
  // r15: perfect-reconstruction gate + stereo/B.2b operating point
  // ------------------------------------------------------------------

  test("PR: analysis-synthesis chain delay is 481 and band-center tones " +
      "reconstruct to a few permille") {
    assert(Mp2.prDelay == 481, s"delay ${Mp2.prDelay}") // the known
    // filterbank delay of the 512-tap pair — derived, then pinned
    assert(Mp2.prGain > 0.2 && Mp2.prGain < 0.3, s"gain ${Mp2.prGain}")
    for (k <- Seq(0, 3, 9, 21)) {
      val w = (2 * k + 1) * math.Pi / 64
      val tone = Array.tabulate(4096)(t => math.sin(w * t))
      // prError includes the onset transient (the abrupt tone start is
      // broadband); the steady region is several times cleaner
      assert(Mp2.prError(tone) < 0.015, s"band $k center tone")
      val out = Mp2.analysisSynthesis(tone)
      var steady = 0.0
      for (t <- 2000 until 4096)
        steady = math.max(steady,
          math.abs(out(t) / Mp2.prGain - tone(t - Mp2.prDelay)))
      assert(steady < 0.005, s"band $k center steady err $steady")
    }
  }

  test("PR: arbitrary probes reconstruct within PrBound (the q310 gate " +
      "bound); quarter-band phase ripple is the documented worst case") {
    val rng = new scala.util.Random(3)
    val probes = Seq(
      Array.tabulate(4096)(t => math.sin(2 * math.Pi * t / 300.0)),
      Array.tabulate(4096)(t => rng.nextDouble() * 2 - 1),
      Array.tabulate(4096)(t => if (t % 64 < 32) 1.0 else -1.0),
      Array.tabulate(4096)(t => math.sin(2 * math.Pi * t * t / 90000.0)),
      // worst measured class: quarter-band tones
      Array.tabulate(4096)(t => math.sin(0.5 * math.Pi / 64 * t)),
      Array.tabulate(4096)(t => math.sin(2.5 * math.Pi / 64 * t)))
    probes.zipWithIndex.foreach { case (p, i) =>
      val e = Mp2.prError(p)
      assert(e < Mp2.PrBound, s"probe $i err $e >= ${Mp2.PrBound}")
    }
    // linearity of the whole chain
    val p = probes.head
    val scaled = Mp2.analysisSynthesis(p.map(_ * 2.5))
    val base = Mp2.analysisSynthesis(p)
    (0 until p.length).foreach { t =>
      assert(math.abs(scaled(t) - 2.5 * base(t)) < 1e-9 * (1 + math.abs(scaled(t))))
    }
  }

  test("stereo/B.2b: encode -> decode round-trips both channels; the " +
      "channels allocate different subbands; sblimit 30") {
    for (id <- Seq(0L, 5L, 11L, 28L)) {
      val nf = (2 + id % 2).toInt
      val specs = (0 until nf).map(f =>
        IndexedSeq(Mp2.ConstructS.frameSpec(id * 2, f),
          Mp2.ConstructS.frameSpec(id * 2 + 1, f)))
      val bytes = Mp2.encodeFrames(Mp2.OpStereo32, specs)
      assert(bytes.length == nf * Mp2.OpStereo32.frameBytes)
      val st = Mp2.decode(bytes).getOrElse(fail(s"id=$id stereo decode None"))
      assert(st.sampleRate == 32000 && st.channels == 2 &&
        st.frames.size == nf)
      for (fi <- 0 until nf; ch <- 0 until 2) {
        val fr = st.frames(fi)(ch)
        val id2 = id * 2 + ch
        assert(fr.allocNlevels.length == 30)
        (0 until 30).foreach { sb =>
          val (row, _) = Mp2.allocRow(sb)
          assert(fr.allocNlevels(sb) == row(Mp2.ConstructS.allocIdx(id2, fi, sb)),
            s"id=$id f=$fi ch=$ch sb=$sb")
          if (fr.allocNlevels(sb) != 0) {
            val expSf = Mp2.ConstructS.sfIdx(id2, sb)
            assert(fr.sfIdx(sb).forall(_ == expSf))
            val q = Mp2.quantClass(fr.allocNlevels(sb))
            val sf = Mp2.scaleFactor(expSf)
            val bound = Mp2.quantBound(q) * sf * (1 + 1e-9) + 1e-12
            (0 until 36).foreach { t =>
              assert(math.abs(fr.subband(sb)(t) -
                Mp2.ConstructS.u(id2, fi, sb, t) * sf) <= bound)
            }
          }
        }
        // per-channel synthesis produced sound
        assert(fr.pcm.length == 1152 && fr.pcm.exists(v => math.abs(v) > 1e-9))
      }
      // the two channels genuinely diverge (different parity -> different
      // silent subbands)
      val a0 = st.frames(0)(0).allocNlevels.toSeq
      val a1 = st.frames(0)(1).allocNlevels.toSeq
      assert(a0 != a1, "stereo channels allocated identically")
      assert(a0.zip(a1).forall { case (x, y) => x == 0 || y == 0 },
        "parity construction should alternate silent subbands")
    }
  }

  test("B.2b band structure: nbal-2 band extends through subband 29") {
    (23 until 30).foreach { sb =>
      val (row, nbal) = Mp2.allocRow(sb)
      assert(nbal == 2 && row.toSeq == Seq(0, 3, 5, 65535))
    }
    // stereo frame byte count is the exact 144*bitrate/fs with no padding
    assert(Mp2.OpStereo32.frameBytes == 144 * 192000 / 32000)
  }

  test("stereo rejection: mono-op header fields with stereo payload (and " +
      "vice versa) fall through") {
    val mono = Mp2.encode(Seq(mkSpec(0, 5L)))
    // flip the mono header's mode bits to stereo '00': not an accepted
    // operating point at 48 kHz -> None
    val b = mono.clone(); b(3) = (b(3) & 0x3f).toByte
    assert(Mp2.decode(b).isEmpty)
    // a stereo stream truncated mid-frame
    val st = Mp2.encodeFrames(Mp2.OpStereo32,
      Seq(IndexedSeq(Mp2.ConstructS.frameSpec(0, 0), Mp2.ConstructS.frameSpec(1, 0))))
    assert(Mp2.decode(st.take(st.length - 7)).isEmpty)
  }
}
