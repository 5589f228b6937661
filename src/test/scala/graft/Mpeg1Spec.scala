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
