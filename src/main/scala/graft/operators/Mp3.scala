package graft.operators

/** MPEG-1 Audio Layer III (ISO/IEC 11172-3) — hand-written clean-room
  * encoder/decoder pair for the HUFFMAN-CODED payload (VERDICT r14
  * item 2; q195 stops at frame headers): side-info parse, scale-factor
  * read with scfsi granule sharing, big_values + count1 Huffman decode,
  * requantization (global_gain / scalefac_scale math), alias reduction,
  * the 36-point IMDCT hybrid filterbank with overlap-add and frequency
  * inversion, feeding the SAME polyphase synthesis as Layer II
  * ([[Mp2.Synth]]).
  *
  * Clean-room provenance and documented SCOPE BOUNDS (same policy as
  * Mp2/H264 — derive what has closed forms; transcribe only what the
  * construction exercises, pinned structurally in Mp3Spec; fall through
  * on everything else):
  *
  *  - Header tables (Layer III bitrate index, fs) are public. ONE
  *    operating point: 48 kHz / 128 kbit/s / mono / no CRC → exact
  *    384-byte frames (144·128000/48000), padding_bit 0.
  *  - Side-info layout (§2.4.1.7, mono: 9+5+4 bits then 2×59 per
  *    granule = 17 bytes) is structural. main_data_begin must be 0 —
  *    the bit-reservoir back-pointer is NOT implemented (documented;
  *    anything else returns None).
  *  - Long blocks only (window_switching_flag 0, block_type 0);
  *    preflag 0 (Table B.6's pretab is not transcribed).
  *  - The scalefac_compress → (slen1, slen2) table is transcribed
  *    ([[SlenTable]]) and pinned in Mp3Spec (slen1 ≤ 4, slen2 ≤ 3,
  *    canonical entries); bands 0-10 use slen1, 11-20 slen2; scfsi
  *    groups are bands 0-5 / 6-10 / 11-15 / 16-20.
  *  - Huffman: big_values uses TABLE 1 only (x, y ∈ {0,1}; codes
  *    pinned prefix-free AND Kraft-complete in Mp3Spec) with
  *    region0_count = 5 so every coded line sits in region0;
  *    region1/2 are empty and select table 0 (reads nothing). count1
  *    uses TABLE B — the 4-bit FLC where each bit is the complement of
  *    (v, w, x, y) — with one sign bit per nonzero value (1 = negative)
  *    in both regions.
  *  - Spectral lines are confined to 0..23 — scale-factor bands 0-5,
  *    each 4 lines wide at every MPEG-1 rate (the one Table B.8 fact
  *    universally reproduced; the full band table is deliberately NOT
  *    transcribed). Lines ≥ 24 must decode to zero or the stream is
  *    rejected. part2_3_length must be consumed EXACTLY.
  *  - Requantization is the normative closed form
  *    xr = sign(is)·|is|^(4/3) · 2^((global_gain−210)/4) ·
  *    2^(−mult·scalefac[band]), mult = (scalefac_scale+1)/2.
  *  - Alias-reduction butterflies use the eight normative c_i
  *    constants ([[AliasC]], transcribed; cs/ca derived as
  *    1/√(1+c²), c/√(1+c²) and pinned cs²+ca²=1 in Mp3Spec).
  *  - IMDCT (36-point, §2.4.3.4.12) and its sine window are closed
  *    forms; overlap-add state persists across granules and frames.
  *    The polyphase stage reuses [[Mp2.Synth]] with its computed
  *    stand-in window — absolute PCM is therefore structure-pinned,
  *    not value-gated (same contract as Mp2Frame.pcm).
  */
object Mp3 {

  val SampleRate = 48000
  val BitrateKbps = 128
  val FrameBytes = 384 // 144 * 128000 / 48000, exact
  val BitrateIndex = 9 // Layer III: [free,32,40,48,56,64,80,96,112,128,...]
  val FsCode = 1 // '01' = 48 kHz
  val MaxLine = 24 // construction bound: sf bands 0-5, 4 lines each

  /** scalefac_compress → (slen1 for bands 0-10, slen2 for bands 11-20). */
  val SlenTable: IndexedSeq[(Int, Int)] = IndexedSeq(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** scfsi group → scale-factor band range (long blocks). */
  val ScfsiGroups: IndexedSeq[Range] =
    IndexedSeq(0 until 6, 6 until 11, 11 until 16, 16 until 21)

  /** Huffman TABLE 1 for big_values pairs: (x, y) → code bits. */
  val Table1: Map[(Int, Int), String] = Map(
    (0, 0) -> "1", (0, 1) -> "001", (1, 0) -> "01", (1, 1) -> "000")
  private val table1Dec: Map[String, (Int, Int)] = Table1.map(_.swap)

  /** count1 TABLE B: 4-bit FLC, each bit the complement of v/w/x/y. */
  def count1BCode(v: Int, w: Int, x: Int, y: Int): Int =
    ((1 - v) << 3) | ((1 - w) << 2) | ((1 - x) << 1) | (1 - y)

  /** Alias-reduction c constants (Table B.9) and the derived cs/ca. */
  val AliasC: Array[Double] =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  val AliasCs: Array[Double] = AliasC.map(c => 1.0 / math.sqrt(1 + c * c))
  val AliasCa: Array[Double] = AliasC.map(c => c / math.sqrt(1 + c * c))

  // -------------------------------------------------------------------
  // deterministic construction (shared by the q311 gate, its DuckDB
  // oracle — which re-derives every formula in SQL — and Mp3Spec)
  // -------------------------------------------------------------------
  object ConstructM {
    val NFrames = 2
    def globalGain(id: Long, frame: Int, gr: Int): Int =
      160 + ((id + frame * 7 + gr * 3) % 40).toInt
    def scalefacCompress(id: Long, frame: Int, gr: Int): Int =
      ((id + frame + 3 * gr) % 16).toInt
    def scalefacScale(id: Long, gr: Int): Int = ((id + gr) % 2).toInt
    def scfsi(id: Long, frame: Int, g: Int): Int =
      ((id + frame + g) % 2).toInt
    /** scale factor of band b — granule-independent so scfsi sharing is
      * consistent; fits its slen width by construction.
      */
    def scalefac(id: Long, frame: Int, gr: Int, b: Int): Int = {
      val (s1, s2) = SlenTable(scalefacCompress(id, frame, gr))
      val slen = if (b < 11) s1 else s2
      if (slen == 0) 0 else ((id + 2 * b) % (1 << slen)).toInt
    }
    def bigValues(id: Long, frame: Int, gr: Int): Int =
      ((id + frame + gr) % 13).toInt // pairs; lines 0..2bv-1 ≤ 24
    def count1N(id: Long, frame: Int, gr: Int): Int = {
      val room = (MaxLine - 2 * bigValues(id, frame, gr)) / 4
      ((id + frame + 2 * gr) % (room + 1)).toInt
    }
    /** Quantized spectral value at `line` ∈ {−1, 0, 1} inside the coded
      * region, 0 outside.
      */
    def isVal(id: Long, frame: Int, gr: Int, line: Int): Int = {
      val bv = bigValues(id, frame, gr)
      val end = 2 * bv + 4 * count1N(id, frame, gr)
      if (line >= end) 0
      else ((id + frame + 3 * gr + line) % 3).toInt - 1
    }
  }

  // -------------------------------------------------------------------
  // bit I/O
  // -------------------------------------------------------------------
  private final class BitWriter(capacity: Int) {
    val buf = new Array[Byte](capacity)
    private var pos = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >>> i) & 1) != 0)
          buf(pos >> 3) = (buf(pos >> 3) | (0x80 >>> (pos & 7))).toByte
        pos += 1
        i -= 1
      }
    }
    def putBits(bits: String): Unit = bits.foreach(c => put(c - '0', 1))
    def bitPos: Int = pos
  }

  private final class BitReader(bytes: Array[Byte], startBit: Int) {
    private var pos = startBit
    def bitPos: Int = pos
    def get(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= bytes.length * 8) throw new IllegalStateException("overrun")
        v = (v << 1) | ((bytes(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  // -------------------------------------------------------------------
  // encode
  // -------------------------------------------------------------------

  private def sfBits(id: Long, frame: Int, gr: Int): Int = {
    val (s1, s2) = SlenTable(ConstructM.scalefacCompress(id, frame, gr))
    if (gr == 0) 11 * s1 + 10 * s2
    else ScfsiGroups.zipWithIndex.collect {
      case (g, gi) if ConstructM.scfsi(id, frame, gi) == 0 =>
        g.map(b => if (b < 11) s1 else s2).sum
    }.sum
  }

  private def huffBits(id: Long, frame: Int, gr: Int): Int = {
    val bv = ConstructM.bigValues(id, frame, gr)
    val n1 = ConstructM.count1N(id, frame, gr)
    var bits = 0
    for (p <- 0 until bv) {
      val x = math.abs(ConstructM.isVal(id, frame, gr, 2 * p))
      val y = math.abs(ConstructM.isVal(id, frame, gr, 2 * p + 1))
      bits += Table1((x, y)).length + x + y // code + sign bits
    }
    for (q <- 0 until n1; j <- 0 until 4) {
      val v = math.abs(ConstructM.isVal(id, frame, gr, 2 * bv + 4 * q + j))
      bits += v // sign bits
    }
    bits + 4 * n1 // 4-bit FLC per quadruple
  }

  def part23Length(id: Long, frame: Int, gr: Int): Int =
    sfBits(id, frame, gr) + huffBits(id, frame, gr)

  /** Encode `nFrames` frames of the deterministic construction. */
  def encode(id: Long, nFrames: Int = ConstructM.NFrames): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (frame <- 0 until nFrames) {
      val w = new BitWriter(FrameBytes)
      // header: FFF | ID=1 | layer '01' | protection 1 (no CRC)
      w.put(0xfff, 12); w.put(1, 1); w.put(1, 2); w.put(1, 1)
      w.put(BitrateIndex, 4); w.put(FsCode, 2); w.put(0, 1); w.put(0, 1)
      w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)
      // side info (mono, 17 bytes)
      w.put(0, 9) // main_data_begin = 0 (no reservoir)
      w.put(0, 5) // private_bits
      for (g <- 0 until 4) w.put(ConstructM.scfsi(id, frame, g), 1)
      for (gr <- 0 until 2) {
        w.put(part23Length(id, frame, gr), 12)
        w.put(ConstructM.bigValues(id, frame, gr), 9)
        w.put(ConstructM.globalGain(id, frame, gr), 8)
        w.put(ConstructM.scalefacCompress(id, frame, gr), 4)
        w.put(0, 1) // window_switching_flag (long blocks)
        w.put(1, 5); w.put(0, 5); w.put(0, 5) // table_select 1/0/0
        w.put(5, 4) // region0_count = 5 (bands 0-5 = lines 0-23)
        w.put(7, 3) // region1_count (region empty by construction)
        w.put(0, 1) // preflag
        w.put(ConstructM.scalefacScale(id, gr), 1)
        w.put(1, 1) // count1table_select = 1 (table B)
      }
      // main data: per granule, scale factors then Huffman
      for (gr <- 0 until 2) {
        val (s1, s2) = SlenTable(ConstructM.scalefacCompress(id, frame, gr))
        for ((g, gi) <- ScfsiGroups.zipWithIndex) {
          if (gr == 0 || ConstructM.scfsi(id, frame, gi) == 0)
            for (b <- g) {
              val slen = if (b < 11) s1 else s2
              if (slen > 0) w.put(ConstructM.scalefac(id, frame, gr, b), slen)
            }
        }
        val bv = ConstructM.bigValues(id, frame, gr)
        for (p <- 0 until bv) {
          val vx = ConstructM.isVal(id, frame, gr, 2 * p)
          val vy = ConstructM.isVal(id, frame, gr, 2 * p + 1)
          w.putBits(Table1((math.abs(vx), math.abs(vy))))
          if (vx != 0) w.put(if (vx < 0) 1 else 0, 1)
          if (vy != 0) w.put(if (vy < 0) 1 else 0, 1)
        }
        val n1 = ConstructM.count1N(id, frame, gr)
        for (q <- 0 until n1) {
          val vs = Array.tabulate(4)(j =>
            ConstructM.isVal(id, frame, gr, 2 * bv + 4 * q + j))
          w.put(count1BCode(math.abs(vs(0)), math.abs(vs(1)),
            math.abs(vs(2)), math.abs(vs(3))), 4)
          vs.foreach(v => if (v != 0) w.put(if (v < 0) 1 else 0, 1))
        }
      }
      require(w.bitPos <= FrameBytes * 8, s"frame overflow: ${w.bitPos}")
      out.write(w.buf)
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // decode
  // -------------------------------------------------------------------

  /** Everything the q311 gate reads back per granule. */
  final case class Mp3Granule(
      part23: Int, bigValues: Int, globalGain: Int, scalefacCompress: Int,
      scalefacScale: Int, scalefacs: Array[Int], // effective, bands 0-20
      is: Array[Int], // quantized spectral values, lines 0..MaxLine-1
      xr: Array[Double], // requantized
      pcm: Array[Double]) // 576 samples through IMDCT + polyphase

  final case class Mp3Stream(sampleRate: Int, bitrateKbps: Int,
      frames: Vector[Vector[Mp3Granule]]) // frames(frameIdx)(granule)

  private final case class SideInfo(part23: Int, bigValues: Int,
      globalGain: Int, sfCompress: Int, sfScale: Int)

  def decode(bytes: Array[Byte]): Option[Mp3Stream] = {
    try {
      if (bytes.length == 0 || bytes.length % FrameBytes != 0) return None
      val synth = new Mp2.Synth
      val overlap = Array.ofDim[Double](32, 18) // IMDCT overlap-add state
      val frames = Vector.newBuilder[Vector[Mp3Granule]]
      var off = 0
      while (off < bytes.length) {
        val r = new BitReader(bytes, off * 8)
        if (r.get(12) != 0xfff) return None
        if (r.get(1) != 1) return None // MPEG-1
        if (r.get(2) != 1) return None // Layer III
        if (r.get(1) != 1) return None // no CRC
        if (r.get(4) != BitrateIndex) return None
        if (r.get(2) != FsCode) return None
        if (r.get(1) != 0) return None // padding (fixed stride)
        r.get(1) // private
        if (r.get(2) != 3) return None // mono
        r.get(6)
        if (r.get(9) != 0) return None // main_data_begin: no reservoir
        r.get(5) // private_bits
        val scfsi = Array.tabulate(4)(_ => r.get(1))
        val si = Array.tabulate(2) { _ =>
          val part23 = r.get(12)
          val bv = r.get(9)
          val gg = r.get(8)
          val sfc = r.get(4)
          if (r.get(1) != 0) return None // long blocks only
          val ts0 = r.get(5); val ts1 = r.get(5); val ts2 = r.get(5)
          if (ts0 != 1 || ts1 != 0 || ts2 != 0) return None // table scope
          if (r.get(4) != 5) return None // region0_count (lines 0-23)
          r.get(3) // region1_count (empty region)
          if (r.get(1) != 0) return None // preflag
          val sfs = r.get(1)
          if (r.get(1) != 1) return None // count1 table B only
          if (2 * bv > MaxLine) return None // construction bound
          SideInfo(part23, bv, gg, sfc, sfs)
        }
        // main data starts right after the 17-byte side info
        val granules = Vector.newBuilder[Mp3Granule]
        val prevSf = new Array[Int](21)
        for (gr <- 0 until 2) {
          val s = si(gr)
          val startBit = r.bitPos
          val (s1, s2) = SlenTable(s.sfCompress)
          val sf = new Array[Int](21)
          for ((g, gi) <- ScfsiGroups.zipWithIndex) {
            if (gr == 0 || scfsi(gi) == 0)
              for (b <- g) {
                val slen = if (b < 11) s1 else s2
                sf(b) = if (slen > 0) r.get(slen) else 0
              }
            else for (b <- g) sf(b) = prevSf(b) // scfsi sharing
          }
          // Huffman: big_values pairs via table 1, then count1 via B
          val is = new Array[Int](MaxLine)
          for (p <- 0 until s.bigValues) {
            val sb = new StringBuilder
            var hit: Option[(Int, Int)] = None
            while (hit.isEmpty) {
              sb.append(('0' + r.get(1)).toChar)
              if (sb.length > 3) throw new IllegalStateException("bad code")
              hit = table1Dec.get(sb.toString)
            }
            val (x, y) = hit.get
            is(2 * p) = if (x != 0 && r.get(1) == 1) -x else x
            is(2 * p + 1) = if (y != 0 && r.get(1) == 1) -y else y
          }
          // count1 until part2_3_length is exhausted
          var line = 2 * s.bigValues
          while (r.bitPos - startBit < s.part23) {
            if (line + 4 > MaxLine) return None
            val code = r.get(4)
            val vs = Array((code >> 3) ^ 1, (code >> 2 & 1) ^ 1,
              (code >> 1 & 1) ^ 1, (code & 1) ^ 1)
            for (j <- 0 until 4) {
              is(line + j) =
                if (vs(j) != 0 && r.get(1) == 1) -vs(j) else vs(j)
            }
            line += 4
          }
          if (r.bitPos - startBit != s.part23) return None // exact budget
          // requantization (preflag 0; bands 0-5, 4 lines each)
          val mult = if (s.sfScale == 0) 0.5 else 1.0
          val xr = new Array[Double](576)
          for (i <- 0 until MaxLine) {
            if (is(i) != 0) {
              val gain = (s.globalGain - 210) / 4.0 - mult * sf(i / 4)
              xr(i) = math.signum(is(i).toDouble) *
                math.pow(math.abs(is(i).toDouble), 4.0 / 3.0) *
                math.pow(2.0, gain)
            }
          }
          // keep the pre-alias requantized lines for the gate (alias
          // reduction below mutates xr in place at subband boundaries)
          val xrOut = xr.take(MaxLine)
          // alias reduction across subband boundaries
          for (sb <- 1 until 32; i <- 0 until 8) {
            val lo = 18 * sb - 1 - i
            val hi = 18 * sb + i
            val a = xr(lo); val b = xr(hi)
            xr(lo) = a * AliasCs(i) - b * AliasCa(i)
            xr(hi) = b * AliasCs(i) + a * AliasCa(i)
          }
          // IMDCT per subband (36-point, long window) + overlap-add +
          // frequency inversion, then 18 polyphase steps
          val pcm = new Array[Double](576)
          val bands = Array.ofDim[Double](32, 18)
          for (sb <- 0 until 32) {
            val xIn = Array.tabulate(18)(k => xr(18 * sb + k))
            val z = Array.tabulate(36) { i2 =>
              var acc = 0.0
              var k = 0
              while (k < 18) {
                acc += xIn(k) * math.cos(math.Pi / 72.0 *
                  (2 * i2 + 1 + 18) * (2 * k + 1))
                k += 1
              }
              acc * math.sin(math.Pi / 36.0 * (i2 + 0.5))
            }
            for (j <- 0 until 18) {
              bands(sb)(j) = z(j) + overlap(sb)(j)
              overlap(sb)(j) = z(j + 18)
            }
            if (sb % 2 == 1)
              for (j <- 1 until 18 by 2) bands(sb)(j) = -bands(sb)(j)
          }
          for (j <- 0 until 18) {
            val sVec = Array.tabulate(32)(sb => bands(sb)(j))
            synth.step(sVec, pcm, j * 32)
          }
          granules += Mp3Granule(s.part23, s.bigValues, s.globalGain,
            s.sfCompress, s.sfScale, sf, is, xrOut, pcm)
          System.arraycopy(sf, 0, prevSf, 0, 21)
        }
        frames += granules.result()
        off += FrameBytes
      }
      Some(Mp3Stream(SampleRate, BitrateKbps, frames.result()))
    } catch { case _: Exception => None }
  }
}
