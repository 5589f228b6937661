package graft.operators

/** MPEG-1 Audio Layer III (ISO/IEC 11172-3) — hand-written clean-room
  * encoder/decoder pair for the HUFFMAN-CODED payload (q311): side-info
  * parse, the BIT RESERVOIR (§2.4.2.7 main_data_begin back-pointer,
  * r16 — VERDICT r15 item 2), scale-factor read with scfsi granule
  * sharing, big_values + count1 Huffman decode, requantization
  * (global_gain / scalefac_scale / subblock_gain math), alias
  * reduction, the hybrid filterbank — 36-point long IMDCT AND the
  * 12-point×3 SHORT-block path with spectral reorder (r16) — with
  * overlap-add and frequency inversion, feeding the SAME polyphase
  * synthesis as Layer II ([[Mp2.Synth]]). The hybrid stage carries a
  * PERFECT-RECONSTRUCTION gate (r16 — VERDICT r15 item 3):
  * [[prError]] runs the construction-inverse MDCT analysis against
  * the decoder's own synthesis functions and bounds the error of the
  * delayed identity by [[PrBound]] for both window families.
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
  *    granule = 17 bytes) is structural. main_data_begin is honored:
  *    each frame's main data may start up to 511 bytes back in the
  *    reservoir of previous frames' slot bytes (the construction uses
  *    back-pointers up to 55 and zero ancillary stuffing between
  *    frames' main data).
  *  - Block types: LONG (window_switching_flag 0, block_type 0) and
  *    pure SHORT (block_type 2, mixed_block_flag 0) granules, freely
  *    mixed across a frame's granule pair. Start/stop transition
  *    windows (block_type 1/3) are NOT implemented — a real encoder
  *    emits them between window families, so perfect reconstruction
  *    holds per family (the two [[prError]] chains), not across a
  *    long↔short boundary; the syntax/requant gate covers mixed
  *    sequences regardless. preflag 0 (Table B.6's pretab is not
  *    transcribed). scfsi applies to long-only frames; any frame
  *    containing a short granule transmits scfsi 0 (§2.4.2.7).
  *  - The scalefac_compress → (slen1, slen2) table is transcribed
  *    ([[SlenTable]]) and pinned in Mp3Spec. Long: bands 0-10 slen1,
  *    11-20 slen2, scfsi groups 0-5/6-10/11-15/16-20. Short: bands
  *    0-5 slen1, 6-11 slen2, 3 values per band (one per window).
  *  - Huffman: big_values uses TABLE 1 only (x, y ∈ {0,1}; pinned
  *    prefix-free AND Kraft-complete in Mp3Spec); for long granules
  *    region0_count = 5 puts every coded line in region0; for short
  *    granules the normative window-switching region boundary (36
  *    lines) does the same. count1 uses TABLE B (4-bit complement
  *    FLC) with one sign bit per nonzero value. The remaining
  *    big_values tables (B.7's trained code tables) are deliberately
  *    NOT transcribed from memory — same policy as pretab.
  *  - Spectral lines are confined to 0..23 — long scale-factor bands
  *    0-5 (4 lines each at every MPEG-1 rate) or short bands 0-1 × 3
  *    windows (also 4 lines each — the Table B.8 facts universally
  *    reproduced; the full band table is deliberately NOT
  *    transcribed). Lines ≥ 24 must decode to zero or the stream is
  *    rejected. part2_3_length must be consumed EXACTLY.
  *  - Requantization is the normative closed form
  *    xr = sign(is)·|is|^(4/3) · 2^((global_gain−210)/4) ·
  *    2^(−2·subblock_gain[w]) · 2^(−mult·scalefac), mult =
  *    (scalefac_scale+1)/2 (subblock_gain 0 for long blocks).
  *  - Alias-reduction butterflies (long blocks only) use the eight
  *    normative c_i constants ([[AliasC]], transcribed; cs/ca derived
  *    and pinned cs²+ca²=1 in Mp3Spec).
  *  - IMDCT (36-point long / 12-point×3 short, §2.4.3.4.12), the sine
  *    windows, the short-block reorder and the 6/12/18 short overlap
  *    layout are closed forms; overlap-add state persists across
  *    granules and frames. [[prError]] VALUE-gates this hybrid stage
  *    (analysis∘synthesis ≤ [[PrBound]], including an alias
  *    round-trip on the long chain). The polyphase stage reuses
  *    [[Mp2.Synth]] whose computed stand-in window makes absolute PCM
  *    after the polyphase structure-pinned (q310 PR-gates that stage
  *    separately).
  */
object Mp3 {

  val SampleRate = 48000
  val BitrateKbps = 128
  val FrameBytes = 384 // 144 * 128000 / 48000, exact
  val SlotBytes = FrameBytes - 4 - 17 // main-data slot bytes per frame
  val BitrateIndex = 9 // Layer III: [free,32,40,48,56,64,80,96,112,128,...]
  val FsCode = 1 // '01' = 48 kHz
  val MaxLine = 24 // construction bound: 6 long bands / 2 short bands × 3
  /** Hybrid-filterbank perfect-reconstruction bound ([[prError]]). */
  val PrBound = 1e-9

  /** scalefac_compress → (slen1, slen2). */
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
    val NFrames = 3
    /** Granule window family: every third (frame, granule) is SHORT. */
    def isShort(id: Long, frame: Int, gr: Int): Boolean =
      (id + 2 * frame + gr) % 3 == 0
    def frameHasShort(id: Long, frame: Int): Boolean =
      isShort(id, frame, 0) || isShort(id, frame, 1)
    def subblockGain(id: Long, frame: Int, gr: Int, w: Int): Int =
      ((id + frame + gr + w) % 8).toInt
    /** Reservoir back-pointer (bytes): 0 for frame 0, else a sweep
      * bounded well inside the 9-bit field and the available slack.
      */
    def mainDataBegin(id: Long, frame: Int): Int =
      if (frame == 0) 0 else ((id * 13 + 7 * frame) % 56).toInt
    def globalGain(id: Long, frame: Int, gr: Int): Int =
      160 + ((id + frame * 7 + gr * 3) % 40).toInt
    def scalefacCompress(id: Long, frame: Int, gr: Int): Int =
      ((id + frame + 3 * gr) % 16).toInt
    def scalefacScale(id: Long, gr: Int): Int = ((id + gr) % 2).toInt
    def scfsi(id: Long, frame: Int, g: Int): Int =
      ((id + frame + g) % 2).toInt
    /** Effective scfsi: forced 0 in frames containing a short granule. */
    def scfsiEff(id: Long, frame: Int, g: Int): Int =
      if (frameHasShort(id, frame)) 0 else scfsi(id, frame, g)
    /** Long scale factor of band b — granule-independent so scfsi
      * sharing is consistent; fits its slen width by construction.
      */
    def scalefac(id: Long, frame: Int, gr: Int, b: Int): Int = {
      val (s1, s2) = SlenTable(scalefacCompress(id, frame, gr))
      val slen = if (b < 11) s1 else s2
      if (slen == 0) 0 else ((id + 2 * b) % (1 << slen)).toInt
    }
    /** Short scale factor of band b (0-11), window w. */
    def scalefacShort(id: Long, frame: Int, gr: Int, b: Int, w: Int): Int = {
      val (s1, s2) = SlenTable(scalefacCompress(id, frame, gr))
      val slen = if (b < 6) s1 else s2
      if (slen == 0) 0 else ((id + 2 * b + 3 * w) % (1 << slen)).toInt
    }
    def bigValues(id: Long, frame: Int, gr: Int): Int =
      ((id + frame + gr) % 13).toInt // pairs; lines 0..2bv-1 ≤ 24
    def count1N(id: Long, frame: Int, gr: Int): Int = {
      val room = (MaxLine - 2 * bigValues(id, frame, gr)) / 4
      ((id + frame + 2 * gr) % (room + 1)).toInt
    }
    /** Quantized spectral value at `line` ∈ {−1, 0, 1} inside the coded
      * region, 0 outside (sfb order; for short granules the line order
      * is band-major, window-minor).
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
    def byteLen: Int = (pos + 7) / 8
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
  // bit budgets
  // -------------------------------------------------------------------

  private def sfBits(id: Long, frame: Int, gr: Int): Int = {
    val (s1, s2) = SlenTable(ConstructM.scalefacCompress(id, frame, gr))
    if (ConstructM.isShort(id, frame, gr)) 18 * s1 + 18 * s2
    else if (gr == 0) 11 * s1 + 10 * s2
    else ScfsiGroups.zipWithIndex.collect {
      case (g, gi) if ConstructM.scfsiEff(id, frame, gi) == 0 =>
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

  // -------------------------------------------------------------------
  // encode
  // -------------------------------------------------------------------

  /** Encode `nFrames` frames of the deterministic construction with a
    * live bit reservoir: frame f's main data begins
    * main_data_begin(f) bytes before its own slot region, inside the
    * previous frames' unused slot bytes (zero ancillary stuffing in
    * the gaps).
    */
  def encode(id: Long, nFrames: Int = ConstructM.NFrames): Array[Byte] = {
    // 1. render each frame's main data into its own bit buffer
    val mains = Array.tabulate(nFrames) { frame =>
      val m = new BitWriter(SlotBytes)
      for (gr <- 0 until 2) {
        val short = ConstructM.isShort(id, frame, gr)
        val (s1, s2) = SlenTable(ConstructM.scalefacCompress(id, frame, gr))
        if (short) {
          for (b <- 0 until 12; w <- 0 until 3) {
            val slen = if (b < 6) s1 else s2
            if (slen > 0)
              m.put(ConstructM.scalefacShort(id, frame, gr, b, w), slen)
          }
        } else {
          for ((g, gi) <- ScfsiGroups.zipWithIndex) {
            if (gr == 0 || ConstructM.scfsiEff(id, frame, gi) == 0)
              for (b <- g) {
                val slen = if (b < 11) s1 else s2
                if (slen > 0) m.put(ConstructM.scalefac(id, frame, gr, b), slen)
              }
          }
        }
        val bv = ConstructM.bigValues(id, frame, gr)
        for (p <- 0 until bv) {
          val vx = ConstructM.isVal(id, frame, gr, 2 * p)
          val vy = ConstructM.isVal(id, frame, gr, 2 * p + 1)
          m.putBits(Table1((math.abs(vx), math.abs(vy))))
          if (vx != 0) m.put(if (vx < 0) 1 else 0, 1)
          if (vy != 0) m.put(if (vy < 0) 1 else 0, 1)
        }
        val n1 = ConstructM.count1N(id, frame, gr)
        for (q <- 0 until n1) {
          val vs = Array.tabulate(4)(j =>
            ConstructM.isVal(id, frame, gr, 2 * bv + 4 * q + j))
          m.put(count1BCode(math.abs(vs(0)), math.abs(vs(1)),
            math.abs(vs(2)), math.abs(vs(3))), 4)
          vs.foreach(v => if (v != 0) m.put(if (v < 0) 1 else 0, 1))
        }
      }
      m
    }
    // 2. reservoir layout: S(f) = SlotBytes·f − main_data_begin(f)
    val mainBuf = new Array[Byte](SlotBytes * nFrames)
    var prevEnd = 0
    for (frame <- 0 until nFrames) {
      val mdb = ConstructM.mainDataBegin(id, frame)
      val start = SlotBytes * frame - mdb
      val len = mains(frame).byteLen
      require(start >= prevEnd, s"reservoir overlap at frame $frame")
      require(start + len <= SlotBytes * (frame + 1), s"frame $frame overflow")
      System.arraycopy(mains(frame).buf, 0, mainBuf, start, len)
      prevEnd = start + len
    }
    // 3. emit header + side info + slot bytes per frame
    val out = new java.io.ByteArrayOutputStream()
    for (frame <- 0 until nFrames) {
      val w = new BitWriter(21)
      // header: FFF | ID=1 | layer '01' | protection 1 (no CRC)
      w.put(0xfff, 12); w.put(1, 1); w.put(1, 2); w.put(1, 1)
      w.put(BitrateIndex, 4); w.put(FsCode, 2); w.put(0, 1); w.put(0, 1)
      w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)
      // side info (mono, 17 bytes)
      w.put(ConstructM.mainDataBegin(id, frame), 9)
      w.put(0, 5) // private_bits
      for (g <- 0 until 4) w.put(ConstructM.scfsiEff(id, frame, g), 1)
      for (gr <- 0 until 2) {
        val short = ConstructM.isShort(id, frame, gr)
        w.put(part23Length(id, frame, gr), 12)
        w.put(ConstructM.bigValues(id, frame, gr), 9)
        w.put(ConstructM.globalGain(id, frame, gr), 8)
        w.put(ConstructM.scalefacCompress(id, frame, gr), 4)
        if (short) {
          w.put(1, 1) // window_switching_flag
          w.put(2, 2) // block_type 2: short
          w.put(0, 1) // mixed_block_flag
          w.put(1, 5); w.put(0, 5) // table_select (region boundary = 36)
          for (sw <- 0 until 3)
            w.put(ConstructM.subblockGain(id, frame, gr, sw), 3)
        } else {
          w.put(0, 1) // window_switching_flag (long)
          w.put(1, 5); w.put(0, 5); w.put(0, 5) // table_select 1/0/0
          w.put(5, 4) // region0_count = 5 (bands 0-5 = lines 0-23)
          w.put(7, 3) // region1_count (region empty by construction)
        }
        w.put(0, 1) // preflag
        w.put(ConstructM.scalefacScale(id, gr), 1)
        w.put(1, 1) // count1table_select = 1 (table B)
      }
      out.write(w.buf)
      out.write(mainBuf, SlotBytes * frame, SlotBytes)
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // hybrid filterbank (shared by decode and the PR gate)
  // -------------------------------------------------------------------

  /** 36-point long IMDCT with the sine window (§2.4.3.4.12). */
  // precomputed IMDCT/window tables: the basis values are loop
  // invariants, and computing cos() per sample made the hybrid
  // filterbank (and the q311 PR probe that runs it 384 times per id)
  // trig-bound — ~10 ms/id before, sub-ms after
  private val ImdctLongCos: Array[Array[Double]] = Array.tabulate(36, 18)(
    (i, k) => math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)))
  private val LongWin: Array[Double] =
    Array.tabulate(36)(i => math.sin(math.Pi / 36.0 * (i + 0.5)))
  private val ImdctShortCos: Array[Array[Double]] = Array.tabulate(12, 6)(
    (p, j) => math.cos(math.Pi / 24.0 * (2 * p + 1 + 6) * (2 * j + 1)))
  private val ShortWin: Array[Double] =
    Array.tabulate(12)(p => math.sin(math.Pi / 12.0 * (p + 0.5)))

  def imdctLong(xIn: Array[Double]): Array[Double] =
    Array.tabulate(36) { i =>
      var acc = 0.0
      var k = 0
      while (k < 18) {
        acc += xIn(k) * ImdctLongCos(i)(k)
        k += 1
      }
      acc * LongWin(i)
    }

  /** 12-point×3 short IMDCT: input is one subband's 18 reordered lines
    * (window-interleaved, index 3j + w); output the 36-sample frame
    * with the 6/12/18 short overlap layout (first/last 6 zero).
    */
  def imdctShort(xIn: Array[Double]): Array[Double] = {
    val z = new Array[Double](36)
    var w = 0
    while (w < 3) {
      var p = 0
      while (p < 12) {
        var acc = 0.0
        var j = 0
        while (j < 6) {
          acc += xIn(3 * j + w) * ImdctShortCos(p)(j)
          j += 1
        }
        z(6 + 6 * w + p) += acc * ShortWin(p)
        p += 1
      }
      w += 1
    }
    z
  }

  /** Decoder-side alias-reduction butterflies across long subband
    * boundaries, in place over a 576-line spectrum.
    */
  def aliasReduce(xr: Array[Double]): Unit =
    for (sb <- 1 until 32; i <- 0 until 8) {
      val lo = 18 * sb - 1 - i
      val hi = 18 * sb + i
      val a = xr(lo); val b = xr(hi)
      xr(lo) = a * AliasCs(i) - b * AliasCa(i)
      xr(hi) = b * AliasCs(i) + a * AliasCa(i)
    }

  /** Encoder-side aliasing (the exact inverse rotation; cs²+ca²=1). */
  def aliasEncode(xr: Array[Double]): Unit =
    for (sb <- 1 until 32; i <- 0 until 8) {
      val lo = 18 * sb - 1 - i
      val hi = 18 * sb + i
      val a = xr(lo); val b = xr(hi)
      xr(lo) = a * AliasCs(i) + b * AliasCa(i)
      xr(hi) = b * AliasCs(i) - a * AliasCa(i)
    }

  /** Construction-inverse forward MDCT, long window: 36 time samples →
    * 18 coefficients, normalized (4/N) so that [[imdctLong]] +
    * overlap-add is the delayed identity (sine window satisfies the
    * Princen-Bradley condition).
    */
  def mdctLong(x: Array[Double]): Array[Double] =
    Array.tabulate(18) { k =>
      var acc = 0.0
      var i = 0
      while (i < 36) {
        acc += x(i) * LongWin(i) * ImdctLongCos(i)(k)
        i += 1
      }
      acc / 9.0
    }

  /** Construction-inverse forward MDCT, short windows: 36 time samples
    * → 18 window-interleaved coefficients (4/N = 1/3 normalization).
    */
  def mdctShort(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](18)
    for (w <- 0 until 3; j <- 0 until 6) {
      var acc = 0.0
      var p = 0
      while (p < 12) {
        acc += x(6 + 6 * w + p) * ShortWin(p) * ImdctShortCos(p)(j)
        p += 1
      }
      out(3 * j + w) = acc / 3.0
    }
    out
  }

  /** Perfect-reconstruction error of the hybrid filterbank for a
    * deterministic per-id probe: (long-chain error, short-chain error),
    * each the max deviation of analysis∘synthesis from the
    * one-granule-delayed identity over 6 granules × 32 subbands. The
    * long chain includes an aliasEncode∘aliasReduce round-trip so the
    * butterflies' orthogonality is in the gated path. Both must be ≤
    * [[PrBound]] (q311's pr_ok column; Mp3Spec pins the same bound).
    */
  def prError(id: Long): (Double, Double) = {
    val nG = 6
    def probe(sb: Int, n: Int): Double =
      math.sin(0.37 * ((id % 97) + 1) + 0.61 * sb + 0.253 * n)
    var errL = 0.0
    var errS = 0.0
    for (shortChain <- Seq(false, true)) {
      val overlap = Array.ofDim[Double](32, 18)
      for (g <- 0 until nG) {
        val spec = new Array[Double](576)
        for (sb <- 0 until 32) {
          val xi = Array.tabulate(36)(i => probe(sb, g * 18 + i))
          val coef = if (shortChain) mdctShort(xi) else mdctLong(xi)
          System.arraycopy(coef, 0, spec, 18 * sb, 18)
        }
        if (!shortChain) { aliasEncode(spec); aliasReduce(spec) }
        for (sb <- 0 until 32) {
          val xIn = java.util.Arrays.copyOfRange(spec, 18 * sb, 18 * sb + 18)
          val z = if (shortChain) imdctShort(xIn) else imdctLong(xIn)
          var j = 0
          while (j < 18) {
            val out = z(j) + overlap(sb)(j)
            overlap(sb)(j) = z(j + 18)
            if (g >= 1) {
              val e = math.abs(out - probe(sb, g * 18 + j))
              if (shortChain) errS = math.max(errS, e)
              else errL = math.max(errL, e)
            }
            j += 1
          }
        }
      }
    }
    (errL, errS)
  }

  // -------------------------------------------------------------------
  // decode
  // -------------------------------------------------------------------

  /** Everything the q311 gate reads back per granule. `scalefacs` is
    * 21 long bands or 36 short (band-major, window-minor) values;
    * `sbg` is the three subblock gains (zeros for long granules).
    */
  final case class Mp3Granule(
      part23: Int, bigValues: Int, globalGain: Int, scalefacCompress: Int,
      scalefacScale: Int, blockType: Int, mainDataBegin: Int,
      sbg: Array[Int], scalefacs: Array[Int],
      is: Array[Int], // quantized spectral values, lines 0..MaxLine-1
      xr: Array[Double], // requantized (pre-alias / pre-reorder)
      pcm: Array[Double]) // 576 samples through IMDCT + polyphase

  final case class Mp3Stream(sampleRate: Int, bitrateKbps: Int,
      frames: Vector[Vector[Mp3Granule]]) // frames(frameIdx)(granule)

  private final case class SideInfo(part23: Int, bigValues: Int,
      globalGain: Int, sfCompress: Int, sfScale: Int, short: Boolean,
      sbg: Array[Int])

  def decode(bytes: Array[Byte]): Option[Mp3Stream] = {
    try {
      if (bytes.length == 0 || bytes.length % FrameBytes != 0) return None
      val synth = new Mp2.Synth
      val overlap = Array.ofDim[Double](32, 18) // IMDCT overlap-add state
      val frames = Vector.newBuilder[Vector[Mp3Granule]]
      // bit reservoir: all slot bytes seen so far, in stream order
      val reservoir = new java.io.ByteArrayOutputStream()
      var off = 0
      var frameIdx = 0
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
        val mdb = r.get(9) // main_data_begin: reservoir back-pointer
        r.get(5) // private_bits
        val scfsi = Array.tabulate(4)(_ => r.get(1))
        val si = Array.tabulate(2) { _ =>
          val part23 = r.get(12)
          val bv = r.get(9)
          val gg = r.get(8)
          val sfc = r.get(4)
          val wsf = r.get(1)
          val (short, sbg) =
            if (wsf == 1) {
              if (r.get(2) != 2) return None // block_type 2 only
              if (r.get(1) != 0) return None // pure short (not mixed)
              val ts0 = r.get(5); val ts1 = r.get(5)
              if (ts0 != 1 || ts1 != 0) return None // table scope
              (true, Array.tabulate(3)(_ => r.get(3)))
            } else {
              val ts0 = r.get(5); val ts1 = r.get(5); val ts2 = r.get(5)
              if (ts0 != 1 || ts1 != 0 || ts2 != 0) return None
              if (r.get(4) != 5) return None // region0_count (lines 0-23)
              r.get(3) // region1_count (empty region)
              (false, Array(0, 0, 0))
            }
          if (r.get(1) != 0) return None // preflag
          val sfs = r.get(1)
          if (r.get(1) != 1) return None // count1 table B only
          if (2 * bv > MaxLine) return None // construction bound
          if (short && (scfsi.exists(_ != 0))) return None // §2.4.2.7
          SideInfo(part23, bv, gg, sfc, sfs, short, sbg)
        }
        // main data begins mdb bytes back in the reservoir
        val startByte = reservoir.size - mdb
        if (startByte < 0) return None // back-pointer before stream start
        reservoir.write(bytes, off + 21, SlotBytes)
        val res = reservoir.toByteArray
        val r2 = new BitReader(res, startByte * 8)
        val granules = Vector.newBuilder[Mp3Granule]
        val prevSf = new Array[Int](21)
        for (gr <- 0 until 2) {
          val s = si(gr)
          val startBit = r2.bitPos
          val (s1, s2) = SlenTable(s.sfCompress)
          val sf =
            if (s.short) {
              val a = new Array[Int](36)
              for (b <- 0 until 12; w <- 0 until 3) {
                val slen = if (b < 6) s1 else s2
                a(b * 3 + w) = if (slen > 0) r2.get(slen) else 0
              }
              a
            } else {
              val a = new Array[Int](21)
              for ((g, gi) <- ScfsiGroups.zipWithIndex) {
                if (gr == 0 || scfsi(gi) == 0)
                  for (b <- g) {
                    val slen = if (b < 11) s1 else s2
                    a(b) = if (slen > 0) r2.get(slen) else 0
                  }
                else for (b <- g) a(b) = prevSf(b) // scfsi sharing
              }
              a
            }
          // Huffman: big_values pairs via table 1, then count1 via B
          val is = new Array[Int](MaxLine)
          for (p <- 0 until s.bigValues) {
            val sb = new StringBuilder
            var hit: Option[(Int, Int)] = None
            while (hit.isEmpty) {
              sb.append(('0' + r2.get(1)).toChar)
              if (sb.length > 3) throw new IllegalStateException("bad code")
              hit = table1Dec.get(sb.toString)
            }
            val (x, y) = hit.get
            is(2 * p) = if (x != 0 && r2.get(1) == 1) -x else x
            is(2 * p + 1) = if (y != 0 && r2.get(1) == 1) -y else y
          }
          // count1 until part2_3_length is exhausted
          var line = 2 * s.bigValues
          while (r2.bitPos - startBit < s.part23) {
            if (line + 4 > MaxLine) return None
            val code = r2.get(4)
            val vs = Array((code >> 3) ^ 1, (code >> 2 & 1) ^ 1,
              (code >> 1 & 1) ^ 1, (code & 1) ^ 1)
            for (j <- 0 until 4) {
              is(line + j) =
                if (vs(j) != 0 && r2.get(1) == 1) -vs(j) else vs(j)
            }
            line += 4
          }
          if (r2.bitPos - startBit != s.part23) return None // exact budget
          // requantization (preflag 0)
          val mult = if (s.sfScale == 0) 0.5 else 1.0
          val xr = new Array[Double](576)
          for (i <- 0 until MaxLine) {
            if (is(i) != 0) {
              val gain =
                if (s.short) {
                  val b = i / 12; val w = (i % 12) / 4
                  (s.globalGain - 210) / 4.0 - 2.0 * s.sbg(w) -
                    mult * sf(b * 3 + w)
                } else (s.globalGain - 210) / 4.0 - mult * sf(i / 4)
              xr(i) = math.signum(is(i).toDouble) *
                math.pow(math.abs(is(i).toDouble), 4.0 / 3.0) *
                math.pow(2.0, gain)
            }
          }
          // keep the pre-alias/pre-reorder requantized lines for the gate
          val xrOut = xr.take(MaxLine)
          if (s.short) {
            // reorder sfb order → window-interleaved subband order
            val spec = new Array[Double](576)
            for (i <- 0 until MaxLine) {
              val b = i / 12; val w = (i % 12) / 4; val idx = i % 4
              spec(b * 12 + 3 * idx + w) = xr(i)
            }
            System.arraycopy(spec, 0, xr, 0, 576)
            // no alias reduction for pure short blocks
          } else aliasReduce(xr)
          // hybrid synthesis: IMDCT + overlap-add + frequency inversion,
          // then 18 polyphase steps
          val pcm = new Array[Double](576)
          val bands = Array.ofDim[Double](32, 18)
          for (sb <- 0 until 32) {
            val xIn = java.util.Arrays.copyOfRange(xr, 18 * sb, 18 * sb + 18)
            val z = if (s.short) imdctShort(xIn) else imdctLong(xIn)
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
            s.sfCompress, s.sfScale, if (s.short) 2 else 0, mdb, s.sbg,
            sf, is, xrOut, pcm)
          if (!s.short) System.arraycopy(sf, 0, prevSf, 0, 21)
        }
        frames += granules.result()
        off += FrameBytes
        frameIdx += 1
      }
      Some(Mp3Stream(SampleRate, BitrateKbps, frames.result()))
    } catch { case _: Exception => None }
  }
}
