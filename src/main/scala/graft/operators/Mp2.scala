package graft.operators

/** MPEG-1 Audio Layer II (ISO/IEC 11172-3) — hand-written clean-room
  * encoder/decoder pair for the ENTROPY-CODED audio path (VERDICT r13
  * item 1): frame-header parse, Table-B.2a bit allocation, scfsi,
  * scale-factor read, grouped/ungrouped sample requantization, and the
  * 32-subband polyphase synthesis filterbank.
  *
  * Clean-room provenance, and one documented deviation:
  *
  *  - Header field tables (bitrate index, sampling frequency, mode) are
  *    public (§2.4.2.3).
  *  - Table B.2a's structure (27 subbands; nbal 4/4/3/2 for subbands
  *    0-2 / 3-10 / 11-22 / 23-26; the per-row level alphabets) is
  *    transcribed below and cross-checked against its widely-reproduced
  *    form in public decoders.
  *  - Every Table B.4 quantization constant is DERIVED, not transcribed:
  *    for the grouped classes (3/5/9 levels, codes packed base-n into
  *    5/7/10 bits) C = 2^nb/nlevels and D = 1/2; for the ungrouped
  *    classes (nlevels = 2^nb - 1) C = 2^nb/(2^nb - 1) and D = 2^(1-nb).
  *    Requantization is the normative s'' = C·(s''' + D) with
  *    s''' = code·2^(1-nb) - 1 (§2.4.3.3); these closed forms reproduce
  *    every published B.4 row exactly (3→4/3,0.5; 7→8/7,0.25;
  *    15→16/15,0.125; ...), so there is nothing to mis-transcribe.
  *  - Table B.1 scale factors are the closed form 2·2^(-idx/3).
  *  - The synthesis filterbank STRUCTURE is normative (§2.4.3.2.2 /
  *    Annex A: 64-point matrixing N[i][k] = cos((16+i)(2k+1)π/64),
  *    1024-sample V FIFO, U re-index, 512-tap window, 16-fold sum per
  *    32 output samples; r15 corrected the matrixing from π/32 — see
  *    [[Mp2.Synth]]). The normative C/D tables' SIGN pattern is DERIVED
  *    (see [[Mp2.blockSign]]'s scaladoc), not transcribed. The 512
  *    window MAGNITUDES of Table 3-B.3 are the one normative table this
  *    zero-egress build does not transcribe: recalling 512 sixteen-bit
  *    fractions from memory risks exactly the silent-drift class the
  *    r13 video review caught in the quantizer matrices. The window
  *    used is a COMPUTED near-PR pseudo-QMF prototype (spectral-square-
  *    root of a Kaiser-windowed sinc, cutoff grid-optimized for power
  *    complementarity at class load — fully derived), quantized to
  *    multiples of 2^-16 like the normative values. The q302 gate
  *    certifies the full BIT-LEVEL decode chain (header → allocation →
  *    scfsi → scale factors → codes → requant) bit-exactly against an
  *    independent SQL re-derivation, and pins the synthesis structure
  *    with window-independent invariants (exact period-32 steady state
  *    under constant subband input; linearity). Absolute PCM samples
  *    are window-dependent and NOT gated bit-wise — instead the r15
  *    q310 gate bounds the END-TO-END analysis∘synthesis chain
  *    ([[Mp2.Analysis]] ∘ [[Mp2.Synth]]) against a delayed identity
  *    within [[Mp2.PrBound]]: magnitude response flat to ~0.1%,
  *    adjacent-alias leakage ≲0.3%, with the residual dominated by the
  *    periodic group-delay ripple inherent to the ±16-offset pseudo-QMF
  *    composition measured against an integer 481-sample delay.
  *
  * Only the single operating point the construction emits is accepted
  * (48 kHz, 192 kbit/s, mono, no CRC → Table B.2a per the normative
  * table-selection rule [fs = 48 kHz and per-channel rate ≥ 56 kbit/s],
  * sblimit 27, exact 576-byte frames with zero padding); anything else
  * returns None so the decode chain falls through (HeaderCodec contract).
  */
object Mp2 {

  val SampleRate = 48000
  val BitrateKbps = 192
  val FrameBytes = 576 // 144 * 192000 / 48000, exact — no padding bit games
  val BitrateIndex = 10 // Layer II: [free,32,48,56,64,80,96,112,128,160,192,...]
  val FsCode = 1 // '00'=44.1k, '01'=48k, '10'=32k
  val Sblimit = 27
  val SamplesPerFrame = 1152 // 36 subband samples × 32 subbands

  /** One accepted operating point: header fields + layout constants.
    * r15 widened decode beyond the original mono point (VERDICT r14
    * item 3) so the scfsi/channel paths run beyond mono and a Table
    * B.2b sblimit is exercised:
    *
    *  - [[OpMono48]]: 48 kHz / 192 kbit/s / mono → Table B.2a (fs
    *    48 kHz, per-channel rate ≥ 56 kbit/s), sblimit 27, exact
    *    576-byte frames.
    *  - [[OpStereo32]]: 32 kHz / 192 kbit/s / stereo (96 kbit/s per
    *    channel) → Table B.2b, sblimit 30, exact 864-byte frames
    *    (144·192000/32000). B.2b's transcribed STRUCTURE: identical
    *    row alphabets to B.2a with the nbal-2 [0,3,5,65535] band
    *    extended through subband 29 — cross-checked against its
    *    widely-reproduced form; width pins in Mp2Spec.
    *
    * Both rates divide evenly (padding_bit always 0); anything else
    * returns None (HeaderCodec fall-through contract).
    */
  final case class OpPoint(sampleRate: Int, bitrateKbps: Int,
      channels: Int, sblimit: Int, frameBytes: Int, bitrateIndex: Int,
      fsCode: Int, modeCode: Int)

  val OpMono48: OpPoint = OpPoint(48000, 192, 1, 27, 576, 10, 1, 3)
  val OpStereo32: OpPoint = OpPoint(32000, 192, 2, 30, 864, 10, 2, 0)

  /** Table B.2a level alphabets. Index 0 = no allocation. */
  private val rowA: Array[Int] = Array(0, 3, 7, 15, 31, 63, 127, 255, 511,
    1023, 2047, 4095, 8191, 16383, 32767, 65535) // sb 0-2, nbal 4
  private val rowB: Array[Int] = Array(0, 3, 5, 7, 9, 15, 31, 63, 127, 255,
    511, 1023, 2047, 4095, 8191, 65535) // sb 3-10, nbal 4
  private val rowC: Array[Int] = Array(0, 3, 5, 7, 9, 15, 31, 65535) // 11-22, nbal 3
  private val rowD: Array[Int] = Array(0, 3, 5, 65535) // sb 23-26, nbal 2

  /** (allowed nlevels, nbal bits) per subband — B.2a bands, with the
    * nbal-2 band extended through sb 29 for B.2b (same alphabets).
    */
  def allocRow(sb: Int): (Array[Int], Int) =
    if (sb < 3) (rowA, 4)
    else if (sb < 11) (rowB, 4)
    else if (sb < 23) (rowC, 3)
    else (rowD, 2)

  /** Derived Table B.4 row: (grouped, bits [per group or per code], C, D,
    * nb) where nb = bits of one ungrouped code / of one in-group digit's
    * power-of-two container (s''' = v·2^(1-nb) - 1).
    */
  final case class QuantClass(nlevels: Int, grouped: Boolean, bits: Int,
      c: Double, d: Double, nb: Int)

  def quantClass(nlevels: Int): QuantClass = nlevels match {
    case 3 => QuantClass(3, grouped = true, bits = 5, c = 4.0 / 3, d = 0.5, nb = 2)
    case 5 => QuantClass(5, grouped = true, bits = 7, c = 8.0 / 5, d = 0.5, nb = 3)
    case 9 => QuantClass(9, grouped = true, bits = 10, c = 16.0 / 9, d = 0.5, nb = 4)
    case n =>
      // ungrouped: n = 2^nb - 1
      val nb = java.lang.Integer.numberOfTrailingZeros(n + 1)
      require((1 << nb) - 1 == n, s"not a Layer II class: $n")
      QuantClass(n, grouped = false, bits = 3 * nb,
        c = (1L << nb).toDouble / n, d = math.pow(2.0, 1 - nb), nb = nb)
  }

  /** Table B.1: scale factor idx 0..62 → 2·2^(-idx/3). */
  def scaleFactor(idx: Int): Double = 2.0 * math.pow(2.0, -idx / 3.0)

  /** s''' for one code value v of class `q` (normative §2.4.3.3). */
  def fract(q: QuantClass, v: Int): Double =
    v * math.pow(2.0, 1 - q.nb) - 1.0

  /** Requantized subband value s'' = C·(s''' + D) ∈ (-1, 1). */
  def requant(q: QuantClass, v: Int): Double = q.c * (fract(q, v) + q.d)

  /** Encoder-side inverse: target normalized value u ∈ (-1, 1) → code. */
  def quantize(q: QuantClass, u: Double): Int = {
    val sPrime = u / q.c - q.d // target s'''
    val v = math.round((sPrime + 1.0) * (1 << (q.nb - 1))).toInt
    math.max(0, math.min(q.nlevels - 1, v))
  }

  /** Worst-case |requant(quantize(u)) - u| for in-range u: half a step. */
  def quantBound(q: QuantClass): Double = q.c * math.pow(2.0, -q.nb)

  // -------------------------------------------------------------------
  // bit I/O (MSB first, like every MPEG bitstream)
  // -------------------------------------------------------------------
  private final class BitWriter(capacity: Int) {
    val buf = new Array[Byte](capacity)
    private var pos = 0 // bit position
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >>> i) & 1) != 0) buf(pos >> 3) = (buf(pos >> 3) | (0x80 >>> (pos & 7))).toByte
        pos += 1
        i -= 1
      }
    }
    def bitPos: Int = pos
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos = startByte * 8
    def get(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def bitPos: Int = pos
  }

  // -------------------------------------------------------------------
  // frame construction
  // -------------------------------------------------------------------

  /** One frame's construction inputs: per subband, the allocation INDEX
    * into its B.2a row, one scale-factor index used for all three parts,
    * the scfsi pattern to exercise, and the normalized target value
    * u(t) ∈ (-0.95, 0.95) for t = 0..35.
    */
  final case class FrameSpec(allocIdx: Array[Int], sfIdx: Array[Int],
      scfsi: Array[Int], u: (Int, Int) => Double)

  /** The deterministic construction shared by the q302 gate, its DuckDB
    * oracle (which re-derives these formulas in SQL) and Mp2Spec. Index
    * bounds keep the worst-case frame at ~3460 bits < the 4608-bit
    * budget while still exercising EVERY quantization class: subband 0
    * cycles its full 16-entry row (up to the 16-bit class, ≤48 bits per
    * granule), subband 3 cycles through the grouped-9 class, the rest
    * stay in the cheap classes (0..3 / 0..2 indices). Scale factors stay
    * in 0..40, scfsi cycles all four patterns, and u ∈ [-0.891, 0.891]
    * never clips a quantizer. Frame 0's values are constant in t (feeds
    * the exact period-32 synthesis invariant); later frames vary per
    * sample.
    */
  object Construct {
    def allocIdx(id: Long, frame: Int, sb: Int): Int =
      if (sb == 0) ((id + frame) % 16).toInt
      else if (sb == 3) ((id + frame * 5) % 6).toInt
      else if (sb < 23) ((id + sb * 3 + frame) % 4).toInt
      else ((id + sb * 3 + frame) % 3).toInt
    def sfIdx(id: Long, sb: Int): Int = ((id * 5 + sb * 7) % 41).toInt
    def scfsi(id: Long, sb: Int): Int = ((id + sb) % 4).toInt
    def u(id: Long, frame: Int, sb: Int, t: Int): Double = {
      val tt = if (frame == 0) 0 else t
      (((id * 31 + frame * 17 + sb * 13 + tt * 7) % 181) - 90).toDouble / 101.0
    }
    def frameSpec(id: Long, frame: Int): FrameSpec = FrameSpec(
      Array.tabulate(Sblimit)(allocIdx(id, frame, _)),
      Array.tabulate(Sblimit)(sfIdx(id, _)),
      Array.tabulate(Sblimit)(scfsi(id, _)),
      (sb, t) => u(id, frame, sb, t))
  }

  /** q310's deterministic STEREO construction at [[OpStereo32]] (shared
    * by the gate, its DuckDB oracle and Mp2Spec), keyed by
    * id2 = 2·id + ch so the two channels allocate DIFFERENT subbands
    * (id2 parity flips per channel). Every other (sb, frame, ch) is
    * deterministically silent: the stereo frame budget is 6880 bits for
    * TWO channels (vs 4576 for one mono channel), so the construction
    * caps row indices (classes 3/5/7/9/15) and halves allocation
    * density — worst case ≈ 2×2100 bits, comfortably inside. Scale
    * factors sweep the full B.1 range 0..62.
    */
  object ConstructS {
    def allocIdx(id2: Long, frame: Int, sb: Int): Int =
      if ((id2 + frame + sb) % 2 == 1) 0
      else if (sb == 0) (1 + (id2 + frame) % 3).toInt
      else if (sb == 3) (1 + (id2 + frame * 5) % 5).toInt
      else if (sb < 23) (1 + (id2 + sb * 3 + frame) % 3).toInt
      else (1 + (id2 + sb * 3 + frame) % 2).toInt
    def sfIdx(id2: Long, sb: Int): Int = ((id2 * 7 + sb * 5) % 63).toInt
    def scfsi(id2: Long, sb: Int): Int = ((id2 + sb) % 4).toInt
    def u(id2: Long, frame: Int, sb: Int, t: Int): Double =
      (((id2 * 29 + frame * 13 + sb * 11 + t * 3) % 167) - 83).toDouble / 97.0
    def frameSpec(id2: Long, frame: Int): FrameSpec = FrameSpec(
      Array.tabulate(OpStereo32.sblimit)(allocIdx(id2, frame, _)),
      Array.tabulate(OpStereo32.sblimit)(sfIdx(id2, _)),
      Array.tabulate(OpStereo32.sblimit)(scfsi(id2, _)),
      (sb, t) => u(id2, frame, sb, t))
  }

  /** Encode `specs` as a contiguous MONO Layer II stream (one 576-byte
    * frame each) at [[OpMono48]] — the original q302 surface.
    */
  def encode(specs: Seq[FrameSpec]): Array[Byte] =
    encodeFrames(OpMono48, specs.map(s => IndexedSeq(s)))

  /** Encode one FrameSpec PER CHANNEL per frame at any accepted
    * operating point (§2.4.1.6 layout: allocation, scfsi and scale
    * factors subband-major channel-minor; samples granule-major).
    */
  def encodeFrames(op: OpPoint,
      frames: Seq[IndexedSeq[FrameSpec]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { chSpec =>
      require(chSpec.size == op.channels, "one FrameSpec per channel")
      val w = new BitWriter(op.frameBytes)
      // header: FFF | ID=1 | layer '10' | protection 1 (no CRC)
      w.put(0xfff, 12); w.put(1, 1); w.put(2, 2); w.put(1, 1)
      w.put(op.bitrateIndex, 4); w.put(op.fsCode, 2); w.put(0, 1); w.put(0, 1)
      // mode | mode_ext | copyright | original | emphasis
      w.put(op.modeCode, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)
      // bit allocation: sb-major, ch-minor
      var sb = 0
      while (sb < op.sblimit) {
        val (_, nbal) = allocRow(sb)
        var ch = 0
        while (ch < op.channels) {
          w.put(chSpec(ch).allocIdx(sb), nbal)
          ch += 1
        }
        sb += 1
      }
      // scfsi for allocated (sb, ch)
      sb = 0
      while (sb < op.sblimit) {
        var ch = 0
        while (ch < op.channels) {
          if (chSpec(ch).allocIdx(sb) != 0) w.put(chSpec(ch).scfsi(sb), 2)
          ch += 1
        }
        sb += 1
      }
      // scale factors: same index for every transmitted part (the scfsi
      // pattern then only changes the BIT layout, not the decode result)
      sb = 0
      while (sb < op.sblimit) {
        var ch = 0
        while (ch < op.channels) {
          if (chSpec(ch).allocIdx(sb) != 0) {
            val n = chSpec(ch).scfsi(sb) match {
              case 0 => 3
              case 2 => 1
              case _ => 2
            }
            var k = 0
            while (k < n) { w.put(chSpec(ch).sfIdx(sb), 6); k += 1 }
          }
          ch += 1
        }
        sb += 1
      }
      // samples: 12 granules × 3 samples per allocated (sb, ch)
      var gr = 0
      while (gr < 12) {
        sb = 0
        while (sb < op.sblimit) {
          var ch = 0
          while (ch < op.channels) {
            val spec = chSpec(ch)
            if (spec.allocIdx(sb) != 0) {
              val (row, _) = allocRow(sb)
              val q = quantClass(row(spec.allocIdx(sb)))
              val v0 = quantize(q, spec.u(sb, gr * 3))
              val v1 = quantize(q, spec.u(sb, gr * 3 + 1))
              val v2 = quantize(q, spec.u(sb, gr * 3 + 2))
              if (q.grouped)
                w.put(v0 + q.nlevels * v1 + q.nlevels * q.nlevels * v2, q.bits)
              else {
                w.put(v0, q.nb); w.put(v1, q.nb); w.put(v2, q.nb)
              }
            }
            ch += 1
          }
          sb += 1
        }
        gr += 1
      }
      require(w.bitPos <= op.frameBytes * 8,
        s"frame overflow: ${w.bitPos} bits > ${op.frameBytes * 8}")
      out.write(w.buf) // zero ancillary padding
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // decode
  // -------------------------------------------------------------------

  /** One decoded frame. NOTE on `pcm` (travels with the data — ADVICE
    * r14): it is synthesized through the COMPUTED stand-in window, not
    * Table 3-B.3, so the values are NOT bit/value-compatible with a
    * conforming MP2 decoder and must never feed a gated/exported column
    * as "real decoded audio" — only window-independent invariants
    * (periodicity, linearity, the analysis∘synthesis PR bound) are
    * gateable. All other fields are bit-exact normative decode output.
    */
  final case class Mp2Frame(
      allocNlevels: Array[Int], // 0 = silent, per subband
      sfIdx: Array[Array[Int]], // [sb][part 0..2], -1 when silent
      codes: Array[Array[Int]], // [sb][t 0..35], -1 when silent
      subband: Array[Array[Double]], // requant·sf, 0.0 when silent
      pcm: Array[Double]) // 1152 samples via the stand-in window — see above

  /** frames(frameIdx)(ch) — one [[Mp2Frame]] per channel per frame. */
  final case class Mp2Stream(sampleRate: Int, bitrateKbps: Int,
      channels: Int, frames: Vector[Vector[Mp2Frame]])

  /** Decode a contiguous stream of frames at either accepted operating
    * point (detected from the first header; all frames must match);
    * None for anything else (sync loss, other layers/rates/modes, CRC,
    * padding, truncation). Synthesis FIFO state persists ACROSS frames
    * per channel, as the normative decoder's does.
    */
  def decode(bytes: Array[Byte]): Option[Mp2Stream] = {
    try {
      if (bytes.length < 4) return None
      // operating point from the first header's (bitrate, fs, mode)
      val h = new BitReader(bytes, 0)
      if (h.get(12) != 0xfff) return None
      h.get(4) // ID/layer/protection re-checked per frame below
      val bi = h.get(4); val fs = h.get(2)
      h.get(2) // padding + private
      val mode = h.get(2)
      val op =
        if (bi == OpMono48.bitrateIndex && fs == OpMono48.fsCode &&
          mode == OpMono48.modeCode) OpMono48
        else if (bi == OpStereo32.bitrateIndex && fs == OpStereo32.fsCode &&
          mode == OpStereo32.modeCode) OpStereo32
        else return None
      if (bytes.length % op.frameBytes != 0) return None
      val synth = Array.fill(op.channels)(new Synth)
      val frames = Vector.newBuilder[Vector[Mp2Frame]]
      var off = 0
      while (off < bytes.length) {
        val r = new BitReader(bytes, off)
        if (r.get(12) != 0xfff) return None
        if (r.get(1) != 1) return None // ID: MPEG-1
        if (r.get(2) != 2) return None // layer II
        if (r.get(1) != 1) return None // no CRC
        if (r.get(4) != op.bitrateIndex) return None
        if (r.get(2) != op.fsCode) return None
        // padding_bit must be 0: the fixed frame stride assumes it
        // (a conforming padded stream would mis-frame — ADVICE r14)
        if (r.get(1) != 0) return None
        r.get(1) // private
        if (r.get(2) != op.modeCode) return None
        r.get(6) // mode_ext, copyright, original, emphasis
        val nch = op.channels
        val sbl = op.sblimit
        val nlev = Array.ofDim[Int](nch, sbl)
        var sb = 0
        while (sb < sbl) {
          val (row, nbal) = allocRow(sb)
          var ch = 0
          while (ch < nch) {
            nlev(ch)(sb) = row(r.get(nbal))
            ch += 1
          }
          sb += 1
        }
        val scfsi = Array.ofDim[Int](nch, sbl)
        sb = 0
        while (sb < sbl) {
          var ch = 0
          while (ch < nch) {
            if (nlev(ch)(sb) != 0) scfsi(ch)(sb) = r.get(2)
            ch += 1
          }
          sb += 1
        }
        val sf = Array.fill(nch, sbl)(Array(-1, -1, -1))
        sb = 0
        while (sb < sbl) {
          var ch = 0
          while (ch < nch) {
            if (nlev(ch)(sb) != 0) scfsi(ch)(sb) match {
              case 0 =>
                sf(ch)(sb) = Array(r.get(6), r.get(6), r.get(6))
              case 1 =>
                val a = r.get(6); val b = r.get(6)
                sf(ch)(sb) = Array(a, a, b) // first covers parts 0+1
              case 2 =>
                val a = r.get(6)
                sf(ch)(sb) = Array(a, a, a)
              case 3 =>
                val a = r.get(6); val b = r.get(6)
                sf(ch)(sb) = Array(a, b, b) // second covers parts 1+2
            }
            ch += 1
          }
          sb += 1
        }
        val codes = Array.fill(nch, sbl)(Array.fill(36)(-1))
        val sub = Array.fill(nch, 32)(new Array[Double](36))
        var gr = 0
        while (gr < 12) {
          sb = 0
          while (sb < sbl) {
            var ch = 0
            while (ch < nch) {
              if (nlev(ch)(sb) != 0) {
                val q = quantClass(nlev(ch)(sb))
                val t0 = gr * 3
                val part = t0 / 12
                val factor = scaleFactor(sf(ch)(sb)(part))
                if (q.grouped) {
                  val c = r.get(q.bits)
                  var j = 0
                  var rest = c
                  while (j < 3) {
                    val v = rest % q.nlevels
                    rest /= q.nlevels
                    codes(ch)(sb)(t0 + j) = v
                    sub(ch)(sb)(t0 + j) = requant(q, v) * factor
                    j += 1
                  }
                } else {
                  var j = 0
                  while (j < 3) {
                    val v = r.get(q.nb)
                    codes(ch)(sb)(t0 + j) = v
                    sub(ch)(sb)(t0 + j) = requant(q, v) * factor
                    j += 1
                  }
                }
              }
              ch += 1
            }
            sb += 1
          }
          gr += 1
        }
        if (r.bitPos > (off + op.frameBytes) * 8) return None
        // synthesis per channel: 36 filterbank steps of 32 samples each
        val chFrames = Vector.newBuilder[Mp2Frame]
        var ch = 0
        while (ch < nch) {
          val pcm = new Array[Double](SamplesPerFrame)
          var t = 0
          while (t < 36) {
            val s = new Array[Double](32)
            sb = 0
            while (sb < 32) { s(sb) = sub(ch)(sb)(t); sb += 1 }
            synth(ch).step(s, pcm, t * 32)
            t += 1
          }
          chFrames += Mp2Frame(nlev(ch), sf(ch), codes(ch), sub(ch), pcm)
          ch += 1
        }
        frames += chFrames.result()
        off += op.frameBytes
      }
      Some(Mp2Stream(op.sampleRate, op.bitrateKbps, op.channels,
        frames.result()))
    } catch { case _: Exception => None }
  }

  /** Sign pattern that the normative C/D tables CARRY IN THEIR VALUES,
    * here DERIVED instead of transcribed (same policy as the B.4
    * constants): with the normative π/64 matrixing and U re-index, the
    * effective synthesis filter at tap m = 32b+j is
    * (−1)^⌊m/64⌋ · cos((m+16)(2k+1)π/64) · |window|, because moving the
    * modulation's 32b phase into the 64-entry V block leaves a
    * (2k+1)π·⌊b/2⌋ residue — k-independent, sign-only, flipping every
    * 64 taps. Folding σ(m) = (−1)^⌊m/64⌋ into the window makes the
    * plain positive prototype [[Window]] a true oddly-stacked
    * pseudo-QMF pair with [[Analysis]] (analysis∘synthesis ≈ delayed
    * identity — the r15 PR gate, q310).
    */
  @inline private def blockSign(b: Int): Double = if ((b & 2) == 0) 1.0 else -1.0

  /** Normative synthesis filterbank structure (§2.4.3.2.2): 64-point
    * matrixing N[i][k] = cos((16+i)(2k+1)π/64), 1024-sample V FIFO, U
    * re-index (even half-block: entry j; odd: entry 32+j — the flat
    * form of the normative 128-stride table), derived block sign, and
    * the windowed 16-fold sum. One instance per channel per stream;
    * state persists across frames. (r15 fix: the matrixing previously
    * used π/32, which collapses bands k and 31−k onto one center
    * frequency — every gated invariant was window-independent and
    * unaffected, but perfect reconstruction was impossible; the PR
    * gate now pins the corrected structure end-to-end.)
    */
  final class Synth {
    private val v = new Array[Double](1024)
    private val n = Array.tabulate(64, 32)((i, k) =>
      math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0))

    def step(s: Array[Double], out: Array[Double], outOff: Int): Unit = {
      // shift FIFO by 64
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var acc = 0.0
        var k = 0
        while (k < 32) { acc += n(i)(k) * s(k); k += 1 }
        v(i) = acc
        i += 1
      }
      // U + derived sign + window, 16-fold sum per output sample
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var b = 0
        while (b < 16) {
          val u = if ((b & 1) == 0) v(b * 64 + j) else v(b * 64 + 32 + j)
          acc += blockSign(b) * u * Window(b * 32 + j)
          b += 1
        }
        out(outOff + j) = acc
        j += 1
      }
    }
  }

  /** Construction-inverse ANALYSIS filterbank (VERDICT r14 item 3) —
    * the adjoint of [[Synth]] built from the SAME computed prototype:
    * 512-sample X FIFO, windowed partials Z[i] = σ(i)·(W[i]/32)·X[i]
    * (σ derived, see [[blockSign]] — the analysis fold over j needs
    * (−1)^j exactly as the normative C table's signs provide), Y[k] =
    * Σ_{j<8} Z[k+64j], and M[sb][k] = cos((2sb+1)(k−16)π/64)
    * matrixing. analysis∘synthesis reconstructs the input delayed by
    * [[prDelay]] within [[PrBound]] — measured, pinned, and gated by
    * q310 + Mp2Spec.
    */
  final class Analysis {
    private val x = new Array[Double](512) // x(0) = newest sample
    private val m = Array.tabulate(32, 64)((sb, k) =>
      math.cos((2 * sb + 1) * (k - 16) * math.Pi / 64.0))

    /** Consume 32 input samples (oldest-first), emit 32 subband samples. */
    def step(in: Array[Double]): Array[Double] = {
      System.arraycopy(x, 0, x, 32, 480)
      var i = 0
      while (i < 32) { x(i) = in(31 - i); i += 1 }
      val y = new Array[Double](64)
      var k = 0
      while (k < 64) {
        var acc = 0.0
        var j = 0
        while (j < 8) {
          val idx = k + 64 * j
          acc += blockSign(2 * j) * (Window(idx) / 32.0) * x(idx)
          j += 1
        }
        y(k) = acc
        k += 1
      }
      val s = new Array[Double](32)
      var sb = 0
      while (sb < 32) {
        var acc = 0.0
        k = 0
        while (k < 64) { acc += m(sb)(k) * y(k); k += 1 }
        s(sb) = acc
        sb += 1
      }
      s
    }
  }

  /** Run `input` (length a multiple of 32) through analysis∘synthesis;
    * returns the reconstructed signal (same length).
    */
  def analysisSynthesis(input: Array[Double]): Array[Double] = {
    require(input.length % 32 == 0)
    val a = new Analysis
    val s = new Synth
    val out = new Array[Double](input.length)
    var off = 0
    while (off < input.length) {
      val block = java.util.Arrays.copyOfRange(input, off, off + 32)
      s.step(a.step(block), out, off)
      off += 32
    }
    out
  }

  /** (delay, gain) of the analysis∘synthesis chain, DERIVED by running
    * a unit impulse through it (no magic constants): the peak position
    * and value of the end-to-end impulse response. For this 512-tap
    * linear-phase pair the delay lands at 481 samples — pinned in
    * Mp2Spec, re-derived here at class-load.
    */
  lazy val (prDelay, prGain): (Int, Double) = {
    val n = 2048
    val imp = new Array[Double](n)
    imp(64) = 1.0
    val out = analysisSynthesis(imp)
    var best = 0
    var i = 0
    while (i < n) { if (math.abs(out(i)) > math.abs(out(best))) best = i; i += 1 }
    (best - 64, out(best))
  }

  /** Max |reconstruction − gain·delayed-input| / max|input| over the
    * steady region for an arbitrary probe — the PR error the q310 gate
    * bounds by [[PrBound]].
    */
  def prError(probe: Array[Double]): Double = {
    val out = analysisSynthesis(probe)
    val peak = probe.map(math.abs).max
    if (peak == 0.0) return 0.0
    var worst = 0.0
    var t = prDelay
    while (t < probe.length) {
      // normalize the chain's fixed gain out, then compare shapes
      val e = math.abs(out(t) / prGain - probe(t - prDelay))
      if (e > worst) worst = e
      t += 1
    }
    worst / peak
  }

  /** Pinned relative PR bound for the computed prototype (measured
    * worst case over the spec's probe family is well under this;
    * near-PR, not bit-PR — the windowed-sinc prototype is not the
    * normative table, and pseudo-QMF cancels only adjacent-band
    * aliasing exactly).
    */
  val PrBound: Double = 0.05

  /** 512-tap synthesis window — the documented COMPUTED stand-in for
    * Table 3-B.3 (see the object scaladoc), r15 upgraded from a plain
    * Blackman-sinc to a genuinely near-PR pseudo-QMF prototype: a
    * Kaiser(β=9)-windowed sinc whose cutoff is GRID-OPTIMIZED at class
    * load to flatten the power-complementarity condition
    * A²(ω) + A²(π/32 − ω) over the band edge — the standard
    * single-parameter pseudo-QMF design (fully DERIVED, still nothing
    * transcribed). Scaled to the normative table's magnitude regime
    * (32×) and quantized to multiples of 2^-16 exactly like the
    * normative values. Every q302-gated invariant is
    * window-INDEPENDENT; the q310 PR gate bounds analysis∘synthesis
    * error through [[Analysis]]/[[Synth]] built on this prototype.
    */
  val Window: Array[Double] = {
    def i0(x: Double): Double = { // modified Bessel I0 (series)
      var sum = 1.0; var term = 1.0; var k = 1
      while (k < 60) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k)); sum += term; k += 1
      }
      sum
    }
    val beta = 14.0
    val i0b = i0(beta)
    // unnormalized Kaiser-sinc prototype at cutoff wc
    def proto(wc: Double): Array[Double] = Array.tabulate(512) { i =>
      val x = i - 255.5 // never 0
      val sinc = math.sin(wc * x) / (math.Pi * x)
      val r = x / 256.0 // |r| < 1
      sinc * i0(beta * math.sqrt(1.0 - r * r)) / i0b
    }
    // linear phase: amplitude A(w) = sum h[i] cos(w (i - 255.5))
    def amp(h: Array[Double], w: Double): Double = {
      var a = 0.0
      var i = 0
      while (i < 512) { a += h(i) * math.cos(w * (i - 255.5)); i += 1 }
      a
    }
    // flatness of the power-complementarity sum across the band edge
    def dev(h: Array[Double]): Double = {
      val edge = math.Pi / 32.0
      var lo = Double.MaxValue; var hi = 0.0
      var m = 0
      while (m <= 32) {
        val w = edge * m / 32.0
        val f = math.pow(amp(h, w), 2) + math.pow(amp(h, edge - w), 2)
        if (f < lo) lo = f
        if (f > hi) hi = f
        m += 1
      }
      hi / lo - 1.0
    }
    // Spectral square root: a windowed sinc's amplitude response is
    // (approximately) AMPLITUDE-complementary across the band edge —
    // P(ω) + P(π/32 − ω) ≈ 1 (point-symmetric transition) — but
    // pseudo-QMF needs POWER complementarity, H² + H̄² ≈ 1. So take
    // H(ω) = sqrt(P(ω)) on a dense grid and invert with linear phase
    // centered at 255.5. Cutoff is then grid-tuned to minimize the
    // measured power ripple. All derived — no transcription anywhere.
    val N = 4096
    def sqrtDesign(wc: Double): Array[Double] = {
      val p = proto(wc)
      val pg = amp(p, 0.0)
      val q = Array.tabulate(N / 2 + 1) { m =>
        val pw = amp(p, math.Pi * m / (N / 2)) / pg
        math.sqrt(math.max(0.0, pw))
      }
      Array.tabulate(512) { n =>
        val x = n - 255.5
        var acc = q(0)
        var m = 1
        while (m < N / 2) {
          acc += 2.0 * q(m) * math.cos(math.Pi * m * x / (N / 2))
          m += 1
        }
        acc += q(N / 2) * math.cos(math.Pi * x)
        acc / N
      }
    }
    // cutoff search on the CHEAP objective: flatness of the base
    // prototype's amplitude sum P(ω) + P(π/32−ω) — identical to the
    // sqrt design's power complementarity (H = √P), so the expensive
    // sqrtDesign runs exactly once, at the winner (r15 review: the
    // per-candidate sqrtDesign scan cost seconds of class-load time)
    def devAmp(pr: Array[Double]): Double = {
      val pg = amp(pr, 0.0)
      val edge = math.Pi / 32.0
      var lo0 = Double.MaxValue; var hi0 = -Double.MaxValue
      var m = 0
      while (m <= 32) {
        val w = edge * m / 32.0
        val f = (amp(pr, w) + amp(pr, edge - w)) / pg
        if (f < lo0) lo0 = f
        if (f > hi0) hi0 = f
        m += 1
      }
      hi0 / lo0 - 1.0
    }
    var lo = 0.7 * math.Pi / 64.0
    var hi = 1.3 * math.Pi / 64.0
    var bestW = lo
    var bestDev = Double.MaxValue
    // distortion is steeply sensitive to the cutoff (a 1% offset costs
    // percent-level ripple), so zoom four times
    var round = 0
    while (round < 4) {
      var s = 0
      while (s <= 12) {
        val wc = lo + (hi - lo) * s / 12.0
        val d = devAmp(proto(wc))
        if (d < bestDev) { bestDev = d; bestW = wc }
        s += 1
      }
      val span = (hi - lo) / 8.0
      lo = bestW - span; hi = bestW + span
      round += 1
    }
    val h = sqrtDesign(bestW)
    val g = amp(h, 0.0) // normalize DC amplitude to 1 before the 32x scale
    h.map(v => math.rint(v / g * 32.0 * 65536.0) / 65536.0)
  }
}
