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
  *    Annex A figure: 64-point matrixing N[i][k] = cos((16+i)(2k+1)π/32),
  *    1024-sample V FIFO, U/W re-index, 512-tap window, 16-fold sum per
  *    32 output samples). The 512 window COEFFICIENTS of Table 3-B.3 are
  *    the one normative table this zero-egress build does not transcribe:
  *    recalling 512 sixteen-bit fractions from memory risks exactly the
  *    silent-drift class the r13 video review caught in the quantizer
  *    matrices. The window used is a COMPUTED near-perfect-reconstruction
  *    pseudo-QMF prototype (windowed sinc, cutoff π/64, Blackman taper),
  *    quantized to multiples of 2^-16 like the normative values. The
  *    q302 gate therefore certifies the full BIT-LEVEL decode chain
  *    (header → allocation → scfsi → scale factors → codes → requant)
  *    bit-exactly against an independent SQL re-derivation, and pins the
  *    synthesis structure with window-independent invariants (exact
  *    period-32 steady state under constant subband input; linearity);
  *    absolute PCM sample values are window-dependent and are NOT gated.
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

  /** Table B.2a level alphabets. Index 0 = no allocation. */
  private val rowA: Array[Int] = Array(0, 3, 7, 15, 31, 63, 127, 255, 511,
    1023, 2047, 4095, 8191, 16383, 32767, 65535) // sb 0-2, nbal 4
  private val rowB: Array[Int] = Array(0, 3, 5, 7, 9, 15, 31, 63, 127, 255,
    511, 1023, 2047, 4095, 8191, 65535) // sb 3-10, nbal 4
  private val rowC: Array[Int] = Array(0, 3, 5, 7, 9, 15, 31, 65535) // 11-22, nbal 3
  private val rowD: Array[Int] = Array(0, 3, 5, 65535) // sb 23-26, nbal 2

  /** (allowed nlevels, nbal bits) for each of the 27 subbands. */
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

  /** Encode `specs` as a contiguous Layer II stream (one 576-byte frame
    * each) at the fixed operating point.
    */
  def encode(specs: Seq[FrameSpec]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    specs.foreach { spec =>
      val w = new BitWriter(FrameBytes)
      // header: FFF | ID=1 | layer '10' | protection 1 (no CRC)
      w.put(0xfff, 12); w.put(1, 1); w.put(2, 2); w.put(1, 1)
      // bitrate 192k = index 10 | fs 48k = '01' | padding 0 | private 0
      w.put(BitrateIndex, 4); w.put(FsCode, 2); w.put(0, 1); w.put(0, 1)
      // mode single_channel '11' | mode_ext | copyright | original | emph
      w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)
      // bit allocation
      var sb = 0
      while (sb < Sblimit) {
        val (_, nbal) = allocRow(sb)
        w.put(spec.allocIdx(sb), nbal)
        sb += 1
      }
      // scfsi for allocated subbands
      sb = 0
      while (sb < Sblimit) {
        if (spec.allocIdx(sb) != 0) w.put(spec.scfsi(sb), 2)
        sb += 1
      }
      // scale factors: same index for every transmitted part (the scfsi
      // pattern then only changes the BIT layout, not the decode result)
      sb = 0
      while (sb < Sblimit) {
        if (spec.allocIdx(sb) != 0) {
          val n = spec.scfsi(sb) match {
            case 0 => 3
            case 2 => 1
            case _ => 2
          }
          var k = 0
          while (k < n) { w.put(spec.sfIdx(sb), 6); k += 1 }
        }
        sb += 1
      }
      // samples: 12 granules × 3 samples per allocated subband
      var gr = 0
      while (gr < 12) {
        sb = 0
        while (sb < Sblimit) {
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
          sb += 1
        }
        gr += 1
      }
      require(w.bitPos <= FrameBytes * 8,
        s"frame overflow: ${w.bitPos} bits > ${FrameBytes * 8}")
      out.write(w.buf) // zero ancillary padding up to 360 bytes
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

  final case class Mp2Stream(sampleRate: Int, bitrateKbps: Int,
      frames: Vector[Mp2Frame])

  /** Decode a contiguous stream of frames at the fixed operating point;
    * None for anything else (sync loss, other layers/rates/modes, CRC,
    * truncation). Synthesis FIFO state persists ACROSS frames, as the
    * normative decoder's does.
    */
  def decode(bytes: Array[Byte]): Option[Mp2Stream] = {
    try {
      if (bytes.length == 0 || bytes.length % FrameBytes != 0) return None
      val synth = new Synth
      val frames = Vector.newBuilder[Mp2Frame]
      var off = 0
      while (off < bytes.length) {
        val r = new BitReader(bytes, off)
        if (r.get(12) != 0xfff) return None
        if (r.get(1) != 1) return None // ID: MPEG-1
        if (r.get(2) != 2) return None // layer II
        if (r.get(1) != 1) return None // no CRC
        if (r.get(4) != BitrateIndex) return None // 192 kbit/s
        if (r.get(2) != FsCode) return None // 48 kHz
        // padding_bit must be 0: the fixed 576-byte stride assumes it
        // (a conforming padded stream would mis-frame — ADVICE r14)
        if (r.get(1) != 0) return None
        r.get(1) // private
        if (r.get(2) != 3) return None // single channel
        r.get(6) // mode_ext, copyright, original, emphasis
        val nlev = new Array[Int](Sblimit)
        var sb = 0
        while (sb < Sblimit) {
          val (row, nbal) = allocRow(sb)
          val idx = r.get(nbal)
          nlev(sb) = row(idx)
          sb += 1
        }
        val scfsi = new Array[Int](Sblimit)
        sb = 0
        while (sb < Sblimit) {
          if (nlev(sb) != 0) scfsi(sb) = r.get(2)
          sb += 1
        }
        val sf = Array.fill(Sblimit)(Array(-1, -1, -1))
        sb = 0
        while (sb < Sblimit) {
          if (nlev(sb) != 0) scfsi(sb) match {
            case 0 =>
              sf(sb) = Array(r.get(6), r.get(6), r.get(6))
            case 1 =>
              val a = r.get(6); val b = r.get(6)
              sf(sb) = Array(a, a, b) // first covers parts 0+1
            case 2 =>
              val a = r.get(6)
              sf(sb) = Array(a, a, a)
            case 3 =>
              val a = r.get(6); val b = r.get(6)
              sf(sb) = Array(a, b, b) // second covers parts 1+2
          }
          sb += 1
        }
        val codes = Array.fill(Sblimit)(Array.fill(36)(-1))
        val sub = Array.fill(32)(new Array[Double](36))
        var gr = 0
        while (gr < 12) {
          sb = 0
          while (sb < Sblimit) {
            if (nlev(sb) != 0) {
              val q = quantClass(nlev(sb))
              val t0 = gr * 3
              val part = t0 / 12
              val factor = scaleFactor(sf(sb)(part))
              if (q.grouped) {
                val c = r.get(q.bits)
                var j = 0
                var rest = c
                while (j < 3) {
                  val v = rest % q.nlevels
                  rest /= q.nlevels
                  codes(sb)(t0 + j) = v
                  sub(sb)(t0 + j) = requant(q, v) * factor
                  j += 1
                }
              } else {
                var j = 0
                while (j < 3) {
                  val v = r.get(q.nb)
                  codes(sb)(t0 + j) = v
                  sub(sb)(t0 + j) = requant(q, v) * factor
                  j += 1
                }
              }
            }
            sb += 1
          }
          gr += 1
        }
        if (r.bitPos > (off + FrameBytes) * 8) return None
        // synthesis: 36 filterbank steps of 32 samples each
        val pcm = new Array[Double](SamplesPerFrame)
        var t = 0
        while (t < 36) {
          val s = new Array[Double](32)
          sb = 0
          while (sb < 32) { s(sb) = sub(sb)(t); sb += 1 }
          synth.step(s, pcm, t * 32)
          t += 1
        }
        frames += Mp2Frame(nlev, sf, codes, sub, pcm)
        off += FrameBytes
      }
      Some(Mp2Stream(SampleRate, BitrateKbps, frames.result()))
    } catch { case _: Exception => None }
  }

  /** Normative synthesis filterbank structure (§2.4.3.2.2): matrixing,
    * 1024-sample V FIFO, U/W re-index, windowed 16-fold sum. One instance
    * per stream; state persists across frames.
    */
  final class Synth {
    private val v = new Array[Double](1024)
    // 64×32 matrixing table N[i][k] = cos((16+i)(2k+1)π/32)
    private val n = Array.tabulate(64, 32)((i, k) =>
      math.cos((16 + i) * (2 * k + 1) * math.Pi / 32.0))

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
      // build U (512), window, and 16-fold sum per output sample
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var b = 0
        while (b < 16) {
          // U[b*32 + j] per the normative re-index:
          //   even b: V[b*64 + j]; odd b: V[b*64 + 32 + j]
          val u = if ((b & 1) == 0) v(b * 64 + j) else v(b * 64 + 32 + j)
          acc += u * Window(b * 32 + j)
          b += 1
        }
        out(outOff + j) = acc
        j += 1
      }
    }
  }

  /** 512-tap synthesis window — the documented COMPUTED stand-in for
    * Table 3-B.3 (see the object scaladoc): near-PR pseudo-QMF prototype,
    * windowed sinc with cutoff π/64 under a Blackman taper, scaled to the
    * normative table's magnitude regime and quantized to multiples of
    * 2^-16 exactly like the normative values. Every gated invariant is
    * window-INDEPENDENT; swapping in the normative table changes PCM
    * values but no gated column.
    */
  val Window: Array[Double] = Array.tabulate(512) { i =>
    val x = i - 255.5
    val a = math.Pi * x / 64.0
    val sinc = math.sin(a) / a // x is never 0 (255.5 offset)
    val t = 2.0 * math.Pi * i / 511.0
    val taper = 0.42 - 0.5 * math.cos(t) + 0.08 * math.cos(2.0 * t)
    math.rint(sinc * taper * 32.0 * 65536.0) / 65536.0
  }
}
