package graft.operators

/** MPEG-1 Part 2 (ISO/IEC 11172-2) VIDEO — intra-coded (I) pictures,
  * decoded for real from the entropy-coded elementary stream: start-code
  * walking, DC-size and AC run/level Huffman VLC tables (incl. the
  * 6-bit-run escape form), DC prediction per component with per-slice
  * reset, intra dequantization with the spec's oddification + clamp,
  * inverse zigzag, and a separable double-precision 2-D IDCT. This is the
  * work StubCodec's "entropy-coded elementary streams" claim deferred
  * (VERDICT r12 item 1) — the same hand-built class as the q156 inflate
  * and q158 LZW decoders, for video. Everything here derives from the
  * public standard's normative decoding process; the encoder exists as
  * the construction-inverse for the q287 gate (known macroblocks in,
  * bounded per-pixel error out) exactly like q157/q272's JPEG path.
  *
  * Scope: I-, P- AND B-pictures with 4:2:0 chroma. P-pictures decode the
  * full forward-prediction machinery — the P macroblock-type alphabet
  * (MC±coded, intra refresh, quant variants), differential motion
  * vectors (Table B.4 subset + per-spec predictor resets at slice
  * start / after intra / after skipped), FULL- and HALF-pel luma +
  * chroma prediction, skipped-macroblock copy via address increments,
  * coded-block-pattern dispatch, and NON-intra dequantization
  * ((2L + sign)·q·16/16 with oddification) with the dct_coeff_first
  * alphabet for a coded block's first coefficient. B-pictures add the
  * Table B.2c macroblock-type alphabet (forward / backward /
  * interpolated, ± coded, quant variants and intra), a SECOND
  * backward-vector pipeline predicting from the FUTURE anchor with its
  * own differential predictors, rounded two-direction interpolation
  * ((fwd + bwd + 1) >> 1 after per-direction half-pel), B-skip
  * semantics (a skipped B macroblock repeats the PREVIOUS macroblock's
  * prediction direction and vectors and leaves the vector predictors
  * untouched — the opposite of P's reset-to-zero), and the
  * transmission-vs-display reorder: anchors are transmitted BEFORE the
  * B-pictures that precede them in display order, and the decoder
  * restores display order from temporal_reference. Only the
  * H.264/H.265 successors remain StubCodec's documented fallback.
  */
object Mpeg1 {

  // ---------------------------------------------------------------- tables

  /** Default intra quantizer matrix (raster order), ISO/IEC 11172-2
    * §2.4.3.1 — cross-checked against the public reference decoders'
    * copies of the normative table (r13 review caught ~10 drifted
    * mid-band values that the construction-inverse gates couldn't see
    * because encoder and decoder shared them).
    */
  private val IntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** Zigzag scan: raster position -> scan index (§2.4.4.1). */
  private val ZigzagOf: Array[Int] = Array(
    0, 1, 5, 6, 14, 15, 27, 28,
    2, 4, 7, 13, 16, 26, 29, 42,
    3, 8, 12, 17, 25, 30, 41, 43,
    9, 11, 18, 24, 31, 40, 44, 53,
    10, 19, 23, 32, 39, 45, 52, 54,
    20, 22, 33, 38, 46, 51, 55, 60,
    21, 34, 37, 47, 50, 56, 59, 61,
    35, 36, 48, 49, 57, 58, 62, 63)

  /** scan index -> raster position. */
  private val RasterOf: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(ZigzagOf(i)) = i; i += 1 }
    inv
  }

  /** dct_dc_size_luminance (Table B.1): (code, bits) indexed by size 0..8. */
  private val DcLumaCodes: Array[(Int, Int)] = Array(
    (0x4, 3), (0x0, 2), (0x1, 2), (0x5, 3), (0x6, 3),
    (0xe, 4), (0x1e, 5), (0x3e, 6), (0x7e, 7))

  /** dct_dc_size_chrominance (Table B.2). */
  private val DcChromaCodes: Array[(Int, Int)] = Array(
    (0x0, 2), (0x1, 2), (0x2, 2), (0x6, 3), (0xe, 4),
    (0x1e, 5), (0x3e, 6), (0x7e, 7), (0xfe, 8))

  /** AC run/level VLC (Table B.5b subset, sign bit excluded): the codes a
    * conformant decoder must recognize for the runs/levels this engine's
    * encoder can emit from table lookup; every other pair goes through the
    * normative 6-bit escape, which both sides also implement. Each entry:
    * (run, level, code, bits) in the dct_coeff_NEXT alphabet ((0,1) is
    * '11') — INTRA blocks code their DC separately and use dct_coeff_next
    * for every AC coefficient, so the dct_coeff_first alphabet (a
    * non-intra construct) never appears in an I-only stream and EOB '10'
    * is unambiguous even for a DC-only block.
    */
  private val AcCodes: Array[(Int, Int, Int, Int)] = Array(
    (0, 1, 0x3, 2), (0, 2, 0x4, 4), (0, 3, 0x5, 5), (0, 4, 0x6, 7),
    (0, 5, 0x26, 8), (0, 6, 0x21, 8), (0, 7, 0xa, 10), (0, 8, 0x1d, 12),
    (0, 9, 0x18, 12), (0, 10, 0x13, 12), (0, 11, 0x10, 12),
    (0, 12, 0x1a, 13), (0, 13, 0x19, 13), (0, 14, 0x18, 13), (0, 15, 0x17, 13),
    (1, 1, 0x3, 3), (1, 2, 0x6, 6), (1, 3, 0x25, 8), (1, 4, 0xc, 10),
    (1, 5, 0x1b, 12), (1, 6, 0x16, 13), (1, 7, 0x15, 13),
    (2, 1, 0x5, 4), (2, 2, 0x4, 7), (2, 3, 0xb, 10), (2, 4, 0x14, 12),
    (2, 5, 0x14, 13),
    (3, 1, 0x7, 5), (3, 2, 0x24, 8), (3, 3, 0x1c, 12), (3, 4, 0x13, 13),
    (4, 1, 0x6, 5), (4, 2, 0xf, 10), (4, 3, 0x12, 12),
    (5, 1, 0x7, 6), (5, 2, 0x9, 10), (5, 3, 0x12, 13),
    (6, 1, 0x5, 6), (6, 2, 0x1e, 12),
    (7, 1, 0x4, 6), (7, 2, 0x15, 12),
    (8, 1, 0x7, 7), (8, 2, 0x11, 12),
    (9, 1, 0x5, 7), (9, 2, 0x11, 13),
    (10, 1, 0x27, 8), (10, 2, 0x10, 13),
    (11, 1, 0x23, 8), (12, 1, 0x22, 8), (13, 1, 0x20, 8),
    (14, 1, 0xe, 10), (15, 1, 0xd, 10), (16, 1, 0x8, 10))

  private val AcByRunLevel: Map[(Int, Int), (Int, Int)] =
    AcCodes.map(e => (e._1, e._2) -> (e._3, e._4)).toMap

  /** macroblock_address_increment VLC (Table B.1), increments 1..8 — the
    * range our encoder's skip runs use; stuffing and the +33 escape are
    * handled in the reader. (code, bits) indexed by increment-1.
    */
  private val MbaCodes: Array[(Int, Int)] = Array(
    (0x1, 1), (0x3, 3), (0x2, 3), (0x3, 4), (0x2, 4), (0x3, 5), (0x2, 5),
    (0x7, 7))

  /** motion_code VLC (Table B.4) as (prefix, bits) for |code| 1..7; a sign
    * bit follows (1 = negative). |code| 0 is the lone '1'.
    */
  private val MotionPrefix: Array[(Int, Int)] = Array(
    (0x1, 2), (0x1, 3), (0x1, 4), (0x3, 6), (0x5, 7), (0x4, 7), (0x3, 7))

  /** coded_block_pattern VLC (Table B.3 subset): the single-plane patterns
    * our encoder can emit (all-luma and each lone block). (cbp, code, bits).
    */
  private val CbpCodes: Array[(Int, Int, Int)] = Array(
    (60, 0x7, 3), (4, 0xd, 4), (8, 0xc, 4), (16, 0xb, 4), (32, 0xa, 4))

  /** P-picture macroblock_type VLC (Table B.2b):
    * (code, bits, quant, motionForward, pattern, intra). The quant rows
    * follow the normative assignment — '00010' is quant+MC+coded and
    * '00001' is quant+coded-no-MC (r13 review: an earlier draft swapped
    * them, which a conformant external stream would hit as a bitstream
    * desync; the construction-inverse gates never emit quant types, so
    * only a table audit can catch this class of drift).
    */
  private val PMbTypes: Array[(Int, Int, Boolean, Boolean, Boolean, Boolean)] =
    Array(
      (0x1, 1, false, true, true, false),   // pred-mc, coded
      (0x1, 2, false, false, true, false),  // pred (MV 0), coded
      (0x1, 3, false, true, false, false),  // pred-mc, not coded
      (0x3, 5, false, false, false, true),  // intra
      (0x2, 5, true, true, true, false),    // quant + mc + coded
      (0x1, 5, true, false, true, false),   // quant + coded (no MC)
      (0x1, 6, true, false, false, true))   // quant + intra

  /** B-picture macroblock_type VLC (Table B.2c):
    * (code, bits, quant, motionForward, motionBackward, pattern, intra).
    * '10'/'11' are the interpolated (both-direction) rows, '01x' backward,
    * '001x' forward, '00011' intra; the quant rows mirror the P table's
    * normative layout (interp, then forward, then backward, then intra at
    * six bits).
    */
  private val BMbTypes: Array[(Int, Int, Boolean, Boolean, Boolean, Boolean, Boolean)] =
    Array(
      (0x2, 2, false, true, true, false, false),   // interp, not coded
      (0x3, 2, false, true, true, true, false),    // interp, coded
      (0x2, 3, false, false, true, false, false),  // backward, not coded
      (0x3, 3, false, false, true, true, false),   // backward, coded
      (0x2, 4, false, true, false, false, false),  // forward, not coded
      (0x3, 4, false, true, false, true, false),   // forward, coded
      (0x3, 5, false, false, false, false, true),  // intra
      (0x2, 5, true, true, true, true, false),     // quant + interp + coded
      (0x3, 6, true, true, false, true, false),    // quant + forward + coded
      (0x2, 6, true, false, true, true, false),    // quant + backward + coded
      (0x1, 6, true, false, false, false, true))   // quant + intra

  // ------------------------------------------------------------- bit I/O

  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def put(value: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 32 && (bits == 0 || (value >> bits) == 0),
        s"bad bitfield value=$value bits=$bits")
      var b = bits
      acc = (acc << b) | value
      nAcc += b
      while (nAcc >= 8) {
        buf.write(((acc >> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
      b = 0
    }
    /** zero-pad to a byte boundary (before every start code). */
    def align(): Unit = if (nAcc > 0) put(0L, 8 - nAcc)
    def startCode(code: Int): Unit = { align(); put(0x000001L, 24); put(code.toLong, 8) }
    def bytes(): Array[Byte] = { align(); buf.toByteArray }
  }

  final class BitReader(val data: Array[Byte]) {
    var pos = 0 // bit position
    def remaining: Int = data.length * 8 - pos
    def read(bits: Int): Int = {
      require(bits <= remaining, s"bitstream underrun: want $bits have $remaining")
      var v = 0
      var i = 0
      while (i < bits) {
        val byte = data(pos >> 3) & 0xff
        v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def peek(bits: Int): Int = { val p = pos; val v = read(bits); pos = p; v }
    /** true iff the next ≥23 bits are zero — the spec's end-of-slice test
      * (a byte-aligned start-code prefix follows).
      */
    def atSliceEnd: Boolean =
      remaining < 23 || peek(math.min(23, remaining)) == 0
    def align(): Unit = if ((pos & 7) != 0) pos += 8 - (pos & 7)
    /** advance to just past the next 000001 start-code prefix; returns the
      * start code value byte, or -1 at stream end.
      */
    def nextStartCode(): Int = {
      align()
      var byte = pos >> 3
      while (byte + 4 <= data.length) {
        if (data(byte) == 0 && data(byte + 1) == 0 && data(byte + 2) == 1) {
          pos = (byte + 4) * 8
          return data(byte + 3) & 0xff
        }
        byte += 1
      }
      pos = data.length * 8
      -1
    }
  }

  // ------------------------------------------------------------------ DCT

  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private def cOf(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8×8 DCT-II, orthonormal scaling (F(0,0) = mean·8). */
  def fdct(pix: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += pix(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = cOf(u) * cOf(v) / 4.0 * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse 8×8 DCT (double), rounded but UNclamped — residual blocks
    * are signed and clamp only after adding to the prediction.
    */
  def idctRaw(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) s += cOf(u) * cOf(v) / 4.0 * f * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = math.round(s).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[idctRaw]] clamped to [0, 255] — the intra-block form. */
  def idct(coef: Array[Int]): Array[Int] =
    idctRaw(coef).map(v => math.max(0, math.min(255, v)))

  // -------------------------------------------------------------- encoder

  /** One decoded picture: full-resolution Y plane plus 4:2:0 Cb/Cr. */
  final case class Picture(width: Int, height: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int])

  final case class SeqMeta(width: Int, height: Int, nPictures: Int)

  private def dcSizeOf(diff: Int): Int = {
    var size = 0
    var a = math.abs(diff)
    while (a != 0) { size += 1; a >>= 1 }
    size
  }

  private def putDc(w: BitWriter, diff: Int, luma: Boolean): Unit = {
    val size = dcSizeOf(diff)
    require(size <= 8, s"DC differential $diff out of range")
    val (code, bits) = (if (luma) DcLumaCodes else DcChromaCodes)(size)
    w.put(code.toLong, bits)
    if (size > 0) {
      val v = if (diff > 0) diff else diff + (1 << size) - 1
      w.put(v.toLong, size)
    }
  }

  private def putAc(w: BitWriter, run: Int, level: Int,
      first: Boolean = false): Unit = {
    val a = math.abs(level)
    require(a >= 1 && a <= 255 && run >= 0 && run <= 63, s"bad AC ($run, $level)")
    if (first && run == 0 && a == 1) {
      // dct_coeff_first: (0, ±1) is '1 s'
      w.put(0x1L, 1); w.put(if (level < 0) 1L else 0L, 1)
      return
    }
    AcByRunLevel.get((run, a)) match {
      case Some((code, bits)) =>
        w.put(code.toLong, bits); w.put(if (level < 0) 1L else 0L, 1)
      case None =>
        w.put(0x1L, 6) // escape '000001'
        w.put(run.toLong, 6)
        if (a <= 127) w.put((level & 0xff).toLong, 8)
        else if (level > 0) { w.put(0x00L, 8); w.put(level.toLong, 8) }
        else { w.put(0x80L, 8); w.put((level + 256).toLong, 8) }
    }
  }

  /** Quantize one block's DCT coefficients and emit intra-block VLC.
    * Returns the quantized DC for the caller's predictor chain.
    */
  private def putBlock(w: BitWriter, coef: Array[Double], qscale: Int,
      prevDcQ: Int, luma: Boolean): Int = {
    val dcQ = math.round(coef(0) / 8.0).toInt
    putDc(w, dcQ - prevDcQ, luma)
    // AC in zigzag order: level = round(8·F / (qscale·matrix)) inverts the
    // normative reconstruction 2·L·qscale·matrix/16 up to oddification
    var run = 0
    var i = 1
    while (i < 64) {
      val r = RasterOf(i)
      val lvl = math.round(8.0 * coef(r) / (qscale * IntraQ(r))).toInt
      if (lvl == 0) run += 1
      else {
        putAc(w, run, lvl)
        run = 0
      }
      i += 1
    }
    w.put(0x2L, 2) // EOB '10'
    dcQ
  }

  /** Per-macroblock plan for a P-picture (encoder input). */
  sealed trait MbPlan
  /** Skipped macroblock: zero-vector copy of the co-located reference
    * block (illegal at a slice's first/last position — enforced).
    */
  case object SkipMb extends MbPlan
  /** Intra refresh inside a P-picture: the I pattern (base, amp). */
  final case class IntraMb(base: Int, amp: Int) extends MbPlan
  /** Forward-predicted macroblock: motion vector in HALF-pel units; when
    * `deltaLuma` ≠ 0 the four luma blocks carry a DC-only residual of
    * approximately that pixel value (cbp = 60, non-intra quantization) —
    * 0 means pred-without-coefficients.
    */
  final case class PredMb(dxHalf: Int, dyHalf: Int, deltaLuma: Int) extends MbPlan
  /** B-picture predicted macroblock: forward (from the PAST anchor) and/or
    * backward (from the FUTURE anchor) motion vectors in HALF-pel units —
    * both present means interpolated prediction. `deltaLuma` as in
    * [[PredMb]]. In a B-picture, [[SkipMb]] repeats the PREVIOUS
    * macroblock's direction and vectors (so the previous plan must be a
    * BPredMb — enforced), and [[IntraMb]] is the refresh path.
    */
  final case class BPredMb(fwd: Option[(Int, Int)], bwd: Option[(Int, Int)],
      deltaLuma: Int) extends MbPlan {
    require(fwd.nonEmpty || bwd.nonEmpty, "a B macroblock needs a direction")
  }

  /** One picture of an elementary stream in DISPLAY order: I with the
    * standard test pattern, P or B described per macroblock. The encoder
    * performs the normative reorder (each anchor is transmitted before
    * the B-pictures that precede it in display order).
    */
  sealed trait FramePlan
  final case class IFrame(lumaOf: (Int, Int) => (Int, Int),
      chroma: (Int, Int)) extends FramePlan
  final case class PFrame(planOf: (Int, Int) => MbPlan) extends FramePlan
  final case class BFrame(planOf: (Int, Int) => MbPlan) extends FramePlan

  private def putMba(w: BitWriter, inc: Int): Unit = {
    require(inc >= 1 && inc <= MbaCodes.length, s"address increment $inc unsupported")
    val (c, b) = MbaCodes(inc - 1)
    w.put(c.toLong, b)
  }

  private def putMotion(w: BitWriter, code: Int): Unit = {
    require(math.abs(code) <= 4, s"motion_code $code outside encoder range")
    if (code == 0) w.put(0x1L, 1)
    else {
      val (c, b) = MotionPrefix(math.abs(code) - 1)
      w.put(c.toLong, b)
      w.put(if (code < 0) 1L else 0L, 1)
    }
  }

  /** The intra-macroblock test pattern: per-8×8-block base + one
    * horizontal AC basis, clamped.
    */
  private def intraLumaBlock(base: Int, amp: Int): Array[Int] =
    Array.tabulate(64) { i =>
      val x = i % 8
      math.max(0, math.min(255, base + math.round(amp * CosT(x)(1)).toInt))
    }

  /** Emit the 6 blocks of an intra macroblock; returns updated DC
    * predictors (chained across consecutive intra macroblocks).
    */
  private def putIntraBlocks(w: BitWriter, qscale: Int, base: Int, amp: Int,
      cbv: Int, crv: Int, dc: (Int, Int, Int)): (Int, Int, Int) = {
    val lumaCoef = fdct(intraLumaBlock(base, amp))
    var dcY = dc._1
    var b = 0
    while (b < 4) { dcY = putBlock(w, lumaCoef, qscale, dcY, luma = true); b += 1 }
    val dcCb = putBlock(w, fdct(Array.fill(64)(cbv)), qscale, dc._2, luma = false)
    val dcCr = putBlock(w, fdct(Array.fill(64)(crv)), qscale, dc._3, luma = false)
    (dcY, dcCb, dcCr)
  }

  /** Non-intra level whose reconstruction is nearest 8·delta (the DC-only
    * residual); recon(L) = oddified((2L + sign L)·q·16/16).
    */
  def residualLevel(delta: Int, qscale: Int): Int =
    if (delta > 0) math.max(1, math.round((8.0 * delta / qscale - 1) / 2).toInt)
    else math.min(-1, math.round((8.0 * delta / qscale + 1) / 2).toInt)

  /** The pixel value that level reconstructs to, for gate expectations. */
  def residualPixel(level: Int, qscale: Int): Int = {
    var recon = (2 * level + Integer.signum(level)) * qscale
    if ((recon & 1) == 0) recon -= Integer.signum(recon)
    math.round(recon / 8.0).toInt
  }

  /** Encode a mixed I/P elementary stream — the construction-inverse for
    * q287/q288 and Mpeg1Spec. One slice per macroblock row; qscale fixed;
    * full_pel_forward_vector = 0 (vectors in half-pel units),
    * forward_f_code = 1. P chroma is predicted only (no chroma residual).
    */
  def encodeStream(width: Int, height: Int, qscale: Int,
      frames: Seq[FramePlan]): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0 && width > 0 && height > 0,
      s"dimensions must be positive multiples of 16: ${width}x$height")
    require(qscale >= 1 && qscale <= 31, s"qscale $qscale outside [1,31]")
    require(frames.nonEmpty && frames.head.isInstanceOf[IFrame],
      "stream must open with an I-picture")
    val w = new BitWriter
    w.startCode(0xb3)
    w.put(width.toLong, 12); w.put(height.toLong, 12)
    w.put(1L, 4) // pel_aspect_ratio: square
    w.put(1L, 4) // picture_rate code
    w.put(0x3ffffL, 18) // bit_rate: variable
    w.put(1L, 1) // marker
    w.put(0L, 10) // vbv_buffer_size
    w.put(0L, 1) // constrained_parameters_flag
    w.put(0L, 1); w.put(0L, 1) // default intra + non-intra matrices
    val (mbw, mbh) = (width / 16, height / 16)
    // normative transmission reorder: each anchor (I/P) is sent BEFORE the
    // run of B-pictures that precedes it in display order; the display
    // index rides along as temporal_reference so the decoder can restore
    // display order
    val tx = {
      val out = Seq.newBuilder[(FramePlan, Int)]
      var pendingB = List.empty[(FramePlan, Int)]
      for ((f, i) <- frames.zipWithIndex) f match {
        case _: BFrame => pendingB = (f, i) :: pendingB
        case _ => out += ((f, i)); pendingB.reverse.foreach(out += _); pendingB = Nil
      }
      require(pendingB.isEmpty,
        "stream cannot end with a B-picture (it would have no future anchor)")
      out.result()
    }
    for ((frame, p) <- tx) {
      w.startCode(0x00)
      w.put(p.toLong, 10) // temporal_reference = display index
      frame match {
        case IFrame(lumaOf, (cbv, crv)) =>
          w.put(1L, 3) // picture_coding_type: I
          w.put(0xffffL, 16) // vbv_delay
          w.put(0L, 1) // extra_bit_picture
          for (row <- 0 until mbh) {
            w.startCode(0x01 + row)
            w.put(qscale.toLong, 5)
            w.put(0L, 1) // extra_bit_slice
            var dc = (128, 128, 128)
            for (col <- 0 until mbw) {
              putMba(w, 1)
              w.put(0x1L, 1) // macroblock_type: intra
              val (base, amp) = lumaOf(row, col)
              dc = putIntraBlocks(w, qscale, base, amp, cbv, crv, dc)
            }
          }
        case PFrame(planOf) =>
          w.put(2L, 3) // picture_coding_type: P
          w.put(0xffffL, 16) // vbv_delay
          w.put(0L, 1) // full_pel_forward_vector: half-pel units
          w.put(1L, 3) // forward_f_code = 1
          w.put(0L, 1) // extra_bit_picture
          for (row <- 0 until mbh) {
            w.startCode(0x01 + row)
            w.put(qscale.toLong, 5)
            w.put(0L, 1)
            var dc = (128, 128, 128)
            var (pmx, pmy) = (0, 0) // MV predictors, reset per slice
            var pendingSkip = 0
            for (col <- 0 until mbw) {
              val plan = planOf(row, col)
              plan match {
                case SkipMb =>
                  require(col != 0 && col != mbw - 1,
                    "a slice's first/last macroblock cannot be skipped")
                  pendingSkip += 1
                  pmx = 0; pmy = 0 // skipped MBs reset the MV predictor
                  dc = (128, 128, 128)
                case IntraMb(base, amp) =>
                  putMba(w, 1 + pendingSkip); pendingSkip = 0
                  w.put(0x3L, 5) // P macroblock_type: intra '00011'
                  dc = putIntraBlocks(w, qscale, base, amp, 128, 128, dc)
                  pmx = 0; pmy = 0 // intra resets the MV predictor
                case PredMb(dx, dy, delta) =>
                  putMba(w, 1 + pendingSkip); pendingSkip = 0
                  if (delta == 0) w.put(0x1L, 3) // pred-mc not coded '001'
                  else w.put(0x1L, 1) // pred-mc coded '1'
                  putMotion(w, dx - pmx)
                  putMotion(w, dy - pmy)
                  pmx = dx; pmy = dy
                  if (delta != 0) {
                    w.put(0x7L, 3) // cbp = 60: all four luma blocks coded
                    val lvl = residualLevel(delta, qscale)
                    var b = 0
                    while (b < 4) {
                      putAc(w, 0, lvl, first = true)
                      w.put(0x2L, 2) // EOB
                      b += 1
                    }
                  }
                  dc = (128, 128, 128) // non-intra MB resets DC predictors
                case b: BPredMb =>
                  sys.error(s"B-picture plan $b inside a P-picture")
              }
            }
            require(pendingSkip == 0, "slice ended in skipped macroblocks")
          }
        case BFrame(planOf) =>
          w.put(3L, 3) // picture_coding_type: B
          w.put(0xffffL, 16) // vbv_delay
          w.put(0L, 1) // full_pel_forward_vector: half-pel units
          w.put(1L, 3) // forward_f_code = 1
          w.put(0L, 1) // full_pel_backward_vector: half-pel units
          w.put(1L, 3) // backward_f_code = 1
          w.put(0L, 1) // extra_bit_picture
          for (row <- 0 until mbh) {
            w.startCode(0x01 + row)
            w.put(qscale.toLong, 5)
            w.put(0L, 1)
            var dc = (128, 128, 128)
            // independent forward and backward differential predictors
            var (pfx, pfy, pbx, pby) = (0, 0, 0, 0)
            var pendingSkip = 0
            var lastWasBPred = false
            for (col <- 0 until mbw) {
              planOf(row, col) match {
                case SkipMb =>
                  require(col != 0 && col != mbw - 1,
                    "a slice's first/last macroblock cannot be skipped")
                  require(lastWasBPred,
                    "a skipped B macroblock must follow a predicted one " +
                      "(its direction and vectors are repeated from it)")
                  pendingSkip += 1
                  dc = (128, 128, 128)
                // B-skip leaves the vector predictors UNTOUCHED (§2.4.4.4)
                case IntraMb(base, amp) =>
                  putMba(w, 1 + pendingSkip); pendingSkip = 0
                  w.put(0x3L, 5) // B macroblock_type: intra '00011'
                  dc = putIntraBlocks(w, qscale, base, amp, 128, 128, dc)
                  pfx = 0; pfy = 0; pbx = 0; pby = 0 // intra resets both
                  lastWasBPred = false
                case BPredMb(fwd, bwd, delta) =>
                  putMba(w, 1 + pendingSkip); pendingSkip = 0
                  val coded = delta != 0
                  (fwd.isDefined, bwd.isDefined) match {
                    case (true, true) => w.put(if (coded) 0x3L else 0x2L, 2)
                    case (false, true) => w.put(if (coded) 0x3L else 0x2L, 3)
                    case (true, false) => w.put(if (coded) 0x3L else 0x2L, 4)
                    case _ => sys.error("unreachable: BPredMb requires a direction")
                  }
                  fwd.foreach { case (dx, dy) =>
                    putMotion(w, dx - pfx); putMotion(w, dy - pfy)
                    pfx = dx; pfy = dy
                  }
                  bwd.foreach { case (dx, dy) =>
                    putMotion(w, dx - pbx); putMotion(w, dy - pby)
                    pbx = dx; pby = dy
                  }
                  if (coded) {
                    w.put(0x7L, 3) // cbp = 60: all four luma blocks coded
                    val lvl = residualLevel(delta, qscale)
                    var b = 0
                    while (b < 4) {
                      putAc(w, 0, lvl, first = true)
                      w.put(0x2L, 2) // EOB
                      b += 1
                    }
                  }
                  dc = (128, 128, 128)
                  lastWasBPred = true
                case p: PredMb =>
                  sys.error(s"P-picture plan $p inside a B-picture")
              }
            }
            require(pendingSkip == 0, "slice ended in skipped macroblocks")
          }
      }
    }
    w.startCode(0xb7)
    w.bytes()
  }

  /** Encode an I-only elementary stream (q287's form). `lumaOf(pic,
    * mbRow, mbCol)` gives each macroblock's (base, amp); chroma is
    * constant per picture.
    */
  def encodeIFrames(width: Int, height: Int, nPictures: Int, qscale: Int,
      lumaOf: (Int, Int, Int) => (Int, Int),
      chromaOf: Int => (Int, Int)): Array[Byte] =
    encodeStream(width, height, qscale,
      (0 until nPictures).map(p =>
        IFrame((row, col) => lumaOf(p, row, col), chromaOf(p))))

  // -------------------------------------------------------------- decoder

  private def readDcSize(r: BitReader, luma: Boolean): Int = {
    val table = if (luma) DcLumaCodes else DcChromaCodes
    var code = 0
    var bits = 0
    while (bits <= 8) {
      code = (code << 1) | r.read(1)
      bits += 1
      var size = 0
      while (size < table.length) {
        val (c, b) = table(size)
        if (b == bits && c == code) return size
        size += 1
      }
    }
    sys.error(s"invalid dct_dc_size code 0x${code.toHexString}/$bits bits")
  }

  private def readDcDiff(r: BitReader, size: Int): Int =
    if (size == 0) 0
    else {
      val v = r.read(size)
      if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
    }

  /** One run/level (sign applied), or None on EOB. `first = true` selects
    * the dct_coeff_FIRST alphabet used for a NON-intra block's first
    * coefficient: '1s' means (0, ±1) and EOB cannot occur (a coded block
    * has at least one coefficient); everywhere else '10' is EOB and
    * (0, ±1) is '11s'.
    */
  private def readAc(r: BitReader, first: Boolean = false): Option[(Int, Int)] = {
    if (first && r.peek(1) == 0x1) {
      r.read(1)
      return Some((0, if (r.read(1) == 1) -1 else 1))
    }
    if (r.peek(2) == 0x2) { r.read(2); return None } // EOB '10'
    var code = 0
    var bits = 0
    while (bits < 17) {
      code = (code << 1) | r.read(1)
      bits += 1
      if (bits == 6 && code == 0x1) { // escape
        val run = r.read(6)
        val v = r.read(8)
        val level =
          if (v == 0x00) r.read(8)
          else if (v == 0x80) r.read(8) - 256
          else if (v > 0x80) v - 256
          else v
        require(level != 0, "escape-coded zero level")
        return Some((run, level))
      }
      var i = 0
      while (i < AcCodes.length) {
        val (run, lvl, c, b) = AcCodes(i)
        if (b == bits && c == code) {
          val s = r.read(1)
          return Some((run, if (s == 1) -lvl else lvl))
        }
        i += 1
      }
    }
    sys.error(s"invalid dct_coeff code 0x${code.toHexString}/$bits bits")
  }

  /** Decode one intra block into raster-order reconstructed coefficients,
    * returning (pixels, newDcPredictor). Normative §2.4.4.1–2.4.4.2:
    * dequant 2·L·q·matrix/16 (toward-zero division), oddification,
    * [-2048, 2047] clamp, DC = predictor + diff·8.
    */
  private def readBlock(r: BitReader, qscale: Int, dcPred: Int,
      luma: Boolean): (Array[Int], Int) = {
    val coef = new Array[Int](64)
    val size = readDcSize(r, luma)
    val diff = readDcDiff(r, size)
    val dcQ = dcPred + diff
    coef(0) = math.max(-2048, math.min(2047, dcQ * 8))
    var i = 0 // zigzag position of the last coefficient
    var done = false
    while (!done) {
      readAc(r) match {
        case None => done = true
        case Some((run, level)) =>
          i += run + 1
          require(i < 64, s"AC run past block end (pos $i)")
          val raster = RasterOf(i)
          var recon = 2 * level * qscale * IntraQ(raster) / 16
          if ((recon & 1) == 0) recon -= Integer.signum(recon)
          coef(raster) = math.max(-2048, math.min(2047, recon))
      }
    }
    (idct(coef), dcQ)
  }

  /** Non-intra residual block → raster-order RESIDUAL pixels (signed, no
    * clamp — they add onto the prediction). Normative non-intra dequant:
    * ((2L + sign L)·q·matrix)/16 with the all-16 default matrix,
    * oddification and coefficient clamp; the first coefficient uses the
    * dct_coeff_first alphabet.
    */
  private def readNonIntraBlock(r: BitReader, qscale: Int): Array[Int] = {
    val coef = new Array[Int](64)
    var i = -1
    var first = true
    var done = false
    while (!done) {
      readAc(r, first) match {
        case None => done = true
        case Some((run, level)) =>
          i += run + 1
          require(i < 64, s"AC run past block end (pos $i)")
          val raster = RasterOf(i)
          var recon = (2 * level + Integer.signum(level)) * qscale * 16 / 16
          if ((recon & 1) == 0) recon -= Integer.signum(recon)
          coef(raster) = math.max(-2048, math.min(2047, recon))
          first = false
      }
    }
    require(!first, "coded non-intra block with zero coefficients")
    idctRaw(coef)
  }

  /** macroblock_address_increment with stuffing discarded and the +33
    * escape folded in.
    */
  private def readMba(r: BitReader): Int = {
    var inc = 0
    while (true) {
      var code = 0
      var bits = 0
      while (bits < 11) {
        code = (code << 1) | r.read(1)
        bits += 1
        var i = 0
        while (i < MbaCodes.length) {
          val (c, b) = MbaCodes(i)
          if (b == bits && c == code) return inc + i + 1
          i += 1
        }
        if (bits == 11) {
          if (code == 0xf) { code = 0; bits = 0 } // stuffing: discard
          else if (code == 0x8) { inc += 33; code = 0; bits = 0 } // escape
          else sys.error(s"invalid macroblock_address_increment 0x${code.toHexString}")
        }
      }
    }
    inc
  }

  /** One motion_code (Table B.4 subset |code| ≤ 7, sign applied). */
  private def readMotion(r: BitReader): Int = {
    if (r.peek(1) == 1) { r.read(1); return 0 }
    var code = 0
    var bits = 0
    while (bits < 7) {
      code = (code << 1) | r.read(1)
      bits += 1
      var i = 0
      while (i < MotionPrefix.length) {
        val (c, b) = MotionPrefix(i)
        if (b == bits && c == code) {
          val mag = i + 1
          return if (r.read(1) == 1) -mag else mag
        }
        i += 1
      }
    }
    sys.error(s"motion_code 0x${code.toHexString} outside the implemented table")
  }

  private def readCbp(r: BitReader): Int = {
    var code = 0
    var bits = 0
    while (bits < 9) {
      code = (code << 1) | r.read(1)
      bits += 1
      var i = 0
      while (i < CbpCodes.length) {
        val (cbp, c, b) = CbpCodes(i)
        if (b == bits && c == code) return cbp
        i += 1
      }
    }
    sys.error(s"coded_block_pattern 0x${code.toHexString} outside the implemented table")
  }

  /** P-picture macroblock_type → (quant, motionForward, pattern, intra). */
  private def readPMbType(r: BitReader): (Boolean, Boolean, Boolean, Boolean) = {
    var code = 0
    var bits = 0
    while (bits < 6) {
      code = (code << 1) | r.read(1)
      bits += 1
      var i = 0
      while (i < PMbTypes.length) {
        val (c, b, q, mf, pat, intra) = PMbTypes(i)
        if (b == bits && c == code) return (q, mf, pat, intra)
        i += 1
      }
    }
    sys.error(s"invalid P macroblock_type 0x${code.toHexString}")
  }

  /** B-picture macroblock_type →
    * (quant, motionForward, motionBackward, pattern, intra).
    */
  private def readBMbType(r: BitReader): (Boolean, Boolean, Boolean, Boolean, Boolean) = {
    var code = 0
    var bits = 0
    while (bits < 6) { // longest Table B.2c code is 6 bits
      code = (code << 1) | r.read(1)
      bits += 1
      var i = 0
      while (i < BMbTypes.length) {
        val (c, b, q, mf, mb, pat, intra) = BMbTypes(i)
        if (b == bits && c == code) return (q, mf, mb, pat, intra)
        i += 1
      }
    }
    sys.error(s"invalid B macroblock_type 0x${code.toHexString}")
  }

  /** Forward motion-compensated copy of one size×size block with
    * half-pel interpolation (right/down averages round half away from
    * zero: (a+b+1)>>1, four-point (Σ+2)>>2). Coordinates must stay
    * inside the reference plane — enforced, a conformant stream never
    * points outside.
    */
  private def mcCopy(ref: Array[Int], stride: Int, planeH: Int,
      dst: Array[Int], x0: Int, y0: Int, size: Int,
      mvxHalf: Int, mvyHalf: Int): Unit = {
    val fx = mvxHalf >> 1
    val fy = mvyHalf >> 1
    val hx = mvxHalf & 1
    val hy = mvyHalf & 1
    require(x0 + fx >= 0 && y0 + fy >= 0 &&
      x0 + fx + size - 1 + hx < stride && y0 + fy + size - 1 + hy < planeH,
      s"motion vector ($mvxHalf, $mvyHalf) points outside the reference")
    var yy = 0
    while (yy < size) {
      var xx = 0
      while (xx < size) {
        dst(((y0 + yy) * stride) + x0 + xx) =
          mcPel(ref, stride, x0 + xx + fx, y0 + yy + fy, hx, hy)
        xx += 1
      }
      yy += 1
    }
  }

  /** One motion-compensated pel with half-pel rounding (§2.4.4.2):
    * right/down averages round half away from zero ((a+b+1)>>1),
    * four-point (Σ+2)>>2.
    */
  private def mcPel(ref: Array[Int], stride: Int, sx: Int, sy: Int,
      hx: Int, hy: Int): Int = {
    val p = ref(sy * stride + sx)
    if (hx == 0 && hy == 0) p
    else if (hy == 0) (p + ref(sy * stride + sx + 1) + 1) >> 1
    else if (hx == 0) (p + ref((sy + 1) * stride + sx) + 1) >> 1
    else (p + ref(sy * stride + sx + 1) + ref((sy + 1) * stride + sx) +
      ref((sy + 1) * stride + sx + 1) + 2) >> 2
  }

  /** B-picture motion compensation of one size×size block: forward-only,
    * backward-only, or INTERPOLATED — per-direction half-pel prediction
    * first, then the rounded two-direction average (fwd + bwd + 1) >> 1
    * (§2.4.4.3's half-rounded-away-from-zero integer division).
    */
  private def mcCopyB(refF: Array[Int], fwd: Option[(Int, Int)],
      refB: Array[Int], bwd: Option[(Int, Int)], stride: Int, planeH: Int,
      dst: Array[Int], x0: Int, y0: Int, size: Int): Unit = {
    def check(mv: (Int, Int)): (Int, Int, Int, Int) = {
      val (mvxHalf, mvyHalf) = mv
      val fx = mvxHalf >> 1
      val fy = mvyHalf >> 1
      val hx = mvxHalf & 1
      val hy = mvyHalf & 1
      require(x0 + fx >= 0 && y0 + fy >= 0 &&
        x0 + fx + size - 1 + hx < stride && y0 + fy + size - 1 + hy < planeH,
        s"motion vector ($mvxHalf, $mvyHalf) points outside the reference")
      (fx, fy, hx, hy)
    }
    val f = fwd.map(check)
    val b = bwd.map(check)
    var yy = 0
    while (yy < size) {
      var xx = 0
      while (xx < size) {
        val pf = f.map { case (fx, fy, hx, hy) =>
          mcPel(refF, stride, x0 + xx + fx, y0 + yy + fy, hx, hy) }
        val pb = b.map { case (fx, fy, hx, hy) =>
          mcPel(refB, stride, x0 + xx + fx, y0 + yy + fy, hx, hy) }
        dst(((y0 + yy) * stride) + x0 + xx) = (pf, pb) match {
          case (Some(a), Some(c)) => (a + c + 1) >> 1
          case (Some(a), None) => a
          case (None, Some(c)) => c
          case _ => sys.error("unreachable: a B block needs a direction")
        }
        xx += 1
      }
      yy += 1
    }
  }

  private def placeBlock(plane: Array[Int], stride: Int, bx: Int, by: Int,
      pix: Array[Int]): Unit = {
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        plane((by + yy) * stride + bx + xx) = pix(yy * 8 + xx)
        xx += 1
      }
      yy += 1
    }
  }

  private def addResidual(plane: Array[Int], stride: Int, bx: Int, by: Int,
      res: Array[Int]): Unit = {
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        val i = (by + yy) * stride + bx + xx
        plane(i) = math.max(0, math.min(255, plane(i) + res(yy * 8 + xx)))
        xx += 1
      }
      yy += 1
    }
  }

  /** Decode the 6 blocks of an intra macroblock into the planes; returns
    * the updated DC predictors.
    */
  private def decodeIntraMb(r: BitReader, q: Int, row: Int, col: Int,
      width: Int, y: Array[Int], cb: Array[Int], cr: Array[Int],
      dc: (Int, Int, Int)): (Int, Int, Int) = {
    var (dcY, dcCb, dcCr) = dc
    var b = 0
    while (b < 6) {
      val luma = b < 4
      val pred = if (luma) dcY else if (b == 4) dcCb else dcCr
      val (pix, dcQ) = readBlock(r, q, pred, luma)
      if (luma) dcY = dcQ else if (b == 4) dcCb = dcQ else dcCr = dcQ
      if (luma)
        placeBlock(y, width, col * 16 + (b % 2) * 8, row * 16 + (b / 2) * 8, pix)
      else
        placeBlock(if (b == 4) cb else cr, width / 2, col * 8, row * 8, pix)
      b += 1
    }
    (dcY, dcCb, dcCr)
  }

  /** Walk a full I/P elementary stream. Returns None when the bytes are
    * not an MPEG-1 video sequence (no 0x1B3 sequence header first).
    */
  def decodeIFrames(bytes: Array[Byte]): Option[(SeqMeta, Seq[Picture])] = {
    val r = new BitReader(bytes)
    if (r.nextStartCode() != 0xb3) return None
    val width = r.read(12)
    val height = r.read(12)
    if (width == 0 || height == 0 || width % 16 != 0 || height % 16 != 0)
      return None
    r.read(4); r.read(4); r.read(18) // aspect, rate, bit_rate
    if (r.read(1) != 1) return None // marker
    r.read(10); r.read(1) // vbv, constrained
    if (r.read(1) == 1) (0 until 64).foreach(_ => r.read(8)) // custom intra matrix: skip (encoder never emits one)
    if (r.read(1) == 1) (0 until 64).foreach(_ => r.read(8))
    val (mbw, mbh) = (width / 16, height / 16)
    // pictures arrive in TRANSMISSION order (anchors before the B-pictures
    // that precede them in display order); collect with temporal_reference
    // and restore display order at the end
    val pics = Seq.newBuilder[(Int, Picture)]
    var lastAnchor: Picture = null // most recent decoded I or P (B's FUTURE ref)
    var prevAnchor: Picture = null // the anchor before it (B's PAST ref)
    var code = r.nextStartCode()
    while (code == 0x00) {
      val tref = r.read(10) // temporal_reference = display index
      val ptype = r.read(3)
      require(ptype >= 1 && ptype <= 3,
        s"picture_coding_type $ptype: only I, P and B supported")
      val isP = ptype == 2
      val isB = ptype == 3
      require(!isP || lastAnchor != null, "P-picture with no reference frame")
      require(!isB || (lastAnchor != null && prevAnchor != null),
        "B-picture without two decoded anchors")
      r.read(16) // vbv_delay
      var fullPelF = false
      var fullPelB = false
      if (isP || isB) {
        fullPelF = r.read(1) == 1
        val fCode = r.read(3)
        require(fCode == 1,
          s"forward_f_code $fCode: only 1 (no residual bits) supported")
      }
      if (isB) {
        fullPelB = r.read(1) == 1
        val bCode = r.read(3)
        require(bCode == 1,
          s"backward_f_code $bCode: only 1 (no residual bits) supported")
      }
      require(r.read(1) == 0, "extra_bit_picture set: extension data unsupported")
      val y = new Array[Int](width * height)
      val cb = new Array[Int]((width / 2) * (height / 2))
      val cr = new Array[Int]((width / 2) * (height / 2))
      code = r.nextStartCode()
      while (code >= 0x01 && code <= 0xaf) { // slices
        val row0 = code - 1
        var q = r.read(5)
        require(q >= 1, "quantizer_scale 0 is forbidden")
        while (r.read(1) == 1) r.read(8) // extra_information_slice
        var dc = (128, 128, 128)
        // differential motion predictors: forward (P and B) + backward (B)
        var (pfx, pfy) = (0, 0)
        var (pbx, pby) = (0, 0)
        // B-skip repeat state: the previous macroblock's direction and its
        // FINAL (pel-domain) vectors — a skipped B macroblock repeats them
        var lastF = false
        var lastB = false
        var (lvfx, lvfy, lvbx, lvby) = (0, 0, 0, 0)
        var lastPredValid = false
        def halfV(v: (Int, Int)): (Int, Int) = (v._1 / 2, v._2 / 2)
        def mcB(fwd: Option[(Int, Int)], bwd: Option[(Int, Int)],
            mrow: Int, mcol: Int): Unit = {
          mcCopyB(prevAnchor.y, fwd, lastAnchor.y, bwd, width, height,
            y, mcol * 16, mrow * 16, 16)
          // chroma vectors: half the luma vector, truncated toward zero
          mcCopyB(prevAnchor.cb, fwd.map(halfV), lastAnchor.cb, bwd.map(halfV),
            width / 2, height / 2, cb, mcol * 8, mrow * 8, 8)
          mcCopyB(prevAnchor.cr, fwd.map(halfV), lastAnchor.cr, bwd.map(halfV),
            width / 2, height / 2, cr, mcol * 8, mrow * 8, 8)
        }
        var mbAddr = row0 * mbw - 1
        var sliceDone = false
        while (!sliceDone) {
          val inc = readMba(r)
          require(isP || isB || inc == 1,
            s"skipped macroblocks (increment $inc) are illegal in I-pictures")
          // skipped macroblocks — P: zero-vector co-located copy, MV and DC
          // predictors reset; B: repeat the previous macroblock's direction
          // and vectors, predictors UNTOUCHED (§2.4.4.4)
          var s = 1
          while (s < inc) {
            mbAddr += 1
            val (srow, scol) = (mbAddr / mbw, mbAddr % mbw)
            require(srow < mbh, s"skipped macroblock $mbAddr outside picture")
            if (isB) {
              require(lastPredValid,
                "skipped B macroblock with no preceding predicted macroblock")
              mcB(if (lastF) Some((lvfx, lvfy)) else None,
                if (lastB) Some((lvbx, lvby)) else None, srow, scol)
            } else {
              mcCopy(lastAnchor.y, width, height, y, scol * 16, srow * 16, 16, 0, 0)
              mcCopy(lastAnchor.cb, width / 2, height / 2, cb, scol * 8, srow * 8, 8, 0, 0)
              mcCopy(lastAnchor.cr, width / 2, height / 2, cr, scol * 8, srow * 8, 8, 0, 0)
              pfx = 0; pfy = 0
            }
            dc = (128, 128, 128)
            s += 1
          }
          mbAddr += 1
          val (row, col) = (mbAddr / mbw, mbAddr % mbw)
          require(row < mbh && col < mbw, s"macroblock $mbAddr outside ${mbw}x$mbh")
          def readPattern(row: Int, col: Int): Unit = {
            val cbp = readCbp(r)
            var b = 0
            while (b < 6) {
              if ((cbp & (1 << (5 - b))) != 0) {
                val res = readNonIntraBlock(r, q)
                if (b < 4)
                  addResidual(y, width,
                    col * 16 + (b % 2) * 8, row * 16 + (b / 2) * 8, res)
                else
                  addResidual(if (b == 4) cb else cr, width / 2,
                    col * 8, row * 8, res)
              }
              b += 1
            }
          }
          if (!isP && !isB) {
            // macroblock_type for I: '1' intra, '01' intra+quant
            if (r.read(1) != 1) {
              require(r.read(1) == 1, "invalid I-picture macroblock_type")
              q = r.read(5)
            }
            dc = decodeIntraMb(r, q, row, col, width, y, cb, cr, dc)
          } else if (isP) {
            val (quant, mf, pattern, intra) = readPMbType(r)
            if (quant) q = r.read(5)
            if (intra) {
              dc = decodeIntraMb(r, q, row, col, width, y, cb, cr, dc)
              pfx = 0; pfy = 0
            } else {
              var (mvx, mvy) = (0, 0)
              if (mf) {
                mvx = pfx + readMotion(r)
                mvy = pfy + readMotion(r)
                require(mvx >= -16 && mvx <= 15 && mvy >= -16 && mvy <= 15,
                  s"reconstructed vector ($mvx, $mvy) outside the f_code=1 range")
                pfx = mvx; pfy = mvy
              } else { pfx = 0; pfy = 0 }
              val (lx, ly) = if (fullPelF) (mvx * 2, mvy * 2) else (mvx, mvy)
              // chroma vectors: half the luma vector, truncated toward zero
              val (cx, cy) = (lx / 2, ly / 2)
              mcCopy(lastAnchor.y, width, height, y, col * 16, row * 16, 16, lx, ly)
              mcCopy(lastAnchor.cb, width / 2, height / 2, cb, col * 8, row * 8, 8, cx, cy)
              mcCopy(lastAnchor.cr, width / 2, height / 2, cr, col * 8, row * 8, 8, cx, cy)
              if (pattern) readPattern(row, col)
              dc = (128, 128, 128) // non-intra macroblock resets DC prediction
            }
          } else { // B-picture
            val (quant, mf, mb, pattern, intra) = readBMbType(r)
            if (quant) q = r.read(5)
            if (intra) {
              dc = decodeIntraMb(r, q, row, col, width, y, cb, cr, dc)
              pfx = 0; pfy = 0; pbx = 0; pby = 0 // intra resets BOTH pipelines
              lastPredValid = false
            } else {
              // absent directions leave their predictors UNCHANGED — the
              // B-picture contract differs from P's reset-to-zero
              var fwd: Option[(Int, Int)] = None
              var bwd: Option[(Int, Int)] = None
              if (mf) {
                val mvx = pfx + readMotion(r)
                val mvy = pfy + readMotion(r)
                require(mvx >= -16 && mvx <= 15 && mvy >= -16 && mvy <= 15,
                  s"reconstructed forward vector ($mvx, $mvy) outside the f_code=1 range")
                pfx = mvx; pfy = mvy
                fwd = Some(if (fullPelF) (mvx * 2, mvy * 2) else (mvx, mvy))
              }
              if (mb) {
                val mvx = pbx + readMotion(r)
                val mvy = pby + readMotion(r)
                require(mvx >= -16 && mvx <= 15 && mvy >= -16 && mvy <= 15,
                  s"reconstructed backward vector ($mvx, $mvy) outside the f_code=1 range")
                pbx = mvx; pby = mvy
                bwd = Some(if (fullPelB) (mvx * 2, mvy * 2) else (mvx, mvy))
              }
              mcB(fwd, bwd, row, col)
              if (pattern) readPattern(row, col)
              dc = (128, 128, 128)
              lastF = fwd.nonEmpty; lastB = bwd.nonEmpty
              lvfx = fwd.map(_._1).getOrElse(0); lvfy = fwd.map(_._2).getOrElse(0)
              lvbx = bwd.map(_._1).getOrElse(0); lvby = bwd.map(_._2).getOrElse(0)
              lastPredValid = true
            }
          }
          if (r.atSliceEnd) sliceDone = true
        }
        code = r.nextStartCode()
      }
      val pic = Picture(width, height, y, cb, cr)
      if (!isB) { prevAnchor = lastAnchor; lastAnchor = pic } // anchors advance
      pics += ((tref, pic))
    }
    val ps = pics.result().sortBy(_._1).map(_._2) // restore display order
    if (code != 0xb7 || ps.isEmpty) None
    else Some((SeqMeta(width, height, ps.size), ps))
  }
}
