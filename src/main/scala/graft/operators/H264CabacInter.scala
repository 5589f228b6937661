package graft.operators

/** H.264/AVC CABAC INTER decoding — P slices under
  * entropy_coding_mode_flag = 1 (ITU-T H.264 §9.3.3.1.1, the q316
  * construction-inverse gate; the CAVLC twin is q309). Reuses
  * [[H264Cabac]]'s arithmetic engine, residual chain and intra slice
  * codec (frame 0 is a full q314 CABAC intra IDR picture), and
  * [[H264]]'s motion machinery unchanged: median MV prediction with
  * the directional shortcuts, P_Skip motion inference, quarter-pel
  * 6-tap luma + eighth-pel chroma MC, the two-frame sliding-window
  * DPB, and the shared encoder/decoder inter reconstruction.
  *
  * CABAC inter syntax covered, with neighbor-based context increments:
  *
  *  - mb_skip_flag (§9.3.3.1.1.1: one context per count of available
  *    non-skipped neighbors) — replacing CAVLC's mb_skip_run.
  *  - P mb_type as the Table 9-37 tree over bins ('000' P_L0_16x16,
  *    '011' 16x8, '010' 8x16, '001' P_8x8; the '1' intra-suffix
  *    prefix is out of construction scope and falls through), with
  *    the bin-2 context split on bin 1 pinned as this repo's
  *    convention (same policy as the q314 Table 9-39 row pin).
  *  - sub_mb_type P tree ('1' P_L0_8x8 — the only value the
  *    construction emits; the 8x4/4x8/4x4 branches parse and fall
  *    through, mirroring q309's CAVLC scope).
  *  - ref_idx_l0 unary with the refIdx>0 neighbor conditions.
  *  - mvd_l0 as UEG3 (uCoff 9): TU prefix whose bin-0 context is the
  *    |mvdA|+|mvdB| bucket (<3 / ≤32 / >32) over per-4x4-cell mvd
  *    grids, per-bin contexts for bins 1-3, a shared context past
  *    bin 3, bypass 3rd-order Exp-Golomb suffix and bypass sign.
  *  - coded_block_pattern bin-coded (the full 0..47 sweep — CAVLC's
  *    q309 was bounded by the transcribed me(v) subset head; CABAC
  *    has no such table, so the construction sweeps every value).
  *  - The residual chain is [[H264Cabac.encodeResidual]] with
  *    curIntra = false: §9.3.3.1.1.9's unavailable-neighbor
  *    coded_block_flag condition flips to 0 for inter macroblocks.
  *
  * B slices (q317) ride the same engine: mb_skip_flag and the
  * Table 9-37 B mb_type tree ('0' B_Direct_16x16, '100' B_L0_16x16,
  * '101' B_L1_16x16, '110000' B_Bi_16x16) with the explicit-neighbor
  * bin-0 condition (skip/direct neighbors count 0), per-list UEG3
  * mvd contexts over per-list grids, and q313's spatial-direct
  * machinery (MinPositive refs, per-cell colZeroFlag, default
  * biprediction) plus POC-type-0 output ordering, all unchanged.
  *
  * Scope bounds (documented fall-throughs, same policy as the CAVLC
  * inter path): P/B slices with mb_qp_delta 0 and no intra MBs inside
  * them, one or two L0 references (one per list in B), non-reference
  * B pictures, and uniform context init per [[H264Cabac]]'s scope
  * note. BOTH direct modes decode: spatial (§8.4.1.2.2, q317) and
  * TEMPORAL (§8.4.1.2.3 POC-distance MV scaling, q318) — the
  * direct_spatial_mv_pred_flag picks the derivation per slice.
  */
object H264CabacInter {

  import H264.{BitReader, BitWriter, ConstructB, ConstructH, ConstructP,
    DirectMotion, H264Frame, H264Stream, InterMb, MotionGrid, PartKind,
    Planes, blkPos, directMotion, fillDirect, mvPred, skipMv, nPartsOf,
    partKindOf, partRect, reconstructBMb, reconstructDirectMb,
    reconstructInterMb, skipMb}
  import H264Cabac.{CatChromaAc, CatChromaDc, CatLuma4, CtxCbpChroma,
    CtxCbpLuma, CtxMbQpDelta, Decoder, Encoder, SliceCtx,
    encodeResidual, decodeResidual}

  // -------------------------------------------------------------------
  // context map extension (appended after H264Cabac's intra space)
  // -------------------------------------------------------------------
  val CtxSkipP = 280 // + inc 0..2 (available non-skipped neighbors)
  val CtxMbTypeP = 283 // bins: +0, +1, +2 (b1=0) / +3 (b1=1)
  val CtxSubMbTypeP = 287 // bins 0..2
  val CtxRefIdx = 290 // bin0 + inc 0..3; bin1 at +4; rest at +5
  val CtxMvdX = 296 // bin0 + inc 0..2; bins 1-3 at +3..+5; rest +6
  val CtxMvdY = 303
  /** B-slice additions (q317): mvd_l1 gets its own component pair —
    * §9.3.3.1.1.7 buckets on the SAME list's neighbor |mvd|.
    */
  val CtxMvdX1 = 310
  val CtxMvdY1 = 317
  val CtxSkipB = 324 // + inc 0..2
  val CtxMbTypeB = 327 // bin0 + inc 0..2; bin1 at +3; bins >= 2 at +4
  val CtxCountP = 332

  /** mbKind codes stored into [[H264Cabac.SliceCtx]] for P slices
    * (the intra codes 0/1 never occur inside a P slice here).
    */
  final val KindInter = 2
  final val KindSkip = 3
  final val KindDirect = 4

  /** q316's deterministic construction: [[H264.ConstructP]] for skip/
    * type/refIdx/mvd/levels, plus a full-sweep CBP (CABAC codes the
    * pattern as six bins, so unlike CAVLC's transcribed me(v) head
    * every value 0..47 is reachable).
    */
  object ConstructPC {
    def cbp48(id: Long, f: Int, mb: Int): Int =
      ((id + 5L * f + 29L * mb) % 48).toInt
    /** Wider than q309's ±8: |mvd| reaches 20 quarter-pels so the
      * UEG3 prefix saturates at uCoff 9 and the bypass Exp-Golomb
      * suffix is genuinely exercised (±8 never escapes the TU part).
      */
    def mvdX(id: Long, f: Int, mb: Int, part: Int): Int =
      (((id + 3L * f + 5L * mb + 7L * part) % 41) - 20).toInt
    def mvdY(id: Long, f: Int, mb: Int, part: Int): Int =
      (((3L * id + f + 2L * mb + 5L * part) % 41) - 20).toInt
  }

  // -------------------------------------------------------------------
  // encode
  // -------------------------------------------------------------------

  /** Encode an IDR + P-frame CABAC stream (q316): frame 0 is the q314
    * CABAC intra construction, frames 1.. are P slices. Returns
    * (bytes, per-frame expected reconstructions + gate sums).
    */
  def encodeInter(id: Long, wMb: Int, hMb: Int, nFrames: Int,
      qp: Int): (Array[Byte], Vector[H264Frame]) = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(nal(7, spsRbsp(wMb, hMb)))
    out.write(nal(8, ppsRbsp()))
    val frames = Vector.newBuilder[H264Frame]
    val b0 = Vector.newBuilder[H264Frame]
    val rbsp0 = H264Cabac.encodeSlice(id, 0, wMb, hMb, qp, b0)
    out.write(nal(5, rbsp0))
    val fr0 = b0.result().head
    frames += fr0
    var dpb: List[(Array[Int], Array[Int], Array[Int])] =
      List((fr0.y, fr0.cb, fr0.cr))
    for (f <- 1 until nFrames) {
      val (rbsp, fr, _) = encodePSlice(id, f, wMb, hMb, qp, dpb.toIndexedSeq)
      out.write(nal(1, rbsp))
      frames += fr
      dpb = ((fr.y, fr.cb, fr.cr) :: dpb).take(2)
    }
    (out.toByteArray, frames.result())
  }

  private def nal(typ: Int, rbsp: Array[Byte],
      refIdc: Int = 3): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0, 0, 1))
    out.write((refIdc << 5) | typ)
    out.write(H264.emulationPrevent(rbsp))
    out.toByteArray
  }

  private def spsRbsp(wMb: Int, hMb: Int,
      pocType: Int = 2): Array[Byte] = {
    val w = new BitWriter
    w.put(77, 8) // profile_idc: Main
    w.put(0, 8); w.put(10, 8)
    w.ue(0); w.ue(0) // sps_id, log2_max_frame_num_minus4
    w.ue(pocType) // pic_order_cnt_type (0 for the B stream's reorder)
    if (pocType == 0) w.ue(4) // log2_max_pic_order_cnt_lsb_minus4 -> 8 bits
    w.ue(2) // max_num_ref_frames: two-frame sliding window (after pocType)
    w.put(0, 1)
    w.ue(wMb - 1); w.ue(hMb - 1)
    w.put(1, 1) // frame_mbs_only
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.rbspTrailing()
    w.result()
  }

  private def ppsRbsp(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0)
    w.put(1, 1) // entropy_coding_mode_flag = 1: CABAC
    w.put(0, 1)
    w.ue(0); w.ue(0); w.ue(0) // one slice group, 1 active ref per list
    w.put(0, 1); w.put(0, 2)
    w.se(0); w.se(0); w.se(0)
    w.put(1, 1) // deblocking_filter_control_present
    w.put(0, 1); w.put(0, 1)
    w.rbspTrailing()
    w.result()
  }

  /** mb_skip_flag ctxInc: available neighbors that are NOT skipped
    * (§9.3.3.1.1.1; within this P slice every decoded MB is inter).
    */
  private def skipInc(sc: SliceCtx, wMb: Int, mbX: Int, mbY: Int): Int = {
    def c(x: Int, y: Int): Int =
      if (sc.avail(x, y) && sc.mbKind(y * wMb + x) != KindSkip) 1 else 0
    c(mbX - 1, mbY) + c(mbX, mbY - 1)
  }

  /** ref_idx_l0 bin-0 conditions from the motion grid (a neighbor
    * partition with refIdx > 0; skip cells carry refIdx 0).
    */
  private def refInc(g: MotionGrid, gx: Int, gy: Int): Int = {
    def c(x: Int, y: Int): Int =
      if (g.decoded(x, y) && g.ref(y)(x) > 0) 1 else 0
    c(gx - 1, gy) + 2 * c(gx, gy - 1)
  }

  /** |mvd| bucket for the UEG3 prefix's bin 0 (§9.3.3.1.1.7). */
  private def mvdInc(am: Array[Array[Int]], gx: Int, gy: Int): Int = {
    def at(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || y >= am.length || x >= am(0).length) 0
      else am(y)(x)
    val s = at(gx - 1, gy) + at(gx, gy - 1)
    if (s < 3) 0 else if (s <= 32) 1 else 2
  }

  private def mvdCtx(base: Int, inc0: Int, bin: Int): Int =
    if (bin == 0) base + inc0
    else if (bin <= 3) base + 2 + bin
    else base + 6

  private def encodeMvd(e: Encoder, base: Int, inc0: Int, v: Int): Unit = {
    val a = math.abs(v)
    val prefix = math.min(a, 9)
    var b = 0
    while (b < prefix) { e.decision(mvdCtx(base, inc0, b), 1); b += 1 }
    if (prefix < 9) e.decision(mvdCtx(base, inc0, prefix), 0)
    else {
      // 3rd-order Exp-Golomb bypass suffix of a - 9
      var k = 3
      var rem = a - 9
      while (rem >= (1 << k)) { e.bypass(1); rem -= 1 << k; k += 1 }
      e.bypass(0)
      var i = k - 1
      while (i >= 0) { e.bypass((rem >> i) & 1); i -= 1 }
    }
    if (a > 0) e.bypass(if (v < 0) 1 else 0)
  }

  private def decodeMvd(d: Decoder, base: Int, inc0: Int): Int = {
    var a = 0
    while (a < 9 && d.decision(mvdCtx(base, inc0, a)) == 1) a += 1
    if (a == 9) {
      var k = 3
      while (d.bypass() == 1) {
        a += 1 << k; k += 1
        if (k > 24) throw new IllegalStateException("runaway mvd EG3")
      }
      var i = 0
      var suffix = 0
      while (i < k) { suffix = (suffix << 1) | d.bypass(); i += 1 }
      a += suffix
    }
    if (a > 0 && d.bypass() == 1) -a else a
  }

  /** Spec hooks: the mvd UEG3 round-trip with a fixed bin-0 bucket. */
  private[operators] def testEncodeMvd(e: Encoder, v: Int): Unit =
    encodeMvd(e, CtxMvdX, 0, v)
  private[operators] def testDecodeMvd(d: Decoder): Int =
    decodeMvd(d, CtxMvdX, 0)

  private def encodePSlice(id: Long, f: Int, wMb: Int, hMb: Int,
      qp: Int, refs: IndexedSeq[(Array[Int], Array[Int], Array[Int])],
      pocLsb: Option[Int] = None)
    : (Array[Byte], H264Frame, MotionGrid) = {
    val nRefs = math.min(refs.size, 2)
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(5) // slice_type: P (all slices in pic)
    w.ue(0) // pps_id
    w.put(f % 16, 4) // frame_num
    pocLsb.foreach(v => w.put(v, 8)) // pic_order_cnt_lsb (POC type 0)
    if (nRefs == 2) { w.put(1, 1); w.ue(1) } else w.put(0, 1)
    w.put(0, 1) // ref_pic_list_modification_flag_l0
    w.put(0, 1) // adaptive_ref_pic_marking_mode_flag
    w.ue(0) // cabac_init_idc
    w.se(qp - 26)
    w.ue(1) // disable_deblocking_filter_idc
    w.alignByteOnes() // cabac_alignment_one_bit
    val e = new Encoder(w, CtxCountP)
    val sc = new SliceCtx(wMb, hMb)
    val grid = new MotionGrid(wMb * 4, hMb * 4)
    val amx = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amy = Array.ofDim[Int](hMb * 4, wMb * 4)
    val y = new Array[Int](wMb * 16 * hMb * 16)
    val cb = new Array[Int](wMb * 8 * hMb * 8)
    val cr = new Array[Int](wMb * 8 * hMb * 8)
    var checksum = 0L; var mvdSum = 0L; var refSum = 0L
    var nSkip = 0L; var typeSum = 0L; var cbpSum = 0L
    def sumBlock(mbIdx: Int, tag: Int, levels: Array[Int]): Unit = {
      var s = 0
      while (s < levels.length) {
        if (levels(s) != 0)
          checksum += levels(s).toLong * (mbIdx * 131 + tag * 17 + s + 1)
        s += 1
      }
    }
    val total = wMb * hMb
    for (mbIdx <- 0 until total) {
      val mbX = mbIdx % wMb; val mbY = mbIdx / wMb
      val gx0 = mbX * 4; val gy0 = mbY * 4
      val skip = ConstructP.isSkip(id, f, mbIdx)
      e.decision(CtxSkipP + skipInc(sc, wMb, mbX, mbY), if (skip) 1 else 0)
      if (skip) {
        nSkip += 1
        sc.mbKind(mbIdx) = KindSkip
        val (mx, my) = skipMv(grid, gx0, gy0)
        grid.fill(gx0, gy0, 4, 4, mx, my, 0)
        reconstructInterMb(skipMb.copy(mv = Array((mx, my))), qp, mbX,
          mbY, refs, y, cb, cr, wMb, hMb)
      } else {
        sc.mbKind(mbIdx) = KindInter
        val pt = ConstructP.ptype(id, f, mbIdx)
        typeSum += (pt + 1L) * (mbIdx + 1)
        // mb_type tree: '0' inter prefix, then (b1, b2)
        e.decision(CtxMbTypeP + 0, 0)
        val b1 = if (pt == 1 || pt == 2) 1 else 0
        val b2 = if (pt == 3 || pt == 1) 1 else 0
        e.decision(CtxMbTypeP + 1, b1)
        e.decision(CtxMbTypeP + (if (b1 == 0) 2 else 3), b2)
        val np = nPartsOf(pt)
        if (pt == 3)
          for (_ <- 0 until np) e.decision(CtxSubMbTypeP + 0, 1) // P_L0_8x8
        val refIdxArr = Array.tabulate(np)(p =>
          ConstructP.refIdx(id, mbIdx, p, nRefs))
        val mvds = Array.tabulate(np)(p =>
          (ConstructPC.mvdX(id, f, mbIdx, p), ConstructPC.mvdY(id, f, mbIdx, p)))
        val mvs = new Array[(Int, Int)](np)
        for (p <- 0 until np) {
          val (cx, cy, cw, ch) = partRect(pt, p)
          if (nRefs == 2) {
            val inc = refInc(grid, gx0 + cx, gy0 + cy)
            e.decision(CtxRefIdx + inc, if (refIdxArr(p) > 0) 1 else 0)
            if (refIdxArr(p) > 0) e.decision(CtxRefIdx + 4, 0) // unary stop
            refSum += refIdxArr(p).toLong * (mbIdx + 1)
          }
          encodeMvd(e, CtxMvdX, mvdInc(amx, gx0 + cx, gy0 + cy), mvds(p)._1)
          encodeMvd(e, CtxMvdY, mvdInc(amy, gx0 + cx, gy0 + cy), mvds(p)._2)
          mvdSum += (mbIdx * 64L + p * 8 + 1) * mvds(p)._1 +
            (mbIdx * 64L + p * 8 + 3) * mvds(p)._2
          val (mpx, mpy) = mvPred(grid, gx0 + cx, gy0 + cy, cw,
            refIdxArr(p), partKindOf(pt, p))
          mvs(p) = (mpx + mvds(p)._1, mpy + mvds(p)._2)
          grid.fill(gx0 + cx, gy0 + cy, cw, ch, mvs(p)._1, mvs(p)._2,
            refIdxArr(p))
          for (yy <- gy0 + cy until gy0 + cy + ch;
              xx <- gx0 + cx until gx0 + cx + cw) {
            amx(yy)(xx) = math.abs(mvds(p)._1)
            amy(yy)(xx) = math.abs(mvds(p)._2)
          }
        }
        val cbp = ConstructPC.cbp48(id, f, mbIdx)
        cbpSum += cbp.toLong * (mbIdx + 1)
        val cbpL = cbp & 15; val cbpC = cbp >> 4
        for (b8 <- 0 until 4) {
          val bx = b8 % 2; val by = b8 / 2
          e.decision(CtxCbpLuma + sc.cbpLumaInc(mbX, mbY, bx, by),
            (cbpL >> b8) & 1)
          sc.cbpLumaBit(mbY * 2 + by)(mbX * 2 + bx) = (cbpL >> b8) & 1
        }
        e.decision(CtxCbpChroma + sc.cbpChromaInc(mbX, mbY, 0),
          if (cbpC > 0) 1 else 0)
        if (cbpC > 0)
          e.decision(CtxCbpChroma + 4 + sc.cbpChromaInc(mbX, mbY, 1),
            if (cbpC == 2) 1 else 0)
        sc.cbpChroma(mbIdx) = cbpC
        if (cbp != 0) e.decision(CtxMbQpDelta, 0) // mb_qp_delta = 0
        val ac = Array.tabulate(16) { b =>
          if (((cbpL >> (b / 4)) & 1) != 0)
            ConstructH.blockLevels(id, f, mbIdx, 1 + b, 16)
          else new Array[Int](16)
        }
        for (b <- 0 until 16 if ((cbpL >> (b / 4)) & 1) != 0) {
          sumBlock(mbIdx, 1 + b, ac(b))
          val (x4, y4) = blkPos(b)
          val cbf = encodeResidual(e, sc, CatLuma4, mbX, mbY, b, 0,
            ac(b), curIntra = false)
          sc.lumaCbf(mbY * 4 + y4)(mbX * 4 + x4) = cbf
        }
        val cdc = Array.tabulate(2)(c =>
          if (cbpC > 0) ConstructH.blockLevels(id, f, mbIdx, 17 + c, 4)
          else new Array[Int](4))
        if (cbpC > 0) for (c <- 0 until 2) {
          sumBlock(mbIdx, 17 + c, cdc(c))
          sc.chromaDcCbf(c)(mbIdx) = encodeResidual(e, sc, CatChromaDc,
            mbX, mbY, 0, c, cdc(c), curIntra = false)
        }
        val cac = Array.tabulate(2, 4)((c, b) =>
          if (cbpC == 2) ConstructH.blockLevels(id, f, mbIdx, 19 + 4 * c + b, 15)
          else new Array[Int](15))
        if (cbpC == 2) for (c <- 0 until 2; b <- 0 until 4) {
          sumBlock(mbIdx, 19 + 4 * c + b, cac(c)(b))
          sc.chromaAcCbf(c)(mbY * 2 + b / 2)(mbX * 2 + b % 2) =
            encodeResidual(e, sc, CatChromaAc, mbX, mbY, b, c,
              cac(c)(b), curIntra = false)
        }
        reconstructInterMb(InterMb(pt, refIdxArr, mvs, cbpL, cbpC, ac,
          cdc, cac), qp, mbX, mbY, refs, y, cb, cr, wMb, hMb)
      }
      e.terminate(if (mbIdx == total - 1) 1 else 0) // end_of_slice_flag
    }
    w.alignByte()
    (w.result(), H264Frame(y, cb, cr, checksum, 0L, 0L, 0L, 0L,
      mvdSum, refSum, nSkip, typeSum, cbpSum = cbpSum,
      poc = pocLsb.map(_.toLong).getOrElse(-1L)), grid)
  }

  // -------------------------------------------------------------------
  // B slices (q317): spatial direct + biprediction under CABAC
  // -------------------------------------------------------------------

  /** mb_type bin-0 / mb_skip_flag conditions for B slices: only an
    * available EXPLICIT inter neighbor counts (B_Skip and B_Direct
    * neighbors contribute 0, §9.3.3.1.1.2-3).
    */
  private def btypeInc(sc: SliceCtx, wMb: Int, mbX: Int, mbY: Int): Int = {
    def c(x: Int, y: Int): Int =
      if (sc.avail(x, y) && sc.mbKind(y * wMb + x) == KindInter) 1 else 0
    c(mbX - 1, mbY) + c(mbX, mbY - 1)
  }

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** TEMPORAL direct motion (§8.4.1.2.3, q318): the co-located 4x4
    * cell's L0 motion in RefPicList1[0] is scaled by the POC-distance
    * ratio — tx = (16384 + |td/2|) / td, DistScaleFactor =
    * Clip3(-1024, 1023, (tb*tx + 32) >> 6), mvL0 = (DSF*mvCol + 128)
    * >> 8, mvL1 = mvL0 - mvCol — with both prediction flags set and
    * refIdx 0 in each single-entry list. An intra/absent co-located
    * field contributes zero motion; the long-term-reference branch
    * (mvL0 = mvCol, mvL1 = 0) is out of scope with no long-term refs
    * in the DPB.
    */
  def directMotionTemporal(colGrid: Option[MotionGrid], gx0: Int,
      gy0: Int, pocCur: Int, pocL0: Int, pocL1: Int): DirectMotion = {
    val tb = clip3(-128, 127, pocCur - pocL0)
    val td = clip3(-128, 127, pocL1 - pocL0)
    val tx = (16384 + math.abs(td / 2)) / td
    val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    val mv0 = new Array[(Int, Int)](16)
    val mv1 = new Array[(Int, Int)](16)
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val (colX, colY) = colGrid match {
        case Some(cg) if cg.ref(gy0 + cy)(gx0 + cx) >= 0 =>
          (cg.mvx(gy0 + cy)(gx0 + cx), cg.mvy(gy0 + cy)(gx0 + cx))
        case _ => (0, 0)
      }
      val l0 = ((dsf * colX + 128) >> 8, (dsf * colY + 128) >> 8)
      mv0(cy * 4 + cx) = l0
      mv1(cy * 4 + cx) = (l0._1 - colX, l0._2 - colY)
    }
    DirectMotion(use0 = true, use1 = true, mv0, mv1)
  }

  /** Encode the q313 decode-order plan — I(poc 0), P(poc 6), B(poc 2),
    * B(poc 4) — under CABAC (q317; q318 with `spatial = false` flips
    * every direct/skip MB to TEMPORAL direct). Frame 0 is the q314
    * intra construction with a POC-type-0 slice header; the P frame is
    * the q316 P slice; the two non-reference B frames carry B_Skip,
    * B_Direct_16x16 and explicit L0/L1/Bi MBs with the full bin-coded
    * CBP sweep. Returns frames in DECODE order with their POCs.
    */
  def encodeBi(id: Long, wMb: Int, hMb: Int, qp: Int,
      spatial: Boolean = true): (Array[Byte], Vector[H264Frame]) = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(nal(7, spsRbsp(wMb, hMb, pocType = 0)))
    out.write(nal(8, ppsRbsp()))
    val frames = Vector.newBuilder[H264Frame]
    val b0 = Vector.newBuilder[H264Frame]
    val rbsp0 = H264Cabac.encodeSlice(id, 0, wMb, hMb, qp, b0,
      pocLsb = Some(ConstructB.Pocs(0)))
    out.write(nal(5, rbsp0))
    val fr0 = b0.result().head.copy(poc = ConstructB.Pocs(0).toLong)
    frames += fr0
    val ref0 = (fr0.y, fr0.cb, fr0.cr)
    val (rbspP, frP0, gridP) = encodePSlice(id, 1, wMb, hMb, qp,
      IndexedSeq(ref0), pocLsb = Some(ConstructB.Pocs(1)))
    val frP = frP0.copy(poc = ConstructB.Pocs(1).toLong)
    out.write(nal(1, rbspP))
    frames += frP
    val refP = (frP.y, frP.cb, frP.cr)
    for (f <- 2 until 4) {
      val (rbspB, frB) = encodeBSlice(id, f, wMb, hMb, qp,
        ref0, refP, Some(gridP), ConstructB.Pocs(f), spatial)
      out.write(nal(1, rbspB, refIdc = 0)) // non-reference picture
      frames += frB.copy(poc = ConstructB.Pocs(f).toLong)
    }
    (out.toByteArray, frames.result())
  }

  private def emptyResidual: InterMb =
    InterMb(0, Array(0), Array((0, 0)), 0, 0,
      Array.fill(16)(new Array[Int](16)), Array.fill(2)(new Array[Int](4)),
      Array.fill(2, 4)(new Array[Int](15)))

  private def encodeBSlice(id: Long, f: Int, wMb: Int, hMb: Int,
      qp: Int, l0: Planes, l1: Planes, colGrid: Option[MotionGrid],
      pocLsb: Int, spatial: Boolean): (Array[Byte], H264Frame) = {
    // the Bi plan's fixed reference POCs (I past, P future)
    val pocL0 = ConstructB.Pocs(0); val pocL1 = ConstructB.Pocs(1)
    def derive(gridL0: MotionGrid, gridL1: MotionGrid, gx0: Int,
        gy0: Int): DirectMotion =
      if (spatial) directMotion(gridL0, gridL1, gx0, gy0, colGrid)
      else directMotionTemporal(colGrid, gx0, gy0, pocLsb, pocL0, pocL1)
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(6) // slice_type: B (all slices in pic)
    w.ue(0) // pps_id
    w.put(f % 16, 4) // frame_num
    w.put(pocLsb, 8) // pic_order_cnt_lsb
    w.put(if (spatial) 1 else 0, 1) // direct_spatial_mv_pred_flag
    w.put(0, 1) // num_ref_idx override: one active ref per list
    w.put(0, 1); w.put(0, 1) // ref_pic_list_modification l0, l1
    // non-reference picture: NO dec_ref_pic_marking
    w.ue(0) // cabac_init_idc
    w.se(qp - 26)
    w.ue(1) // disable_deblocking_filter_idc
    w.alignByteOnes() // cabac_alignment_one_bit
    val e = new Encoder(w, CtxCountP)
    val sc = new SliceCtx(wMb, hMb)
    val gridL0 = new MotionGrid(wMb * 4, hMb * 4)
    val gridL1 = new MotionGrid(wMb * 4, hMb * 4)
    val amx0 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amy0 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amx1 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amy1 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val y = new Array[Int](wMb * 16 * hMb * 16)
    val cb = new Array[Int](wMb * 8 * hMb * 8)
    val cr = new Array[Int](wMb * 8 * hMb * 8)
    var checksum = 0L; var mvdSum = 0L; var typeSum = 0L
    var nSkip = 0L; var nDirect = 0L; var cbpSum = 0L
    def sumBlock(mbIdx: Int, tag: Int, levels: Array[Int]): Unit = {
      var s = 0
      while (s < levels.length) {
        if (levels(s) != 0)
          checksum += levels(s).toLong * (mbIdx * 131 + tag * 17 + s + 1)
        s += 1
      }
    }
    def constructLevels(mbIdx: Int, cbpL: Int, cbpC: Int) = {
      val ac = Array.tabulate(16)(b =>
        if ((cbpL >> (b / 4) & 1) != 0)
          ConstructH.blockLevels(id, f, mbIdx, 1 + b, 16)
        else new Array[Int](16))
      val cdc = Array.tabulate(2)(c =>
        if (cbpC > 0) ConstructH.blockLevels(id, f, mbIdx, 17 + c, 4)
        else new Array[Int](4))
      val cac = Array.tabulate(2, 4)((c, b) =>
        if (cbpC == 2) ConstructH.blockLevels(id, f, mbIdx, 19 + 4 * c + b, 15)
        else new Array[Int](15))
      (ac, cdc, cac)
    }
    // CBP bins + qp_delta + residual, shared by direct/explicit paths
    def encodeCbpResiduals(mbIdx: Int, mbX: Int, mbY: Int)
      : (Int, Int, Array[Array[Int]], Array[Array[Int]], Array[Array[Array[Int]]]) = {
      val cbp = ConstructPC.cbp48(id, f, mbIdx)
      cbpSum += cbp.toLong * (mbIdx + 1)
      val cbpL = cbp & 15; val cbpC = cbp >> 4
      for (b8 <- 0 until 4) {
        val bx = b8 % 2; val by = b8 / 2
        e.decision(CtxCbpLuma + sc.cbpLumaInc(mbX, mbY, bx, by),
          (cbpL >> b8) & 1)
        sc.cbpLumaBit(mbY * 2 + by)(mbX * 2 + bx) = (cbpL >> b8) & 1
      }
      e.decision(CtxCbpChroma + sc.cbpChromaInc(mbX, mbY, 0),
        if (cbpC > 0) 1 else 0)
      if (cbpC > 0)
        e.decision(CtxCbpChroma + 4 + sc.cbpChromaInc(mbX, mbY, 1),
          if (cbpC == 2) 1 else 0)
      sc.cbpChroma(mbIdx) = cbpC
      if (cbp != 0) e.decision(CtxMbQpDelta, 0) // mb_qp_delta = 0
      val (ac, cdc, cac) = constructLevels(mbIdx, cbpL, cbpC)
      for (b <- 0 until 16 if ((cbpL >> (b / 4)) & 1) != 0) {
        sumBlock(mbIdx, 1 + b, ac(b))
        val (x4, y4) = blkPos(b)
        sc.lumaCbf(mbY * 4 + y4)(mbX * 4 + x4) = encodeResidual(e, sc,
          CatLuma4, mbX, mbY, b, 0, ac(b), curIntra = false)
      }
      if (cbpC > 0) for (c <- 0 until 2) {
        sumBlock(mbIdx, 17 + c, cdc(c))
        sc.chromaDcCbf(c)(mbIdx) = encodeResidual(e, sc, CatChromaDc,
          mbX, mbY, 0, c, cdc(c), curIntra = false)
      }
      if (cbpC == 2) for (c <- 0 until 2; b <- 0 until 4) {
        sumBlock(mbIdx, 19 + 4 * c + b, cac(c)(b))
        sc.chromaAcCbf(c)(mbY * 2 + b / 2)(mbX * 2 + b % 2) =
          encodeResidual(e, sc, CatChromaAc, mbX, mbY, b, c,
            cac(c)(b), curIntra = false)
      }
      (cbpL, cbpC, ac, cdc, cac)
    }
    val total = wMb * hMb
    for (mbIdx <- 0 until total) {
      val mbX = mbIdx % wMb; val mbY = mbIdx / wMb
      val gx0 = mbX * 4; val gy0 = mbY * 4
      val skip = ConstructB.isSkipB(id, f, mbIdx)
      e.decision(CtxSkipB + skipInc(sc, wMb, mbX, mbY), if (skip) 1 else 0)
      if (skip) {
        nSkip += 1
        sc.mbKind(mbIdx) = KindSkip
        val dm = derive(gridL0, gridL1, gx0, gy0)
        fillDirect(gridL0, gridL1, dm, gx0, gy0)
        reconstructDirectMb(dm, l0, l1, emptyResidual, qp, mbX, mbY,
          y, cb, cr, wMb, hMb)
      } else if (ConstructB.isDirectB(id, f, mbIdx)) {
        nDirect += 1
        e.decision(CtxMbTypeB + btypeInc(sc, wMb, mbX, mbY), 0) // '0'
        sc.mbKind(mbIdx) = KindDirect
        val dm = derive(gridL0, gridL1, gx0, gy0)
        fillDirect(gridL0, gridL1, dm, gx0, gy0)
        val (cbpL, cbpC, ac, cdc, cac) = encodeCbpResiduals(mbIdx, mbX, mbY)
        reconstructDirectMb(dm, l0, l1,
          InterMb(0, Array(0), Array((0, 0)), cbpL, cbpC, ac, cdc, cac),
          qp, mbX, mbY, y, cb, cr, wMb, hMb)
      } else {
        val bt = ConstructB.btype(id, f, mbIdx) // 1 L0 / 2 L1 / 3 Bi
        typeSum += bt.toLong * (mbIdx + 1)
        e.decision(CtxMbTypeB + btypeInc(sc, wMb, mbX, mbY), 1)
        // '100' L0 / '101' L1 / '110000' Bi
        if (bt == 3) {
          e.decision(CtxMbTypeB + 3, 1)
          for (_ <- 0 until 4) e.decision(CtxMbTypeB + 4, 0)
        } else {
          e.decision(CtxMbTypeB + 3, 0)
          e.decision(CtxMbTypeB + 4, if (bt == 2) 1 else 0)
        }
        sc.mbKind(mbIdx) = KindInter
        val useL0 = bt == 1 || bt == 3
        val useL1 = bt == 2 || bt == 3
        var mvL0 = (0, 0); var mvL1 = (0, 0)
        if (useL0) {
          val (dx, dy) = (ConstructB.mvdX(id, f, mbIdx, 0),
            ConstructB.mvdY(id, f, mbIdx, 0))
          encodeMvd(e, CtxMvdX, mvdInc(amx0, gx0, gy0), dx)
          encodeMvd(e, CtxMvdY, mvdInc(amy0, gx0, gy0), dy)
          mvdSum += (mbIdx * 64L + 1) * dx + (mbIdx * 64L + 3) * dy
          val (px, py) = mvPred(gridL0, gx0, gy0, 4, 0, PartKind.Full)
          mvL0 = (px + dx, py + dy)
          for (yy <- gy0 until gy0 + 4; xx <- gx0 until gx0 + 4) {
            amx0(yy)(xx) = math.abs(dx); amy0(yy)(xx) = math.abs(dy)
          }
        }
        if (useL1) {
          val (dx, dy) = (ConstructB.mvdX(id, f, mbIdx, 1),
            ConstructB.mvdY(id, f, mbIdx, 1))
          encodeMvd(e, CtxMvdX1, mvdInc(amx1, gx0, gy0), dx)
          encodeMvd(e, CtxMvdY1, mvdInc(amy1, gx0, gy0), dy)
          mvdSum += (mbIdx * 64L + 17) * dx + (mbIdx * 64L + 19) * dy
          val (px, py) = mvPred(gridL1, gx0, gy0, 4, 0, PartKind.Full)
          mvL1 = (px + dx, py + dy)
          for (yy <- gy0 until gy0 + 4; xx <- gx0 until gx0 + 4) {
            amx1(yy)(xx) = math.abs(dx); amy1(yy)(xx) = math.abs(dy)
          }
        }
        gridL0.fill(gx0, gy0, 4, 4, mvL0._1, mvL0._2, if (useL0) 0 else -1)
        gridL1.fill(gx0, gy0, 4, 4, mvL1._1, mvL1._2, if (useL1) 0 else -1)
        val (cbpL, cbpC, ac, cdc, cac) = encodeCbpResiduals(mbIdx, mbX, mbY)
        reconstructBMb(useL0, useL1, mvL0, mvL1, l0, l1,
          InterMb(0, Array(0), Array((0, 0)), cbpL, cbpC, ac, cdc, cac),
          qp, mbX, mbY, y, cb, cr, wMb, hMb)
      }
      e.terminate(if (mbIdx == total - 1) 1 else 0)
    }
    w.alignByte()
    (w.result(), H264Frame(y, cb, cr, checksum, 0L, 0L, 0L, 0L,
      mvdSum, 0L, nSkip, typeSum, nDirect = nDirect, cbpSum = cbpSum))
  }

  // -------------------------------------------------------------------
  // decode
  // -------------------------------------------------------------------

  /** Decode a stream this construction emits; None for anything
    * outside the envelope (CAVLC PPS, intra MBs inside P/B slices,
    * sub-partitions other than P_L0_8x8, temporal direct, nonzero
    * mb_qp_delta — the fall-through contract). Handles both the
    * POC-type-2 P stream (q316) and the POC-type-0 I/P/B stream
    * (q317); B frames never enter the DPB.
    */
  def decode(bytes: Array[Byte]): Option[H264Stream] = {
    try {
      val nals = Vector.newBuilder[(Int, Int, Array[Byte])]
      var i = 0
      var start = -1
      var typ = -1
      var refIdc = 0
      while (i + 2 < bytes.length) {
        if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
          if (start >= 0) {
            val end = if (i > 0 && bytes(i - 1) == 0) i - 1 else i
            nals += ((typ, refIdc, H264.emulationStrip(
              java.util.Arrays.copyOfRange(bytes, start, end))))
          }
          typ = bytes(i + 3) & 0x1f
          refIdc = (bytes(i + 3) >> 5) & 3
          start = i + 4
          i += 4
        } else i += 1
      }
      if (start >= 0 && start <= bytes.length)
        nals += ((typ, refIdc, H264.emulationStrip(
          java.util.Arrays.copyOfRange(bytes, start, bytes.length))))
      var wMb = -1; var hMb = -1
      var sawPps = false
      var qp = -1
      var pocType = -1
      var decOrder = 0
      // (poc, planes, motion grid) — grid only for P pictures, used as
      // the co-located field by spatial direct
      var dpb: List[(Int, Planes, Option[MotionGrid])] = Nil
      val frames = Vector.newBuilder[H264Frame]
      nals.result().foreach {
        case (7, _, rbsp) =>
          val r = new BitReader(rbsp)
          if (r.get(8) != 77) return None // Main profile
          r.get(16)
          if (r.ue() != 0 || r.ue() != 0) return None
          pocType = r.ue()
          if (pocType == 0) { if (r.ue() != 4) return None }
          else if (pocType != 2) return None
          r.ue(); r.get(1) // max_num_ref_frames, gaps flag
          wMb = r.ue() + 1; hMb = r.ue() + 1
          if (r.get(1) != 1) return None
        case (8, _, rbsp) =>
          val r = new BitReader(rbsp)
          if (r.ue() != 0 || r.ue() != 0) return None
          if (r.get(1) != 1) return None // CABAC only here
          r.get(1); r.ue(); r.ue(); r.ue(); r.get(1); r.get(2)
          r.se(); r.se(); r.se()
          if (r.get(1) != 1) return None
          r.get(1); r.get(1)
          sawPps = true
        case (5, _, rbsp) =>
          if (wMb < 0 || !sawPps) return None
          val r = new BitReader(rbsp)
          if (r.ue() != 0) return None
          if (r.ue() != 7) return None // I slice
          if (r.ue() != 0) return None
          r.get(4); r.ue() // frame_num, idr_pic_id
          val poc = if (pocType == 0) r.get(8) else decOrder * 2
          r.get(1); r.get(1) // dec_ref_pic_marking
          qp = 26 + r.se()
          if (qp > 29) return None
          if (r.ue() != 1) return None
          val pad = (8 - r.bitPos % 8) % 8
          if (pad > 0 && r.get(pad) != (1 << pad) - 1) return None
          val fr0 = H264Cabac.decodeSlice(rbsp, r.bitPos, wMb, hMb, qp)
          val fr = if (pocType == 0) fr0.copy(poc = poc.toLong) else fr0
          frames += fr
          decOrder += 1
          dpb = List((poc, (fr.y, fr.cb, fr.cr), None))
        case (1, nri, rbsp) =>
          if (wMb < 0 || !sawPps || dpb.isEmpty) return None
          val r = new BitReader(rbsp)
          if (r.ue() != 0) return None
          r.ue() match {
            case 5 => // P slice
              if (r.ue() != 0) return None
              r.get(4) // frame_num
              val poc = if (pocType == 0) r.get(8) else decOrder * 2
              val nRefs =
                if (r.get(1) == 1) { // num_ref_idx_active_override
                  val n = r.ue() + 1
                  if (n > 2) return None
                  n
                } else 1
              if (nRefs > dpb.size) return None
              if (r.get(1) != 0) return None // list modification
              if (r.get(1) != 0) return None // adaptive marking
              if (r.ue() != 0) return None // cabac_init_idc
              if (26 + r.se() != qp) return None
              if (r.ue() != 1) return None
              val pad = (8 - r.bitPos % 8) % 8
              if (pad > 0 && r.get(pad) != (1 << pad) - 1) return None
              val (fr0, grid) = decodePSlice(rbsp, r.bitPos, wMb, hMb,
                qp, nRefs, dpb.map(_._2).toIndexedSeq)
              val fr = if (pocType == 0) fr0.copy(poc = poc.toLong) else fr0
              frames += fr
              decOrder += 1
              dpb = ((poc, (fr.y, fr.cb, fr.cr),
                Some(grid): Option[MotionGrid]) :: dpb).take(2)
            case 6 => // B slice: non-reference, POC type 0 only
              if (pocType != 0) return None
              if (nri != 0) return None
              if (r.ue() != 0) return None
              r.get(4) // frame_num
              val poc = r.get(8)
              val spatialDirect = r.get(1) == 1 // else temporal (q318)
              if (r.get(1) != 0) return None // num_ref_idx override
              if (r.get(1) != 0 || r.get(1) != 0) return None // list mods
              // non-reference: no dec_ref_pic_marking
              if (r.ue() != 0) return None // cabac_init_idc
              if (26 + r.se() != qp) return None
              if (r.ue() != 1) return None
              val pad = (8 - r.bitPos % 8) % 8
              if (pad > 0 && r.get(pad) != (1 << pad) - 1) return None
              val past = dpb.filter(_._1 < poc).sortBy(-_._1)
              val future = dpb.filter(_._1 > poc).sortBy(_._1)
              if (past.isEmpty || future.isEmpty) return None
              frames += decodeBSlice(rbsp, r.bitPos, wMb, hMb, qp, poc,
                past.head._1, past.head._2, future.head._1,
                future.head._2, future.head._3, spatialDirect)
              decOrder += 1
            case _ => return None
          }
        case _ => return None
      }
      val fs = frames.result()
      if (wMb < 0 || fs.size < 2) None
      else Some(H264Stream(wMb, hMb, qp, fs))
    } catch { case _: Exception => None }
  }

  private def decodePSlice(rbsp: Array[Byte], startBit: Int, wMb: Int,
      hMb: Int, qp: Int, nRefs: Int,
      refs: IndexedSeq[(Array[Int], Array[Int], Array[Int])])
    : (H264Frame, MotionGrid) = {
    def bad(msg: String): Nothing = throw new IllegalStateException(msg)
    val d = new Decoder(rbsp, startBit, CtxCountP)
    val sc = new SliceCtx(wMb, hMb)
    val grid = new MotionGrid(wMb * 4, hMb * 4)
    val amx = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amy = Array.ofDim[Int](hMb * 4, wMb * 4)
    val y = new Array[Int](wMb * 16 * hMb * 16)
    val cb = new Array[Int](wMb * 8 * hMb * 8)
    val cr = new Array[Int](wMb * 8 * hMb * 8)
    var checksum = 0L; var mvdSum = 0L; var refSum = 0L
    var nSkip = 0L; var typeSum = 0L; var cbpSum = 0L
    def sumBlock(mbIdx: Int, tag: Int, levels: Array[Int]): Unit = {
      var s = 0
      while (s < levels.length) {
        if (levels(s) != 0)
          checksum += levels(s).toLong * (mbIdx * 131 + tag * 17 + s + 1)
        s += 1
      }
    }
    val total = wMb * hMb
    for (mbIdx <- 0 until total) {
      val mbX = mbIdx % wMb; val mbY = mbIdx / wMb
      val gx0 = mbX * 4; val gy0 = mbY * 4
      val skip = d.decision(CtxSkipP + skipInc(sc, wMb, mbX, mbY)) == 1
      if (skip) {
        nSkip += 1
        sc.mbKind(mbIdx) = KindSkip
        val (mx, my) = skipMv(grid, gx0, gy0)
        grid.fill(gx0, gy0, 4, 4, mx, my, 0)
        reconstructInterMb(skipMb.copy(mv = Array((mx, my))), qp, mbX,
          mbY, refs, y, cb, cr, wMb, hMb)
      } else {
        sc.mbKind(mbIdx) = KindInter
        if (d.decision(CtxMbTypeP + 0) != 0) bad("intra MB in P slice")
        val b1 = d.decision(CtxMbTypeP + 1)
        val b2 = d.decision(CtxMbTypeP + (if (b1 == 0) 2 else 3))
        val pt =
          if (b1 == 0) { if (b2 == 0) 0 else 3 }
          else { if (b2 == 0) 2 else 1 }
        typeSum += (pt + 1L) * (mbIdx + 1)
        val np = nPartsOf(pt)
        if (pt == 3) for (_ <- 0 until np)
          if (d.decision(CtxSubMbTypeP + 0) != 1)
            bad("sub_mb_type beyond P_L0_8x8 out of scope")
        val refIdxArr = new Array[Int](np)
        val mvs = new Array[(Int, Int)](np)
        for (p <- 0 until np) {
          val (cx, cy, cw, ch) = partRect(pt, p)
          refIdxArr(p) =
            if (nRefs == 2) {
              val inc = refInc(grid, gx0 + cx, gy0 + cy)
              if (d.decision(CtxRefIdx + inc) == 0) 0
              else {
                if (d.decision(CtxRefIdx + 4) != 0)
                  bad("ref_idx beyond active list")
                1
              }
            } else 0
          if (nRefs == 2) refSum += refIdxArr(p).toLong * (mbIdx + 1)
          val mvdx = decodeMvd(d, CtxMvdX, mvdInc(amx, gx0 + cx, gy0 + cy))
          val mvdy = decodeMvd(d, CtxMvdY, mvdInc(amy, gx0 + cx, gy0 + cy))
          mvdSum += (mbIdx * 64L + p * 8 + 1) * mvdx +
            (mbIdx * 64L + p * 8 + 3) * mvdy
          val (mpx, mpy) = mvPred(grid, gx0 + cx, gy0 + cy, cw,
            refIdxArr(p), partKindOf(pt, p))
          mvs(p) = (mpx + mvdx, mpy + mvdy)
          grid.fill(gx0 + cx, gy0 + cy, cw, ch, mvs(p)._1, mvs(p)._2,
            refIdxArr(p))
          for (yy <- gy0 + cy until gy0 + cy + ch;
              xx <- gx0 + cx until gx0 + cx + cw) {
            amx(yy)(xx) = math.abs(mvdx)
            amy(yy)(xx) = math.abs(mvdy)
          }
        }
        var cbpL = 0
        for (b8 <- 0 until 4) {
          val bx = b8 % 2; val by = b8 / 2
          val bit = d.decision(CtxCbpLuma + sc.cbpLumaInc(mbX, mbY, bx, by))
          cbpL |= bit << b8
          sc.cbpLumaBit(mbY * 2 + by)(mbX * 2 + bx) = bit
        }
        var cbpC = 0
        if (d.decision(CtxCbpChroma + sc.cbpChromaInc(mbX, mbY, 0)) == 1)
          cbpC = 1 + d.decision(CtxCbpChroma + 4 + sc.cbpChromaInc(mbX, mbY, 1))
        sc.cbpChroma(mbIdx) = cbpC
        val cbp = cbpL | (cbpC << 4)
        cbpSum += cbp.toLong * (mbIdx + 1)
        if (cbp != 0 && d.decision(CtxMbQpDelta) != 0)
          bad("nonzero mb_qp_delta out of scope")
        val ac = Array.fill(16)(new Array[Int](16))
        for (b <- 0 until 16 if ((cbpL >> (b / 4)) & 1) != 0) {
          val (blk, cbf) = decodeResidual(d, sc, CatLuma4, mbX, mbY, b,
            0, 16, curIntra = false)
          ac(b) = blk
          sumBlock(mbIdx, 1 + b, blk)
          val (x4, y4) = blkPos(b)
          sc.lumaCbf(mbY * 4 + y4)(mbX * 4 + x4) = cbf
        }
        val cdc = Array.fill(2)(new Array[Int](4))
        if (cbpC > 0) for (c <- 0 until 2) {
          val (blk, cbf) = decodeResidual(d, sc, CatChromaDc, mbX, mbY,
            0, c, 4, curIntra = false)
          cdc(c) = blk
          sumBlock(mbIdx, 17 + c, blk)
          sc.chromaDcCbf(c)(mbIdx) = cbf
        }
        val cac = Array.fill(2, 4)(new Array[Int](15))
        if (cbpC == 2) for (c <- 0 until 2; b <- 0 until 4) {
          val (blk, cbf) = decodeResidual(d, sc, CatChromaAc, mbX, mbY,
            b, c, 15, curIntra = false)
          cac(c)(b) = blk
          sumBlock(mbIdx, 19 + 4 * c + b, blk)
          sc.chromaAcCbf(c)(mbY * 2 + b / 2)(mbX * 2 + b % 2) = cbf
        }
        reconstructInterMb(InterMb(pt, refIdxArr, mvs, cbpL, cbpC, ac,
          cdc, cac), qp, mbX, mbY, refs, y, cb, cr, wMb, hMb)
      }
      val end = d.terminate() == 1
      if (mbIdx == total - 1) { if (!end) bad("missing end_of_slice") }
      else if (end) bad("early end_of_slice")
    }
    (H264Frame(y, cb, cr, checksum, 0L, 0L, 0L, 0L, mvdSum, refSum,
      nSkip, typeSum, cbpSum = cbpSum), grid)
  }

  private def decodeBSlice(rbsp: Array[Byte], startBit: Int, wMb: Int,
      hMb: Int, qp: Int, poc: Int, pocL0: Int, l0: Planes, pocL1: Int,
      l1: Planes, colGrid: Option[MotionGrid],
      spatial: Boolean): H264Frame = {
    def bad(msg: String): Nothing = throw new IllegalStateException(msg)
    def derive(gridL0: MotionGrid, gridL1: MotionGrid, gx0: Int,
        gy0: Int): DirectMotion =
      if (spatial) directMotion(gridL0, gridL1, gx0, gy0, colGrid)
      else directMotionTemporal(colGrid, gx0, gy0, poc, pocL0, pocL1)
    val d = new Decoder(rbsp, startBit, CtxCountP)
    val sc = new SliceCtx(wMb, hMb)
    val gridL0 = new MotionGrid(wMb * 4, hMb * 4)
    val gridL1 = new MotionGrid(wMb * 4, hMb * 4)
    val amx0 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amy0 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amx1 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val amy1 = Array.ofDim[Int](hMb * 4, wMb * 4)
    val y = new Array[Int](wMb * 16 * hMb * 16)
    val cb = new Array[Int](wMb * 8 * hMb * 8)
    val cr = new Array[Int](wMb * 8 * hMb * 8)
    var checksum = 0L; var mvdSum = 0L; var typeSum = 0L
    var nSkip = 0L; var nDirect = 0L; var cbpSum = 0L
    def sumBlock(mbIdx: Int, tag: Int, levels: Array[Int]): Unit = {
      var s = 0
      while (s < levels.length) {
        if (levels(s) != 0)
          checksum += levels(s).toLong * (mbIdx * 131 + tag * 17 + s + 1)
        s += 1
      }
    }
    def decodeCbpResiduals(mbIdx: Int, mbX: Int, mbY: Int)
      : (Int, Int, Array[Array[Int]], Array[Array[Int]], Array[Array[Array[Int]]]) = {
      var cbpL = 0
      for (b8 <- 0 until 4) {
        val bx = b8 % 2; val by = b8 / 2
        val bit = d.decision(CtxCbpLuma + sc.cbpLumaInc(mbX, mbY, bx, by))
        cbpL |= bit << b8
        sc.cbpLumaBit(mbY * 2 + by)(mbX * 2 + bx) = bit
      }
      var cbpC = 0
      if (d.decision(CtxCbpChroma + sc.cbpChromaInc(mbX, mbY, 0)) == 1)
        cbpC = 1 + d.decision(CtxCbpChroma + 4 + sc.cbpChromaInc(mbX, mbY, 1))
      sc.cbpChroma(mbIdx) = cbpC
      val cbp = cbpL | (cbpC << 4)
      cbpSum += cbp.toLong * (mbIdx + 1)
      if (cbp != 0 && d.decision(CtxMbQpDelta) != 0)
        bad("nonzero mb_qp_delta out of scope")
      val ac = Array.fill(16)(new Array[Int](16))
      for (b <- 0 until 16 if ((cbpL >> (b / 4)) & 1) != 0) {
        val (blk, cbf) = decodeResidual(d, sc, CatLuma4, mbX, mbY, b,
          0, 16, curIntra = false)
        ac(b) = blk
        sumBlock(mbIdx, 1 + b, blk)
        val (x4, y4) = blkPos(b)
        sc.lumaCbf(mbY * 4 + y4)(mbX * 4 + x4) = cbf
      }
      val cdc = Array.fill(2)(new Array[Int](4))
      if (cbpC > 0) for (c <- 0 until 2) {
        val (blk, cbf) = decodeResidual(d, sc, CatChromaDc, mbX, mbY,
          0, c, 4, curIntra = false)
        cdc(c) = blk
        sumBlock(mbIdx, 17 + c, blk)
        sc.chromaDcCbf(c)(mbIdx) = cbf
      }
      val cac = Array.fill(2, 4)(new Array[Int](15))
      if (cbpC == 2) for (c <- 0 until 2; b <- 0 until 4) {
        val (blk, cbf) = decodeResidual(d, sc, CatChromaAc, mbX, mbY,
          b, c, 15, curIntra = false)
        cac(c)(b) = blk
        sumBlock(mbIdx, 19 + 4 * c + b, blk)
        sc.chromaAcCbf(c)(mbY * 2 + b / 2)(mbX * 2 + b % 2) = cbf
      }
      (cbpL, cbpC, ac, cdc, cac)
    }
    val total = wMb * hMb
    for (mbIdx <- 0 until total) {
      val mbX = mbIdx % wMb; val mbY = mbIdx / wMb
      val gx0 = mbX * 4; val gy0 = mbY * 4
      val skip = d.decision(CtxSkipB + skipInc(sc, wMb, mbX, mbY)) == 1
      if (skip) {
        nSkip += 1
        sc.mbKind(mbIdx) = KindSkip
        val dm = derive(gridL0, gridL1, gx0, gy0)
        fillDirect(gridL0, gridL1, dm, gx0, gy0)
        reconstructDirectMb(dm, l0, l1, emptyResidual, qp, mbX, mbY,
          y, cb, cr, wMb, hMb)
      } else if (d.decision(CtxMbTypeB + btypeInc(sc, wMb, mbX, mbY)) == 0) {
        // B_Direct_16x16
        nDirect += 1
        sc.mbKind(mbIdx) = KindDirect
        val dm = derive(gridL0, gridL1, gx0, gy0)
        fillDirect(gridL0, gridL1, dm, gx0, gy0)
        val (cbpL, cbpC, ac, cdc, cac) = decodeCbpResiduals(mbIdx, mbX, mbY)
        reconstructDirectMb(dm, l0, l1,
          InterMb(0, Array(0), Array((0, 0)), cbpL, cbpC, ac, cdc, cac),
          qp, mbX, mbY, y, cb, cr, wMb, hMb)
      } else {
        val bt =
          if (d.decision(CtxMbTypeB + 3) == 1) {
            for (_ <- 0 until 4)
              if (d.decision(CtxMbTypeB + 4) != 0)
                bad("B mb_type beyond Bi_16x16 out of scope")
            3
          } else if (d.decision(CtxMbTypeB + 4) == 1) 2
          else 1
        typeSum += bt.toLong * (mbIdx + 1)
        sc.mbKind(mbIdx) = KindInter
        val useL0 = bt == 1 || bt == 3
        val useL1 = bt == 2 || bt == 3
        var mvL0 = (0, 0); var mvL1 = (0, 0)
        if (useL0) {
          val dx = decodeMvd(d, CtxMvdX, mvdInc(amx0, gx0, gy0))
          val dy = decodeMvd(d, CtxMvdY, mvdInc(amy0, gx0, gy0))
          mvdSum += (mbIdx * 64L + 1) * dx + (mbIdx * 64L + 3) * dy
          val (px, py) = mvPred(gridL0, gx0, gy0, 4, 0, PartKind.Full)
          mvL0 = (px + dx, py + dy)
          for (yy <- gy0 until gy0 + 4; xx <- gx0 until gx0 + 4) {
            amx0(yy)(xx) = math.abs(dx); amy0(yy)(xx) = math.abs(dy)
          }
        }
        if (useL1) {
          val dx = decodeMvd(d, CtxMvdX1, mvdInc(amx1, gx0, gy0))
          val dy = decodeMvd(d, CtxMvdY1, mvdInc(amy1, gx0, gy0))
          mvdSum += (mbIdx * 64L + 17) * dx + (mbIdx * 64L + 19) * dy
          val (px, py) = mvPred(gridL1, gx0, gy0, 4, 0, PartKind.Full)
          mvL1 = (px + dx, py + dy)
          for (yy <- gy0 until gy0 + 4; xx <- gx0 until gx0 + 4) {
            amx1(yy)(xx) = math.abs(dx); amy1(yy)(xx) = math.abs(dy)
          }
        }
        gridL0.fill(gx0, gy0, 4, 4, mvL0._1, mvL0._2, if (useL0) 0 else -1)
        gridL1.fill(gx0, gy0, 4, 4, mvL1._1, mvL1._2, if (useL1) 0 else -1)
        val (cbpL, cbpC, ac, cdc, cac) = decodeCbpResiduals(mbIdx, mbX, mbY)
        reconstructBMb(useL0, useL1, mvL0, mvL1, l0, l1,
          InterMb(0, Array(0), Array((0, 0)), cbpL, cbpC, ac, cdc, cac),
          qp, mbX, mbY, y, cb, cr, wMb, hMb)
      }
      val end = d.terminate() == 1
      if (mbIdx == total - 1) { if (!end) bad("missing end_of_slice") }
      else if (end) bad("early end_of_slice")
    }
    H264Frame(y, cb, cr, checksum, 0L, 0L, 0L, 0L, mvdSum, 0L,
      nSkip, typeSum, poc = poc.toLong, nDirect = nDirect, cbpSum = cbpSum)
  }
}
