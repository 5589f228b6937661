package graft

import graft.operators.Multimodal.MediaCodecs

/** Independent-codec validation of the hand-written image formats: the
  * JDK's own `javax.imageio` decoders (a completely separate PNG/BMP
  * implementation) must read our generated files and agree pixel-for-pixel
  * — the same referee pattern as MlCrossCheck/GraphXCrossCheck, applied to
  * byte-level container formats.
  */
class ImageIOCrossCheckSpec extends org.scalatest.funsuite.AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the generated file")
    img
  }

  test("ImageIO decodes our PNGs with identical dimensions and pixels") {
    for ((w, h, seed) <- Seq((1, 1, 0L), (8, 5, 11L), (40, 23, 7L), (64, 64, 123L))) {
      val png = MediaCodecs.encodePng(w, h, seed)
      val img = read(png)
      assert(img.getWidth == w && img.getHeight == h)
      val Some((_, _, rgb)) = MediaCodecs.pngPixels(png)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val o = (y * w + x) * 3
        val ours = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
        assert((p & 0xffffff) == ours, s"pixel ($x,$y) differs: imageio=$p ours=$ours")
      }
    }
  }

  test("ImageIO agrees with our Adam7 decode pixel-for-pixel (all filters)") {
    // ragged widths/heights exercise empty and partial interlace passes;
    // the encoder cycles Sub/Up/Average/Paeth per scanline, so a wrong
    // predictor or pass offset diverges against the JDK's own decoder
    for ((w, h, seed) <- Seq((1, 1, 3L), (5, 3, 11L), (8, 8, 7L),
        (13, 9, 123L), (17, 20, 41L), (64, 33, 999L))) {
      val png = MediaCodecs.encodePngAdam7(w, h, seed)
      val img = read(png)
      assert(img.getWidth == w && img.getHeight == h)
      val Some((gw, gh, rgb)) = MediaCodecs.pngPixels(png)
      assert((gw, gh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val o = (y * w + x) * 3
        val ours = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
        assert((p & 0xffffff) == ours, s"($w x $h) pixel ($x,$y): imageio=$p ours=$ours")
        // and both equal the generator (lossless end to end)
        val want = (0 until 3).map(c => ((seed + (o + c) * 31) & 0xff).toInt)
        assert(ours == (want(0) << 16 | want(1) << 8 | want(2)),
          s"($w x $h) pixel ($x,$y) drifted from the generator")
      }
    }
    // a filter id past 4 must reject, not misdecode — corrupt the raw
    // stream by re-deflating with a bad filter byte
    val ok = MediaCodecs.encodePngAdam7(8, 8, 1L)
    assert(MediaCodecs.pngPixels(ok).isDefined)
    val cut = java.util.Arrays.copyOf(ok, ok.length - 6)
    assert(MediaCodecs.pngPixels(cut).isEmpty, "truncated PNG accepted")
  }

  test("JDK TIFF plugin agrees with our baseline decode in both byte orders") {
    for ((w, h, seed, le) <- Seq((1, 1, 5L, true), (4, 3, 9L, false),
        (13, 7, 21L, true), (16, 9, 33L, false), (31, 22, 77L, true))) {
      val tiff = MediaCodecs.encodeTiff(w, h, seed, littleEndian = le)
      val img = read(tiff)
      assert(img.getWidth == w && img.getHeight == h, s"${w}x$h le=$le dims")
      val Some((gw, gh, rgb)) = MediaCodecs.tiffPixels(tiff)
      assert((gw, gh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val o = (y * w + x) * 3
        val ours = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
        assert((p & 0xffffff) == ours,
          s"${w}x$h le=$le pixel ($x,$y): imageio=$p ours=$ours")
      }
    }
    // structural rejection: wrong magic, truncation, compressed claim
    assert(MediaCodecs.tiffPixels("no tiff here".getBytes).isEmpty)
    val ok = MediaCodecs.encodeTiff(8, 8, 1L, littleEndian = true)
    assert(MediaCodecs.tiffPixels(java.util.Arrays.copyOf(ok, ok.length - 9)).isEmpty,
      "truncated TIFF accepted")
    // crafted IFD counts: a negative count, and a huge count whose
    // cnt*width overflows Int past the bounds check, must both return
    // None — not throw NegativeArraySizeException / OOM in the task
    def withStripOffsetsCount(cnt: Int): Array[Byte] = {
      val b = ok.clone()
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = buf.getInt(4)
      val n = buf.getShort(ifd) & 0xffff
      val e = (0 until n).map(k => ifd + 2 + k * 12)
        .find(e => (buf.getShort(e) & 0xffff) == 273).get
      buf.putInt(e + 4, cnt) // StripOffsets count field
      b
    }
    assert(MediaCodecs.tiffPixels(withStripOffsetsCount(-1)).isEmpty,
      "negative IFD count accepted")
    assert(MediaCodecs.tiffPixels(withStripOffsetsCount(0x40000000)).isEmpty,
      "overflowing IFD count accepted")
  }

  test("TIFF IFD lands on a word boundary even for odd strip totals") {
    // 13x7 RGB, rowsPerStrip=7 → one strip of 273 bytes (odd); per TIFF
    // 6.0 the IFD must still begin at an even offset
    for (le <- Seq(true, false)) {
      val t = MediaCodecs.encodeTiff(13, 7, 21L, littleEndian = le, rowsPerStrip = 7)
      val buf = java.nio.ByteBuffer.wrap(t).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
      val ifd = buf.getInt(4)
      assert(ifd % 2 == 0, s"IFD offset $ifd is odd (le=$le)")
      // and both decoders still agree after the pad byte
      val img = read(t)
      assert(img.getWidth == 13 && img.getHeight == 7)
      assert(MediaCodecs.tiffPixels(t).exists { case (w, h, _) => w == 13 && h == 7 })
    }
  }

  test("our LZW round-trips every GIF frame; corruption is rejected") {
    for ((w, h, nf, seed) <- Seq((1, 1, 1, 3L), (8, 5, 3, 11L), (23, 17, 4, 77L),
        (40, 30, 2, 5L))) {
      val gif = MediaCodecs.encodeGif(w, h, nf, seed)
      val Some((dw, dh, frames)) = MediaCodecs.gifFrames(gif)
      assert(dw == w && dh == h && frames.length == nf)
      for (f <- 0 until nf; i <- 0 until w * h)
        assert((frames(f)(i) & 0xff) == ((seed + f * 17 + i.toLong * 31) & 0xff),
          s"frame $f pixel $i drifted through the LZW round-trip")
      assert(MediaCodecs.gifFrames(gif.dropRight(2)).isEmpty, "truncation accepted")
      val corrupt = gif.clone()
      corrupt(corrupt.length - 10) = (corrupt(corrupt.length - 10) ^ 0x10).toByte
      // a bit flip in the LZW stream either changes pixel count or produces
      // an invalid code — both must be rejected, never silently wrong...
      // unless the flip lands in a literal (same-length decode); accept
      // either rejection or a decode that differs from the original
      MediaCodecs.gifFrames(corrupt) match {
        case None => ()
        case Some((_, _, cf)) =>
          assert((0 until nf).exists(f => !cf(f).sameElements(frames(f))),
            "corrupted stream decoded identically")
      }
    }
    for (t <- Seq("plain text", "GIF89a but not really a gif", ""))
      assert(MediaCodecs.gifFrames(t.getBytes("UTF-8")).isEmpty)
  }

  test("ImageIO decodes our animated GIFs frame-for-frame, pixel-for-pixel") {
    val (w, h, nf, seed) = (16, 9, 3, 42L)
    val gif = MediaCodecs.encodeGif(w, h, nf, seed)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == nf, "ImageIO sees a different frame count")
    val Some((_, _, frames)) = MediaCodecs.gifFrames(gif)
    for (f <- 0 until nf) {
      val img = reader.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val idx = frames(f)(y * w + x) & 0xff
        val (r, g, b) = MediaCodecs.gifPalette(idx)
        val expected = (r << 16) | (g << 8) | b
        assert((img.getRGB(x, y) & 0xffffff) == expected,
          s"frame $f pixel ($x,$y): imageio=${img.getRGB(x, y) & 0xffffff} ours=$expected")
      }
    }
    reader.dispose()
  }

  test("Y4M raw video round-trips exactly; structural violations rejected") {
    for ((w, h, nf, seed) <- Seq((1, 1, 1, 0L), (4, 3, 5, 9L), (12, 8, 2, 77L))) {
      val y4m = MediaCodecs.encodeY4m(w, h, nf, seed)
      val Some((dw, dh, frames)) = MediaCodecs.y4mFrames(y4m)
      assert(dw == w && dh == h && frames.length == nf)
      for (f <- 0 until nf; i <- 0 until w * h * 3)
        assert((frames(f)(i) & 0xff) == ((seed + f * 23 + i.toLong * 31) & 0xff),
          s"frame $f byte $i drifted")
      // truncated plane, chopped FRAME marker, wrong chroma: all rejected
      assert(MediaCodecs.y4mFrames(y4m.dropRight(1)).isEmpty)
      assert(MediaCodecs.y4mFrames(
        new String(y4m.take(40), "ISO-8859-1").replace("C444", "C420")
          .getBytes("ISO-8859-1") ++ y4m.drop(40)).isEmpty)
    }
    for (t <- Seq("plain text", "YUV4MPEG2 W0 H0\n", ""))
      assert(MediaCodecs.y4mFrames(t.getBytes("UTF-8")).isEmpty)
  }

  test("AudioSystem parses our WAVs with identical format and samples") {
    for ((sr, ns, seed) <- Seq((8000, 1, 1L), (16000, 777, 7L), (44100, 100, 42L))) {
      val wav = MediaCodecs.encodeWavPcm16(sr, ns, seed)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt == sr && fmt.getChannels == 1 &&
        fmt.getSampleSizeInBits == 16, s"format drift: $fmt")
      assert(in.getFrameLength == ns, "frame count differs")
      val raw = in.readAllBytes()
      val Some(ours) = MediaCodecs.pcmSamples(wav)
      assert(raw.length == ns * 2)
      for (i <- 0 until ns) {
        val jdk = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        assert(jdk == ours(i), s"sample $i: jdk=$jdk ours=${ours(i)}")
      }
      in.close()
    }
  }

  test("ImageIO decodes our BMPs with identical dimensions and pixels") {
    for ((w, h, seed) <- Seq((1, 1, 5L), (10, 6, 99L), (33, 7, 42L))) {
      val bmp = MediaCodecs.encodeBmp(w, h, seed)
      val img = read(bmp)
      assert(img.getWidth == w && img.getHeight == h)
      // our encoder writes bottom-up rows of BGR bytes: pixel (x, y-from-top)
      // lives at row (h-1-y) in the byte array
      val rowSize = (w * 3 + 3) / 4 * 4
      for (y <- 0 until h; x <- 0 until w) {
        val off = 54 + (h - 1 - y) * rowSize + x * 3
        val ours = ((bmp(off + 2) & 0xff) << 16) | ((bmp(off + 1) & 0xff) << 8) | (bmp(off) & 0xff)
        assert((img.getRGB(x, y) & 0xffffff) == ours, s"pixel ($x,$y) differs")
      }
    }
  }
}
