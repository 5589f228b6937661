package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.core.Readers
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {

  private def media = {
    val s = spark
    import s.implicits._
    graft.core.Tables(s, sfDir, "documents")
      .limit(50)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val modality = Seq("image", "audio", "video")((id % 3).toInt)
        MediaRow(id, modality, s"application/x-$modality", text.getBytes("UTF-8"))
      }
  }

  test("binary feature extraction: schema, determinism, batch independence") {
    val a = Multimodal.extractFeatures(media, batchSize = 7).collect().sortBy(_.id)
    val b = Multimodal.extractFeatures(media.repartition(5), batchSize = 3).collect().sortBy(_.id)
    assert(a.toSeq == b.toSeq, "features must not depend on partitioning or batch size")
    assert(a.length == 50)
    val f = a.head
    assert(f.n_bytes > 0 && f.byte_entropy > 0 && f.head_hist.length == 16)
    // entropy of ~31-word lowercase text: bounded by log2(256)
    assert(a.forall(x => x.byte_entropy > 1.0 && x.byte_entropy < 8.0))
    // stub decode fills modality-appropriate metadata
    assert(a.filter(_.modality == "image").forall(x => x.width >= 64 && x.n_frames == 1))
    assert(a.filter(_.modality == "audio").forall(x => x.sample_rate >= 8000))
    assert(a.filter(_.modality == "video").forall(x => x.n_frames >= 1))
  }

  test("resize and frame-sample stubs preserve the plumbing contract") {
    val bytes = "hello world".getBytes("UTF-8")
    assert(Multimodal.resizeStub(bytes, 4).toSeq == bytes.take(4).toSeq)
    assert(Multimodal.resizeStub(bytes, 20).length == 20)
    assert(Multimodal.frameSampleStub(bytes, 3).length == 4)
  }
}

class ReadersSpec extends SparkSpec {

  test("schema-pair JSON scan builds typed TestCases") {
    val json =
      """[{"id": "db:t1|db2:t2",
        |  "gold_mapping": [["subject_id", "person_id"]],
        |  "source_schema": [{"name": "subject_id", "type": "integer", "column_description": "pk", "is_pk": true},
        |                    {"name": "dob", "type": "timestamp"}],
        |  "target_schema": [{"name": "person_id", "type": "integer"}]}]""".stripMargin
    val dir = Files.createTempDirectory("graft-json")
    val f = dir.resolve("cases.json")
    Files.writeString(f, json)
    val cases = Readers.schemaPairJson(spark, f.toString)
    assert(cases.length == 1)
    val tc = cases.head
    assert(tc.id == "db:t1|db2:t2")
    assert(tc.goldMapping == Seq("subject_id" -> "person_id"))
    assert(tc.sourceSchema.map(_.name) == Seq("subject_id", "dob"))
    assert(tc.sourceSchema.head.isPk && tc.sourceSchema.head.description == "pk")
    assert(tc.targetSchema.map(_.name) == Seq("person_id"))
  }

  test("schema-pair JSON: the reference's NESTED dialect with YES/NO pk flags") {
    val json =
      """[{"id": "mimic-iii:ADMISSIONS|omop:VISIT_OCCURRENCE",
        |  "gold_mapping": [["SUBJECT_ID", "person_id"], ["HADM_ID", "visit_occurrence_id"]],
        |  "source_schema": {"name": "ADMISSIONS", "description": "admissions table",
        |    "columns": [{"name": "subject_id", "type": "integer",
        |                 "column_description": "links to PATIENTS", "is_pk": "NO"},
        |                {"name": "hadm_id", "type": "integer", "is_pk": "YES"}]},
        |  "target_schema": {"name": "VISIT_OCCURRENCE",
        |    "columns": [{"name": "person_id", "type": "integer", "is_pk": "NO"}]},
        |  "source_rows": 129, "target_rows": 116}]""".stripMargin
    val dir = Files.createTempDirectory("graft-json2")
    Files.writeString(dir.resolve("cases.json"), json)
    val tc = Readers.schemaPairJson(spark, dir.resolve("cases.json").toString).head
    assert(tc.goldMapping == Seq("SUBJECT_ID" -> "person_id", "HADM_ID" -> "visit_occurrence_id"))
    assert(tc.sourceSchema.map(_.name) == Seq("subject_id", "hadm_id"))
    assert(!tc.sourceSchema.head.isPk && tc.sourceSchema(1).isPk)
    assert(tc.sourceSchema.head.description == "links to PATIENTS")
    assert(tc.targetSchema.map(_.name) == Seq("person_id"))
  }

  test("all-string CSV reconciles to the declared schema") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("t.csv")
    Files.writeString(f, "Subject_ID,Old_Name\n1,alice\n2,bob\n")
    val df = Readers.csvAllString(spark, f.toString,
      declaredCols = Seq("subject_id", "name", "missing_col"),
      renames = Map("old_name" -> "name"))
    assert(df.columns.toSeq == Seq("subject_id", "name", "missing_col"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.orderBy("subject_id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bob"))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("BMP/WAV codecs round-trip; text bytes always fall back to the stub") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaCodecs
    for ((w, h) <- Seq((1, 1), (5, 3), (64, 64), (33, 7))) {
      val bmp = MediaCodecs.encodeBmp(w, h, seed = 42)
      assert(MediaCodecs.decodeBmp(bmp).contains(Multimodal.Decoded(w, h, 1, 0)),
        s"BMP $w x $h did not round-trip")
      assert(bmp.length == 54 + (w * 3 + 3) / 4 * 4 * h, "BMP size formula drift")
      // a truncated file must be rejected (size field no longer matches)
      assert(MediaCodecs.decodeBmp(bmp.dropRight(1)).isEmpty)
    }
    for ((sr, ns) <- Seq((8000, 1), (16000, 777), (44100, 100))) {
      val wav = MediaCodecs.encodeWavPcm16(sr, ns, seed = 7)
      assert(MediaCodecs.decodeWav(wav).contains(Multimodal.Decoded(0, 0, ns, sr)),
        s"WAV $sr/$ns did not round-trip")
      assert(MediaCodecs.decodeWav(wav.dropRight(2)).isEmpty)
    }
    // arbitrary text bytes (even starting with the magic) never parse:
    // the embedded size fields can't match the byte count by accident
    for (t <- Seq("plain text", "BM text that starts with the bmp magic",
        "RIFFxxxxWAVEfmt and then some", "")) {
      val bytes = t.getBytes("UTF-8")
      assert(MediaCodecs.decodeBmp(bytes).isEmpty && MediaCodecs.decodeWav(bytes).isEmpty,
        s"false positive on: $t")
    }
  }

  test("PNG codec: real zlib round-trip; any corruption is rejected") {
    import graft.operators.Multimodal.MediaCodecs
    for ((w, h) <- Seq((1, 1), (8, 5), (40, 23))) {
      val png = MediaCodecs.encodePng(w, h, seed = 11)
      val Some((dw, dh, rgb)) = MediaCodecs.pngPixels(png)
      assert(dw == w && dh == h && rgb.length == w * h * 3,
        s"PNG $w x $h did not round-trip")
      // pixel byte i is the documented pure function of (seed, i)
      rgb.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xff) == ((11 + i * 31) & 0xff), s"pixel $i drifted")
      }
      // flip one IDAT byte: the chunk CRC must catch it
      val corrupt = png.clone()
      corrupt(8 + 25 + 10) = (corrupt(8 + 25 + 10) ^ 0x40).toByte
      assert(MediaCodecs.pngPixels(corrupt).isEmpty, "CRC did not catch corruption")
      // truncation is rejected
      assert(MediaCodecs.pngPixels(png.dropRight(3)).isEmpty)
    }
    // non-PNG bytes never parse
    for (t <- Seq("plain text", "PNG pretender", ""))
      assert(MediaCodecs.pngPixels(t.getBytes("UTF-8")).isEmpty)
  }

  test("BMP resize: identity preserves pixels; downsample has the right dims and bytes") {
    import graft.operators.Multimodal.{Decoded, MediaCodecs}
    val src = MediaCodecs.encodeBmp(10, 6, seed = 99)
    // identity resize re-encodes the same pixel grid (padding bytes are
    // zeroed on re-encode; only pixel bytes carry image content)
    val ident = MediaCodecs.resizeBmp(src, 10, 6).get
    val row = (10 * 3 + 3) / 4 * 4
    assert((0 until 6).forall(y => (0 until 30).forall(i =>
      ident(54 + y * row + i) == src(54 + y * row + i))))
    val small = MediaCodecs.resizeBmp(src, 4, 3).get
    assert(MediaCodecs.decodeBmp(small).contains(Decoded(4, 3, 1, 0)))
    assert(small.length == 54 + (4 * 3 + 3) / 4 * 4 * 3)
    // nearest-neighbor: target (0,0) samples source (0,0) exactly
    assert((0 until 3).forall(c => small(54 + c) == src(54 + c)))
    // non-BMP input refuses rather than corrupting
    assert(MediaCodecs.resizeBmp("not a bmp".getBytes, 4, 4).isEmpty)
  }

  test("MP4 box layer round-trips and rejects non-BMFF bytes") {
    import graft.operators.Multimodal.MediaCodecs
    val bytes = MediaCodecs.encodeMp4(timescale = 1000, duration = 7500,
      Seq(("avc1", 320, 240, 48, 8), ("mp4a", 0, 0, 120, 0)), seed = 99L)
    val m = MediaCodecs.parseMp4(bytes).get
    assert(m.durationMs == 7500 && m.nTracks == 2)
    assert(m.codecs == Seq("avc1", "mp4a"))
    assert(m.width == 320 && m.height == 240)
    assert(m.nSamples == 48 + 120)
    // video: ceil(48/8) stss entries; audio: no stss → all 120 sync
    assert(m.nKeyframes == 6 + 120)
    // a video-only track WITHOUT stss defaults to all-sync (spec)
    val noStss = MediaCodecs.encodeMp4(1000, 1000,
      Seq(("avc1", 64, 64, 10, 0)), seed = 1L)
    assert(MediaCodecs.parseMp4(noStss).get.nKeyframes == 10)
    // strict validation: text bytes, truncated boxes, missing ftyp
    assert(MediaCodecs.parseMp4("just some text bytes here".getBytes).isEmpty)
    assert(MediaCodecs.parseMp4(bytes.take(20)).isEmpty)
    assert(MediaCodecs.parseMp4(bytes.drop(28)).isEmpty) // moov first, no ftyp
    // 64-bit largesize form parses: rewrite ftyp as size==1 + largesize
    val ftypLen = java.nio.ByteBuffer.wrap(bytes).getInt(0)
    val big = java.nio.ByteBuffer.allocate(bytes.length + 8)
    big.putInt(1).put(bytes, 4, 4).putLong(ftypLen + 8L)
      .put(bytes, 8, ftypLen - 8).put(bytes, ftypLen, bytes.length - ftypLen)
    assert(MediaCodecs.parseMp4(big.array()).get == m)
  }

  test("MP3 frame walk round-trips and rejects non-MPEG bytes") {
    import graft.operators.Multimodal.MediaCodecs
    val bytes = MediaCodecs.encodeMp3(bitrateIdx = 9, rateIdx = 0,
      nFrames = 40, id3Content = 300, seed = 5L)
    val m = MediaCodecs.parseMp3(bytes).get
    assert(m.id3Bytes == 310 && m.nFrames == 40)
    assert(m.bitrateKbps == 128 && m.sampleRate == 44100)
    assert(m.durationMs == 40L * 1152 * 1000 / 44100)
    // synchsafe tag size: 300 spans two 7-bit groups
    assert((bytes(8) & 0x7f) == (300 >> 7) && (bytes(9) & 0x7f) == (300 & 0x7f))
    // bare frame stream (tag stripped) parses with id3Bytes == 0
    val mb = MediaCodecs.parseMp3(bytes.drop(310)).get
    assert(mb.id3Bytes == 0 && mb.nFrames == 40 && mb.durationMs == m.durationMs)
    // tag alone (no frames), text bytes, and a too-short buffer all reject
    assert(MediaCodecs.parseMp3(bytes.take(310)).isEmpty)
    assert(MediaCodecs.parseMp3("definitely not an mpeg stream".getBytes).isEmpty)
    assert(MediaCodecs.parseMp3(Array[Byte](0x49, 0x44)).isEmpty)
    // the padding bit alternates, so both frame-length branches walked:
    // 144·128000/44100 = 417 — first two frames start 418 and 417 apart
    // (seed=5 → frame 0 padded, frame 1 not)
    val f0 = 310
    assert((bytes(f0) & 0xff) == 0xff && ((bytes(f0 + 2) >> 1) & 1) == 1)
    assert((bytes(f0 + 418) & 0xff) == 0xff && ((bytes(f0 + 418 + 2) >> 1) & 1) == 0)
  }

  test("AVI/MJPEG: real per-frame JPEG decode; container corruption rejects") {
    import graft.operators.Multimodal.MediaCodecs
    val bytes = MediaCodecs.encodeAviMjpeg(width = 20, height = 12,
      nFrames = 3, seed = 7L)
    val (meta, frames) = MediaCodecs.aviMjpegFrames(bytes).get
    assert(meta == MediaCodecs.AviMeta(20, 12, 3) && frames.length == 3)
    // every frame is a REAL lossy JPEG of a single seed-derived color:
    // dims exact, per-channel deviation bounded
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth == 20 && img.getHeight == 12)
      val src = ((7L + f) * 2654435761L & 0xffffffL).toInt
      val p = img.getRGB(3, 3)
      (0 until 3).foreach { c =>
        assert(math.abs(((p >> (8 * c)) & 0xff) - ((src >> (8 * c)) & 0xff)) <= 8)
      }
    }
    // the codec chain picks it up as video (not the stub's 320x240)
    val d = new graft.operators.Multimodal.HeaderCodec()
      .decode("video", "video/x-msvideo", bytes)
    assert(d.width == 20 && d.height == 12 && d.nFrames == 3)
    // strict validation: wrong magic, truncation, an oversized chunk
    // size field, and a corrupted frame byte all reject (fall through)
    assert(MediaCodecs.aviMjpegFrames("RIFFnotavi".getBytes).isEmpty)
    assert(MediaCodecs.aviMjpegFrames(bytes.take(bytes.length / 2)).isEmpty)
    val overs = bytes.clone()
    overs(4) = (overs(4) ^ 0x40).toByte // RIFF size no longer matches
    assert(MediaCodecs.aviMjpegFrames(overs).isEmpty)
    // lying size fields must fall through, never throw: a LIST whose
    // declared size (0) cannot hold its own list type...
    val lyingList = "RIFF".getBytes ++ Array[Byte](12, 0, 0, 0) ++
      "AVI LIST".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(MediaCodecs.aviMjpegFrames(lyingList).isEmpty)
    // ...and an hdrl too small for avih's 56-byte header
    val tinyHdrl = "RIFF".getBytes ++ Array[Byte](20, 0, 0, 0) ++
      "AVI LIST".getBytes ++ Array[Byte](8, 0, 0, 0) ++ "hdrlavih".getBytes
    assert(MediaCodecs.aviMjpegFrames(tinyHdrl).isEmpty)
    val corrupt = bytes.clone()
    // flip a byte inside the first JPEG's SOI marker (after movi header)
    val moviAt = {
      var i = 12
      while (new String(corrupt, i + 8, 4, "US-ASCII") != "movi") i += 1
      i
    }
    corrupt(moviAt + 20) = 0x00 // clobber the frame's JPEG magic
    assert(MediaCodecs.aviMjpegFrames(corrupt).isEmpty)
  }

  test("JSONL ingest normalizes null tokens and dedups") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("t.jsonl")
    Files.writeString(f,
      """{"a": "x", "b": "null"}
        |{"a": "x", "b": "null"}
        |{"a": "", "b": "y"}
        |""".stripMargin)
    val df = Readers.jsonlNormalized(spark, f.toString, Readers.allStringSchema(Seq("a", "b")))
    val rows = df.orderBy(col("a").asc_nulls_first).collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(0) && rows(0).getString(1) == "y")
    assert(rows(1).getString(0) == "x" && rows(1).isNullAt(1))
  }

  test("Avro container: roundtrip, reader-schema resolution, codec metadata") {
    import graft.sources.AvroBytes
    // V2 writer: tier survives verbatim
    val v2rows = Seq((1L, "web", 0.25, Some("gold")), (2L, "wiki", 7.5, Some("std")))
    val (codec2, dec2) = AvroBytes.decode(AvroBytes.encode(AvroBytes.WriterV2, v2rows))
    assert(codec2 == "deflate")
    assert(dec2 == Seq((1L, "web", 0.25, "gold"), (2L, "wiki", 7.5, "std")))
    // V1 writer: tier resolves from the reader-schema default
    val v1rows = Seq((3L, "cc", 1.75, None))
    val (_, dec1) = AvroBytes.decode(AvroBytes.encode(AvroBytes.WriterV1, v1rows))
    assert(dec1 == Seq((3L, "cc", 1.75, "std")), s"default not resolved: $dec1")
    // multi-block containers (sync interval 256) still decode completely
    val many = (0L until 2000L).map(i => (i, "s" + (i % 7), (i % 9) / 4.0,
      None: Option[String]))
    val bytes = AvroBytes.encode(AvroBytes.WriterV1, many)
    val (_, decM) = AvroBytes.decode(bytes)
    assert(decM.size == 2000 && decM.map(_._1) == many.map(_._1))
    // container magic protects against misparse
    intercept[Exception] {
      AvroBytes.decode("not an avro container at all".getBytes)
    }
  }

  test("IMA ADPCM: container round-trip, state-machine lockstep, routing") {
    import graft.operators.Multimodal.MediaCodecs._
    // container + count round-trip across 1..3 blocks
    for (nb <- 1 to 3) {
      val n = nb * 121
      val wav = encodeWavImaAdpcm(8000, n, seed = 41L * nb)
      val (rate, blocks, dec) = adpcmSamples(wav).get
      assert((rate, blocks, dec.length) == (8000, nb, n))
      // block headers store sample 0 of each block EXACTLY
      for (b <- 0 until nb)
        assert(dec(b * 121) ==
          (((41L * nb + (b * 121) * 131L) % 65536L) - 32768L).toInt)
    }
    // encoder and decoder share the reconstruction: decoding the packed
    // nibbles reproduces the encoder's own predictor chain exactly
    var (pred, idx) = (100, 0)
    var (dpred, didx) = (100, 0)
    for (s <- Seq(120, 150, 90, -30, -32768, 32767, 0, 5)) {
      val (nib, p, i) = adpcmEncodeStep(s, pred, idx)
      val (dp, di) = adpcmDecodeStep(nib, dpred, didx)
      assert((dp, di) == (p, i), s"decoder diverged at sample $s")
      pred = p; idx = i; dpred = dp; didx = di
    }
    // a smooth signal (slope ≤ first step size) reconstructs tightly:
    // quantizer granularity is step/8 = 0 at step 7, so error ≤ a few LSB
    var (p2, i2) = (0, 0)
    var maxErr = 0
    for (t <- 1 to 500) {
      val s = (t % 14) - 7 // |Δ| ≤ 7 = AdpcmStep(0)
      val (_, p, i) = adpcmEncodeStep(s, p2, i2)
      p2 = p; i2 = i
      maxErr = math.max(maxErr, math.abs(p - s))
    }
    assert(maxErr <= 10, s"smooth-signal reconstruction error $maxErr")
    // routing: ADPCM WAV must NOT parse as PCM16 WAV and vice versa, and
    // HeaderCodec reports the REAL decoded sample count, not the stub's
    val adpcm = encodeWavImaAdpcm(16000, 121, seed = 7L)
    assert(decodeWav(adpcm).isEmpty, "tag-0x11 WAV misparsed as PCM")
    val pcm = encodeWavPcm16(8000, 100, seed = 7L)
    assert(decodeWavImaAdpcm(pcm).isEmpty, "PCM WAV misparsed as ADPCM")
    val d = new graft.operators.Multimodal.HeaderCodec()
      .decode("audio", "audio/wav", adpcm)
    assert((d.nFrames, d.sampleRate) == (121, 16000), s"stub routed: $d")
    // corruption: bad riff size, truncation, reserved byte, index > 88
    assert(decodeWavImaAdpcm(adpcm.dropRight(3)).isEmpty)
    val badIdx = adpcm.clone()
    // 12 RIFF/WAVE + 28 fmt + 12 fact + 8 data header = 60; the block
    // header's step-index byte sits at +2
    badIdx(62) = 120.toByte
    assert(decodeWavImaAdpcm(badIdx).isEmpty, "index > 88 accepted")
  }
}
