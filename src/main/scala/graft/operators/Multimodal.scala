package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batches like an inference operator
  * (mapPartitions — the Scala analogue of `mapInPandas` batch shape).
  *
  * The DECODE step is a clearly-marked deterministic STUB: the real
  * image/audio codecs are not present in this environment, so
  * [[StubCodec]] derives plausible "decoded" properties from the bytes
  * alone. Everything AROUND the stub — schema, batch iteration,
  * partition-parallel execution, feature math on raw bytes (size, entropy,
  * histogram) — is real and tested.
  */
object Multimodal {

  final case class MediaRow(
      id: Long, modality: String, mime: String, content: Array[Byte])

  final case class Decoded(
      width: Int, height: Int, nFrames: Int, sampleRate: Int)

  final case class MediaFeatures(
      id: Long,
      modality: String,
      n_bytes: Long,
      byte_entropy: Double,
      head_hist: Seq[Long], // first-16-bucket byte histogram
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int)

  /** STUB decoder — deterministic fake standing in for the codec library.
    * Real implementation would parse the container format; the signature
    * and call pattern (per-batch, reusable "codec" instance) are the real
    * contract.
    */
  final class StubCodec {
    def decode(modality: String, mime: String, bytes: Array[Byte]): Decoded = {
      val h = java.util.Arrays.hashCode(bytes)
      val a = math.abs(h)
      modality match {
        case "image" => Decoded(64 + a % 1024, 64 + (a / 7) % 1024, 1, 0)
        case "audio" => Decoded(0, 0, 1 + a % 1000, 8000 + (a % 5) * 8000)
        case "video" => Decoded(320, 240, 1 + a % 600, 0)
        case _       => Decoded(0, 0, 0, 0)
      }
    }
  }

  /** Byte-level features + stub decode, batched per partition. */
  def extractFeatures(rows: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaFeatures] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      val codec = new StubCodec // one codec instance per partition (like a session)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val counts = new Array[Long](256)
          r.content.foreach(b => counts(b & 0xff) += 1)
          val n = r.content.length.toDouble
          val entropy =
            if (n == 0) 0.0
            else -counts.filter(_ > 0).map { c =>
              val p = c / n; p * math.log(p) / math.log(2)
            }.sum
          val d = codec.decode(r.modality, r.mime, r.content)
          MediaFeatures(r.id, r.modality, r.content.length.toLong, entropy,
            counts.take(16).toSeq, d.width, d.height, d.nFrames, d.sampleRate)
        }
      }
    }
  }

  /** Stub "resize": real plumbing (binary in, binary out, metadata update),
    * fake pixels — truncates/pads bytes to the target size deterministic.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    java.util.Arrays.copyOf(bytes, targetBytes)

  /** Stub frame sampling: every k-th byte "frame" marker. */
  def frameSampleStub(bytes: Array[Byte], everyK: Int): Seq[Int] =
    bytes.indices.by(math.max(1, everyK)).map(i => bytes(i) & 0xff)

  final case class Frame(
      id: Long, frame_idx: Int, offset: Long, n_bytes: Long, frame_md5: String)

  /** Frame sampling over opaque binary media: a `frameBytes` slice every
    * `stride` bytes — the container-agnostic stand-in for video frame
    * extraction (a real codec would seek keyframes; the slice-iterate-hash
    * plumbing, schema, and per-frame row fan-out are the real contract).
    * Row-local flatMap, zero shuffle; fan-out = ⌈bytes/stride⌉ per row.
    */
  def sampleFrames(rows: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 128): Dataset[Frame] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.flatMap { r =>
      val len = r.content.length
      Iterator.range(0, len, stride).zipWithIndex.map { case (off, idx) =>
        val n = math.min(frameBytes, len - off)
        val slice = java.util.Arrays.copyOfRange(r.content, off, off + n)
        val md = java.security.MessageDigest.getInstance("MD5").digest(slice)
        Frame(r.id, idx, off.toLong, n.toLong, md.map("%02x".format(_)).mkString)
      }
    }
  }
}
