package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column processing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract run as
  * `mapPartitions` batch jobs (the Scala analogue of `mapInPandas`) so a
  * real decoder would amortize library init per partition and stream
  * batches without collecting.
  *
  * Decode is REAL for the formats the JDK ships codecs for (PNG / BMP /
  * JPEG / GIF via `javax.imageio` — see [[decode]]; PCM WAV via
  * `javax.sound.sampled` — see [[decodeAudio]]); every other payload
  * falls back to a deterministic byte-arithmetic STUB — which keeps the
  * text-backed oracle path checkable — and the plumbing is real either
  * way: typed input/output schemas, per-partition iteration, explicit
  * repartition for decode parallelism. Compressed audio (MP3/OGG/AAC)
  * and video codecs remain stubbed (none in the JDK, no external deps
  * in-container).
  */
object Multimodal {

  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class MediaOut(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, features: Array[Double])

  /** Stub decoder: "header" fields and an 8-dim "feature vector" derived
    * from the first bytes. A real implementation would hand `payload` to
    * an image/audio codec here; everything around it stays unchanged.
    */
  def decodeStub(m: MediaIn): MediaOut = {
    val b = m.payload
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
    val headSum = (0 until 16).map(at).sum
    MediaOut(
      doc_id = m.doc_id,
      n_bytes = b.length,
      width = 64 + at(0) % 64,
      height = 64 + at(1) % 64,
      n_frames = 1 + headSum % 7,
      features = (1 to 8).map(j => ((headSum * j + at(j)) % 97).toDouble).toArray)
  }

  /** Magic-byte sniff for the container formats the JDK ships codecs
    * for — cheap reject before any ImageIO reader lookup, so text-corpus
    * payloads never pay decode overhead. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 'B' && b(1) == 'M') ||                                       // BMP
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||                       // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))                          // GIF

  /** REAL decode for PNG/BMP/JPEG/GIF via `javax.imageio` (in the JDK —
    * no external codec needed): width/height from the decoded raster and
    * an 8-bin luminance histogram as the feature vector, all
    * deterministic. Non-image payloads fall back to [[decodeStub]], so
    * the text-backed m02 oracle path is byte-identical to before.
    */
  def decode(m: MediaIn): MediaOut = {
    val img =
      if (!looksLikeImage(m.payload)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload)))
      catch { case _: Exception => None }
    img match {
      case Some(im) =>
        val w = im.getWidth
        val h = im.getHeight
        val hist = new Array[Double](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            hist(lum / 32) += 1.0
            x += 1
          }
          y += 1
        }
        MediaOut(m.doc_id, m.payload.length, w, h, 1, hist)
      case None => decodeStub(m)
    }
  }

  /** The batch pipeline: repartition for decode parallelism, then one
    * decoder instance per partition (`mapPartitions`), typed end to end.
    * Image payloads take the real `javax.imageio` path; anything else
    * keeps the deterministic stub.
    */
  def decodeAll(media: Dataset[MediaIn], parallelism: Int): Dataset[MediaOut] = {
    import media.sparkSession.implicits._
    media.repartition(parallelism)
      .mapPartitions { it =>
        // per-partition decoder init would go here (ImageIO is static)
        it.map(decode)
      }
  }

  /** documents.text as the stand-in payload (UTF-8 bytes). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload")).as[MediaIn]
  }

  final case class AudioOut(
      doc_id: Long, n_bytes: Int, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, duration_us: Long, sum_abs_amp: Long)

  /** Magic-byte sniff for RIFF/WAVE containers — the one audio format
    * the JDK ships a codec for (`javax.sound.sampled`). */
  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Stub audio decoder for payloads with no JDK codec (MP3/OGG/AAC/...):
    * deterministic byte arithmetic, same honesty contract as
    * [[decodeStub]] for images. */
  def decodeAudioStub(m: MediaIn): AudioOut = {
    val b = m.payload
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
    val sr = 8000 + at(0) % 8 * 1000
    AudioOut(m.doc_id, b.length, sr, 1 + at(1) % 2, 16,
      b.length.toLong, b.length.toLong * 1000000L / sr,
      (0 until 16).map(at).sum.toLong)
  }

  /** REAL decode for PCM WAV via `javax.sound.sampled` (in the JDK — no
    * external codec needed): sample rate / channels / bit depth / frame
    * count from the parsed header, exact duration in µs, and the summed
    * absolute amplitude over every decoded 16-bit little-endian sample
    * as the deterministic feature. Non-WAV payloads fall back to
    * [[decodeAudioStub]] — compressed codecs stay honestly stubbed
    * (none in the JDK, no external deps in-container). */
  def decodeAudio(m: MediaIn): AudioOut = {
    if (!looksLikeWav(m.payload)) return decodeAudioStub(m)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try {
        val fmt = in.getFormat
        val sr = fmt.getSampleRate.toInt
        val nFrames = in.getFrameLength
        val bytes = in.readAllBytes()
        var sum = 0L
        if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
          var i = 0
          while (i + 1 < bytes.length) {
            sum += math.abs(((bytes(i + 1).toInt << 8) | (bytes(i) & 0xff)).toShort.toInt)
            i += 2
          }
        }
        AudioOut(m.doc_id, m.payload.length, sr, fmt.getChannels,
          fmt.getSampleSizeInBits, nFrames, nFrames * 1000000L / sr, sum)
      } finally in.close()
    } catch { case _: Exception => decodeAudioStub(m) }
  }

  /** Batch audio decode: same repartition + `mapPartitions` shape as
    * [[decodeAll]]. */
  def decodeAudioAll(media: Dataset[MediaIn], parallelism: Int): Dataset[AudioOut] = {
    import media.sparkSession.implicits._
    media.repartition(parallelism).mapPartitions(_.map(decodeAudio))
  }

  /** Deterministic PCM WAV synthesizer (canonical 44-byte RIFF header +
    * 16-bit little-endian samples) — the m05 gate and MultimodalSpec
    * build real WAV payloads from document fields with it, so the
    * decode path is exercised end-to-end and the DuckDB oracle can
    * recompute every decoded field arithmetically. Sample formula:
    * frame f carries `(docId*131 + f*17) % 20001 - 10000` in every
    * channel. */
  def synthWav(docId: Long, nChars: Long): Array[Byte] = {
    val sampleRate = 8000 + (docId % 4).toInt * 4000
    val channels = 1 + (docId % 2).toInt
    val nFrames = 50 + (nChars % 100).toInt
    val dataLen = nFrames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                    // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)              // byte rate
      .putShort((channels * 2).toShort)               // block align
      .putShort(16)                                   // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      val v = ((docId * 131 + f * 17) % 20001 - 10000).toShort
      var c = 0
      while (c < channels) { buf.putShort(v); c += 1 }
      f += 1
    }
    buf.array()
  }

  final case class FrameOut(doc_id: Long, frame_idx: Int, frame_off: Int, frame_sig: String)

  /** Frame sampling: every `stride`-th fixed-size frame of the payload
    * (the video-keyframe / audio-window sampling shape). A typed flatMap
    * — one input row fans out to its sampled frames only, so a long
    * recording becomes its keyframes without the full decode ever being
    * held in memory, and the output partitioning follows the input (no
    * shuffle). `frame_sig` is the md5 of the frame bytes, standing in
    * for a per-frame feature a real codec would emit.
    */
  def sampleFrames(media: Dataset[MediaIn], frameBytes: Int, stride: Int): Dataset[FrameOut] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val nFrames = m.payload.length / frameBytes
      Range(0, nFrames, stride).map { i =>
        val sig = md.digest(java.util.Arrays.copyOfRange(
            m.payload, i * frameBytes, (i + 1) * frameBytes))
          .map("%02x".format(_)).mkString
        FrameOut(m.doc_id, i, i * frameBytes, sig)
      }
    }
  }

  final case class ResizeOut(doc_id: Long, width: Int, height: Int, rw: Int, rh: Int)

  /** Resize-to-fit metadata transform: scale decoded dimensions into a
    * `box`×`box` bounding box preserving aspect ratio. Integer-only
    * arithmetic (floor division) so the result is engine-exact; a real
    * implementation would also resample `payload` here.
    */
  def resizeMeta(decoded: Dataset[MediaOut], box: Int): Dataset[ResizeOut] = {
    import decoded.sparkSession.implicits._
    decoded.map { m =>
      val mx = math.max(m.width, m.height)
      ResizeOut(m.doc_id, m.width, m.height, m.width * box / mx, m.height * box / mx)
    }
  }
}
