package graft

import graft.pipeline.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case coverage for the multimodal typed pipelines (the gate
  * queries m01–m04 cover the happy path against the oracle; these pin
  * the boundary behavior a synthetic corpus never hits).
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "payload").as[Multimodal.MediaIn]
  }

  test("decode: a real PNG payload is decoded by javax.imageio, not the stub") {
    // a 20x10 image: left half black, right half white
    val im = new java.awt.image.BufferedImage(20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      im.setRGB(x, y, if (x < 10) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = bos.toByteArray

    val out = Multimodal.decodeAll(media(7L -> png), parallelism = 2).collect()
    assert(out.length == 1)
    val d = out(0)
    // real raster dimensions, not the stub's byte arithmetic
    assert(d.width == 20 && d.height == 10 && d.n_frames == 1)
    assert(d.n_bytes == png.length)
    // luminance histogram: 100 black pixels in bin 0, 100 white in bin 7
    assert(d.features(0) == 100.0 && d.features(7) == 100.0)
    assert(d.features.sum == 200.0)

    // BMP goes through the real path too
    val bmpBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "bmp", bmpBos)
    val bmp = Multimodal.decodeAll(media(8L -> bmpBos.toByteArray), 1).collect()(0)
    assert(bmp.width == 20 && bmp.height == 10)

    // non-image payloads keep the deterministic stub (the m02 oracle path)
    val text = "hello multimodal".getBytes("UTF-8")
    val stub = Multimodal.decodeAll(media(9L -> text), 1).collect()(0)
    val expect = Multimodal.decodeStub(Multimodal.MediaIn(9L, text))
    assert(stub.width == expect.width && stub.height == expect.height &&
      stub.n_frames == expect.n_frames && stub.features.toSeq == expect.features.toSeq)
  }

  test("decodeAudio: a synthesized WAV round-trips through javax.sound.sampled") {
    // doc_id=5 (odd → stereo, 5%4=1 → 12000 Hz), n_chars=123 → 73 frames
    val wav = Multimodal.synthWav(5L, 123L)
    assert(wav.length == 44 + 73 * 2 * 2)
    val out = Multimodal.decodeAudioAll(media(5L -> wav), parallelism = 2).collect()(0)
    assert(out.sample_rate == 12000 && out.channels == 2 && out.bits == 16)
    assert(out.n_frames == 73 && out.n_bytes == wav.length)
    assert(out.duration_us == 73L * 1000000 / 12000)
    // decoded amplitude sum equals the synth formula, doubled for stereo
    val expect = 2L * (0 until 73).map(f => math.abs((5L * 131 + f * 17) % 20001 - 10000)).sum
    assert(out.sum_abs_amp == expect)

    // mono/different-rate combination decodes too (doc_id=2 → 16000 Hz, 1ch)
    val mono = Multimodal.decodeAudioAll(media(2L -> Multimodal.synthWav(2L, 7L)), 1).collect()(0)
    assert(mono.sample_rate == 16000 && mono.channels == 1 && mono.n_frames == 57)

    // non-WAV payloads (e.g. an MP3 magic) take the documented stub —
    // compressed codecs have no JDK decoder
    val mp3ish = Array[Byte](0x49, 0x44, 0x33, 4, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val stub = Multimodal.decodeAudioAll(media(9L -> mp3ish), 1).collect()(0)
    val expectStub = Multimodal.decodeAudioStub(Multimodal.MediaIn(9L, mp3ish))
    assert(stub == expectStub)
    // a corrupt RIFF header falls back to the stub instead of throwing
    val corrupt = "RIFFxxxxWAVEjunk".getBytes("US-ASCII")
    assert(Multimodal.decodeAudioAll(media(10L -> corrupt), 1).collect()(0) ==
      Multimodal.decodeAudioStub(Multimodal.MediaIn(10L, corrupt)))
  }

  test("sampleFrames: payload shorter than one frame emits no rows") {
    val out = Multimodal.sampleFrames(media(1L -> Array.fill(63)('a'.toByte)),
      frameBytes = 64, stride = 2).collect()
    assert(out.isEmpty)
  }

  test("sampleFrames: stride skips frames and offsets are frame-aligned") {
    val payload = Array.tabulate(64 * 5 + 10)(i => (i % 251).toByte)
    val out = Multimodal.sampleFrames(media(1L -> payload), frameBytes = 64, stride = 2)
      .collect().sortBy(_.frame_idx)
    // 5 full frames; stride 2 keeps frames 0, 2, 4; the 10-byte tail is dropped
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(out.map(_.frame_off).toSeq == Seq(0, 128, 256))
    // signature is the md5 of exactly that frame's bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(java.util.Arrays.copyOfRange(payload, 128, 192))
      .map("%02x".format(_)).mkString
    assert(out(1).frame_sig == expect)
  }

  test("resizeMeta: aspect is preserved with integer floor division") {
    import spark.implicits._
    val decoded = Seq(
      Multimodal.MediaOut(1L, 0, 200, 100, 1, Array(0.0)),
      Multimodal.MediaOut(2L, 0, 50, 50, 1, Array(0.0))).toDS()
    val out = Multimodal.resizeMeta(decoded, box = 128).collect().sortBy(_.doc_id)
    // width 200 is the long side → rw = 128, rh = floor(100*128/200) = 64
    assert(out(0).rw == 128 && out(0).rh == 64)
    // square input fills the box exactly
    assert(out(1).rw == 128 && out(1).rh == 128)
  }
}
