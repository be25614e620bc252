package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal

/** Proves the q154/q155/q156 codec paths are REAL, not stubs: the payloads
  * are genuine PNG / RIFF-WAV containers (magic bytes), and the JDK decode
  * recovers the closed-form pixels/samples exactly — which is also the
  * property that makes the pinned goldens partition- and JVM-independent
  * (lossless codecs; every pinned statistic is an exact integer sum). */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PNG roundtrip is pixel-exact against the closed form (real lossless codec)") {
    for (id <- Seq(0L, 3L, 42L, 123L, 9999L)) {
      val png = Multimodal.synthPng(id)
      // genuine PNG container, not raw bytes
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
        png(3) == 'G', s"id=$id payload is not a PNG container")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 8 + (id % 8).toInt)
      assert(img.getHeight == 6 + (id % 7).toInt)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xffffff) == Multimodal.pixel(id, x, y),
          s"id=$id decoded pixel ($x,$y) diverged from the closed form")
    }
  }

  test("animated GIF roundtrip: frame count and every frame pixel-exact (real video container)") {
    for (id <- Seq(0L, 3L, 42L, 123L, 9999L)) {
      val gif = Multimodal.synthGif(id)
      assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F',
        s"id=$id payload is not a GIF container")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(gif))
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis, false)
      assert(reader.getNumImages(true) == 4 + (id % 5).toInt, s"id=$id frame count")
      for (f <- 0 until reader.getNumImages(true)) {
        val img = reader.read(f)
        assert(img.getWidth == 8 + (id % 5).toInt && img.getHeight == 6 + (id % 4).toInt)
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert((img.getRGB(x, y) & 0xffffff) == Multimodal.pixel(id * 131 + f, x, y),
            s"id=$id frame $f pixel ($x,$y) diverged — GIF palette not lossless?")
      }
      reader.dispose(); iis.close()
    }
  }

  test("nearest-neighbor resize samples exactly the decoded source pixels") {
    val id = 5L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthPng(id)))
    val out = Multimodal.resizeNearest(img, 8, 6)
    assert(out.getWidth == 8 && out.getHeight == 6)
    for (y <- 0 until 6; x <- 0 until 8)
      assert(out.getRGB(x, y) ==
        img.getRGB(x * img.getWidth / 8, y * img.getHeight / 6))
  }

  test("WAV roundtrip is byte-exact with a parsed RIFF header (real audio codec)") {
    for (id <- Seq(1L, 4L, 100L, 2026L)) {
      val wav = Multimodal.synthWav(id)
      assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F',
        s"id=$id payload is not a RIFF container")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ais.getFormat.getSampleRate.toInt == 8000 + 2000 * (id % 5).toInt)
      assert(ais.getFormat.getChannels == 1)
      assert(ais.getFrameLength == 40 + (id % 50))
      val pcm = ais.readAllBytes()
      val n = 40 + (id % 50).toInt
      assert(pcm.length == 2 * n)
      for (i <- 0 until n) {
        val expect = (((id * 7919 + i.toLong * 104729) % 65536) - 32768).toShort
        val got = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
        assert(got == expect, s"id=$id sample $i diverged from the closed form")
      }
    }
  }

  test("DFT kernel finds the bin of a pure tone and Parseval holds (q193)") {
    val N = 32
    for (k <- 1 to 8) {
      // x[j] = A·cos(2πkj/N), amplitude well inside 16-bit range
      val amp = 10000.0
      val pcm = new Array[Byte](2 * N)
      for (j <- 0 until N) {
        val v = StrictMath.rint(
          amp * StrictMath.cos(2.0 * StrictMath.PI * k * j / N)).toShort
        pcm(2 * j) = (v & 0xff).toByte
        pcm(2 * j + 1) = ((v >> 8) & 0xff).toByte
      }
      val (dom, peak, total) = Multimodal.dftProfile(pcm)
      assert(dom == k, s"pure tone at bin $k detected as $dom")
      // the tone's power is (A·N/2)² up to rounding of the PCM samples
      val expect = StrictMath.pow(amp * N / 2.0, 2)
      assert(StrictMath.abs(peak - expect) / expect < 0.01,
        s"bin-$k peak power $peak far from ${expect.toLong}")
      // and concentrates in that one bin (spectral leakage ≈ 0 for an
      // exact-period tone)
      assert(peak.toDouble / total > 0.99, s"bin-$k tone leaked: $peak/$total")
    }
  }

  test("MediaCodecs per-partition paths are byte/pixel-identical to the convenience APIs") {
    // The round-12 hot paths swap ImageIO.read/AudioSystem.* for
    // partition-local providers (no per-row synchronized registry walk,
    // no temp-file stream cache). Same underlying JDK codec classes ->
    // the bytes and pixels must be IDENTICAL; this pins that claim.
    val codec = new graft.llm.MediaCodecs
    for (id <- Seq(0L, 7L, 123L, 5000L)) {
      assert(java.util.Arrays.equals(codec.encodePng(id), Multimodal.synthPng(id)),
        s"PNG bytes diverged for id=$id")
      assert(java.util.Arrays.equals(codec.encodeWav(id), Multimodal.synthWav(id)),
        s"WAV bytes diverged for id=$id")
      assert(java.util.Arrays.equals(codec.encodeGif(id), Multimodal.synthGif(id)),
        s"GIF bytes diverged for id=$id")
      // decode: pixel equality vs ImageIO.read
      val png = Multimodal.synthPng(id)
      val a = codec.readPng(png)
      val b = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
      for (y <- 0 until a.getHeight; x <- 0 until a.getWidth)
        assert(a.getRGB(x, y) == b.getRGB(x, y), s"pixel ($x,$y) id=$id")
      // audio: format + payload equality vs AudioSystem (adaptive provider
      // ordering must not change WHAT is parsed)
      val wav = Multimodal.synthWav(id)
      val ca = codec.openAudio(wav)
      val sa = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ca.getFormat.toString == sa.getFormat.toString)
      assert(ca.getFrameLength == sa.getFrameLength)
      assert(java.util.Arrays.equals(ca.readAllBytes(), sa.readAllBytes()),
        s"decoded PCM diverged for id=$id")
    }
  }
}
