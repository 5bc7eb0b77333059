package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Media, Mp4}

/** The ISO BMFF writer/demuxer pair behind the video modality: geometry
  * and duration must round-trip through the real boxes (`tkhd` 16.16
  * fixed-point, `mvhd` timescale units), the payload through `mdat`,
  * and corrupt size chains must fail loudly instead of misparsing.
  */
class Mp4Spec extends AnyFunSuite {

  private val payload = "the quick brown fox".getBytes("UTF-8")

  test("synth → demux round-trips payload, geometry, duration, brand") {
    val bytes = Mp4.synth(payload, 128, 72, 4321L)
    val info = Mp4.demux(bytes)
    assert(info.brand == "isom")
    assert(info.widthPx == 128)
    assert(info.heightPx == 72)
    assert(info.durationMs == 4321L)
    assert(info.data.toSeq == payload.toSeq)
  }

  test("the container is box-structured: ftyp leads, sizes chain exactly") {
    val bytes = Mp4.synth(payload, 16, 9, 1000L)
    assert(new String(bytes, 4, 4, "US-ASCII") == "ftyp")
    // walk top-level box sizes; they must tile the file exactly
    var off = 0
    val types = Seq.newBuilder[String]
    while (off < bytes.length) {
      val size = ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      types += new String(bytes, off + 4, 4, "US-ASCII")
      off += size.toInt
    }
    assert(off == bytes.length)
    assert(types.result() == Seq("ftyp", "moov", "mdat"))
  }

  test("an empty payload still yields a valid container") {
    val info = Mp4.demux(Mp4.synth(Array.emptyByteArray, 1, 1, 0L))
    assert(info.data.isEmpty)
    assert(info.durationMs == 0L)
  }

  test("a corrupt box size that overruns its parent is rejected") {
    val bytes = Mp4.synth(payload, 128, 72, 1000L)
    val corrupt = bytes.clone()
    // inflate the ftyp size field past the file end
    corrupt(0) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](Mp4.demux(corrupt))
    assert(e.getMessage.contains("overruns"))
  }

  test("a truncated file is rejected, not misread") {
    val bytes = Mp4.synth(payload, 128, 72, 1000L)
    intercept[IllegalArgumentException](Mp4.demux(bytes.take(bytes.length - 4)))
  }

  test("non-BMFF bytes are rejected (no ftyp)") {
    intercept[IllegalArgumentException](Mp4.demux(payload))
  }

  test("round-trip holds for arbitrary payloads, geometry, and durations") {
    val prop = org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.containerOf[Array, Byte](
        org.scalacheck.Gen.choose(Byte.MinValue, Byte.MaxValue)
      ),
      org.scalacheck.Gen.choose(0, 0x7fff),
      org.scalacheck.Gen.choose(0, 0x7fff),
      org.scalacheck.Gen.choose(0L, Int.MaxValue.toLong)
    ) { (data, w, h, ms) =>
      val info = Mp4.demux(Mp4.synth(data, w, h, ms))
      info.widthPx == w && info.heightPx == h &&
      info.durationMs == ms && info.data.toSeq == data.toSeq
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop
    )
    assert(res.passed, res.status.toString)
  }

  test("synthFrames → demux resolves every frame via stco/stsz, exact bytes and codec") {
    val frames = Seq(
      "first frame".getBytes("UTF-8"),
      "second, longer frame".getBytes("UTF-8"),
      Array[Byte](0, 1, 2, 3)
    )
    val bytes = Mp4.synthFrames(frames, "png ", 32, 18, 6000L)
    // still a well-formed top-level box sequence
    assert(new String(bytes, 4, 4, "US-ASCII") == "ftyp")
    val info = Mp4.demux(bytes)
    assert(info.codec == "png ")
    assert(info.widthPx == 32 && info.heightPx == 18)
    assert(info.durationMs == 6000L)
    assert(info.frames.length == 3)
    info.frames.zip(frames).foreach { case (got, exp) =>
      assert(got.toSeq == exp.toSeq)
    }
    // the mdat payload is the frame concatenation (single-chunk layout)
    assert(info.data.toSeq == frames.flatten.toSeq)
  }

  test("MJPEG-style track: REAL lossy JPEG frames demux and ImageIO-decode") {
    // encode two genuine JPEG frames through the JDK codec
    def jpegFrame(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        48, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (y <- 0 until 32; x <- 0 until 48)
        raster.setSample(x, y, 0, (seed + 7 * x + 13 * y) % 256)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val frames = Seq(jpegFrame(1), jpegFrame(101))
    assert(frames.forall(f => (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)) // JFIF SOI
    val info = Mp4.demux(Mp4.synthFrames(frames, "jpeg", 48, 32, 2000L))
    assert(info.codec == "jpeg")
    // the decoder path handles the lossy codec end-to-end (pixel VALUES
    // are not asserted — DCT quantization is the reason the corpus uses
    // PNG frames for oracle-predictability)
    val d = Media.Mp4Decoder.decode(
      Mp4.synthFrames(frames, "jpeg", 48, 32, 2000L),
      Media.MediaMeta("video/mp4", 0, 0, 0L)
    )
    assert(d.width == 48 && d.height == 32)
    assert(d.samples.length == 2 * 48 * 32)
    assert(d.samples.forall(s => s >= 0.0 && s < 1.0))
  }

  test("a sample table whose byte ranges overrun the file is rejected") {
    val good = Mp4.synthFrames(Seq("frame".getBytes("UTF-8")), "png ", 8, 8, 1000L)
    val truncated = good.take(good.length - 3)
    intercept[IllegalArgumentException](Mp4.demux(truncated))
  }

  test("Mp4Decoder reads geometry from tkhd, not from the metadata struct") {
    // deliberately contradictory metadata: the container must win
    val meta = Media.MediaMeta("video/mp4", 999, 999, 1L)
    val d = Media.Mp4Decoder.decode(Mp4.synth(payload, 128, 72, 5000L), meta)
    assert(d.width == 128 && d.height == 72)
    assert(d.samples.length == payload.length)
    assert(d.samples.head == (payload.head & 0xff) / 256.0)
  }
}
