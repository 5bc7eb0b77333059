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

  test("Mp4Decoder reads geometry from tkhd, not from the metadata struct") {
    // deliberately contradictory metadata: the container must win
    val meta = Media.MediaMeta("video/mp4", 999, 999, 1L)
    val d = Media.Mp4Decoder.decode(Mp4.synth(payload, 128, 72, 5000L), meta)
    assert(d.width == 128 && d.height == 72)
    assert(d.samples.length == payload.length)
    assert(d.samples.head == (payload.head & 0xff) / 256.0)
  }
}
