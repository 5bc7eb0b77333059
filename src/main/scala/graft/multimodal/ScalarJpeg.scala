package graft.multimodal

/** Independent BASELINE JPEG decoder (grayscale, single scan), built
  * directly from the ITU-T T.81 primitives: segment parser, canonical
  * Huffman tables, zig-zag dequantization, double-precision 8×8 IDCT.
  *
  * This is the SECOND decode path for the lossy-MJPEG audit (VERDICT
  * r11 #4): `m_mjpeg_frame_stats` is rows-only because lossy JPEG output
  * is codec-implementation-defined, so its correctness anchor is
  * CROSS-DECODER agreement — `TwoDecoderSpec` decodes the same demuxed
  * frame bytes through this decoder (which shares no code with
  * `javax.imageio`'s native path) and through ImageIO, and asserts the
  * reconstructions agree to within IDCT rounding and that both sit
  * inside the documented ≤3-gray-level tolerance against the encode-side
  * source means.
  *
  * Scope is exactly what the corpus's frames use (and what this decoder
  * `require`s): 8-bit precision, SOF0 baseline sequential, ONE component,
  * no chroma subsampling, no restart intervals, no progressive scans.
  */
object ScalarJpeg {

  /** zig-zag index -> natural (row-major) coefficient index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: JPEG's BITS/HUFFVAL lists -> (len, code)
    * -> value map, assembled exactly as T.81 Annex C prescribes
    * (codes of each length are consecutive, starting from twice the
    * previous length's end).
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val table: Map[(Int, Int), Int] = {
      val m = Map.newBuilder[(Int, Int), Int]
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          m += ((len, code) -> vals(k))
          code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      m.result()
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * byte-unstuffing; any other 0xFFxx is a marker = end of scan data.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "ran off the entropy-coded segment")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length,
            "entropy-coded segment truncated after a 0xFF byte")
          val b2 = data(pos) & 0xff
          require(b2 == 0x00, f"unexpected marker FF$b2%02X inside scan data")
          pos += 1
          b = 0xff
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeHuff(h: Huff): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | nextBit()
        len += 1
        h.table.get((len, code)) match {
          case Some(v) => return v
          case None =>
        }
      }
      throw new IllegalArgumentException("invalid Huffman code in scan data")
    }
  }

  /** T.81 F.2.2.1 sign extension of a `t`-bit magnitude. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val idctCos: Array[Double] = {
    val c = new Array[Double](64) // (x, u) -> cos((2x+1)uπ/16)
    for (x <- 0 until 8; u <- 0 until 8)
      c(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    c
  }

  /** Decode a single-component baseline JPEG to (width, height, pixels
    * 0..255 row-major).
    */
  def decodeGray(jpeg: Array[Byte]): (Int, Int, Array[Int]) = {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var width = 0
    var height = 0
    var qtId = -1
    var dcId = -1
    var acId = -1
    var inScan = false
    while (!inScan) {
      require((jpeg(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = jpeg(pos + 1) & 0xff
      val len = ((jpeg(pos + 2) & 0xff) << 8) | (jpeg(pos + 3) & 0xff)
      val seg = pos + 4
      marker match {
        case 0xdb => // DQT: one or more tables per segment
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (jpeg(p) & 0xff) >> 4
            val tq = jpeg(p) & 0x0f
            require(pq == 0, "only 8-bit quantization tables supported")
            quant(tq) = Array.tabulate(64)(i => jpeg(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc0 => // SOF0 baseline
          require((jpeg(seg) & 0xff) == 8, "only 8-bit precision supported")
          height = ((jpeg(seg + 1) & 0xff) << 8) | (jpeg(seg + 2) & 0xff)
          width = ((jpeg(seg + 3) & 0xff) << 8) | (jpeg(seg + 4) & 0xff)
          require((jpeg(seg + 5) & 0xff) == 1, "only single-component JPEG supported")
          require((jpeg(seg + 7) & 0xff) == 0x11, "subsampling not supported")
          qtId = jpeg(seg + 8) & 0xff
        case 0xc4 => // DHT: one or more tables per segment
          var p = seg
          while (p < pos + 2 + len) {
            val tc = (jpeg(p) & 0xff) >> 4
            val th = jpeg(p) & 0x0f
            val bits = Array.tabulate(16)(i => jpeg(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => jpeg(p + 17 + i) & 0xff)
            if (tc == 0) huffDc(th) = new Huff(bits, vals)
            else huffAc(th) = new Huff(bits, vals)
            p += 17 + n
          }
        case 0xdd => // DRI
          val ri = ((jpeg(seg) & 0xff) << 8) | (jpeg(seg + 1) & 0xff)
          require(ri == 0, "restart intervals not supported")
        case 0xda => // SOS
          require((jpeg(seg) & 0xff) == 1, "only single-component scans supported")
          dcId = (jpeg(seg + 2) & 0xff) >> 4
          acId = jpeg(seg + 2) & 0x0f
          inScan = true
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          throw new IllegalArgumentException(
            f"non-baseline frame marker FF$m%02X not supported")
        case _ => // APPn / COM / anything skippable
      }
      pos += 2 + len
    }
    require(width > 0 && height > 0 && quant(qtId) != null &&
      huffDc(dcId) != null && huffAc(acId) != null,
      "scan started before all tables were defined")

    val qt = quant(qtId)
    val br = new BitReader(jpeg, pos)
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val out = new Array[Int](width * height)
    val coef = new Array[Double](64)
    var pred = 0
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        java.util.Arrays.fill(coef, 0.0)
        // DC
        val t = br.decodeHuff(huffDc(dcId))
        pred += extend(br.receive(t), t)
        coef(0) = pred.toDouble * qt(0)
        // AC
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = br.decodeHuff(huffAc(acId))
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += r
            require(k < 64, "AC run past block end")
            coef(Zigzag(k)) = extend(br.receive(s), s).toDouble * qt(k)
            k += 1
          }
        }
        // 8×8 IDCT + level shift, clamped into the image window
        var y = 0
        while (y < 8) {
          val py = byi * 8 + y
          var x = 0
          while (x < 8) {
            val px = bxi * 8 + x
            if (px < width && py < height) {
              var sum = 0.0
              var u = 0
              while (u < 8) {
                val cu = if (u == 0) math.sqrt(0.5) else 1.0
                var v = 0
                while (v < 8) {
                  val cv = if (v == 0) math.sqrt(0.5) else 1.0
                  val f = coef(v * 8 + u)
                  if (f != 0.0)
                    sum += cu * cv * f * idctCos(x * 8 + u) * idctCos(y * 8 + v)
                  v += 1
                }
                u += 1
              }
              val p = math.round(sum / 4.0 + 128.0).toInt
              out(py * width + px) = math.max(0, math.min(255, p))
            }
            x += 1
          }
          y += 1
        }
        bxi += 1
      }
      byi += 1
    }
    (width, height, out)
  }
}
