package graft.ops

/** Minimal REAL image codec behind the multimodal mapPartitions seam
  * (builder-prompt: media decode is stubbed because the container ships
  * no codec libraries — this is the genuine subset that needs none):
  * uncompressed binary PPM (P6) and 24-bit uncompressed BMP
  * (BITMAPINFOHEADER) decode to an integer luma plane, from which the
  * perceptual hash, resize, and metadata operators derive real
  * features. Everything is INTEGER arithmetic (luma = (299r+587g+114b)
  * div 1000, block means floor-divide), so decode output is exactly
  * reproducible by any engine — the same oracle-replayability contract
  * the rest of the engine keeps.
  *
  * Detection is structural, not just magic bytes: a blob must carry a
  * complete, size-consistent header AND the exact pixel payload to
  * decode ([[decode]] returns None otherwise), so arbitrary text/bytes
  * — the synthetic corpus — always fall back to the deterministic
  * byte-sampling path and existing oracle rows are untouched. A real
  * deployment swaps richer codecs in here; the operators upstream
  * ([[Multimodal]]) never change.
  */
object MediaCodec {

  /** Decoded image: row-major integer luma plane in [0, 255]. */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
                                fmt: String, luma: Array[Int])

  /** Dimension cap: a parsed header claiming more is treated as
    * not-an-image rather than a reason to allocate gigabytes. */
  private val MaxDim = 16384

  def decode(blob: Array[Byte]): Option[DecodedImage] =
    decodePpm(blob).orElse(decodeBmp(blob))

  /** ITU-R BT.601 integer luma. */
  private def lumaOf(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
    * `#`-comment support, one whitespace byte, then exactly w·h RGB
    * triples. Only maxval 255 (the universal case) is accepted. */
  private def decodePpm(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 12 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else done = true
      }
    }
    def num(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= MaxDim) {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = num(); val h = num(); val maxv = num()
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || maxv != 255) return None
    if (i >= b.length || !(b(i) == ' ' || b(i) == '\t' || b(i) == '\r' || b(i) == '\n'))
      return None
    i += 1 // the single whitespace byte separating header from payload
    if (i.toLong + w.toLong * h * 3 != b.length) return None // exact payload
    val luma = new Array[Int](w * h)
    var p = 0
    while (p < luma.length) {
      val o = i + p * 3
      luma(p) = lumaOf(b(o) & 0xFF, b(o + 1) & 0xFF, b(o + 2) & 0xFF)
      p += 1
    }
    Some(DecodedImage(w, h, 3, "ppm", luma))
  }

  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** 24-bit uncompressed BMP with a BITMAPINFOHEADER: BGR pixels,
    * rows padded to 4 bytes, bottom-up unless height is negative. */
  private def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = i32(b, 10)
    if (i32(b, 14) != 40) return None // header size: BITMAPINFOHEADER only
    val w = i32(b, 18); val hRaw = i32(b, 22)
    // hRaw == Int.MinValue must be rejected explicitly: math.abs keeps
    // it negative, so the magnitude guard alone lets a crafted header
    // through to a negative array size (crash-on-input, review-caught)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
        w > MaxDim || math.abs(hRaw) > MaxDim) return None
    if (u16(b, 26) != 1 || u16(b, 28) != 24 || i32(b, 30) != 0) return None
    val h = math.abs(hRaw); val bottomUp = hRaw > 0
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > b.length) return None
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      var x = 0
      while (x < w) {
        val o = off + srcRow * stride + x * 3
        // BGR byte order
        luma(y * w + x) = lumaOf(b(o + 2) & 0xFF, b(o + 1) & 0xFF, b(o) & 0xFF)
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, 3, "bmp", luma))
  }

  /** 64 block-mean luma samples over an 8×8 grid (floor means; grid
    * cells always contain ≥1 pixel, so any w,h ≥ 1 works) — the real
    * decode→feature input to [[aHash64]]. */
  def luma64(img: DecodedImage): Array[Long] = {
    val out = new Array[Long](64)
    var r = 0
    while (r < 8) {
      val y0 = r * img.height / 8
      val y1 = math.max(y0 + 1, (r + 1) * img.height / 8)
      var c = 0
      while (c < 8) {
        val x0 = c * img.width / 8
        val x1 = math.max(x0 + 1, (c + 1) * img.width / 8)
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += img.luma(y * img.width + x); n += 1; x += 1 }
          y += 1
        }
        out(r * 8 + c) = s / n
        c += 1
      }
      r += 1
    }
    out
  }

  /** 64-bit average hash over 64 integer samples: bit j set iff
    * sample j exceeds the mean — compared as `px·64 > Σpx`, never a
    * float mean, the same integer-exact convention the declarative
    * aHash used (bit 63 = `1L << 63` rides the shared signed-64
    * convention). */
  def aHash64(px: Array[Long]): Long = {
    var sum = 0L; var j = 0
    while (j < 64) { sum += px(j); j += 1 }
    var acc = 0L; j = 0
    while (j < 64) { if (px(j) * 64 > sum) acc += 1L << j; j += 1 }
    acc
  }

  /** `outPx` 1-D block-mean samples over the flattened luma plane
    * (nearest-neighbor when the plane is smaller than `outPx`) — the
    * real image resize behind the resize operator. */
  def resample(img: DecodedImage, outPx: Int): Array[Int] = {
    val n = img.luma.length
    val out = new Array[Int](outPx)
    var i = 0
    while (i < outPx) {
      val lo = i.toLong * n / outPx
      val hi = math.max(lo + 1, (i + 1).toLong * n / outPx)
      var s = 0L
      var p = lo
      while (p < hi) { s += img.luma(p.toInt); p += 1 }
      out(i) = (s / (hi - lo)).toInt
      i += 1
    }
    out
  }
}
