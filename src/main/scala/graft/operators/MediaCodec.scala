package graft.operators

/** Pure-JVM media codecs for the multimodal pipeline (SURVEY §2.1b):
  * real header + pixel/sample decode for the formats that need no
  * external library — binary PPM/PGM (raw pixels), BMP (24/32bpp
  * uncompressed), WAV (PCM), and the PNG IHDR (dimensions; full PNG
  * pixel decode would ride java.util.zip.Inflater but is out of scope
  * until the corpus ships real PNGs). Everything here is a total
  * function over a byte array: no I/O, no native state, safe to call
  * per row inside a `mapPartitions` task.
  *
  * Contract with [[Multimodal.multimodalDecode]]: when a blob carries
  * a recognized magic number the REAL parsed dimensions are emitted;
  * otherwise the deterministic arithmetic fallback keeps the pipeline
  * total over arbitrary bytes (the synthetic corpus is ASCII text, so
  * its oracle results are unchanged by design — MediaCodecSpec feeds
  * real generated media bytes through the same distributed plan).
  *
  * Decoded geometry mapping (one MediaMeta shape for all modalities):
  * images → (width, height) in pixels; WAV audio → width = frames
  * (samples per channel), height = channels. The `header` column is
  * the first-4-bytes hex under both paths, so format detection is
  * auditable downstream (`50360a` = P6 PPM, `424d` = BMP, `52494646`
  * = RIFF/WAV, `89504e47` = PNG).
  */
object MediaCodec {

  /** Parsed media metadata: kind ∈ {ppm, pgm, bmp, wav, png}. */
  final case class Meta(kind: String, width: Int, height: Int)

  /** Detect + parse a known header; None → caller uses its fallback. */
  def decodeMeta(bytes: Array[Byte]): Option[Meta] =
    if (bytes.length < 12) None
    else if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6') &&
        isPnmWs(bytes(2))) pnmMeta(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 54)
      bmpMeta(bytes)
    else if (hasAscii(bytes, 0, "RIFF") && hasAscii(bytes, 8, "WAVE"))
      wavMeta(bytes)
    else if ((bytes(0) & 0xff) == 0x89 && hasAscii(bytes, 1, "PNG") &&
        bytes.length >= 24) pngMeta(bytes)
    else None

  private def isPnmWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  private def hasAscii(bytes: Array[Byte], off: Int, s: String): Boolean =
    bytes.length >= off + s.length &&
      s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  // ---- PNM (P5 = PGM gray, P6 = PPM rgb), binary variants -------------

  /** PNM header scanner: after the magic, whitespace/comment-separated
    * ASCII ints width, height, maxval, then ONE whitespace byte before
    * raw samples. Returns (width, height, maxval, dataOffset).
    */
  private[operators] def pnmHeader(b: Array[Byte])
      : Option[(Int, Int, Int, Int)] = {
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      // skip whitespace and '#' comments (to end of line)
      var guard = true
      while (guard && i < b.length) {
        if (isPnmWs(b(i))) i += 1
        else if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else guard = false
      }
      var x = 0L
      var digits = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        x = x * 10 + (b(i) - '0'); digits += 1; i += 1
      }
      if (digits == 0 || x > Int.MaxValue) return None
      vals(v) = x.toInt
      v += 1
    }
    if (i >= b.length || !isPnmWs(b(i))) return None
    Some((vals(0), vals(1), vals(2), i + 1))
  }

  private def pnmMeta(b: Array[Byte]): Option[Meta] =
    pnmHeader(b).collect {
      case (w, h, maxv, off)
          if w > 0 && h > 0 && maxv > 0 && maxv < 65536 &&
            // enough raw data for the declared geometry (1 byte/sample
            // at maxval<256, 2 above; P6 has 3 channels)
            b.length - off >=
              w.toLong * h * (if (b(1) == '6') 3 else 1) *
                (if (maxv < 256) 1 else 2) =>
        Meta(if (b(1) == '6') "ppm" else "pgm", w, h)
    }

  /** Raw interleaved pixel bytes of an 8-bit binary PPM/PGM: row-major,
    * top-down, RGB interleaved for P6. None on truncated data.
    */
  def pnmPixels(b: Array[Byte]): Option[Array[Byte]] =
    for {
      (w, h, maxv, off) <- pnmHeader(b)
      if maxv > 0 && maxv < 256
      ch = if (b(1) == '6') 3 else 1
      n = w.toLong * h * ch
      if n <= Int.MaxValue && b.length - off >= n
    } yield java.util.Arrays.copyOfRange(b, off, off + n.toInt)

  // ---- BMP (uncompressed 24/32bpp, BITMAPINFOHEADER) ------------------

  /** Structural validation is strict enough that arbitrary text
    * starting "BM" can NEVER parse: the DIB header size must be a
    * known constant (four ASCII bytes read ≥ 0x20202020), the pixel
    * offset must sit inside the blob past both headers, and the
    * bit-depth must be a legal value.
    */
  private def bmpMeta(b: Array[Byte]): Option[Meta] = {
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    val w = le32(b, 18)
    val h = le32(b, 22)
    val bpp = le16(b, 28)
    val dibOk = dibSize == 40 || dibSize == 52 || dibSize == 56 ||
      dibSize == 108 || dibSize == 124
    val bppOk = bpp == 1 || bpp == 4 || bpp == 8 || bpp == 16 ||
      bpp == 24 || bpp == 32
    if (dibOk && bppOk && w > 0 && h != 0 &&
      dataOff >= 14 + dibSize && dataOff <= b.length)
      Some(Meta("bmp", w, math.abs(h)))
    else None
  }

  /** Top-down row-major RGB bytes of an uncompressed 24/32bpp BMP —
    * undoes the format's bottom-up row order, 4-byte row padding, and
    * BGR channel order. None for compressed or palette BMPs.
    */
  def bmpPixels(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val bytesPp = bpp / 8
    val stride = ((w * bytesPp + 3) / 4) * 4
    if (dataOff.toLong + stride.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // positive height = bottom-up storage; negative = top-down
      val srcRow = if (hRaw > 0) h - 1 - y else y
      var x = 0
      while (x < w) {
        val s = dataOff + srcRow * stride + x * bytesPp
        val d = (y * w + x) * 3
        out(d) = b(s + 2) // R (stored BGR)
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  // ---- WAV (RIFF/WAVE, PCM) -------------------------------------------

  /** Chunk walk: locate `fmt ` and `data`, return (channels, sampleRate,
    * bitsPerSample, dataOff, dataLen). Tolerates extra chunks (LIST…)
    * and odd-length chunk padding per the RIFF spec.
    */
  private[operators] def wavLayout(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Int)] = {
    if (!hasAscii(b, 0, "RIFF") || !hasAscii(b, 8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (hasAscii(b, i, "fmt ") && sz >= 16) {
        val audioFormat = le16(b, i + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le16(b, i + 10), le32(b, i + 12), le16(b, i + 22)))
      } else if (hasAscii(b, i, "data")) data = Some((i + 8, sz))
      i += 8 + sz + (sz & 1)
    }
    for {
      (ch, rate, bits) <- fmt
      (off, len) <- data
      if ch > 0 && rate > 0 && (bits == 8 || bits == 16)
    } yield (ch, rate, bits, off, len)
  }

  private def wavMeta(b: Array[Byte]): Option[Meta] =
    wavLayout(b).map { case (ch, _, bits, _, len) =>
      Meta("wav", len / (ch * bits / 8), ch) // frames × channels
    }

  /** PCM frame rate in Hz, for pipelines that need real audio timing. */
  def wavSampleRate(b: Array[Byte]): Option[Int] =
    wavLayout(b).map(_._2)

  /** Channel-0 samples normalized to [-1, 1] doubles (8-bit unsigned or
    * 16-bit signed little-endian PCM).
    */
  def wavSamples(b: Array[Byte]): Option[Array[Double]] =
    wavLayout(b).map { case (ch, _, bits, off, len) =>
      val bytesPerSample = bits / 8
      val frame = ch * bytesPerSample
      val n = len / frame
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        val o = off + i * frame
        out(i) =
          if (bits == 8) ((b(o) & 0xff) - 128) / 128.0
          else le16(b, o).toShort / 32768.0
        i += 1
      }
      out
    }

  // ---- PNG (IHDR only — dimensions without inflating IDAT) ------------

  private def pngMeta(b: Array[Byte]): Option[Meta] = {
    // 8-byte signature, then the IHDR chunk MUST be first:
    // len(4) "IHDR" width(4) height(4) …
    if (!hasAscii(b, 12, "IHDR")) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w > 0 && h > 0) Some(Meta("png", w, h)) else None
  }

  // ---- Shared pixel ops (real resample behind the decode) -------------

  /** Nearest-neighbour resample of row-major interleaved pixels —
    * the real implementation of the resize stage's pixel path (the
    * gated `multimodal_resize` query computes only the geometry; this
    * is the per-blob kernel a real pipeline runs with that geometry).
    */
  def resizeNearest(px: Array[Byte], w: Int, h: Int, ch: Int,
      outW: Int, outH: Int): Array[Byte] = {
    require(px.length == w * h * ch, s"pixel buffer ${px.length} != $w*$h*$ch")
    require(outW > 0 && outH > 0, "target geometry must be positive")
    val out = new Array[Byte](outW * outH * ch)
    var y = 0
    while (y < outH) {
      val sy = math.min(h - 1, y * h / outH)
      var x = 0
      while (x < outW) {
        val sx = math.min(w - 1, x * w / outW)
        var c = 0
        while (c < ch) {
          out((y * outW + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** 8-bin luminance histogram over interleaved RGB or gray pixels —
    * the image-side analogue of the byte-class feature vector.
    */
  def luminanceHistogram(px: Array[Byte], ch: Int): Array[Long] = {
    require(ch == 1 || ch == 3, s"channels must be 1 or 3, got $ch")
    val hist = new Array[Long](8)
    var i = 0
    while (i + ch <= px.length) {
      val lum =
        if (ch == 1) px(i) & 0xff
        else ((px(i) & 0xff) * 299 + (px(i + 1) & 0xff) * 587 +
          (px(i + 2) & 0xff) * 114) / 1000
      hist(lum >> 5) += 1
      i += ch
    }
    hist
  }
}
