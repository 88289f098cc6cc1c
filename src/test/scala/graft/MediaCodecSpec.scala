package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.operators.{MediaCodec, Multimodal}

/** Real-codec coverage for the multimodal pipeline (SURVEY §2.1b): the
  * corpus ships no real media bytes, so these tests GENERATE valid
  * binary PPM/PGM, uncompressed BMP, PCM WAV, and PNG-header blobs and
  * assert (a) the pure decoders recover exact geometry, pixels, and
  * samples, and (b) the same distributed decode plan the gated
  * `multimodal_decode` query runs emits the REAL dimensions for media
  * blobs while text blobs keep the deterministic arithmetic fallback
  * (which is what keeps the gated query oracle-checkable).
  */
class MediaCodecSpec extends SparkTestBase {

  // ---- generators (independent byte-level writers, not the decoders) --

  private def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n# generated\n$w $h\n255\n".getBytes("US-ASCII"))
    out.write(px)
    out.toByteArray
  }

  private def pgm(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P5 $w $h 255 ".getBytes("US-ASCII"))
    out.write(px)
    out.toByteArray
  }

  /** Uncompressed 24bpp BMP, bottom-up rows, 4-byte row padding. */
  private def bmp24(w: Int, h: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54) // size, reserved, offset
    buf.putInt(40).putInt(w).putInt(h)             // BITMAPINFOHEADER
    buf.putShort(1).putShort(24)                   // planes, bpp
    buf.putInt(0).putInt(dataSize)                 // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) {                // bottom-up
      for (x <- 0 until w) {
        val s = (y * w + x) * 3
        buf.put(rgbTopDown(s + 2)).put(rgbTopDown(s + 1)).put(rgbTopDown(s))
      }
      for (_ <- w * 3 until stride) buf.put(0.toByte)
    }
    buf.array()
  }

  /** 16-bit PCM WAV with an extra LIST chunk before data (chunk-walk). */
  private def wav16(rate: Int, channels: Int,
      frames: Array[Short]): Array[Byte] = {
    val dataLen = frames.length * 2
    val listBody = "INFOjunk".getBytes("US-ASCII")
    val total = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(rate)
    buf.putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
      .put(listBody)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(buf.putShort)
    buf.array()
  }

  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(0) // CRC not validated by the header parser
    buf.array()
  }

  // ---- pure decoder tests --------------------------------------------

  test("PPM: header geometry and raw pixel round-trip") {
    val px = Array.tabulate(6 * 4 * 3)(i => (i * 7 % 256).toByte)
    val blob = ppm(6, 4, px)
    assert(MediaCodec.decodeMeta(blob) === Some(MediaCodec.Meta("ppm", 6, 4)))
    assert(MediaCodec.pnmPixels(blob).get.toSeq === px.toSeq)
  }

  test("PGM: single-channel parse, truncated data rejected") {
    val px = Array.tabulate(5 * 3)(i => i.toByte)
    assert(MediaCodec.decodeMeta(pgm(5, 3, px)) ===
      Some(MediaCodec.Meta("pgm", 5, 3)))
    // drop the last pixel byte: geometry no longer backed by data
    val truncated = pgm(5, 3, px).dropRight(1)
    assert(MediaCodec.decodeMeta(truncated) === None)
  }

  test("BMP: bottom-up BGR with row padding decodes to top-down RGB") {
    // 3×2 distinct-pixel image; stride 12 = 9 data + 3 pad bytes per row
    val rgb = Array.tabulate(3 * 2 * 3)(i => (10 * i).toByte)
    val blob = bmp24(3, 2, rgb)
    assert(MediaCodec.decodeMeta(blob) === Some(MediaCodec.Meta("bmp", 3, 2)))
    assert(MediaCodec.bmpPixels(blob).get.toSeq === rgb.toSeq)
  }

  test("WAV: chunk walk past LIST, frames/channels/rate, normalization") {
    // 4 frames × 2 channels interleaved
    val frames = Array[Short](0, 100, 16384, -200, -32768, 300, 32767, -400)
    val blob = wav16(8000, 2, frames)
    assert(MediaCodec.decodeMeta(blob) === Some(MediaCodec.Meta("wav", 4, 2)))
    assert(MediaCodec.wavSampleRate(blob) === Some(8000))
    val ch0 = MediaCodec.wavSamples(blob).get
    assert(ch0.length === 4)
    assert(ch0(0) === 0.0 && ch0(1) === 0.5 && ch0(2) === -1.0)
    assert(math.abs(ch0(3) - 32767.0 / 32768.0) < 1e-12)
  }

  test("PNG: IHDR dimensions parsed without inflating pixel data") {
    assert(MediaCodec.decodeMeta(pngHeader(640, 480)) ===
      Some(MediaCodec.Meta("png", 640, 480)))
  }

  test("arbitrary text never parses as media, even with magic prefixes") {
    for (s <- Seq(
        "BM this document begins with the letters B and M and keeps " +
          "going long enough to cover every header offset the BMP " +
          "parser reads before validation rejects it as text",
        "P6 is the magic number of a portable pixmap says this doc",
        "RIFF through the archives, not an audio container at all...",
        "plain document with no magic anywhere"))
      assert(MediaCodec.decodeMeta(s.getBytes("US-ASCII")) === None,
        s"false positive on: ${s.take(20)}")
  }

  test("resizeNearest: exact on integer downscale, corners preserved") {
    // 4×4 gray ramp → 2×2 picks the top-left of each 2×2 block
    val px = Array.tabulate(16)(i => i.toByte)
    val out = MediaCodec.resizeNearest(px, 4, 4, 1, 2, 2)
    assert(out.toSeq === Seq[Byte](0, 2, 8, 10))
    // identity resize is a no-op
    assert(MediaCodec.resizeNearest(px, 4, 4, 1, 4, 4).toSeq === px.toSeq)
  }

  test("luminanceHistogram: gray counts bins, RGB uses weighted luma") {
    val gray = Array[Byte](0, 31, 32, 255.toByte)
    assert(MediaCodec.luminanceHistogram(gray, 1).toSeq ===
      Seq[Long](2, 1, 0, 0, 0, 0, 0, 1))
    // pure red (255,0,0) → luma 76 → bin 2
    val red = Array[Byte](255.toByte, 0, 0)
    assert(MediaCodec.luminanceHistogram(red, 3)(2) === 1L)
  }

  // ---- the distributed decode plan over real media bytes -------------

  test("decodeBlobs: real geometry for media blobs, fallback for text") {
    val spark2 = spark
    import spark2.implicits._
    val media: Seq[(Long, Array[Byte])] = Seq(
      1L -> ppm(6, 4, Array.fill(6 * 4 * 3)(7.toByte)),
      2L -> bmp24(3, 2, Array.fill(3 * 2 * 3)(9.toByte)),
      3L -> wav16(44100, 1, Array.fill[Short](100)(5)),
      4L -> pngHeader(320, 200),
      5L -> "an ordinary text document with no media header".getBytes("US-ASCII"))
    val out = Multimodal.decodeBlobs(spark,
        media.toDF("doc_id", "blob").repartition(4))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L) === ((6, 4, "50360a23")))      // P6\n#
    assert(out(2L)._1 === 3 && out(2L)._2 === 2)
    assert(out(2L)._3 === "424d4e00")              // BM + LE size 78=0x4e
    assert(out(3L) === ((100, 1, "52494646")))     // RIFF; 100 frames, 1 ch
    assert(out(4L) === ((320, 200, "89504e47")))
    val textLen = media(4)._2.length
    assert(out(5L)._1 === 64 + textLen % 640, "text keeps the fallback")
    assert(out(5L)._2 === 64 + (textLen / 7) % 480)
  }

  test("gated multimodal_decode over the corpus is all-fallback (oracle safety)") {
    // every corpus blob must take the arithmetic branch, or the DuckDB
    // oracle would diverge — pin the invariant the gate relies on
    val bad = Multimodal.multimodalDecode(spark, sf)
      .filter(not(col("width") === lit(64) + col("n_bytes") % 640))
      .count()
    assert(bad === 0L)
  }
}
