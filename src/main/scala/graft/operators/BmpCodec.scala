package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal real BMP (Windows bitmap) codec for the multimodal decode
  * slot: 24-bit uncompressed, BITMAPFILEHEADER (14 bytes) +
  * BITMAPINFOHEADER (40 bytes), bottom-up pixel rows padded to 4-byte
  * boundaries, BGR byte order — the actual on-disk format, parsed from
  * the actual bytes (magic, data offset, dimensions, planes, bpp,
  * compression flag are all read and validated, not assumed).
  *
  * This replaces the synthetic byte-sum stub that sat in the q51
  * decode slot since round 1: the container has no image libraries, so
  * an uncompressed format parsed by hand is the honest way to make the
  * typed-mapPartitions decode path real. A deployment swaps
  * [[decode24]] for a JPEG/PNG library call; the Spark-side contract
  * (binary in, typed features out, partition-wise batching) is
  * identical.
  */
object BmpCodec {

  final case class Decoded(
      width: Int, height: Int, nBytes: Long,
      sumR: Long, sumG: Long, sumB: Long)

  private def rowSize(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Encode a w×h 24-bit BMP; `rgb(x, y)` returns the (r, g, b) of the
    * pixel at column x, row y (y = 0 is the TOP row — the encoder does
    * the bottom-up flip the format requires).
    */
  def encode24(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val rs = rowSize(w)
    val fileSize = 54 + rs * h
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putShort(0).putShort(0) // reserved
    buf.putInt(54) // pixel data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(w).putInt(h)
    buf.putShort(1) // planes
    buf.putShort(24) // bpp
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(rs * h) // image size
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0) // palette
    var y = h - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR
        x += 1
      }
      var pad = 3 * w
      while (pad < rs) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit BMP into its 256-bin GRAYSCALE histogram
    * (gray = (r + g + b) / 3, integer floor — the convention the q297
    * oracle mirrors): same header validation and padded bottom-up row
    * walk as [[decode24]], but keeps the per-level counts a
    * thresholding operator (Otsu) needs instead of only channel sums.
    */
  def decode24Histogram(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val d = decode24(bytes) // header validation + dims
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val rs = rowSize(d.width)
    val hist = new Array[Long](256)
    var y = 0
    while (y < d.height) {
      val rowBase = offset + (d.height - 1 - y) * rs
      var x = 0
      while (x < d.width) {
        val p = rowBase + 3 * x
        val gray = ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) / 3
        hist(gray) += 1
        x += 1
      }
      y += 1
    }
    (d.width, d.height, hist)
  }

  /** Parse a 24-bit uncompressed BMP: validates magic/planes/bpp/
    * compression, reads dimensions and the data offset FROM THE HEADER
    * (not from assumptions), walks the padded bottom-up rows, and
    * returns per-channel sums — the feature-extraction shape (decode →
    * small typed summary) the multimodal pipeline needs.
    */
  def decode24(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte, "bad BMP magic")
    val fileSize = buf.getInt(2)
    require(fileSize == bytes.length,
      s"header file size $fileSize != payload ${bytes.length}")
    val offset = buf.getInt(10)
    require(buf.getInt(14) >= 40, "unsupported DIB header")
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(buf.getShort(26) == 1, "planes must be 1")
    require(buf.getShort(28) == 24, "only 24-bpp supported")
    require(buf.getInt(30) == 0, "compressed BMP unsupported")
    val rs = rowSize(w)
    // lower bound too: an offset pointing inside the header would walk
    // header bytes as pixels (wrong sums, no error) or crash on negative
    require(offset >= 54, s"pixel data offset $offset inside the header")
    require(bytes.length >= offset + rs * h, "truncated pixel data")
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val rowBase = offset + (h - 1 - y) * rs
      var x = 0
      while (x < w) {
        val p = rowBase + 3 * x
        sb += bytes(p) & 0xff
        sg += bytes(p + 1) & 0xff
        sr += bytes(p + 2) & 0xff
        x += 1
      }
      y += 1
    }
    Decoded(w, h, bytes.length.toLong, sr, sg, sb)
  }
}
