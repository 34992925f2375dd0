package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec must be a REAL format implementation: encode→decode
  * round-trips across every row-padding class, the decoder reads
  * dimensions/offset from the header (not from assumptions), and
  * malformed inputs fail loudly instead of returning garbage features.
  */
class BmpCodecSpec extends AnyFunSuite {

  test("round-trip across all four row-padding classes") {
    // 3w mod 4 = 3,2,1,0 for w = 1,2,3,4 — each padding amount hit
    for (w <- 1 to 4; h <- Seq(1, 3)) {
      val bytes = BmpCodec.encode24(w, h, (x, y) => (x + 1, y + 2, x + y))
      val d = BmpCodec.decode24(bytes)
      assert(d.width === w && d.height === h)
      assert(d.nBytes === bytes.length.toLong)
      val pix = for (x <- 0 until w; y <- 0 until h) yield (x + 1, y + 2, x + y)
      assert(d.sumR === pix.map(_._1.toLong).sum, s"sumR ${w}x$h")
      assert(d.sumG === pix.map(_._2.toLong).sum, s"sumG ${w}x$h")
      assert(d.sumB === pix.map(_._3.toLong).sum, s"sumB ${w}x$h")
    }
  }

  test("file size is header + padded rows") {
    // w=3: 9 pixel bytes/row padded to 12
    assert(BmpCodec.encode24(3, 2, (_, _) => (0, 0, 0)).length === 54 + 2 * 12)
    // w=4: 12 bytes/row, no padding
    assert(BmpCodec.encode24(4, 2, (_, _) => (0, 0, 0)).length === 54 + 2 * 12)
  }

  test("channel order: decoder must un-swap the on-disk BGR") {
    val bytes = BmpCodec.encode24(1, 1, (_, _) => (10, 20, 30))
    val d = BmpCodec.decode24(bytes)
    assert((d.sumR, d.sumG, d.sumB) === ((10L, 20L, 30L)))
    // on disk the single pixel is stored B,G,R at the 54-byte offset
    assert((bytes(54) & 0xff, bytes(55) & 0xff, bytes(56) & 0xff) === ((30, 20, 10)))
  }

  test("bottom-up row order: top row is stored LAST") {
    // 1x2 image: top pixel r=1, bottom pixel r=2
    val bytes = BmpCodec.encode24(1, 2, (_, y) => (y + 1, 0, 0))
    // rows padded to 4; bottom row (r=2) first at offset 54, top row at 58
    assert((bytes(56) & 0xff) === 2, "bottom row stored first")
    assert((bytes(60) & 0xff) === 1, "top row stored last")
  }

  test("malformed inputs fail loudly") {
    val good = BmpCodec.encode24(2, 2, (_, _) => (1, 1, 1))
    intercept[IllegalArgumentException](BmpCodec.decode24(good.take(10))) // truncated
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode24(badMagic))
    val badSize = good.clone(); badSize(2) = (badSize(2) + 1).toByte
    intercept[IllegalArgumentException](BmpCodec.decode24(badSize))
    val bad8bpp = good.clone(); bad8bpp(28) = 8.toByte
    intercept[IllegalArgumentException](BmpCodec.decode24(bad8bpp))
    val compressed = good.clone(); compressed(30) = 1.toByte
    intercept[IllegalArgumentException](BmpCodec.decode24(compressed))
    intercept[IllegalArgumentException](
      BmpCodec.decode24(good.take(60))) // header ok, pixel data truncated
  }
}
