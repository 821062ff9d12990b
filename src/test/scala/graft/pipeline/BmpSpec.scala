package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec against HAND-CRAFTED golden bytes (so the decoder is
  * pinned to the actual on-disk format, not merely to the encoder's own
  * conventions), plus loud-failure and round-trip properties.
  */
class BmpSpec extends AnyFunSuite {

  /** A 2×2 24-bit BMP written out BYTE BY BYTE from the spec: red at
    * (0,0), green at (1,0), blue at (0,1), white at (1,1). Row stride
    * = 8 (6 pixel bytes + 2 pad); bottom row (y=1) stored FIRST.
    */
  private val golden: Array[Byte] = Array[Int](
    'B', 'M', // magic
    70, 0, 0, 0, // file size = 54 + 2*8
    0, 0, 0, 0, // reserved
    54, 0, 0, 0, // pixel offset
    40, 0, 0, 0, // info header size
    2, 0, 0, 0, // width
    2, 0, 0, 0, // height (positive: bottom-up)
    1, 0, // planes
    24, 0, // bpp
    0, 0, 0, 0, // BI_RGB
    16, 0, 0, 0, // image size
    0, 0, 0, 0, 0, 0, 0, 0, // x/y pixels-per-meter
    0, 0, 0, 0, 0, 0, 0, 0, // colors used/important
    // pixel array, bottom-up, BGR + 2 pad bytes per row:
    255, 0, 0, 255, 255, 255, 0, 0, // y=1: blue, white, pad
    0, 0, 255, 0, 255, 0, 0, 0 // y=0: red, green, pad
  ).map(_.toByte)

  test("decodes the hand-crafted golden BMP exactly") {
    val s = Bmp.decode(golden)
    assert(s.width == 2 && s.height == 2 && s.n_bytes == 70)
    // Channel values in image order (x, y, [r, g, b]):
    // (0,0)=[255,0,0] (1,0)=[0,255,0] (0,1)=[0,0,255] (1,1)=[255,255,255]
    assert(s.px_sum == 255L * 6)
    // Weights (y*w + x)*3 + c + 1: red@1, green@5, blue@9, white@10+11+12.
    assert(s.px_wsum == 255L * (1 + 5 + 9 + 10 + 11 + 12))
  }

  test("encode/decode round-trips every padding width and formula image") {
    for (w <- 1 to 9; h <- Seq(1, 3, 5)) {
      val pix = (x: Int, y: Int, c: Int) => (11 * x + 17 * y + 29 * c) % 256
      val s = Bmp.decode(Bmp.encode(w, h, pix))
      var sum = 0L; var wsum = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 to 2) {
        val v = pix(x, y, c)
        sum += v; wsum += ((y.toLong * w + x) * 3 + c + 1) * v
      }
      assert(s == Bmp.Stats(w, h, 54L + h * Bmp.rowStride(w), sum, wsum),
        s"round-trip mismatch at ${w}x$h")
    }
  }

  test("decoder order-sensitivity: a row flip or channel swap is caught") {
    // Re-encode the golden image with its rows NOT flipped (top-down
    // data in a bottom-up container): px_sum unchanged, wsum differs.
    val topDown = golden.clone()
    Array.copy(golden, 54, topDown, 62, 8)
    Array.copy(golden, 62, topDown, 54, 8)
    assert(Bmp.decode(topDown).px_sum == Bmp.decode(golden).px_sum)
    assert(Bmp.decode(topDown).px_wsum != Bmp.decode(golden).px_wsum)
    // Swap B and R of the red pixel (stored at row y=0 slot, offset 62).
    val swapped = golden.clone()
    val t = swapped(62); swapped(62) = swapped(64); swapped(64) = t
    assert(Bmp.decode(swapped).px_sum == Bmp.decode(golden).px_sum)
    assert(Bmp.decode(swapped).px_wsum != Bmp.decode(golden).px_wsum)
  }

  test("top-down BMP (negative height) decodes identically") {
    // Same golden image re-encoded top-down: height = -2, rows in IMAGE
    // order (y=0 first), no flip.
    val td = golden.clone()
    // -2 as LE i32 at offset 22
    td(22) = 0xfe.toByte; td(23) = 0xff.toByte
    td(24) = 0xff.toByte; td(25) = 0xff.toByte
    Array.copy(golden, 62, td, 54, 8) // y=0 row first
    Array.copy(golden, 54, td, 62, 8) // y=1 row second
    assert(Bmp.decode(td) == Bmp.decode(golden).copy(n_bytes = 70))
  }

  test("malformed input fails loudly") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Bmp.decode(b)).getMessage
    assert(msg(Array[Byte](1, 2, 3)).contains("too short"))
    val badMagic = golden.clone(); badMagic(0) = 'X'
    assert(msg(badMagic).contains("magic"))
    val truncated = golden.take(60)
    assert(msg(truncated).contains("truncated"))
    val bad8bpp = golden.clone(); bad8bpp(28) = 8
    assert(msg(bad8bpp).contains("bpp"))
    val rle = golden.clone(); rle(30) = 1
    assert(msg(rle).contains("compression"))
  }
}
