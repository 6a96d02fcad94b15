package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media

/** Pixel-true PNG codec unit tests: the encode side writes
  * deflate-compressed scanlines rotating through all five PNG row
  * filters; decode must inflate and un-filter to recover the exact
  * pixels. (mm_thumbnail's DuckDB oracle proves the same thing
  * end-to-end; these pin the corruption boundaries.) */
class MediaPixelSpec extends AnyFunSuite {

  test("encode/decode round-trip recovers the exact pixel formula") {
    // h = 11 > 5 rows ⇒ every filter type (None/Sub/Up/Average/Paeth) used
    val img = Media.decodeGray(Media.pngPixelBytes(13, 11, 200))
    assert(img != null)
    assert(img.w === 13 && img.h === 11)
    for (y <- 0 until 11; x <- 0 until 13)
      assert(img.px(y * 13 + x) === (200 + 31 * x + 7 * y) % 256,
        s"pixel ($x,$y)")
  }

  test("1-pixel and wide/tall extremes round-trip") {
    for ((w, h) <- Seq((1, 1), (1, 17), (40, 1), (32, 32))) {
      val img = Media.decodeGray(Media.pngPixelBytes(w, h, 7))
      assert(img != null && img.w === w && img.h === h)
      assert(img.px(0) === 7 % 256)
    }
  }

  test("corruption never throws: truncation, bit flips, wrong codec") {
    val good = Media.pngPixelBytes(16, 16, 99)
    // truncations at every prefix length parse to null or a valid image
    var i = 0
    while (i < good.length) {
      Media.decodeGray(java.util.Arrays.copyOf(good, i)) // must not throw
      i += 7
    }
    // single corrupt byte inside the IDAT stream: null (bad zlib) or
    // decoded-but-different — never an exception
    val bad = good.clone()
    bad(45) = (bad(45) ^ 0xff).toByte
    Media.decodeGray(bad)
    // a non-PNG container is rejected cleanly
    assert(Media.decodeGray(Media.jpegBytes(8, 8, Array[Byte](1, 2, 3))) === null)
    // RGBA pngBytes (stand-in IDAT) is rejected: colour type 6, not 0
    assert(Media.decodeGray(Media.pngBytes(8, 8, Array[Byte](1, 2, 3))) === null)
  }
}
