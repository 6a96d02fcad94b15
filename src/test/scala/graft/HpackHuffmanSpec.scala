package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** HPACK Huffman decoding pinned to the RFC 7541 Appendix C examples —
  * the published request/response header-field encodings exercise most of
  * the Appendix B code table (5-bit through 22-bit codes), so a transcription
  * error in the vendored constants fails here, not in a capture golden. */
class HpackHuffmanSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dec(hexStr: String): String = {
    val d = hex(hexStr)
    Dissect.huffDecode(d, 0, d.length)
  }

  test("RFC 7541 C.4 request examples") {
    assert(dec("f1e3 c2e5 f23a 6ba0 ab90 f4ff") === "www.example.com")
    assert(dec("a8eb 1064 9cbf") === "no-cache")
    assert(dec("25a8 49e9 5ba9 7d7f") === "custom-key")
    assert(dec("25a8 49e9 5bb8 e8b4 bf") === "custom-value")
  }

  test("RFC 7541 C.6 response examples") {
    assert(dec("6402") === "302")
    assert(dec("aec3 771a 4b") === "private")
    assert(dec("d07a be94 1054 d444 a820 0595 040b 8166 e082 a62d 1bff") ===
      "Mon, 21 Oct 2013 20:13:21 GMT")
    assert(dec("9d29 ad17 1863 c78f 0b97 c8e9 ae82 ae43 d3") ===
      "https://www.example.com")
    assert(dec("640e ff") === "307")
    assert(dec("d07a be94 1054 d444 a820 0595 040b 8166 e084 a62d 1bff") ===
      "Mon, 21 Oct 2013 20:13:22 GMT")
    assert(dec("9bd9 ab") === "gzip")
    assert(dec("94e7 821d d7f2 e6c7 b335 dfdf cd5b 3960 d5af 2708 7f36 72c1" +
      "ab27 0fb5 291f 9587 3160 65c0 03ed 4ee5 b106 3d50 07") ===
      "foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1")
  }

  test("malformed codings return null, never a wrong string") {
    // padding longer than 7 bits (a full EOS-prefix byte after a symbol)
    assert(dec("f1e3 c2e5 f23a 6ba0 ab90 f4ff ff") === null)
    // padding bits not all ones: 'w' (1111000) + 0 pad
    assert(dec("f0") === null)
    // the 30-bit EOS symbol itself appearing in the stream
    assert(dec("ffff fffc") === null)
    // empty input decodes to the empty string
    assert(Dissect.huffDecode(Array.emptyByteArray, 0, 0) === "")
  }

  test("round-trip: every single-symbol coding decodes back to its octet") {
    (0 until 256).foreach { sym =>
      // left-justify the code and pad with EOS-prefix ones to a byte edge
      val code = Dissect.hpackHuffCode(sym)
      val len = Dissect.hpackHuffLen(sym)
      val nbytes = (len + 7) / 8
      var bits = code.toLong << (nbytes * 8 - len)
      bits |= (1L << (nbytes * 8 - len)) - 1
      val arr = Array.tabulate(nbytes)(i => ((bits >>> ((nbytes - 1 - i) * 8)) & 0xff).toByte)
      assert(Dissect.huffDecode(arr, 0, nbytes) === sym.toChar.toString,
        s"symbol $sym")
    }
  }
}
