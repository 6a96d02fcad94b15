package graft.pcap

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

/** QUIC Initial decryption (RFC 9001 §5): key-schedule vectors from
  * Appendix A.1, then a full protect→capture→dissect round-trip — the
  * spec-side sealer uses the same published algorithm (HKDF over the
  * v1 salt + DCID, AES-128-GCM, AES-ECB header protection), so a
  * recovered SNI proves the dissector's removal path end-to-end. */
class QuicInitialSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def hexStr(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("RFC 9001 A.1 initial key derivation vectors") {
    val (key, iv, hp) = Dissect.quicInitialClientKeys(hex("8394c8f03e515708"))
    assert(hexStr(key) === "1f369613dd76d5467730efcbe3b1a22d")
    assert(hexStr(iv) === "fa044b2f42a3fd3b46fb255c")
    assert(hexStr(hp) === "9f50449e04a0e810283a1e9933adedd2")
  }

  /** Minimal TLS 1.3 ClientHello handshake message carrying an SNI and an
    * ALPN extension (the two parseClientHello surfaces). */
  private def clientHello(sni: String, alpn: String): Array[Byte] = {
    val sniB = sni.getBytes("ISO-8859-1")
    val alpnB = alpn.getBytes("ISO-8859-1")
    val ext = ByteBuffer.allocate(64 + sniB.length + alpnB.length)
    ext.putShort(0.toShort).putShort((sniB.length + 5).toShort) // server_name
    ext.putShort((sniB.length + 3).toShort).put(0.toByte)
    ext.putShort(sniB.length.toShort).put(sniB)
    ext.putShort(16.toShort).putShort((alpnB.length + 3).toShort) // alpn
    ext.putShort((alpnB.length + 1).toShort).put(alpnB.length.toByte).put(alpnB)
    val extA = java.util.Arrays.copyOf(ext.array(), ext.position())
    val body = ByteBuffer.allocate(64 + extA.length)
    body.putShort(0x0303.toShort).put(new Array[Byte](32)) // version + random
    body.put(0.toByte) // session id
    body.putShort(4.toShort).putShort(0x1301.toShort).putShort(0x1302.toShort)
    body.put(1.toByte).put(0.toByte) // null compression
    body.putShort(extA.length.toShort).put(extA)
    val bodyA = java.util.Arrays.copyOf(body.array(), body.position())
    val hs = ByteBuffer.allocate(4 + bodyA.length)
    hs.put(1.toByte) // client_hello
    hs.put(((bodyA.length >> 16) & 0xff).toByte)
    hs.put(((bodyA.length >> 8) & 0xff).toByte)
    hs.put((bodyA.length & 0xff).toByte)
    hs.put(bodyA)
    hs.array()
  }

  /** Seal an Initial per RFC 9001: CRYPTO frame + PADDING, AEAD, then
    * header protection. pn = 0 with a 1-byte encoding. `keyDcid` selects
    * the key schedule (the CLIENT's original DCID for both sides); `dcid`
    * is what goes in the wire header. */
  private def sealInitial(dcid: Array[Byte], plaintextFrames: Array[Byte],
      side: String = "client in", keyDcid: Array[Byte] = null): Array[Byte] = {
    val (key, iv, hp) =
      Dissect.quicInitialKeys(if (keyDcid == null) dcid else keyDcid, side)
    val header = ByteBuffer.allocate(12 + dcid.length)
    header.put(0xc0.toByte) // long header, fixed bit, Initial, pn_len 1
    header.putInt(1) // version
    header.put(dcid.length.toByte).put(dcid)
    header.put(0.toByte) // scid len
    header.put(0.toByte) // token length varint = 0
    val payloadLen = 1 + plaintextFrames.length + 16 // pn + ciphertext + tag
    header.putShort((0x4000 | payloadLen).toShort) // 2-byte length varint
    header.put(0.toByte) // packet number 0 (protected below)
    val hdr = java.util.Arrays.copyOf(header.array(), header.position())
    val pnOff = hdr.length - 1
    val nonce = iv.clone() // pn = 0: nonce is the iv
    val gcm = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    gcm.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, nonce))
    gcm.updateAAD(hdr)
    val ct = gcm.doFinal(plaintextFrames)
    val pkt = ByteBuffer.allocate(hdr.length + ct.length)
    pkt.put(hdr).put(ct)
    val out = pkt.array()
    // header protection: mask from the ciphertext sample at pnOff + 4
    val ecb = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    ecb.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(hp, "AES"))
    val mask = ecb.doFinal(java.util.Arrays.copyOfRange(out, pnOff + 4, pnOff + 20))
    out(0) = (out(0) ^ (mask(0) & 0x0f)).toByte
    out(pnOff) = (out(pnOff) ^ mask(1)).toByte
    out
  }

  private def udpFrame(sp: Int, dp: Int, payload: Array[Byte],
      rev: Boolean = false): Array[Byte] = {
    val b = ByteBuffer.allocate(14 + 20 + 8 + payload.length)
    b.put(new Array[Byte](12)).putShort(0x0800.toShort)
    val iplen = 20 + 8 + payload.length
    b.put(0x45.toByte).put(0.toByte).putShort(iplen.toShort)
      .putShort(1.toShort).putShort(0.toShort)
      .put(64.toByte).put(17.toByte).putShort(0.toShort)
    if (rev) b.put(Array[Byte](10, 0, 0, 2)).put(Array[Byte](10, 0, 0, 1))
    else b.put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
    b.putShort(sp.toShort).putShort(dp.toShort)
      .putShort((8 + payload.length).toShort).putShort(0.toShort)
    b.put(payload)
    b.array()
  }

  private def dissectOne(frame: Array[Byte]): Dissect.Dissected =
    Dissect.dissect(
      PcapFormat.Record(1, 1000000L, frame.length, frame.length, frame),
      1, new Dissect.Tracker)

  test("client Initial decrypts: ClientHello SNI/ALPN surface through the capture") {
    val dcid = hex("8394c8f03e515708")
    val ch = clientHello("quic.example.com", "h3")
    val crypto = ByteBuffer.allocate(4 + ch.length + 24)
    crypto.put(0x06.toByte).put(0x00.toByte) // CRYPTO, offset 0
    crypto.putShort((0x4000 | ch.length).toShort) // 2-byte length varint
    crypto.put(ch)
    (0 until 24).foreach(_ => crypto.put(0.toByte)) // PADDING
    val pkt = sealInitial(dcid, crypto.array())
    val d = dissectOne(udpFrame(50000, 443, pkt))
    assert(d.protocols === "eth:ethertype:ip:udp:quic:tls")
    assert(d.info ===
      "Initial, DCID=83:94:c8:f0:3e:51:57:08, CRYPTO(ClientHello SNI=quic.example.com)")
    assert(d.values("quic.version") === 1L)
    assert(d.values("tls.handshake.extensions_server_name") === "quic.example.com")
    assert(d.values("tls.handshake.extensions_alpn_str") === "h3")
    assert(d.values("tls.handshake.ciphersuite") === "0x1301,0x1302")
  }

  test("server Initial decrypts via the client DCID held in conversation state") {
    val clientDcid = hex("aabbccdd00112233")
    val ch = clientHello("bidi.example.com", "h3")
    val cCrypto = ByteBuffer.allocate(4 + ch.length + 24)
    cCrypto.put(0x06.toByte).put(0x00.toByte)
    cCrypto.putShort((0x4000 | ch.length).toShort).put(ch)
    (0 until 24).foreach(_ => cCrypto.put(0.toByte))
    // minimal ServerHello: type 2, 3-byte length, 40-byte body
    val shBody = new Array[Byte](40)
    val sh = ByteBuffer.allocate(4 + shBody.length)
    sh.put(2.toByte).put(0.toByte).put(0.toByte).put(shBody.length.toByte).put(shBody)
    val sCrypto = ByteBuffer.allocate(4 + sh.capacity() + 16)
    sCrypto.put(0x06.toByte).put(0x00.toByte)
    sCrypto.putShort((0x4000 | sh.capacity()).toShort).put(sh.array())
    (0 until 16).foreach(_ => sCrypto.put(0.toByte))

    val tracker = new Dissect.Tracker
    def run(frame: Array[Byte], n: Long): Dissect.Dissected =
      Dissect.dissect(PcapFormat.Record(n, n * 1000000L, frame.length, frame.length, frame),
        1, tracker)
    // 1) client Initial stores the original DCID on the conversation
    val d1 = run(udpFrame(50002, 443, sealInitial(clientDcid, cCrypto.array())), 1)
    assert(d1.info.endsWith("CRYPTO(ClientHello SNI=bidi.example.com)"))
    // 2) the server's Initial uses its OWN dcid on the wire but derives
    //    keys from the client's original DCID with the "server in" label
    val sPkt = sealInitial(hex("5e5e5e5e"), sCrypto.array(),
      side = "server in", keyDcid = clientDcid)
    val d2 = run(udpFrame(443, 50002, sPkt, rev = true), 2)
    assert(d2.info === "Initial, DCID=5e:5e:5e:5e, CRYPTO(ServerHello)")
    assert(d2.protocols === "eth:ethertype:ip:udp:quic:tls")
  }

  test("tampered Initial falls back to the opaque rendering, never wrong values") {
    val dcid = hex("00112233445566")
    val ch = clientHello("tamper.example.com", "h3")
    val crypto = ByteBuffer.allocate(4 + ch.length)
    crypto.put(0x06.toByte).put(0x00.toByte)
    crypto.putShort((0x4000 | ch.length).toShort)
    crypto.put(ch)
    val pkt = sealInitial(dcid, crypto.array())
    pkt(pkt.length - 1) = (pkt(pkt.length - 1) ^ 0xff).toByte // break the AEAD tag
    val d = dissectOne(udpFrame(50001, 443, pkt))
    assert(d.protocols === "eth:ethertype:ip:udp:quic")
    assert(d.info === "Initial, DCID=00:11:22:33:44:55:66")
    assert(!d.values.contains("tls.handshake.extensions_server_name"))
  }
}
