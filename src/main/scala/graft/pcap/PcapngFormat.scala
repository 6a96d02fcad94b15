package graft.pcap

import java.io.{DataInputStream, EOFException}

import scala.collection.mutable

/** pcapng (pcap Next Generation) container framing — the default output
  * format of modern Wireshark/dumpcap. The reference reads pcapng through
  * tshark; the native backend needs its own parser for the "switch without
  * tshark" promise.
  *
  * Supported blocks: SHB (0x0A0D0D0A, per-section endianness via the
  * byte-order magic), IDB (linktype + if_tsresol option), EPB (64-bit
  * timestamp in interface resolution), SPB, with unknown block types
  * skipped by total length. Multiple sections and interfaces are handled;
  * each record carries its interface's linktype.
  */
object PcapngFormat {

  val Magic = 0x0a0d0d0a

  private final case class Iface(linktype: Int, tsresol: Int, tsresolPow2: Boolean, snaplen: Int = 0)

  def records(din: DataInputStream, maxPackets: Long): Iterator[PcapFormat.Record] =
    new Iterator[PcapFormat.Record] {
      private var le = true
      private val ifaces = mutable.ArrayBuffer.empty[Iface]
      private var nextRec: PcapFormat.Record = _
      private var done = false
      private var n = 0L

      private def u16(b: Array[Byte], o: Int): Int =
        if (le) ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      private def u32(b: Array[Byte], o: Int): Long = {
        val (a0, a1, a2, a3) =
          (b(o) & 0xffL, b(o + 1) & 0xffL, b(o + 2) & 0xffL, b(o + 3) & 0xffL)
        if (le) (a3 << 24) | (a2 << 16) | (a1 << 8) | a0
        else (a0 << 24) | (a1 << 16) | (a2 << 8) | a3
      }

      private def readFully(dst: Array[Byte]): Boolean =
        try { din.readFully(dst); true } catch { case _: EOFException => false }

      private def toMicros(units: Long, f: Iface): Long =
        if (f.tsresolPow2) {
          // 2^-v units: micros = units * 1e6 / 2^v (double is exact enough
          // for any real capture span at these magnitudes)
          (units.toDouble * 1e6 / math.pow(2, f.tsresol)).toLong
        } else if (f.tsresol <= 6) {
          units * math.pow(10, 6 - f.tsresol).toLong
        } else {
          units / math.pow(10, f.tsresol - 6).toLong
        }

      /** Epoch nanoseconds (lossless for tsresol ≤ 9; finer-than-ns
        * resolutions truncate to ns, the finest stamp the engine keeps). */
      private def toNanos(units: Long, f: Iface): Long =
        if (f.tsresolPow2) {
          (units.toDouble * 1e9 / math.pow(2, f.tsresol)).toLong
        } else if (f.tsresol <= 9) {
          units * math.pow(10, 9 - f.tsresol).toLong
        } else {
          units / math.pow(10, f.tsresol - 9).toLong
        }

      private def parseIdbOptions(body: Array[Byte], from: Int): (Int, Boolean) = {
        // options: code(2) len(2) value(pad4) ... until opt_endofopt(0)
        var i = from
        var tsresol = 6
        var pow2 = false
        while (i + 4 <= body.length) {
          val code = u16(body, i)
          val len = u16(body, i + 2)
          if (code == 0) return (tsresol, pow2)
          if (code == 9 && len >= 1) {
            val v = body(i + 4) & 0xff
            pow2 = (v & 0x80) != 0
            tsresol = v & 0x7f
          }
          i += 4 + ((len + 3) / 4) * 4
        }
        (tsresol, pow2)
      }

      private def advance(): Unit = {
        if (n >= maxPackets) { done = true; return }
        while (true) {
          val head = new Array[Byte](8)
          if (!readFully(head)) { done = true; return }
          // block type is read with current endianness EXCEPT the SHB,
          // whose type bytes are palindromic — safe either way
          val rawType = u32(head, 0)
          if (rawType == Magic) {
            // SHB: body starts with the byte-order magic
            val bom = new Array[Byte](4)
            if (!readFully(bom)) { done = true; return }
            le = (bom(0) & 0xff) == 0x4d // 4D3C2B1A little-endian
            val totalLen = u32(head, 4) // reinterpret with section endianness
            // remaining SHB body: totalLen - 8 head - 4 BOM - 4 trailer... the
            // trailer is part of the remaining read (body includes it)
            val rest = new Array[Byte]((totalLen - 12).toInt)
            if (!readFully(rest)) { done = true; return }
            ifaces.clear()
          } else {
            val totalLen = u32(head, 4)
            if (totalLen < 12 || totalLen > 256L * 1024 * 1024) { done = true; return }
            val body = new Array[Byte]((totalLen - 12).toInt)
            if (!readFully(body)) { done = true; return }
            val trailer = new Array[Byte](4)
            if (!readFully(trailer)) { done = true; return }
            rawType match {
              case 1 => // IDB: linktype(2) reserved(2) snaplen(4) options...
                val linktype = u16(body, 0)
                val snaplen = u32(body, 4).toInt
                val (tsresol, pow2) = parseIdbOptions(body, 8)
                ifaces += Iface(linktype, tsresol, pow2, snaplen)
              case 6 => // EPB
                val ifId = u32(body, 0).toInt
                val ts = (u32(body, 4) << 32) | u32(body, 8)
                val capLen = u32(body, 12).toInt
                val origLen = u32(body, 16).toInt
                val f = if (ifId < ifaces.length) ifaces(ifId) else Iface(1, 6, false)
                val data = java.util.Arrays.copyOfRange(body, 20, math.min(20 + capLen, body.length))
                n += 1
                nextRec = PcapFormat.Record(n, toMicros(ts, f), capLen, origLen, data, f.linktype,
                  tsNanos = toNanos(ts, f))
                return
              case 3 => // SPB: orig len only, no timestamp; captured length is
                // min(origLen, IDB snaplen) — the block body is padded to 4
                // bytes, so slicing by body.length would leak up to 3 pad
                // bytes into the payload (pcapng §4.4).
                val origLen = u32(body, 0).toInt
                val f = ifaces.headOption.getOrElse(Iface(1, 6, false))
                val bounded =
                  if (f.snaplen > 0) math.min(origLen.toLong, f.snaplen.toLong).toInt else origLen
                val capLen = math.min(bounded, body.length - 4)
                val data = java.util.Arrays.copyOfRange(body, 4, 4 + capLen)
                n += 1
                nextRec = PcapFormat.Record(n, 0L, capLen, origLen, data, f.linktype)
                return
              case _ => // ISB, NRB, custom: skip
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): PcapFormat.Record = {
        val r = nextRec
        advance()
        r
      }
    }
}
