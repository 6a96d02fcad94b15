package graft.pcap

import java.io.DataInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Driver-side record-boundary index pass for intra-file parallelism
  * (SURVEY §7.3): pcap records are self-delimiting (16-byte header carries
  * `incl_len`), so one sequential sweep over the record HEADERS (payloads
  * are skipped) yields exact split points — (byte offset, first frame
  * number) pairs — that partition a single huge capture across executors.
  *
  * The reference cannot do this at all (single tshark pipe, single thread,
  * reference `src/wireduck_extension.cpp:464-465`).
  *
  * Caveat (documented in PcapDataSource): conversation-derived fields
  * (`tcp.stream`, relative seq/ack, scaled windows) reset at split
  * boundaries; splits are for frame/ip/udp-level analytics at scale.
  * Frame numbering stays globally correct via `firstNumber`.
  */
object PcapIndex {

  final case class Split(offset: Long, length: Long, firstNumber: Long)

  def splits(file: String, targetBytes: Long, conf: Configuration): Seq[Split] = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      // pcapng / gzip / anything non-classic: no record-boundary splits —
      // the reader falls back to a whole-file scan
      val probe = new Array[Byte](4)
      in.readFully(probe)
      in.seek(0)
      val magic = ((probe(0) & 0xff) << 24) | ((probe(1) & 0xff) << 16) |
        ((probe(2) & 0xff) << 8) | (probe(3) & 0xff)
      val classicMagics = Set(PcapFormat.MagicLeMicro, PcapFormat.MagicBeMicro,
        PcapFormat.MagicLeNano, PcapFormat.MagicBeNano)
      if (!classicMagics.contains(magic))
        return Seq(Split(24L, Long.MaxValue, 1L))
      val din = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 16))
      val header = PcapFormat.readHeader(din)
      val le = header.littleEndian
      val out = Seq.newBuilder[Split]
      var splitStart = 24L
      var splitFirstNum = 1L
      var pos = 24L
      var n = 0L
      val rh = new Array[Byte](16)
      var eof = false
      while (!eof) {
        var read = 0
        while (read < 16 && !eof) {
          val r = din.read(rh, read, 16 - read)
          if (r < 0) eof = true else read += r
        }
        if (!eof && read == 16) {
          val incl = (if (le)
            ((rh(11) & 0xffL) << 24) | ((rh(10) & 0xff) << 16) | ((rh(9) & 0xff) << 8) | (rh(8) & 0xff)
          else
            ((rh(8) & 0xffL) << 24) | ((rh(9) & 0xff) << 16) | ((rh(10) & 0xff) << 8) | (rh(11) & 0xff)).toInt
          if (incl < 0 || pos + 16 + incl > fileLen) eof = true
          else {
            din.skipBytes(incl)
            pos += 16 + incl
            n += 1
            if (pos - splitStart >= targetBytes) {
              out += Split(splitStart, pos - splitStart, splitFirstNum)
              splitStart = pos
              splitFirstNum = n + 1
            }
          }
        }
      }
      if (pos > splitStart) out += Split(splitStart, pos - splitStart, splitFirstNum)
      out.result()
    } finally in.close()
  }
}
