#!/usr/bin/env python3
"""Generate src/test/resources/mixed.pcap — a deterministic golden capture
exercising the native HTTP / TLS(SNI) / DNS-response / ICMP / ARP
dissectors plus a FIX message split across two TCP segments (for the
desegment option). Checked in; regenerate with: python3 tools/make_mixed_pcap.py
"""
import struct

SOH = b"\x01"


def eth(dst, src, etype, payload):
    return dst + src + struct.pack(">H", etype) + payload


MAC_A = bytes.fromhex("020000000001")
MAC_B = bytes.fromhex("020000000002")


def ipv4(proto, src, dst, payload, ident=1, ttl=64):
    total = 20 + len(payload)
    hdr = struct.pack(">BBHHHBBH4s4s", 0x45, 0, total, ident, 0, ttl, proto, 0,
                      bytes(src), bytes(dst))
    return hdr, payload


def ip_frame(proto, src, dst, payload, ident=1):
    hdr, pay = ipv4(proto, src, dst, payload, ident)
    return eth(MAC_B, MAC_A, 0x0800, hdr + pay)


def tcp(sp, dp, seq, payload, flags=0x18, ack=0):
    hdr = struct.pack(">HHIIBBHHH", sp, dp, seq, ack, 5 << 4, flags, 8192, 0, 0)
    return hdr + payload


def udp(sp, dp, payload):
    return struct.pack(">HHHH", sp, dp, 8 + len(payload), 0) + payload


A = [10, 0, 0, 1]
B = [10, 0, 0, 2]

packets = []  # (sec, usec, frame)
t = 1700000000

# 1-2: ARP request/reply
arp_req = (struct.pack(">HHBBH", 1, 0x0800, 6, 4, 1) + MAC_A + bytes(A) +
           bytes(6) + bytes(B))
packets.append((t, 0, eth(b"\xff" * 6, MAC_A, 0x0806, arp_req)))
arp_rep = (struct.pack(">HHBBH", 1, 0x0800, 6, 4, 2) + MAC_B + bytes(B) +
           MAC_A + bytes(A))
packets.append((t, 100, eth(MAC_A, MAC_B, 0x0806, arp_rep)))

# 3-4: ICMP echo request/reply (id=0x42, seq=7)
icmp_req = struct.pack(">BBHHH", 8, 0, 0, 0x42, 7) + b"ping"
packets.append((t, 200, ip_frame(1, A, B, icmp_req, ident=2)))
icmp_rep = struct.pack(">BBHHH", 0, 0, 0, 0x42, 7) + b"ping"
packets.append((t, 300, ip_frame(1, B, A, icmp_rep, ident=3)))

# 5-6: DNS query + response (A example.com -> 93.184.216.34, ttl 300)
qname = b"\x07example\x03com\x00"
dns_q = struct.pack(">HHHHHH", 0x1234, 0x0100, 1, 0, 0, 0) + qname + struct.pack(">HH", 1, 1)
packets.append((t + 1, 0, ip_frame(17, A, B, udp(40000, 53, dns_q), ident=4)))
dns_r = (struct.pack(">HHHHHH", 0x1234, 0x8180, 1, 1, 0, 0) + qname +
         struct.pack(">HH", 1, 1) +
         b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 300, 4) + bytes([93, 184, 216, 34]))
packets.append((t + 1, 500, ip_frame(17, B, A, udp(53, 40000, dns_r), ident=5)))

# 7-8: HTTP request + response
http_req = (b"GET /index.html HTTP/1.1\r\nHost: example.com\r\n"
            b"User-Agent: graft/1.0\r\n\r\n")
packets.append((t + 2, 0, ip_frame(6, A, B, tcp(49152, 80, 1, http_req), ident=6)))
http_rsp = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: 13\r\n\r\n<html></html>")
packets.append((t + 2, 500, ip_frame(6, B, A, tcp(80, 49152, 1, http_rsp), ident=7)))

# 9: TLS ClientHello with SNI=example.com
name = b"example.com"
sni_ext = struct.pack(">HH", 0, 2 + 1 + 2 + len(name)) + \
    struct.pack(">HBH", 1 + 2 + len(name), 0, len(name)) + name
hs_body = (struct.pack(">H", 0x0303) + bytes(32) + b"\x00" +
           struct.pack(">H", 2) + struct.pack(">H", 0x1301) +
           b"\x01\x00" + struct.pack(">H", len(sni_ext)) + sni_ext)
hs = b"\x01" + len(hs_body).to_bytes(3, "big") + hs_body
tls_rec = struct.pack(">BBBH", 22, 3, 1, len(hs)) + hs
packets.append((t + 3, 0, ip_frame(6, A, B, tcp(49153, 443, 1, tls_rec), ident=8)))

# 10-11: FIX Logon split across two TCP segments (port 5001 -> 5002)
fix_msg = (b"8=FIX.4.2" + SOH + b"9=24" + SOH + b"35=A" + SOH + b"34=1" + SOH +
           b"49=INITIATOR" + SOH + b"10=123" + SOH)
# split BEFORE the 35= tag so the per-packet scanner cannot see the msgtype
part1, part2 = fix_msg[:12], fix_msg[12:]
packets.append((t + 4, 0, ip_frame(6, A, B, tcp(5001, 5002, 1, part1), ident=9)))
packets.append((t + 4, 500, ip_frame(6, A, B, tcp(5001, 5002, 1 + len(part1), part2), ident=10)))

# 12: whole FIX Heartbeat in one segment (same stream, completes after split msg)
fix_hb = b"8=FIX.4.2" + SOH + b"9=12" + SOH + b"35=0" + SOH + b"34=2" + SOH + b"10=124" + SOH
packets.append((t + 5, 0, ip_frame(6, A, B, tcp(5001, 5002, 1 + len(fix_msg), fix_hb), ident=11)))

# 13: TLS ServerHello (cipher 0x1301 chosen, supported_versions -> 1.3)
sv_ext = struct.pack(">HHH", 43, 2, 0x0304)
sh_body = (struct.pack(">H", 0x0303) + bytes(32) + b"\x00" +
           struct.pack(">H", 0x1301) + b"\x00" +
           struct.pack(">H", len(sv_ext)) + sv_ext)
sh = b"\x02" + len(sh_body).to_bytes(3, "big") + sh_body
sh_rec = struct.pack(">BBBH", 22, 3, 3, len(sh)) + sh
packets.append((t + 6, 0, ip_frame(6, B, A, tcp(443, 49153, 1, sh_rec), ident=12)))

# 14-15: HTTP/2 — client preface + SETTINGS, then server SETTINGS + HEADERS
H2_PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
settings = struct.pack(">BHBBI", 0, 0, 4, 0, 0)  # len=0 type=SETTINGS sid=0
headers_pay = b"\x82\x86\x84\x41"
headers = struct.pack(">BHBBI", 0, len(headers_pay), 1, 0x05, 1) + headers_pay
packets.append((t + 7, 0, ip_frame(6, A, B, tcp(49155, 80, 1, H2_PREFACE + settings), ident=13)))
packets.append((t + 7, 500, ip_frame(6, B, A, tcp(80, 49155, 1, settings + headers), ident=14)))

# 16-18: chunked HTTP response split mid-body (desegment decodes the body)
chunk_get = b"GET /chunked HTTP/1.1\r\nHost: example.com\r\n\r\n"
packets.append((t + 8, 0, ip_frame(6, A, B, tcp(49156, 80, 1, chunk_get), ident=15)))
chunk_hdrs = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
              b"Transfer-Encoding: chunked\r\n\r\n")
chunk_seg1 = chunk_hdrs + b"5\r\nhello\r\n"
chunk_seg2 = b"6\r\n world\r\n0\r\n\r\n"
packets.append((t + 8, 500, ip_frame(6, B, A, tcp(80, 49156, 1, chunk_seg1), ident=16)))
packets.append((t + 8, 900, ip_frame(6, B, A,
                tcp(80, 49156, 1 + len(chunk_seg1), chunk_seg2), ident=17)))


def write_pcap(path, pkts, linktype=1):
    out = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 262144, linktype)
    for sec, usec, frame in pkts:
        out += struct.pack("<IIII", sec, usec, len(frame), len(frame)) + frame
    with open(path, "wb") as f:
        f.write(out)
    print(f"wrote {path}: {len(pkts)} packets, {len(out)} bytes")


write_pcap("src/test/resources/mixed.pcap", packets)

# ---------------------------------------------------------------------------
# mixed_ooo.pcap — the same application content arriving with TCP segments
# OUT OF ORDER (plus a retransmission), for the seq-indexed reassembly
# golden: under desegment=true the dissected fix.msgtype/_ws.col.info must
# equal the in-order capture's, with the PDU completing on the hole-filling
# packet. Streams open with a SYN so the ISN (and the reassembly cursor)
# is anchored before any data segment arrives.
ooo = []
t2 = 1700001000

# FIX stream 5001->5002: SYN, then a Logon split in three segments sent
# 1st, 3rd, 2nd; then a retransmission of the 2nd; then a whole Heartbeat.
ooo.append((t2, 0, ip_frame(6, A, B, tcp(5001, 5002, 200, b"", flags=0x02), ident=20)))
fp1, fp2, fp3 = fix_msg[:12], fix_msg[12:24], fix_msg[24:]
ooo.append((t2, 100, ip_frame(6, A, B, tcp(5001, 5002, 201, fp1), ident=21)))
ooo.append((t2, 200, ip_frame(6, A, B, tcp(5001, 5002, 201 + 24, fp3), ident=22)))
ooo.append((t2, 300, ip_frame(6, A, B, tcp(5001, 5002, 201 + 12, fp2), ident=23)))
ooo.append((t2, 400, ip_frame(6, A, B, tcp(5001, 5002, 201 + 12, fp2), ident=24)))
ooo.append((t2, 500, ip_frame(6, A, B, tcp(5001, 5002, 201 + len(fix_msg), fix_hb), ident=25)))

# HTTP stream 49200->80: SYN, then the request's two segments REVERSED.
hp1, hp2 = http_req[:25], http_req[25:]
ooo.append((t2 + 1, 0, ip_frame(6, A, B, tcp(49200, 80, 300, b"", flags=0x02), ident=26)))
ooo.append((t2 + 1, 100, ip_frame(6, A, B, tcp(49200, 80, 301 + 25, hp2), ident=27)))
ooo.append((t2 + 1, 200, ip_frame(6, A, B, tcp(49200, 80, 301, hp1), ident=28)))

write_pcap("src/test/resources/mixed_ooo.pcap", ooo)

# ---------------------------------------------------------------------------
# sweep_extra.pcap — ICMPv6 / NTP / VLAN / IPv6-UDP frames for the
# glossary-consistency sweep (MixedCaptureSpec): every field a dissector on
# these paths emits must have a glossary row, else it would be a
# permanently-NULL column (FieldVec drops unknown names silently).
extra = []
t3 = 1700002000

SRC6 = bytes([0xfe, 0x80] + [0] * 13 + [1])
DST6 = bytes([0xfe, 0x80] + [0] * 13 + [2])


def ipv6_frame(nxt, payload):
    hdr = struct.pack(">IHBB", 0x60000000, len(payload), nxt, 64) + SRC6 + DST6
    return eth(MAC_B, MAC_A, 0x86DD, hdr + payload)


# 1: ICMPv6 neighbor solicitation
tgt = bytes([0xfe, 0x80] + [0] * 13 + [9])
ns = struct.pack(">BBHI", 135, 0, 0, 0) + tgt
extra.append((t3, 0, ipv6_frame(58, ns)))

# 2: NTP client packet (v4, mode 3, stratum 3)
ntp = bytes([(0 << 6) | (4 << 3) | 3, 3]) + bytes(46)
extra.append((t3, 100, ip_frame(17, A, B, udp(50000, 123, ntp), ident=30)))

# 3: VLAN-tagged (id 42) IPv4 TCP segment with a small payload
ip_hdr, ip_pay = ipv4(6, A, B, tcp(40000, 9000, 1, b"hello"), ident=31)
vlan_frame = eth(MAC_B, MAC_A, 0x8100,
                 struct.pack(">HH", 42, 0x0800) + ip_hdr + ip_pay)
extra.append((t3, 200, vlan_frame))

# 4: DNS query over IPv6 UDP (ipv6 + udp + dns combined path)
extra.append((t3, 300, ipv6_frame(17, udp(40001, 53, dns_q))))

# 5: DHCP Discover (op=1, htype=eth, magic cookie, opt 53=1, opt 50)
dhcp = (struct.pack(">BBBBIHH", 1, 1, 6, 0, 0x3d1d, 0, 0x8000) +
        bytes(4) + bytes(4) + bytes(4) + bytes(4) +
        MAC_A + bytes(10) + bytes(64) + bytes(128) +
        bytes.fromhex("63825363") +
        bytes([53, 1, 1]) + bytes([50, 4, 10, 0, 0, 99]) + bytes([255]))
extra.append((t3, 400, ip_frame(17, [0, 0, 0, 0], [255, 255, 255, 255],
                                udp(68, 67, dhcp), ident=32)))

# 6-7: QUIC Initial long header + a short-header packet on the same flow
quic_init = (bytes([0xC3]) + struct.pack(">I", 1) +
             bytes([4]) + bytes.fromhex("deadbeef") +
             bytes([2]) + bytes.fromhex("cafe") + bytes(16))
extra.append((t3, 500, ip_frame(17, A, B, udp(50001, 443, quic_init), ident=33)))
quic_short = bytes([0x41]) + bytes.fromhex("deadbeef") + bytes(8)
extra.append((t3, 600, ip_frame(17, A, B, udp(50001, 443, quic_short), ident=34)))

# 8: GRE-encapsulated inner IPv4/TCP (multi-occurrence fields path)
inner_tcp = tcp(49500, 80, 7, b"")
inner_ip_hdr, inner_ip_pay = ipv4(6, [192, 168, 1, 1], [192, 168, 1, 2],
                                  inner_tcp, ident=40)
gre_pay = b"\x00\x00\x08\x00" + inner_ip_hdr + inner_ip_pay
extra.append((t3, 700, ip_frame(47, A, B, gre_pay, ident=41)))

# 9: VXLAN (VNI 0x1234) carrying an inner Ethernet/IPv4/ICMP frame
icmp_inner = struct.pack(">BBHHH", 8, 0, 0, 0x42, 7)
in_ip_hdr, in_ip_pay = ipv4(1, [192, 168, 2, 1], [192, 168, 2, 2],
                            icmp_inner, ident=42)
inner_eth = eth(MAC_B, MAC_A, 0x0800, in_ip_hdr + in_ip_pay)
vxlan = b"\x08\x00\x00\x00" + b"\x00\x12\x34\x00" + inner_eth
extra.append((t3, 800, ip_frame(17, A, B, udp(55000, 4789, vxlan), ident=43)))

# 10: SMB2 Create Response on TCP 445 (NBSS prefix + 64-byte header)
smb2 = (b"\x00\x00\x00\x40" + b"\xfeSMB" +
        struct.pack("<HHIHHIIQ", 64, 0, 0, 5, 1, 1, 0, 0x2a) + bytes(32))
extra.append((t3, 900, ip_frame(6, B, A, tcp(445, 49700, 1, smb2), ident=44)))

# 11-14: FTP control channel on TCP 21 — greeting, USER, multi-line reply,
# RETR (tier-3 plaintext protocols for the glossary sweep + goldens)
ftp_greet = b"220 graft FTP ready\r\n"
extra.append((t3, 1000, ip_frame(6, B, A, tcp(21, 49800, 1, ftp_greet), ident=45)))
ftp_user = b"USER anonymous\r\n"
extra.append((t3, 1100, ip_frame(6, A, B, tcp(49800, 21, 1, ftp_user), ident=46)))
ftp_multi = b"230-Welcome\r\n230 Login successful\r\n"
extra.append((t3, 1200, ip_frame(6, B, A,
              tcp(21, 49800, 1 + len(ftp_greet), ftp_multi), ident=47)))
ftp_retr = b"RETR file.bin\r\n"
extra.append((t3, 1300, ip_frame(6, A, B,
              tcp(49800, 21, 1 + len(ftp_user), ftp_retr), ident=48)))

# 15-18: SSH — both banners, client KEXINIT with three name-lists, then a
# ciphertext record (implausible plaintext header -> "Encrypted packet")
ssh_c = b"SSH-2.0-graftssh_0.1\r\n"
extra.append((t3, 1400, ip_frame(6, A, B, tcp(49801, 22, 1, ssh_c), ident=49)))
ssh_s = b"SSH-2.0-OpenSSH_9.6\r\n"
extra.append((t3, 1500, ip_frame(6, B, A, tcp(22, 49801, 1, ssh_s), ident=50)))
kex_lists = [b"curve25519-sha256,diffie-hellman-group14-sha256",
             b"ssh-ed25519,rsa-sha2-512",
             b"chacha20-poly1305@openssh.com,aes128-ctr"]
kex_pay = b"\x14" + bytes(16)
for nl in kex_lists:
    kex_pay += struct.pack(">I", len(nl)) + nl
for _ in range(7):  # remaining name-lists empty
    kex_pay += struct.pack(">I", 0)
kex_pay += b"\x00" + struct.pack(">I", 0)  # first_kex_packet_follows + reserved
pad = 8 - ((4 + 1 + len(kex_pay)) % 8)
if pad < 4:
    pad += 8
kex_pkt = struct.pack(">IB", 1 + len(kex_pay) + pad, pad) + kex_pay + bytes(pad)
extra.append((t3, 1600, ip_frame(6, A, B,
              tcp(49801, 22, 1 + len(ssh_c), kex_pkt), ident=51)))
ssh_enc = bytes.fromhex("ffffffff") + bytes(28)
extra.append((t3, 1700, ip_frame(6, B, A,
              tcp(22, 49801, 1 + len(ssh_s), ssh_enc), ident=52)))

# 19-20: DNS zone transfer (AXFR) over TCP 53: three length-prefixed
# messages in two segments, the MIDDLE message spanning the segment
# boundary — pins the cross-run kind-3 carry under desegment
def dns_tcp_msg(mid):
    q = (struct.pack(">HHHHHH", mid, 0x8180, 1, 0, 0, 0) + qname +
         struct.pack(">HH", 252, 1))
    return struct.pack(">H", len(q)) + q


axfr = dns_tcp_msg(0xA001) + dns_tcp_msg(0xA002) + dns_tcp_msg(0xA003)
cut = len(dns_tcp_msg(0xA001)) + len(dns_tcp_msg(0xA002)) // 2
extra.append((t3, 1800, ip_frame(6, B, A, tcp(53, 49802, 1, axfr[:cut]), ident=53)))
extra.append((t3, 1900, ip_frame(6, B, A,
              tcp(53, 49802, 1 + cut, axfr[cut:]), ident=54)))

# 21-24: SIP INVITE whose SDP negotiates RTP on 49170, the 200 OK, then
# two RTP packets on the announced port (signaled-setup RTP decode)
sip_invite = (b"INVITE sip:bob@example.com SIP/2.0\r\n"
              b"Via: SIP/2.0/UDP 10.0.0.1:5060\r\n"
              b"From: <sip:alice@example.com>;tag=1\r\n"
              b"To: <sip:bob@example.com>\r\n"
              b"Call-ID: abc123@10.0.0.1\r\n"
              b"CSeq: 1 INVITE\r\n"
              b"Content-Type: application/sdp\r\n\r\n"
              b"v=0\r\no=alice 1 1 IN IP4 10.0.0.1\r\ns=-\r\n"
              b"c=IN IP4 10.0.0.1\r\nt=0 0\r\nm=audio 49170 RTP/AVP 0\r\n")
extra.append((t3, 2000, ip_frame(17, A, B, udp(5060, 5060, sip_invite), ident=55)))
sip_ok = (b"SIP/2.0 200 OK\r\n"
          b"From: <sip:alice@example.com>;tag=1\r\n"
          b"To: <sip:bob@example.com>;tag=2\r\n"
          b"Call-ID: abc123@10.0.0.1\r\n"
          b"CSeq: 1 INVITE\r\n\r\n")
extra.append((t3, 2100, ip_frame(17, B, A, udp(5060, 5060, sip_ok), ident=56)))
rtp1 = bytes([0x80, 0x00]) + struct.pack(">HII", 1, 160, 0xDEADBEEF) + bytes(4)
rtp2 = bytes([0x80, 0x00]) + struct.pack(">HII", 2, 320, 0xDEADBEEF) + bytes(4)
extra.append((t3, 2200, ip_frame(17, A, B, udp(49171, 49170, rtp1), ident=57)))
extra.append((t3, 2300, ip_frame(17, A, B, udp(49171, 49170, rtp2), ident=58)))

# 25-27: Kerberos — AS-REQ / AS-REP over UDP 88, TGS-REQ over TCP 88
# (4-byte record length prefix). DER application tags 10/11/12.
# realistic AS-REQ DER (RFC 4120 §5.4.1): pvno, msg-type, req-body with
# kdc-options, cname PrincipalName ("alice") and realm "EXAMPLE.COM"
def der(tag, body):
    return bytes([tag, len(body)]) + body
_krb_cname = der(0x30, der(0xA0, der(0x02, b"\x01")) +
                 der(0xA1, der(0x30, der(0x1B, b"alice"))))
_krb_body = der(0x30, der(0xA0, der(0x03, b"\x00\x00\x00\x00\x00")) +
                der(0xA1, _krb_cname) + der(0xA2, der(0x1B, b"EXAMPLE.COM")))
krb_as_req = der(0x6A, der(0x30, der(0xA1, der(0x02, b"\x05")) +
                           der(0xA2, der(0x02, b"\x0A")) +
                           der(0xA4, _krb_body)))
extra.append((t3, 2400, ip_frame(17, A, B, udp(49900, 88, krb_as_req), ident=59)))
krb_as_rep = bytes([0x6B, 0x10]) + bytes([0x30, 0x0E]) + bytes(14)
extra.append((t3, 2500, ip_frame(17, B, A, udp(88, 49900, krb_as_rep), ident=60)))
krb_tgs = bytes([0x6C, 0x10]) + bytes([0x30, 0x0E]) + bytes(14)
krb_tcp = struct.pack(">I", len(krb_tgs)) + krb_tgs
extra.append((t3, 2600, ip_frame(6, A, B, tcp(49901, 88, 1, krb_tcp), ident=61)))

# 28: mDNS query on 5353 (same wire format as DNS; protocol named mdns)
extra.append((t3, 2700, ip_frame(17, A, [224, 0, 0, 251], udp(5353, 5353, dns_q),
                                ident=62)))

# 29-30: SNMP v2c get-request / get-response (BER, UDP 161)
def snmp_msg(pdu_tag):
    community = b"public"
    pdu = bytes([pdu_tag, 0x0B]) + bytes([0x02, 0x01, 0x2A]) + \
        bytes([0x02, 0x01, 0x00]) + bytes([0x02, 0x01, 0x00]) + \
        bytes([0x30, 0x00])
    body = bytes([0x02, 0x01, 0x01]) + \
        bytes([0x04, len(community)]) + community + pdu
    return bytes([0x30, len(body)]) + body


extra.append((t3, 2800, ip_frame(17, A, B, udp(50100, 161, snmp_msg(0xA0)), ident=63)))
extra.append((t3, 2900, ip_frame(17, B, A, udp(161, 50100, snmp_msg(0xA2)), ident=64)))

# 31: RTCP Sender Report on the SDP-negotiated port + 1 (49171)
rtcp_sr = bytes([0x80, 200]) + struct.pack(">H", 6) + \
    struct.pack(">I", 0xDEADBEEF) + bytes(20)
extra.append((t3, 3000, ip_frame(17, A, B, udp(49172, 49171, rtcp_sr), ident=65)))

# 32-33: NFSv3 GETATTR call + reply over TCP 2049 (record-marked ONC-RPC)
def rpc_call(xid, prog, vers, proc):
    body = struct.pack(">IIIIII", xid, 0, 2, prog, vers, proc) + \
        struct.pack(">II", 0, 0) + struct.pack(">II", 0, 0)  # null creds+verf
    return struct.pack(">I", 0x80000000 | len(body)) + body


def rpc_reply(xid):
    body = struct.pack(">II", xid, 1) + struct.pack(">I", 0) + \
        struct.pack(">II", 0, 0) + struct.pack(">I", 0)  # accepted, null verf, success
    return struct.pack(">I", 0x80000000 | len(body)) + body


extra.append((t3, 3100, ip_frame(6, A, B,
              tcp(50200, 2049, 1, rpc_call(0x11223344, 100003, 3, 1)), ident=66)))
extra.append((t3, 3200, ip_frame(6, B, A,
              tcp(2049, 50200, 1, rpc_reply(0x11223344)), ident=67)))

# 34-35: LDAP bindRequest/bindResponse (BER envelope, TCP 389)
ldap_bind = bytes([0x30, 0x0C]) + bytes([0x02, 0x01, 0x01]) + \
    bytes([0x60, 0x07, 0x02, 0x01, 0x03, 0x04, 0x00, 0x80, 0x00])
extra.append((t3, 3300, ip_frame(6, A, B, tcp(50300, 389, 1, ldap_bind), ident=68)))
ldap_bindrsp = bytes([0x30, 0x0C]) + bytes([0x02, 0x01, 0x01]) + \
    bytes([0x61, 0x07, 0x0A, 0x01, 0x00, 0x04, 0x00, 0x04, 0x00])
extra.append((t3, 3400, ip_frame(6, B, A, tcp(389, 50300, 1, ldap_bindrsp), ident=69)))

# 36-37: RADIUS Access-Request / Access-Accept (UDP 1812)
radius_req = bytes([1, 5]) + struct.pack(">H", 20) + bytes(16)
extra.append((t3, 3500, ip_frame(17, A, B, udp(50400, 1812, radius_req), ident=70)))
radius_acc = bytes([2, 5]) + struct.pack(">H", 20) + bytes(16)
extra.append((t3, 3600, ip_frame(17, B, A, udp(1812, 50400, radius_acc), ident=71)))

# 38: Modbus/TCP Read Holding Registers query (port 502)
mbap = struct.pack(">HHHB", 7, 0, 6, 1) + bytes([3]) + struct.pack(">HH", 0, 2)
extra.append((t3, 3700, ip_frame(6, A, B, tcp(50500, 502, 1, mbap), ident=72)))

# 39: Telnet IAC DO option 24 (terminal type) + data
telnet = bytes([255, 253, 24]) + b"login: "
extra.append((t3, 3800, ip_frame(6, B, A, tcp(23, 50600, 1, telnet), ident=73)))

# 40-43: SMTP greeting + MAIL FROM; POP3 +OK; IMAP tagged LOGIN
extra.append((t3, 3900, ip_frame(6, B, A,
              tcp(25, 50700, 1, b"220 mail.example.com ESMTP\r\n"), ident=74)))
extra.append((t3, 4000, ip_frame(6, A, B,
              tcp(50700, 25, 1, b"MAIL FROM:<alice@example.com>\r\n"), ident=75)))
extra.append((t3, 4100, ip_frame(6, B, A,
              tcp(110, 50701, 1, b"+OK POP3 ready\r\n"), ident=76)))
extra.append((t3, 4200, ip_frame(6, A, B,
              tcp(50702, 143, 1, b"a1 LOGIN bob secret\r\n"), ident=77)))

# 44-45: BGP OPEN (AS 65001, holdtime 180, id 10.0.0.9) then a segment
# carrying KEEPALIVE + UPDATE back-to-back (multi-message info column)
bgp_open = (b"\xff" * 16 + struct.pack(">HB", 29, 1) +
            struct.pack(">BHH", 4, 65001, 180) + bytes([10, 0, 0, 9]) +
            bytes([0]))
extra.append((t3, 4300, ip_frame(6, A, B, tcp(50800, 179, 1, bgp_open), ident=78)))
bgp_keep = b"\xff" * 16 + struct.pack(">HB", 19, 4)
bgp_upd = b"\xff" * 16 + struct.pack(">HB", 23, 2) + struct.pack(">HH", 0, 0)
extra.append((t3, 4400, ip_frame(6, B, A,
              tcp(179, 50800, 1, bgp_keep + bgp_upd), ident=79)))

# 46-47: IGMPv2 general query + membership report for 224.0.0.9
igmp_q = struct.pack(">BBH", 0x11, 100, 0) + bytes([0, 0, 0, 0])
extra.append((t3, 4500, ip_frame(2, A, [224, 0, 0, 1], igmp_q, ident=80)))
igmp_rep = struct.pack(">BBH", 0x16, 0, 0) + bytes([224, 0, 0, 9])
extra.append((t3, 4600, ip_frame(2, A, [224, 0, 0, 9], igmp_rep, ident=81)))

# 48: SSDP M-SEARCH discovery on UDP 1900 (http.* fields, ssdp layer)
ssdp = (b"M-SEARCH * HTTP/1.1\r\nHOST: 239.255.255.250:1900\r\n"
        b"MAN: \"ssdp:discover\"\r\nMX: 1\r\nST: ssdp:all\r\n\r\n")
extra.append((t3, 4700, ip_frame(17, A, [239, 255, 255, 250],
                                 udp(50900, 1900, ssdp), ident=82)))

# 49: syslog LOCAL7.NOTICE on UDP 514
syslog_msg = b"<189>Aug 12 22:14:15 host app: started"
extra.append((t3, 4800, ip_frame(17, A, B, udp(51000, 514, syslog_msg), ident=83)))

# 50: TFTP read request on UDP 69
tftp_rrq = struct.pack(">H", 1) + b"boot.img\x00octet\x00"
extra.append((t3, 4900, ip_frame(17, A, B, udp(51100, 69, tftp_rrq), ident=84)))

# 51: ESP (only SPI/seq cleartext)
esp = struct.pack(">II", 0xDEADD00D, 7) + bytes(24)
extra.append((t3, 5000, ip_frame(50, A, B, esp, ident=85)))

# 52: AH in transport mode protecting an ICMP echo request
ah_icmp = struct.pack(">BBHH", 8, 0, 0, 0x77) + struct.pack(">H", 3)
ah = struct.pack(">BBH", 1, 4, 0) + struct.pack(">II", 0xFEEDF00D, 9) + \
    bytes(12) + ah_icmp
extra.append((t3, 5100, ip_frame(51, A, B, ah, ident=86)))

# 53-55: SIP INVITE over TCP 5060 split mid-SDP-body (RFC 3261 §18.3
# Content-Length framing; kind-5 carry under desegment), then RTP on the
# port the reassembled body announces
sip_body = (b"v=0\r\no=alice 2 2 IN IP4 10.0.0.1\r\ns=-\r\n"
            b"c=IN IP4 10.0.0.1\r\nt=0 0\r\nm=audio 49180 RTP/AVP 0\r\n")
sip_tcp = (b"INVITE sip:carol@example.com SIP/2.0\r\n"
           b"Via: SIP/2.0/TCP 10.0.0.1:5060\r\n"
           b"From: <sip:alice@example.com>;tag=9\r\n"
           b"To: <sip:carol@example.com>\r\n"
           b"Call-ID: tcp42@10.0.0.1\r\n"
           b"CSeq: 1 INVITE\r\n"
           b"Content-Type: application/sdp\r\n"
           b"Content-Length: " + str(len(sip_body)).encode() + b"\r\n\r\n" +
           sip_body)
scut = len(sip_tcp) - 20  # cuts through the trailing m= line
extra.append((t3, 5200, ip_frame(6, A, B,
              tcp(51200, 5060, 1, sip_tcp[:scut]), ident=87)))
extra.append((t3, 5300, ip_frame(6, A, B,
              tcp(51200, 5060, 1 + scut, sip_tcp[scut:]), ident=88)))
rtp3 = bytes([0x80, 0x00]) + struct.pack(">HII", 5, 480, 0xCAFEBABE) + bytes(4)
extra.append((t3, 5400, ip_frame(17, A, B, udp(49181, 49180, rtp3), ident=89)))

# 56: OSPFv2 Hello (IP proto 89): 24-byte header + minimal hello body
ospf = (struct.pack(">BBH", 2, 1, 44) + bytes([10, 0, 0, 7]) +
        bytes([0, 0, 0, 1]) + struct.pack(">HH", 0, 0) + bytes(8) +
        bytes(20))
extra.append((t3, 5500, ip_frame(89, A, [224, 0, 0, 5], ospf, ident=90)))


# 57: NBNS name query for WORKGROUP<00> (first-level-encoded name)
def nbns_encode(name, suffix):
    padded = (name + " " * 15)[:15] + chr(suffix)
    return "".join(chr(ord('A') + (ord(c) >> 4)) + chr(ord('A') + (ord(c) & 0xF))
                   for c in padded).encode()


nbns_q = (struct.pack(">HHHHHH", 0xB007, 0x0110, 1, 0, 0, 0) +
          bytes([32]) + nbns_encode("WORKGROUP", 0) + b"\x00" +
          struct.pack(">HH", 0x20, 1))
extra.append((t3, 5600, ip_frame(17, A, [10, 0, 0, 255],
                                 udp(137, 137, nbns_q), ident=91)))

# 58: LLMNR A query (DNS wire format on UDP 5355)
extra.append((t3, 5700, ip_frame(17, A, [224, 0, 0, 252],
                                 udp(51300, 5355, dns_q), ident=92)))

# 59: STUN Binding Request (UDP 3478, magic cookie gated)
stun = (struct.pack(">HHI", 0x0001, 0, 0x2112A442) +
        bytes.fromhex("0102030405060708090a0b0c"))
extra.append((t3, 5800, ip_frame(17, A, B, udp(51400, 3478, stun), ident=93)))

# 60: DHCPv6 Solicit over IPv6 (client 546 -> server 547)
dhcpv6 = bytes([1, 0xAB, 0xCD, 0xEF]) + struct.pack(">HH", 1, 0)
extra.append((t3, 5900, ipv6_frame(17, udp(546, 547, dhcpv6))))

# 61: WireGuard handshake initiation (UDP 51820, LE sender index)
wg = bytes([1, 0, 0, 0]) + struct.pack("<I", 0xDEADBEE5) + bytes(24)
extra.append((t3, 6000, ip_frame(17, A, B, udp(51500, 51820, wg), ident=94)))

# 62-63: MQTT CONNECT then PUBLISH to sensors/temp (TCP 1883)
mqtt_conn = bytes([0x10, 12]) + struct.pack(">H", 4) + b"MQTT" + \
    bytes([4, 2]) + struct.pack(">H", 60) + struct.pack(">H", 0)
extra.append((t3, 6100, ip_frame(6, A, B, tcp(51600, 1883, 1, mqtt_conn), ident=95)))
mqtt_pub = bytes([0x30, 2 + 12 + 4]) + struct.pack(">H", 12) + \
    b"sensors/temp" + b"21.5"
extra.append((t3, 6200, ip_frame(6, A, B,
              tcp(51600, 1883, 1 + len(mqtt_conn), mqtt_pub), ident=96)))

# 64: SCTP INIT chunk (IP proto 132)
sctp = struct.pack(">HHII", 51700, 80, 0, 0) + \
    struct.pack(">BBH", 1, 0, 20) + struct.pack(">IHHI", 0xA5A5A5A5, 5, 5, 1000)
extra.append((t3, 6300, ip_frame(132, A, B, sctp, ident=97)))

# 65: GTP-U G-PDU carrying an inner IPv4/ICMP echo (UDP 2152)
gtp_inner = struct.pack(">BBHHH", 8, 0, 0, 0x55, 1)
gi_hdr, gi_pay = ipv4(1, [10, 1, 0, 1], [10, 1, 0, 2], gtp_inner, ident=98)
gtp = bytes([0x30, 255]) + struct.pack(">H", len(gi_hdr + gi_pay)) + \
    struct.pack(">I", 0x00C0FFEE) + gi_hdr + gi_pay
extra.append((t3, 6400, ip_frame(17, A, B, udp(51800, 2152, gtp), ident=99)))

# 66: IKEv2 IKE_SA_INIT (UDP 500)
ike = (bytes.fromhex("1122334455667788") + bytes(8) +
       bytes([33, 0x20, 34, 0x08]) + struct.pack(">II", 0, 28))
extra.append((t3, 6500, ip_frame(17, A, B, udp(500, 500, ike), ident=100)))

# 67-68: the TFTP transfer follows on ephemeral ports (server TID 50001
# answers the client port from frame 50) — conversation-tracked decode
tftp_data = struct.pack(">HH", 3, 1) + b"IMGDATA"
extra.append((t3, 6600, ip_frame(17, B, A, udp(50001, 51100, tftp_data), ident=101)))
tftp_ack = struct.pack(">HH", 4, 1)
extra.append((t3, 6700, ip_frame(17, A, B, udp(51100, 50001, tftp_ack), ident=102)))

# 69: L2TPv2 control message (UDP 1701): T+L+S bits, tunnel 9, session 2
l2tp = struct.pack(">HHHHHH", 0xC802, 12, 9, 2, 0, 0)
extra.append((t3, 6800, ip_frame(17, A, B, udp(51900, 1701, l2tp), ident=103)))

# 70: TDS Pre-Login (type 18) on TCP 1433
tds = struct.pack(">BBHHBB", 18, 1, 16, 0, 0, 0) + bytes(8)
extra.append((t3, 6900, ip_frame(6, A, B, tcp(52000, 1433, 1, tds), ident=104)))

# 71-72: AMQP protocol header, then a Method frame (channel 0, 0xCE end)
extra.append((t3, 7000, ip_frame(6, A, B,
              tcp(52100, 5672, 1, b"AMQP\x00\x00\x09\x01"), ident=105)))
amqp_frame = bytes([1]) + struct.pack(">HI", 0, 4) + \
    struct.pack(">HH", 10, 10) + bytes([0xCE])  # Connection.Start
extra.append((t3, 7100, ip_frame(6, A, B,
              tcp(52100, 5672, 9, amqp_frame), ident=106)))

# 73-74: PostgreSQL v3 startup, then a simple query
pg_params = b"user\x00alice\x00\x00"
pg_startup = struct.pack(">II", 8 + len(pg_params), 0x00030000) + pg_params
extra.append((t3, 7200, ip_frame(6, A, B, tcp(52200, 5432, 1, pg_startup), ident=107)))
pg_q = b"SELECT 1;\x00"
pg_query = b"Q" + struct.pack(">I", 4 + len(pg_q)) + pg_q
extra.append((t3, 7300, ip_frame(6, A, B,
              tcp(52200, 5432, 1 + len(pg_startup), pg_query), ident=108)))

# 75-76: MQTT PUBLISH split mid-payload across two segments (desegment
# reassembles on the completing one), then PINGREQ+PINGRESP back-to-back
# in a single segment (multi-PDU info list)
mq_pub2 = bytes([0x30, 2 + 10 + 6]) + struct.pack(">H", 10) + \
    b"alarm/door" + b"OPENED"
cut2 = len(mq_pub2) - 4
extra.append((t3, 7400, ip_frame(6, A, B,
              tcp(52300, 1883, 1, mq_pub2[:cut2]), ident=109)))
extra.append((t3, 7500, ip_frame(6, A, B,
              tcp(52300, 1883, 1 + cut2, mq_pub2[cut2:]), ident=110)))
mq_pings = bytes([0xC0, 0]) + bytes([0xD0, 0])
extra.append((t3, 7600, ip_frame(6, A, B,
              tcp(52300, 1883, 1 + len(mq_pub2), mq_pings), ident=111)))

# 78-79: MySQL server greeting (proto 10) then a client COM_QUERY
my_ver = b"8.0.39\x00"
my_greet_payload = bytes([10]) + my_ver + bytes(20)
my_greet = struct.pack("<I", len(my_greet_payload))[:3] + bytes([0]) + \
    my_greet_payload
extra.append((t3, 7700, ip_frame(6, B, A, tcp(3306, 52400, 1, my_greet), ident=112)))
my_q = bytes([3]) + b"SELECT 1"
my_query = struct.pack("<I", len(my_q))[:3] + bytes([0]) + my_q
extra.append((t3, 7800, ip_frame(6, A, B, tcp(52400, 3306, 1, my_query), ident=113)))

# 80-81: Redis GET command array and +OK status reply
redis_get = b"*2\r\n$3\r\nGET\r\n$5\r\nhello\r\n"
extra.append((t3, 7900, ip_frame(6, A, B, tcp(52500, 6379, 1, redis_get), ident=114)))
extra.append((t3, 8000, ip_frame(6, B, A, tcp(6379, 52500, 1, b"+OK\r\n"), ident=115)))

# 82: CoAP confirmable GET (UDP 5683)
coap = bytes([0x40, 1]) + struct.pack(">H", 0x2D0) + \
    bytes([0xBB]) + b"temperature"
extra.append((t3, 8100, ip_frame(17, A, B, udp(52600, 5683, coap), ident=116)))

# 83: NAT-T UDP-encapsulated ESP on 4500 (non-zero SPI, RFC 3948)
natt_esp = struct.pack(">II", 0xBEEFCAFE, 42) + bytes(16)
extra.append((t3, 8200, ip_frame(17, A, B, udp(52700, 4500, natt_esp), ident=117)))

# 84-85: SMB1 over NBSS on TCP 445 — Negotiate Protocol Request, then an
# NT Create AndX Response carrying an NT status (FLAGS2 bit 14 set)
def smb1_hdr(cmd, status, flags, flags2, tid, pid, uid, mid):
    return (b"\xffSMB" + bytes([cmd]) + struct.pack("<I", status) +
            bytes([flags]) + struct.pack("<H", flags2) +
            bytes(12) +  # PIDHigh(2) + signature(8) + reserved(2)
            struct.pack("<HHHH", tid, pid, uid, mid))
smb1_neg = smb1_hdr(0x72, 0, 0x00, 0x0001, 0, 0x1234, 0, 1) + bytes([0]) + \
    struct.pack("<H", 14) + b"\x02NT LM 0.12\x00"
smb1_neg = struct.pack(">I", len(smb1_neg)) + smb1_neg  # NBSS session message
extra.append((t3, 8300, ip_frame(6, A, B, tcp(49900, 445, 1, smb1_neg), ident=118)))
smb1_create = smb1_hdr(0xA2, 0xC0000022, 0x80, 0x4001, 5, 0x1234, 100, 2) + \
    bytes([0]) + struct.pack("<H", 0)
smb1_create = struct.pack(">I", len(smb1_create)) + smb1_create
extra.append((t3, 8400, ip_frame(6, B, A, tcp(445, 49900, 1, smb1_create), ident=119)))

# 86-87: RDP negotiation on TCP 3389 — X.224 CR with routing cookie +
# RDP_NEG_REQ (TLS requested), then CC with RDP_NEG_RSP selecting TLS
rdp_neg_req = b"Cookie: mstshash=alice\r\n" + \
    bytes([1, 0]) + struct.pack("<H", 8) + struct.pack("<I", 1)
# COTP LI counts bytes after the LI octet EXCLUDING user data (6 here:
# code + dst-ref + src-ref + class)
rdp_cr = bytes([6, 0xE0, 0, 0, 0, 0, 0]) + rdp_neg_req
rdp_cr = struct.pack(">BBH", 3, 0, 4 + len(rdp_cr)) + rdp_cr
extra.append((t3, 8500, ip_frame(6, A, B, tcp(52800, 3389, 1, rdp_cr), ident=120)))
rdp_neg_rsp = bytes([2, 0]) + struct.pack("<H", 8) + struct.pack("<I", 1)
rdp_cc = bytes([6, 0xD0, 0, 0, 0, 0, 0]) + rdp_neg_rsp
rdp_cc = struct.pack(">BBH", 3, 0, 4 + len(rdp_cc)) + rdp_cc
extra.append((t3, 8600, ip_frame(6, B, A, tcp(3389, 52800, 1, rdp_cc), ident=121)))

# 88: DNS-over-TLS marker — TLS application-data record on TCP 853
dot = bytes([0x17, 0x03, 0x03]) + struct.pack(">H", 12) + bytes(12)
extra.append((t3, 8700, ip_frame(6, A, B, tcp(52900, 853, 1, dot), ident=122)))

# 89: Diameter Capabilities-Exchange-Request inside an SCTP DATA chunk on
# port 3868 (the chunk-0 upper-layer dispatch path)
diam = (bytes([1]) + (20).to_bytes(3, "big") + bytes([0x80]) +
        (257).to_bytes(3, "big") + struct.pack(">III", 0, 0x1111, 0x2222))
sctp_data = (struct.pack(">BBH", 0, 3, 16 + len(diam)) +
             struct.pack(">IHHI", 7, 0, 0, 46))  # tsn, stream, seq, ppid=46
sctp_diam = (struct.pack(">HHII", 53000, 3868, 0xAB, 0) +
             sctp_data + diam)
extra.append((t3, 8800, ip_frame(132, A, B, sctp_diam, ident=123)))

# 90: SSDP NOTIFY advertisement with LOCATION/SERVER headers (UDP 1900)
ssdp_notify = (b"NOTIFY * HTTP/1.1\r\nHOST: 239.255.255.250:1900\r\n"
               b"NT: upnp:rootdevice\r\nNTS: ssdp:alive\r\n"
               b"LOCATION: http://192.168.1.1:5000/rootDesc.xml\r\n"
               b"SERVER: graft/1.0 UPnP/1.1\r\n\r\n")
extra.append((t3, 8850, ip_frame(17, A, B, udp(53100, 1900, ssdp_notify), ident=125)))

# 91: AMQP Basic.Publish method frame (class 60, method 40) on 5672
amqp_pub = bytes([1]) + struct.pack(">HI", 1, 8) + \
    struct.pack(">HH", 60, 40) + bytes(4) + bytes([0xCE])
extra.append((t3, 8900, ip_frame(6, A, B, tcp(52100, 5672, 50, amqp_pub), ident=124)))

# 92: LLDP advertisement (ethertype 0x88CC): chassis MAC + port + TTL TLVs
def lldp_tlv(t, val):
    return struct.pack(">H", (t << 9) | len(val)) + val
lldp = (lldp_tlv(1, bytes([4]) + MAC_A) +          # chassis id, MAC subtype
        lldp_tlv(2, bytes([5]) + b"eth0") +        # port id, ifname subtype
        lldp_tlv(3, struct.pack(">H", 120)) +      # TTL
        lldp_tlv(0, b""))
extra.append((t3, 9000, eth(b"\x01\x80\xc2\x00\x00\x0e", MAC_A, 0x88CC, lldp)))

# 93: VRRP v2 advertisement (IP protocol 112)
vrrp = (bytes([0x21, 7, 100, 1, 0, 1]) + struct.pack(">H", 0) +
        bytes([10, 0, 0, 254]) + struct.pack(">II", 0, 0))  # vIP + auth data
extra.append((t3, 9100, ip_frame(112, A, B, vrrp, ident=126)))

# 94-95: RTSP DESCRIBE + SETUP response with Session/Transport (TCP 554)
rtsp_req = b"DESCRIBE rtsp://cam.example/stream RTSP/1.0\r\nCSeq: 1\r\n\r\n"
extra.append((t3, 9200, ip_frame(6, A, B, tcp(53200, 554, 1, rtsp_req), ident=127)))
rtsp_rsp = (b"RTSP/1.0 200 OK\r\nCSeq: 1\r\nSession: 628348\r\n"
            b"Transport: RTP/AVP;unicast;client_port=9000-9001\r\n\r\n")
extra.append((t3, 9300, ip_frame(6, B, A, tcp(554, 53200, 1, rtsp_rsp), ident=128)))

# 96: SOCKS5 CONNECT request to an IPv4 target (TCP 1080)
socks5 = bytes([5, 1, 0, 1, 10, 0, 0, 5]) + struct.pack(">H", 443)
extra.append((t3, 9400, ip_frame(6, A, B, tcp(53300, 1080, 1, socks5), ident=129)))

# 97-100: WebSocket upgrade handshake then frames (conversation-stateful:
# the 101 flips the stream to ws dissection for BOTH directions)
ws_get = (b"GET /chat HTTP/1.1\r\nHost: ws.example\r\n"
          b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
          b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n")
extra.append((t3, 9500, ip_frame(6, A, B, tcp(53400, 80, 1, ws_get), ident=130)))
ws_101 = (b"HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
          b"Connection: Upgrade\r\n\r\n")
extra.append((t3, 9600, ip_frame(6, B, A, tcp(80, 53400, 1, ws_101), ident=131)))
ws_text = bytes([0x81, 0x85, 0x11, 0x22, 0x33, 0x44]) + b"\x59\x47\x5f\x28\x7e"
extra.append((t3, 9700, ip_frame(6, A, B,
              tcp(53400, 80, 1 + len(ws_get), ws_text), ident=132)))
ws_pong = bytes([0x8A, 0x02]) + b"hi"
extra.append((t3, 9800, ip_frame(6, B, A,
              tcp(80, 53400, 1 + len(ws_101), ws_pong), ident=133)))

# 101: DTLS 1.2 ClientHello record (UDP, port-free version-magic heuristic)
dtls = (bytes([22]) + b"\xfe\xfd" + struct.pack(">HHI", 0, 0, 1) +
        struct.pack(">H", 16) + bytes([1]) + (12).to_bytes(3, "big") + bytes(12))
extra.append((t3, 9900, ip_frame(17, A, B, udp(53500, 4433, dtls), ident=134)))

# 102: NetFlow v5 export with one flow record (UDP 2055)
nf_rec = (bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2]) + bytes([0, 0, 0, 0]) +
          struct.pack(">HH", 1, 2) + struct.pack(">II", 9, 4200) +
          struct.pack(">II", 100, 200) + struct.pack(">HH", 5353, 80) +
          bytes(12))  # pad/flags/proto/tos/AS/masks/pad: 48-byte record
nf = struct.pack(">HHIIII", 5, 1, 1000, 1700000000, 0, 77) + \
    struct.pack(">BBH", 0, 0, 0) + nf_rec
extra.append((t3, 10000, ip_frame(17, A, B, udp(53600, 2055, nf), ident=135)))

# 103: sFlow v5 datagram header (UDP 6343)
sf = struct.pack(">IIIIIII", 5, 1, 0x0A000001, 3, 42, 1000, 2)
extra.append((t3, 10100, ip_frame(17, A, B, udp(53700, 6343, sf), ident=136)))

# 104: BFD control packet, state Up (UDP 3784)
bfd = (bytes([0x20, 0xC0, 3, 24]) + struct.pack(">II", 0x11, 0x22) +
       struct.pack(">III", 1000000, 1000000, 0))
extra.append((t3, 10200, ip_frame(17, A, B, udp(49152, 3784, bfd), ident=137)))

# 105: RIP v2 response with one route (UDP 520)
rip = (bytes([2, 2, 0, 0]) + struct.pack(">HH", 2, 0) +
       bytes([192, 168, 5, 0]) + bytes([255, 255, 255, 0]) +
       bytes([10, 0, 0, 1]) + struct.pack(">I", 3))
extra.append((t3, 10300, ip_frame(17, A, B, udp(520, 520, rip), ident=138)))

# 106: HSRP hello, state Active (UDP 1985)
hsrp = (bytes([0, 0, 16, 3, 10, 120, 1, 0]) + b"cisco\x00\x00\x00" +
        bytes([10, 0, 0, 100]))
extra.append((t3, 10400, ip_frame(17, A, B, udp(1985, 1985, hsrp), ident=139)))

# 107: EIGRP hello (IP protocol 88)
eigrp = (bytes([2, 5]) + struct.pack(">H", 0) + struct.pack(">III", 0, 7, 0) +
         struct.pack(">HH", 0, 100))
extra.append((t3, 10500, ip_frame(88, A, B, eigrp, ident=140)))

# 108-109: NFSv3 LOOKUP call with diropargs (fh + name) and its reply
# carrying an NFS3ERR_NOENT status word
nfs_fh = struct.pack(">I", 8) + b"\x01\x02\x03\x04\x05\x06\x07\x08"
nfs_name = struct.pack(">I", 9) + b"data.json" + bytes(3)  # XDR pad to 12
lookup_body = struct.pack(">IIIIII", 0x55667788, 0, 2, 100003, 3, 3) + \
    struct.pack(">II", 0, 0) + struct.pack(">II", 0, 0) + nfs_fh + nfs_name
nfs_lookup = struct.pack(">I", 0x80000000 | len(lookup_body)) + lookup_body
extra.append((t3, 10600, ip_frame(6, A, B,
              tcp(50200, 2049, 100, nfs_lookup), ident=141)))
lookup_rsp = struct.pack(">II", 0x55667788, 1) + struct.pack(">I", 0) + \
    struct.pack(">II", 0, 0) + struct.pack(">I", 0) + struct.pack(">I", 2)
nfs_lookup_rsp = struct.pack(">I", 0x80000000 | len(lookup_rsp)) + lookup_rsp
extra.append((t3, 10700, ip_frame(6, B, A,
              tcp(2049, 50200, 100, nfs_lookup_rsp), ident=142)))

# 110-111: DCERPC bind then a request with opnum 3 (TCP 135, LE DREP)
dce_bind = bytes([5, 0, 11, 3]) + bytes([0x10, 0, 0, 0]) + \
    struct.pack("<HHI", 72, 0, 1) + bytes(56)
extra.append((t3, 10800, ip_frame(6, A, B, tcp(53800, 135, 1, dce_bind), ident=143)))
dce_req = bytes([5, 0, 0, 3]) + bytes([0x10, 0, 0, 0]) + \
    struct.pack("<HHI", 32, 0, 2) + struct.pack("<IHH", 0, 1, 3) + bytes(8)
extra.append((t3, 10900, ip_frame(6, A, B,
              tcp(53800, 135, 1 + len(dce_bind), dce_req), ident=144)))

# 112: MOUNT v3 MNT call (RPC program 100005 on the NFS port)
mnt_path = struct.pack(">I", 7) + b"/export" + bytes(1)  # XDR pad to 8
mnt_body = struct.pack(">IIIIII", 0x66778899, 0, 2, 100005, 3, 1) + \
    struct.pack(">II", 0, 0) + struct.pack(">II", 0, 0) + mnt_path
mnt_call = struct.pack(">I", 0x80000000 | len(mnt_body)) + mnt_body
extra.append((t3, 11000, ip_frame(6, A, B, tcp(50200, 2049, 200, mnt_call), ident=145)))

# 113-114: DCERPC over the SMB2 named-pipe transport — a Write request
# carrying a Bind to the pipe, then a Read response with the Bind_ack
def smb2_hdr(cmd, flags, msg_id):
    return (b"\xfeSMB" + struct.pack("<HH", 64, 1) + struct.pack("<I", 0) +
            struct.pack("<HH", cmd, 1) + struct.pack("<II", flags, 0) +
            struct.pack("<Q", msg_id) + struct.pack("<II", 0xFEFF, 5) +
            struct.pack("<Q", 0x11) + bytes(16))
dce_pipe_bind = bytes([5, 0, 11, 3]) + bytes([0x10, 0, 0, 0]) + \
    struct.pack("<HHI", 72, 0, 7) + bytes(56)
smb2_write = smb2_hdr(9, 0, 4) + \
    struct.pack("<HHI", 49, 112, len(dce_pipe_bind)) + struct.pack("<Q", 0) + \
    bytes(16) + struct.pack("<II", 0, 0) + struct.pack("<HHI", 0, 0, 0) + \
    dce_pipe_bind
smb2_write = struct.pack(">I", len(smb2_write)) + smb2_write
extra.append((t3, 11100, ip_frame(6, A, B, tcp(53900, 445, 1, smb2_write), ident=147)))
dce_pipe_back = bytes([5, 0, 12, 3]) + bytes([0x10, 0, 0, 0]) + \
    struct.pack("<HHI", 60, 0, 7) + bytes(44)
smb2_read = smb2_hdr(8, 1, 5) + \
    struct.pack("<HBB", 17, 80, 0) + struct.pack("<III", len(dce_pipe_back), 0, 0) + \
    dce_pipe_back
smb2_read = struct.pack(">I", len(smb2_read)) + smb2_read
extra.append((t3, 11200, ip_frame(6, B, A, tcp(445, 53900, 1, smb2_read), ident=148)))

# 115: LDAP searchRequest with base object, scope and a composite filter
def ber(tag, content):
    assert len(content) < 128
    return bytes([tag, len(content)]) + content
f_and = ber(0xA0,
            ber(0xA3, ber(0x04, b"objectClass") + ber(0x04, b"person")) +
            ber(0xA4, ber(0x04, b"cn") + ber(0x30, ber(0x80, b"ali"))))
sr_body = ber(0x04, b"dc=example,dc=com") + ber(0x0A, bytes([2])) + \
    ber(0x0A, bytes([0])) + ber(0x02, bytes([0])) + ber(0x02, bytes([0])) + \
    ber(0x01, bytes([0])) + f_and
ldap_search = ber(0x30, ber(0x02, bytes([2])) + ber(0x63, sr_body))
extra.append((t3, 11300, ip_frame(6, A, B, tcp(53950, 389, 1, ldap_search), ident=149)))

# 116-117: a masked WebSocket text frame split across two TCP segments on
# the upgraded 53400<->80 stream — reassembles under desegment (carry
# kind 7) and unmasks on the completing segment
ws_msg = b"reassembled hello from graft"
ws_key = bytes([0x0F, 0x0E, 0x0D, 0x0C])
ws_frame2 = bytes([0x81, 0x80 | len(ws_msg)]) + ws_key + \
    bytes(b ^ ws_key[i & 3] for i, b in enumerate(ws_msg))
cut_ws = 9
seq_ws = 1 + len(ws_get) + 11  # after ws_get and the 11-byte ws_text frame
extra.append((t3, 11400, ip_frame(6, A, B,
              tcp(53400, 80, seq_ws, ws_frame2[:cut_ws]), ident=150)))
extra.append((t3, 11500, ip_frame(6, A, B,
              tcp(53400, 80, seq_ws + cut_ws, ws_frame2[cut_ws:]), ident=151)))

# 118-119: Kafka Metadata v7 request (with client id) and its response
kafka_req = struct.pack(">HHI", 3, 7, 12) + struct.pack(">H", 7) + b"graft-c"
kafka_req = struct.pack(">I", len(kafka_req)) + kafka_req
extra.append((t3, 11600, ip_frame(6, A, B, tcp(54000, 9092, 1, kafka_req), ident=152)))
kafka_rsp = struct.pack(">I", 8) + struct.pack(">I", 12) + struct.pack(">I", 0)
extra.append((t3, 11700, ip_frame(6, B, A, tcp(9092, 54000, 1, kafka_rsp), ident=153)))

# 120-121: CQL v4 QUERY request (long-string body) and a READY response
cql_q = b"SELECT * FROM ks.tbl"
cql_body = struct.pack(">I", len(cql_q)) + cql_q
cql_query = bytes([0x04, 0, 0, 3, 7]) + struct.pack(">I", len(cql_body)) + cql_body
extra.append((t3, 11800, ip_frame(6, A, B, tcp(54100, 9042, 1, cql_query), ident=154)))
cql_ready = bytes([0x84, 0, 0, 3, 2]) + struct.pack(">I", 0)
extra.append((t3, 11900, ip_frame(6, B, A, tcp(9042, 54100, 1, cql_ready), ident=155)))

# 122-123: memcached text set command and the STORED reply
mc_set = b"set session:42 0 300 5\r\nhello\r\n"
extra.append((t3, 12000, ip_frame(6, A, B, tcp(54200, 11211, 1, mc_set), ident=156)))
extra.append((t3, 12100, ip_frame(6, B, A, tcp(11211, 54200, 1, b"STORED\r\n"), ident=157)))

# 124: LDAP searchResEntry carrying the result DN
sre = ber(0x30, ber(0x02, bytes([2])) +
          ber(0x64, ber(0x04, b"cn=alice,dc=example,dc=com") + ber(0x30, b"")))
extra.append((t3, 12200, ip_frame(6, B, A, tcp(389, 53950, 1, sre), ident=158)))

write_pcap("src/test/resources/sweep_extra.pcap", extra)

# 125-129: HTTP/2 + gRPC conversation (tier 15): client preface+SETTINGS,
# HPACK HEADERS with static-table indexed and raw-literal fields (the
# content-type application/grpc marks the conv), then length-prefixed
# gRPC messages in DATA frames both directions
def h2f(ftype, flags, sid, payload):
    return struct.pack(">I", len(payload))[1:] + bytes([ftype, flags]) + \
        struct.pack(">I", sid) + payload
def hstr(s):
    return bytes([len(s)]) + s
h2_preface = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
c1 = h2_preface + h2f(4, 0, 0, b"")  # Magic + SETTINGS[0]
extra.append((t3, 12300, ip_frame(6, A, B, tcp(54300, 50051, 1, c1), ident=159)))
req_hdrs = bytes([0x83, 0x87]) + \
    bytes([0x44]) + hstr(b"/echo.Echo/Say") + \
    bytes([0x41]) + hstr(b"grpc.local") + \
    bytes([0x5F]) + hstr(b"application/grpc")
c2 = h2f(1, 0x04, 1, req_hdrs)  # HEADERS[1] END_HEADERS
extra.append((t3, 12400, ip_frame(6, A, B,
              tcp(54300, 50051, 1 + len(c1), c2), ident=160)))
rsp_hdrs = bytes([0x88]) + bytes([0x5F]) + hstr(b"application/grpc")
s1 = h2f(4, 0, 0, b"") + h2f(1, 0x04, 1, rsp_hdrs)
extra.append((t3, 12500, ip_frame(6, B, A, tcp(50051, 54300, 1, s1), ident=161)))
grpc_req = bytes([0]) + struct.pack(">I", 11) + b"hello graft"
c3 = h2f(0, 0, 1, grpc_req)  # DATA[1] carrying a gRPC message
extra.append((t3, 12600, ip_frame(6, A, B,
              tcp(54300, 50051, 1 + len(c1) + len(c2), c3), ident=162)))
grpc_rsp = bytes([0]) + struct.pack(">I", 5) + b"reply"
s2 = h2f(0, 0x01, 1, grpc_rsp)  # DATA[1] END_STREAM
extra.append((t3, 12700, ip_frame(6, B, A,
              tcp(50051, 54300, 1 + len(s1), s2), ident=163)))

# 130-131: DNS HTTPS (SVCB) query + response with alpn/port SvcParams
def dns_name(parts):
    return b"".join(bytes([len(p)]) + p for p in parts) + b"\x00"
https_q = struct.pack(">HHHHHH", 0x0077, 0x0100, 1, 0, 0, 0) + \
    dns_name([b"svc", b"example", b"com"]) + struct.pack(">HH", 65, 1)
extra.append((t3, 12800, ip_frame(17, A, B, udp(54310, 53, https_q), ident=164)))
svcb_rdata = struct.pack(">H", 1) + b"\x00" + \
    struct.pack(">HH", 1, 6) + b"\x02h2\x02h3" + \
    struct.pack(">HH", 3, 2) + struct.pack(">H", 443)
https_r = struct.pack(">HHHHHH", 0x0077, 0x8180, 1, 1, 0, 0) + \
    dns_name([b"svc", b"example", b"com"]) + struct.pack(">HH", 65, 1) + \
    b"\xc0\x0c" + struct.pack(">HHIH", 65, 1, 300, len(svcb_rdata)) + svcb_rdata
extra.append((t3, 12900, ip_frame(17, B, A, udp(53, 54310, https_r), ident=165)))

# 132-134: HTTP/2 with Huffman-coded HPACK strings, using the RFC 7541
# Appendix C vectors verbatim: the C.4.1 first request (the :authority
# literal Huffman-codes "www.example.com") and a response whose
# custom-key/custom-value literal is Huffman-coded (C.4.3 encodings)
hc1 = h2_preface + h2f(4, 0, 0, b"")
extra.append((t3, 13000, ip_frame(6, A, B, tcp(54400, 50051, 1, hc1), ident=166)))
huff_req = bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff")
hc2 = h2f(1, 0x04, 1, huff_req)
extra.append((t3, 13100, ip_frame(6, A, B,
              tcp(54400, 50051, 1 + len(hc1), hc2), ident=167)))
huff_rsp = bytes([0x88]) + \
    bytes.fromhex("408825a849e95ba97d7f8925a849e95bb8e8b4bf")
hs1 = h2f(4, 0, 0, b"") + h2f(1, 0x04, 1, huff_rsp)
extra.append((t3, 13200, ip_frame(6, B, A, tcp(50051, 54400, 1, hs1), ident=168)))

# 135: QUIC v1 client Initial with REAL RFC 9001 packet protection — keys
# derive from the DCID + published salt, the CRYPTO frame carries a
# ClientHello; the dissector must DECRYPT to recover the SNI/ALPN
import hmac as _hmac
import hashlib as _hashlib
from cryptography.hazmat.primitives.ciphers.aead import AESGCM
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

def hkdf_expand_label(secret, label, n):
    full = b"tls13 " + label
    info = struct.pack(">HB", n, len(full)) + full + b"\x00" + b"\x01"
    return _hmac.new(secret, info, _hashlib.sha256).digest()[:n]

def quic_client_keys(dcid):
    salt = bytes.fromhex("38762cf7f55934b34d179ae6a4c80cadccbb7f0a")
    initial = _hmac.new(salt, dcid, _hashlib.sha256).digest()
    cs = hkdf_expand_label(initial, b"client in", 32)
    return (hkdf_expand_label(cs, b"quic key", 16),
            hkdf_expand_label(cs, b"quic iv", 12),
            hkdf_expand_label(cs, b"quic hp", 16))

def quic_initial(dcid, frames):
    key, iv, hp = quic_client_keys(dcid)
    hdr = (bytes([0xC0]) + struct.pack(">I", 1) + bytes([len(dcid)]) + dcid +
           b"\x00" + b"\x00" + struct.pack(">H", 0x4000 | (1 + len(frames) + 16)) +
           b"\x00")  # pn 0, 1-byte encoding
    pn_off = len(hdr) - 1
    ct = AESGCM(key).encrypt(iv, frames, hdr)  # nonce = iv for pn 0
    pkt = bytearray(hdr + ct)
    mask = Cipher(algorithms.AES(hp), modes.ECB()).encryptor() \
        .update(bytes(pkt[pn_off + 4:pn_off + 20]))
    pkt[0] ^= mask[0] & 0x0F
    pkt[pn_off] ^= mask[1]
    return bytes(pkt)

q_sni = b"sweep.quic.test"
q_alpn = b"h3"
q_ext = (struct.pack(">HH", 0, len(q_sni) + 5) + struct.pack(">H", len(q_sni) + 3) +
         b"\x00" + struct.pack(">H", len(q_sni)) + q_sni +
         struct.pack(">HH", 16, len(q_alpn) + 3) + struct.pack(">H", len(q_alpn) + 1) +
         bytes([len(q_alpn)]) + q_alpn)
q_chb = (struct.pack(">H", 0x0303) + b"\x00" * 32 + b"\x00" +
         struct.pack(">HH", 2, 0x1301) + b"\x01\x00" +
         struct.pack(">H", len(q_ext)) + q_ext)
q_ch = b"\x01" + struct.pack(">I", len(q_chb))[1:] + q_chb
q_crypto = b"\x06\x00" + struct.pack(">H", 0x4000 | len(q_ch)) + q_ch + b"\x00" * 32
extra.append((t3, 13300, ip_frame(17, A, B,
              udp(54500, 443, quic_initial(bytes.fromhex("c0ffee00c0ffee01"), q_crypto)),
              ident=169)))

# 136-140: industrial/SCADA tier — S7comm (ISO-on-TCP 102), DNP3 (20000),
# IEC 60870-5-104 (2404), EtherNet/IP + CIP (44818), OPC UA binary (4840)

# S7comm Job "Setup communication": TPKT + COTP DT + 0x32 PDU, pduref 18
s7 = (bytes([0x32, 0x01]) + b"\x00\x00" + struct.pack(">H", 18) +
      struct.pack(">H", 8) + struct.pack(">H", 0) +
      bytes([0xF0, 0x00]) + struct.pack(">H", 1) + struct.pack(">H", 1) +
      struct.pack(">H", 480))
s7_payload = bytes([3, 0]) + struct.pack(">H", 4 + 3 + len(s7)) + \
    bytes([0x02, 0xF0, 0x80]) + s7
extra.append((t3, 13400, ip_frame(6, A, B, tcp(49321, 102, 1, s7_payload),
              ident=170)))

# DNP3 master Read of classes 1/2/3: link 0564, master 1 -> outstation
# 1024, transport C1 + app C1 + func 01 + three class object headers
dnp_user = bytes([0xC1, 0xC1, 0x01]) + bytes.fromhex("3c02063c03063c0406")
dnp = (bytes([0x05, 0x64, 5 + len(dnp_user), 0xC4]) +
       struct.pack("<H", 1024) + struct.pack("<H", 1) + b"\x00\x00" +
       dnp_user + b"\x00\x00")
extra.append((t3, 13500, ip_frame(6, A, B, tcp(49322, 20000, 1, dnp),
              ident=171)))

# IEC 104 I-frame (tx 5, rx 2) carrying an M_SP_NA_1 ASDU, spontaneous,
# common address 3, IOA 1
iec_asdu = bytes([1, 0x01, 0x03, 0x00, 0x03, 0x00, 0x01, 0x00, 0x00, 0x01])
iec = bytes([0x68, 4 + len(iec_asdu), 0x0A, 0x00, 0x04, 0x00]) + iec_asdu
extra.append((t3, 13600, ip_frame(6, A, B, tcp(49323, 2404, 1, iec),
              ident=172)))

# EtherNet/IP SendRRData wrapping a CIP Get Attributes All request
# (class 1 path) in an Unconnected Data CPF item
cip = bytes([0x01, 0x01, 0x20, 0x01])
enip_data = (b"\x00" * 4 + struct.pack("<H", 10) + struct.pack("<H", 2) +
             struct.pack("<HH", 0x0000, 0) +
             struct.pack("<HH", 0x00B2, len(cip)) + cip)
enip = (struct.pack("<HHII", 0x006F, len(enip_data), 0xDEADBEEF, 0) +
        b"\x00" * 8 + struct.pack("<I", 0) + enip_data)
extra.append((t3, 13700, ip_frame(6, A, B, tcp(49324, 44818, 1, enip),
              ident=173)))

# OPC UA binary Hello with the endpoint URL
opc_url = b"opc.tcp://plc.example:4840"
opc_body = struct.pack("<IIIII", 0, 65536, 65536, 0, 0) + \
    struct.pack("<I", len(opc_url)) + opc_url
opc = b"HELF" + struct.pack("<I", 8 + len(opc_body)) + opc_body
extra.append((t3, 13800, ip_frame(6, A, B, tcp(49325, 4840, 1, opc),
              ident=174)))

# 141-145: messaging/telco tier — IRC (6667), XMPP (5222), SMPP (2775),
# PPTP (1723), TACACS+ (49)
irc = b"PRIVMSG #graft :hello from the sweep\r\n"
extra.append((t3, 13900, ip_frame(6, A, B, tcp(49326, 6667, 1, irc),
              ident=175)))

xmpp = (b"<message to='bob@example.com' from='alice@example.com' id='m1'>"
        b"<body>hi</body></message>")
extra.append((t3, 14000, ip_frame(6, A, B, tcp(49327, 5222, 1, xmpp),
              ident=176)))

smpp = struct.pack(">IIII", 16, 0x00000015, 0, 7)  # enquire_link seq 7
extra.append((t3, 14100, ip_frame(6, A, B, tcp(49328, 2775, 1, smpp),
              ident=177)))

pptp = struct.pack(">HHIHH", 16, 1, 0x1A2B3C4D, 1, 0) + b"\x00" * 4
extra.append((t3, 14200, ip_frame(6, A, B, tcp(49329, 1723, 1, pptp),
              ident=178)))

tac = struct.pack(">BBBBII", 0xC0, 1, 1, 0x01, 0xCAFEBABE, 8) + b"\x00" * 8
extra.append((t3, 14300, ip_frame(6, A, B, tcp(49330, 49, 1, tac),
              ident=179)))

# 146-153: data-infrastructure tier (19) — MongoDB (27017), rsync (873),
# Gearman (4730), AJP13 (8009)

# MongoDB OP_MSG find request: header (LE) + flagBits + kind-0 BSON body
mongo_el = b"\x02find\x00" + struct.pack("<i", 7) + b"orders\x00"
mongo_doc = struct.pack("<i", 4 + len(mongo_el) + 1) + mongo_el + b"\x00"
mongo_body = struct.pack("<I", 0) + b"\x00" + mongo_doc
mongo_req = struct.pack("<iiii", 16 + len(mongo_body), 0x2A, 0, 2013) + mongo_body
extra.append((t3, 14400, ip_frame(6, A, B, tcp(54300, 27017, 1, mongo_req),
              ident=180)))
# OP_MSG reply {"ok": 1.0} correlated via responseTo
mongo_el2 = b"\x01ok\x00" + struct.pack("<d", 1.0)
mongo_doc2 = struct.pack("<i", 4 + len(mongo_el2) + 1) + mongo_el2 + b"\x00"
mongo_body2 = struct.pack("<I", 0) + b"\x00" + mongo_doc2
mongo_rsp = struct.pack("<iiii", 16 + len(mongo_body2), 0x2B, 0x2A, 2013) + mongo_body2
extra.append((t3, 14500, ip_frame(6, B, A, tcp(27017, 54300, 1, mongo_rsp),
              ident=181)))

# rsync daemon handshake: server greeting, client version, module request
extra.append((t3, 14600, ip_frame(6, B, A, tcp(873, 54400, 1, b"@RSYNCD: 31.0\n"),
              ident=182)))
extra.append((t3, 14700, ip_frame(6, A, B, tcp(54400, 873, 1, b"@RSYNCD: 31.0\n"),
              ident=183)))
extra.append((t3, 14800, ip_frame(6, A, B, tcp(54400, 873, 15, b"backups\n"),
              ident=184)))

# Gearman SUBMIT_JOB (function "reverse", empty unique, payload) + JOB_CREATED
g_args = b"reverse\x00\x00hello"
g_req = b"\x00REQ" + struct.pack(">II", 7, len(g_args)) + g_args
extra.append((t3, 14900, ip_frame(6, A, B, tcp(54500, 4730, 1, g_req),
              ident=185)))
g_handle = b"H:graft:1"
g_rsp = b"\x00RES" + struct.pack(">II", 8, len(g_handle)) + g_handle
extra.append((t3, 15000, ip_frame(6, B, A, tcp(4730, 54500, 1, g_rsp),
              ident=186)))

# AJP13 FORWARD_REQUEST GET /status + SEND_HEADERS 200
def ajp_str(sv):
    return struct.pack(">H", len(sv)) + sv + b"\x00"
ajp_pl = bytes([2, 2]) + ajp_str(b"HTTP/1.1") + ajp_str(b"/status")
ajp_req = struct.pack(">HH", 0x1234, len(ajp_pl)) + ajp_pl
extra.append((t3, 15100, ip_frame(6, A, B, tcp(54600, 8009, 1, ajp_req),
              ident=187)))
ajp_pl2 = bytes([4]) + struct.pack(">H", 200) + ajp_str(b"OK") + struct.pack(">H", 0)
ajp_rsp = b"AB" + struct.pack(">H", len(ajp_pl2)) + ajp_pl2
extra.append((t3, 15200, ip_frame(6, B, A, tcp(8009, 54600, 1, ajp_rsp),
              ident=188)))

# 155-157: transports/link tier — DCCP Request (IP proto 33), PPPoE
# Discovery PADI (ethertype 0x8863), Wake-on-LAN magic packet (UDP 9)
dccp_req = struct.pack(">HHBBH", 54700, 5001, 5, 0, 0) + \
    bytes([0 << 1 | 1, 0]) + struct.pack(">HI", 0x0012, 0x3456789A) + \
    struct.pack(">I", 42)  # 48-bit seq 0x123456789A + service code
extra.append((t3, 15300, ip_frame(33, A, B, dccp_req, ident=189)))

padi = bytes([0x11, 0x09]) + struct.pack(">HH", 0, 4) + \
    struct.pack(">HH", 0x0101, 0)  # Service-Name tag, empty
extra.append((t3, 15400, eth(b"\xff" * 6, MAC_A, 0x8863, padi)))

wol_mac = bytes.fromhex("020000000002")
wol_pkt = b"\xff" * 6 + wol_mac * 16
extra.append((t3, 15500, ip_frame(17, A, B, udp(54800, 9, wol_pkt), ident=190)))

# 158-161: L2 control tier — STP config BPDU (802.3/LLC 0x42), Cisco CDP
# (LLC/SNAP OUI 00000c), LACP actor PDU (slow protocols 0x8809), and a
# PTPv2 Sync over UDP 319
stp_bpdu = struct.pack(">HBB", 0, 0, 0) + bytes([0x01]) + \
    struct.pack(">H", 0x8000) + bytes.fromhex("020000000001") + \
    struct.pack(">I", 4) + struct.pack(">H", 0x8000) + \
    bytes.fromhex("020000000002") + struct.pack(">H", 0x8001) + \
    struct.pack(">HHHH", 0x0100, 0x1400, 0x0200, 0x0f00)  # timers in 1/256 s
llc_stp = bytes([0x42, 0x42, 0x03]) + stp_bpdu
extra.append((t3, 15600, eth(bytes.fromhex("0180c2000000"), MAC_A,
              len(llc_stp), llc_stp)))

cdp_tlvs = struct.pack(">HH", 1, 4 + 7) + b"router1" + \
    struct.pack(">HH", 3, 4 + 9) + b"Ethernet0" + \
    struct.pack(">HH", 6, 4 + 8) + b"cisco 12"
cdp_pkt = bytes([0x02, 0xb4]) + struct.pack(">H", 0x1a2b) + cdp_tlvs
llc_cdp = bytes([0xaa, 0xaa, 0x03]) + bytes.fromhex("00000c") + \
    struct.pack(">H", 0x2000) + cdp_pkt
extra.append((t3, 15700, eth(bytes.fromhex("01000ccccccc"), MAC_A,
              len(llc_cdp), llc_cdp)))

lacp = bytes([1, 1]) + bytes([1, 20]) + struct.pack(">H", 32768) + \
    bytes.fromhex("020000000001") + struct.pack(">HHH", 13, 255, 7) + \
    bytes([0x3d]) + b"\x00" * 3 + \
    bytes([2, 20]) + struct.pack(">H", 32768) + \
    bytes.fromhex("020000000002") + struct.pack(">HHH", 13, 255, 9) + \
    bytes([0x3d]) + b"\x00" * 3 + \
    bytes([3, 16]) + b"\x00" * 52  # collector TLV + terminator pad
extra.append((t3, 15800, eth(bytes.fromhex("0180c2000002"), MAC_A,
              0x8809, lacp)))

ptp_sync = bytes([0x00, 0x02]) + struct.pack(">H", 44) + \
    bytes([0, 0]) + struct.pack(">H", 0x0200) + b"\x00" * 8 + b"\x00" * 4 + \
    bytes.fromhex("02000000000000fe") + struct.pack(">H", 1) + \
    struct.pack(">H", 0x1234) + bytes([0, 0]) + b"\x00" * 10
extra.append((t3, 15900, ip_frame(17, A, B, udp(319, 319, ptp_sync), ident=191)))

# 162-164: tunnel/encap tier — Geneve (one option TLV + bridged Ethernet),
# MPLS two-entry label stack over raw IPv4, ERSPAN Type II under GRE
inner_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x42, 7)
_ih, _ip = ipv4(1, [192, 168, 2, 1], [192, 168, 2, 2], inner_icmp)
inner_eth = eth(MAC_B, MAC_A, 0x0800, _ih + _ip)
geneve = bytes([0x01, 0, 0x65, 0x58, 0, 0, 0xAB, 0]) + \
    bytes([0xFF, 0xFF, 0x00, 0x00]) + inner_eth  # ver 0, 1 TLV, VNI 0xAB
extra.append((t3, 16000, ip_frame(17, A, B, udp(55001, 6081, geneve), ident=192)))

mpls_stack = struct.pack(">II", (100 << 12) | 64, (200 << 12) | (1 << 8) | 63)
_mh, _mp = ipv4(1, [10, 0, 1, 1], [10, 0, 1, 2], inner_icmp)
extra.append((t3, 16100, eth(MAC_B, MAC_A, 0x8847, mpls_stack + _mh + _mp)))

erspan = bytes([0x10, 0, 0x01, 0x23, 0, 0, 0, 0]) + inner_eth  # ver 1, span 0x123
gre_hdr = struct.pack(">HHI", 0x1000, 0x88BE, 9)  # sequence bit, seq 9
extra.append((t3, 16200, ip_frame(47, A, B, gre_hdr + erspan, ident=193)))

# 165-168: app-protocol tier — bitcoin version header, FastCGI
# BEGIN_REQUEST, EPMD PORT_PLEASE2_REQ, NAT-PMP map request
btc = struct.pack("<I", 0xD9B4BEF9) + b"version" + b"\x00" * 5 + \
    struct.pack("<I", 100) + b"\x00" * 4
extra.append((t3, 16300, ip_frame(6, A, B, tcp(50000, 8333, 1, btc), ident=194)))

fcgi = bytes([1, 1, 0, 1, 0, 8, 0, 0]) + b"\x00" * 8
extra.append((t3, 16400, ip_frame(6, A, B, tcp(50001, 9000, 1, fcgi), ident=195)))

epmd = struct.pack(">HB", 7, 122) + b"rabbit"
extra.append((t3, 16500, ip_frame(6, A, B, tcp(50002, 4369, 1, epmd), ident=196)))

natpmp = bytes([0, 1, 0, 0]) + struct.pack(">HH", 8000, 8000) + \
    struct.pack(">I", 3600)
extra.append((t3, 16600, ip_frame(17, A, B, udp(50003, 5351, natpmp), ident=197)))

# 169-172: storage/industrial tier — iSCSI login BHS, LLRP keepalive,
# GVCP readreg command, POWERLINK PRes
iscsi = bytes([0x43, 0x87]) + b"\x00" * 3 + bytes([0, 1, 0x2c]) + \
    b"\x00" * 8 + struct.pack(">I", 9) + b"\x00" * 4 + \
    struct.pack(">I", 5) + b"\x00" * 20
extra.append((t3, 16700, ip_frame(6, A, B, tcp(50010, 3260, 1, iscsi), ident=198)))

llrp = struct.pack(">HII", (1 << 10) | 62, 10, 0x77)
extra.append((t3, 16800, ip_frame(6, A, B, tcp(50011, 5084, 1, llrp), ident=199)))

gvcp = bytes([0x42, 0x01, 0x00, 0x80, 0, 4, 0, 1])
extra.append((t3, 16900, ip_frame(17, A, B, udp(50012, 3956, gvcp), ident=200)))

epl_f = bytes([0x04, 0xFF, 0x01]) + b"\x00" * 43
extra.append((t3, 17000, eth(MAC_B, MAC_A, 0x88AB, epl_f)))

# 173-174: gzip + chunked HTTP response split across two segments — the
# desegmenter must reassemble the chunk stream AND gunzip the entity
import gzip as _gzip
gz = _gzip.compress(b"Hello gzip world!", mtime=0)
hdrs = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n")
chunk1, chunk2 = gz[:10], gz[10:]
body = (hdrs + b"%x\r\n" % len(chunk1) + chunk1 + b"\r\n")
body2 = (b"%x\r\n" % len(chunk2) + chunk2 + b"\r\n0\r\n\r\n")
extra.append((t3, 17100, ip_frame(6, B, A, tcp(80, 51000, 1, body), ident=201)))
extra.append((t3, 17200, ip_frame(6, B, A,
              tcp(80, 51000, 1 + len(body), body2), ident=202)))

# 175-177: P2P/VPN/NetBIOS tier — NBDGM direct_group datagram, KRPC
# (BitTorrent DHT) ping query, OpenVPN hard-reset-client-v2
nbdgm = struct.pack(">BBH4sHHH", 0x11, 0x02, 0x2B, bytes([10, 0, 0, 1]),
                    138, 6, 0)
extra.append((t3, 17300, ip_frame(17, A, B, udp(138, 138, nbdgm), ident=203)))

krpc = b"d1:ad2:id20:abcdefghij0123456789e1:q4:ping1:t2:aa1:y1:qe"
extra.append((t3, 17400, ip_frame(17, A, B, udp(50020, 6881, krpc), ident=204)))

ovpn = struct.pack(">BQ", 7 << 3, 0x1122334455667788) + b"\x00" * 5
extra.append((t3, 17500, ip_frame(17, A, B, udp(50021, 1194, ovpn), ident=205)))

# 178-180: SDN/building/factory tier — OpenFlow HELLO, BACnet
# Original-Broadcast-NPDU, PROFINET-RT cyclic frame
of_hello = struct.pack(">BBHI", 4, 0, 8, 0x99)
extra.append((t3, 17600, ip_frame(6, A, B, tcp(50030, 6653, 1, of_hello), ident=206)))

bacnet = bytes([0x81, 0x0B, 0, 12, 0x01, 0x00,
                0x10, 0x08, 0x0A, 0x07, 0x0A, 0x07])
extra.append((t3, 17700, ip_frame(17, A, B, udp(47808, 47808, bacnet), ident=207)))

pn = struct.pack(">H", 0x8001) + b"\x00" * 40 + struct.pack(">HH", 0x1234, 0)
extra.append((t3, 17800, eth(MAC_B, MAC_A, 0x8892, pn)))

# 181-185: auth/desktop/messaging tier — EAPOL-framed EAP Request
# Identity, VNC server greeting, STOMP CONNECT, 9P Tversion, MGCP CRCX
eap_req = struct.pack(">BBH", 1, 1, 5) + bytes([1])  # code=Request id=1 type=Identity
eapol = struct.pack(">BBH", 2, 0, len(eap_req)) + eap_req
extra.append((t3, 17900, eth(MAC_B, MAC_A, 0x888E, eapol)))

extra.append((t3, 18000, ip_frame(6, B, A, tcp(5900, 50040, 1, b"RFB 003.008\n"),
                                  ident=208)))

stomp = b"CONNECT\naccept-version:1.2\nhost:broker\n\n\x00"
extra.append((t3, 18100, ip_frame(6, A, B, tcp(50041, 61613, 1, stomp), ident=209)))

p9 = struct.pack("<IBH", 19, 100, 0xFFFF) + struct.pack("<I", 8192) + \
    struct.pack("<H", 6) + b"9P2000"  # Tversion msize=8192 version=9P2000
extra.append((t3, 18200, ip_frame(6, A, B, tcp(50042, 564, 1, p9), ident=210)))

mgcp = b"CRCX 1204 aaln/1@gw1.example.net MGCP 1.0\nC: A3C47F21456789F0\n"
extra.append((t3, 18300, ip_frame(17, A, B, udp(2727, 2427, mgcp), ident=211)))

# 186-189: automotive/5G control-plane tier — SOME/IP request, DoIP
# routing activation request (TCP), GTPv2-C Create Session Request,
# PFCP Session Establishment Request
someip = struct.pack(">HHIHHBBBB", 0x1234, 0x0001, 8, 0x0001, 0x0001,
                     1, 1, 0x00, 0x00)
extra.append((t3, 18400, ip_frame(17, A, B, udp(50050, 30490, someip), ident=212)))

doip = struct.pack(">BBHI", 2, 0xFD, 0x0005, 7) + \
    struct.pack(">HB", 0x0E00, 0) + b"\x00" * 4
extra.append((t3, 18500, ip_frame(6, A, B, tcp(50051, 13400, 1, doip), ident=213)))

gtpv2 = struct.pack(">BBH", 0x48, 32, 8) + struct.pack(">I", 0x11223344) + \
    bytes([0, 0, 1, 0])  # teid, seq=1, spare
extra.append((t3, 18600, ip_frame(17, A, B, udp(50052, 2123, gtpv2), ident=214)))

pfcp = struct.pack(">BBH", 0x21, 50, 12) + struct.pack(">Q", 0x42) + \
    bytes([0, 0, 7, 0])  # seid, seq=7, spare
extra.append((t3, 18700, ip_frame(17, A, B, udp(50053, 8805, pfcp), ident=215)))

# 190-193: messaging/medical/payments/sniffer tier — NATS PUB, DICOM
# A-ASSOCIATE-RQ, ISO 8583 authorization request, TZSP-encapsulated ping
nats = b"PUB orders.created 11\r\nhello world\r\n"
extra.append((t3, 18800, ip_frame(6, A, B, tcp(50060, 4222, 1, nats), ident=216)))

dicom = struct.pack(">BBI", 1, 0, 68) + struct.pack(">HH", 1, 0) + \
    b"ARCHIVE         " + b"MODALITY1       " + b"\x00" * 32
extra.append((t3, 18900, ip_frame(6, A, B, tcp(50061, 11112, 1, dicom), ident=217)))

iso = struct.pack(">H", 18) + b"0200" + struct.pack(">Q", 0x7234054128C28805) + \
    b"123456"
extra.append((t3, 19000, ip_frame(6, A, B, tcp(50062, 8583, 1, iso), ident=218)))

_tz_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x42, 9)
_tzh, _tzp = ipv4(1, [10, 0, 3, 1], [10, 0, 3, 2], _tz_icmp)
tz_inner = eth(MAC_B, MAC_A, 0x0800, _tzh + _tzp)
tzsp = struct.pack(">BBH", 1, 0, 1) + bytes([1]) + tz_inner  # TAG_END, eth encap
extra.append((t3, 19100, ip_frame(17, A, B, udp(50063, 37008, tzsp), ident=219)))

# 194-202: tier 30 — pub/sub + market-data + monitoring + media +
# classic text trio: RTPS discovery, ZMTP READY command, SoupBinTCP
# login accepted, MoldUDP64 downstream, Zabbix request, SRT handshake,
# finger query, gopher request, ident query
rtps = b"RTPS" + bytes([2, 3, 1, 15]) + bytes(range(12)) + \
    struct.pack(">BBH", 0x09, 0x01, 8) + b"\x00" * 8  # INFO_TS submessage
extra.append((t3, 19200, ip_frame(17, A, B, udp(50070, 7650, rtps), ident=220)))

zmtp = bytes([0x04, 0x26, 0x05]) + b"READY" + \
    bytes([11]) + b"Socket-Type" + struct.pack(">I", 6) + b"ROUTER"
extra.append((t3, 19300, ip_frame(6, A, B, tcp(50071, 5555, 1, zmtp), ident=221)))

soup = struct.pack(">H", 11) + b"A" + b"SESS00001 "  # login accepted
extra.append((t3, 19400, ip_frame(6, B, A, tcp(21001, 50072, 1, soup), ident=222)))

mold = b"SESS000001" + struct.pack(">QH", 4242, 1) + \
    struct.pack(">H", 6) + b"ORDER!"  # one 6-byte message block
extra.append((t3, 19500, ip_frame(17, B, A, udp(30001, 50073, mold), ident=223)))

zbx = b'{"request":"agent data"}'
zabbix = b"ZBXD" + bytes([1]) + struct.pack("<I", len(zbx)) + b"\x00" * 4 + zbx
extra.append((t3, 19600, ip_frame(6, A, B, tcp(50074, 10051, 1, zabbix), ident=224)))

srt = struct.pack(">HHII", 0x8000, 0, 0, 0) + struct.pack(">II", 1, 0x42) + \
    struct.pack(">I", 5) * 2  # control HANDSHAKE
extra.append((t3, 19700, ip_frame(17, A, B, udp(50075, 9300, srt), ident=225)))

extra.append((t3, 19800, ip_frame(6, A, B, tcp(50076, 79, 1, b"operator\r\n"),
                                  ident=226)))
extra.append((t3, 19900, ip_frame(6, A, B, tcp(50077, 70, 1, b"/docs/readme\r\n"),
                                  ident=227)))
extra.append((t3, 20000, ip_frame(6, A, B, tcp(50078, 113, 1, b"6195, 23\r\n"),
                                  ident=228)))

# 203-210: tier 31 — git pkt-line, couchbase binary, Oracle TNS connect,
# ICP query, YMSG header, distcc request, SPICE link header, X11 setup
gitline = b"git-upload-pack /project.git\x00host=git.example.com\x00"
gitpkt = ("%04x" % (4 + len(gitline))).encode() + gitline
extra.append((t3, 20100, ip_frame(6, A, B, tcp(50080, 9418, 1, gitpkt), ident=229)))

cb = bytes([0x80, 0x00]) + struct.pack(">HBB", 5, 0, 0) + \
    struct.pack(">HIIQ", 0, 5, 0x1234, 0) + b"mykey"
extra.append((t3, 20200, ip_frame(6, A, B, tcp(50081, 11210, 1, cb), ident=230)))

tns_body = b"(CONNECT_DATA=(SERVICE_NAME=orcl))"
tns = struct.pack(">HHBB", 8 + 2 + len(tns_body), 0, 1, 0) + \
    struct.pack(">H", 0x0134) + tns_body
extra.append((t3, 20300, ip_frame(6, A, B, tcp(50082, 1521, 1, tns), ident=231)))

icp = struct.pack(">BBHIII", 1, 2, 24, 0x42, 0, 0) + b"\x00" * 4 + b"url\x00"
extra.append((t3, 20400, ip_frame(17, A, B, udp(50083, 3130, icp), ident=232)))

ymsg = b"YMSG" + struct.pack(">HHHHI", 16, 0, 0, 6, 0) + struct.pack(">I", 0xBEEF)
extra.append((t3, 20500, ip_frame(6, A, B, tcp(50084, 5050, 1, ymsg), ident=233)))

distcc = b"DIST00000001ARGC00000004"
extra.append((t3, 20600, ip_frame(6, A, B, tcp(50085, 3632, 1, distcc), ident=234)))

spice = b"REDQ" + struct.pack("<III", 2, 2, 18) + struct.pack("<IH", 1, 0)
extra.append((t3, 20700, ip_frame(6, A, B, tcp(50086, 5900, 1, spice), ident=235)))

x11 = b"l\x00" + struct.pack("<HH", 11, 0) + struct.pack("<HHH", 0, 0, 0) + b"\x00\x00"
extra.append((t3, 20800, ip_frame(6, A, B, tcp(50087, 6000, 1, x11), ident=236)))

# 211-212: UDP checksum-verification fixtures — one datagram with the
# CORRECT RFC 768 checksum, one with a deliberately corrupted value
def udp_ck(sp, dp, payload, src, dst, corrupt=False):
    length = 8 + len(payload)
    pseudo = bytes(src) + bytes(dst) + struct.pack(">BBH", 0, 17, length)
    seg = struct.pack(">HHHH", sp, dp, length, 0) + payload
    data = pseudo + seg + (b"\x00" if len(seg) % 2 else b"")
    s = sum(struct.unpack(">%dH" % (len(data) // 2), data))
    while s >> 16:
        s = (s & 0xFFFF) + (s >> 16)
    ck = (~s) & 0xFFFF or 0xFFFF
    if corrupt:
        ck ^= 0x00FF
    return struct.pack(">HHHH", sp, dp, length, ck) + payload

extra.append((t3, 20900, ip_frame(17, A, B,
                                  udp_ck(40001, 9, b"goodsum", A, B), ident=237)))
extra.append((t3, 21000, ip_frame(17, A, B,
                                  udp_ck(40002, 9, b"badsum!!", A, B, corrupt=True),
                                  ident=238)))

# 213-220: tier 32 — Teredo tunneled IPv6 ping (with origin indication),
# EtherIP tunneled ARP, AoE query, MSRP SEND, OpenWire WireFormatInfo,
# ZServ hello, hpfeeds INFO, Hadoop IPC handshake
_t_icmp6 = struct.pack(">BBHHH", 128, 0, 0, 0x77, 1)
_t_inner6 = struct.pack(">IHBB", 0x60000000, len(_t_icmp6), 58, 64) + SRC6 + DST6 + _t_icmp6
_t_origin = struct.pack(">HH", 0, 0x3039 ^ 0xFFFF) + bytes(~b & 0xFF for b in [10, 0, 9, 9])
extra.append((t3, 21100, ip_frame(17, A, B, udp(50090, 3544, _t_origin + _t_inner6),
                                  ident=239)))

_e_arp = struct.pack(">HHBBH", 1, 0x0800, 6, 4, 1) + MAC_A + bytes([10, 0, 5, 1]) + \
    bytes(6) + bytes([10, 0, 5, 2])
_e_inner = eth(MAC_B, MAC_A, 0x0806, _e_arp)
extra.append((t3, 21200, ip_frame(97, A, B, (b"\x30\x00" + _e_inner), ident=240)))

aoe = bytes([0x10, 0, 0, 1, 2, 1]) + struct.pack(">I", 0xCAFE01)
extra.append((t3, 21300, eth(MAC_B, MAC_A, 0x88A2, aoe + bytes(16))))

msrp = b"MSRP a786hjs2 SEND\r\nTo-Path: msrp://bob.example.com:2855/ab;tcp\r\n"
extra.append((t3, 21400, ip_frame(6, A, B, tcp(50091, 2855, 1, msrp), ident=241)))

ow = struct.pack(">IB", 30, 1) + b"ActiveMQ" + struct.pack(">I", 12) + bytes(17)
extra.append((t3, 21500, ip_frame(6, A, B, tcp(50092, 61616, 1, ow), ident=242)))

zserv = struct.pack(">HBBH", 8, 0xFF, 2, 23) + b"\x00\x00"
extra.append((t3, 21600, ip_frame(6, A, B, tcp(50093, 2600, 1, zserv), ident=243)))

hp = struct.pack(">IB", 16, 1) + b"\x08hpfeeds1" + b"\x00\x00"
extra.append((t3, 21700, ip_frame(6, A, B, tcp(10000, 50094, 1, hp), ident=244)))

hrpc = b"hrpc" + bytes([9, 0, 0])
extra.append((t3, 21800, ip_frame(6, A, B, tcp(50095, 8020, 1, hrpc), ident=245)))

# 221-229: tier 33 — TACACS+ authentication, NetFlow v5, IPFIX, Redis
# RESP request, RIPng response, PIM hello, MSDP keepalive, OLSR, Babel
tac = struct.pack(">BBBBII", 0xC0, 1, 1, 1, 0x1234, 8) + bytes(8)
extra.append((t3, 22000, ip_frame(6, A, B, tcp(50096, 49, 1, tac), ident=246)))

nf5 = struct.pack(">HHIIIIBBH", 5, 2, 1000, 1700002000, 0, 77, 0, 0, 0) + bytes(96)
extra.append((t3, 22100, ip_frame(17, A, B, udp(50097, 2055, nf5), ident=247)))

ipfix = struct.pack(">HHIII", 10, 20, 1700002000, 5, 1) + bytes(4)
extra.append((t3, 22200, ip_frame(17, A, B, udp(50098, 4739, ipfix), ident=248)))

resp = b"*2\r\n$3\r\nGET\r\n$3\r\nfoo\r\n"
extra.append((t3, 22300, ip_frame(6, A, B, tcp(50099, 6379, 1, resp), ident=249)))

ripng = struct.pack(">BBH", 2, 1, 0) + bytes(16) + struct.pack(">HBB", 0, 0, 1)
extra.append((t3, 22400, ip_frame(17, A, B, udp(521, 521, ripng), ident=250)))

# hello with a genuine holdtime option (type 1, len 2, 105 s) + 2 pad
pim = struct.pack(">BBH", 0x20, 0, 0xBEEF) + struct.pack(">HHH", 1, 2, 105) + bytes(2)
extra.append((t3, 22500, ip_frame(103, A, B, pim, ident=251)))

msdp = struct.pack(">BH", 4, 3)
extra.append((t3, 22600, ip_frame(6, A, B, tcp(50100, 639, 1, msdp), ident=252)))

# full RFC 3626 message header: HELLO from 10.0.0.1, ttl 1, 0 hops, seq 7
olsr = struct.pack(">HH", 16, 42) + struct.pack(">BBH", 1, 0, 12) + \
    bytes([10, 0, 0, 1]) + struct.pack(">BBH", 1, 0, 7)
extra.append((t3, 22700, ip_frame(17, A, B, udp(698, 698, olsr), ident=253)))

babel = struct.pack(">BBH", 42, 2, 8) + bytes(8)
extra.append((t3, 22800, ip_frame(17, A, B, udp(6696, 6696, babel), ident=254)))

# 230-234: tier 34 — RSVP PATH, WCCPv2 Here-I-Am, SLP service request,
# Megaco transaction, NHRP resolution request over GRE
rsvp = struct.pack(">BBHBBH", 0x10, 1, 0, 64, 0, 8)
extra.append((t3, 22900, ip_frame(46, A, B, rsvp, ident=255)))

wccp = struct.pack(">IHH", 10, 0x0200, 0) + bytes(8)
extra.append((t3, 23000, ip_frame(17, A, B, udp(50101, 2048, wccp), ident=256)))

slp = bytes([2, 1]) + b"\x00\x00\x10" + bytes(11)
extra.append((t3, 23100, ip_frame(17, A, B, udp(50102, 427, slp), ident=257)))

mgc = b"MEGACO/1 [10.0.0.1]:2944\nTransaction = 9998 {\n Context = - {\n  Add = term1 {}\n }\n}"
extra.append((t3, 23200, ip_frame(17, A, B, udp(50103, 2944, mgc), ident=258)))

nhrp = struct.pack(">HH", 1, 0x0800) + bytes(5) + bytes([255]) + \
    struct.pack(">HHH", 40, 0, 0) + bytes([1, 1, 4, 0]) + bytes(20)
extra.append((t3, 23300, ip_frame(47, A, B, struct.pack(">HH", 0, 0x2001) + nhrp,
                                  ident=259)))

# 235: IGMPv3 membership report — one EXCLUDE{} (join) record for 239.1.2.3
igmp3 = struct.pack(">BBHHH", 0x22, 0, 0, 0, 1) + \
    struct.pack(">BBH", 4, 0, 0) + bytes([239, 1, 2, 3])
extra.append((t3, 23400, ip_frame(2, A, [224, 0, 0, 22], igmp3, ident=260)))

# 236-240: tier 35 — TURN allocate over STUN, SNMPv3 header, L2TPv3 data
# over IP, DVMRP probe (IGMP type 0x13), MQTT-SN connect
turn = struct.pack(">HHI", 0x0003, 8, 0x2112A442) + bytes(12) + \
    struct.pack(">HHI", 0x0019, 4, 17 << 24)  # REQUESTED-TRANSPORT udp
extra.append((t3, 23500, ip_frame(17, A, B, udp(50104, 3478, turn), ident=261)))

# SNMPv3: SEQUENCE { INTEGER 3, SEQUENCE { INTEGER msgID=777, ... } ... }
snmp3_global = b"\x02\x02\x03\x09" + b"\x02\x02\x05\xdc" + b"\x04\x01\x07" + b"\x02\x01\x03"
snmp3 = b"\x30" + bytes([2 + 1 + 2 + len(snmp3_global)]) + b"\x02\x01\x03" + \
    b"\x30" + bytes([len(snmp3_global)]) + snmp3_global
extra.append((t3, 23600, ip_frame(17, A, B, udp(50105, 161, snmp3), ident=262)))

extra.append((t3, 23700, ip_frame(115, A, B, struct.pack(">I", 0xABCD) + bytes(12),
                                  ident=263)))

dvmrp = struct.pack(">BBH", 0x13, 1, 0) + bytes(8)
extra.append((t3, 23800, ip_frame(2, A, [224, 0, 0, 4], dvmrp, ident=264)))

mqttsn = bytes([12, 0x04, 0x04, 0x01, 0x00, 0x3C]) + b"node01"
extra.append((t3, 23900, ip_frame(17, A, B, udp(50106, 2442, mqttsn), ident=265)))

# 241-244: tier 36 — PN-DCP identify request, OMRON FINS memory read,
# KNXnet/IP search request, MikroTik MNDP neighbor announcement
dcp = struct.pack(">HBBIHH", 0xFEFE, 5, 0, 0x1000001, 0, 4) + bytes([0xFF, 0xFF, 0, 0])
extra.append((t3, 24000, eth(MAC_B, MAC_A, 0x8892, dcp + bytes(4))))

fins = bytes([0x80, 0, 2, 0, 1, 0, 0, 2, 0, 0x19, 0x01, 0x01]) + bytes(6)
extra.append((t3, 24100, ip_frame(17, A, B, udp(50107, 9600, fins), ident=266)))

knx = struct.pack(">BBHH", 0x06, 0x10, 0x0201, 14) + bytes([0x08, 0x01]) + \
    bytes([10, 0, 0, 1]) + struct.pack(">H", 3671)
extra.append((t3, 24200, ip_frame(17, A, B, udp(50108, 3671, knx), ident=267)))

mndp = struct.pack(">HH", 0, 9) + \
    struct.pack(">HH", 1, 6) + MAC_A + \
    struct.pack(">HH", 5, 8) + b"router-7"
extra.append((t3, 24300, ip_frame(17, A, B, udp(5678, 5678, mndp), ident=268)))

# 245-246: tier 37 — VXLAN-GPE carrying an inner IPv4 ICMP ping, and
# MPLS-over-UDP (RFC 7510) carrying a 2-deep label stack + inner IPv4
_g_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x55, 3)
_g_ih, _g_ip = ipv4(1, [10, 0, 7, 1], [10, 0, 7, 2], _g_icmp)
gpe = bytes([0x0C, 0, 0, 1]) + bytes([0, 0, 0x2A, 0]) + _g_ih + _g_ip
extra.append((t3, 24400, ip_frame(17, A, B, udp(50109, 4790, gpe), ident=269)))

_m_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x56, 4)
_m_ih, _m_ip = ipv4(1, [10, 0, 8, 1], [10, 0, 8, 2], _m_icmp)
mplsu = struct.pack(">I", (77 << 12) | (0 << 9) | (0 << 8) | 64) + \
    struct.pack(">I", (88 << 12) | (0 << 9) | (1 << 8) | 64) + _m_ih + _m_ip
extra.append((t3, 24500, ip_frame(17, A, B, udp(50110, 6635, mplsu), ident=270)))

# 247-256: tier 38 — IS-IS L1 Hello over LLC 0xFE, LDP hello, CAPWAP
# discovery, LISP-data tunnel w/ inner IPv4 ICMP, NNTP request+response,
# AFP FPLogin over DSI, BMP initiation, NBD read request
isis_hdr = bytes([0x83, 27, 1, 0, 15, 1, 0, 0])
isis_hello = bytes([0x01]) + bytes.fromhex("000000001001") + \
    struct.pack(">H", 30) + struct.pack(">H", 35) + bytes([0x40]) + \
    bytes.fromhex("00000000100102")
llc_isis = bytes([0xFE, 0xFE, 0x03]) + isis_hdr + isis_hello
extra.append((t3, 24600, eth(bytes.fromhex("0180c2000014"), MAC_A,
              len(llc_isis), llc_isis)))

ldp_msg = struct.pack(">HH", 0x0100, 12) + struct.pack(">I", 0x99) + \
    struct.pack(">HHHH", 0x0400, 4, 15, 0)
ldp = struct.pack(">HH", 1, 6 + len(ldp_msg)) + bytes([10, 0, 0, 1]) + \
    struct.pack(">H", 0) + ldp_msg
extra.append((t3, 24700, ip_frame(17, A, B, udp(646, 646, ldp), ident=271)))

capwap = bytes([0x00, 0x10, 0x02, 0x00]) + struct.pack(">HH", 0, 0) + \
    struct.pack(">I", 1) + bytes([5]) + struct.pack(">H", 3) + bytes([0])
extra.append((t3, 24800, ip_frame(17, A, B, udp(50111, 5246, capwap), ident=272)))

_l_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x57, 5)
_l_ih, _l_ip = ipv4(1, [10, 0, 9, 1], [10, 0, 9, 2], _l_icmp)
lisp = bytes([0x80, 0x00, 0x00, 0xAB]) + struct.pack(">I", 0xFFFFFFFF) + \
    _l_ih + _l_ip
extra.append((t3, 24900, ip_frame(17, A, B, udp(50112, 4341, lisp), ident=273)))

extra.append((t3, 25000, ip_frame(6, A, B,
              tcp(50113, 119, 1, b"GROUP comp.lang.scala\r\n"), ident=274)))
extra.append((t3, 25100, ip_frame(6, B, A,
              tcp(119, 50113, 1, b"211 1234 3000234 3002322 comp.lang.scala\r\n",
                  ack=24), ident=275)))

afp_body = bytes([18]) + b"\x06AFP3.4"
dsi = bytes([0, 2]) + struct.pack(">H", 7) + struct.pack(">I", 0) + \
    struct.pack(">I", len(afp_body)) + struct.pack(">I", 0) + afp_body
extra.append((t3, 25200, ip_frame(6, A, B, tcp(50114, 548, 1, dsi), ident=276)))

bmp_body = struct.pack(">HH", 1, 7) + b"graft-1"
bmp = bytes([3]) + struct.pack(">I", 6 + len(bmp_body)) + bytes([4]) + bmp_body
extra.append((t3, 25300, ip_frame(6, A, B, tcp(50115, 1790, 1, bmp), ident=277)))

nbd = struct.pack(">IHH", 0x25609513, 0, 0) + \
    struct.pack(">Q", 0xDEADBEEF00000001) + struct.pack(">Q", 4096) + \
    struct.pack(">I", 512)
extra.append((t3, 25400, ip_frame(6, A, B, tcp(50116, 10809, 1, nbd), ident=278)))

# 256-263: tier 39 — fieldbus / L2-security / storage ethertypes + app
# ports: EtherCAT LRW, TIPC name distributor, IEC61850 SV, MACsec,
# FCoE FLOGI, Thrift CALL, HART-IP session init, RMCP/IPMI Get Device ID
ecat_dgram = bytes([12, 1]) + struct.pack("<HH", 0x0000, 0x1000) + \
    struct.pack("<H", 4) + struct.pack("<H", 0) + b"\xDE\xAD\xBE\xEF" + \
    struct.pack("<H", 1)
ecat = struct.pack("<H", len(ecat_dgram) | (1 << 12)) + ecat_dgram
extra.append((t3, 25500, eth(MAC_B, MAC_A, 0x88A4, ecat)))

tipc_w0 = (2 << 29) | (11 << 25) | (10 << 21) | 40
extra.append((t3, 25600, eth(MAC_B, MAC_A, 0x88CA,
              struct.pack(">I", tipc_w0) + bytes(36))))

sv_asdu = bytes([0x80, 6]) + b"MU0001" + struct.pack(">BBH", 0x82, 2, 1111) + \
    bytes([0x83, 4, 0, 0, 0, 1]) + bytes([0x85, 1, 2])
sv_pdu = bytes([0x60, 3 + 2 + 2 + len(sv_asdu),
                0x80, 1, 1,
                0xA2, 2 + len(sv_asdu),
                0x30, len(sv_asdu)]) + sv_asdu
sv = struct.pack(">HHI", 0x4000, 8 + len(sv_pdu), 0) + sv_pdu
extra.append((t3, 25700, eth(MAC_B, MAC_A, 0x88BA, sv)))

macsec = bytes([0x2E, 16]) + struct.pack(">I", 0x42) + \
    bytes.fromhex("0200000000010001") + bytes(range(16))
extra.append((t3, 25800, eth(MAC_B, MAC_A, 0x88E5, macsec)))

# r_ctl d_id(3) cs_ctl s_id(3) type f_ctl(3) seq_id df_ctl seq_cnt ox rx param
fc_hdr = bytes([0x22]) + bytes([0xFF, 0xFF, 0xFE]) + bytes([0]) + \
    bytes([0x00, 0x00, 0x00]) + bytes([0x01]) + bytes([0x29, 0, 0]) + \
    bytes([0, 0]) + struct.pack(">H", 0) + struct.pack(">HH", 0x1234, 0xFFFF) + \
    struct.pack(">I", 0)
fcoe = bytes([0x00]) + bytes(12) + bytes([0x2E]) + fc_hdr + \
    bytes([0x04, 0, 0, 0]) + bytes([0x41, 0, 0, 0])
extra.append((t3, 25900, eth(MAC_B, MAC_A, 0x8906, fcoe)))

thrift = struct.pack(">I", 16) + bytes([0x80, 0x01, 0x00, 0x01]) + \
    struct.pack(">I", 4) + b"echo" + struct.pack(">I", 7)
extra.append((t3, 26000, ip_frame(6, A, B, tcp(50117, 9090, 1, thrift), ident=279)))

hart = bytes([1, 0, 0, 0]) + struct.pack(">HH", 1, 13) + \
    bytes([1]) + struct.pack(">I", 60000)
extra.append((t3, 26100, ip_frame(17, A, B, udp(50118, 5094, hart), ident=280)))

ipmi_msg = bytes([0x20, 0x18, 0xC8, 0x81, 0x04, 0x01, 0x7A])
rmcp = bytes([0x06, 0x00, 0xFF, 0x07]) + bytes([0]) + bytes(4) + bytes(4) + \
    bytes([len(ipmi_msg)]) + ipmi_msg
extra.append((t3, 26200, ip_frame(17, A, B, udp(50119, 623, rmcp), ident=281)))

# 264-275: tier 40 — Cisco SNAP control family (UDLD/DTP/VTP/PAgP),
# AppleTalk AARP/DDP, Novell IPX, BitTorrent handshake, ZEP, collectd,
# GSMTAP, whois
CCC = bytes.fromhex("01000ccccccc")


def snap_cisco(pid, pdu):
    p = bytes([0xAA, 0xAA, 0x03]) + bytes.fromhex("00000c") + \
        struct.pack(">H", pid) + pdu
    return eth(CCC, MAC_A, len(p), p)


udld = bytes([0x21, 0x00]) + struct.pack(">H", 0) + \
    struct.pack(">HH", 1, 4 + 8) + b"switch-9"
extra.append((t3, 26300, snap_cisco(0x0111, udld)))

dtp = bytes([1]) + struct.pack(">HH", 1, 4 + 7) + b"campus7"
extra.append((t3, 26400, snap_cisco(0x2004, dtp)))

vtp = bytes([2, 1, 0, 7]) + b"campus7" + bytes(25) + bytes(8)
extra.append((t3, 26500, snap_cisco(0x2003, vtp)))

extra.append((t3, 26600, snap_cisco(0x0104, bytes([1, 1]) + bytes(16))))

aarp = struct.pack(">HHBBH", 1, 0x809B, 6, 4, 1) + MAC_A + \
    bytes([0, 0, 5, 3]) + bytes(6) + bytes([0, 0, 5, 9])
extra.append((t3, 26700, eth(MAC_B, MAC_A, 0x80F3, aarp)))

ddp = struct.pack(">HH", 0x0020, 0) + struct.pack(">HH", 5, 3) + \
    bytes([9, 3, 2, 2, 2]) + b"nbp-lookup"
extra.append((t3, 26800, eth(MAC_B, MAC_A, 0x809B, ddp)))

ipx = struct.pack(">HHBB", 0xFFFF, 30, 0, 4) + \
    struct.pack(">I", 1) + MAC_B + struct.pack(">H", 0x0452) + \
    struct.pack(">I", 2) + MAC_A + struct.pack(">H", 0x4003)
extra.append((t3, 26900, eth(MAC_B, MAC_A, 0x8137, ipx)))

bt = bytes([0x13]) + b"BitTorrent protocol" + bytes(8) + \
    bytes(range(0xA0, 0xB4)) + b"-GR0001-" + bytes(12) + \
    struct.pack(">I", 1) + bytes([2])
extra.append((t3, 27000, ip_frame(6, A, B, tcp(50120, 6881, 1, bt), ident=282)))

zep = b"EX" + bytes([2, 1, 15]) + struct.pack(">H", 1) + bytes([0, 200]) + \
    bytes(8) + struct.pack(">I", 9) + bytes(10) + bytes([40])
extra.append((t3, 27100, ip_frame(17, A, B, udp(50121, 17754, zep), ident=283)))

cd_host = struct.pack(">HH", 0x0000, 4 + 6) + b"web01\x00"
cd_vals = struct.pack(">HH", 0x0006, 4 + 2 + 1 + 8) + \
    struct.pack(">H", 1) + bytes([1]) + struct.pack("<d", 42.5)
extra.append((t3, 27200, ip_frame(17, A, B,
              udp(50122, 25826, cd_host + cd_vals), ident=284)))

gsmtap = bytes([2, 4, 1, 0]) + struct.pack(">H", 42) + bytes([200, 10]) + \
    struct.pack(">I", 7) + bytes([0, 0, 0, 0])
extra.append((t3, 27300, ip_frame(17, A, B, udp(50123, 4729, gsmtap), ident=285)))

extra.append((t3, 27400, ip_frame(6, A, B,
              tcp(50124, 43, 1, b"example.com\r\n"), ident=286)))

# 276-294: tier 41 — inetd classics (time/daytime/chargen/echo),
# r-commands, LPD, XOT/X.25, PCP, PCEP, COPS, AgentX, rpcap,
# NSH-over-VXLAN-GPE, PGM, Auto-RP, classic STUN, MPEG-TS
extra.append((t3, 27500, ip_frame(17, B, A,
              udp(37, 50125, struct.pack(">I", 3900000000)), ident=287)))
extra.append((t3, 27600, ip_frame(6, B, A,
              tcp(13, 50126, 1, b"Fri Aug 15 12:00:00 2025\r\n"), ident=288)))
extra.append((t3, 27700, ip_frame(17, B, A,
              udp(19, 50127, b"!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEF"),
              ident=289)))
extra.append((t3, 27800, ip_frame(17, A, B, udp(50128, 7, b"ping-echo"),
              ident=290)))
extra.append((t3, 27900, ip_frame(6, A, B,
              tcp(50129, 515, 1, bytes([2]) + b"rawq\n"), ident=291)))
extra.append((t3, 28000, ip_frame(6, A, B,
              tcp(50130, 512, 1, b"512\x00alice\x00secret\x00ls -l /tmp\x00"),
              ident=292)))
extra.append((t3, 28100, ip_frame(6, A, B,
              tcp(50131, 513, 1, b"\x00alice\x00root\x00xterm/38400\x00"),
              ident=293)))
extra.append((t3, 28200, ip_frame(6, A, B,
              tcp(50132, 514, 1, b"1020\x00alice\x00bob\x00uname -a\x00"),
              ident=294)))
xot = struct.pack(">HH", 0, 3) + bytes([0x10, 0x01, 0x0B])
extra.append((t3, 28300, ip_frame(6, A, B, tcp(50133, 1998, 1, xot), ident=295)))
pcp = bytes([2, 1, 0, 0]) + struct.pack(">I", 3600) + bytes(16)
extra.append((t3, 28400, ip_frame(17, A, B, udp(50134, 5351, pcp), ident=296)))
pcep = bytes([0x20, 1]) + struct.pack(">H", 4)
extra.append((t3, 28500, ip_frame(6, A, B, tcp(50135, 4189, 1, pcep), ident=297)))
cops = bytes([0x10, 6]) + struct.pack(">H", 1) + struct.pack(">I", 8)
extra.append((t3, 28600, ip_frame(6, A, B, tcp(50136, 3288, 1, cops), ident=298)))
agentx = bytes([1, 1, 0, 0]) + struct.pack(">III", 0, 1, 1) + \
    struct.pack(">I", 0)
extra.append((t3, 28700, ip_frame(6, A, B, tcp(50137, 705, 1, agentx), ident=299)))
rpcap = bytes([0, 2]) + struct.pack(">H", 0) + struct.pack(">I", 0)
extra.append((t3, 28800, ip_frame(6, A, B, tcp(50138, 2002, 1, rpcap), ident=300)))
_n_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x58, 6)
_n_ih, _n_ip = ipv4(1, [10, 0, 10, 1], [10, 0, 10, 2], _n_icmp)
nsh = bytes([0x00, 0x02, 0x01, 0x01]) + bytes([0x00, 0x00, 0x2A, 0xFF]) + \
    _n_ih + _n_ip
gpe_nsh = bytes([0x0C, 0, 0, 4]) + bytes([0, 0, 0x2B, 0]) + nsh
extra.append((t3, 28900, ip_frame(17, A, B, udp(50139, 4790, gpe_nsh), ident=301)))
pgm = struct.pack(">HHBBH", 0, 0, 0x04, 0, 0) + bytes(6) + \
    struct.pack(">H", 4) + b"data"
extra.append((t3, 29000, ip_frame(113, A, B, pgm, ident=302)))
auto_rp = bytes([0x12, 1]) + struct.pack(">H", 180) + bytes(4) + bytes(8)
extra.append((t3, 29100, ip_frame(17, A, B, udp(50140, 496, auto_rp), ident=303)))
cstun = struct.pack(">HH", 0x0001, 8) + bytes(16) + \
    struct.pack(">HH", 0x0003, 4) + bytes(4)
extra.append((t3, 29200, ip_frame(17, A, B, udp(50141, 3478, cstun), ident=304)))
ts_pkt = bytes([0x47, 0x41, 0x00, 0x15]) + bytes(184)
extra.append((t3, 29300, ip_frame(17, A, B, udp(50142, 1234, ts_pkt), ident=305)))

# 295-310: tier 42 — ONC-RPC portmap, RTMP/GIOP/P2P app layers, realtime
# L2 ethertypes (AVTP/LLTD/eCPRI/CFM/batman-adv), DIS/RX/IAX2/XDMCP/
# Art-Net/RakNet UDP ports
pmap = struct.pack(">IIII", 0x77, 0, 2, 100000) + struct.pack(">II", 2, 3) + \
    bytes(16) + struct.pack(">IIII", 100003, 3, 6, 0)
extra.append((t3, 29400, ip_frame(17, A, B, udp(50143, 111, pmap), ident=306)))

rtmp = bytes([0x04, 0, 0, 0]) + bytes([0, 0, 13]) + bytes([0x14]) + \
    bytes(4) + bytes(13)
extra.append((t3, 29500, ip_frame(6, A, B, tcp(50144, 1935, 1, rtmp), ident=307)))

giop = b"GIOP" + bytes([1, 2, 1, 0]) + struct.pack("<I", 8) + bytes(8)
extra.append((t3, 29600, ip_frame(6, A, B, tcp(50145, 2809, 1, giop), ident=308)))

iax2 = struct.pack(">HHI", 0x8001, 0, 100) + bytes([0, 0, 6, 1])
extra.append((t3, 29700, ip_frame(17, A, B, udp(50146, 4569, iax2), ident=309)))

xdmcp = struct.pack(">HHH", 1, 12, 4) + struct.pack(">I", 0xAB12)
extra.append((t3, 29800, ip_frame(17, A, B, udp(50147, 177, xdmcp), ident=310)))

artnet = b"Art-Net\x00" + struct.pack("<H", 0x5000) + struct.pack(">H", 14) + \
    bytes([1, 0]) + struct.pack("<H", 0) + struct.pack(">H", 4) + bytes(4)
extra.append((t3, 29900, ip_frame(17, A, B, udp(50148, 6454, artnet), ident=311)))

dis = bytes([7, 1, 1, 1]) + struct.pack(">I", 0) + struct.pack(">HH", 144, 0) + \
    bytes(132)
extra.append((t3, 30000, ip_frame(17, A, B, udp(50149, 3000, dis), ident=312)))

rx = struct.pack(">III", 0x5F000000, 0x11, 1) + struct.pack(">II", 1, 1) + \
    bytes([1, 0, 0, 0]) + struct.pack(">HH", 0, 52)
extra.append((t3, 30100, ip_frame(17, A, B, udp(50150, 7000, rx), ident=313)))

gnut = bytes(range(16)) + bytes([0x00, 7, 0]) + struct.pack("<I", 0)
extra.append((t3, 30200, ip_frame(6, A, B, tcp(50151, 6346, 1, gnut), ident=314)))

edonkey = bytes([0xE3]) + struct.pack("<I", 1) + bytes([0x01])
extra.append((t3, 30300, ip_frame(6, A, B, tcp(50152, 4662, 1, edonkey), ident=315)))

extra.append((t3, 30400, eth(MAC_B, MAC_A, 0x22F0, bytes([0x02]) + bytes(15))))
extra.append((t3, 30500, eth(MAC_B, MAC_A, 0x88D9,
              bytes([1, 1, 0, 0]) + MAC_B + MAC_A + bytes(4))))
extra.append((t3, 30600, eth(MAC_B, MAC_A, 0xAEFE,
              bytes([0x10, 0]) + struct.pack(">H", 8) + bytes(8))))
extra.append((t3, 30700, eth(MAC_B, MAC_A, 0x8902,
              bytes([0xA0, 1, 0x04, 70]) + bytes(70))))
extra.append((t3, 30800, eth(MAC_B, MAC_A, 0x4305,
              bytes([0x00, 15, 50, 0]) + bytes(20))))

raknet = bytes([0x01]) + struct.pack(">Q", 123456) + \
    bytes.fromhex("00ffff00fefefefefdfdfdfd12345678") + struct.pack(">Q", 7)
extra.append((t3, 30900, ip_frame(17, A, B, udp(50153, 19132, raknet), ident=316)))

# 311-324: tier 43 — the ZigBee stack under ZEP, the SS7 stack over SCTP,
# and twelve more app-layer stubs
wpan = bytes([0x41, 0x88, 9]) + bytes([0x62, 0x1A]) + bytes([0, 0]) + \
    bytes([0x21, 0x3F])
znwk = bytes([0x48, 0x00]) + bytes([0, 0]) + bytes([0x21, 0x3F]) + \
    bytes([0x1E, 0x07])
zaps = bytes([0x00, 0x01]) + bytes([0x06, 0x00]) + bytes([0x04, 0x01]) + \
    bytes([0x01, 0x2A])
zep2 = b"EX" + bytes([2, 1, 15]) + struct.pack(">H", 2) + bytes([0, 200]) + \
    bytes(8) + struct.pack(">I", 10) + bytes(10) + \
    bytes([len(wpan + znwk + zaps)]) + wpan + znwk + zaps
extra.append((t3, 31000, ip_frame(17, A, B, udp(50154, 17754, zep2), ident=317)))

isup = struct.pack("<H", 30) + bytes([1])
m3ua_param = struct.pack(">HH", 0x0210, 4 + 12 + len(isup)) + \
    struct.pack(">II", 1001, 2002) + bytes([5, 1, 0, 0]) + isup
m3ua = bytes([1, 0, 1, 1]) + struct.pack(">I", 8 + len(m3ua_param)) + m3ua_param
chunk_len = 16 + len(m3ua)
sctp_chunk = bytes([0, 3]) + struct.pack(">H", chunk_len) + \
    struct.pack(">IHHI", 1, 0, 0, 3) + m3ua
pad = (4 - chunk_len % 4) % 4
sctp = struct.pack(">HHII", 2905, 2905, 0x42, 0) + sctp_chunk + bytes(pad)
extra.append((t3, 31100, ip_frame(132, A, B, sctp, ident=318)))

icap = b"REQMOD icap://icap.example.com/mod ICAP/1.0\r\n" + \
    b"Host: icap.example.com\r\n\r\n"
extra.append((t3, 31200, ip_frame(6, A, B, tcp(50155, 1344, 1, icap), ident=319)))

ncp = struct.pack(">H", 0x2222) + bytes([5, 1, 1, 0, 22])
extra.append((t3, 31300, ip_frame(6, A, B, tcp(50156, 524, 1, ncp), ident=320)))

glbp = bytes([1, 0]) + struct.pack(">H", 10) + bytes(2) + MAC_A + \
    bytes([1, 28]) + bytes(26)
extra.append((t3, 31400, ip_frame(17, A, B, udp(50157, 3222, glbp), ident=321)))

synergy = struct.pack(">I", 11) + b"Synergy" + struct.pack(">HH", 1, 6)
extra.append((t3, 31500, ip_frame(6, A, B, tcp(50158, 24800, 1, synergy), ident=322)))

udt = struct.pack(">I", 0x80000000) + struct.pack(">III", 0, 0, 0x42)
extra.append((t3, 31600, ip_frame(17, A, B, udp(50159, 9000, udt), ident=323)))

kpw = struct.pack(">HHH", 16, 1, 0) + bytes(10)
extra.append((t3, 31700, ip_frame(17, A, B, udp(50160, 464, kpw), ident=324)))

cups = b"6 3 ipp://print.example.com/printers/laser\n"
extra.append((t3, 31800, ip_frame(17, A, B, udp(50161, 631, cups), ident=325)))

isns = struct.pack(">HHHHHH", 1, 1, 0, 0x8400, 7, 0)
extra.append((t3, 31900, ip_frame(6, A, B, tcp(50162, 3205, 1, isns), ident=326)))

nvme = bytes([0, 0, 128, 0]) + struct.pack("<I", 128) + bytes(120)
extra.append((t3, 32000, ip_frame(6, A, B, tcp(50163, 4420, 1, nvme), ident=327)))

dlsw = bytes([0x31, 72]) + struct.pack(">H", 0) + bytes(10) + bytes([0x01]) + \
    bytes(57)
extra.append((t3, 32100, ip_frame(6, A, B, tcp(50164, 2065, 1, dlsw), ident=328)))

hip = bytes([59, 4, 1, 0x21]) + struct.pack(">HH", 0, 0) + bytes(32)
extra.append((t3, 32200, ip_frame(139, A, B, hip, ident=329)))

ndmp = struct.pack(">I", 0x80000000 | 28) + \
    struct.pack(">IIIIII", 1, 0, 0, 0x900, 0, 0) + struct.pack(">I", 4)
extra.append((t3, 32300, ip_frame(6, A, B, tcp(50165, 10000, 1, ndmp), ident=330)))

# 325-338: tier 44 — PPPoE-session/PPP/CHAP+PAP, Q.931-over-TPKT, the
# ONC-RPC mount/ypserv siblings, AODV, DLEP, AIM, DRDA, HSMS, MELSEC,
# GVSP, WSP, and a KNX tunneling request carrying cEMI
chap = bytes([1, 5]) + struct.pack(">H", 14) + bytes([8]) + bytes(8) + b"S"
pppoe_chap = bytes([0x11, 0x00]) + struct.pack(">HH", 7, 2 + len(chap)) + \
    struct.pack(">H", 0xC223) + chap
extra.append((t3, 32400, eth(MAC_B, MAC_A, 0x8864, pppoe_chap)))

pap = bytes([1, 2]) + struct.pack(">H", 11) + bytes([5]) + b"alice" + bytes([0])
pppoe_pap = bytes([0x11, 0x00]) + struct.pack(">HH", 8, 2 + len(pap)) + \
    struct.pack(">H", 0xC023) + pap
extra.append((t3, 32500, eth(MAC_B, MAC_A, 0x8864, pppoe_pap)))

q931 = bytes([0x08, 0x02, 0x00, 0x42, 0x05]) + bytes([0x04, 0x03, 0x80, 0x90, 0xA3])
tpkt_q931 = struct.pack(">BBH", 3, 0, 4 + len(q931)) + q931
extra.append((t3, 32600, ip_frame(6, A, B, tcp(50166, 1720, 1, tpkt_q931), ident=331)))

mnt = struct.pack(">IIII", 0x78, 0, 2, 100005) + struct.pack(">II", 3, 1) + \
    bytes(16) + struct.pack(">I", 12) + b"/export/data"
extra.append((t3, 32700, ip_frame(17, A, B, udp(50167, 635, mnt), ident=332)))

def xdr_str(s):
    pad = (4 - len(s) % 4) % 4
    return struct.pack(">I", len(s)) + s + bytes(pad)

yp = struct.pack(">IIII", 0x79, 0, 2, 100004) + struct.pack(">II", 2, 3) + \
    bytes(16) + xdr_str(b"lab.example") + xdr_str(b"passwd.byname") + \
    xdr_str(b"alice")
extra.append((t3, 32800, ip_frame(17, A, B, udp(50168, 834, yp), ident=333)))

aodv = bytes([1, 0, 0, 2]) + struct.pack(">IIIII", 9, 0x0A000002, 0, 0x0A000001, 1)
extra.append((t3, 32900, ip_frame(17, A, B, udp(50169, 654, aodv), ident=334)))

extra.append((t3, 33000, ip_frame(17, A, B,
              udp(50170, 854, b"DLEP" + struct.pack(">HH", 1, 0)), ident=335)))

aim = bytes([0x2A, 2]) + struct.pack(">HH", 1, 10) + \
    struct.pack(">HHHI", 2, 4, 0, 0x42)
extra.append((t3, 33100, ip_frame(6, A, B, tcp(50171, 5190, 1, aim), ident=336)))

drda = struct.pack(">H", 14) + bytes([0xD0, 0x41]) + struct.pack(">HHH", 1, 8, 0x1041) + bytes(4)
extra.append((t3, 33200, ip_frame(6, A, B, tcp(50172, 446, 1, drda), ident=337)))

hsms = struct.pack(">I", 10) + struct.pack(">H", 0xFFFF) + \
    bytes([0, 0, 0, 1]) + struct.pack(">I", 3)
extra.append((t3, 33300, ip_frame(6, A, B, tcp(50173, 5000, 1, hsms), ident=338)))

melsec = bytes([0x50, 0x00, 0x00, 0xFF, 0xFF, 0x03, 0x00]) + \
    struct.pack("<HH", 12, 16) + struct.pack("<HH", 0x0401, 0) + bytes(4)
extra.append((t3, 33400, ip_frame(17, A, B, udp(50174, 5007, melsec), ident=339)))

gvsp = struct.pack(">HH", 0, 7) + bytes([1, 0, 0, 0]) + \
    struct.pack(">HH", 0, 1) + bytes(4)
extra.append((t3, 33500, ip_frame(17, A, B, udp(50175, 20202, gvsp), ident=340)))

wsp_uri = b"http://wap.example/idx"
wsp = bytes([0x01, 0x40, len(wsp_uri)]) + wsp_uri
extra.append((t3, 33600, ip_frame(17, A, B, udp(50176, 9200, wsp), ident=341)))

cemi = bytes([0x11, 0x00, 0xBC, 0xE0, 0x11, 0x0A, 0x00, 0x08, 0x01, 0x00, 0x81])
knx_tun = bytes([0x06, 0x10, 0x04, 0x20]) + \
    struct.pack(">H", 6 + 4 + len(cemi)) + bytes([4, 0x15, 0, 0]) + cemi
extra.append((t3, 33700, ip_frame(17, A, B, udp(50177, 3671, knx_tun), ident=342)))

# 339-352: tier 45 — X.509 layers out of a TLS Certificate, the RAN
# ASN.1 family over SCTP (with NAS inside S1AP/NGAP), SNA + NetBIOS LLC
# classics, GQUIC, ASTERIX, CIGI, DHCPFO, T.38/UDPTL, SCTE-35 in MPEG-TS


def x509_cn(name):
    return bytes([6, 3, 0x55, 4, 3, 0x0C, len(name)]) + name


cert_body = bytes([0xA0, 3, 2, 1, 2]) + bytes([0x02, 4]) + \
    bytes.fromhex("0099AB12") + \
    bytes([0x30, 0x0D, 0x06, 0x09]) + bytes.fromhex("2A864886F70D01010B") + \
    bytes([5, 0]) + bytes(4) + x509_cn(b"GraftCA") + bytes(4) + \
    x509_cn(b"www.example.com") + \
    bytes([6, 3, 0x55, 0x1D, 0x11, 4, 8, 0x30, 6, 0x82, 4]) + b"a.io" + \
    bytes([6, 3, 0x55, 0x1D, 0x13, 4, 5, 0x30, 3, 1, 1, 0xFF]) + \
    bytes([6, 3, 0x55, 0x1D, 0x0E, 4, 6, 4, 4]) + bytes.fromhex("AABBCCDD")
certs_total = 3 + len(cert_body)
hs_len = 3 + certs_total
tls_cert = bytes([22, 3, 3]) + struct.pack(">H", 4 + hs_len) + \
    bytes([11]) + struct.pack(">I", hs_len)[1:] + \
    struct.pack(">I", certs_total)[1:] + \
    struct.pack(">I", len(cert_body))[1:] + cert_body
extra.append((t3, 33800, ip_frame(6, B, A, tcp(443, 49153, 1, tls_cert), ident=343)))


def sctp_data(sport, dport, ppid, payload):
    chunk_len = 16 + len(payload)
    chunk = bytes([0, 3]) + struct.pack(">H", chunk_len) + \
        struct.pack(">IHHI", 1, 0, 0, ppid) + payload
    pad = (4 - chunk_len % 4) % 4
    return struct.pack(">HHII", sport, dport, 0x42, 0) + chunk + bytes(pad)


def ranap_pdu(pc, ie_id, ie_val):
    ies = struct.pack(">H", ie_id) + bytes([0, len(ie_val)]) + ie_val
    val = bytes([0]) + struct.pack(">H", 1) + ies
    return bytes([0, pc, 0x40, len(val)]) + val


s1ap = ranap_pdu(12, 26, bytes([3, 0x07, 0x41, 0x71]))
extra.append((t3, 33900, ip_frame(132, A, B, sctp_data(36412, 36412, 18, s1ap),
              ident=344)))
ngap = ranap_pdu(15, 38, bytes([3, 0x7E, 0x00, 0x41]))
extra.append((t3, 34000, ip_frame(132, A, B, sctp_data(38412, 38412, 60, ngap),
              ident=345)))
extra.append((t3, 34100, ip_frame(132, A, B,
              sctp_data(36422, 36422, 27, ranap_pdu(6, 0x15, bytes(2))), ident=346)))
extra.append((t3, 34200, ip_frame(132, A, B,
              sctp_data(38472, 38472, 62, ranap_pdu(1, 0x15, bytes(2))), ident=347)))
extra.append((t3, 34300, ip_frame(132, A, B,
              sctp_data(38462, 38462, 64, ranap_pdu(3, 0x15, bytes(2))), ident=348)))
extra.append((t3, 34400, ip_frame(132, A, B,
              sctp_data(38422, 38422, 61, ranap_pdu(0, 0x15, bytes(2))), ident=349)))

llc_sna = bytes([0x04, 0x04, 0x03]) + bytes([0x2C, 0, 0x05, 0x01, 0, 1]) + bytes(6)
extra.append((t3, 34500, eth(MAC_B, MAC_A, len(llc_sna), llc_sna)))

llc_nb = bytes([0xF0, 0xF0, 0x03]) + bytes([0x2C, 0, 0xEF, 0xFF, 0x0A]) + bytes(39)
extra.append((t3, 34600, eth(MAC_B, MAC_A, len(llc_nb), llc_nb)))

gquic = bytes([0x09]) + bytes(8) + b"Q043" + bytes([1]) + bytes(8)
extra.append((t3, 34700, ip_frame(17, A, B, udp(50178, 443, gquic), ident=350)))

asterix = bytes([48]) + struct.pack(">H", 12) + bytes(9)
extra.append((t3, 34800, ip_frame(17, A, B, udp(50179, 8600, asterix), ident=351)))

cigi = bytes([1, 16, 3, 0]) + bytes(12)
extra.append((t3, 34900, ip_frame(17, A, B, udp(50180, 8004, cigi), ident=352)))

dhcpfo = struct.pack(">H", 12) + bytes([1, 12]) + struct.pack(">II", 0, 7)
extra.append((t3, 35000, ip_frame(6, A, B, tcp(50181, 647, 1, dhcpfo), ident=353)))

t38 = struct.pack(">H", 1) + bytes([1, 0x08]) + bytes([0])
extra.append((t3, 35100, ip_frame(17, A, B, udp(50182, 6004, t38), ident=354)))

scte = bytes([0xFC, 0x30, 0x19, 0x00]) + bytes(5) + bytes([0]) + \
    bytes([0xFF, 0xF0, 0x05]) + bytes([0x05])
ts2 = bytes([0x47, 0x41, 0xE0, 0x11, 0x00]) + scte
ts2 = ts2 + bytes(188 - len(ts2))
extra.append((t3, 35200, ip_frame(17, A, B, udp(50183, 1234, ts2), ident=355)))

# 354-367: tier 46 — layers chained out of existing dissectors (SCCP via
# M3UA, UDS via DoIP, RTP telephone-events, 802.3ah OAM, the SMB2
# session-setup gssapi/spnego/ntlmssp chain) plus ADB, LISP control,
# M2UA, SUA, NLM, GlusterFS, Elasticsearch, Skinny, ZRTP
sccp_body = bytes([0x09]) + bytes([0x00, 0x03, 0x05, 0x07])
m3ua_sccp_param = struct.pack(">HH", 0x0210, 4 + 12 + len(sccp_body)) + \
    struct.pack(">II", 1001, 2002) + bytes([3, 1, 0, 0]) + sccp_body
m3ua_sccp = bytes([1, 0, 1, 1]) + \
    struct.pack(">I", 8 + len(m3ua_sccp_param)) + m3ua_sccp_param
extra.append((t3, 35300, ip_frame(132, A, B,
              sctp_data(2905, 2905, 3, m3ua_sccp), ident=356)))

uds = bytes([0x0E, 0x10]) + bytes([0x0E, 0x02]) + bytes([0x10, 0x03])
doip_uds = bytes([2, 0xFD]) + struct.pack(">H", 0x8001) + \
    struct.pack(">I", len(uds)) + uds
extra.append((t3, 35400, ip_frame(6, A, B, tcp(50184, 13400, 1, doip_uds),
              ident=357)))

rtpev = bytes([0x80, 101]) + struct.pack(">HI", 77, 160) + \
    struct.pack(">I", 0x1234) + bytes([5, 0x0A]) + struct.pack(">H", 800)
extra.append((t3, 35500, ip_frame(17, A, B, udp(49171, 49170, rtpev), ident=358)))

oam = bytes([3]) + struct.pack(">H", 0x0050) + bytes([0]) + bytes(42)
extra.append((t3, 35600, eth(bytes.fromhex("0180c2000002"), MAC_A, 0x8809, oam)))

ntlm = b"NTLMSSP\x00" + struct.pack("<I", 1) + bytes(20)
spnego_blob = bytes([0x60, len(ntlm) + 10, 0x06, 0x06]) + \
    bytes.fromhex("2B0601050502") + bytes([0xA0, len(ntlm)]) + ntlm
smb2_ss = smb2_hdr(1, 0, 9) + \
    struct.pack("<HBBI", 25, 0, 0, 0) + struct.pack("<I", 0) + \
    struct.pack("<HH", 64 + 24, len(spnego_blob)) + struct.pack("<Q", 0) + \
    spnego_blob
smb2_ss = struct.pack(">I", len(smb2_ss)) + smb2_ss
extra.append((t3, 35700, ip_frame(6, A, B, tcp(53901, 445, 1, smb2_ss), ident=359)))

adb = b"CNXN" + struct.pack("<III", 0x01000000, 256 * 1024, 0) + \
    struct.pack("<I", 0) + bytes([0xBC, 0xB1, 0xA7, 0xB1])
extra.append((t3, 35800, ip_frame(6, A, B, tcp(50185, 5555, 1, adb), ident=360)))

extra.append((t3, 35900, ip_frame(17, A, B,
              udp(50186, 4342, bytes([0x10, 0, 0, 1]) + bytes(12)), ident=361)))

m2ua = bytes([1, 0, 6, 1]) + struct.pack(">I", 8)
extra.append((t3, 36000, ip_frame(132, A, B, sctp_data(2904, 2904, 2, m2ua),
              ident=362)))

sua = bytes([1, 0, 7, 1]) + struct.pack(">I", 8)
extra.append((t3, 36100, ip_frame(132, A, B, sctp_data(14001, 14001, 4, sua),
              ident=363)))

nlm = struct.pack(">IIII", 0x7A, 0, 2, 100021) + struct.pack(">II", 4, 1) + \
    bytes(16) + struct.pack(">I", 4) + bytes.fromhex("CAFEBABE")
extra.append((t3, 36200, ip_frame(17, A, B, udp(50187, 4045, nlm), ident=364)))

gfs_rpc = struct.pack(">IIII", 0x7B, 0, 2, 1298437) + \
    struct.pack(">II", 330, 27) + bytes(16) + bytes(range(16))
gfs = struct.pack(">I", 0x80000000 | len(gfs_rpc)) + gfs_rpc
extra.append((t3, 36300, ip_frame(6, A, B, tcp(50188, 24007, 1, gfs), ident=365)))

es_action = b"indices:data/read/get"
es = b"ES" + struct.pack(">I", 15 + 1 + len(es_action)) + \
    struct.pack(">Q", 11) + bytes([0]) + struct.pack(">I", 6080099) + \
    bytes(2) + bytes([len(es_action)]) + es_action
extra.append((t3, 36400, ip_frame(6, A, B, tcp(50189, 9300, 1, es), ident=366)))

skinny = struct.pack("<III", 4, 0, 0x0001)
extra.append((t3, 36500, ip_frame(6, A, B, tcp(50190, 2000, 1, skinny), ident=367)))

zrtp = bytes([0x10, 0x00]) + struct.pack(">H", 1) + b"ZRTP" + \
    struct.pack(">I", 0xDEAD) + struct.pack(">HH", 0x505A, 29) + \
    b"Hello   " + b"1.10" + bytes(8)
extra.append((t3, 36600, ip_frame(17, A, B, udp(50191, 30002, zrtp), ident=368)))

# 368-378: tier 47 — IoT/media chains (6LoWPAN under ZEP, ZCL above APS,
# CBOR in CoAP, H.264 on RTP PT 96) + Ceph/uTP/WTP/USBIP/Hazelcast/
# DLM3/D-Bus stubs
wpan2 = bytes([0x41, 0x88, 10]) + bytes([0x62, 0x1A]) + bytes([0, 0]) + \
    bytes([0x22, 0x3F])
sixlo = bytes([0x78, 0x00, 0xF0]) + struct.pack(">HH", 5683, 5684) + bytes(6)
zep3 = b"EX" + bytes([2, 1, 15]) + struct.pack(">H", 3) + bytes([0, 200]) + \
    bytes(8) + struct.pack(">I", 11) + bytes(10) + \
    bytes([len(wpan2 + sixlo)]) + wpan2 + sixlo
extra.append((t3, 36700, ip_frame(17, A, B, udp(50192, 17754, zep3), ident=369)))

zcl = bytes([0x00, 0x2B, 0x00]) + struct.pack("<H", 0x0000)
zep4 = b"EX" + bytes([2, 1, 15]) + struct.pack(">H", 4) + bytes([0, 200]) + \
    bytes(8) + struct.pack(">I", 12) + bytes(10) + \
    bytes([len(wpan + znwk + zaps + zcl)]) + wpan + znwk + zaps + zcl
extra.append((t3, 36800, ip_frame(17, A, B, udp(50193, 17754, zep4), ident=370)))

coap_cbor = bytes([0x40, 0x02]) + struct.pack(">H", 77) + bytes([0xFF, 0x05])
extra.append((t3, 36900, ip_frame(17, A, B, udp(50194, 5683, coap_cbor),
              ident=371)))

h264 = bytes([0x80, 0x60]) + struct.pack(">HI", 88, 3000) + \
    struct.pack(">I", 0x5555) + bytes([0x67, 0x42]) + bytes(6)
extra.append((t3, 37000, ip_frame(17, A, B, udp(49171, 49170, h264), ident=372)))

ceph = bytes([0x07]) + bytes(8) + bytes(8) + struct.pack("<H", 0x002A) + \
    bytes(35)
extra.append((t3, 37100, ip_frame(6, A, B, tcp(50195, 6789, 1, ceph), ident=373)))

utp = bytes([0x41, 0]) + struct.pack(">H", 0x1234) + bytes(12) + \
    struct.pack(">HH", 1, 0)
extra.append((t3, 37200, ip_frame(17, A, B, udp(50196, 6881, utp), ident=374)))

extra.append((t3, 37300, ip_frame(17, A, B,
              udp(50197, 9201, bytes([0x0A]) + struct.pack(">H", 7) + bytes(2)),
              ident=375)))

usbip = struct.pack(">HH", 0x0111, 0x8005) + struct.pack(">I", 0)
extra.append((t3, 37400, ip_frame(6, A, B, tcp(50198, 3240, 1, usbip), ident=376)))

hz = struct.pack("<I", 19) + bytes([0xC0]) + struct.pack("<H", 2) + \
    bytes(8) + bytes(4)
extra.append((t3, 37500, ip_frame(6, A, B, tcp(50199, 5701, 1, hz), ident=377)))

dlm3 = struct.pack("<I", 0x00030001) + bytes(8) + struct.pack("<H", 16) + \
    bytes([1, 0])
extra.append((t3, 37600, ip_frame(6, A, B, tcp(50200, 21064, 1, dlm3), ident=378)))

dbus = bytes([0x6C, 1, 0, 1]) + struct.pack("<II", 0, 2) + \
    struct.pack("<I", 0) + bytes(4)
extra.append((t3, 37700, ip_frame(6, A, B, tcp(50201, 7272, 1, dbus), ident=379)))

# 379-383: tier 48 — content layers: protobuf inside a gRPC message,
# JSON HTTP entities, GSM-SMS text out of SMPP submit_sm, CLNP on the
# OSI SAP, and WTLS on the secure WAP port
pb_msg = bytes([0]) + struct.pack(">I", 7) + bytes([0x0A, 5]) + b"graft"
c4 = h2f(0, 0, 1, pb_msg)
extra.append((t3, 37800, ip_frame(6, A, B,
              tcp(54300, 50051, 1 + len(c1) + len(c2) + len(grpc_req) + 9, c4),
              ident=380)))

json_body = b'{"status": "ok", "n": 42}'
json_rsp = b"HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n" + \
    b"Content-Length: " + str(len(json_body)).encode() + b"\r\n\r\n" + json_body
extra.append((t3, 37900, ip_frame(6, B, A, tcp(80, 50202, 1, json_rsp), ident=381)))

sm_text = b"Hello World!"
smpp_body = b"\x00" + bytes([1, 1]) + b"12345\x00" + bytes([1, 1]) + \
    b"67890\x00" + bytes([0, 0, 0]) + b"\x00" + b"\x00" + \
    bytes([1, 0, 0, 0]) + bytes([len(sm_text)]) + sm_text
smpp = struct.pack(">IIII", 16 + len(smpp_body), 4, 0, 9) + smpp_body
extra.append((t3, 38000, ip_frame(6, A, B, tcp(50203, 2775, 1, smpp), ident=382)))

clnp = bytes([0x81, 27, 1, 99, 0x1C]) + struct.pack(">HH", 27, 0) + bytes(18)
llc_clnp = bytes([0xFE, 0xFE, 0x03]) + clnp
extra.append((t3, 38100, eth(MAC_B, MAC_A, len(llc_clnp), llc_clnp)))

wtls = bytes([0x03]) + struct.pack(">H", 20) + bytes(20)
extra.append((t3, 38200, ip_frame(17, A, B, udp(50204, 9202, wtls), ident=383)))

# 384-387: tier 49 — OCSP / CMS / DAAP media-typed HTTP entities + OBEX
ocsp_body = bytes([0x30, 3, 0x0A, 1, 0])
ocsp_rsp = b"HTTP/1.1 200 OK\r\nContent-Type: application/ocsp-response\r\n" + \
    b"Content-Length: " + str(len(ocsp_body)).encode() + b"\r\n\r\n" + ocsp_body
extra.append((t3, 38300, ip_frame(6, B, A, tcp(80, 50205, 1, ocsp_rsp), ident=384)))

cms_body = bytes([0x30, 18, 0x06, 9]) + bytes.fromhex("2A864886F70D010702") + \
    bytes([0xA0, 5, 0x30, 3, 0x02, 0x01, 0x01])  # content [0] { version 1 }
cms_rsp = b"HTTP/1.1 200 OK\r\nContent-Type: application/pkcs7-mime\r\n" + \
    b"Content-Length: " + str(len(cms_body)).encode() + b"\r\n\r\n" + cms_body
extra.append((t3, 38400, ip_frame(6, B, A, tcp(80, 50206, 1, cms_rsp), ident=385)))

daap_body = b"mlog" + struct.pack(">I", 4) + bytes(4)
daap_rsp = b"HTTP/1.1 200 OK\r\nContent-Type: application/x-dmap-tagged\r\n" + \
    b"Content-Length: " + str(len(daap_body)).encode() + b"\r\n\r\n" + daap_body
extra.append((t3, 38500, ip_frame(6, B, A, tcp(80, 50207, 1, daap_rsp), ident=386)))

obex = bytes([0x80]) + struct.pack(">H", 7) + bytes([0x10, 0]) + \
    struct.pack(">H", 0x2000)
extra.append((t3, 38600, ip_frame(6, A, B, tcp(50208, 650, 1, obex), ident=387)))

# 388-389: tier 50 — TCAP inside an SCCP UDT over M3UA, and the Windows
# browser protocol inside a \MAILSLOT\BROWSE group datagram
tcap = bytes([0x62, 8, 0x48, 4]) + bytes.fromhex("01020304") + bytes([0x6B, 0])
udt = bytes([0x09, 0x80, 3, 5, 7]) + bytes([2, 0x42, 0x08]) + \
    bytes([2, 0x43, 0x09]) + bytes([len(tcap)]) + tcap
m3ua_tcap_param = struct.pack(">HH", 0x0210, 4 + 12 + len(udt)) + \
    struct.pack(">II", 1001, 2002) + bytes([3, 1, 0, 0]) + udt
m3ua_tcap = bytes([1, 0, 1, 1]) + \
    struct.pack(">I", 8 + len(m3ua_tcap_param)) + m3ua_tcap_param
extra.append((t3, 38700, ip_frame(132, A, B,
              sctp_data(2905, 2905, 3, m3ua_tcap), ident=388)))

browse = b"\x01\x00" + bytes([8]) + struct.pack("<I", 0) + b"WORKGROUP" + bytes(7)
mailslot = b"\\MAILSLOT\\BROWSE\x00" + browse
nbdgm_hdr = bytes([0x11, 0x02]) + struct.pack(">H", 0x77) + bytes(A) + \
    struct.pack(">HHH", 8 + len(mailslot) + 68, 0, 0)
nb_names = bytes([0x20]) + b"A" * 32 + b"\x00" + bytes([0x20]) + b"B" * 32 + b"\x00"
extra.append((t3, 38800, ip_frame(17, A, B,
              udp(138, 138, nbdgm_hdr + nb_names + mailslot), ident=389)))

# 390-391: tier 52 — IEC 61850 GOOSE straight on Ethernet (ethertype
# 0x88B8: APPID/length header then the BER-coded IECGoosePdu — gocbRef,
# timeAllowedtoLive, stNum, sqNum as context-tagged TLVs), and a CIP
# Get Attributes All RESPONSE in an ENIP SendRRData (service |0x80,
# general status 0) so cip.genstat has a native writer.


gocb = b"GEDevice/LLN0$GO$gcb01"
goose_pdu_body = (bytes([0x80, len(gocb)]) + gocb +
                  bytes([0x81, 2]) + struct.pack(">H", 2000) +
                  bytes([0x85, 1, 1]) +
                  bytes([0x86, 1, 3]))
goose_pdu = bytes([0x61, len(goose_pdu_body)]) + goose_pdu_body
goose_pkt = struct.pack(">HHHH", 0x4000, 8 + len(goose_pdu), 0, 0) + goose_pdu
extra.append((t3, 38900, eth(MAC_B, MAC_A, 0x88B8, goose_pkt)))

cip_rsp = bytes([0x81, 0x00, 0x00, 0x00])  # service|0x80, rsvd, genstat, addl
enip_rsp_data = (b"\x00" * 4 + struct.pack("<H", 10) + struct.pack("<H", 2) +
                 struct.pack("<HH", 0x0000, 0) +
                 struct.pack("<HH", 0x00B2, len(cip_rsp)) + cip_rsp)
enip_rsp = (struct.pack("<HHII", 0x006F, len(enip_rsp_data), 0xDEADBEEF, 0) +
            b"\x00" * 8 + struct.pack("<I", 0) + enip_rsp_data)
extra.append((t3, 39000, ip_frame(6, B, A, tcp(44818, 49324, 1, enip_rsp),
              ident=391)))


# 392-407: tier 55 — the deepening pass. Frames exercising field writes
# ADDED to existing dissectors (udp analysis trio, snmp v1 PDU internals,
# ipmi completion code, usbip URBs, smb/smb2 names, openwire command id,
# dlep TCP messages, hdfs IPC length, iscsi SCSI command LUN, bt-dht node
# id + bencode int) plus three small new layers (mikey, mac-lte framed,
# udplite) and the PRP trailer.
t55 = t3 + 40000


def pseudo_sum(src, dst, ulen):
    s = (src[0] << 8 | src[1]) + (src[2] << 8 | src[3]) + \
        (dst[0] << 8 | dst[1]) + (dst[2] << 8 | dst[3]) + 17 + ulen
    while s >> 16:
        s = (s & 0xFFFF) + (s >> 16)
    return s


# 392: traceroute probe (classic UDP port band)
extra.append((t55, 0, ip_frame(17, A, B, udp(50300, 33434, b"probe"), ident=392)))
# 393: zero length field (segmentation-offload artifact)
extra.append((t55, 100, ip_frame(17, A, B,
              struct.pack(">HHHH", 50301, 9, 0, 0) + b"offload", ident=393)))
# 394: partial checksum — the stored value is the UNCOMPLEMENTED
# pseudo-header sum a TX-offloading stack leaves for the NIC
_pl = b"partial"
_ulen = 8 + len(_pl)
extra.append((t55, 200, ip_frame(17, A, B,
              struct.pack(">HHHH", 50302, 9, _ulen, pseudo_sum(A, B, _ulen)) + _pl,
              ident=394)))
# 395: SNMPv1 get-response, sysDescr.0 = "graft" (error-status 0)
_oid = bytes([0x06, 8, 0x2B, 6, 1, 2, 1, 1, 1, 0])
_vb = bytes([0x30, len(_oid) + 7]) + _oid + bytes([0x04, 5]) + b"graft"
_vbl = bytes([0x30, len(_vb)]) + _vb
_pdu_body = bytes([0x02, 1, 1]) + bytes([0x02, 1, 0]) + bytes([0x02, 1, 0]) + _vbl
_pdu = bytes([0xA2, len(_pdu_body)]) + _pdu_body
_snmp = bytes([0x30, len(_pdu) + 11, 0x02, 1, 0, 0x04, 6]) + b"public" + _pdu
extra.append((t55, 300, ip_frame(17, B, A, udp(161, 50303, _snmp), ident=395)))
# 396: IPMI response (NetFn 7 = App response) with completion code 0
_ipmi = bytes([0x06, 0x00, 0xFF, 0x07]) + bytes([0x00]) + bytes(8) + bytes([8]) + \
    bytes([0x81, 7 << 2, 0x00, 0x20, 0x00, 0x01, 0x00, 0x00])
extra.append((t55, 400, ip_frame(17, B, A, udp(623, 50304, _ipmi), ident=396)))
# 397: USB/IP URB — CMD_SUBMIT seqnum 42
_urb = struct.pack(">IIIII", 1, 42, 0x00010005, 0, 0x81) + bytes(28)
extra.append((t55, 500, ip_frame(6, A, B, tcp(50305, 3240, 1, _urb), ident=397)))
# 398: SMB1 Tree Connect AndX request for \\FILESRV\DATA
_tc_body = bytes([4]) + bytes([0xFF, 0, 0, 0]) + struct.pack("<H", 0) + \
    struct.pack("<H", 1) + struct.pack("<H", 0) + b"\x00" + \
    b"\\\\FILESRV\\DATA\x00" + b"A:\x00"
_tc = smb1_hdr(0x75, 0, 0x00, 0x0001, 0, 0x1234, 100, 3) + _tc_body
_tc = struct.pack(">I", len(_tc)) + _tc
extra.append((t55, 600, ip_frame(6, A, B, tcp(49900, 445, 40, _tc), ident=398)))
# 399: SMB1 NT Create AndX REQUEST naming report.xlsx
_fname = b"report.xlsx"
_nc_body = bytes([24]) + bytes([0xFF, 0, 0, 0]) + bytes([0]) + \
    struct.pack("<H", len(_fname)) + bytes(41) + \
    struct.pack("<H", len(_fname) + 1) + _fname + b"\x00"
_nc = smb1_hdr(0xA2, 0, 0x00, 0x0001, 5, 0x1234, 100, 4) + _nc_body
_nc = struct.pack(">I", len(_nc)) + _nc
extra.append((t55, 700, ip_frame(6, A, B, tcp(49900, 445, 140, _nc), ident=399)))
# 400: SMB2 CREATE request naming logs/app.log (UTF-16LE)
_name16 = "logs/app.log".encode("utf-16-le")
_cr_body = struct.pack("<HBB", 57, 0, 0) + bytes(4) + bytes(8) + bytes(8) + \
    struct.pack("<III", 0x89, 0x80, 3) + struct.pack("<II", 1, 0x40) + \
    struct.pack("<HH", 64 + 56, len(_name16)) + struct.pack("<II", 0, 0) + _name16
_cr = b"\xfeSMB" + struct.pack("<HHI", 64, 1, 0) + struct.pack("<HH", 5, 0) + \
    struct.pack("<II", 0, 0) + struct.pack("<Q", 7) + \
    struct.pack("<II", 0, 9) + struct.pack("<Q", 0x11) + bytes(16) + _cr_body
_cr = struct.pack(">I", len(_cr)) + _cr
extra.append((t55, 800, ip_frame(6, A, B, tcp(49901, 445, 1, _cr), ident=400)))
# 401: OpenWire command (loose marshalling): type 6, command id 77
_ow_body = bytes([6]) + struct.pack(">I", 77) + bytes(4)
_ow = struct.pack(">I", len(_ow_body)) + _ow_body
extra.append((t55, 900, ip_frame(6, A, B, tcp(50306, 61616, 1, _ow), ident=401)))
# 402: DLEP Session Initialization message on the TCP side of 854
extra.append((t55, 1000, ip_frame(6, A, B,
              tcp(50307, 854, 1, struct.pack(">HH", 1, 0)), ident=402)))
# 403: Hadoop IPC length-prefixed message after the handshake
_hm = struct.pack(">I", 10) + bytes(10)
extra.append((t55, 1100, ip_frame(6, A, B, tcp(50308, 8020, 1, _hm), ident=403)))
# 404: MIKEY pre-shared key init on UDP 2269
_mikey = bytes([1, 0, 4]) + bytes([0x01, 0x02, 0x03, 0x04]) + bytes([0, 9, 1])
extra.append((t55, 1200, ip_frame(17, A, B, udp(50309, 2269, _mikey), ident=404)))
# 405: MAC-LTE framed over UDP (packet-mac-lte.h magic + tags)
_ml = b"mac-lte" + bytes([1, 0, 3]) + bytes([0x02]) + struct.pack(">H", 61) + \
    bytes([0x04]) + struct.pack(">H", (100 << 4) | 5) + bytes([0x01]) + b"\x20\x1f"
extra.append((t55, 1300, ip_frame(17, A, B, udp(50310, 9999, _ml), ident=405)))
# 406: UDP-Lite with an ILLEGAL checksum coverage of 4 (must be 0 or >= 8)
_ul = struct.pack(">HHHH", 50311, 5004, 4, 0) + b"lite"
extra.append((t55, 1400, ip_frame(136, A, B, _ul, ident=406)))
# 407: PRP-1 redundancy trailer behind a plain ICMP ping
_picmp = struct.pack(">BBHHH", 8, 0, 0, 0x52, 1)
_ph, _pp = ipv4(1, A, B, _picmp, ident=407)
_prp_size = len(_ph) + len(_pp) + 6
_prp = eth(MAC_B, MAC_A, 0x0800, _ph + _pp) + \
    struct.pack(">HHH", 7, (0xA << 12) | (_prp_size & 0xFFF), 0x88FB)
extra.append((t55, 1500, _prp))
# 408: iSCSI SCSI Command — LUN 1 (first-level), read CDB stub
_bhs = bytes([0x01, 0x81]) + bytes(3) + bytes([0, 0, 0]) + \
    struct.pack(">HHI", 1, 0, 0) + struct.pack(">I", 0x99) + \
    struct.pack(">I", 512) + struct.pack(">I", 3) + struct.pack(">I", 0) + \
    bytes(16)
extra.append((t55, 1600, ip_frame(6, A, B, tcp(50010, 3260, 49, _bhs), ident=408)))
# 409: DHT announce_peer query with the node id + an integer value
_dht = b"d1:ad2:id20:ABCDEFGHIJKLMNOPQRST12:implied_porti1ee1:q13:announce_peer" + \
    b"1:t2:aa1:y1:qe"
extra.append((t55, 1700, ip_frame(17, A, B, udp(50312, 6881, _dht), ident=409)))


# 410-414: tier 56 — BFCP floor control, Gb-over-IP NS/BSSGP, an LwM2M
# TLV entity inside CoAP, an SMB2 Session Setup RESPONSE whose SPNEGO
# NegTokenResp carries the negotiation result, and a LISP data frame
# with the instance-id bit set.
bfcp = bytes([2 << 5, 1]) + struct.pack(">H", 0) + struct.pack(">IHH", 4, 1, 2)
extra.append((t55, 1800, ip_frame(17, A, B, udp(50313, 5070, bfcp), ident=410)))
ns_bssgp = bytes([0x00, 0x00, 0x00, 0x0A]) + bytes([0x01]) + \
    struct.pack(">I", 0xC0000001) + bytes([0x00, 0x00, 0x00])
extra.append((t55, 1900, ip_frame(17, A, B, udp(50314, 23000, ns_bssgp), ident=411)))
# CoAP 2.05 Content with Content-Format 11542 (LwM2M TLV): one resource
# TLV, 8-bit length, identifier 5, 3-byte value
coap_lwm2m = bytes([0x60, 0x45]) + struct.pack(">H", 77) + \
    bytes([0xC2, 0x2D, 0x16]) + bytes([0xFF]) + bytes([0xC8, 0x05, 0x03]) + b"abc"
extra.append((t55, 2000, ip_frame(17, B, A, udp(5683, 50315, coap_lwm2m), ident=412)))
spnego_resp = bytes([0xA1, 0x07, 0x30, 0x05, 0xA0, 0x03, 0x0A, 0x01, 0x01])
smb2_ssr = smb2_hdr(1, 1, 9) + struct.pack("<HH", 9, 0) + \
    struct.pack("<HH", 64 + 8, len(spnego_resp)) + spnego_resp
smb2_ssr = struct.pack(">I", len(smb2_ssr)) + smb2_ssr
extra.append((t55, 2100, ip_frame(6, B, A, tcp(445, 53901, 1, smb2_ssr), ident=413)))
_icmp56 = struct.pack(">BBHHH", 8, 0, 0, 0x53, 1)
_h56, _p56 = ipv4(1, [10, 0, 3, 1], [10, 0, 3, 2], _icmp56, ident=414)
lisp_iid = bytes([0x88, 0x00, 0x00, 0xCD]) + bytes([0x00, 0x00, 0x2A, 0x01]) + \
    _h56 + _p56  # flags N|I: nonce 0xCD, instance id 0x00002A
extra.append((t55, 2200, ip_frame(17, A, B, udp(50316, 4341, lisp_iid), ident=415)))


# 415-419: tier 57 — IPP inside HTTP, an X11 core request, a Spice mini
# data message, a TN3270 record in telnet binary mode, and a Hadoop IPC
# response whose protobuf header carries the SUCCESS status.
ipp_body = bytes([0x02, 0x00]) + struct.pack(">H", 0x0002) + struct.pack(">I", 7)
ipp_req = b"POST /printers/lp HTTP/1.1\r\nHost: print.example\r\n" + \
    b"Content-Type: application/ipp\r\n" + \
    b"Content-Length: " + str(len(ipp_body)).encode() + b"\r\n\r\n" + ipp_body
extra.append((t55, 2300, ip_frame(6, A, B, tcp(50317, 631, 1, ipp_req), ident=415)))
x11_req = bytes([98, 0]) + struct.pack("<H", 2) + b"\x00" * 4
extra.append((t55, 2400, ip_frame(6, A, B, tcp(50318, 6000, 200, x11_req), ident=416)))
spice_msg = struct.pack("<HI", 101, 4) + b"\x01\x02\x03\x04"
extra.append((t55, 2500, ip_frame(6, B, A, tcp(5900, 50319, 1, spice_msg), ident=417)))
tn3270_rec = bytes([0xF5, 0xC3]) + b"\xc8\x85\x93\x93\x96" + bytes([0xFF, 0xEF])
extra.append((t55, 2600, ip_frame(6, B, A, tcp(23, 50320, 1, tn3270_rec), ident=418)))
hdfs_rsp = struct.pack(">I", 5) + bytes([4, 0x08, 0x01, 0x10, 0x00])
extra.append((t55, 2700, ip_frame(6, B, A, tcp(8020, 50308, 1, hdfs_rsp), ident=419)))


# 420-423: tier 58 — the telephony ASN.1 block. H.225 RAS GRQ/GCF in
# aligned PER (choice index + sequence preamble leave requestSeqNum
# octet-aligned at bytes 2-3, value-1), an H.245 openLogicalChannel over
# TPKT (fixture port 1721 — the port is Setup-signaled in real calls),
# and an H.248 binary TransactionRequest (Annex A BER) on UDP 2945.
h225_oid = bytes([6, 0x00, 0x08, 0x91, 0x4A, 0x00, 0x02])
grq = bytes([0x00, 0x00]) + struct.pack(">H", 6) + h225_oid + bytes(6)
extra.append((t55, 2800, ip_frame(17, A, B, udp(50321, 1719, grq), ident=420)))
gcf = bytes([0x04, 0x00]) + struct.pack(">H", 6) + h225_oid + bytes(4)
extra.append((t55, 2900, ip_frame(17, B, A, udp(1719, 50321, gcf), ident=421)))
olc = bytes([0x03, 0x00]) + struct.pack(">H", 258) + bytes(6)  # flcn 259
h245_pkt = b"\x03\x00" + struct.pack(">H", 4 + len(olc)) + olc
extra.append((t55, 3000, ip_frame(6, A, B, tcp(50322, 1721, 1, h245_pkt), ident=422)))
h248 = bytes([0x30, 0x1A, 0x30, 0x18, 0x02, 0x01, 0x03]) + \
    bytes([0xA0, 0x06, 0x04, 0x04, 10, 0, 0, 1]) + \
    bytes([0xA1, 0x0B, 0xA2, 0x09, 0x02, 0x02, 0x03, 0xE9]) + \
    bytes([0x30, 0x03, 0xA0, 0x01, 0x00])
extra.append((t55, 3100, ip_frame(17, A, B, udp(50323, 2945, h248), ident=423)))


# 424-426: tier 59 — a CARP advertisement (IP proto 112, the fixed
# 36-byte authlen=7 layout that discriminates it from VRRPv2), an H.245
# terminalCapabilitySet, and an unsecured Thread MLE advertisement.
carp = bytes([0x21, 5, 0, 7, 0, 1, 0, 0]) + bytes(8) + bytes(20)
extra.append((t55, 3200, ip_frame(112, A, B, carp, ident=424)))
tcs = bytes([0x02, 0x00, 0x09]) + bytes(5)
h245_tcs = b"\x03\x00" + struct.pack(">H", 4 + len(tcs)) + tcs
extra.append((t55, 3300, ip_frame(6, A, B, tcp(50322, 1721, 100, h245_tcs), ident=425)))
mle = bytes([255, 4]) + bytes([0x00, 0x01, 0x02])
extra.append((t55, 3400, ip_frame(17, A, B, udp(19788, 19788, mle), ident=426)))


# 427-428: tier 60 — PROFINET IODConnect over connectionless DCE/RPC v4
# (UDP 34964: 80-byte C706 CL header + NDR args + big-endian PNIO blocks
# ARBlockReq/IOCRBlockReq), and an MMS confirmed-Request on the full OSI
# stack (TPKT/COTP/session 01 00 01 00/ISO 8823 shell/BER MMS PDU).
_aruuid = bytes.fromhex("11223344556677889900aabbccddeeff")
_cl_hdr = bytes([4, 0, 0x20, 0, 0x10, 0, 0, 0]) + bytes(16) + bytes(16) + \
    bytes(16) + struct.pack("<III", 0x1000, 1, 0) + struct.pack("<HHHHH", 0, 0, 0, 0, 0) + \
    bytes([0, 0])
assert len(_cl_hdr) == 80, len(_cl_hdr)
# BlockHeader(type, length-from-version-field, version) + body
_ar_body = struct.pack(">H", 1) + _aruuid + struct.pack(">H", 0xCAFE)
_ar_block = struct.pack(">HHH", 0x0101, 2 + len(_ar_body), 0x0100) + _ar_body
_iocr_body = struct.pack(">HHH", 1, 1, 0x8892) + struct.pack(">I", 0x11) + \
    struct.pack(">HHHHHH", 40, 0x8000, 32, 1, 0, 0) + struct.pack(">I", 0) + \
    struct.pack(">HHH", 10, 3, 0xC000) + bytes(6) + struct.pack(">H", 1) + \
    struct.pack(">I", 0)
_iocr_block = struct.pack(">HHH", 0x0102, 2 + len(_iocr_body), 0x0100) + _iocr_body
_ndr = struct.pack("<IIIII", 1024, len(_ar_block) + len(_iocr_block), 1024, 0,
                   len(_ar_block) + len(_iocr_block))
pnio = _cl_hdr + _ndr + _ar_block + _iocr_block
extra.append((t55, 3500, ip_frame(17, A, B, udp(50324, 34964, pnio), ident=427)))

_mms_pdu = bytes([0xA0, 0x07, 0x02, 0x01, 0x2A, 0xA4, 0x02, 0x80, 0x00])
_pres = bytes([0xA0, len(_mms_pdu)]) + _mms_pdu
_pctx = bytes([0x02, 0x01, 0x03]) + _pres
_pdvl = bytes([0x30, len(_pctx)]) + _pctx
_fed = bytes([0x61, len(_pdvl)]) + _pdvl
_ses = bytes([0x01, 0x00, 0x01, 0x00]) + _fed
_cotp = bytes([0x02, 0xF0, 0x80]) + _ses
mms_pkt = b"\x03\x00" + struct.pack(">H", 4 + len(_cotp)) + _cotp
extra.append((t55, 3600, ip_frame(6, A, B, tcp(50325, 102, 1, mms_pkt), ident=428)))

# 429-430: round 11 — the last two closable glossary stubs. ROHC over
# PPPoE-session (RFC 3241 PPP protocol 0x0003): an RFC 3095 IR packet
# (type 0xFD = IR with dynamic chain) whose profile octet (0x01 =
# RTP/UDP/IP) follows the type; and an H.225 RAS DisengageRequest in
# ALIGNED PER whose fixed all-options-absent shape places the
# conferenceID GUID at bytes 6..21 (see Dissect.dissectH225Ras).
rohc_ir = bytes([0xFD, 0x01, 0xAA]) + bytes(6)
pppoe_rohc = bytes([0x11, 0x00]) + struct.pack(">HH", 9, 2 + len(rohc_ir)) + \
    struct.pack(">H", 0x0003) + rohc_ir
extra.append((t55, 3700, eth(MAC_B, MAC_A, 0x8864, pppoe_rohc)))

drq = bytes([0x3C]) + struct.pack(">H", 6) + bytes([0x00]) + b"\x00E" + \
    bytes(range(16)) + struct.pack(">H", 0x42) + bytes([0x20])
extra.append((t55, 3800, ip_frame(17, A, B, udp(50326, 1719, drq), ident=430)))

write_pcap("src/test/resources/sweep_extra.pcap", extra)


# wlan.pcap — a monitor-mode capture (linktype 105): beacons from two
# BSSes plus one unprotected QoS data frame carrying SNAP/IPv4/ICMP
def dot11_beacon(bssid_last, ssid, seq):
    return struct.pack("<H", 0x0080) + struct.pack(">H", 0) + \
        b"\xff" * 6 + bytes([2, 0, 0, 0, 0, bssid_last]) + \
        bytes([2, 0, 0, 0, 0, bssid_last]) + struct.pack("<H", seq << 4) + \
        b"\x00" * 12 + bytes([0, len(ssid)]) + ssid


wlan_pkts = []
for i, (b, s) in enumerate([(1, b"graftnet"), (1, b"graftnet"),
                            (2, b"labnet"), (1, b"graftnet")]):
    wlan_pkts.append((t3, 100 * i, dot11_beacon(b, s, i)))
_icmp = struct.pack(">BBHHH", 8, 0, 0, 0x42, 7)
_ih2, _ip2 = ipv4(1, [10, 0, 2, 1], [10, 0, 2, 2], _icmp)
snap = bytes([0xAA, 0xAA, 0x03, 0, 0, 0, 0x08, 0x00])
qos_data = struct.pack("<H", 0x0188) + struct.pack(">H", 0) + \
    bytes([2, 0, 0, 0, 0, 9]) + bytes([2, 0, 0, 0, 0, 1]) + \
    bytes([2, 0, 0, 0, 0, 2]) + struct.pack("<HH", 0, 0) + \
    snap + _ih2 + _ip2
wlan_pkts.append((t3, 500, qos_data))
write_pcap("src/test/resources/wlan.pcap", wlan_pkts, linktype=105)

# ---------------------------------------------------------------------------
# Tier 51 — the Bluetooth host stack. Three fixtures:
#   bt.pcap   (linktype 201, BLUETOOTH_HCI_H4_WITH_PHDR): a 4-byte
#             big-endian direction word (0 sent / 1 rcvd) precedes each H4
#             packet. Walks HCI cmd/evt, then ACL→L2CAP signaling (dynamic
#             CID establishment for SDP PSM 0x0001 and RFCOMM PSM 0x0003),
#             SDP service search, RFCOMM SABM/UA/UIH, and ATT on CID 4.
#   bth4.pcap (linktype 187, BLUETOOTH_HCI_H4): no phdr — direction is
#             inferred from the H4 packet type (cmd can only be host→ctrl).
#   btle.pcap (linktype 251, BLUETOOTH_LE_LL): over-the-air LE link-layer
#             packets (access address + header + payload + 3-byte CRC):
#             ADV_IND, SCAN_REQ, an ADV_NONCONN_IND carrying a Mesh
#             Message AD (→ btmesh), and a data-channel PDU → L2CAP → ATT.
t5 = 1700003000


def h4(direction, pkt):
    return struct.pack(">I", direction) + pkt


def hci_acl(handle, payload, pb=2):
    # handle (12 bits) | PB flag (2) | BC flag (2), little-endian on the wire
    return bytes([0x02]) + struct.pack("<HH", handle | (pb << 12), len(payload)) + payload


def l2cap(cid, payload):
    return struct.pack("<HH", len(payload), cid) + payload


bt = []
# 1-2: Reset command, Command Complete event
bt.append((t5, 0, h4(0, bytes([0x01]) + struct.pack("<H", 0x0C03) + bytes([0]))))
bt.append((t5, 100, h4(1, bytes([0x04, 0x0E, 4, 1]) + struct.pack("<H", 0x0C03) + bytes([0]))))
# 3-4: L2CAP signaling — Connection Request/Response for SDP (PSM 0x0001)
conn_req_sdp = bytes([0x02, 0x01]) + struct.pack("<H", 4) + struct.pack("<HH", 0x0001, 0x0040)
bt.append((t5, 200, h4(0, hci_acl(1, l2cap(1, conn_req_sdp)))))
conn_rsp_sdp = bytes([0x03, 0x01]) + struct.pack("<H", 8) + struct.pack("<HHHH", 0x0041, 0x0040, 0, 0)
bt.append((t5, 300, h4(1, hci_acl(1, l2cap(1, conn_rsp_sdp)))))
# 5-6: SDP Service Search Request/Response on the established CID pair
#   pattern: DES(0x35) of one UUID16 (0x1200 PnP Information), max 10 records
sdp_req = bytes([0x02]) + struct.pack(">HH", 0x0001, 8) + \
    bytes([0x35, 0x03, 0x19, 0x12, 0x00]) + struct.pack(">H", 10) + bytes([0])
bt.append((t5, 400, h4(0, hci_acl(1, l2cap(0x0041, sdp_req)))))
sdp_rsp = bytes([0x03]) + struct.pack(">HH", 0x0001, 9) + \
    struct.pack(">HH", 1, 1) + struct.pack(">I", 0x00010000) + bytes([0])
bt.append((t5, 500, h4(1, hci_acl(1, l2cap(0x0040, sdp_rsp)))))
# 7-8: Connection Request/Response for RFCOMM (PSM 0x0003)
conn_req_rf = bytes([0x02, 0x02]) + struct.pack("<H", 4) + struct.pack("<HH", 0x0003, 0x0042)
bt.append((t5, 600, h4(0, hci_acl(1, l2cap(1, conn_req_rf)))))
conn_rsp_rf = bytes([0x03, 0x02]) + struct.pack("<H", 8) + struct.pack("<HHHH", 0x0043, 0x0042, 0, 0)
bt.append((t5, 700, h4(1, hci_acl(1, l2cap(1, conn_rsp_rf)))))
# 9-11: RFCOMM — SABM on DLCI 0, UA, then UIH data on DLCI 2 (channel 1)
rf_sabm = bytes([0x03, 0x3F, 0x01, 0x1C])           # addr EA|CR dlci0, SABM+P, len 0, FCS
bt.append((t5, 800, h4(0, hci_acl(1, l2cap(0x0043, rf_sabm)))))
rf_ua = bytes([0x03, 0x73, 0x01, 0xD7])             # UA+F
bt.append((t5, 900, h4(1, hci_acl(1, l2cap(0x0042, rf_ua)))))
rf_uih = bytes([0x0B, 0xEF, 0x09, 0x41, 0x54, 0x0D, 0x0A, 0x9A])  # dlci 2, UIH, len 4, "AT\r\n", FCS
bt.append((t5, 1000, h4(0, hci_acl(1, l2cap(0x0043, rf_uih)))))
# 12-15: ATT on the fixed channel CID 4 — Read By Group Type (discover
# primary services), then Read Request/Response on a handle
att_rbgt_req = bytes([0x10]) + struct.pack("<HHH", 0x0001, 0xFFFF, 0x2800)
bt.append((t5 + 1, 0, h4(0, hci_acl(1, l2cap(4, att_rbgt_req)))))
att_rbgt_rsp = bytes([0x11, 6]) + struct.pack("<HHH", 0x0001, 0x0005, 0x1800)
bt.append((t5 + 1, 100, h4(1, hci_acl(1, l2cap(4, att_rbgt_rsp)))))
att_read_req = bytes([0x0A]) + struct.pack("<H", 0x0003)
bt.append((t5 + 1, 200, h4(0, hci_acl(1, l2cap(4, att_read_req)))))
att_read_rsp = bytes([0x0B]) + b"graft"
bt.append((t5 + 1, 300, h4(1, hci_acl(1, l2cap(4, att_read_rsp)))))
write_pcap("src/test/resources/bt.pcap", bt, linktype=201)

# bth4.pcap — same first exchange without the direction pseudo-header
bth4 = [
    (t5, 0, bytes([0x01]) + struct.pack("<H", 0x0C03) + bytes([0])),
    (t5, 100, bytes([0x04, 0x0E, 4, 1]) + struct.pack("<H", 0x0C03) + bytes([0])),
]
write_pcap("src/test/resources/bth4.pcap", bth4, linktype=187)

# btle.pcap — LE link layer: AA(4, LE) + header(2) + payload + CRC(3).
ADV_AA = struct.pack("<I", 0x8E89BED6)
adv_a = bytes([0x01, 0x00, 0x00, 0x00, 0x00, 0xC0])   # AdvA on-air (LSB first)
scan_a = bytes([0x02, 0x00, 0x00, 0x00, 0x00, 0xC0])
crc = b"\x5A\x5A\x5A"
ble = []
# ADV_IND: flags AD + complete local name "graftble"
ad = bytes([2, 0x01, 0x06]) + bytes([9, 0x09]) + b"graftble"
pdu = adv_a + ad
ble.append((t5 + 2, 0, ADV_AA + bytes([0x00, len(pdu)]) + pdu + crc))
# SCAN_REQ (type 3): ScanA + AdvA
pdu = scan_a + adv_a
ble.append((t5 + 2, 100, ADV_AA + bytes([0x03, len(pdu)]) + pdu + crc))
# ADV_NONCONN_IND (type 2) carrying a Mesh Message AD (type 0x2A):
# network PDU first byte = IVI(1)|NID(7) = 0x68, then obfuscated bytes
mesh_net = bytes([0x68]) + b"\x11\x22\x33\x44\x55\x66\x77\x88\x99\xAA\xBB\xCC\xDD"
ad = bytes([1 + len(mesh_net), 0x2A]) + mesh_net
pdu = adv_a + ad
ble.append((t5 + 2, 200, ADV_AA + bytes([0x02, len(pdu)]) + pdu + crc))
# data-channel PDU (non-advertising access address): LLID=2 start/complete,
# L2CAP on CID 4 → ATT Read Request handle 0x0003
data_aa = struct.pack("<I", 0xAF9A8B23)
att = bytes([0x0A]) + struct.pack("<H", 0x0003)
payload = l2cap(4, att)
ble.append((t5 + 2, 300, data_aa + bytes([0x02, len(payload)]) + payload + crc))
write_pcap("src/test/resources/btle.pcap", ble, linktype=251)

# ---------------------------------------------------------------------------
# Tier 52 — the automotive buses.
#   can.pcap     (linktype 227, SocketCAN): 4-byte big-endian CAN ID with
#                EFF/RTR/ERR in the top bits, then len + 3 pad bytes, then
#                data. One raw frame, three CANopen frames (SDO download,
#                NMT start, heartbeat), two J1939 frames (PDU2 broadcast
#                and a PDU1 Request) on 29-bit extended IDs.
#   flexray.pcap (linktype 210): measurement byte (bit0 channel, bits2-1
#                type: 1 frame / 2 symbol), then the 5-byte FlexRay frame
#                header (indicators, 11-bit frame ID, 7-bit payload length
#                in words, header CRC, 6-bit cycle count) and payload.
t6 = 1700004000


def socketcan(can_id, data, eff=False):
    cid = can_id | (0x80000000 if eff else 0)
    return struct.pack(">I", cid) + bytes([len(data), 0, 0, 0]) + data


can_pkts = [
    (t6, 0, socketcan(0x123, bytes.fromhex("DEADBEEF01020304"))),
    # CANopen SDO download request to node 1: index 0x1017 (heartbeat time)
    (t6, 100, socketcan(0x601, bytes.fromhex("2F17100005000000"))),
    # CANopen NMT start-remote-node, all nodes
    (t6, 200, socketcan(0x000, bytes.fromhex("0100"))),
    # CANopen heartbeat node 1: operational
    (t6, 300, socketcan(0x701, bytes.fromhex("05"))),
    # J1939 PDU2: PRI 6, PGN 65265 (CCVS), SA 0x00
    (t6, 400, socketcan(0x18FEF100, bytes.fromhex("FFFF7D0C00FFFFFF"), eff=True)),
    # J1939 PDU1: PRI 3, PGN 59904 (Request), DA 0x00, SA 0xF9 asking for
    # PGN 60928 (address claimed)
    (t6, 500, socketcan(0x0CEA00F9, bytes.fromhex("00EE00"), eff=True)),
]
write_pcap("src/test/resources/can.pcap", can_pkts, linktype=227)


def flexray_frame(channel, fid, plen_words, cc, payload, sync=False):
    mb = 0x02 | (1 if channel == "B" else 0)
    b0 = (0x10 if sync else 0) | ((fid >> 8) & 0x07)
    hdr = bytes([b0, fid & 0xFF, (plen_words << 1) | 0, 0x2A, cc & 0x3F])
    return bytes([mb]) + hdr + payload


fr_pkts = [
    (t6 + 1, 0, flexray_frame("A", 13, 2, 5, bytes.fromhex("11223344"), sync=True)),
    (t6 + 1, 100, flexray_frame("B", 700, 1, 42, bytes.fromhex("CAFE"))),
    # a channel-A symbol (type 2 in the measurement byte, one symbol byte)
    (t6 + 1, 200, bytes([0x04, 0x01])),
]
write_pcap("src/test/resources/flexray.pcap", fr_pkts, linktype=210)

# ---------------------------------------------------------------------------
# Tier 53 — the legacy link layers, one tiny fixture per linktype (a pcap
# carries exactly one linktype). Each chains into an existing upper layer
# (LLC/SNAP -> IPv4 ICMP, Q.931, X.25) so the walk proves the dispatch,
# not just the header decode.
t7 = 1700005000
_icmp9 = struct.pack(">BBHHH", 8, 0, 0, 0x51, 1)
_h9, _p9 = ipv4(1, [10, 0, 9, 1], [10, 0, 9, 2], _icmp9)
snap_ip = bytes([0xAA, 0xAA, 0x03, 0, 0, 0, 0x08, 0x00]) + _h9 + _p9

# FDDI (10): FC 0x50 (async LLC frame), dst, src, then LLC/SNAP/IPv4
fddi = bytes([0x50]) + bytes.fromhex("020000000009") + \
    bytes.fromhex("020000000008") + snap_ip
write_pcap("src/test/resources/legacy_fddi.pcap", [(t7, 0, fddi)], linktype=10)

# Token Ring (6): AC 0x10, FC 0x40 (LLC), dst, src (no RIF), LLC/SNAP/IPv4
tr = bytes([0x10, 0x40]) + bytes.fromhex("02000000000b") + \
    bytes.fromhex("02000000000a") + snap_ip
write_pcap("src/test/resources/legacy_tr.pcap", [(t7, 0, tr)], linktype=6)

# ARCNET (7): classic BSD header — source, destination, protocol id
# (0xD4 = RFC 1201 IP); the payload stays opaque at this linktype
arc = bytes([0x01, 0x02, 0xD4]) + b"\x45\x00\x00\x1c"
write_pcap("src/test/resources/legacy_arcnet.pcap", [(t7, 0, arc)], linktype=7)


def ax25_addr(call, ssid, last=False):
    b = bytes((ord(c) << 1) for c in call.ljust(6))
    return b + bytes([0x60 | (ssid << 1) | (1 if last else 0)])


# AX.25 (3): UI frame with APRS-ish text, then a PID 0xCC frame carrying IP
ax1 = ax25_addr("APRS", 0) + ax25_addr("N0CALL", 7, last=True) + \
    bytes([0x03, 0xF0]) + b">Hello from graft"
ax2 = ax25_addr("N0CALL", 1) + ax25_addr("N0CALL", 7, last=True) + \
    bytes([0x03, 0xCC]) + _h9 + _p9
write_pcap("src/test/resources/legacy_ax25.pcap",
           [(t7, 0, ax1), (t7, 100, ax2)], linktype=3)

# Frame Relay (107): Q.922 2-byte address (DLCI 100, EA on the second
# byte), UI control, NLPID 0xCC (IP)
fr = bytes([(100 >> 4) << 2, ((100 & 0xF) << 4) | 0x01, 0x03, 0xCC]) + _h9 + _p9
write_pcap("src/test/resources/legacy_fr.pcap", [(t7, 0, fr)], linktype=107)

# Cisco HDLC (104): address 0x0F (unicast), control 0, ethertype 0x0800
chdlc = bytes([0x0F, 0x00, 0x08, 0x00]) + _h9 + _p9
write_pcap("src/test/resources/legacy_chdlc.pcap", [(t7, 0, chdlc)], linktype=104)

# LAPD (203): SAPI 0 / TEI 5, UI control, then Q.931 SETUP and CONNECT
q931_setup = bytes([0x08, 0x01, 0x42, 0x05])
q931_conn = bytes([0x08, 0x01, 0xC2, 0x07])
lapd1 = bytes([0x00, (5 << 1) | 1, 0x03]) + q931_setup
lapd2 = bytes([0x02, (5 << 1) | 1, 0x03]) + q931_conn
# tier 55: Abis RSL on SAPI 0 — Channel Activation with the channel
# number IE (discriminator 0x08 but a message type no call-ref allows)
rsl = bytes([0x00, (1 << 1) | 1, 0x03]) + bytes([0x08, 0x21, 0x01, 0x08])
write_pcap("src/test/resources/legacy_lapd.pcap",
           [(t7, 0, lapd1), (t7, 100, lapd2), (t7, 200, rsl)], linktype=203)

# LAPB with direction (207): 1-byte direction, address, I-frame control,
# then the X.25 packet layer (Call Request / Call Confirm on LCN 1)
lapb1 = bytes([0x00, 0x01, 0x00]) + bytes([0x10, 0x01, 0x0B])
lapb2 = bytes([0x01, 0x03, 0x20]) + bytes([0x10, 0x01, 0x0F])
write_pcap("src/test/resources/legacy_lapb.pcap",
           [(t7, 0, lapb1), (t7, 100, lapb2)], linktype=207)

# SunATM (123): flags, VPI, VCI (BE), then LLC/SNAP/IPv4 (AAL5 traffic)
atm = bytes([0x00, 1]) + struct.pack(">H", 100) + snap_ip
# tier 55: the signaling VC (VPI 0 / VCI 5) carries SSCOP — a BGN PDU
# whose type nibble sits in the end-aligned trailer (ITU-T Q.2110)
sscop = bytes([0x00, 0]) + struct.pack(">H", 5) + bytes(4) + \
    bytes([0x01, 0x00, 0x00, 0x00])  # trailer word: PDU type nibble 1 = BGN
write_pcap("src/test/resources/legacy_atm.pcap",
           [(t7, 0, atm), (t7, 100, sscop)], linktype=123)

# ---------------------------------------------------------------------------
# Tier 54 — kernel/transport capture linktypes.
t8 = 1700006000

# MTP2 (140): BSN/BIB, FSN/FIB, LI, then the MTP3 MSU the sweep's M3UA
# frames already exercise (SIO 0x83 = SCCP national): routing label + SCCP
mtp3_msu = bytes([0x83]) + bytes([0x34, 0x12, 0x78, 0x56]) + bytes([0x09, 0x00, 0x03])
mtp2 = bytes([0x2A, 0x15, len(mtp3_msu) & 0x3F]) + mtp3_msu
write_pcap("src/test/resources/legacy_mtp2.pcap", [(t8, 0, mtp2)], linktype=140)

# Netlink (253): raw nlmsghdr (LE): len, type (RTM_NEWLINK 16), flags
# (NLM_F_REQUEST 1), seq, pid — then an opaque ifinfomsg payload
nl_payload = bytes(16)
nlmsg = struct.pack("<IHHII", 16 + len(nl_payload), 16, 1, 7, 1234) + nl_payload
write_pcap("src/test/resources/legacy_netlink.pcap", [(t8, 0, nlmsg)], linktype=253)

# vsock (271): af_vsockmon_hdr (LE): src_cid, dst_cid, src_port, dst_port,
# op (2 = RW), transport (1 = VIRTIO), len, then payload
vs = struct.pack("<QQIIHHHH", 3, 2, 1024, 2049, 2, 1, 5, 0) + b"hello"
write_pcap("src/test/resources/legacy_vsock.pcap", [(t8, 0, vs)], linktype=271)

# Linux usbmon (189): 48-byte header (LE): urb id, event type 'S', xfer
# type 2 (bulk), endpoint 0x81 (IN 1), device 5, bus 1, ...
usbmon = struct.pack("<QBBBBHBB", 0xDEADBEEF, ord('S'), 2, 0x81, 5, 1, 0, 0) + \
    struct.pack("<QII", t8, 0, 0) + struct.pack("<IIQ", 4, 0, 0) + b"\x12\x01\x00\x02"
write_pcap("src/test/resources/legacy_usb.pcap", [(t8, 0, usbmon)], linktype=189)

# InfiniBand (247): LRH (8) with LNH=2 (BTH follows), then BTH (12) whose
# first byte is the opcode (0x04 = RC Send Only)
lrh = bytes([0x00, 0x02]) + struct.pack(">HHH", 7, 10, 9)
bth = bytes([0x04, 0x00]) + struct.pack(">H", 0xFFFF) + struct.pack(">I", 0x1234) + \
    struct.pack(">I", 42)
write_pcap("src/test/resources/legacy_ib.pcap", [(t8, 0, lrh + bth + b"\x00" * 8)],
           linktype=247)


# Tier 56 — LoRaTap (linktype 270): v0 15-byte header then the LoRaWAN
# PHYPayload (MHDR 0x00 = Join-Request)
loratap = bytes([0, 0]) + struct.pack(">H", 15) + bytes(11) + \
    bytes([0x00]) + bytes(18)
write_pcap("src/test/resources/lorawan.pcap", [(1700007000, 0, loratap)],
           linktype=270)
