"""MaxMind DB (.mmdb) — pure-python reader + tiny fixture writer.

The geoip processor (reference: geoip-processor/.../GeoIPProcessor.java:
34,71-92) resolves IPs against a MaxMind database.  Neither the geoip2
library nor a GeoLite2 file ships in this container, but the MMDB FILE
FORMAT ITSELF is public and simple (maxmind.github.io/MaxMind-DB — a
bit-trie over IP prefixes + a typed data section + metadata), so this
module implements:

  - :class:`MMDBReader` — full data-type decoder (pointer, utf8,
    double, bytes, uint16/32/64, int32, map, array, boolean, float) and
    the binary-search-tree walk for IPv4 (24/28/32-bit records);
  - :func:`build_mmdb` — a fixture writer (IPv4, record_size 24,
    disjoint networks) so the real decode path is testable end-to-end
    without shipping any proprietary database.

The reader is the production path: operators/enrich.geoip broadcasts
the db bytes and walks lookups inside an Arrow-batched UDF, one reader
per executor — exactly the reference's Reader-per-worker wiring.
"""

from __future__ import annotations

import ipaddress
import struct

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = 16  # zero bytes between tree and data section


# ---------------------------------------------------------------- reader

class MMDBReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        m = buf.rfind(_METADATA_MARKER)
        if m < 0:
            raise ValueError("not an MMDB file (metadata marker missing)")
        meta, _ = self._decode(m + len(_METADATA_MARKER), base=0)
        self.meta = meta
        self.node_count = int(meta["node_count"])
        self.record_size = int(meta["record_size"])
        self.ip_version = int(meta["ip_version"])
        self.tree_bytes = self.node_count * self.record_size * 2 // 8
        self.data_start = self.tree_bytes + _DATA_SEPARATOR

    # -- data section ----------------------------------------------------
    def _decode(self, i: int, base: int | None = None):
        """Decode one field at absolute offset *i*; pointers resolve
        relative to the data section (*base* overrides for metadata)."""
        b = self.buf
        ctrl = b[i]
        i += 1
        typ = ctrl >> 5
        if typ == 0:  # extended
            typ = b[i] + 7
            i += 1
        size = ctrl & 0x1F
        if typ == 1:  # pointer — size bits are SSVVV
            ss = (ctrl >> 3) & 0x3
            vvv = ctrl & 0x7
            if ss == 0:
                ptr = (vvv << 8) | b[i]
                i += 1
            elif ss == 1:
                ptr = ((vvv << 16) | (b[i] << 8) | b[i + 1]) + 2048
                i += 2
            elif ss == 2:
                ptr = ((vvv << 24) | int.from_bytes(b[i : i + 3], "big")) + 526336
                i += 3
            else:
                ptr = int.from_bytes(b[i : i + 4], "big")
                i += 4
            target = (self.data_start if base is None else base) + ptr
            val, _ = self._decode(target, base=base)
            return val, i
        if size == 29:
            size = 29 + b[i]
            i += 1
        elif size == 30:
            size = 285 + int.from_bytes(b[i : i + 2], "big")
            i += 2
        elif size == 31:
            size = 65821 + int.from_bytes(b[i : i + 3], "big")
            i += 3
        if typ == 2:  # utf8
            return b[i : i + size].decode("utf-8"), i + size
        if typ == 3:  # double
            return struct.unpack(">d", b[i : i + 8])[0], i + 8
        if typ == 4:  # bytes
            return bytes(b[i : i + size]), i + size
        if typ in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(b[i : i + size], "big"), i + size
        if typ == 7:  # map
            out = {}
            for _ in range(size):
                k, i = self._decode(i, base=base)
                v, i = self._decode(i, base=base)
                out[k] = v
            return out, i
        if typ == 8:  # int32
            return int.from_bytes(b[i : i + size], "big", signed=True), i + size
        if typ == 11:  # array
            arr = []
            for _ in range(size):
                v, i = self._decode(i, base=base)
                arr.append(v)
            return arr, i
        if typ == 14:  # boolean — size IS the value
            return bool(size), i
        if typ == 15:  # float
            return struct.unpack(">f", b[i : i + 4])[0], i + 4
        raise ValueError(f"unsupported MMDB type {typ}")

    # -- search tree -----------------------------------------------------
    def _record(self, node: int, right: bool) -> int:
        rs = self.record_size
        if rs == 24:
            off = node * 6 + (3 if right else 0)
            return int.from_bytes(self.buf[off : off + 3], "big")
        if rs == 28:
            off = node * 7
            mid = self.buf[off + 3]
            if right:
                return ((mid & 0x0F) << 24) | int.from_bytes(
                    self.buf[off + 4 : off + 7], "big"
                )
            return ((mid & 0xF0) << 20) | int.from_bytes(
                self.buf[off : off + 3], "big"
            )
        if rs == 32:
            off = node * 8 + (4 if right else 0)
            return int.from_bytes(self.buf[off : off + 4], "big")
        raise ValueError(f"unsupported record_size {rs}")

    def lookup(self, ip: str):
        """Record dict for *ip*, or None when the tree has no data for
        it.  IPv4 addresses search a v6 tree under ::ffff:0:0/96 like
        the official readers."""
        addr = ipaddress.ip_address(ip)
        bits = 32 if addr.version == 4 else 128
        x = int(addr)
        if self.ip_version == 6 and addr.version == 4:
            bits = 128  # v4-mapped position in the v6 tree
        elif self.ip_version == 4 and addr.version == 6:
            return None
        node = 0
        for i in range(bits - 1, -1, -1):
            node = self._record(node, bool((x >> i) & 1))
            if node >= self.node_count:
                break
        if node == self.node_count:
            return None
        val, _ = self._decode(
            self.data_start + (node - self.node_count - _DATA_SEPARATOR)
        )
        return val


# ---------------------------------------------------------------- writer

def _enc_field(v) -> bytes:
    if isinstance(v, bool):
        return bytes([(0 << 5) | (1 if v else 0), 14 - 7])
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return _ctrl(2, len(raw)) + raw
    if isinstance(v, float):
        return _ctrl(3, 8) + struct.pack(">d", v)
    if isinstance(v, int):
        if v < 0:
            return bytes([0x04, 8 - 7]) + struct.pack(">i", v)
        raw = v.to_bytes((v.bit_length() + 7) // 8, "big") if v else b""
        if v < (1 << 16):
            return _ctrl(5, len(raw)) + raw
        if v < (1 << 32):
            return _ctrl(6, len(raw)) + raw
        return bytes([(0 << 5) | len(raw), 9 - 7]) + raw
    if isinstance(v, dict):
        out = _ctrl(7, len(v))
        for k, vv in v.items():
            out += _enc_field(str(k)) + _enc_field(vv)
        return out
    if isinstance(v, (list, tuple)):
        out = bytes([0 << 5 | len(v), 11 - 7])
        for vv in v:
            out += _enc_field(vv)
        return out
    raise TypeError(f"unsupported fixture value type {type(v)}")


def _ctrl(typ: int, size: int) -> bytes:
    if size < 29:
        return bytes([(typ << 5) | size])
    if size < 29 + 256:
        return bytes([(typ << 5) | 29, size - 29])
    raise ValueError("fixture sizes stay tiny")


def build_mmdb(
    networks: list[tuple[str, dict]],
    database_type: str = "GeoLite2-City",
) -> bytes:
    """Fixture writer: disjoint IPv4 CIDRs + record dicts → a valid
    .mmdb byte string (record_size 24, ip_version 4, no data dedup).
    Round-trips through :class:`MMDBReader` and through the official
    readers' documented format."""
    # data section: serialize each record, remember offsets
    data = b""
    offsets = []
    for _, rec in networks:
        offsets.append(len(data))
        data += _enc_field(rec)
    # search tree: insert each prefix; leaves are ('d', idx) markers
    nodes: list[list] = [[None, None]]
    for idx, (cidr, _) in enumerate(networks):
        net = ipaddress.ip_network(cidr)
        if net.version != 4:
            raise ValueError("fixture writer is IPv4-only")
        x, plen = int(net.network_address), net.prefixlen
        node = 0
        for i in range(plen):
            bit = (x >> (31 - i)) & 1
            if i == plen - 1:
                nodes[node][bit] = ("d", idx)
            else:
                nxt = nodes[node][bit]
                if nxt is None:
                    nodes.append([None, None])
                    nxt = len(nodes) - 1
                    nodes[node][bit] = nxt
                elif isinstance(nxt, tuple):
                    raise ValueError("networks must be disjoint")
                node = nxt
    node_count = len(nodes)
    tree = b""
    for left, right in nodes:
        rec = []
        for r in (left, right):
            if r is None:
                rec.append(node_count)  # no data
            elif isinstance(r, tuple):
                rec.append(node_count + _DATA_SEPARATOR + offsets[r[1]])
            else:
                rec.append(r)
        tree += rec[0].to_bytes(3, "big") + rec[1].to_bytes(3, "big")
    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": 0,
        "database_type": database_type,
        "description": {"en": "deterministic test fixture"},
        "ip_version": 4,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": 24,
    }
    return (
        tree + b"\x00" * _DATA_SEPARATOR + data
        + _METADATA_MARKER + _enc_field(meta)
    )
