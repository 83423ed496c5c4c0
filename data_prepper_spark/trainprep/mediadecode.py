"""Real metadata-level media decode — pure-python header parsers.

The container has no image/audio libraries, but the CONTAINER FORMATS
are frozen public specs, so header-level decode (dimensions, color
info, frame/sample counts, EXIF presence) is implementable from scratch
— the same move as the OTLP wire walker (operators/otel.py), the MMDB
bit-trie reader (sources/mmdb.py) and the Avro OCF codec
(sources/avro_codec.py).  Pixel/sample decode (the part that genuinely
needs libjpeg/libpng/ffmpeg) remains out of scope; everything a
training-data pipeline filters on at the metadata level (dims, aspect,
frame counts, duration, format mix) is real here.

Formats:
  PNG   (RFC 2083 / W3C): 8-byte signature, IHDR chunk → width, height
        (big-endian u32), bit depth, color type.
  JPEG  (ITU T.81 + JFIF/EXIF): marker walk to the first SOF0/1/2/…
        frame header → height, width, components; EXIF presence = an
        APP1 segment starting "Exif\\0\\0".
  GIF   (GIF87a/89a): logical screen descriptor → width, height
        (little-endian u16); full block walk counting image descriptors
        → n_frames (animation frame count).
  WAV   (RIFF): fmt chunk → channels, sample_rate, bits; data chunk →
        n_frames = data_bytes / block_align.

Reference analog: binary enters the reference only at codec boundaries
(s3-source/.../S3ObjectWorker.java:89-96, compressed bytes → events);
this is that boundary generalized to media blobs, as SURVEY §2's
training-pipeline extension requires.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers that carry frame dimensions (C0-CF except C4 DHT, C8 JPG,
# CC DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def sniff(payload: bytes) -> str | None:
    """Container format from magic bytes, or None if unknown."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def _decode_png(b: bytes) -> dict:
    # first chunk must be IHDR: len(4) type(4) data(13) crc(4) at offset 8
    if len(b) < 33 or b[12:16] != b"IHDR":
        raise ValueError("png: missing IHDR")
    w, h = struct.unpack(">II", b[16:24])
    bit_depth, color_type = b[24], b[25]
    return {"format": "png", "width": int(w), "height": int(h),
            "bit_depth": int(bit_depth), "color_type": int(color_type),
            "n_frames": 1, "channels": None, "sample_rate": None,
            "exif_present": False}


def _decode_jpeg(b: bytes) -> dict:
    exif = False
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("jpeg: lost marker sync")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        if marker == 0xE1 and b[i + 4:i + 10] == b"Exif\x00\x00":
            exif = True
        if marker in _JPEG_SOF:
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return {"format": "jpeg", "width": int(w), "height": int(h),
                    "bit_depth": int(b[i + 4]),
                    "color_type": int(b[i + 9]),  # component count
                    "n_frames": 1, "channels": None, "sample_rate": None,
                    "exif_present": exif}
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            break
        i += 2 + seg_len
    raise ValueError("jpeg: no SOF frame header")


def _gif_skip_subblocks(b: bytes, i: int) -> int:
    while i < len(b):
        sz = b[i]
        i += 1
        if sz == 0:
            return i
        i += sz
    raise ValueError("gif: unterminated sub-blocks")


def _decode_gif(b: bytes) -> dict:
    if len(b) < 13:
        raise ValueError("gif: truncated screen descriptor")
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    i = 13
    if flags & 0x80:  # global color table: 3·2^(depth+1) bytes
        i += 3 * (2 << (flags & 0x07))
    frames = 0
    while i < len(b):
        blk = b[i]
        if blk == 0x3B:  # trailer
            break
        if blk == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > len(b):
                raise ValueError("gif: truncated image descriptor")
            lflags = b[i + 9]
            i += 10
            if lflags & 0x80:  # local color table
                i += 3 * (2 << (lflags & 0x07))
            i += 1  # LZW minimum code size
            i = _gif_skip_subblocks(b, i)
        elif blk == 0x21:  # extension: label byte then sub-blocks
            i = _gif_skip_subblocks(b, i + 2)
        else:
            raise ValueError(f"gif: unknown block 0x{blk:02x}")
    return {"format": "gif", "width": int(w), "height": int(h),
            "bit_depth": ((flags >> 4) & 0x07) + 1, "color_type": None,
            "n_frames": frames, "channels": None, "sample_rate": None,
            "exif_present": False}


def _decode_wav(b: bytes) -> dict:
    i = 12
    n = len(b)
    channels = rate = bits = block_align = None
    data_bytes = None
    while i + 8 <= n:
        cid = b[i:i + 4]
        sz = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt ":
            channels, rate = struct.unpack("<HI", b[i + 10:i + 16])
            block_align = struct.unpack("<H", b[i + 20:i + 22])[0]
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif cid == b"data":
            data_bytes = sz
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if channels is None or data_bytes is None:
        raise ValueError("wav: missing fmt/data chunk")
    frames = data_bytes // block_align if block_align else 0
    return {"format": "wav", "width": None, "height": None,
            "bit_depth": int(bits), "color_type": None,
            "n_frames": int(frames), "channels": int(channels),
            "sample_rate": int(rate), "exif_present": False}


_DECODERS = {"png": _decode_png, "jpeg": _decode_jpeg,
             "gif": _decode_gif, "wav": _decode_wav}


def decode_media(payload: bytes) -> dict:
    """Header-level decode of a media blob.  Raises ValueError on an
    unknown signature or a structurally corrupt header — the honest
    decode boundary (route failures to the DLQ, operators/dlq.py)."""
    fmt = sniff(payload)
    if fmt is None:
        raise ValueError("unknown media signature")
    return _DECODERS[fmt](payload)


# ------------------------------------------------- deterministic fixtures

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def make_png(width: int, height: int, bit_depth: int = 8,
             color_type: int = 2) -> bytes:
    """Structurally valid PNG (signature + IHDR + IEND, real CRCs)."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")


def make_jpeg(width: int, height: int, exif: bool = False) -> bytes:
    out = b"\xff\xd8"  # SOI
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    if exif:
        ex = b"Exif\x00\x00" + b"II*\x00\x08\x00\x00\x00\x00\x00"
        out += b"\xff\xe1" + struct.pack(">H", 2 + len(ex)) + ex
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    return out + b"\xff\xd9"  # EOI


def make_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    out = b"GIF89a" + struct.pack("<HH", width, height) + bytes([0x70, 0, 0])
    for _ in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0])        # no local color table
        out += bytes([2])        # LZW min code size
        out += bytes([1, 0x44, 0])  # one 1-byte data sub-block + terminator
    return out + b"\x3b"


def make_wav(n_frames: int, channels: int = 1, sample_rate: int = 8000,
             bits: int = 16) -> bytes:
    block_align = channels * bits // 8
    data = bytes(n_frames * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
