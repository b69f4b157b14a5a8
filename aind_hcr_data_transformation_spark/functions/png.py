"""Minimal real PNG codec for 8-bit grayscale — stdlib only (struct +
zlib), no PIL/imageio.

This makes the multimodal decode path REAL for one honest format instead
of a stub: PNG is fully specified publicly (RFC 2083 / W3C PNG spec),
its DEFLATE payload is stdlib ``zlib``, and 8-bit non-interlaced
grayscale covers the microscopy/thumbnail shapes this engine moves. The
encoder can emit any of the five standard scanline filters (None, Sub,
Up, Average, Paeth); the decoder reconstructs all five, so
foreign-written files with per-row adaptive filtering decode too.

Scope gates loudly: color types other than grayscale, bit depths other
than 8, and interlacing raise ``NotImplementedError`` naming PIL as the
production codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _filter_line(ftype: int, line: np.ndarray, prev: np.ndarray) -> bytes:
    """Apply PNG filter ``ftype`` to one grayscale scanline (bpp=1)."""
    cur = line.astype(np.int32)
    up = prev.astype(np.int32)
    left = np.concatenate(([0], cur[:-1]))
    ul = np.concatenate(([0], up[:-1]))
    if ftype == 0:
        out = cur
    elif ftype == 1:  # Sub
        out = cur - left
    elif ftype == 2:  # Up
        out = cur - up
    elif ftype == 3:  # Average
        out = cur - (left + up) // 2
    elif ftype == 4:  # Paeth
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        out = cur - pred
    else:
        raise ValueError(f"bad PNG filter {ftype}")
    return bytes([ftype]) + (out & 0xFF).astype(np.uint8).tobytes()


def encode_png_gray8(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a 2-D uint8 array as a real PNG (grayscale, 8-bit,
    non-interlaced), every scanline filtered with ``filter_type``."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"need a 2-D uint8 array, got {arr.dtype}{arr.shape}")
    h, w = arr.shape
    prev = np.zeros(w, dtype=np.uint8)
    lines = []
    for r in range(h):
        lines.append(_filter_line(filter_type, arr[r], prev))
        prev = arr[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray8(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale non-interlaced PNG to a 2-D uint8 array,
    reconstructing any of the five standard scanline filters. CRCs are
    verified; unsupported PNG flavors gate loudly."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if (depth, ctype, interlace) != (8, 0, 0) or comp or filt:
                raise NotImplementedError(
                    f"PNG flavor (depth={depth}, color={ctype}, "
                    f"interlace={interlace}) not decodable here; "
                    "plug PIL/imageio for full PNG support"
                )
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError(f"PNG payload {len(raw)} B, expected {h * (w + 1)}")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    i = 0
    for r in range(h):
        f = raw[i]
        line = np.frombuffer(raw[i + 1 : i + 1 + w], np.uint8).astype(np.int32)
        i += 1 + w
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need the left scan
            rec = np.empty(w, dtype=np.int32)
            left = 0
            for c in range(w):
                up = int(prev[c])
                ul = int(prev[c - 1]) if c else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                left = (int(line[c]) + pred) & 0xFF
                rec[c] = left
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out
