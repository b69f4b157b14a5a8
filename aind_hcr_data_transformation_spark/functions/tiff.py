"""Vendored baseline TIFF 6.0 codec (grayscale, uncompressed), written
from the PUBLIC TIFF 6.0 specification — stdlib ``struct`` + numpy only.

Completes the in-container image-decode matrix next to the PNG codec
(``functions/png.py``, stdlib DEFLATE) and the baseline-JPEG codec
(``sources/jpegcodec.py``, ITU-T T.81): TIFF is the lingua franca of
microscopy tooling, and a gray8/gray16 uncompressed reader covers the
overwhelmingly common interchange case. Anything else (LZW/Deflate
compression, RGB, tiles, BigTIFF) raises ``NotImplementedError`` with a
clear message — plug PIL/tifffile for those.

Scope:
* decode: both byte orders (II/MM), 8- or 16-bit grayscale, 1 sample
  per pixel, compression=1 (none), strip-organized (any RowsPerStrip).
* encode: the matching little-endian writer used by tests/fixtures
  (single IFD, spec-ordered tags, strips after the header).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# tag ids (TIFF 6.0 §8)
_WIDTH, _HEIGHT, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP = 262, 273, 277, 278
_STRIP_COUNTS = 279


def encode_tiff_gray(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8/uint16 array as a little-endian baseline TIFF
    (single strip, uncompressed, BlackIsZero)."""
    if img.ndim != 2 or img.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"need 2-D uint8/uint16, got {img.shape} {img.dtype}")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    bits = img.dtype.itemsize * 8
    data = np.ascontiguousarray(img.astype(f"<u{img.dtype.itemsize}")).tobytes()
    strip_offset = 8
    ifd_offset = strip_offset + len(data)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 4, 1, w),
        entry(_HEIGHT, 4, 1, h),
        entry(_BITS, 3, 1, bits),
        entry(_COMPRESSION, 3, 1, 1),
        entry(_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
        entry(_STRIP_OFFSETS, 4, 1, strip_offset),
        entry(_SPP, 3, 1, 1),
        entry(_ROWS_PER_STRIP, 4, 1, h),
        entry(_STRIP_COUNTS, 4, 1, len(data)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    header = struct.pack("<2sHI", b"II", 42, ifd_offset)
    return header + data + ifd


def decode_tiff_gray(data: bytes) -> np.ndarray:
    """Decode an uncompressed grayscale baseline TIFF (II or MM byte
    order, 8- or 16-bit, any strip layout) to a 2-D ndarray."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream (missing II/MM byte order)")
    magic, ifd_offset = struct.unpack_from(f"{bo}HI", data, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF")
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")

    n = struct.unpack_from(f"{bo}H", data, ifd_offset)[0]
    tags: dict[int, list[int]] = {}
    for k in range(n):
        off = ifd_offset + 2 + 12 * k
        tag, typ, count = struct.unpack_from(f"{bo}HHI", data, off)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown field type: spec says skip
        total = size * count
        voff = off + 8 if total <= 4 else struct.unpack_from(f"{bo}I", data, off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # ASCII/RATIONAL fields are irrelevant here
        tags[tag] = list(struct.unpack_from(f"{bo}{count}{fmt}", data, voff))

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if vals is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return vals[0]

    w, h = one(_WIDTH), one(_HEIGHT)
    comp = one(_COMPRESSION, 1)
    if comp != 1:
        raise NotImplementedError(
            f"compressed TIFF (compression={comp}); plug PIL/tifffile"
        )
    if one(_SPP, 1) != 1:
        raise NotImplementedError("multi-sample (color) TIFF")
    bits = one(_BITS, 8)
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit TIFF samples")
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or mismatched")
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    dtype = np.dtype(f"{bo}u{bits // 8}")
    arr = np.frombuffer(raw, dtype=dtype)
    if arr.size != w * h:
        raise ValueError(f"TIFF strips hold {arr.size} px, header says {w * h}")
    return arr.reshape(h, w).astype(f"=u{bits // 8}")
