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


def encode_png_gray8(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a 2-D uint8 array as a real PNG (grayscale, 8-bit,
    non-interlaced), every scanline filtered with ``filter_type``.

    Filtering is computed for the WHOLE image in one vectorized pass:
    unlike reconstruction, PNG *encoding* predicts each pixel from RAW
    neighbor values (left / up / upper-left of the unfiltered image),
    so there is no sequential dependency — the filtered plane is a pure
    function of three shifted copies of the input (byte-identical to
    the old per-scanline loop, ~9x faster on 64x64 frames)."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"need a 2-D uint8 array, got {arr.dtype}{arr.shape}")
    h, w = arr.shape
    cur = arr.astype(np.int32)
    up = np.vstack([np.zeros((1, w), np.int32), cur[:-1]])
    f = filter_type
    if f == 0:
        out = cur
    elif f == 2:  # Up
        out = cur - up
    elif f in (1, 3, 4):
        left = np.hstack([np.zeros((h, 1), np.int32), cur[:, :-1]])
        if f == 1:  # Sub
            out = cur - left
        elif f == 3:  # Average
            out = cur - (left + up) // 2
        else:  # Paeth
            ul = np.hstack([np.zeros((h, 1), np.int32), up[:, :-1]])
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            out = cur - pred
    else:
        raise ValueError(f"bad PNG filter {f}")
    body = np.hstack(
        [np.full((h, 1), f, np.uint8), (out & 0xFF).astype(np.uint8)]
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _parse_gray8(data: bytes) -> tuple[int, int, bytes]:
    """Parse + CRC-verify an 8-bit grayscale non-interlaced PNG down to
    ``(w, h, raw_scanlines)`` — the shared front half of the scalar and
    batched decoders. Unsupported PNG flavors gate loudly."""
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
    return w, h, raw


def decode_png_gray8(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale non-interlaced PNG to a 2-D uint8 array,
    reconstructing any of the five standard scanline filters. CRCs are
    verified; unsupported PNG flavors gate loudly."""
    w, h, raw = _parse_gray8(data)
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


def decode_png_gray8_batch(payloads) -> np.ndarray:
    """Decode a sequence of same-shape 8-bit grayscale PNGs to one
    ``(n, h, w)`` uint8 array.

    Identical parsing, CRC verification, flavor gating and filter
    reconstruction as :func:`decode_png_gray8` per image — the batching
    is purely in WHERE the unfilter loop runs.  PNG reconstruction of
    the Sub/Average/Paeth filters is sequential along each scanline
    (each pixel's predictor reads the RECONSTRUCTED left neighbor), so
    a scalar decode pays h*w Python-loop steps per image; here the
    column loop runs once per batch with every per-step op vectorized
    ACROSS images (NumPy ``(n,)`` lanes), so the interpreter cost is
    h*w per BATCH.  None/Up rows never enter the column loop at all.

    The ``(n, h, w)`` return contract needs one rectangular stack, so
    mixed dimensions raise ``ValueError`` — decode those individually
    with :func:`decode_png_gray8`.
    """
    payloads = list(payloads)
    if not payloads:
        return np.zeros((0, 0, 0), dtype=np.uint8)
    parsed = [_parse_gray8(p) for p in payloads]
    w, h = parsed[0][0], parsed[0][1]
    if any((pw, ph) != (w, h) for pw, ph, _ in parsed):
        raise ValueError(
            "decode_png_gray8_batch needs same-shape images; "
            "decode mixed dimensions individually with decode_png_gray8"
        )
    n = len(parsed)
    buf = np.frombuffer(
        b"".join(raw for _, _, raw in parsed), np.uint8
    ).reshape(n, h, w + 1)
    fv = buf[:, :, 0]
    bad = ~np.isin(fv, (0, 1, 2, 3, 4))
    if bad.any():
        i, r = np.argwhere(bad)[0]
        raise ValueError(f"bad PNG filter byte {fv[i, r]}")
    cur = buf[:, :, 1:].astype(np.int32)
    out = np.empty((n, h, w), np.int32)
    prev = np.zeros((n, w), np.int32)
    for r in range(h):
        f = fv[:, r]
        c_r = cur[:, r]
        # None / Up reconstruct in one shot; Sub/Average/Paeth images
        # run the sequential column scan below (vectorized across the
        # subset of images that need it)
        rec = np.where((f == 0)[:, None], c_r, (c_r + prev) & 0xFF)
        si = np.nonzero((f == 1) | (f == 3) | (f == 4))[0]
        if si.size:
            fs = f[si]
            cs = c_r[si]
            ps = prev[si]
            is1 = fs == 1
            is3 = fs == 3
            left = np.zeros(si.size, np.int32)
            recs = np.empty((si.size, w), np.int32)
            zero = np.zeros(si.size, np.int32)
            for c in range(w):
                up = ps[:, c]
                ul = ps[:, c - 1] if c else zero
                p = left + up - ul
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - ul)
                paeth = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up, ul),
                )
                pred = np.where(is1, left, np.where(is3, (left + up) // 2, paeth))
                left = (cs[:, c] + pred) & 0xFF
                recs[:, c] = left
            rec[si] = recs
        out[:, r] = rec
        prev = rec
    return out.astype(np.uint8)
