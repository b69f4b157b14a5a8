"""Unit pins for the vendored baseline TIFF codec (functions/tiff.py,
written from the public TIFF 6.0 spec) and its decode_image routing."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aind_hcr_data_transformation_spark.functions.tiff import (
    decode_tiff_gray,
    encode_tiff_gray,
)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    wide=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_lossless(h, w, wide, seed):
    rng = np.random.default_rng(seed)
    if wide:
        img = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    else:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_tiff_gray(encode_tiff_gray(img))
    assert dec.dtype == img.dtype
    np.testing.assert_array_equal(dec, img)


def test_big_endian_and_multistrip_decode():
    """A hand-built MM (big-endian), two-strip file decodes — the layout
    our little-endian single-strip writer never produces, pinning the
    reader against the spec rather than against the writer."""
    img = np.arange(48, dtype=np.uint16).reshape(6, 8) * 1000
    rows = img.astype(">u2").tobytes()
    strip1, strip2 = rows[: 3 * 16], rows[3 * 16 :]
    # layout: header(8) strip1 strip2 offsets-array counts-array ifd
    o1, o2 = 8, 8 + len(strip1)
    arrays_off = o2 + len(strip2)
    counts_off = arrays_off + 8
    ifd_off = counts_off + 8

    def entry(tag, typ, count, value):
        if typ == 3 and count == 1:
            # SHORT values are LEFT-justified in the 4-byte field (TIFF
            # 6.0 §2: "the value is left-justified within the 4 bytes")
            return struct.pack(">HHIHH", tag, typ, count, value, 0)
        return struct.pack(">HHII", tag, typ, count, value)

    entries = [
        entry(256, 4, 1, 8),
        entry(257, 4, 1, 6),
        entry(258, 3, 1, 16),
        entry(259, 3, 1, 1),
        entry(262, 3, 1, 1),
        entry(273, 4, 2, arrays_off),
        entry(277, 3, 1, 1),
        entry(278, 4, 1, 3),
        entry(279, 4, 2, counts_off),
    ]
    blob = (
        struct.pack(">2sHI", b"MM", 42, ifd_off)
        + strip1
        + strip2
        + struct.pack(">II", o1, o2)
        + struct.pack(">II", len(strip1), len(strip2))
        + struct.pack(">H", len(entries))
        + b"".join(entries)
        + struct.pack(">I", 0)
    )
    np.testing.assert_array_equal(decode_tiff_gray(blob), img)


def test_gates_are_loud():
    img = np.zeros((4, 4), np.uint8)
    enc = bytearray(encode_tiff_gray(img))
    # rewrite the compression entry's value (tag 259) to 5 (LZW)
    i = enc.find(struct.pack("<HH", 259, 3))
    enc[i + 8] = 5
    with pytest.raises(NotImplementedError, match="compression=5"):
        decode_tiff_gray(bytes(enc))
    with pytest.raises(ValueError, match="byte order"):
        decode_tiff_gray(b"PK\x03\x04")
    with pytest.raises(ValueError):
        encode_tiff_gray(np.zeros((2, 2), np.float32))


def test_decode_image_routes_all_three_codecs():
    from aind_hcr_data_transformation_spark.functions.png import encode_png_gray8
    from aind_hcr_data_transformation_spark.operators.multimodal import decode_image
    from aind_hcr_data_transformation_spark.sources.jpegcodec import encode_gray

    img = (np.arange(256, dtype=np.uint8).reshape(16, 16) * 3 % 256).astype(
        np.uint8
    )
    np.testing.assert_array_equal(decode_image(encode_png_gray8(img)), img)
    np.testing.assert_array_equal(decode_image(encode_tiff_gray(img)), img)
    jp = decode_image(encode_gray(img, quality=100))
    assert np.max(np.abs(jp.astype(int) - img.astype(int))) <= 2
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x00\x01\x02\x03")
