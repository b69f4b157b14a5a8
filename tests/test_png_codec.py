"""The vendored stdlib PNG codec: real-format invariants the oracle
can't see (it only proves the round-trip is lossless)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.functions.png import (
    PNG_SIGNATURE,
    decode_png_gray8,
    encode_png_gray8,
)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ftype):
    """All five standard scanline filters invert exactly — including the
    sequential Sub/Average/Paeth reconstructions."""
    rng = np.random.default_rng(ftype)
    arr = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    png = encode_png_gray8(arr, filter_type=ftype)
    assert png[:8] == PNG_SIGNATURE
    np.testing.assert_array_equal(decode_png_gray8(png), arr)


def test_gradient_compresses_under_paeth():
    """A smooth gradient must compress well under Paeth — evidence the
    filter actually transforms the data, not just tags it."""
    arr = np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8)
    plain = encode_png_gray8(arr, filter_type=0)
    paeth = encode_png_gray8(arr, filter_type=4)
    assert len(paeth) < len(plain)
    np.testing.assert_array_equal(decode_png_gray8(paeth), arr)


def test_crc_corruption_detected():
    arr = np.zeros((4, 4), np.uint8)
    png = bytearray(encode_png_gray8(arr))
    png[20] ^= 0xFF  # flip a byte inside IHDR (after length+tag)
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray8(bytes(png))


def test_unsupported_flavor_gates_loudly():
    """A 16-bit-depth IHDR must raise the documented NotImplementedError
    naming PIL, not misdecode."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_png_gray8(png)


def test_decode_image_dispatch():
    """decode_image: PNG payloads decode for real; a JPEG magic routes
    to the vendored T.81 codec (malformed stream → ITS error, not the
    PIL gate); an unknown magic raises the documented gate."""
    from aind_hcr_data_transformation_spark.operators.multimodal import (
        decode_image,
    )

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    np.testing.assert_array_equal(
        decode_image(encode_png_gray8(arr, filter_type=2)), arr
    )
    with pytest.raises(ValueError):  # the codec's parse error, not the gate
        decode_image(b"\xff\xd8\xff\xe0 not a real jpeg")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"GIF87a not decodable here")


def test_batch_decode_matches_scalar_all_filters():
    """decode_png_gray8_batch must reconstruct exactly what the scalar
    decoder does, per image, across a batch mixing all five filters."""
    from aind_hcr_data_transformation_spark.functions.png import (
        decode_png_gray8_batch,
    )

    rng = np.random.default_rng(42)
    imgs = [rng.integers(0, 256, size=(23, 17), dtype=np.uint8) for _ in range(10)]
    pngs = [
        encode_png_gray8(img, filter_type=f)
        for img, f in zip(imgs, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    ]
    got = decode_png_gray8_batch(pngs)
    assert got.shape == (10, 23, 17)
    for i, png in enumerate(pngs):
        np.testing.assert_array_equal(got[i], decode_png_gray8(png))
        np.testing.assert_array_equal(got[i], imgs[i])


def test_batch_decode_rejects_mixed_dims_and_bad_filter():
    from aind_hcr_data_transformation_spark.functions.png import (
        decode_png_gray8_batch,
    )

    a = encode_png_gray8(np.zeros((4, 4), np.uint8), filter_type=4)
    b = encode_png_gray8(np.zeros((5, 4), np.uint8), filter_type=4)
    with pytest.raises(ValueError, match="same-shape"):
        decode_png_gray8_batch([a, b])
    assert decode_png_gray8_batch([]).size == 0
    # corrupt filter byte (re-CRC'd) must raise like the scalar decoder
    import struct as _s
    import zlib as _z

    arr = np.zeros((2, 3), np.uint8)
    raw = bytearray(b"\x07" + b"\x00" * 3 + b"\x00" + b"\x00" * 3)
    idat = _z.compress(bytes(raw))
    ihdr = _s.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return (
            _s.pack(">I", len(data))
            + tag
            + data
            + _s.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="filter byte"):
        decode_png_gray8_batch([png])
    with pytest.raises(ValueError, match="filter byte"):
        decode_png_gray8(png)
