"""Lossless JPEG (SOF3, T.81 Annex H) — r10: Huffman DPCM over the
seven spatial predictors, the flavor DICOM-class scientific writers
emit. Round trips are BIT-EXACT by definition of the mode, so every
test asserts array equality, not tolerance.

Reference parity cite: the reference decodes these through
czifile+imagecodecs (reference ``pyproject.toml:25``); cross-decoder
conformance against imagecodecs' Cornell LJPEG decoder runs in the
codecs CI leg (test_jpeg_crossdecoder.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sources.jpegcodec import (
    decode_gray,
    decode_image,
    decode_lossless,
    encode_gray_lossless,
)


def _img8(h: int = 23, w: int = 31, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = (40 * np.sin(yy / 5.0) + 50 * np.cos(xx / 7.0) + 128).astype(
        np.int64
    )
    return np.clip(
        smooth + rng.integers(-20, 21, (h, w)), 0, 255
    ).astype(np.uint8)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_all_predictors_roundtrip_exact_uint8(predictor):
    img = _img8()
    data = encode_gray_lossless(img, predictor=predictor)
    np.testing.assert_array_equal(decode_lossless(data), img)


def test_uint16_full_range_roundtrip_exact():
    """16-bit DPCM exercises the mod-2^16 difference arithmetic and the
    SSSS=16 no-extra-bits symbol (diff exactly 32768)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, size=(19, 17), dtype=np.uint16)
    data = encode_gray_lossless(img, predictor=4)
    dec = decode_lossless(data)
    assert dec.dtype == np.uint16
    np.testing.assert_array_equal(dec, img)


def test_12bit_precision_roundtrip_exact():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    data = encode_gray_lossless(img, predictor=7, precision=12)
    np.testing.assert_array_equal(decode_lossless(data), img)


def test_restart_intervals_roundtrip_exact():
    """Sample-counted restarts mid-row: each interval re-enters the
    start-of-scan prediction state (H.2.1.3)."""
    img = _img8(11, 13, seed=9)
    plain = encode_gray_lossless(img, predictor=4)
    rst = encode_gray_lossless(img, predictor=4, restart_interval=29)
    assert len(rst) > len(plain)  # RSTn markers actually emitted
    np.testing.assert_array_equal(decode_lossless(rst), img)
    np.testing.assert_array_equal(decode_lossless(plain), img)


def test_point_transform_roundtrips_shifted_samples():
    img = _img8()
    data = encode_gray_lossless(img, predictor=4, point_transform=2)
    dec = decode_lossless(data)
    np.testing.assert_array_equal(
        dec, (img.astype(np.int64) >> 2 << 2).astype(np.uint8)
    )


def test_decode_gray_and_decode_image_route_sof3():
    img = _img8()
    data = encode_gray_lossless(img, predictor=2)
    np.testing.assert_array_equal(decode_gray(data), img)
    np.testing.assert_array_equal(decode_image(data), img)


def test_single_column_and_single_row_edges():
    for shape in ((1, 9), (9, 1), (1, 1)):
        img = _img8(*shape, seed=3)
        data = encode_gray_lossless(img, predictor=4)
        np.testing.assert_array_equal(decode_lossless(data), img)


def test_encoder_rejects_bad_inputs():
    img = _img8()
    with pytest.raises(ValueError, match="predictor"):
        encode_gray_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="uint8"):
        encode_gray_lossless(img.astype(np.float32))
    with pytest.raises(ValueError, match="precision"):
        encode_gray_lossless(
            np.full((4, 4), 4096, np.uint16), precision=12
        )


def test_decoder_rejects_multi_component_lossless():
    data = bytearray(encode_gray_lossless(_img8()))
    sof = data.find(b"\xff\xc3")
    data[sof + 4 + 5] = 3  # Nf byte inside the SOF3 body
    with pytest.raises((ValueError, NotImplementedError)):
        decode_lossless(bytes(data))
