"""Multi-component / subsampled JPEG (r10, VERDICT task 2): the last
two vendored-codec matrix rows, flipped from "raises" to "decodes
here". Round-trip property pins for ``encode_color``/``decode_image``
(``sources/jpegcodec.py``): 3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0,
interleaved and per-component scans, restart intervals, odd dims.

Reference parity cite: the reference decodes these through
czifile+imagecodecs (reference ``pyproject.toml:25``,
``compress/czi_to_zarr.py:517``); cross-decoder conformance against a
real libjpeg runs in the codecs CI leg (test_jpeg_crossdecoder.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sources.jpegcodec import (
    _rgb_to_ycc,
    _ycc_to_rgb,
    decode_image,
    encode_color,
    encode_gray,
)


def _rgb(h: int = 40, w: int = 56, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = 100 + 60 * np.sin(yy / 7.0) + rng.normal(0, 5, (h, w))
    g = 120 + 50 * np.cos(xx / 9.0) + rng.normal(0, 5, (h, w))
    b = 90 + 40 * np.sin((xx + yy) / 11.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def test_color_transform_pair_is_tight():
    """RGB→YCbCr→RGB alone (no DCT) is within ±2: pins both transforms
    before any codec loss enters."""
    img = _rgb()
    back = _ycc_to_rgb(*(p.astype(np.int64) for p in _rgb_to_ycc(img)))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_444_roundtrip_q100_is_near_lossless():
    """4:4:4 at q100: only color-transform (±2) and coefficient
    rounding (±2) remain."""
    img = _rgb()
    dec = decode_image(encode_color(img, quality=100, subsampling="4:4:4"))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


@pytest.mark.parametrize("sub", ["4:2:2", "4:2:0"])
def test_subsampled_roundtrip_fidelity(sub):
    """Chroma subsampling is lossy by design; on a natural-statistics
    image the luma must stay DCT-tight and the chroma error bounded."""
    img = _rgb()
    dec = decode_image(encode_color(img, quality=100, subsampling=sub))
    assert dec.shape == img.shape
    y0, *_ = _rgb_to_ycc(img)
    y1, *_ = _rgb_to_ycc(dec)
    assert np.abs(y1.astype(int) - y0.astype(int)).max() <= 5, "luma drifted"
    d = np.abs(dec.astype(int) - img.astype(int))
    assert d.max() <= 24 and d.mean() < 4.0, (d.max(), d.mean())


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_noninterleaved_scans_decode_identically(sub):
    """Per-component scans carry the same coefficients as the
    interleaved scan — decoded pixels must be bit-identical."""
    img = _rgb()
    a = decode_image(encode_color(img, 90, sub, interleaved=True))
    b = decode_image(encode_color(img, 90, sub, interleaved=False))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("interleaved", [True, False])
def test_restart_intervals_are_inert_in_color(interleaved):
    img = _rgb()
    a = decode_image(
        encode_color(img, 90, "4:2:0", interleaved=interleaved)
    )
    b = decode_image(
        encode_color(
            img, 90, "4:2:0", restart_interval=2, interleaved=interleaved
        )
    )
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("dims", [(37, 33), (16, 16), (17, 16), (8, 9)])
def test_odd_dimensions_all_subsamplings(dims):
    """Partial MCUs on the right/bottom edges at every sampling
    geometry — the classic off-by-one surface."""
    h, w = dims
    img = _rgb(h, w, seed=11)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        dec = decode_image(encode_color(img, 95, sub))
        assert dec.shape == (h, w, 3), (sub, dec.shape)
        y0, *_ = _rgb_to_ycc(img)
        y1, *_ = _rgb_to_ycc(dec)
        assert np.abs(y1.astype(int) - y0.astype(int)).max() <= 6, sub


def test_decode_image_delegates_single_component():
    """decode_image on a grayscale stream returns decode_gray's 2-D
    output — one public entry point covers the whole matrix."""
    g = _rgb()[:, :, 0].copy()
    dec = decode_image(encode_gray(g, quality=100))
    assert dec.ndim == 2 and dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


def test_flat_color_is_exact_after_roundtrip():
    """A flat color field has one nonzero coefficient per block — any
    indexing/predictor bug shows up as block seams."""
    img = np.full((32, 48, 3), (200, 64, 120), dtype=np.uint8)
    dec = decode_image(encode_color(img, 100, "4:2:0"))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_unknown_subsampling_and_bad_input_raise():
    img = _rgb()
    with pytest.raises(ValueError, match="subsampling"):
        encode_color(img, subsampling="4:1:1?")
    with pytest.raises(ValueError, match="uint8"):
        encode_color(img.astype(np.uint16))


def test_inconsistent_nf_still_rejected():
    """A SOF that claims more components than its header carries is
    malformed — rejected, never silently decoded (this was the old
    CMYK gate probe; CMYK itself now decodes, below)."""
    data = bytearray(encode_color(_rgb(), 90))
    # find SOF0 and bump Nf (body offset 5)
    import struct

    pos = 2
    while pos < len(data):
        marker = data[pos + 1]
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        if marker == 0xC0:
            data[pos + 4 + 5] = 4
            break
        pos += 2 + ln
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(bytes(data))


# ---------------------------------------------------------------------------
# CMYK / YCCK (r11, VERDICT r10 task 2) + Adobe transform resolution
# ---------------------------------------------------------------------------


def _cmyk(h: int = 24, w: int = 35, seed: int = 5) -> np.ndarray:
    """Blocky CMYK field: 8×8-constant regions keep q=100 DCT loss at
    the rounding floor so round-trip asserts can be tight."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (-(-h // 8), -(-w // 8), 4)).astype(float)
    return np.kron(base, np.ones((8, 8, 1)))[:h, :w].round().astype(np.uint8)


def test_cmyk_ycck_roundtrip():
    """Adobe transform=2 (YCCK): inverted-CMY YCbCr + passthrough K —
    the layout libjpeg writes for JCS_YCCK input."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_cmyk,
    )

    img = _cmyk()
    out = decode_image(encode_cmyk(img, 100, transform=2))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_cmyk_raw_roundtrip_is_exact_on_blocks():
    """Adobe transform=0 stores CMYK planes directly: no color
    transform in the loop, so blocky input survives q=100 exactly."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_cmyk,
    )

    img = _cmyk(32, 40, seed=11)
    out = decode_image(encode_cmyk(img, 100, transform=0))
    np.testing.assert_array_equal(out, img)


def test_cmyk_without_adobe_marker_defaults_to_raw():
    """No APP14 on a 4-component frame → raw CMYK (libjpeg's
    default_decompress_parms default)."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_cmyk,
    )

    img = _cmyk(16, 16, seed=2)
    data = bytearray(encode_cmyk(img, 100, transform=0))
    # strip the APP14 segment (SOI + APP14 is the head of our layout)
    import struct

    assert data[2:4] == b"\xff\xee"
    ln = struct.unpack_from(">H", data, 4)[0]
    del data[2 : 4 + ln]
    np.testing.assert_array_equal(decode_image(bytes(data)), img)


def test_cmyk_invalid_transform_rejected():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_cmyk,
    )

    with pytest.raises(ValueError, match="transform"):
        encode_cmyk(_cmyk(), transform=1)
    # a stream claiming YCbCr (1) on 4 components is contradictory
    data = bytearray(encode_cmyk(_cmyk(16, 16), 100, transform=0))
    assert data[2:4] == b"\xff\xee"
    data[2 + 4 + 11] = 1  # transform byte inside the APP14 body
    with pytest.raises(ValueError, match="4-component"):
        decode_image(bytes(data))


def test_rgb_passthrough_component_ids():
    """3-component frame with ids R,G,B and no Adobe/JFIF hint decodes
    as stored RGB (libjpeg jdmarker id heuristic) — pinned by building
    the stream from raw per-channel planes."""
    import struct

    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        _AC_ENC,
        _DC_ENC,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        ZIGZAG,
        _BitWriter,
        _enc_seq_block,
        _quantized_zigzag,
        quant_table,
    )

    img = _cmyk(16, 24, seed=9)[..., :3]  # blocky → exact at q=100
    h, w = img.shape[:2]
    q = quant_table(100)
    comps = [
        (cid, _quantized_zigzag(img[..., i], 8, 100, q=q))
        for i, cid in enumerate((0x52, 0x47, 0x42))
    ]

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0x00]) + bytes(q[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, _zz in comps:
        sof += bytes([cid, 0x11, 0])
    out += seg(0xFFC0, sof)
    out += seg(
        0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    )
    out += seg(
        0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    )
    bw = _BitWriter()
    preds = {cid: 0 for cid, _ in comps}
    for m in range((h // 8) * (w // 8)):
        for cid, zz in comps:
            preds[cid] = _enc_seq_block(bw, zz[m], preds[cid], _DC_ENC, _AC_ENC)
    out += seg(
        0xFFDA,
        bytes([3]) + b"".join(bytes([cid, 0]) for cid, _ in comps)
        + bytes([0, 63, 0]),
    )
    out += bw.flush()
    out += b"\xff\xd9"
    np.testing.assert_array_equal(decode_image(bytes(out)), img)


# ---------------------------------------------------------------------------
# 12-bit 3-component color (r11, VERDICT r10 task 3)
# ---------------------------------------------------------------------------


def test_color12_roundtrip():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color12,
    )

    rng = np.random.default_rng(13)
    base = rng.integers(0, 4096, (3, 4, 3)).astype(float)
    img = np.kron(base, np.ones((8, 8, 1)))[:21, :27].round().astype(np.uint16)
    out = decode_image(encode_color12(img, 100))
    assert out.shape == img.shape and out.dtype == np.uint16
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_color12_flat_field_tight():
    """A flat 12-bit field isolates the CENTERJSAMPLE=2048 conversion
    pair from DCT loss."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color12,
    )

    img = np.full((16, 16, 3), (3000, 512, 2048), dtype=np.uint16)
    out = decode_image(encode_color12(img, 100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_color12_range_and_dtype_validated():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color12,
    )

    with pytest.raises(ValueError, match="4095"):
        encode_color12(np.full((8, 8, 3), 5000, dtype=np.uint16))
    with pytest.raises(ValueError, match="uint16"):
        encode_color12(np.zeros((8, 8, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# progressive color (r10: the multi-component progressive row)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_progressive_color_equals_sequential(sub):
    """The 8-scan progressive script (interleaved DC first+refine,
    per-component AC first+refine) carries the same coefficient array
    as the sequential encoding — decoded pixels are bit-identical, so
    every scan type of the multi-component progressive decoder is
    pinned against an independent in-repo ground truth."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color_progressive,
    )

    img = _rgb()
    seq = decode_image(encode_color(img, 90, sub))
    prog = decode_image(encode_color_progressive(img, 90, sub))
    np.testing.assert_array_equal(seq, prog)


def test_progressive_color_odd_dims_partial_mcus():
    """4:2:0 progressive with partial MCUs: the interleaved DC scan
    walks the PADDED MCU grid while the AC scans walk each component's
    UNPADDED raster — the index-mapping seam this pins."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color_progressive,
    )

    img = _rgb(37, 33, seed=11)
    seq = decode_image(encode_color(img, 95, "4:2:0"))
    prog = decode_image(encode_color_progressive(img, 95, "4:2:0"))
    np.testing.assert_array_equal(seq, prog)


def test_progressive_color_roundtrip_quality():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color_progressive,
    )

    img = _rgb()
    dec = decode_image(encode_color_progressive(img, 100, "4:4:4"))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
