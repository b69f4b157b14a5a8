"""Arithmetic-coded JPEG (SOF9) — r11, VERDICT r10 task 8: the last
gated DCT flavor, now vendored in ``sources/jpegarith.py``.

Three evidence layers, strongest first:

1. **Cross-decoder vs libjpeg** (both directions) through
   ``tools/jpegref.c``, a tiny libjpeg CLI compiled with gcc at test
   time: streams encoded here decode identically under libjpeg
   (``cinfo.arith_code`` decode path), and arithmetic streams encoded
   BY libjpeg decode here. Gated on gcc + jpeglib.h (present in the
   dev container and the codecs CI leg via libjpeg-dev).
2. **Table D.3 cross-pin**: the transcribed Qe/NMPS/NLPS/SWITCH state
   machine is compared row-for-row against the ``jpeg_aritab`` symbol
   exported by the system libjpeg (ctypes; gated on the shared
   library).
3. **In-container properties** (no external deps): arithmetic and
   Huffman codings of the same image decode bit-identically (both are
   lossless over the same quantized coefficients), round trips across
   qualities/odd sizes/restarts, and loud gates for the still-excluded
   flavors (SOF10/11, 12-bit arithmetic).

Reference parity: the reference reads arithmetic CZI subblocks through
czifile→imagecodecs→libjpeg (reference ``pyproject.toml:25``).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sources.jpegarith import (
    QE_TABLE,
    decode_arith,
    encode_arith,
)
from aind_hcr_data_transformation_spark.sources.jpegcodec import (
    decode_gray,
    decode_image,
    encode_color,
    encode_gray,
)

REPO = Path(__file__).resolve().parent.parent


def _gray(h: int = 48, w: int = 64, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        96.0
        + 80.0 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
        + 40.0 * ((xx // 16 + yy // 16) % 2)
        + rng.normal(0.0, 6.0, (h, w))
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _rgb(h: int = 48, w: int = 64, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = 100 + 70 * np.sin(yy / 8.0) + rng.normal(0, 5, (h, w))
    g = 110 + 60 * np.cos(xx / 10.0) + rng.normal(0, 5, (h, w))
    b = 96 + 48 * ((xx // 16) % 2)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# layer 3: in-container properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quality", [100, 90, 75])
def test_arith_decodes_identically_to_huffman_gray(quality):
    """The entropy coder is lossless over quantized coefficients, so
    the arithmetic and Huffman encodings of the same image must decode
    to the SAME pixels — an exact in-container ground truth that needs
    no external codec."""
    img = _gray()
    arith = decode_arith(encode_arith(img, quality=quality))
    huff = decode_gray(encode_gray(img, quality=quality))
    np.testing.assert_array_equal(arith, huff)


def test_arith_decodes_identically_to_huffman_color():
    img = _rgb(h=45, w=59)  # odd dims: partial MCUs
    arith = decode_arith(encode_arith(img, quality=90))
    huff = decode_image(encode_color(img, quality=90, subsampling="4:4:4"))
    np.testing.assert_array_equal(arith, huff)


def test_arith_restart_intervals_roundtrip():
    """RSTn inside an arithmetic scan: coder flushed and statistics
    reset at each interval (T.81 F.1.4.4 / F.2.4.3) — must still equal
    the Huffman decode, and out-of-sequence markers must be caught."""
    img = _gray(h=40, w=40, seed=11)
    data = encode_arith(img, quality=90, restart_interval=3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    np.testing.assert_array_equal(
        decode_arith(data),
        decode_gray(encode_gray(img, quality=90, restart_interval=3)),
    )


def test_arith_restart_fill_bytes_are_legal():
    """B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Inject runs of fill bytes before every RSTn in an arithmetic scan —
    the decode must be unchanged (r12 advisor fix: restart() used to
    reject the run as 'FFFF')."""
    img = _gray(h=40, w=40, seed=11)
    data = encode_arith(img, quality=90, restart_interval=3)
    padded = bytearray()
    i = 0
    while i < len(data):
        if (
            data[i] == 0xFF
            and i + 1 < len(data)
            and 0xD0 <= data[i + 1] <= 0xD7
        ):
            padded += b"\xff\xff\xff"  # fill run, then the marker itself
        padded.append(data[i])
        i += 1
    np.testing.assert_array_equal(
        decode_arith(bytes(padded)), decode_arith(data)
    )


def test_arith_refine_only_stream_is_loud():
    """A SOF10 stream whose DC FIRST scan was stripped (leaving only
    AC + refine scans) has no established coefficients — it must trip
    the all-scanned truncation check, not decode refined zeros as a
    real image (r12 advisor fix)."""
    from aind_hcr_data_transformation_spark.sources.jpegarith import (
        encode_arith_progressive,
    )

    data = encode_arith_progressive(_gray(16, 16), quality=90)
    first = data.find(b"\xff\xda")
    second = data.find(b"\xff\xda", first + 2)
    assert 0 < first < second
    clipped = data[:first] + data[second:]
    with pytest.raises(ValueError, match="truncated|scanned|undecoded"):
        decode_arith(clipped)


def test_decode_image_routes_sof9():
    img = _gray(h=24, w=24)
    data = encode_arith(img, quality=95)
    np.testing.assert_array_equal(decode_image(data), decode_arith(data))
    np.testing.assert_array_equal(decode_gray(data), decode_arith(data))


def test_relabeled_huffman_stream_is_loud():
    """A Huffman stream with its SOF0 stamped SOF9 must error (the DHT
    segment betrays it), never silently decode to garbage."""
    enc = bytearray(encode_gray(_gray(16, 16), quality=90))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="Huffman tables"):
        decode_arith(bytes(enc))


def test_remaining_arithmetic_flavors_still_gate():
    """SOF11 (arithmetic lossless) keeps an actionable refusal; 12-bit
    arithmetic likewise (no independent encoder to pin either)."""
    enc = bytearray(encode_arith(_gray(16, 16), quality=90))
    sof = enc.find(b"\xff\xc9")
    enc2 = bytearray(enc)
    enc2[sof + 1] = 0xCB
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_image(bytes(enc2))
    enc12 = bytearray(enc)
    enc12[sof + 4] = 12  # precision byte of the SOF payload
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_arith(bytes(enc12))


# ---------------------------------------------------------------------------
# arithmetic PROGRESSIVE (SOF10, Annex G.2 model over the Annex D coder)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quality", [100, 90, 75])
def test_arith_progressive_equals_sequential_gray(quality):
    """The 4-scan successive-approximation script carries the same
    quantized coefficients as the sequential arithmetic encoding —
    decoded pixels bit-identical, pinning every progressive scan kind
    (DC first/refine, AC first/refine) against in-repo ground truth."""
    from aind_hcr_data_transformation_spark.sources.jpegarith import (
        encode_arith_progressive,
    )

    img = _gray()
    seq = decode_arith(encode_arith(img, quality=quality))
    prog = decode_arith(encode_arith_progressive(img, quality=quality))
    np.testing.assert_array_equal(seq, prog)


def test_arith_progressive_equals_sequential_color_odd_dims():
    from aind_hcr_data_transformation_spark.sources.jpegarith import (
        encode_arith_progressive,
    )

    img = _rgb(h=45, w=59)
    seq = decode_arith(encode_arith(img, quality=90))
    prog = decode_arith(encode_arith_progressive(img, quality=90))
    np.testing.assert_array_equal(seq, prog)
    np.testing.assert_array_equal(
        decode_image(encode_arith_progressive(img, quality=90)), prog
    )


def test_libjpeg_decodes_our_arith_progressive(jpegref):
    from aind_hcr_data_transformation_spark.sources.jpegarith import (
        encode_arith_progressive,
    )

    img = _gray(h=61, w=77, seed=17)
    data = encode_arith_progressive(img, quality=90)
    assert b"\xff\xca" in data
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        "our prog-arith gray vs libjpeg",
    )
    rgb = _rgb(h=45, w=59, seed=19)
    data = encode_arith_progressive(rgb, quality=92)
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        "our prog-arith color vs libjpeg", maxdiff=3,
    )


@pytest.mark.parametrize("quality", [95, 80])
def test_we_decode_libjpeg_arith_progressive(jpegref, quality):
    """libjpeg's DEFAULT progressive script under arithmetic coding —
    banded spectral selection (1-5/6-63), successive approximation to
    Al=2, interleaved DC scans: a far richer scan mix than this repo's
    encoder emits."""
    img = _gray(h=61, w=77, seed=11)
    data = _ref_encode_prog(jpegref, img, quality)
    assert b"\xff\xca" in data  # really arithmetic progressive
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        f"libjpeg prog-arith gray q{quality} through ours",
    )


def test_we_decode_libjpeg_arith_progressive_color(jpegref):
    img = _rgb(h=45, w=59, seed=9)
    data = _ref_encode_prog(jpegref, img, 92)
    assert b"\xff\xca" in data
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        "libjpeg prog-arith color through ours", maxdiff=3,
    )


def test_encoder_validates_input():
    with pytest.raises(ValueError, match="uint8"):
        encode_arith(np.zeros((8, 8), np.uint16))
    with pytest.raises(ValueError, match="restart"):
        encode_arith(np.zeros((8, 8), np.uint8), restart_interval=-1)


# ---------------------------------------------------------------------------
# layer 2: Table D.3 cross-pin against the system libjpeg
# ---------------------------------------------------------------------------


def test_qe_table_matches_system_libjpeg():
    libname = ctypes.util.find_library("jpeg")
    if not libname:
        pytest.skip("no system libjpeg to cross-pin Table D.3 against")
    lib = ctypes.CDLL(libname)
    try:
        raw = (ctypes.c_long * 114).in_dll(lib, "jpeg_aritab")
    except ValueError:
        pytest.skip("libjpeg build does not export jpeg_aritab")
    theirs = [
        ((v >> 16) & 0xFFFF, (v >> 8) & 0xFF, v & 0x7F, (v >> 7) & 1)
        for v in raw
    ]
    assert list(QE_TABLE) == theirs


# ---------------------------------------------------------------------------
# layer 1: cross-decoder conformance via a compiled libjpeg CLI
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def jpegref(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler for the libjpeg reference CLI")
    exe = tmp_path_factory.mktemp("jpegref") / "jpegref"
    build = subprocess.run(
        [cc, "-O2", "-o", str(exe), str(REPO / "tools" / "jpegref.c"),
         "-ljpeg"],
        capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"jpegref build failed (no libjpeg-dev?): "
                    f"{build.stderr[-300:]}")
    return str(exe)


def _ref_decode(exe: str, data: bytes) -> np.ndarray:
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(data)
        inp = f.name
    out = inp + ".raw"
    try:
        subprocess.run([exe, "decode", inp, out], check=True,
                       capture_output=True)
        hdr, raw = Path(out).read_bytes().split(b"\n", 1)
        w, h, nc = map(int, hdr.split())
        a = np.frombuffer(raw, np.uint8)
        return a.reshape(h, w) if nc == 1 else a.reshape(h, w, nc)
    finally:
        for p in (inp, out):
            Path(p).unlink(missing_ok=True)


def _ref_encode(exe: str, img: np.ndarray, quality: int) -> bytes:
    ncomp = 1 if img.ndim == 2 else img.shape[2]
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(img.tobytes())
        inp = f.name
    out = inp + ".jpg"
    try:
        subprocess.run(
            [exe, "encode", inp, str(img.shape[1]), str(img.shape[0]),
             str(ncomp), str(quality), "1", out],
            check=True,
            capture_output=True,
        )
        return Path(out).read_bytes()
    finally:
        for p in (inp, out):
            Path(p).unlink(missing_ok=True)


def _ref_encode_prog(exe: str, img: np.ndarray, quality: int) -> bytes:
    ncomp = 1 if img.ndim == 2 else img.shape[2]
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(img.tobytes())
        inp = f.name
    out = inp + ".jpg"
    try:
        subprocess.run(
            [exe, "encode", inp, str(img.shape[1]), str(img.shape[0]),
             str(ncomp), str(quality), "1", out, "1"],
            check=True,
            capture_output=True,
        )
        return Path(out).read_bytes()
    finally:
        for p in (inp, out):
            Path(p).unlink(missing_ok=True)


def _assert_idct_close(
    a: np.ndarray, b: np.ndarray, what: str, maxdiff: int = 2
) -> None:
    assert a.shape == b.shape, f"{what}: {a.shape} vs {b.shape}"
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= maxdiff and float((diff > 1).mean()) < 0.01, (
        f"{what}: decoders disagree beyond IDCT rounding "
        f"(max |diff|={diff.max()})"
    )


@pytest.mark.parametrize("quality", [100, 90, 75])
def test_libjpeg_decodes_our_arith_gray(jpegref, quality):
    img = _gray()
    data = encode_arith(img, quality=quality)
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        f"our arith gray q{quality} vs libjpeg",
    )


def test_libjpeg_decodes_our_arith_restarts(jpegref):
    img = _gray(h=41, w=53, seed=13)  # odd dims + restarts
    data = encode_arith(img, quality=90, restart_interval=3)
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        "our arith + RSTn vs libjpeg",
    )


def test_libjpeg_decodes_our_arith_color(jpegref):
    img = _rgb()
    data = encode_arith(img, quality=92)
    # ±3: float-IDCT-vs-islow rounding compounds through the fixed-
    # point color conversion on a small fraction of pixels
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        "our arith color vs libjpeg", maxdiff=3,
    )


@pytest.mark.parametrize("quality", [95, 80])
def test_we_decode_libjpeg_arith_gray(jpegref, quality):
    """The reverse direction: genuine libjpeg SOF9 output (its own
    adaptive statistics trajectory) through our decoder."""
    img = _gray(h=61, w=77, seed=11)
    data = _ref_encode(jpegref, img, quality)
    assert b"\xff\xc9" in data  # really arithmetic-coded
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        f"libjpeg arith gray q{quality} through ours",
    )


def test_we_decode_libjpeg_arith_color(jpegref):
    img = _rgb(h=45, w=59, seed=9)
    data = _ref_encode(jpegref, img, 92)
    assert b"\xff\xc9" in data
    _assert_idct_close(
        _ref_decode(jpegref, data), decode_arith(data),
        "libjpeg arith color through ours", maxdiff=3,
    )


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
