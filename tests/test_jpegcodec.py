"""Unit pins for the vendored baseline-JPEG codec (sources/jpegcodec.py,
written from the public ITU-T T.81 spec).

The round-trip tests are necessarily self-referential (no independent
JPEG implementation ships in this container), so the suite also pins the
spec-derived PARTS independently: Annex K table contents, canonical
Huffman code construction (prefix-freedom, Kraft equality), zig-zag
permutation, amplitude coding (encode/EXTEND inverse pair), and the
DCT basis orthonormality the lossy bound rests on."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aind_hcr_data_transformation_spark.sources.jpegcodec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _amplitude,
    _canonical_codes,
    _category,
    _DCT_C,
    _extend,
    decode_gray,
    encode_gray,
    quant_table,
)


def test_dct_basis_orthonormal():
    np.testing.assert_allclose(_DCT_C @ _DCT_C.T, np.eye(8), atol=1e-12)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-pins (T.81 figure A.6): scan starts 0,1,8,16,9,2 and
    # ends ...55,62,63
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-2:].tolist() == [62, 63]


def test_annex_k_huffman_tables_are_canonical_and_prefix_free():
    for bits, vals in ((DC_LUMA_BITS, DC_LUMA_VALS), (AC_LUMA_BITS, AC_LUMA_VALS)):
        assert sum(bits) == len(vals)
        codes = _canonical_codes(bits, vals)
        # prefix-free: no code is a prefix of a longer one
        as_strings = {f"{c:0{l}b}" for c, l in codes.values()}
        assert len(as_strings) == len(codes)
        for a in as_strings:
            for b in as_strings:
                if a is not b and b.startswith(a):
                    assert a == b
        # Kraft sum < 1 (JPEG reserves the all-ones codes)
        assert sum(2.0 ** -l for _, l in codes.values()) < 1.0


@given(st.integers(min_value=-32767, max_value=32767))
def test_amplitude_extend_roundtrip(v):
    s = _category(v)
    assert _extend(_amplitude(v, s), s) == v


def test_quality_scaling():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import QTABLE_LUMA

    assert np.all(quant_table(100) == 1)  # all-ones: rounding-only loss
    assert np.all(quant_table(50) == QTABLE_LUMA)  # scale 100 → Annex K as-is
    assert np.all(quant_table(10) >= quant_table(90))
    with pytest.raises(ValueError):
        quant_table(0)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_q100_within_2(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_gray(encode_gray(img, quality=100))
    assert dec.shape == img.shape
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 2


def test_lossy_quality_still_close_on_smooth_data():
    y, x = np.mgrid[0:33, 0:47]
    img = ((y * 2 + x * 3) % 256).astype(np.uint8)
    dec = decode_gray(encode_gray(img, quality=75))
    # smooth gradients survive strong quantization (mean, not max —
    # block edges ring)
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 8


def test_rejects_non_jpeg_and_unsupported_frames():
    with pytest.raises(ValueError, match="SOI"):
        decode_gray(b"\x00\x01")
    enc = bytearray(encode_gray(np.zeros((8, 8), np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xCB  # arithmetic lossless: still gated
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_gray(bytes(enc))
    # SOF9/SOF10 route to decode_arith (r11) — a Huffman stream merely
    # RELABELED arithmetic is malformed there, not silently decoded
    # (its DHT segments are not DAC conditioning and its entropy data
    # is not a QM stream; any of several loud errors is acceptable)
    for sof_marker in (0xC9, 0xCA):
        enc = bytearray(encode_gray(np.zeros((8, 8), np.uint8)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = sof_marker
        with pytest.raises((ValueError, NotImplementedError)):
            decode_gray(bytes(enc))
    # SOF3 routes to decode_lossless (r10) — a DCT stream merely
    # RELABELED lossless is malformed there, not silently decoded
    enc = bytearray(encode_gray(np.zeros((8, 8), np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="predictor"):
        decode_gray(bytes(enc))


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_gray(np.zeros((4, 4), np.uint16))
    with pytest.raises(ValueError):
        encode_gray(np.zeros((0, 4), np.uint8))


def test_ff_byte_stuffing_round_trips():
    """An image tuned to emit 0xFF bytes in the entropy stream must
    still decode (stuffed FF00 unstuffed correctly)."""
    rng = np.random.default_rng(3)
    for seed in range(5):
        img = np.random.default_rng(seed).integers(
            0, 256, (24, 24), dtype=np.uint8
        )
        enc = encode_gray(img, quality=100)
        if b"\xff\x00" in enc:
            dec = decode_gray(enc)
            assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 2
            return
    raise AssertionError("no test image produced a stuffed byte")


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_constant_block_family_is_exactly_lossless(seed):
    """Per-block-constant images round-trip BIT-EXACT at quality 100
    (DC = 8·(c−128) is an exact integer; the DC-only IDCT is an exact
    power-of-two division) — the invariant `multimodal_jpeg_decode`'s
    hash-exact oracle rests on."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_gray(encode_gray(img, quality=100))
    np.testing.assert_array_equal(dec, img)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 §B.1.1.2 allows 0xFF fill padding before any marker — other
    encoders emit it; the parser must skip it."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = encode_gray(img)
    # inject two fill bytes before the DQT marker
    dqt = enc.find(b"\xff\xdb")
    padded = enc[:dqt] + b"\xff\xff" + enc[dqt:]
    np.testing.assert_array_equal(decode_gray(padded), decode_gray(enc))


def test_truncated_entropy_segment_raises_valueerror():
    """A scan cut mid-entropy-segment must raise a clean ValueError, not
    a bare IndexError from the bit reader (ADVICE r6)."""
    img = np.arange(4096, dtype=np.uint8).reshape(64, 64)
    enc = encode_gray(img)
    sos = enc.find(b"\xff\xda")
    assert sos > 0
    truncated = enc[: sos + 20]  # header + a few entropy bytes
    with pytest.raises(ValueError, match="truncated JPEG stream"):
        decode_gray(truncated)


def test_standalone_markers_handled_cleanly():
    """TEM (FF01) has no length field and must be skipped; a stray RSTn
    in the header zone is malformed and must raise ValueError instead of
    being parsed as a length-prefixed segment (ADVICE r6)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = encode_gray(img)
    dqt = enc.find(b"\xff\xdb")
    # TEM before DQT: legal standalone marker, decode unchanged
    np.testing.assert_array_equal(
        decode_gray(enc[:dqt] + b"\xff\x01" + enc[dqt:]), decode_gray(enc)
    )
    with pytest.raises(ValueError, match="restart marker"):
        decode_gray(enc[:dqt] + b"\xff\xd3" + enc[dqt:])


def test_dangling_ff_at_scan_end_raises_valueerror():
    """An entropy segment ending exactly on an 0xFF byte must report
    truncation, not IndexError on the lookahead."""
    img = np.full((8, 8), 200, dtype=np.uint8)
    enc = encode_gray(img)
    sos = enc.find(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated|dangling"):
        decode_gray(enc[: sos + 10] + b"\xff")


def test_multimodal_jpeg_twin_byte_exact_on_non_ascii(tmp_path):
    """ADVICE r6: the DuckDB twin tiles characters while Spark tiles
    bytes — parity must not depend on an all-ASCII corpus.  Both sides
    now normalize to printable ASCII first; a corpus with multi-byte
    UTF-8 characters must still hash-match."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aind_hcr_data_transformation_spark.operators.multimodal import (
        MULTIMODAL_JPEG_DECODE_SQL,
        QUERIES,
    )
    from aind_hcr_data_transformation_spark.session import get_spark

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "café naïve résumé",          # 2-byte chars
                "数据 管道 去重",               # 3-byte chars + spaces
                "plain ascii only here",
                "mixed ascii → with 𝄞 arrows",  # incl. 4-byte char
            ],
            "lang": ["fr", "zh", "en", "en"],
            "source": ["s"] * 4,
            "n_chars": [17, 8, 21, 26],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")

    spark = get_spark("test-jpeg-nonascii")
    got = {
        r.doc_id: (r.pix_sum, r.pix_md5)
        for r in QUERIES["multimodal_jpeg_decode"](spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        r[0]: (r[3], r[4])
        for r in con.execute(MULTIMODAL_JPEG_DECODE_SQL).fetchall()
    }
    assert got == want and len(got) == 4


def test_12bit_tables_are_canonical_prefix_free_and_spare_all_ones():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        AC12_BITS,
        AC12_VALS,
        DC12_BITS,
        DC12_VALS,
    )

    for bits, vals, need in (
        (DC12_BITS, DC12_VALS, set(range(16))),
        (
            AC12_BITS,
            AC12_VALS,
            {0x00, 0xF0}
            | {(r << 4) | s for r in range(16) for s in range(1, 15)},
        ),
    ):
        assert sum(bits) == len(vals)
        assert set(vals) == need, "table must cover every 12-bit symbol"
        codes = _canonical_codes(bits, vals)
        lengths = {l for _, l in codes.values()}
        assert len(lengths) == 1  # uniform by construction
        (length,) = lengths
        # all-ones code of the (single) length unused — C.2
        assert ((1 << length) - 1) not in {c for c, _ in codes.values()}
        assert len({c for c, _ in codes.values()}) == len(codes)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    interval=st.integers(0, 7),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property_8bit_any_shape_any_interval(h, w, interval, seed):
    """Quality-100 roundtrip stays within ±2 for ANY image shape
    (including non-multiple-of-8 edges) and any restart interval, and
    restart streams decode identically to their no-restart twin."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    plain = decode_gray(encode_gray(img, 100))
    assert int(np.abs(plain.astype(int) - img.astype(int)).max()) <= 2
    if interval:
        np.testing.assert_array_equal(
            decode_gray(encode_gray(img, 100, restart_interval=interval)),
            plain,
        )


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    interval=st.integers(0, 7),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property_12bit_any_shape_any_interval(h, w, interval, seed):
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_gray12,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 4096, (h, w), dtype=np.uint16)
    plain = decode_gray(encode_gray12(img, 100))
    assert plain.dtype == np.uint16
    assert int(np.abs(plain.astype(int) - img.astype(int)).max()) <= 2
    if interval:
        np.testing.assert_array_equal(
            decode_gray(encode_gray12(img, 100, restart_interval=interval)),
            plain,
        )


def test_progressive_tables_canonical_and_cover_eob_symbols():
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        ACP_BITS,
        ACP_VALS,
    )

    assert sum(ACP_BITS) == len(ACP_VALS)
    need = (
        {r << 4 for r in range(15)}  # EOB1..EOB15 run symbols
        | {0xF0}
        | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    )
    assert set(ACP_VALS) == need
    codes = _canonical_codes(ACP_BITS, ACP_VALS)
    lengths = {l for _, l in codes.values()}
    assert lengths == {8}
    assert 0xFF not in {c for c, _ in codes.values()}  # all-ones unused


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    quality=st.integers(10, 100),
    seed=st.integers(0, 2**31),
)
def test_progressive_equals_sequential_property(h, w, quality, seed):
    """The 6-scan progressive script (DC first/refine, two AC bands each
    first+successive-approximation refine) must reconstruct the EXACT
    coefficient array of the sequential encoding — decoded pixels are
    bit-identical, for any shape and quality."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_gray_progressive,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_gray(encode_gray_progressive(img, quality)),
        decode_gray(encode_gray(img, quality)),
    )


def test_progressive_eobrun_spans_many_blocks():
    """A large flat image makes whole AC bands zero across hundreds of
    blocks — the EOBn run-length symbols (absent from sequential JPEG)
    must round-trip the run count exactly."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        encode_gray_progressive,
    )

    img = np.full((256, 256), 201, np.uint8)
    prog = encode_gray_progressive(img, 50)
    seq = encode_gray(img, 50)
    np.testing.assert_array_equal(decode_gray(prog), decode_gray(seq))
    assert len(prog) < len(seq) + 2000  # EOB runs keep the scans compact
