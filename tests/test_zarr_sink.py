"""Zarr v2 sink round-trip tests (the end-to-end conversion coverage the
reference's mocked tests never had — SURVEY §5 takeaway)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sinks.zarr_sink import (
    init_array,
    init_group,
    read_array,
    write_region,
)


def test_group_layout(tmp_path):
    p = str(tmp_path / "g.zarr")
    init_group(p, attrs={"hello": 1})
    assert json.load(open(f"{p}/.zgroup")) == {"zarr_format": 2}
    assert json.load(open(f"{p}/.zattrs")) == {"hello": 1}


def test_array_roundtrip_exact_chunks(tmp_path):
    p = str(tmp_path / "a")
    data = np.arange(4 * 6, dtype=np.uint16).reshape(4, 6)
    init_array(p, (4, 6), (2, 3), "uint16")
    write_region(p, (0, 0), data)
    np.testing.assert_array_equal(read_array(p), data)
    meta = json.load(open(f"{p}/.zarray"))
    assert meta["dimension_separator"] == "/"
    assert meta["compressor"] == {"id": "zlib", "level": 3}
    assert meta["dtype"] == "<u2"


def test_array_roundtrip_edge_chunks(tmp_path):
    """Edge chunks are stored padded to full chunk shape (zarr v2)."""
    p = str(tmp_path / "a")
    data = np.arange(5 * 7, dtype=np.int32).reshape(5, 7)
    init_array(p, (5, 7), (2, 3), "int32")
    write_region(p, (0, 0), data)
    np.testing.assert_array_equal(read_array(p), data)


def test_region_writes_disjoint(tmp_path):
    """Two chunk-aligned region writes (what concurrent executors do)."""
    p = str(tmp_path / "a")
    init_array(p, (8, 4), (2, 4), "uint16", compressor="none")
    top = np.ones((4, 4), dtype=np.uint16)
    bottom = np.full((4, 4), 7, dtype=np.uint16)
    write_region(p, (0, 0), top)
    write_region(p, (4, 0), bottom)
    out = read_array(p)
    np.testing.assert_array_equal(out[:4], top)
    np.testing.assert_array_equal(out[4:], bottom)


def test_unaligned_region_rejected(tmp_path):
    p = str(tmp_path / "a")
    init_array(p, (8, 8), (4, 4), "uint16")
    with pytest.raises(ValueError):
        write_region(p, (2, 0), np.zeros((4, 8), dtype=np.uint16))
    with pytest.raises(ValueError):
        write_region(p, (0, 0), np.zeros((3, 8), dtype=np.uint16))  # not edge-flush


def test_5d_block_write(tmp_path):
    """The shape the pipeline writes: TCZYX with z-slab regions."""
    p = str(tmp_path / "a")
    init_array(p, (1, 1, 40, 32, 32), (1, 1, 16, 32, 32), "uint16")
    block = np.arange(16 * 32 * 32, dtype=np.uint16).reshape(1, 1, 16, 32, 32)
    write_region(p, (0, 0, 16, 0, 0), block)
    out = read_array(p)
    np.testing.assert_array_equal(out[:, :, 16:32], block)
    assert out[:, :, :16].sum() == 0


def test_recreate_same_url_different_geometry(tmp_path):
    """Regression guard for the stale-meta hazard (r4 VERDICT item 1): an
    array re-created at the SAME URL with DIFFERENT shape/chunks/dtype in
    one session must round-trip voxel-exact. A per-process ``.zarray``
    meta cache would serve the first geometry to the second write on a
    long-lived executor → silent misaligned chunks; the sink instead
    ships the authoritative meta through the task closure (``meta=``) or
    re-reads it fresh per call, so both write paths below see the new
    geometry."""
    p = str(tmp_path / "a")
    # first life: 8x8 array of uint16, 4x4 chunks
    meta1 = init_array(p, (8, 8), (4, 4), "uint16")
    d1 = np.arange(64, dtype=np.uint16).reshape(8, 8)
    write_region(p, (0, 0), d1, meta=meta1)
    np.testing.assert_array_equal(read_array(p), d1)
    # second life at the same URL: different rank-2 geometry AND dtype
    meta2 = init_array(p, (6, 9), (2, 3), "int32")
    assert meta2["chunks"] != meta1["chunks"]
    d2 = np.arange(54, dtype=np.int32).reshape(6, 9) * 7
    # closure path (what distributed tasks use) ...
    write_region(p, (0, 0), d2, meta=meta2)
    np.testing.assert_array_equal(read_array(p), d2)
    # ... and the meta-less path (fresh read per call) must also see the
    # new geometry, not anything cached from the first life
    d3 = d2 + 1
    write_region(p, (0, 0), d3)
    np.testing.assert_array_equal(read_array(p), d3)


def test_blosc_gated_without_numcodecs(tmp_path):
    """Reference-default Blosc (models.py:52-56) is import-gated: without
    numcodecs the sink refuses at array-init time (driver side), naming
    the zlib fallback — never midway through a distributed write."""
    import pytest

    from aind_hcr_data_transformation_spark.sinks.codecs import (
        BLOSC_DEFAULTS,
        make_compressor_meta,
    )

    try:
        import numcodecs  # noqa: F401

        meta = make_compressor_meta("blosc")
        assert meta == {"id": "blosc", **BLOSC_DEFAULTS}
    except ImportError:
        with pytest.raises(NotImplementedError, match="zlib"):
            make_compressor_meta("blosc")
    # reference kwargs shape: cname=zstd, clevel=3, byte shuffle
    assert BLOSC_DEFAULTS["cname"] == "zstd"
    assert BLOSC_DEFAULTS["clevel"] == 3
    assert BLOSC_DEFAULTS["shuffle"] == 1


def test_codec_roundtrip_matrix(tmp_path):
    """Round-trip through every available codec (blosc skips without
    numcodecs)."""
    import numpy as np
    import pytest

    data = np.arange(64, dtype=np.uint16).reshape(8, 8)
    for comp in ("zlib", "zstd", "none", "blosc"):
        p = str(tmp_path / f"arr_{comp}")
        try:
            init_array(p, (8, 8), (4, 4), "uint16", compressor=comp)
        except NotImplementedError:
            assert comp == "blosc"
            continue
        write_region(p, (0, 0), data)
        np.testing.assert_array_equal(read_array(p), data)


def test_zstd_chunks_are_standard_frames(tmp_path):
    """zstd chunks carry numcodecs-standard metadata and decode as plain
    zstd frames with the embedded content size — any zarr v2 client with
    numcodecs' Zstd codec reads them (here: pyarrow itself plays the
    foreign reader, given only the frame and the chunk geometry)."""
    import json

    import numpy as np
    import pyarrow as pa

    p = str(tmp_path / "arr_zstd_meta")
    meta = init_array(p, (4, 4), (4, 4), "uint16", compressor="zstd")
    assert meta["compressor"] == {"id": "zstd", "level": 3}
    assert json.load(open(f"{p}/.zarray"))["compressor"]["id"] == "zstd"
    data = np.arange(16, dtype=np.uint16).reshape(4, 4)
    write_region(p, (0, 0), data)
    raw = pa.Codec("zstd").decompress(
        open(f"{p}/0/0", "rb").read(), decompressed_size=32, asbytes=True
    )
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.uint16).reshape(4, 4), data
    )


def test_region_rewrite_is_idempotent(tmp_path):
    """Speculative execution / task retry safety: re-writing the SAME
    region must be byte-identical on disk and voxel-exact on read — a
    replayed Spark task may overwrite a chunk another attempt already
    committed."""
    import hashlib
    import pathlib

    p = str(tmp_path / "a")
    init_array(p, (8, 8), (4, 4), "uint16", compressor="zstd")
    rng = np.arange(32, dtype=np.uint16).reshape(4, 8)
    write_region(p, (0, 0), rng)
    write_region(p, (4, 0), rng * 3)

    def chunk_digest():
        return {
            f.name: hashlib.md5(f.read_bytes()).hexdigest()
            for f in sorted(pathlib.Path(p).rglob("*"))
            if f.is_file() and not f.name.startswith(".")
        }

    before = chunk_digest()
    write_region(p, (0, 0), rng)  # the retry
    assert chunk_digest() == before
    out = read_array(p)
    np.testing.assert_array_equal(out[:4], rng)
    np.testing.assert_array_equal(out[4:], rng * 3)
