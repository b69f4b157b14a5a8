"""The production ``czifile`` slab-read branch (S5/S6), executed in
pytest against a monkeypatched ``czifile`` module — the codec is absent
in this container, but the subblock filter / sort / assemble logic
(mirroring reference ``utils/utils.py:284-395``) is pure Python over the
czifile API surface and pins exactly:

* z-range filtering on ``sb.start[axes.index("Z")]`` (half-open [z0, z1))
* arrival-order independence (directory supplied scrambled)
* ``np.squeeze`` of singleton subblock dims before stacking
* z-sorted stacking into a (z1-z0, Y, X) slab
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sources.czi import (
    _read_slab_czifile,
    synthetic_ramp_block,
)

Y, X = 8, 6
NZ = 10
AXES = "BCZYX0"  # czifile-style axes string; Z at index 2


class _FakeSegment:
    def __init__(self, plane: np.ndarray):
        self._plane = plane

    def data(self) -> np.ndarray:
        # czifile returns the full-axes shape with singleton B/C/0 dims
        return self._plane.reshape(1, 1, 1, *self._plane.shape, 1)


class _FakeSubblock:
    def __init__(self, z: int, plane: np.ndarray):
        # start is per-axis offsets in AXES order
        self.start = (0, 0, z, 0, 0, 0)
        self._plane = plane

    def data_segment(self) -> _FakeSegment:
        return _FakeSegment(self._plane)


class _FakeCziFile:
    """Context-manager stand-in for czifile.CziFile over the ramp stack."""

    axes = AXES

    def __init__(self, path: str):
        self.path = path
        planes = [synthetic_ramp_block(z, z + 1, 0, Y, 0, X)[0] for z in range(NZ)]
        blocks = [_FakeSubblock(z, planes[z]) for z in range(NZ)]
        # scrambled directory order: the reader must sort by z itself
        self.filtered_subblock_directory = [blocks[i] for i in (7, 2, 9, 0, 4, 1, 8, 3, 6, 5)]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture()
def fake_czifile(monkeypatch):
    mod = types.ModuleType("czifile")
    mod.CziFile = _FakeCziFile
    monkeypatch.setitem(sys.modules, "czifile", mod)
    return mod


def test_slab_filter_sort_assemble(fake_czifile):
    slab = _read_slab_czifile("/fake/stack.czi", 3, 7)
    golden = synthetic_ramp_block(3, 7, 0, Y, 0, X)
    assert slab.shape == (4, Y, X)
    np.testing.assert_array_equal(slab, golden)


def test_slab_full_range(fake_czifile):
    slab = _read_slab_czifile("/fake/stack.czi", 0, NZ)
    np.testing.assert_array_equal(slab, synthetic_ramp_block(0, NZ, 0, Y, 0, X))


def test_slab_excludes_out_of_range(fake_czifile):
    """Half-open [z0, z1): plane z1 itself never appears."""
    slab = _read_slab_czifile("/fake/stack.czi", 8, 9)
    assert slab.shape == (1, Y, X)
    np.testing.assert_array_equal(slab[0], synthetic_ramp_block(8, 9, 0, Y, 0, X)[0])


def test_missing_codec_falls_back_to_vendored_reader(monkeypatch, tmp_path):
    """Without the czifile package the branch transparently uses the
    vendored ZISRAW reader (tests/test_zisraw.py covers it in depth)."""
    from aind_hcr_data_transformation_spark.sources.zisraw import write_czi

    monkeypatch.setitem(sys.modules, "czifile", None)
    path = str(tmp_path / "s.czi")
    write_czi(
        path, {z: synthetic_ramp_block(z, z + 1, 0, Y, 0, X)[0] for z in range(3)}
    )
    slab = _read_slab_czifile(path, 0, 3)
    np.testing.assert_array_equal(slab, synthetic_ramp_block(0, 3, 0, Y, 0, X))
