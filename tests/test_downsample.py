"""Windowed-mean downsampling: numpy goldens (FIXTURES.md B2) and
relational-vs-blockwise agreement — pinning SURVEY §7 hard parts 2-4
(dtype truncation, crop-trim edges, block independence)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aind_hcr_data_transformation_spark.operators.blockwise import windowed_mean_nd


def reference_windowed_mean(arr: np.ndarray, f: tuple[int, int, int]) -> np.ndarray:
    """Brute-force oracle: loop over FULL windows only (the crop semantics
    of xarray_multiscale 1.1.0 — dims trimmed to an even multiple of the
    factor), mean in float64, truncate to dtype."""
    out_shape = tuple(s // fi for s, fi in zip(arr.shape, f))
    out = np.zeros(out_shape, dtype=np.float64)
    for z in range(out_shape[0]):
        for y in range(out_shape[1]):
            for x in range(out_shape[2]):
                w = arr[
                    z * f[0] : (z + 1) * f[0],
                    y * f[1] : (y + 1) * f[1],
                    x * f[2] : (x + 1) * f[2],
                ]
                out[z, y, x] = w.mean()
        # truncation applied at the end, like astype
    return out.astype(arr.dtype)


def test_constant_block_is_constant():
    arr = np.full((8, 8, 8), 7, dtype=np.uint16)
    out = windowed_mean_nd(arr, (2, 2, 2))
    assert out.shape == (4, 4, 4)
    assert (out == 7).all()


def test_known_values():
    arr = np.array(
        [[[0, 1], [2, 3]], [[4, 5], [6, 7]]], dtype=np.uint16
    )  # mean = 3.5 → truncates to 3
    out = windowed_mean_nd(arr, (2, 2, 2))
    assert out.shape == (1, 1, 1)
    assert out[0, 0, 0] == 3


def test_crop_edges_drop_partial_windows():
    """Odd extent: the trailing partial window is DROPPED (crop to an even
    multiple of the factor), matching xarray_multiscale 1.1.0's downscale
    trim — NOT averaged short."""
    arr = np.arange(5, dtype=np.uint16).reshape(5, 1, 1)
    out = windowed_mean_nd(arr, (2, 1, 1))
    # windows: (0,1)->0.5->0, (2,3)->2.5->2; element 4 beyond the trim
    np.testing.assert_array_equal(out.ravel(), [0, 2])
    assert out.shape == (2, 1, 1)


def test_crop_bottoms_out_to_empty():
    """A dim smaller than its factor crops to zero size (the pyramid depth
    limit — callers drop the empty block)."""
    assert windowed_mean_nd(np.ones((1, 4), dtype=np.uint16), (2, 2)).shape == (0, 2)


def test_float_no_truncation():
    arr = np.array([[[1.0, 2.0]]], dtype=np.float64)
    out = windowed_mean_nd(arr, (1, 1, 2))
    assert out[0, 0, 0] == 1.5


@settings(max_examples=30, deadline=None)
@given(
    st.tuples(st.integers(1, 9), st.integers(1, 9), st.integers(1, 9)),
    st.sampled_from([(2, 2, 2), (2, 1, 3), (1, 2, 2)]),
)
def test_matches_bruteforce_oracle(shape, factors):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 60000, size=shape, dtype=np.uint16)
    np.testing.assert_array_equal(
        windowed_mean_nd(arr, factors), reference_windowed_mean(arr, factors)
    )


def test_ramp_fixture_golden():
    """FIXTURES.md B2 geometry: Z=40,Y=X=32, chunk 16, v=(z*1000+y*10+x)%65536."""
    from aind_hcr_data_transformation_spark.sources.czi import synthetic_ramp_block

    arr = synthetic_ramp_block(0, 40, 32, 32)
    lvl1 = windowed_mean_nd(arr, (2, 2, 2))
    assert lvl1.shape == (20, 16, 16)
    # closed form away from the modulo wrap: mean of the 8 corner values
    # = v(2z,2y,2x) + (1000+10+1)/2
    assert lvl1[0, 0, 0] == (0 + 1000 + 10 + 1 + 11 + 1001 + 1010 + 1011) // 8
    lvl2 = windowed_mean_nd(lvl1, (2, 2, 2))
    assert lvl2.shape == (10, 8, 8)


@pytest.mark.usefixtures("spark")
def test_relational_matches_blockwise(spark):
    """The groupBy form (correctness reference) and the mapInPandas block
    form agree on the ramp fixture, including cascade truncation."""
    import pandas as pd

    from aind_hcr_data_transformation_spark.operators.blockwise import (
        downsample_blocks,
    )
    from aind_hcr_data_transformation_spark.operators.downsample import (
        downsample_relational,
    )
    from aind_hcr_data_transformation_spark.sources.czi import (
        synthetic_stack_blocks,
    )

    blocks = synthetic_stack_blocks(
        spark, ["s"], z_extent=40, y=32, x=32, block_shape=(16, 16, 16)
    )
    lvl1_blocks = downsample_blocks(blocks, (2, 2, 2), block_shape=(16, 16, 16))
    rows = lvl1_blocks.collect()
    got = np.zeros((20, 16, 16), dtype=np.int64)
    for r in rows:
        arr = np.frombuffer(r.block, dtype=np.dtype(r.dtype)).reshape(r.shape[-3:])
        got[r.z0 : r.z1, r.y0 : r.y1, r.x0 : r.x1] = arr

    # relational twin over the long-form voxels
    zz, yy, xx = np.meshgrid(
        np.arange(40), np.arange(32), np.arange(32), indexing="ij"
    )
    pdf = pd.DataFrame(
        {
            "z": zz.ravel(),
            "y": yy.ravel(),
            "x": xx.ravel(),
            "v": ((zz * 1000 + yy * 10 + xx) % 65536).ravel(),
        }
    )
    voxels = spark.createDataFrame(pdf)
    rel = downsample_relational(voxels, (2, 2, 2), True).collect()
    want = np.zeros((20, 16, 16), dtype=np.int64)
    for r in rel:
        want[r.z, r.y, r.x] = r.v
    np.testing.assert_array_equal(got.astype(np.int64), want)
