"""Blockwise (dense-array) windowed-mean downsampling — the Arrow fast
path of SURVEY §2.5 A1 form (2), complementing the relational form in
``operators/downsample.py`` (which is the correctness reference).

Because block z-offsets are chunk-aligned and the chunk is divisible by
the scale factor (128 = 2⁷ — the same alignment the reference relies on,
SURVEY §7 hard-part 4), every input block downsamples independently: a
pure ``mapInPandas`` with zero shuffle. Edge blocks with odd extents get
ceil-edge partial windows (mean over present voxels), matching
``np.ceil(shape/factor)`` level shapes (``czi_to_zarr.py:185-187``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.czi import BLOCK_SCHEMA


def windowed_mean_nd(
    arr: np.ndarray,
    factors: tuple[int, ...],
    preserve_dtype: bool = True,
) -> np.ndarray:
    """Non-overlapping windowed mean with ceil-edge semantics: output
    shape ``ceil(shape/factor)``; partial edge windows average only the
    voxels present; integer dtypes truncate on the way back
    (``preserve_dtype=True`` ≙ xarray_multiscale's ``astype`` cast,
    ``czi_to_zarr.py:446-452``)."""
    if arr.ndim != len(factors):
        raise ValueError(f"rank mismatch: {arr.shape} vs factors {factors}")
    pad = [(0, (-s) % f) for s, f in zip(arr.shape, factors)]
    acc = np.pad(arr.astype(np.float64), pad)
    cnt = np.pad(np.ones(arr.shape, dtype=np.float64), pad)
    newshape = []
    for s, f in zip(acc.shape, factors):
        newshape.extend([s // f, f])
    sum_axes = tuple(range(1, 2 * arr.ndim, 2))
    mean = acc.reshape(newshape).sum(axis=sum_axes) / cnt.reshape(newshape).sum(
        axis=sum_axes
    )
    if preserve_dtype:
        return mean.astype(arr.dtype)
    return mean


def downsample_blocks(
    blocks: DataFrame,
    scale_factor: tuple[int, int, int] = (2, 2, 2),
    block_shape: tuple[int, int, int] = (128, 128, 128),
) -> DataFrame:
    """One pyramid level over block rows (schema
    ``sources.czi.BLOCK_SCHEMA``): each block reduces independently and
    its offsets divide by the factor. No shuffle — wall-clock is one
    scan of the level (the property that makes the cascade cheap at
    100 TB)."""
    for b, f, ax in zip(block_shape, scale_factor, "zyx"):
        if b % f != 0:
            raise ValueError(
                f"block {ax} extent {b} must be divisible by factor {f} so "
                "blocks downsample independently (SURVEY §7 hard-part 4)"
            )
    fz, fy, fx = scale_factor

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in BLOCK_SCHEMA.fields]
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.block, dtype=np.dtype(row.dtype)).reshape(
                    tuple(row.shape)
                )
                tczyx = arr.reshape(arr.shape[-3:])  # t=c=1 fixture geometry
                red = windowed_mean_nd(tczyx, scale_factor, preserve_dtype=True)
                # one frame per block (bounded Arrow batches; see sources/czi.py)
                yield pd.DataFrame(
                    [
                        {
                            "stack_name": row.stack_name,
                            "t": row.t,
                            "c": row.c,
                            "z0": row.z0 // fz,
                            "z1": row.z0 // fz + red.shape[0],
                            "y0": row.y0 // fy,
                            "y1": row.y0 // fy + red.shape[1],
                            "x0": row.x0 // fx,
                            "x1": row.x0 // fx + red.shape[2],
                            "shape": [1, 1, *red.shape],
                            "dtype": row.dtype,
                            "block": red.tobytes(),
                        }
                    ],
                    columns=cols,
                )

    return blocks.mapInPandas(gen, BLOCK_SCHEMA)
