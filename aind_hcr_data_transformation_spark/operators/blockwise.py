"""Blockwise (dense-array) windowed-mean downsampling — the Arrow fast
path of SURVEY §2.5 A1 form (2), complementing the relational form in
``operators/downsample.py`` (which is the correctness reference).

Because block z-offsets are chunk-aligned and the chunk is divisible by
the scale factor (128 = 2⁷ — the same alignment the reference relies on,
SURVEY §7 hard-part 4), every input block downsamples independently: a
pure ``mapInPandas`` with zero shuffle. Edge blocks with odd extents are
TRIMMED to an even multiple of the factor before the windowed reshape —
the crop semantics of the reference's pinned ``xarray_multiscale==1.1.0``
(its ``downscale`` slices each dim to ``(s // f) * f`` because the
reshape-based ``windowed_mean`` requires exact divisibility), so level
shapes follow ``floor(shape/factor)`` and edge voxels beyond the last
full window are dropped, exactly as the reference writes them.  (The
reference's *metadata* chunk recurrence uses ``np.ceil``,
``czi_to_zarr.py:185-187`` — a reference-internal inconsistency mirrored
faithfully in ``ome.py``, which keeps the ceil clamp.)

Because block offsets are multiples of the base chunk (divisible by the
factor), per-block trimming of the final edge block equals the global
trim — no halo exchange needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.czi import BLOCK_SCHEMA


def windowed_mean_nd(
    arr: np.ndarray,
    factors: tuple[int, ...],
    preserve_dtype: bool = True,
) -> np.ndarray:
    """Non-overlapping windowed mean with crop semantics: each dim is
    trimmed to ``(s // f) * f`` before the windowed reshape, so the output
    shape is ``floor(shape/factor)`` and voxels beyond the last full
    window are dropped — matching ``xarray_multiscale==1.1.0``'s
    ``downscale`` (reference ``czi_to_zarr.py:446-452``).  Integer dtypes
    truncate on the way back (``preserve_dtype=True`` ≙ the ``astype``
    cast).  A dim smaller than its factor crops to zero — callers drop
    such empty outputs (the pyramid has bottomed out on that dim)."""
    if arr.ndim != len(factors):
        raise ValueError(f"rank mismatch: {arr.shape} vs factors {factors}")
    trimmed = arr[tuple(slice(0, (s // f) * f) for s, f in zip(arr.shape, factors))]
    newshape = []
    for s, f in zip(trimmed.shape, factors):
        newshape.extend([s // f, f])
    mean_axes = tuple(range(1, 2 * arr.ndim, 2))
    mean = trimmed.astype(np.float64).reshape(newshape).mean(axis=mean_axes)
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
                if red.size == 0:
                    # an edge block thinner than the factor crops away
                    # entirely (global floor(shape/f) excludes it)
                    continue
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


def coalesce_blocks(
    blocks: DataFrame,
    chunk: tuple[int, int, int],
) -> DataFrame:
    """Re-tile block rows onto a ``chunk``-aligned grid: every output row
    covers one target chunk, assembled from the sub-blocks that fall
    inside it.

    Why: a 2×-downsampled 128³ block is 64³, but the reference writes
    EVERY pyramid level with the constant base chunk (``create_dataset(
    chunks=final_chunksize)``, ``czi_to_zarr.py:630-640``) — without
    re-tiling, chunk shape would halve per level (16³, 8³ at deep
    levels: a small-file explosion at production scale). One groupBy on
    target chunk coordinates per level restores the base layout; the
    shuffle moves only the downsampled level (≤ 1/8 of its parent).

    Requires input offsets aligned to a divisor of ``chunk`` (true for
    factor-downsampled chunk-aligned blocks), so each sub-block lands in
    exactly one target chunk.
    """
    cz, cy, cx = chunk

    keyed = blocks.withColumns(
        {
            "tz": (F.col("z0") - (F.col("z0") % cz)).cast("int"),
            "ty": (F.col("y0") - (F.col("y0") % cy)).cast("int"),
            "tx": (F.col("x0") - (F.col("x0") % cx)).cast("int"),
        }
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        z_base = int(pdf["tz"].iloc[0])
        y_base = int(pdf["ty"].iloc[0])
        x_base = int(pdf["tx"].iloc[0])
        ez = int(pdf["z1"].max()) - z_base
        ey = int(pdf["y1"].max()) - y_base
        ex = int(pdf["x1"].max()) - x_base
        dtype = np.dtype(pdf["dtype"].iloc[0])
        out = np.zeros((ez, ey, ex), dtype=dtype)
        for row in pdf.itertuples(index=False):
            sub = np.frombuffer(row.block, dtype=dtype).reshape(
                tuple(row.shape)[-3:]
            )
            out[
                row.z0 - z_base : row.z1 - z_base,
                row.y0 - y_base : row.y1 - y_base,
                row.x0 - x_base : row.x1 - x_base,
            ] = sub
        return pd.DataFrame(
            [
                {
                    "stack_name": pdf["stack_name"].iloc[0],
                    "t": int(pdf["t"].iloc[0]),
                    "c": int(pdf["c"].iloc[0]),
                    "z0": z_base,
                    "z1": z_base + ez,
                    "y0": y_base,
                    "y1": y_base + ey,
                    "x0": x_base,
                    "x1": x_base + ex,
                    "shape": [1, 1, ez, ey, ex],
                    "dtype": str(dtype),
                    "block": out.tobytes(),
                }
            ]
        )

    return keyed.groupBy("stack_name", "t", "c", "tz", "ty", "tx").applyInPandas(
        assemble, BLOCK_SCHEMA
    )
