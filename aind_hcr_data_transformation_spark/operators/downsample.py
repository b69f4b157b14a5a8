"""Windowed-mean multiscale downsampling — the reference's one true
aggregation (SURVEY §2.5 A1/A2).

Reference: ``compute_pyramid`` (``czi_to_zarr.py:410-454``) calls
``xarray_multiscale.multiscale(reduction=windowed_mean, scale_factors,
preserve_dtype=True)``: each pyramid level is the mean over non-overlapping
``sz×sy×sx`` windows of the previous level, cast back to the source dtype
(truncating, for integer dtypes). Partial edge windows average only the
voxels present (ceil-shape semantics, ``czi_to_zarr.py:185-187``).

Two Spark forms, both provided:

* :func:`downsample_relational` — ``groupBy(floor(z/s), …).avg()`` — the
  correctness reference; a plain partial+final hash aggregate, shuffles one
  row per output voxel, no halo constraints, works for any factor/extent.
* :func:`downsample_blocks` (in ``operators/blockwise.py``) — Arrow-batched
  numpy reduce per block for the dense-array fast path.

The multi-level cascade (level k+1 from level k, never from level 0 —
``czi_to_zarr.py:623-653``) is :func:`pyramid_relational`, a driver loop
exactly mirroring the reference's per-level read-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Column names of a long-form voxel DataFrame.
VOXEL_COLS = ("z", "y", "x", "v")


def downsample_relational(
    voxels: DataFrame,
    scale_factor: tuple[int, int, int] = (2, 2, 2),
    preserve_dtype: bool = True,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """One pyramid level: non-overlapping windowed mean over (z, y, x).

    ``preserve_dtype=True`` truncates the mean back to integer — matching
    ``xarray_multiscale``'s ``astype`` semantics for non-negative voxels
    (``czi_to_zarr.py:446-452``; SURVEY §7 hard-part 2). Partial edge
    windows (extent not divisible by the factor) hold fewer voxels and
    average only those, which is exactly what the groupBy form computes —
    no halo handling needed (SURVEY §7 hard-part 3/4).

    ``extra_keys`` carries identity columns (stack, t, c) through the
    aggregation, so one call downsamples every stack in a catalog at once.
    """
    sz, sy, sx = scale_factor
    keys = [*extra_keys]
    for name, s in (("z", sz), ("y", sy), ("x", sx)):
        keys.append((F.col(name) / F.lit(s)).cast("int").alias(name))
    agg = F.avg("v")
    if preserve_dtype:
        agg = F.floor(agg).cast("int")
    return voxels.groupBy(*keys).agg(agg.alias("v"))


def pyramid_relational(
    voxels: DataFrame,
    n_levels: int,
    scale_factor: tuple[int, int, int] = (2, 2, 2),
    preserve_dtype: bool = True,
    extra_keys: tuple[str, ...] = (),
    checkpoint_dir: str | None = None,
) -> list[DataFrame]:
    """Full pyramid: levels ``0..n_levels-1``, level k+1 computed from
    level k (cascade, ``czi_to_zarr.py:623-653``) — never recomputed from
    level 0, so total work is a geometric series ~1.14× level-1 cost.

    When ``checkpoint_dir`` is given each level is written to parquet and
    read back before deriving the next — the Spark analog of the
    reference's write-then-``da.from_zarr`` read-back (lineage truncation;
    SURVEY §4 X7). Without it the lazy plans nest, which is fine for the
    few levels a pyramid has.
    """
    levels = [voxels]
    current = voxels
    for lvl in range(1, n_levels):
        current = downsample_relational(
            current, scale_factor, preserve_dtype, extra_keys
        )
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/level={lvl}"
            current.write.mode("overwrite").parquet(path)
            current = current.sparkSession.read.parquet(path)
        levels.append(current)
    return levels
