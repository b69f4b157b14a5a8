"""End-to-end stack → multiscale OME-Zarr conversion — the engine twin of
``ZeissCompressionJob.run_job`` + ``czi_stack_zarr_writer``
(``zeiss_job.py:207-226``, ``czi_to_zarr.py:457-653``), orchestrated as
Spark stages instead of SLURM partitions:

stage 0   block-index DataFrame (all stacks at once — the scheduler
          replaces ``num_of_partitions``/``partition_to_process``)
stage 1   distributed slab read (``mapInPandas``) → level-0 zarr regions
          (``foreachPartition``)
stage k   level k−1 blocks → blockwise windowed mean (no shuffle) →
          level-k zarr regions
finally   OME-NGFF group metadata (omero + multiscales, driver-side)

The reference's per-level write-then-read-back (``czi_to_zarr.py:623-635``,
SURVEY §4 X7) becomes ``persist()`` + unpersist of the previous level:
same lineage truncation, no extra I/O round-trip.
"""

from __future__ import annotations

import math
import os

import numpy as np
from pyspark.sql import SparkSession

from .config import ZarrConversionSettings
from .ome import build_multiscales, build_omero, validate_multiscales
from .operators.blockwise import downsample_blocks
from .sinks.zarr_sink import init_group, write_attrs, write_blocks_to_zarr
from .sources.czi import synthetic_stack_blocks


def dtype_minmax(dtype: str) -> tuple[float, float]:
    """Channel display range from dtype (``czi_to_zarr.py:535-549``):
    integer dtypes use the type's range; floats use finfo."""
    d = np.dtype(dtype)
    if np.issubdtype(d, np.integer):
        info = np.iinfo(d)
        return float(info.min), float(info.max)
    finfo = np.finfo(d)
    return float(finfo.min), float(finfo.max)


def convert_synthetic_stack(
    spark: SparkSession,
    settings: ZarrConversionSettings,
    stack_name: str,
    z_extent: int,
    y: int,
    x: int,
    voxel_size: tuple[float, float, float] = (1.0, 1.0, 1.0),
    origin: tuple[float, float, float] | None = None,
    dtype: str = "uint16",
) -> str:
    """Convert one synthetic stack to a multiscale OME-Zarr group and
    return the group path. (The czifile-backed variant differs only in the
    source call — ``sources.czi.read_blocks(reader="czifile")``.)"""
    cz, cy, cx = settings.chunk_size
    fz, fy, fx = settings.scale_factor
    n_lvls = settings.downsample_levels

    group_path = os.path.join(settings.output_directory, f"{stack_name}.zarr")
    init_group(group_path)

    # ome/ngff metadata first (same order as czi_to_zarr.py:562-576)
    shape5 = (1, 1, z_extent, y, x)
    chunk5 = (1, 1, cz, cy, cx)
    minmax = dtype_minmax(dtype)
    attrs = {
        "omero": build_omero(
            shape5,
            stack_name,
            channel_names=[stack_name],
            channel_minmax=[minmax],
            # fixed display window, czi_to_zarr.py:553-555
            channel_startend=[(0.0, 550.0)],
        ),
        **build_multiscales(
            shape5,
            chunk5,
            stack_name,
            n_lvls,
            (fz, fy, fx),
            voxel_size,
            origin=origin,
        ),
    }
    validate_multiscales(attrs)
    write_attrs(group_path, attrs)

    blocks = synthetic_stack_blocks(
        spark, [stack_name], z_extent, y, x, block_shape=(cz, cy, cx)
    ).persist()
    shape = [1, 1, z_extent, y, x]
    block_lvl = (cz, cy, cx)
    for lvl in range(n_lvls):
        write_blocks_to_zarr(
            blocks,
            os.path.join(group_path, str(lvl)),
            tuple(shape),
            (
                1,
                1,
                min(block_lvl[0], shape[2]),
                min(block_lvl[1], shape[3]),
                min(block_lvl[2], shape[4]),
            ),
            dtype,
            settings.compressor_name,
            settings.compressor_kwargs,
        )
        if lvl == n_lvls - 1:
            break
        nxt = downsample_blocks(blocks, (fz, fy, fx), block_lvl).persist()
        nxt.count()  # materialize before dropping the parent (X7 read-back analog)
        blocks.unpersist()
        blocks = nxt
        shape = [
            1,
            1,
            math.ceil(shape[2] / fz),
            math.ceil(shape[3] / fy),
            math.ceil(shape[4] / fx),
        ]
        block_lvl = (
            max(1, block_lvl[0] // fz),
            max(1, block_lvl[1] // fy),
            max(1, block_lvl[2] // fx),
        )
    blocks.unpersist()
    return group_path
