"""OME-NGFF (v0.4) metadata builders — pure functions emitting the JSON
documents an OME-Zarr consumer expects (SURVEY §2.2 K5).

Interop-critical semantics restated from the reference:

* omero block — ``_build_ome`` (``czi_to_zarr.py:32-100``): per-channel
  rendering entries with 6-digit-hex colors and window min/max, defaults
  derived from shape; ``defaultZ`` is the middle section.
* per-level coordinate transformations — ``_compute_scales``
  (``czi_to_zarr.py:103-199``): level-k scale = voxel_size ×
  scale_factor^k on (Z,Y,X), 1.0 on (T,C); chunk options clamped per level
  to the ceil-downsampled shape.
* 5-D axes — ``_get_axes_5d`` (``czi_to_zarr.py:202-223``).
* origin cascade — ``_downscale_origin`` (``czi_to_zarr.py:226-279``):
  each level's origin shifts by ``voxel_size · (factor − 1) / 2`` (the
  center of the first window), then voxel size multiplies by the factor.
* multiscales document — ``write_ome_ngff_metadata``
  (``czi_to_zarr.py:282-363``) + pyramid provenance
  ``_get_pyramid_metadata`` (``czi_to_zarr.py:392-407``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

OME_NGFF_VERSION = "0.4"


def build_omero(
    data_shape: Sequence[int],
    image_name: str,
    channel_names: list[str] | None = None,
    channel_colors: list[int] | None = None,
    channel_minmax: list[tuple[float, float]] | None = None,
    channel_startend: list[tuple[float, float]] | None = None,
) -> dict[str, Any]:
    """omero rendering metadata for a 5-D TCZYX dataset
    (``czi_to_zarr.py:32-100``)."""
    n_channels = data_shape[1]
    if channel_names is None:
        channel_names = [f"Channel:{image_name}:{i}" for i in range(n_channels)]
    if channel_colors is None:
        channel_colors = list(range(n_channels))
    if channel_minmax is None:
        channel_minmax = [(0.0, 1.0)] * n_channels
    if channel_startend is None:
        channel_startend = list(channel_minmax)
    channels = [
        {
            "active": True,
            "coefficient": 1,
            "color": f"{channel_colors[i]:06x}",
            "family": "linear",
            "inverted": False,
            "label": channel_names[i],
            "window": {
                "end": float(channel_startend[i][1]),
                "max": float(channel_minmax[i][1]),
                "min": float(channel_minmax[i][0]),
                "start": float(channel_startend[i][0]),
            },
        }
        for i in range(n_channels)
    ]
    return {
        "id": 1,
        "name": image_name,
        "version": OME_NGFF_VERSION,
        "channels": channels,
        "rdefs": {
            "defaultT": 0,
            "defaultZ": data_shape[2] // 2,
            "model": "color",
        },
    }


def get_axes_5d(
    time_unit: str = "millisecond", space_unit: str = "micrometer"
) -> list[dict[str, str]]:
    """TCZYX axis declarations (``czi_to_zarr.py:202-223``)."""
    return [
        {"name": "t", "type": "time", "unit": time_unit},
        {"name": "c", "type": "channel"},
        {"name": "z", "type": "space", "unit": space_unit},
        {"name": "y", "type": "space", "unit": space_unit},
        {"name": "x", "type": "space", "unit": space_unit},
    ]


def downscale_origin(
    array_shape: Sequence[int],
    origin: Sequence[float],
    voxel_size: Sequence[float],
    scale_factors: Sequence[int],
    n_levels: int,
) -> list[list[float]]:
    """Per-level 5-D origins (``czi_to_zarr.py:226-279``): each level
    shifts by half the span of a window minus half a voxel —
    ``voxel · (factor − 1) / 2`` — then the voxel grows by the factor."""
    org = [float(v) for v in origin[-3:]]
    vox = [float(v) for v in voxel_size[-3:]]
    fac = [int(f) for f in scale_factors[-3:]]
    origins = [[0.0, 0.0, *org]]
    for _ in range(n_levels - 1):
        org = [o + v * (f - 1) / 2 for o, v, f in zip(org, vox, fac)]
        vox = [v * f for v, f in zip(vox, fac)]
        origins.append([0.0, 0.0, *org])
    return origins


def compute_scales(
    n_levels: int,
    scale_factor: Sequence[float],
    voxel_size: Sequence[float],
    chunks: Sequence[int],
    data_shape: Sequence[int],
    translations: list[list[float]] | None = None,
) -> tuple[list[list[dict[str, Any]]], list[dict[str, Any]]]:
    """Per-level coordinateTransformations + chunk options
    (``czi_to_zarr.py:103-199``).

    Level-k spatial scale multiplies by the factor each level; chunk
    options clamp the base chunk to the level's ceil-downsampled extent
    (``np.ceil(shape/factor)`` recurrence, ``czi_to_zarr.py:185-187``).
    """
    sz, sy, sx = (float(v) for v in voxel_size[-3:])
    fz, fy, fx = (float(f) for f in scale_factor[-3:])
    lastz, lasty, lastx = data_shape[2], data_shape[3], data_shape[4]
    cz, cy, cx = chunks[2], chunks[3], chunks[4]

    transforms: list[list[dict[str, Any]]] = []
    chunk_opts: list[dict[str, Any]] = []
    scale = [1.0, 1.0, sz, sy, sx]
    for lvl in range(n_levels):
        entry: list[dict[str, Any]] = [{"type": "scale", "scale": list(scale)}]
        if translations is not None:
            entry.append({"type": "translation", "translation": translations[lvl]})
        transforms.append(entry)
        chunk_opts.append(
            {"chunks": (1, 1, min(lastz, cz), min(lasty, cy), min(lastx, cx))}
        )
        scale = [1.0, 1.0, scale[2] * fz, scale[3] * fy, scale[4] * fx]
        lastz = math.ceil(lastz / fz)
        lasty = math.ceil(lasty / fy)
        lastx = math.ceil(lastx / fx)
    return transforms, chunk_opts


def pyramid_provenance() -> dict[str, Any]:
    """Provenance block describing the reduction
    (``czi_to_zarr.py:392-407``) — method name states our actual
    implementation, not the reference's library."""
    return {
        "metadata": {
            "description": "Downscaling using the windowed mean",
            "method": "aind_hcr_data_transformation_spark.operators.downsample",
            "version": "0.1.0",
            "args": "[false]",
            "kwargs": {},
        }
    }


def build_multiscales(
    arr_shape: Sequence[int],
    final_chunksize: Sequence[int],
    image_name: str,
    n_levels: int,
    scale_factors: Sequence[int],
    voxel_size: Sequence[float],
    origin: Sequence[float] | None = None,
) -> dict[str, Any]:
    """The full ``multiscales`` attribute document
    (``write_ome_ngff_metadata``, ``czi_to_zarr.py:282-363``)."""
    translations = None
    if origin is not None:
        translations = downscale_origin(
            arr_shape, origin, voxel_size, scale_factors, n_levels
        )
    transforms, _ = compute_scales(
        n_levels, scale_factors, voxel_size, final_chunksize, arr_shape, translations
    )
    datasets = [
        {"path": str(i), "coordinateTransformations": transforms[i]}
        for i in range(n_levels)
    ]
    return {
        "multiscales": [
            {
                "axes": get_axes_5d(),
                "datasets": datasets,
                "name": image_name,
                "version": OME_NGFF_VERSION,
                **pyramid_provenance(),
            }
        ]
    }


def validate_multiscales(doc: dict[str, Any]) -> None:
    """Structural validation of a multiscales document (the role
    ``CurrentFormat.validate_coordinate_transformations`` plays at
    ``czi_to_zarr.py:355-357``)."""
    ms = doc["multiscales"]
    if not ms:
        raise ValueError("empty multiscales")
    for entry in ms:
        axes = entry["axes"]
        if [a["name"] for a in axes] != ["t", "c", "z", "y", "x"]:
            raise ValueError(f"unexpected axes: {axes}")
        for ds in entry["datasets"]:
            transforms = ds["coordinateTransformations"]
            kinds = [t["type"] for t in transforms]
            if kinds[0] != "scale":
                raise ValueError(f"first transform must be scale, got {kinds}")
            for t in transforms:
                key = "scale" if t["type"] == "scale" else "translation"
                if len(t[key]) != len(axes):
                    raise ValueError(
                        f"{key} rank {len(t[key])} != axes rank {len(axes)}"
                    )
