"""Golden tests for the OME-NGFF metadata builders (SURVEY §7 M2: dict
equality against values derived from the reference's semantics,
``czi_to_zarr.py:32-363``)."""

from __future__ import annotations

import pytest

from aind_hcr_data_transformation_spark.ome import (
    build_multiscales,
    build_omero,
    compute_scales,
    downscale_origin,
    get_axes_5d,
    validate_multiscales,
)


def test_axes_5d():
    axes = get_axes_5d()
    assert [a["name"] for a in axes] == ["t", "c", "z", "y", "x"]
    assert axes[0]["unit"] == "millisecond"
    assert axes[2]["unit"] == "micrometer"
    assert axes[1] == {"name": "c", "type": "channel"}


def test_build_omero_defaults():
    omero = build_omero((1, 2, 40, 32, 32), "stackA")
    assert omero["version"] == "0.4"
    assert omero["rdefs"]["defaultZ"] == 20  # middle section
    assert len(omero["channels"]) == 2
    ch0 = omero["channels"][0]
    assert ch0["color"] == "000000"  # f"{0:06x}"
    assert ch0["label"] == "Channel:stackA:0"
    assert ch0["window"] == {"end": 1.0, "max": 1.0, "min": 0.0, "start": 0.0}


def test_build_omero_custom_channels():
    omero = build_omero(
        (1, 1, 10, 8, 8),
        "s",
        channel_names=["ch488"],
        channel_colors=[0x00FF00],
        channel_minmax=[(0.0, 65535.0)],
        channel_startend=[(0.0, 550.0)],
    )
    ch = omero["channels"][0]
    assert ch["color"] == "00ff00"
    assert ch["window"] == {"end": 550.0, "max": 65535.0, "min": 0.0, "start": 0.0}


def test_compute_scales_progression():
    transforms, chunk_opts = compute_scales(
        n_levels=3,
        scale_factor=(2, 2, 2),
        voxel_size=(1.0, 0.748, 0.748),
        chunks=(1, 1, 128, 128, 128),
        data_shape=(1, 1, 40, 300, 300),
    )
    assert [t[0]["scale"] for t in transforms] == [
        [1.0, 1.0, 1.0, 0.748, 0.748],
        [1.0, 1.0, 2.0, 1.496, 1.496],
        [1.0, 1.0, 4.0, 2.992, 2.992],
    ]
    # chunk clamp follows the ceil-downsampled extent (czi_to_zarr.py:185-196)
    assert chunk_opts[0]["chunks"] == (1, 1, 40, 128, 128)
    assert chunk_opts[1]["chunks"] == (1, 1, 20, 128, 128)
    assert chunk_opts[2]["chunks"] == (1, 1, 10, 75, 75)


def test_downscale_origin_center_shift():
    origins = downscale_origin(
        array_shape=(1, 1, 40, 32, 32),
        origin=(10.0, 20.0, 30.0),
        voxel_size=(1.0, 2.0, 4.0),
        scale_factors=(2, 2, 2),
        n_levels=3,
    )
    # level 1 shifts by voxel*(f-1)/2 = (0.5, 1.0, 2.0)
    assert origins[0] == [0.0, 0.0, 10.0, 20.0, 30.0]
    assert origins[1] == [0.0, 0.0, 10.5, 21.0, 32.0]
    # level 2 shifts by doubled voxel: (1.0, 2.0, 4.0)
    assert origins[2] == [0.0, 0.0, 11.5, 23.0, 36.0]


def test_multiscales_document_valid():
    doc = build_multiscales(
        arr_shape=(1, 1, 40, 32, 32),
        final_chunksize=(1, 1, 16, 16, 16),
        image_name="stackA",
        n_levels=3,
        scale_factors=(2, 2, 2),
        voxel_size=(1.0, 0.748, 0.748),
        origin=(0.0, 0.0, 0.0),
    )
    validate_multiscales(doc)
    ms = doc["multiscales"][0]
    assert [d["path"] for d in ms["datasets"]] == ["0", "1", "2"]
    # every dataset carries scale + translation
    for ds in ms["datasets"]:
        assert [t["type"] for t in ds["coordinateTransformations"]] == [
            "scale",
            "translation",
        ]


def test_validate_rejects_bad_rank():
    doc = build_multiscales(
        (1, 1, 8, 8, 8), (1, 1, 4, 4, 4), "s", 2, (2, 2, 2), (1.0, 1.0, 1.0)
    )
    doc["multiscales"][0]["datasets"][0]["coordinateTransformations"][0][
        "scale"
    ] = [1.0, 2.0]
    with pytest.raises(ValueError):
        validate_multiscales(doc)
