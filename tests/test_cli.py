"""CLI entrypoint (``__main__.main`` — the ``job_entrypoint`` twin,
reference ``zeiss_job.py:230-249``): synthetic conversion, real-CZI
directory conversion through the vendored ZISRAW decode, and the
no-input error path. Each asserts the JobResponse-shaped JSON line."""

from __future__ import annotations

import json
import os

import numpy as np

from aind_hcr_data_transformation_spark.__main__ import main
from aind_hcr_data_transformation_spark.sources.czi import synthetic_ramp_block
from aind_hcr_data_transformation_spark.sources.zisraw import write_czi


def _run(capsys, argv: list[str]) -> tuple[int, dict]:
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_synthetic(spark, tmp_path, capsys):
    rc, doc = _run(
        capsys,
        [
            "--job-settings",
            json.dumps(
                {
                    "output_directory": str(tmp_path / "out"),
                    "chunk_size": [4, 8, 8],
                    "downsample_levels": 2,
                }
            ),
            "--synthetic",
            "8,16,12",
            "--stack-name",
            "s0",
        ],
    )
    assert rc == 0 and doc["status_code"] == 200
    assert (tmp_path / "out" / "s0.zarr" / "0" / ".zarray").exists()


def test_cli_czi_directory(spark, tmp_path, capsys):
    src = tmp_path / "in"
    src.mkdir()
    for name in ("tile_a", "tile_b"):
        write_czi(
            str(src / f"{name}.czi"),
            {z: synthetic_ramp_block(z, z + 1, 0, 16, 0, 12)[0] for z in range(8)},
        )
    out = tmp_path / "out"
    rc, doc = _run(
        capsys,
        [
            "--job-settings",
            json.dumps(
                {
                    "input_source": str(src),
                    "output_directory": str(out),
                    "chunk_size": [4, 8, 8],
                    "downsample_levels": 2,
                }
            ),
        ],
    )
    assert rc == 0 and doc["status_code"] == 200 and "2 groups" in doc["message"]

    from aind_hcr_data_transformation_spark.sinks.zarr_sink import read_array

    lvl0 = read_array(os.path.join(str(out), "tile_b.zarr", "0"))
    np.testing.assert_array_equal(
        lvl0[0, 0], synthetic_ramp_block(0, 8, 0, 16, 0, 12)
    )


def test_cli_no_input_is_an_error(spark, tmp_path, capsys):
    rc, doc = _run(
        capsys,
        ["--job-settings", json.dumps({"output_directory": str(tmp_path)})],
    )
    assert rc == 1 and doc["status_code"] == 400


def test_cli_empty_czi_directory_is_an_error(spark, tmp_path, capsys):
    empty = tmp_path / "empty"
    empty.mkdir()
    rc, doc = _run(
        capsys,
        [
            "--job-settings",
            json.dumps(
                {
                    "input_source": str(empty),
                    "output_directory": str(tmp_path / "o"),
                }
            ),
        ],
    )
    assert rc == 1 and doc["status_code"] == 400


def test_cli_czi_directory_resume_skips_complete(spark, tmp_path, capsys):
    """Second run over the same directory converts nothing: every group
    already carries the _SUCCESS sentinel."""
    src = tmp_path / "in"
    src.mkdir()
    write_czi(
        str(src / "only.czi"),
        {z: synthetic_ramp_block(z, z + 1, 0, 16, 0, 12)[0] for z in range(8)},
    )
    args = [
        "--job-settings",
        json.dumps(
            {
                "input_source": str(src),
                "output_directory": str(tmp_path / "out"),
                "chunk_size": [4, 8, 8],
                "downsample_levels": 2,
            }
        ),
    ]
    rc, doc = _run(capsys, args)
    assert rc == 0 and "wrote 1 groups (0 already complete)" in doc["message"]
    rc, doc = _run(capsys, args)
    assert rc == 0 and "wrote 0 groups (1 already complete)" in doc["message"]
