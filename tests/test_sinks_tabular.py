"""Tabular sink coverage (SURVEY §2.2 K9 + §4 X7): parquet-zstd round
trip and the checkpointed pyramid cascade (write-then-read-back lineage
truncation, the reference's ``da.from_zarr`` pattern)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_parquet_zstd_roundtrip(spark, tmp_path):
    from aind_hcr_data_transformation_spark.tables import load_table

    out = str(tmp_path / "li")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    li.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert back.schema == li.schema
    # zstd actually used (session default)
    files = list((tmp_path / "li").glob("*.parquet"))
    assert files, "no parquet files written"
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(str(files[0])).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"


def test_pyramid_checkpointed_cascade(spark, tmp_path):
    """pyramid_relational with checkpoint_dir: each level written to
    parquet and read back; values equal the in-memory cascade."""
    from aind_hcr_data_transformation_spark.operators.downsample import (
        pyramid_relational,
    )

    zz, yy, xx = np.meshgrid(np.arange(8), np.arange(8), np.arange(8), indexing="ij")
    pdf = pd.DataFrame(
        {
            "z": zz.ravel(),
            "y": yy.ravel(),
            "x": xx.ravel(),
            "v": ((zz * 1000 + yy * 10 + xx) % 65536).ravel(),
        }
    )
    voxels = spark.createDataFrame(pdf)
    plain = pyramid_relational(voxels, 3)
    ckpt = pyramid_relational(voxels, 3, checkpoint_dir=str(tmp_path / "pyr"))
    for lvl in (1, 2):
        a = {(r.z, r.y, r.x): r.v for r in plain[lvl].collect()}
        b = {(r.z, r.y, r.x): r.v for r in ckpt[lvl].collect()}
        assert a == b
    assert (tmp_path / "pyr" / "level=1").exists()
    assert len(ckpt) == 3
