"""Corrupted-input contract (r11): every stage of
``tools/corruption_probe.py`` run in-process — damaged bytes fail
loudly or decode to a well-formed result, never silent garbage or a
hang, with a pristine control through the same path (see the probe
docstring for the per-format contracts, including the documented
zarr-v2 no-chunk-checksum limitation)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import corruption_probe as cp  # noqa: E402


@pytest.mark.parametrize(
    "stage",
    [n for n in cp.STAGES if n not in cp._NEEDS_SPARK],
)
def test_codec_corruption_stage(stage):
    res = cp.STAGES[stage]()
    assert res["ok"], res


@pytest.mark.parametrize("stage", sorted(cp._NEEDS_SPARK))
def test_spark_corruption_stage(spark, stage):
    res = cp.STAGES[stage](spark)
    assert res["ok"], res
