"""The events fixture's ``ts`` parquet encoding is driver-controlled and
has changed between rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)); a wrong
decode silently compresses or inflates all event times 1000× and breaks
every time-based query.  Pin the loader's footer sniff against all three
encodings it claims to handle.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aind_hcr_data_transformation_spark.tables import (
    events_ts_is_nanos,
    load_table,
)

#: one known instant, expressed for each writer
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _write_events(dirpath: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


@pytest.fixture()
def us_dir(tmp_path):
    d = tmp_path / "us"
    d.mkdir()
    ts = pa.array(
        [_EPOCH_US, _EPOCH_US + 61_000_000], pa.timestamp("us")
    )
    return _write_events(str(d), ts)


@pytest.fixture()
def ns_dir(tmp_path):
    d = tmp_path / "ns"
    d.mkdir()
    ts = pa.array(
        np.array([_EPOCH_US * 1000, (_EPOCH_US + 61_000_000) * 1000]),
        pa.timestamp("ns"),
    )
    return _write_events(str(d), ts)


class TestTsEncodingSniff:
    def test_sniff_micros(self, us_dir):
        assert events_ts_is_nanos(f"{us_dir}/events.parquet") is False

    def test_sniff_nanos(self, ns_dir):
        assert events_ts_is_nanos(f"{ns_dir}/events.parquet") is True

    def test_both_encodings_load_to_identical_micros(
        self, spark, us_dir, ns_dir
    ):
        """The post-load contract is the same TimestampType micros values
        regardless of the file's physical encoding."""
        a = sorted(
            (r["event_id"], r["ts"])
            for r in load_table(spark, us_dir, "events").collect()
        )
        b = sorted(
            (r["event_id"], r["ts"])
            for r in load_table(spark, ns_dir, "events").collect()
        )
        assert a == b
        assert a[0][1] == pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
        assert a[1][1] - a[0][1] == pd.Timedelta(seconds=61)

    def test_bare_int64_ts_is_rejected(self, tmp_path):
        """An unannotated INT64 ts column is ambiguous (nanos? micros?
        seconds?) — guessing nanos and dividing by 1000 would shift every
        event 1000x. The sniff must raise, not guess."""
        d = tmp_path / "raw"
        d.mkdir()
        ts = pa.array([_EPOCH_US, _EPOCH_US + 61_000_000], pa.int64())
        path = f"{_write_events(str(d), ts)}/events.parquet"
        with pytest.raises(TypeError, match="ambiguous"):
            events_ts_is_nanos(path)

    def test_sniff_cache_keyed_by_mtime(self, tmp_path):
        """Regenerating the fixture in place (same path, new encoding)
        must re-sniff — the memo is keyed by (path, mtime)."""
        d = tmp_path / "regen"
        d.mkdir()
        ts_us = pa.array(
            [_EPOCH_US, _EPOCH_US + 61_000_000], pa.timestamp("us")
        )
        path = f"{_write_events(str(d), ts_us)}/events.parquet"
        assert events_ts_is_nanos(path) is False
        ts_ns = pa.array(
            np.array([_EPOCH_US * 1000, (_EPOCH_US + 61_000_000) * 1000]),
            pa.timestamp("ns"),
        )
        _write_events(str(d), ts_ns)
        os.utime(path, (1, 1))  # force a distinct mtime even on coarse clocks
        assert events_ts_is_nanos(path) is True

    def test_real_fixture_loads_expected_span(self, spark):
        """The shipped sf0.001 fixture must decode to a plausible event-time
        span (hours-to-months), never the 1000x-compressed artifact of a
        wrong decode branch."""
        bounds = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .agg(
                F.min("ts").alias("lo"),
                F.max("ts").alias("hi"),
            )
            .collect()[0]
        )
        span = bounds["hi"] - bounds["lo"]
        assert pd.Timedelta(hours=1) <= span <= pd.Timedelta(days=400)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_documents_text_is_ascii(spark, sf_dir):
    """Several oracles equate DuckDB's per-CHARACTER ascii()/substr()
    with Spark's per-BYTE payload math (multimodal thumbnail/audio,
    magic_u32). That identity only holds for ASCII text, so a fixture
    regeneration that introduces non-ASCII vocab must fail HERE with a
    clear message, not as a mysterious hash mismatch downstream
    (see memory: the driver has silently changed fixture encodings
    between rounds before). Checked at every scale factor the oracle
    gates run at (sf0.1 shares the generator; sf0.01 is the driver's
    gate scale)."""
    from aind_hcr_data_transformation_spark.tables import load_table

    n_bad = (
        load_table(spark, sf_dir, "documents")
        .filter(~F.col("text").rlike("^[\\x00-\\x7F]*$"))
        .count()
    )
    assert n_bad == 0, (
        f"{n_bad} documents contain non-ASCII text; byte-vs-char oracles "
        "(multimodal_thumbnail, multimodal_audio_rms, magic_u32) are no "
        "longer valid — switch those oracles to blob-based byte access"
    )
