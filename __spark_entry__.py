"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``aind_hcr_data_transformation_spark``; this file
only merges the per-module query/oracle registries (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aind_hcr_data_transformation_spark.operators import (
    dedup,
    graphops,
    ivf,
    multimodal,
    pipeline_queries,
    relational,
    similarity,
    textops,
    textprep,
    timeseries,
    tpch,
    vectorops,
    warehouse,
    windows,
)
from aind_hcr_data_transformation_spark.session import apply_session_confs
from aind_hcr_data_transformation_spark.streaming import events as streaming_events
from aind_hcr_data_transformation_spark.streaming import feed as streaming_feed

# Registry (and therefore bench) order follows PIPELINE order for the
# vector family: `vectorops` (which owns the PQ trainer/quantizer,
# `embed_pq_quantize`) precedes `ivf` (whose `ivfpq_search` READS the
# trained sub-codebooks through the session cache) — training cost sits
# on the training operator, search measures the serving path, exactly
# as a production IVFADC deployment splits them.
_MODULES = [
    relational,
    tpch,
    windows,
    pipeline_queries,
    dedup,
    similarity,
    vectorops,
    ivf,
    textops,
    textprep,
    timeseries,
    graphops,
    warehouse,
    multimodal,
    streaming_events,
    streaming_feed,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-shaped scan → filter → broadcast+shuffle join → agg → top-k
    (SURVEY §7 M0 — the reference's pipeline shape in miniature).
    """
    apply_session_confs(spark)
    return relational.q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged


def production_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Side registry: production sketch/hash twins whose outputs are
    engine-specific (HLL / GK-sketch estimates, xxhash64 minhash pairs)
    and therefore carry no DuckDB oracle.  Each is accuracy-pinned by
    pytest against an exact answer or its md5 oracle twin; they are
    benchmarked alongside ``queries()`` but excluded from the driver's
    differential gate (every ``queries()`` entry has an ``oracle_sql()``
    twin)."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        extra = getattr(mod, "PRODUCTION_QUERIES", {})
        overlap = merged.keys() & extra.keys()
        if overlap:
            raise ValueError(f"duplicate production query names: {overlap}")
        merged.update(extra)
    return merged
