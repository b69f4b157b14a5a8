"""Engine-behavior pins for the r8 NULL-robustness fixes
(tools/null_probe.py found each of these live — see its docstring).

These pin the SPARK semantics the fixed operators rely on, so an engine
upgrade or refactor that changes them breaks here, loudly, instead of
resurfacing as a cross-engine hash-red on mutated production data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_struct_key_join_matches_null_fields(spark):
    """mv_incremental_refresh merges base/delta rollups on ONE struct
    key: struct equality must treat NULL fields as equal (GROUP BY
    semantics), unlike plain multi-column equi-join keys."""
    a = spark.createDataFrame(
        [(None, "x", 1), (1, None, 2), (None, None, 3)],
        "u int, e string, n int",
    ).select(F.struct("u", "e").alias("k"), "n")
    b = spark.createDataFrame(
        [(None, "x", 10), (1, None, 20), (None, None, 30)],
        "u int, e string, m int",
    ).select(F.struct("u", "e").alias("k"), "m")
    rows = a.join(b, "k", "full_outer").select("n", "m").collect()
    # every NULL-bearing key pairs up: 3 merged rows, no orphan sides
    assert sorted((r.n, r.m) for r in rows) == [(1, 10), (2, 20), (3, 30)]


def test_struct_key_join_reuses_agg_partitioning(spark):
    """The struct-key form must not cost a re-shuffle: both rollup
    exchanges partition on the struct, and the join consumes them
    directly (eqNullSafe key pairs measured 4 exchanges)."""
    from tools.plan_audit import count_exchanges

    df = spark.createDataFrame(
        [(i % 5, ["a", None][i % 2], float(i)) for i in range(40)],
        "u int, e string, v double",
    )

    def rollup(d):
        return d.groupBy(F.struct("u", "e").alias("k")).agg(
            F.sum("v").alias("s")
        )

    merged = rollup(df.filter("u < 3")).join(
        rollup(df.filter("u >= 3")), "k", "full_outer"
    )
    census = count_exchanges(merged)
    assert census["shuffles"] <= 2, census


def test_csv_null_token_roundtrips_empty_string(spark, tmp_path):
    """source_text_formats' CSV copies: with the default ('' ) null
    token, NULL and '' both serialize to "" and read back as NULL; the
    distinct \\N token makes the roundtrip lossless for both."""
    df = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, None)], "id long, text string"
    )
    p = str(tmp_path / "c.csv")
    (
        df.write.option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .option("nullValue", "\\N")
        .csv(p)
    )
    sch = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    back = {
        r.id: r.text
        for r in spark.read.schema(sch)
        .option("header", True)
        .option("escape", '"')
        .option("nullValue", "\\N")
        .csv(p)
        .collect()
    }
    assert back == {1: "", 2: "x", 3: None}


def test_array_join_empty_is_empty_string(spark):
    """Spark's array_join([]) is '' while DuckDB's array_to_string([])
    is NULL — the dedup mutant corpus oracle coalesces for exactly this
    (operators/dedup._CORPUS_SQL). Pin the Spark side so the coalesce
    stays correct."""
    row = spark.sql(
        "SELECT array_join(slice(split('', ' '), 3, 10), ' ') AS t"
    ).collect()[0]
    assert row.t == ""

    import duckdb

    (dk,) = duckdb.sql(
        "SELECT array_to_string(string_split('', ' ')[3:], ' ')"
    ).fetchone()
    assert dk is None  # the divergence the oracle's coalesce bridges
