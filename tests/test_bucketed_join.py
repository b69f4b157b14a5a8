"""Bucketed co-located joins — the zero-shuffle join path for repeated
large-fact joins at 100 TB (SURVEY scale brief: "repartition()/bucketing
for co-located joins").

Writing both fact tables bucketed by the join key means every later
equi-join on that key reads pre-partitioned buckets: the plan carries NO
shuffle exchange on either side.  At cluster scale this converts the
recurring orders⋈lineitem shuffle (the largest exchange in most TPC-H
shapes) into a local zip of bucket files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_hcr_data_transformation_spark.tables import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # explicit per-table paths: the warehouse dir is a static conf, but
    # external bucketed tables carry their own location
    warehouse = tmp_path_factory.mktemp("bucketed_warehouse")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    load_table(spark, SF, "lineitem").write.bucketBy(
        N_BUCKETS, "l_orderkey"
    ).sortBy("l_orderkey").format("parquet").option(
        "path", str(warehouse / "li_bucketed")
    ).saveAsTable("li_bucketed")
    load_table(spark, SF, "orders").write.bucketBy(
        N_BUCKETS, "o_orderkey"
    ).sortBy("o_orderkey").format("parquet").option(
        "path", str(warehouse / "ord_bucketed")
    ).saveAsTable("ord_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    """Equi-join on the bucket key must read buckets directly: no
    Exchange on either join input (only the final aggregate may
    shuffle)."""
    # disable AQE for a stable plan string, and broadcast: at fixture
    # scale the planner would broadcast orders (and skip bucketed reads
    # entirely) — at 100 TB neither side broadcasts, which is exactly
    # the regime bucketing exists for
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_bucketed")
            .join(
                spark.table("ord_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_extendedprice", "o_totalprice")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_bucketed_join_matches_shuffled_join(spark, bucketed):
    """The zero-shuffle plan must produce the identical result as the
    plain shuffled join over the raw parquet."""
    bucketed_rows = (
        spark.table("li_bucketed")
        .join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_orderkey") + F.col("o_orderkey")).alias("keysum"),
        )
        .collect()[0]
    )
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_orderkey") + F.col("o_orderkey")).alias("keysum"),
        )
        .collect()[0]
    )
    assert bucketed_rows == plain


def test_bucketed_layout_reattaches_without_rewrite(spark):
    """A fresh session (emulated by dropping the catalog entries) must
    re-attach the completed on-disk layout via external-table DDL — not
    rewrite it — and serve identical rows."""
    import os
    import tempfile
    from pathlib import Path

    from aind_hcr_data_transformation_spark.operators.relational import (
        _bucketed_tables,
        _sf_slug,
        join_bucketed_colocated,
    )

    sf = "/root/testdata/sf0.001"
    first = {
        tuple(r)
        for r in join_bucketed_colocated(spark, sf).collect()
    }
    li, od = _bucketed_tables(spark, sf)
    tag = li.rsplit("_", 1)[1]
    base = (
        Path(tempfile.gettempdir())
        / f"spark_graft_bucketed_{_sf_slug(sf)}_{tag}"
    )
    stamps = {
        n: os.path.getmtime(base / n / "_SUCCESS") for n in (li, od)
    }
    spark.sql(f"DROP TABLE {li}")
    spark.sql(f"DROP TABLE {od}")

    again = {
        tuple(r)
        for r in join_bucketed_colocated(spark, sf).collect()
    }
    assert again == first
    for n in (li, od):  # _SUCCESS untouched -> no rewrite happened
        assert os.path.getmtime(base / n / "_SUCCESS") == stamps[n]
