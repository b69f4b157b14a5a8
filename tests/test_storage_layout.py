"""Storage-layout scale evidence (SURVEY §4 X2/X3 + 'bucketing for
co-located joins'): bucketed tables join without a shuffle, and
partitioned writes prune at the scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_hcr_data_transformation_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "simple") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def warehouse(spark):
    # warehouse dir is a static conf on a live session; use the default
    # (./spark-warehouse) and drop tables in the tests
    yield spark
    import shutil

    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_no_shuffle(warehouse):
    """Both fact tables bucketed by the join key: the sort-merge join reads
    co-located buckets — zero Exchange in the plan. At 100 TB this is the
    difference between joining in place and moving both tables."""
    spark = warehouse
    # disable broadcast so the join strategy is the bucket-aware SMJ
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load_table(spark, SF, "lineitem").write.mode("overwrite").bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").saveAsTable("li_bucketed")
        load_table(spark, SF, "orders").write.mode("overwrite").bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").saveAsTable("o_bucketed")
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_partitioned_write_prunes(warehouse, tmp_path):
    """Year-partitioned layout: a year filter becomes a PartitionFilter —
    non-matching directories are never opened."""
    spark = warehouse
    out = str(tmp_path / "orders_by_year")
    (
        load_table(spark, SF, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    plan = plan_of(back, "formatted")
    assert "PartitionFilters: [isnotnull(o_year" in plan or "o_year#" in plan
    # count only 1997 rows; pruning means the other year dirs are skipped
    expected = (
        load_table(spark, SF, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert back.count() == expected
    pruned_line = next(
        (l for l in plan.splitlines() if "PartitionFilters" in l), ""
    )
    assert "1997" in pruned_line


def test_sweep_stale_layouts_respects_grace_age(tmp_path, monkeypatch):
    """ADVICE r6: superseded layout generations younger than the grace
    age must survive the sweep (a concurrent session may still serve
    them); older ones are reclaimed."""
    import os
    import tempfile
    import time

    from aind_hcr_data_transformation_spark.operators import relational as R

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    keep = tmp_path / "spark_graft_bucketed_abc123_tagNEW"
    fresh = tmp_path / "spark_graft_bucketed_abc123_tagMID"
    stale = tmp_path / "spark_graft_bucketed_abc123_tagOLD"
    for d in (keep, fresh, stale):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    old = time.time() - R._SWEEP_GRACE_S - 60
    os.utime(stale, (old, old))

    R._sweep_stale_layouts("spark_graft_bucketed_abc123_", keep)
    assert keep.exists(), "current layout must never be touched"
    assert fresh.exists(), "young superseded layout must survive the grace window"
    assert not stale.exists(), "aged-out layout must be reclaimed"


def test_schema_evolution_merged_read(spark):
    """mergeSchema must unify the two parquet generations: the evolved
    column exists in the merged schema and is NULL exactly for the
    pre-evolution (even doc_id) files."""
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.operators.relational import (
        _schema_evo_copies,
    )

    base = _schema_evo_copies(spark, "/root/testdata/sf0.001")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen1", f"{base}/gen2"
    )
    assert "lang" in merged.columns
    nulls = merged.filter(F.col("lang").isNull()).select("doc_id")
    assert nulls.filter(F.col("doc_id") % 2 == 1).count() == 0
    assert nulls.count() == merged.filter(F.col("doc_id") % 2 == 0).count()
    assert nulls.count() > 0
