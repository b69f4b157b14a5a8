"""The argmax-as-hash-aggregate kernel (r5 perf work) must be EXACTLY
the rank-1 window it replaced.

Five queries (text_langid, upsert_scd1, cdc_apply_deletes,
rag_mmr_rerank, dedup_canonical_pick) and the IVF/PQ assignment steps
now compute per-key argmin/argmax as ``groupBy(key).agg(min/max(
struct(order_keys..., payload...)))`` instead of filtering
``row_number() == 1`` over a window.  The rewrite is only sound when
struct ordering reproduces the window's ORDER BY, including the
negate-for-desc trick and tie-breaks.  This test pins that equivalence
on adversarial data: duplicated scores (tie-break exercised), negative
scores, single-member groups, and payload columns that must NOT
influence ordering because the leading (score, id) pair is unique.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _mk_rows(seed: int, n_keys: int, n_rows: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        rows.append(
            (
                rng.randrange(n_keys),  # key
                rng.randrange(-5, 6),  # score: few distinct values -> ties
                i,  # id: unique
                rng.choice(["a", "b", "c", None]),  # payload
            )
        )
    return rows


def test_desc_score_asc_id_matches_window(spark):
    df = spark.createDataFrame(
        _mk_rows(7, 11, 400), "key int, score int, id long, payload string"
    ).cache()

    w = Window.partitionBy("key").orderBy(F.desc("score"), F.asc("id"))
    via_window = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "score", "id", "payload")
    )
    via_agg = (
        df.groupBy("key")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col("id"),
                    F.col("payload"),
                )
            ).alias("sc")
        )
        .select(
            "key",
            (-F.col("sc.ns")).alias("score"),
            F.col("sc.id").alias("id"),
            F.col("sc.payload").alias("payload"),
        )
    )
    assert sorted(via_window.collect()) == sorted(via_agg.collect())


def test_desc_desc_latest_wins_matches_window(spark):
    # the upsert_scd1 / cdc_apply_deletes shape: ORDER BY ts DESC, id DESC
    df = spark.createDataFrame(
        _mk_rows(13, 7, 300), "key int, ts int, id long, payload string"
    ).cache()

    w = Window.partitionBy("key").orderBy(F.desc("ts"), F.desc("id"))
    via_window = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "ts", "id", "payload")
    )
    via_agg = (
        df.groupBy("key")
        .agg(F.max(F.struct("ts", "id", "payload")).alias("last"))
        .select(
            "key",
            F.col("last.ts").alias("ts"),
            F.col("last.id").alias("id"),
            F.col("last.payload").alias("payload"),
        )
    )
    assert sorted(via_window.collect()) == sorted(via_agg.collect())


def test_payload_never_drives_ordering(spark):
    # two rows tie on score; winner must be the lower id regardless of
    # which payload sorts first (the leading pair is unique, so the
    # payload field of the struct must never be consulted)
    df = spark.createDataFrame(
        [(1, 5, 10, "zzz"), (1, 5, 20, "aaa")],
        "key int, score int, id long, payload string",
    )
    got = (
        df.groupBy("key")
        .agg(
            F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("id"), F.col("payload"))
            ).alias("sc")
        )
        .select("key", F.col("sc.id").alias("id"), F.col("sc.payload").alias("payload"))
        .collect()
    )
    assert got == [(1, 10, "zzz")] or got[0].asDict() == {
        "key": 1,
        "id": 10,
        "payload": "zzz",
    }


def test_partial_aggregation_in_plan(spark):
    # the point of the rewrite: the plan must contain a PARTIAL aggregate
    # below the exchange (map-side combine) and no Window operator.  Spark
    # plans min/max over struct through SortAggregate (struct ordering has
    # no hash-agg codegen), which still carries the partial_min stage —
    # that map-side combine is what the window version can never have.
    df = spark.createDataFrame(
        _mk_rows(3, 5, 100), "key int, score int, id long, payload string"
    )
    agg = df.groupBy("key").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("id"))).alias("sc")
    )
    plan = agg._jdf.queryExecution().executedPlan().treeString()
    assert "Window" not in plan
    assert "partial_min" in plan  # map-side combine before the shuffle
