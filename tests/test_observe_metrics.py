"""Observation metrics: pipeline accounting with ZERO extra passes.

At 100 TB you cannot afford a second action per stage just to count what
a filter dropped; ``DataFrame.observe`` attaches aggregate metrics to the
one action you already run (collected on the driver as the job finishes —
the Spark-native replacement for accumulator hand-rolling). This pins the
pattern the pipeline stages would use in production: gate counts ride the
real write/collect, and the observed numbers must agree with what a
dedicated counting pass would have returned.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_observe_rides_single_action(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    obs = Observation("ingest_gate")
    gated = (
        docs.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum((F.col("n_chars") >= 200).cast("long")).alias("n_pass"),
            F.sum("n_chars").alias("chars_in"),
        )
        .filter(F.col("n_chars") >= 200)
    )
    n_out = gated.count()  # the ONE action; metrics ride it
    got = obs.get
    assert got["n_in"] == docs.count()
    assert got["n_pass"] == n_out
    assert got["chars_in"] == docs.agg(F.sum("n_chars")).collect()[0][0]


def test_observe_on_multistage_plan(spark):
    """Observations at two pipeline stages, one action: the downstream
    aggregate still carries both stages' metrics."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pre = Observation("pre")
    post = Observation("post")
    out = (
        docs.observe(pre, F.count(F.lit(1)).alias("n"))
        .filter(F.col("lang") == "en")
        .observe(post, F.count(F.lit(1)).alias("n"))
        .groupBy("source")
        .count()
    )
    rows = out.collect()
    assert pre.get["n"] == docs.count()
    assert post.get["n"] == sum(r["count"] for r in rows)
    assert post.get["n"] <= pre.get["n"]
