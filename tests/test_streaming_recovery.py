"""Checkpoint recovery: a streaming query stopped mid-backfill must
resume from its checkpoint and produce EXACTLY-ONCE output — the
operational property that makes the streaming layer restartable in
production (kill -9 the driver, restart the job, no duplicates, no
holes).

The file source's processed-files log and the parquet sink's
transactional commit log both live in the checkpoint/_spark_metadata;
this test drives them the way an operator would: first run processes
one input file and is stopped, the restart drains the rest with
``availableNow``.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stream_restart_is_exactly_once(spark, tmp_path):
    from aind_hcr_data_transformation_spark.tables import SCHEMAS, load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_total = ev.count()
    split = int(ev.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0])

    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    # two input files so the backfill has a seam to be killed at
    ev.filter(F.col("event_id") <= split).coalesce(1).write.parquet(
        str(src / "f1")
    )
    ev.filter(F.col("event_id") > split).coalesce(1).write.parquet(
        str(src / "f2")
    )

    schema = ev.schema
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
    )
    enriched = lambda df: df.withColumn(  # noqa: E731
        "is_purchase", (F.col("event_type") == "purchase").cast("int")
    )

    # run 1: let exactly one micro-batch commit, then stop (the "crash")
    q1 = (
        enriched(reader.parquet(str(src)))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        # batch 2 can't fire before the stop below even if batch 1 is
        # slow on a loaded host — 500 fixture rows never take 2 minutes
        .trigger(processingTime="120 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            done = sum(
                p["numInputRows"] for p in q1.recentProgress if p["numInputRows"]
            )
            if done:
                break
            time.sleep(0.2)
        assert done, "first micro-batch never committed"
    finally:
        q1.stop()
    q1.awaitTermination(30)

    mid = spark.read.parquet(str(out))
    n_mid = mid.count()
    assert 0 < n_mid < n_total, "stop did not land mid-backfill"

    # run 2: same checkpoint, drain the rest
    q2 = (
        enriched(reader.parquet(str(src)))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(str(out))
    assert got.count() == n_total  # no holes
    assert got.select("event_id").distinct().count() == n_total  # no dupes
    # content equality with the batch frame
    assert (
        got.select("event_id", "user_id", "event_type", "is_purchase")
        .exceptAll(enriched(ev).select("event_id", "user_id", "event_type", "is_purchase"))
        .count()
        == 0
    )
