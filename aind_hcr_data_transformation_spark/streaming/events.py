"""Streaming event pipelines: file-source ``readStream`` over the events
table with watermarked event-time windows, run to completion with the
``availableNow`` trigger (bounded backfill — the mode that makes a
streaming pipeline testable and oracle-checkable).

Because batch ``window()``/``session_window`` and streaming windows share
one implementation, the streaming tumbling aggregate below is
oracle-checked against the SAME DuckDB SQL as the batch version
(operators/windows.py) — the strongest statement that the upgrade path
preserves semantics.

Scale notes: in production the file source becomes Kafka; the watermark
bounds state store size (late rows beyond 1 hour are dropped), and the
shuffle is on (window, event_type) — exactly as in batch.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.compat import dround
from ..tables import SCHEMAS

from ..operators.windows import EVW_TUMBLING_SQL


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the declared schema and
    the nanos→micros conversion of tables.load_table."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # file streams take a directory; glob-filter down to the events table
    raw = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))




def _run_to_memory_sink(df: DataFrame, prefix: str, output_mode: str):
    """Run a bounded stream (availableNow) into a memory sink and return
    the result table. Shuffle partitions are dialed down for the run —
    state-store instances scale with them, and at test scale 32 stores of
    checkpoint churn dominate wall-clock (a real cluster raises the
    setting with executor count) — then restored.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sink_name = f"{prefix}_{uuid.uuid4().hex[:8]}"
        checkpoint = os.path.join(tempfile.gettempdir(), f"ckpt_{sink_name}")
        q = (
            df.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink_name)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate, executed as a bounded stream
    (availableNow) into a memory sink; returns the final result table.

    Matches the batch ``evw_tumbling`` oracle exactly.
    """
    events = streaming_events(spark, sf_dir)
    windowed = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory_sink(windowed, "stream_tumbling", "complete")


QUERIES = {
    "stream_tumbling_counts": stream_tumbling_counts,
}

ORACLES = {
    # identical semantics to the batch tumbling window — same oracle
    "stream_tumbling_counts": EVW_TUMBLING_SQL,
}


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------------


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY custom-operator ladder, step b): per-user running totals kept
    in explicit GroupState across micro-batches, emitted in update mode.

    Run bounded (availableNow, single source file → one batch), the final
    update per user equals the batch aggregate — so even this custom
    state machine is DuckDB-oracle-checked.

    Determinism: the state accumulates EXACT integer units of 1e-10 (the
    ``dsum`` decimal routing applied per row before accumulation), never
    floats — a float64 running sum would depend on batch/partition
    arrival order and could flip a 2-dp rounding boundary against the
    oracle. Each value converts via its shortest decimal repr, HALF_UP at
    scale 10 — the same double→DECIMAL(30,10) cast Spark and DuckDB
    apply in ``dsum``/``sql_sum``.
    """
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = streaming_events(spark, sf_dir)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("su", T.LongType()),  # exact sum, units of 1e-10
        ]
    )

    _Q10 = Decimal("1e-10")
    _CENT = Decimal("0.01")

    def update(key, pdfs, state: GroupState):
        n, su = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["value"]:
                su += int(
                    Decimal(repr(float(v)))
                    .quantize(_Q10, rounding=ROUND_HALF_UP)
                    .scaleb(10)
                )
        state.update((n, su))
        final = float(
            Decimal(su).scaleb(-10).quantize(_CENT, rounding=ROUND_HALF_UP)
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [final],
            }
        )

    totals = (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory_sink(totals, "stream_user_totals", "update").select(
        "user_id", "n_events", "sum_value"
    )


STREAM_USER_TOTALS_SQL = """
SELECT
  user_id,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
"""

QUERIES["stream_user_totals"] = stream_user_totals
ORACLES["stream_user_totals"] = STREAM_USER_TOTALS_SQL
