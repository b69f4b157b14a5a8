"""Attribute the per-query constant of the bounded `stream_*` runs.

VERDICT r13 task 5: ~15 stream_* queries x ~1 s of availableNow
bring-up. Checkpoints are already tmpfs and shuffle partitions already
tuned (r11/r13); the remaining suspects are state-store provider
instantiation/maintenance, per-batch (re)planning, the no-data
watermark-flush batch, and the memory-sink collect.

Phase 1 (attribution): wrap one representative query of each state
class and time the phases the harness controls.

Phase 2 (config A/B): re-run representatives under candidate configs --
`spark.sql.streaming.stateStore.maintenanceInterval` deferral and
`spark.sql.streaming.minBatchesToRetain` -- interleaved, N rounds each,
and report medians. `noDataMicroBatches.enabled=false` is NOT a
candidate: append-mode watermarked queries emit their closed windows in
the no-data flush batch, so disabling it changes results.

Usage: python tools/stream_floor_probe.py [rounds]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"

REPRESENTATIVES = [
    # (name, state class)
    ("stream_tumbling_counts", "JVM stateful append (watermark flush)"),
    ("stream_dedup", "JVM stateful dropDuplicates"),
    ("stream_user_totals", "applyInPandasWithState (python state)"),
    ("stream_static_anti_join", "stateless static anti join"),
]

CONFIGS = {
    "baseline": {},
    "maint_defer": {
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
    },
    "retain2": {
        "spark.sql.streaming.minBatchesToRetain": "2",
    },
    "both": {
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
        "spark.sql.streaming.minBatchesToRetain": "2",
    },
}


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import SparkSession

    from aind_hcr_data_transformation_spark.streaming import events as ev

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stream_floor_probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    queries = {name: ev.QUERIES[name] for name, _ in REPRESENTATIVES}

    # warmup: one run of each, untimed (JVM/codegen/python-worker warmup)
    for name, fn in queries.items():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    results: dict = {}
    confs = list(CONFIGS.items())
    for name, fn in queries.items():
        per_conf: dict[str, list[float]] = {c: [] for c, _ in confs}
        for _ in range(rounds):
            for cname, cmap in confs:  # interleaved
                prev = {}
                for k, v in cmap.items():
                    try:
                        prev[k] = spark.conf.get(k)
                    except Exception:
                        prev[k] = None
                    spark.conf.set(k, v)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                per_conf[cname].append(time.perf_counter() - t0)
                for k, v in prev.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
        med = {
            c: round(sorted(v)[len(v) // 2], 3) for c, v in per_conf.items()
        }
        results[name] = {"medians": med, "samples": {
            c: [round(x, 3) for x in v] for c, v in per_conf.items()
        }}
        print(f"{name}: {med}", flush=True)

    out = REPO / "STREAM_FLOOR_PROBE.json"
    out.write_text(json.dumps({
        "rounds": rounds,
        "configs": {k: v for k, v in CONFIGS.items()},
        "results": results,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }, indent=1))
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
