"""Benchmark harness: runs every registered query at the bench scale
factor and prints ONE JSON line (driver contract).

Usage: python bench.py  [env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS]

Each query is materialized through the noop sink (full execution, no
driver-side row transfer), timed individually after a shared-session
warm-up. ``value`` is the wall-clock sum over all queries.

Regression visibility: if a previous round's BENCH_r*.json exists, any
query slower than 1.5× its best prior recording is listed under
``regressions`` (name → [prior, now]) right in the output line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from aind_hcr_data_transformation_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/codegen/Arrow init so per-query numbers measure the
    # queries, not session bring-up
    entrymod.queries()["q1_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # compare against the best prior recording of each query (any round)
    prior: dict[str, float] = {}
    for p in sorted(Path(__file__).resolve().parent.glob("BENCH_r*.json")):
        try:
            doc = json.loads(p.read_text())
            # the driver wraps our output line under {"parsed": {...}}
            if "queries" not in doc and isinstance(doc.get("parsed"), dict):
                doc = doc["parsed"]
            for q, t in doc.get("queries", {}).items():
                if isinstance(t, (int, float)) and (q not in prior or t < prior[q]):
                    prior[q] = float(t)
        except (json.JSONDecodeError, OSError):
            continue
    regressions = {
        q: [prior[q], t]
        for q, t in timings.items()
        if q in prior and prior[q] > 0.05 and t > 1.5 * prior[q]
    }

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "regressions": regressions,
            }
        )
    )


if __name__ == "__main__":
    main()
