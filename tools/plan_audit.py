"""Shuffle accounting for every registered query — makes the
"one shuffle per logical step" design claim auditable instead of
rhetorical.

For each ``queries()`` entry the physical plan is inspected and the
exchange nodes are counted:

- ``shuffles``  — ``Exchange hashpartitioning/rangepartitioning/
  SinglePartition`` (data movement; the thing that hurts at 100 TB)
- ``broadcasts`` — ``BroadcastExchange`` (small-side replication; cheap)
- ``reused``     — ``ReusedExchange`` (Spark dedup of identical
  subplans; counted separately, they cost nothing at runtime)

Caveat: ``treeString`` prints a persisted subplan once per consumer, so
multi-consumer pipelines (minhash, IVF) OVER-count — the numbers are
regression ceilings (an edit that raises one added a real stage or a
real consumer), not exact runtime shuffle counts.

Usage: ``python tools/plan_audit.py [sf_dir] [--json PLAN_AUDIT.json]``

The budgets are pinned for headline queries in
``tests/test_plan_budgets.py`` — an edit that sneaks an extra shuffle
into a hot query fails CI, not a future benchmark.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def count_exchanges(df) -> dict[str, int]:
    """Exchange census of a DataFrame's physical plan (pre-execution
    AQE initial plan — the shape Catalyst committed to).

    Counts each exchange OPERATOR once, not each tree-string appearance:
    a persisted subtree is reprinted in full under every
    InMemoryRelation scan site, so a naive line count multiplies one
    cache-filling shuffle by its number of consumers (observed 238
    "shuffles" for a plan that executes ~20). Exchange lines carry a
    stable ``[plan_id=N]`` (same JVM node → same id at every
    appearance); dedupe on it, falling back to a raw count for lines
    without one."""
    tree = df._jdf.queryExecution().executedPlan().treeString()
    shuffles = broadcasts = reused = 0
    seen: set[str] = set()
    for line in tree.splitlines():
        if re.search(r"\bReusedExchange\b", line):
            kind = "reused"
        elif re.search(r"\bBroadcastExchange\b", line):
            kind = "broadcasts"
        elif re.search(r"\bExchange\b", line):
            kind = "shuffles"
        else:
            continue
        m = re.search(r"\[plan_id=(\d+)\]", line)
        if m:
            if m.group(1) in seen:
                continue
            seen.add(m.group(1))
        if kind == "reused":
            reused += 1
        elif kind == "broadcasts":
            broadcasts += 1
        else:
            shuffles += 1
    return {"shuffles": shuffles, "broadcasts": broadcasts, "reused": reused}


def main() -> int:
    import __spark_entry__ as entrymod
    from aind_hcr_data_transformation_spark.cache import release_persists
    from aind_hcr_data_transformation_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: --json OUT.json [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**entrymod.queries(), **entrymod.production_queries()}
    unknown = only - set(queries)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2

    audit: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            audit[name] = count_exchanges(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - audit must not die mid-sweep
            audit[name] = {"err": str(e)[:200]}
        release_persists()
        row = audit[name]
        print(f"{name}: {row}")

    if json_out:
        Path(json_out).write_text(json.dumps(audit, indent=1, sort_keys=True))
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
