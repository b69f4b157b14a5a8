"""Planted-skew differential: null_probe's sibling for the hot-key axis.

100 TB corpora are never uniform: one user emits 30% of events, one
customer places 30% of orders, one language covers 90% of a crawl. The
salted queries (``join_salted_skew``, ``agg_salted_skew``) exist for
exactly this regime — this probe verifies the OTHER ~218 registry
entries survive it too, on both axes that matter:

1. **Correctness under skew** (the null_probe shape): copy a fixture
   dir, redirect a key column's rows onto one existing hot key, run the
   FULL registry differential against the mutated fixtures. Any query
   whose answer depends on arrival order, tie-breaks, or per-group
   assumptions that uniform fixtures masked fails the rows/hash compare
   here, before a driver or advisor sees it. Four stages, one hot axis
   each:

   - ``events_hot_user``   — 30% of events from one user_id;
   - ``orders_hot_cust``   — 30% of orders from one customer;
   - ``lineitem_hot_part`` — 30% of lineitems on one part;
   - ``docs_hot_lang``     — 90% of documents in one language.

   The hot key is the column's own first value, so referential
   integrity against dimension tables is preserved by construction.

2. **Walls under skew** (``--walls``): at sf0.1 build ONE fixture with
   all three fact-table hot keys planted and time the shuffle-heavy
   query set against it and against the pristine dir in the same
   session (pristine first — it absorbs the plan-JIT warm-up, biasing
   AGAINST false greens). A query whose runtime balloons when a single
   key owns 30% of its shuffle input has a hot-partition problem AQE
   didn't absorb; flagged at ratio > 3 AND delta > 2 s (the bench's
   noise floor on this host).

Usage::

    python tools/skew_probe.py [src_sf_dir] [--json SKEW_PROBE.json]
        [--walls /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: stage -> (table, key col used for the deterministic row mask,
#:           mutated col, percent of rows redirected to the hot key)
STAGES = {
    "events_hot_user": ("events", "event_id", "user_id", 30),
    "orders_hot_cust": ("orders", "o_orderkey", "o_custkey", 30),
    "lineitem_hot_part": ("lineitem", "l_orderkey", "l_partkey", 30),
    "docs_hot_lang": ("documents", "doc_id", "lang", 90),
}

#: the shuffle-heavy wall-guard set: every query whose plan carries a
#: key-partitioned shuffle a hot key could pile onto one task (joins,
#: groupBys, window partitions, candidate-pair generators)
WALL_QUERIES = [
    "q3_shipping_priority",
    "q9_product_profit",
    "join_shuffle_equi",
    "join_outer",
    "join_asof",
    "join_asof_nearest",
    "join_bloom_semi",
    "join_salted_skew",
    "agg_salted_skew",
    "agg_kmv_distinct",
    "agg_approx_quantiles",
    "events_rfm_segments",
    "evw_session",
    "udaf_user_median",
    "grouped_zscore",
    "win_running",
    "graph_triangle_count",
    "assoc_basket_rules",
    "rec_item_cosine",
    "dedup_exact",
    "dedup_minhash_fast",
    "text_tfidf_topk",
    "text_rarity_score",
    "ts_changepoint_cusum",
    "stream_user_totals",
    "stream_sessions",
]


def build_skew_fixture(
    src: str, dst: str, stages: list[str]
) -> dict[str, int]:
    """Copy ``src`` into ``dst`` with the named hot-key mutations
    applied (several stages may hit different tables in one fixture).
    Returns stage -> redirected row count. pyarrow end-to-end so every
    untouched column (including the events ts physical type) survives
    byte-identical — the null_probe lesson."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    by_table: dict[str, list[str]] = {}
    for s in stages:
        by_table.setdefault(STAGES[s][0], []).append(s)
    counts: dict[str, int] = {}
    for t in TABLES:
        if t not in by_table:
            shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
            continue
        tab = pq.read_table(f"{src}/{t}.parquet")
        for s in by_table[t]:
            _, key, col, pct = STAGES[s]
            keys = tab[key].to_numpy()
            mask = pa.array((keys % 100) < pct)
            hot = tab[col][0]  # an existing value: FK-safe
            idx = tab.schema.get_field_index(col)
            tab = tab.set_column(
                idx, col, pc.if_else(mask, hot, tab[col])
            )
            counts[s] = int(pc.sum(mask).as_py())
        pq.write_table(tab, f"{dst}/{t}.parquet")
    return counts


def run_registry_differential(
    fixture: str, tag: str
) -> tuple[dict, list[str], list[str], list[int]]:
    """Full queries()-vs-oracle_sql() differential against ``fixture``,
    chunked into fresh processes with individual retry — the
    null_probe/strict_sweep recipe (DuckDB's buffer pool degrades over
    a 40-query chunk; transient bad_allocs are green alone)."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __spark_entry__ as m, json; print(json.dumps(list(m.queries())))",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    names = json.loads(proc.stdout.strip().splitlines()[-1])
    recs: dict = {}
    rc_crashed: list[int] = []
    chunk = 40
    for ci in range(0, len(names), chunk):
        record = os.path.join(fixture, f"record_{ci}.json")
        p = subprocess.run(
            [
                sys.executable,
                "tools/oracle_check.py",
                fixture,
                "--json",
                record,
                *names[ci : ci + chunk],
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        sys.stdout.write(
            "\n".join(
                l
                for l in p.stdout.splitlines()
                if l.startswith(("FAIL", "ERR"))
            )
        )
        if p.returncode not in (0, 1):
            rc_crashed.append(p.returncode)
            print(f"[{tag}] chunk {ci//chunk}: rc {p.returncode}", flush=True)
        if os.path.exists(record):
            part = json.load(open(record))
            recs.update(
                {k: v for k, v in part.items() if not k.startswith("_")}
            )

    def _failed(recset):
        return [
            k
            for k, v in recset.items()
            if not k.startswith("_")
            and isinstance(v, dict)
            and not (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
            )
        ]

    # retry failures AND missing names individually in fresh processes:
    # a failure may be a transient DuckDB bad_alloc (green alone every
    # time observed), and a crashed chunk (rc -11) writes NO record at
    # all, so its queries would otherwise stay "missing" unretried
    missing0 = [n for n in names if n not in recs]
    for name in _failed(recs) + missing0:
        record = os.path.join(fixture, f"retry_{name}.json")
        subprocess.run(
            [
                sys.executable,
                "tools/oracle_check.py",
                fixture,
                "--json",
                record,
                name,
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if os.path.exists(record):
            part = json.load(open(record))
            if name in part:
                print(f"[{tag}] retried {name}", flush=True)
                recs[name] = part[name]
    failures = _failed(recs)
    missing = [n for n in names if n not in recs]
    return recs, failures, missing, rc_crashed


def run_wall_guard(walls_src: str) -> dict:
    """Time WALL_QUERIES against pristine-then-skewed sf0.1 fixtures in
    one session; flag hot-partition blowups (ratio > 3 AND delta > 2 s)."""
    import __spark_entry__ as entrymod

    from aind_hcr_data_transformation_spark.cache import release_persists
    from aind_hcr_data_transformation_spark.session import get_spark

    dst = tempfile.mkdtemp(prefix="sfskew_walls_")
    counts = build_skew_fixture(
        walls_src,
        dst,
        ["events_hot_user", "orders_hot_cust", "lineitem_hot_part"],
    )
    print(f"[walls] skewed fixture: {dst} ({counts})", flush=True)
    queries = {**entrymod.queries(), **entrymod.production_queries()}
    out: dict[str, dict] = {}
    try:
        spark = get_spark("skew-probe")
        spark.sparkContext.setLogLevel("ERROR")
        # pristine first: it pays the per-plan JIT warm-up, so a skewed
        # slowdown is understated rather than manufactured
        for tag, sf in [("base", walls_src), ("skew", dst)]:
            for name in WALL_QUERIES:
                t0 = time.perf_counter()
                queries[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = round(time.perf_counter() - t0, 3)
                release_persists()
                out.setdefault(name, {})[tag] = wall
                print(f"[walls] {tag}:{name}: {wall}s", flush=True)
        spark.stop()
    finally:
        shutil.rmtree(dst, ignore_errors=True)
    flagged = []
    for name, w in out.items():
        ratio = w["skew"] / w["base"] if w["base"] else None
        w["ratio"] = round(ratio, 2) if ratio else None
        if ratio and ratio > 3 and (w["skew"] - w["base"]) > 2:
            flagged.append(name)
            w["flagged"] = True
    return {"fixture_counts": counts, "queries": out, "flagged": flagged}


def main() -> int:
    argv = sys.argv[1:]
    json_out = "SKEW_PROBE.json"
    walls_src = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--walls" in argv:
        i = argv.index("--walls")
        walls_src = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    src = argv[0] if argv else "/root/testdata/sf0.001"

    stages: dict = {}
    any_fail = False
    for stage, (table, key, col, pct) in STAGES.items():
        dst = tempfile.mkdtemp(prefix=f"sfskew_{stage}_")
        try:
            counts = build_skew_fixture(src, dst, [stage])
            print(
                f"[{stage}] fixture: {dst} "
                f"({counts[stage]} rows -> hot {table}.{col})",
                flush=True,
            )
            recs, failures, missing, rc_crashed = run_registry_differential(
                dst, stage
            )
            any_fail = (
                any_fail
                or bool(failures)
                or bool(missing)
                or bool(rc_crashed)
            )
            stages[stage] = {
                "mutation": f"{pct}% of {table}.{col} -> first value",
                "hot_rows": counts[stage],
                "n_queries": len(recs),
                "failures": failures,
                "missing": missing,
                "rc_crashed": rc_crashed,
            }
            # incremental write: a crash in a later stage (or the wall
            # guard) must not lose the finished stages' evidence
            Path(json_out).write_text(
                json.dumps({"src": src, "stages": stages}, indent=1)
            )
        finally:
            shutil.rmtree(dst, ignore_errors=True)

    doc: dict = {"src": src, "stages": stages}
    if walls_src:
        doc["walls"] = run_wall_guard(walls_src)
        any_fail = any_fail or bool(doc["walls"]["flagged"])

    Path(json_out).write_text(json.dumps(doc, indent=1))
    flagged = {
        m: (s["failures"] or s["missing"] or f"rc {s['rc_crashed']}")
        for m, s in stages.items()
        if s["failures"] or s["missing"] or s["rc_crashed"]
    }
    if walls_src and doc["walls"]["flagged"]:
        flagged["walls"] = doc["walls"]["flagged"]
    print(f"wrote {json_out}; failures: {flagged or 'none'}")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
