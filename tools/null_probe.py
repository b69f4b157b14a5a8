"""NULL-injection differential: the advisor-findings class, automated.

Every latent cross-engine divergence the round-7/8 advisors found was
the same shape: a query/oracle twin that agrees on the shipped fixtures
but diverges the day a nullable column actually carries NULLs (r7:
``source_schema_evolution``'s parity-CASE vs coalesce; r8: a NULL lang
nulling Spark's whole concatenated URL in ``scalar_url_parse`` while
the oracle's independent string algebra kept host non-NULL).

This tool makes that class testable by construction instead of
advisor-audit luck: it copies a fixture dir, injects NULLs into a
nullable column (default: ``documents.lang``, every doc_id % 7 == 0 —
the column the schema declares nullable and real crawl corpora leave
unset), and runs the FULL registry differential against the mutated
fixtures. A query that treats NULLs differently from its oracle fails
the rows/hash compare right here, before any driver or advisor sees it.

Five mutations run, each against the full registry, every one of which
caught a real latent divergence on its first run:

1. ``documents.lang = NULL`` (und-tagged crawl shards) — caught
   ``scalar_url_parse``'s concat-null-propagation;
2. ``events.value = NULL`` (metric-less telemetry rows) — caught
   ``stream_user_totals``' stateful kernel int()-crashing on NaN;
3. ``events.event_type = NULL`` — caught ``mv_incremental_refresh``
   merging on plain equi-keys (NULL != NULL splits the NULL group the
   oracle's GROUP BY keeps whole);
4. ``events.props = NULL`` — clean on first run (variant/JSON paths
   already try_-guarded);
5. ``documents.text = ''`` (empty, NOT NULL — a NULL text is not a
   document, TESTDATA.md contract) — caught THREE: DuckDB's
   ``array_to_string([])`` being NULL vs Spark's ``array_join`` ''
   (shared dedup mutant corpus), the multimodal magic-u32 oracle
   faking 0x0 for <4-byte payloads, and the CSV roundtrip conflating
   '' with NULL under the default null token;
6. ``tiny`` — every table truncated to a degenerate slice (1-row
   groups, k>n top-k, sketch tie mass, near-empty LSH) — caught
   ``grouped_zscore`` returning 0 where stddev_samp is NULL/0 (SQL
   says NULL) and the quantile-sketch rank-error flags ignoring tie
   mass (a sketch answer's cumulative rank jumps in tie-count steps,
   which dominates the flat 5% at tiny n).

Usage::

    python tools/null_probe.py [src_sf_dir] [--json NULL_PROBE.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()


def build_fixture(src: str, dst: str, mutation: str) -> int:
    """Copy ``src`` fixtures into ``dst`` with one column nulled;
    returns the number of nulled rows. Mutations go through pyarrow so
    every untouched column (including the events ts physical type,
    which varies by fixture generation) survives byte-identical."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    table, key, col, mod, repl = MUTATIONS[mutation]
    for t in TABLES + ["documents"]:
        if t != table:
            shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    tab = pq.read_table(f"{src}/{table}.parquet")
    keys = tab[key].to_numpy()
    mask = pa.array((keys % mod) == 0)
    idx = tab.schema.get_field_index(col)
    mutated = pc.if_else(
        mask, pa.scalar(repl, tab.schema.field(col).type), tab[col]
    )
    tab = tab.set_column(idx, col, mutated)
    pq.write_table(tab, f"{dst}/{table}.parquet")
    return int(pc.sum(mask).as_py())


#: mutation -> (table, key col, mutated col, key modulus, replacement)
MUTATIONS = {
    "lang": ("documents", "doc_id", "lang", 7, None),
    "value": ("events", "event_id", "value", 11, None),
    "event_type": ("events", "event_id", "event_type", 17, None),
    "props": ("events", "event_id", "props", 13, None),
    # r9 advisor: the feed partitioner's `uid % nparts == pid` dropped
    # NULL-keyed rows (NaN == pid is false for every partition) while
    # the file source and oracle kept them — same class as the
    # agg_kmv_distinct NULL-group bug; this stage keeps the column hot
    "user_id": ("events", "event_id", "user_id", 23, None),
    "empty_text": ("documents", "doc_id", "text", 19, ""),
}

#: the degenerate-cardinality stage: tiny slices stress k>n top-k,
#: 1-row groups (stddev_samp NULL), sketch tie mass, near-empty LSH —
#: its first run caught grouped_zscore returning 0 where SQL says NULL
#: and the quantile-sketch flag bound ignoring tie mass
TINY_ROWS = {
    "region": 5, "nation": 25, "customer": 20, "supplier": 5,
    "part": 25, "orders": 40, "lineitem": 120, "events": 60,
    "documents": 12, "embeddings": 18,
}


def build_tiny_fixture(src: str, dst: str) -> int:
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    total = 0
    for t, n in TINY_ROWS.items():
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tab.slice(0, n), f"{dst}/{t}.parquet")
        total += min(n, tab.num_rows)
    return total


def main() -> int:
    argv = sys.argv[1:]
    json_out = "NULL_PROBE.json"
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    src = argv[0] if argv else "/root/testdata/sf0.001"

    stages = {}
    any_fail = False
    descs = {
        m: f"{t}.{c} = {v!r} where {k} % {mod} = 0"
        for m, (t, k, c, mod, v) in MUTATIONS.items()
    }
    descs["tiny"] = "truncate every table to TINY_ROWS slices"
    if only:
        descs = {m: d for m, d in descs.items() if m in only}
    for mutation, desc in descs.items():
        dst = tempfile.mkdtemp(prefix=f"sfnull_{mutation}_")
        try:
            if mutation == "tiny":
                nulled = build_tiny_fixture(src, dst)
            else:
                nulled = build_fixture(src, dst, mutation)
            print(f"[{mutation}] fixture: {dst} ({nulled} mutated rows)", flush=True)
            # chunked fresh processes, the strict_sweep lesson: a single
            # 220-query process can die on one transient DuckDB
            # bad_alloc (observed here too — rc -11 with no record
            # written) and lose the whole stage
            import __spark_entry__ as entrymod

            names = list(entrymod.queries())
            recs: dict = {}
            rc_crashed: list[int] = []  # every crashed chunk's rc
            chunk = 40
            for ci in range(0, len(names), chunk):
                record = os.path.join(dst, f"record_{ci}.json")
                proc = subprocess.run(
                    [
                        sys.executable,
                        "tools/oracle_check.py",
                        dst,
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
                        for l in proc.stdout.splitlines()
                        if l.startswith(("FAIL", "ERR"))
                    )
                )
                if proc.returncode not in (0, 1):
                    # crashed chunk: record EVERY crash rc (r8 advisor:
                    # keeping only the last misreported multi-chunk crash
                    # patterns); per-query failures in the chunk's
                    # partial record still merge below
                    rc_crashed.append(proc.returncode)
                    print(
                        f"[{mutation}] chunk {ci//chunk}: rc {proc.returncode}",
                        flush=True,
                    )
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

            # retry failures AND missing names individually in fresh
            # processes: DuckDB's buffer pool degrades over a 40-query
            # chunk and throws transient bad_allocs (ivfpq_search hit
            # this three times in r8, green alone every time), and a
            # crashed chunk (rc -11) writes no record at all — its
            # queries land in "missing" and deserve the same retry; a
            # genuine mismatch fails again
            missing0 = [n for n in names if n not in recs]
            for name in _failed(recs) + missing0:
                record = os.path.join(dst, f"retry_{name}.json")
                subprocess.run(
                    [
                        sys.executable,
                        "tools/oracle_check.py",
                        dst,
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
                        print(f"[{mutation}] retried {name}", flush=True)
                        recs[name] = part[name]
            failures = _failed(recs)
            missing = [n for n in names if n not in recs]
            any_fail = (
                any_fail or bool(failures) or bool(rc_crashed) or bool(missing)
            )
            stages[mutation] = {
                "mutation": desc,
                "nulled_rows": nulled,
                "n_queries": len(recs),
                "failures": failures,
                "missing": missing,
                "rc_crashed": rc_crashed,
            }
            # incremental write: a crash in a later stage must not lose
            # the finished stages' evidence
            Path(json_out).write_text(
                json.dumps({"src": src, "stages": stages}, indent=1)
            )
        finally:
            shutil.rmtree(dst, ignore_errors=True)

    doc = {"src": src, "stages": stages}
    Path(json_out).write_text(json.dumps(doc, indent=1))
    flagged = {
        m: (s["failures"] or s["missing"] or f"rc {s['rc_crashed']}")
        for m, s in stages.items()
        if s["failures"] or s["missing"] or s["rc_crashed"]
    }
    print(f"wrote {json_out}; failures: {flagged or 'none'}")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
