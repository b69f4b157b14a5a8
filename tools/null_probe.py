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

Usage::

    python tools/null_probe.py [src_sf_dir] [--json NULL_PROBE.json]

Scope note: ``documents.text`` is deliberately NOT nullified — half the
text operators define their corpus as "the documents" and a NULL text
is not a document; the pipeline contract (TESTDATA.md) keeps text
non-null, and frame_sample-style guards for hypothetical regens are
pinned in their own tests. ``lang`` is the column with a real
NULL-bearing production story (und-tagged crawl shards).
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


def build_fixture(src: str, dst: str) -> int:
    """Copy ``src`` fixtures into ``dst`` with NULL lang on every
    doc_id % 7 == 0 row; returns the number of nulled rows."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang
          )
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    (n,) = con.execute(
        f"SELECT count(*) FILTER (lang IS NULL) "
        f"FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()
    return int(n)


def main() -> int:
    argv = sys.argv[1:]
    json_out = "NULL_PROBE.json"
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    src = argv[0] if argv else "/root/testdata/sf0.001"

    dst = tempfile.mkdtemp(prefix="sfnull_")
    try:
        nulled = build_fixture(src, dst)
        print(f"fixture: {dst} ({nulled} NULL-lang rows)", flush=True)
        # one fresh process for the whole differential (same contract as
        # the round-end ritual's oracle_check runs)
        record = os.path.join(dst, "record.json")
        proc = subprocess.run(
            [sys.executable, "tools/oracle_check.py", dst, "--json", record],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        sys.stdout.write(
            "\n".join(
                l
                for l in proc.stdout.splitlines()
                if l.startswith(("FAIL", "ERR")) or "failures" in l
            )
            + "\n"
        )
        recs = {}
        if os.path.exists(record):
            recs = json.load(open(record))
        failures = [
            k
            for k, v in recs.items()
            if not k.startswith("_")
            and isinstance(v, dict)
            and not (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
            )
        ]
        doc = {
            "src": src,
            "nulled_rows": nulled,
            "mutation": "documents.lang = NULL where doc_id % 7 = 0",
            "n_queries": len([k for k in recs if not k.startswith("_")]),
            "failures": failures,
            "rc": proc.returncode,
        }
        Path(json_out).write_text(json.dumps(doc, indent=1))
        print(f"wrote {json_out}; failures: {failures or 'none'}")
        return 1 if failures or proc.returncode else 0
    finally:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
