"""Registry-wide Arrow/physical type gate for every DuckDB oracle.

Rounds 5 and 6 each had exactly one driver-red (``scalar_variant_json``,
``layout_compaction_plan``) caused not by values but by **physical
type**: DuckDB ``sum(INTEGER)`` / integer ``//`` return HUGEINT, which
materializes through Arrow as ``decimal128(38,0)`` while the Spark twin
emits ``bigint``.  Local ``fetchall()`` comparison collapses both to
Python ``int``, so the class was invisible until the driver's hasher
rotated onto an exposed oracle (VERDICT r6 "What's wrong" #1 lists the
12 latent queries; all now CAST to BIGINT).

This gate closes the class permanently: every registered oracle's output
types are fetched via ``DESCRIBE`` (no execution — the whole sweep is
sub-second) and asserted free of HUGEINT/DECIMAL columns unless the
Spark twin is decimal too.  Today NO Spark twin emits decimal (all
decimal-routed float work is CAST back to DOUBLE per the compat
discipline), so the allowlist is empty; add ``(query, col)`` pairs there
if a genuinely-decimal twin ever lands.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

from tools.type_audit import connect, describe_oracle, duckdb_family

SF_DIR = "/root/testdata/sf0.001"

#: (query, column) pairs where a decimal-family oracle output is
#: INTENTIONAL because the Spark twin also emits DecimalType.
DECIMAL_ALLOWED: set[tuple[str, str]] = set()


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as entrymod

    con = connect(SF_DIR)
    out = {}
    for name, sql in entrymod.oracle_sql().items():
        out[name] = describe_oracle(con, sql)
    con.close()
    return out


def test_no_hugeint_or_decimal_oracle_columns(oracle_types):
    """No oracle output column may materialize as Arrow decimal128
    (DuckDB HUGEINT / DECIMAL) unless the Spark twin is decimal too."""
    bad = []
    for name, cols in oracle_types.items():
        for col, dt in cols.items():
            if duckdb_family(dt) == "decimal" and (name, col) not in DECIMAL_ALLOWED:
                bad.append((name, col, dt))
    assert not bad, (
        "HUGEINT/DECIMAL oracle outputs (driver Arrow-hash hazard — "
        "CAST(... AS BIGINT) them): " + repr(bad)
    )


def test_no_unmappable_oracle_types(oracle_types):
    """Every oracle column maps to a known comparison family (a new
    DuckDB type slipping in would silently dodge the family check)."""
    odd = [
        (name, col, dt)
        for name, cols in oracle_types.items()
        for col, dt in cols.items()
        if duckdb_family(dt).startswith("other:")
    ]
    assert not odd, f"unmapped DuckDB oracle types: {odd}"
