"""Arrow/physical type-family audit of every oracle vs its Spark twin.

The round-6 driver red (``layout_compaction_plan``) — and round 5's
(``scalar_variant_json``) — were **type-level**, not value-level: DuckDB
``sum(INTEGER)`` / ``//`` return HUGEINT, which materializes through
Arrow as ``decimal128(38,0)`` while Spark emits ``bigint``.  Values are
identical; the driver's hasher sees the physical type and flags a
mismatch.  Local ``fetchall()`` comparison collapses both to Python
``int`` and is blind to the entire class.

This tool kills the class: for every registered oracle it asks DuckDB
for the oracle's output types **without executing it** (``DESCRIBE
SELECT ...``) and compares the *type family* of each column against the
Spark twin's analyzed schema.  Families: int / float / decimal / string
/ bool / date / timestamp / interval / list / struct / map / binary.
Any family divergence (most importantly DuckDB HUGEINT/DECIMAL vs Spark
int) is reported; ``--json`` writes the audit artifact.

Used two ways:
  * standalone sweep:  python tools/type_audit.py [sf_dir] [names...]
  * as a library by ``tests/test_oracle_types.py`` (the permanent gate)
    and by ``tools/oracle_check.py`` (driver-faithful local check).
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_family(t: str) -> str:
    """Map a DuckDB type string (from DESCRIBE) to a comparison family."""
    t = t.strip().upper()
    if t.endswith("[]") or t.startswith(("LIST", "ARRAY")):
        return "list"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith("MAP"):
        return "map"
    if t.startswith("DECIMAL") or t == "HUGEINT" or t == "UHUGEINT":
        # HUGEINT materializes through Arrow as decimal128(38,0): the
        # driver-visible family is decimal even though values are ints.
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR", "UUID", "ENUM"):
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP") or t.startswith("TIME"):
        return "timestamp"
    if t.startswith("INTERVAL"):
        return "interval"
    if t in ("BLOB", "BYTEA", "BINARY", "VARBINARY", "BIT"):
        return "binary"
    return f"other:{t}"


def spark_family(dt) -> str:
    """Map a Spark DataType to the same comparison family."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DayTimeIntervalType):
        return "interval"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return f"other:{dt.simpleString()}"


def describe_oracle(con, sql: str) -> dict[str, str]:
    """Column -> DuckDB type for an oracle, WITHOUT executing the query."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def audit_one(con, name: str, sql: str, spark_schema) -> list[dict]:
    """Family mismatches for one (oracle, spark-schema) pair."""
    dtypes = describe_oracle(con, sql)
    sfam = {f.name: spark_family(f.dataType) for f in spark_schema.fields}
    out = []
    for col, dt in dtypes.items():
        dfam = duckdb_family(dt)
        if col not in sfam:
            out.append({"query": name, "col": col, "duckdb": dt,
                        "duckdb_family": dfam, "spark": "<missing>",
                        "spark_family": "<missing>"})
            continue
        if dfam != sfam[col]:
            sdt = next(f.dataType.simpleString()
                       for f in spark_schema.fields if f.name == col)
            out.append({"query": name, "col": col, "duckdb": dt,
                        "duckdb_family": dfam, "spark": sdt,
                        "spark_family": sfam[col]})
    return out


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from aind_hcr_data_transformation_spark.cache import release_persists
    from aind_hcr_data_transformation_spark.session import get_spark

    spark = get_spark("type-audit")
    con = connect(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    mismatches: list[dict] = []
    errors: list[dict] = []
    n = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        n += 1
        try:
            schema = queries[name](spark, sf_dir).schema
        except Exception as e:
            errors.append({"query": name, "err": f"spark: {e}"})
            print(f"ERR   {name}: spark: {e}")
            continue
        finally:
            release_persists()
        try:
            mm = audit_one(con, name, sql, schema)
        except Exception as e:
            errors.append({"query": name, "err": f"duckdb: {e}"})
            print(f"ERR   {name}: duckdb: {e}")
            continue
        if mm:
            mismatches.extend(mm)
            for m in mm:
                print(f"MISMATCH {name}.{m['col']}: duckdb {m['duckdb']} "
                      f"({m['duckdb_family']}) vs spark {m['spark']} "
                      f"({m['spark_family']})")
        else:
            print(f"OK    {name}")
    print(f"\n{n} oracles audited, {len(mismatches)} column mismatches, "
          f"{len(errors)} errors")
    if json_out:
        Path(json_out).write_text(json.dumps({
            "_meta": {"tool": "tools/type_audit.py", "sf_dir": sf_dir,
                      "n_oracles": n, "n_mismatches": len(mismatches),
                      "n_errors": len(errors),
                      "ts": time.strftime("%Y-%m-%dT%H:%M:%S")},
            "mismatches": mismatches, "errors": errors}, indent=1))
        print(f"wrote {json_out}")
    return 1 if (mismatches or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
