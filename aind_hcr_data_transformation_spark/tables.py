"""Table catalog for the synthetic test corpus.

Explicit schemas on every scan (SURVEY §1.4: the reference validates all
config up front with pydantic, ``models.py:23-81``; production scans should
never rely on inference). Schemas double as documentation of the contract in
/root/repo/FIXTURES.md §A.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts: fixture generations have shipped it both as plain
    # TIMESTAMP(MICROS) and as TIMESTAMP(NANOS, isAdjustedToUTC=false).
    # Spark's vectorized reader cannot decode the NANOS flavor as
    # TimestampType, so load_table sniffs the parquet footer and, for
    # nanos files only, reads raw longs
    # (spark.sql.legacy.parquet.nanosAsLong=true, set in session.py) and
    # floors to micros — the same truncation DuckDB applies. The declared
    # TimestampType below is the post-load contract either way.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# memoized footer sniff: one pyarrow metadata read per events file
# (path, mtime), on the driver, to pick the decode branch for the ts
# column.  The mtime in the key makes an in-place fixture regeneration
# during a long session take the (possibly different) new encoding
# instead of a stale memo.
_TS_NANOS_CACHE: dict[tuple[str, float], bool] = {}


def events_ts_is_nanos(path: str) -> bool:
    """True when ``path``'s ``ts`` column is TIMESTAMP(NANOS) (legacy
    fixture encoding that Spark must read as raw longs), False for the
    directly-decodable MICROS/MILLIS encodings.

    The decision reads the parquet *logical-type unit*
    (``field.type.unit``), never a physical-type guess: a bare INT64
    ``ts`` with no timestamp annotation is ambiguous (nanos? micros?
    epoch seconds?) and silently dividing it by 1000 would shift every
    event by three orders of magnitude — that case raises instead."""
    key = (path, os.path.getmtime(path))
    if key not in _TS_NANOS_CACHE:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.ParquetFile(path).schema_arrow.field("ts").type
        if not pa.types.is_timestamp(t):
            raise TypeError(
                f"events ts column in {path} has non-timestamp type {t}; "
                "an unannotated integer epoch is ambiguous (nanos vs micros "
                "vs seconds) — regenerate the fixture with a parquet "
                "TIMESTAMP logical type"
            )
        _TS_NANOS_CACHE[key] = t.unit == "ns"
    return _TS_NANOS_CACHE[key]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Scan one parquet table with its declared schema.

    Declaring the schema (instead of inferring) keeps column pruning and
    predicate pushdown precise and skips the footer-sampling job.

    ``spread=True`` round-robin-repartitions the scan to the session's
    default parallelism.  The fixture files are single-row-group
    parquet, so the scan yields ONE input partition and everything
    upstream of the first shuffle runs on one core — for operators whose
    pre-shuffle stage is CPU-bound (shingle explosion, regex scrubbing,
    per-vector folds, Arrow decode), that single core is the whole
    wall-clock.  Production inputs arrive as many files/row groups and
    get split parallelism for free, so the exchange is a fixture-layout
    artifact, not a scale-path cost; scan-dominated consumers (the
    relational/TPC-H queries) skip it — an extra full-table exchange
    before a pushed-down scan filter would be pure overhead there.
    Only order-independent consumers may opt in (integer/decimal
    aggregates, per-row folds, md5 — NOT raw float sums, which are
    partition-order-dependent).
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # The driver hands queries a session we didn't build; timestamp semantics
    # must not depend on its timezone config (oracle agreement needs UTC).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and events_ts_is_nanos(path):
        from pyspark.sql import functions as F

        # the driver hands queries a session we didn't build; the nanos
        # long-read needs this legacy flag and it is runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in SCHEMAS[name]
            ]
        )
        df = spark.read.schema(schema).parquet(path)
        # integer `div`, not `/`: nano epochs (~1.7e18) exceed double's 2^53
        # exact-integer range, so float division drifts by ±1 µs.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.schema(SCHEMAS[name]).parquet(path)
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan the full corpus as a name → DataFrame catalog."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


# memoized table row counts: the size-derived operator parameters
# (dedup df cap, LSH widths) each need the corpus count, and several
# queries run per session — one parquet metadata count per (sf_dir,
# table), not one per query call. Fixture tables are immutable for a
# session's lifetime.
_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of one fixture table, memoized per (sf_dir, table)."""
    key = (sf_dir, name)
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = load_table(spark, sf_dir, name).count()
    return _COUNT_CACHE[key]


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works directly."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
