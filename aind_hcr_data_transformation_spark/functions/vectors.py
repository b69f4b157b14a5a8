"""Embedding-vector math, deterministic across Spark and DuckDB.

Cosine similarity is computed with an explicit left-associated fold over
double-cast elements on BOTH engines — identical IEEE-754 operation
sequences produce bit-identical doubles, so similarity thresholds and
top-k rank cuts agree exactly with the oracle (no tolerance games).

Spark side stays JVM-only: ``zip_with`` + ``aggregate`` run inside
whole-stage codegen — no Python UDF in the hot path (SURVEY §2.11 policy).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dimensionality of the embeddings table (FIXTURES.md §A)
EMB_DIM = 64


def spark_dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float> columns in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def spark_cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return spark_dot(a, b) / (F.sqrt(spark_dot(a, a)) * F.sqrt(spark_dot(b, b)))


def spark_cosine_prenorm(dot: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from a pairwise dot and per-vector squared norms computed
    once per vector (same IEEE op sequence as :func:`spark_cosine`, ~3×
    less per-pair work — the form the O(n²)-ish joins use)."""
    return dot / (F.sqrt(n2a) * F.sqrt(n2b))


def sql_dot(a: str, b: str, dim: int = EMB_DIM) -> str:
    """DuckDB twin of :func:`spark_dot`: explicit left-assoc term chain
    (``list_sum``/aggregate order is unspecified; a chain is not)."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def sql_cosine(a: str, b: str, dim: int = EMB_DIM) -> str:
    """DuckDB twin of :func:`spark_cosine`."""
    return (
        f"(({sql_dot(a, b, dim)})"
        f" / (sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)})))"
    )


# ---------------------------------------------------------------------------
# Spark-SQL string builders for literal-inlined vector math.
#
# Building a codebook-literal expression through the Column API costs one
# py4j round-trip per F.lit — measured ~1.5 s of pure DataFrame
# CONSTRUCTION per 8×64-double codebook at 2–3 ms a call, paid on every
# query build.  Emitting ONE SQL string and parsing it with a single
# F.expr() is the same expression tree (identical analyzed plan, bit-
# identical results) at zero py4j amplification.
# ---------------------------------------------------------------------------


def dlit(v: float) -> str:
    """Exact Spark-SQL double literal: ``repr`` round-trips IEEE-754
    doubles (shortest-exact), and the ``D`` suffix keeps the parser from
    reading the token as DECIMAL.

    Non-finite values would emit unparseable tokens (``infD`` / ``nanD``)
    that fail far from the cause with an opaque parser error, so they are
    rejected here — a codebook literal should never be non-finite; if one
    is, the training input was degenerate and the caller must know.
    """
    f = float(v)
    if not math.isfinite(f):
        raise ValueError(
            f"dlit: non-finite value {f!r} cannot be emitted as a "
            "Spark-SQL double literal — check the codebook / training "
            "input for NaN/inf (e.g. a zero-variance or empty cluster)"
        )
    return repr(f) + "D"


def arr_lit(vals) -> str:
    """``array(...)`` literal of exact double literals."""
    return "array(" + ", ".join(dlit(v) for v in vals) + ")"


def sparksql_dot(a_sql: str, b_sql: str) -> str:
    """Spark-SQL twin of :func:`spark_dot` — the SAME zip_with/aggregate
    left fold, so the analyzed expression (and every IEEE operation) is
    identical to the Column-API form."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def sparksql_sq_l2(a_sql: str, b_sql: str) -> str:
    """Spark-SQL twin of ``vectorops._sq_l2`` (left-folded squared L2)."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0.0D, (acc, v) -> acc + v)"
    )
