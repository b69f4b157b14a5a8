"""Cross-engine determinism helpers for the DuckDB differential oracle.

Spark's ``round()`` on DOUBLE rounds the value's shortest decimal
representation (java.math.BigDecimal.valueOf → HALF_UP) while DuckDB rounds
the binary value — so a mean that prints as ``4201.315`` rounds to 4201.32
in Spark and 4201.31 in DuckDB. Both engines agree when the value is first
brought to an exact DECIMAL(30,10) and *then* rounded, so every float
emitted by an oracle-checked query goes through :func:`dround` (Spark) and
:func:`sql_round` (oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 2) -> Column:
    """Deterministic cross-engine round: double → decimal(30,10) → round → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(30,10)"), scale).cast("double")


def sql_round(expr: str, scale: int = 2) -> str:
    """The DuckDB-side twin of :func:`dround` as a SQL fragment."""
    return f"CAST(round(CAST(({expr}) AS DECIMAL(30,10)), {scale}) AS DOUBLE)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum for oracle-checked revenue-scale values:
    per-row cast to exact DECIMAL(30,10) (deterministic in both engines),
    then exact decimal summation — immune to partition-count/merge-order
    float drift that plain double sums accumulate. Pair with
    :func:`sql_sum` on the DuckDB side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(30,10)")).cast("double")


def sql_sum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(30,10))) AS DOUBLE)"


def dsum_round(col: Column | str, scale: int = 2) -> Column:
    """Sum-then-round entirely in exact decimal, cast to double LAST.

    ``dround(dsum(x))`` has a latent boundary bug: the exact decimal sum
    is cast to double before rounding, so a sum landing exactly on a
    ``.xx5`` boundary renders as ``…4999…`` or ``…5000…1`` binary and the
    two engines round it differently (observed: 609149.945 → .95 Spark /
    .94 DuckDB). Rounding the DECIMAL itself (HALF_UP in Spark, half-away
    -from-zero in DuckDB — identical for the positive sums we emit) is
    exact in both engines. Pair with :func:`sql_sum_round`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(30,10)")), scale).cast("double")


def sql_sum_round(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum_round`."""
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(30,10))), {scale}) AS DOUBLE)"
