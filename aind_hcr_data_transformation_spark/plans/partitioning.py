"""Deterministic work partitioning.

The reference statically splits the sorted stack list round-robin across
SLURM array tasks (``partition_list``, ``zeiss_job.py:29-40``;
``models.py:35-45``; ``scripts/submit_job.sh:17-21``) with zero inter-node
communication. In Spark the *scheduler* owns placement, so the only thing
worth preserving is the reproducible assignment itself — used for output
layout, resumability, and parity tests against the reference's invariants
(``tests/test_zeiss_job.py:43-57``: partition count and multiset equality).
"""

from __future__ import annotations

from typing import Sequence, TypeVar

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

T = TypeVar("T")


def partition_list(items: Sequence[T], n_partitions: int) -> list[list[T]]:
    """Round-robin deal of ``items`` into ``n_partitions`` sublists
    (pure twin of ``zeiss_job.py:29-40``): item *i* → partition
    ``i % n_partitions``. Preserves the multiset and per-partition order."""
    if n_partitions <= 0:
        raise ValueError(f"n_partitions must be positive, got {n_partitions}")
    out: list[list[T]] = [[] for _ in range(n_partitions)]
    for i, item in enumerate(items):
        out[i % n_partitions].append(item)
    return out


def assign_round_robin(
    df: DataFrame, n_partitions: int, order_by: str = "path"
) -> DataFrame:
    """Distributed twin: adds ``partition_id`` via
    ``row_number() over (order by <order_by>)`` — the explicit total order
    makes the assignment reproducible across runs and clusters, unlike
    ``monotonically_increasing_id`` (SURVEY §7 hard-part 5).

    The global row_number sort is a single-reducer shuffle, fine for stack
    *catalogs* (≤ millions of rows), never for voxel data.
    """
    if n_partitions <= 0:
        raise ValueError(f"n_partitions must be positive, got {n_partitions}")
    w = Window.orderBy(order_by)
    return df.withColumn(
        "partition_id",
        ((F.row_number().over(w) - 1) % n_partitions).cast("int"),
    )
