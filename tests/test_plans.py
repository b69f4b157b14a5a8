"""Planner invariants — mirrors the reference's own test strategy
(SURVEY §5: partition round-robin multiset equality
``tests/test_zeiss_job.py:43-57``; planner validation
``tests/test_compress/test_zarr_writer.py:16-61``)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given
from hypothesis import strategies as st

from aind_hcr_data_transformation_spark.plans.blocks import (
    byte_size,
    expand_chunks,
    gen_slices,
    generate_jumps,
    get_block_shape,
)
from aind_hcr_data_transformation_spark.plans.partitioning import partition_list


class TestGenerateJumps:
    def test_basic(self):
        assert generate_jumps(40, 16) == [0, 16, 32]
        assert generate_jumps(128, 128) == [0]
        assert generate_jumps(129, 128) == [0, 128]

    def test_invalid(self):
        with pytest.raises(ValueError):
            generate_jumps(0, 16)
        with pytest.raises(ValueError):
            generate_jumps(10, 0)

    @given(st.integers(1, 10_000), st.integers(1, 512))
    def test_covers_extent(self, n, jump):
        jumps = generate_jumps(n, jump)
        assert jumps[0] == 0
        assert jumps[-1] < n
        assert all(b - a == jump for a, b in zip(jumps, jumps[1:]))
        assert len(jumps) == math.ceil(n / jump)


class TestGenSlices:
    def test_exact_tiling(self):
        tiles = list(gen_slices((4, 4), (2, 2)))
        assert len(tiles) == 4
        assert tiles[0] == (slice(0, 2), slice(0, 2))
        assert tiles[-1] == (slice(2, 4), slice(2, 4))

    def test_truncated_edges(self):
        tiles = list(gen_slices((5, 3), (2, 2)))
        assert tiles[-1] == (slice(4, 5), slice(2, 3))

    @given(
        st.tuples(st.integers(1, 40), st.integers(1, 40), st.integers(1, 40)),
        st.tuples(st.integers(1, 17), st.integers(1, 17), st.integers(1, 17)),
    )
    def test_partition_of_space(self, shape, block):
        """Tiles are disjoint and cover every cell exactly once."""
        import numpy as np

        cover = np.zeros(shape, dtype=int)
        for sl in gen_slices(shape, block):
            cover[sl] += 1
        assert (cover == 1).all()

    def test_rank_mismatch(self):
        with pytest.raises(ValueError):
            list(gen_slices((4, 4), (2,)))


class TestExpandChunks:
    def test_validation(self):
        # mirrors tests/test_compress/test_zarr_writer.py:29-38
        with pytest.raises(ValueError):
            expand_chunks((0, 1, 1), (5, 5, 5), 100, 2)
        with pytest.raises(ValueError):
            expand_chunks((6, 1, 1), (5, 5, 5), 100, 2)
        with pytest.raises(ValueError):
            expand_chunks((1, 1, 1), (5, 5, 5), 0, 2)
        with pytest.raises(ValueError):
            byte_size((0, 3), 2)

    def test_clamped_to_shape(self):
        # get_block_shape clamps base chunks to the array before expanding
        # (zarr_writer.py:215-247); expand_chunks itself rejects oversize
        out = get_block_shape((1, 1, 64, 64, 64), 2, target_size_mb=10**6)
        assert out == (64, 64, 64)

    @given(
        st.tuples(st.integers(1, 64), st.integers(1, 64), st.integers(1, 64)),
        st.integers(1, 6),
        st.sampled_from(["iso", "cycle"]),
    )
    def test_never_exceeds_shape(self, chunks, mult, mode):
        shape = tuple(c * mult for c in chunks)
        out = expand_chunks(chunks, shape, 1 << 30, 2, mode)
        assert all(o <= s for o, s in zip(out, shape))
        assert all(o >= 1 for o in out)

    def test_block_shape_target(self):
        # 19,200 MB job default (models.py:77-81) against a big array
        shape = (1, 1, 4096, 8192, 8192)
        out = get_block_shape(shape, itemsize=2, target_size_mb=19_200)
        size_mb = byte_size(out, 2) / 1024 / 1024
        assert 0.25 * 19_200 <= size_mb <= 2 * 19_200


class TestPartitionList:
    def test_round_robin(self):
        # mirrors tests/test_zeiss_job.py:43-57 invariants
        items = [f"s{i}" for i in range(11)]
        parts = partition_list(items, 4)
        assert len(parts) == 4
        assert sorted(sum(parts, [])) == sorted(items)
        assert [len(p) for p in parts] == [3, 3, 3, 2]
        assert parts[0] == ["s0", "s4", "s8"]

    def test_invalid(self):
        with pytest.raises(ValueError):
            partition_list([1], 0)

    @given(st.lists(st.integers(), max_size=200), st.integers(1, 17))
    def test_multiset_preserved(self, items, n):
        parts = partition_list(items, n)
        assert len(parts) == n
        assert sorted(sum(parts, [])) == sorted(items)
        # balanced: sizes differ by at most 1
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1


class TestAssignRoundRobin:
    def test_two_phase_matches_single_sort_and_partition_list(self, spark):
        """The two-phase ordinal (range sort -> per-partition row_number +
        broadcast offsets) must reproduce the single-sort global
        row_number assignment exactly, i.e. the same deal as the pure
        ``partition_list`` twin — including duplicate keys, which the
        RangePartitioner keeps inside one partition."""
        from aind_hcr_data_transformation_spark.cache import release_persists
        from aind_hcr_data_transformation_spark.plans.partitioning import (
            assign_round_robin,
            partition_list,
        )

        paths = [f"SPIM/s{i % 7}_{i:03d}.czi" for i in range(53)] + [
            "SPIM/dup.czi"
        ] * 4
        df = spark.createDataFrame([(p,) for p in paths], "path string")
        n = 4
        got = {
            (r["path"], r["partition_id"])
            for r in assign_round_robin(df, n).collect()
        }
        release_persists()
        expect = {
            (p, pid)
            for pid, part in enumerate(partition_list(sorted(paths), n))
            for p in part
        }
        assert got == expect

    def test_small_path_matches_two_phase(self, spark):
        """``small=True`` (single-window metadata-scale fast path) must
        produce the identical assignment as the default two-phase plan."""
        from aind_hcr_data_transformation_spark.cache import release_persists
        from aind_hcr_data_transformation_spark.plans.partitioning import (
            assign_round_robin,
        )

        paths = [f"SPIM/s{i % 5}_{i:03d}.czi" for i in range(31)] + [
            "SPIM/dup.czi"
        ] * 3
        df = spark.createDataFrame([(p,) for p in paths], "path string")
        n = 3
        small = {
            (r["path"], r["partition_id"])
            for r in assign_round_robin(df, n, small=True).collect()
        }
        two_phase = {
            (r["path"], r["partition_id"])
            for r in assign_round_robin(df, n).collect()
        }
        release_persists()
        assert small == two_phase

    def test_invalid_n(self, spark):
        from aind_hcr_data_transformation_spark.plans.partitioning import (
            assign_round_robin,
        )

        df = spark.createDataFrame([("a",)], "path string")
        with pytest.raises(ValueError):
            assign_round_robin(df, 0)


def test_grouped_row_number_matches_window(spark):
    """Two-phase per-group rank == the single-reducer window formulation:
    rank i in group g holds the i-th smallest value in both (ties make
    per-row assignment arbitrary but the (group, rank, value) set is
    deterministic)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.plans.partitioning import (
        grouped_row_number,
    )

    rows = [(g, v) for g in ("a", "b", "c") for v in (5, 1, 3, 3, 9, 1, 7)]
    df = spark.createDataFrame(rows, "g string, v int").repartition(7)
    two_phase = {
        (r["g"], r["rn"], r["v"])
        for r in grouped_row_number(df, "g", "v").collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    windowed = {
        (r["g"], r["rn"], r["v"])
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert two_phase == windowed and len(two_phase) == len(rows)


def test_grouped_row_number_null_groups(spark):
    """NULL group values rank as their own group, exactly like the
    window formulation — no dropped rows, no driver crash."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.plans.partitioning import (
        grouped_row_number,
    )

    rows = [("a", 2), (None, 5), ("a", 1), (None, 3), (None, 4)]
    df = spark.createDataFrame(rows, "g string, v int").repartition(3)
    got = {
        (r["g"], r["rn"], r["v"])
        for r in grouped_row_number(df, "g", "v").collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r["g"], r["rn"], r["v"])
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want and len(got) == len(rows)


def test_grouped_row_number_all_null_groups(spark):
    """ALL group values NULL: schema inference over the collected census
    would fail ('Some of types cannot be determined'); the offsets frame
    takes its group-column type from the input schema instead, so the
    docstring's NULL-groups promise holds even in the degenerate case."""
    from aind_hcr_data_transformation_spark.plans.partitioning import (
        grouped_row_number,
    )

    rows = [(None, 4), (None, 2), (None, 9), (None, 2)]
    df = spark.createDataFrame(rows, "g string, v int").repartition(2)
    got = sorted(
        (r["rn"], r["v"]) for r in grouped_row_number(df, "g", "v").collect()
    )
    assert [rn for rn, _ in got] == [1, 2, 3, 4]
    assert [v for _, v in got] == [2, 2, 4, 9]


def test_grouped_row_number_decimal_group(spark):
    """A DecimalType group column round-trips through the collected
    census with its exact type (Python inference would type Decimal
    values as DECIMAL(38,18) and break the offsets join)."""
    from decimal import Decimal

    from aind_hcr_data_transformation_spark.plans.partitioning import (
        grouped_row_number,
    )

    rows = [
        (Decimal("1.50"), 7), (Decimal("1.50"), 3), (Decimal("2.25"), 5)
    ]
    df = spark.createDataFrame(rows, "g decimal(10,2), v int")
    got = {
        (str(r["g"]), r["rn"], r["v"])
        for r in grouped_row_number(df, "g", "v").collect()
    }
    assert got == {("1.50", 1, 3), ("1.50", 2, 7), ("2.25", 1, 5)}


def test_grouped_row_number_struct_order_key(spark):
    """The two-phase distributed rank must accept a STRUCT order column
    (the RFM usage: (metric, unique_tiebreak)) and produce, per group, a
    permutation 1..n ordered exactly by the struct's lexicographic
    order — including under a constant group (global rank) and NULL
    group values."""
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.plans.partitioning import (
        grouped_row_number,
    )

    rows = [
        # (group, metric, id) with metric ties broken by id
        ("a", 5, 1), ("a", 5, 2), ("a", 1, 3), ("a", 9, 4),
        ("b", 2, 5), ("b", 2, 6), ("b", 0, 7),
        (None, 7, 8), (None, 3, 9),
    ]
    df = spark.createDataFrame(rows, "g string, m int, id int").withColumn(
        "_k", F.struct("m", "id")
    )
    out = grouped_row_number(df, "g", "_k", "rn").collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["g"], []).append((r["m"], r["id"], r["rn"]))
    for g, items in by_group.items():
        items.sort(key=lambda t: (t[0], t[1]))
        assert [t[2] for t in items] == list(range(1, len(items) + 1)), g

    # constant group == global rank over the struct key
    glob = df.withColumn("_one", F.lit(1))
    out2 = sorted(
        (r["m"], r["id"], r["rn"])
        for r in grouped_row_number(glob, "_one", "_k", "rn").collect()
    )
    assert [t[2] for t in out2] == list(range(1, len(rows) + 1))
