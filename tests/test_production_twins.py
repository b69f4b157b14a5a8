"""Accuracy pins for the production sketch twins.

These queries live in ``production_queries()`` (no DuckDB oracle — their
outputs are engine-specific sketch estimates), so THIS file is their
correctness gate: each estimate must sit inside the sketch's documented
error bound of the exact answer computed side-by-side.  The registry
contract itself is also pinned: every driver-visible ``queries()`` entry
must carry an ``oracle_sql()`` twin (zero ``no_oracle`` rows in the
driver's CORRECTNESS artifact), and the side registry must stay disjoint.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_registry_contract():
    """Driver-visible queries are all oracle-paired; production twins are
    a disjoint side registry (this is what keeps CORRECTNESS_r{N} free of
    err rows)."""
    import __spark_entry__ as m

    q, o, p = m.queries(), m.oracle_sql(), m.production_queries()
    assert set(q) == set(o), (
        f"driver-visible queries without an oracle: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )
    assert not (set(q) & set(p)), sorted(set(q) & set(p))
    assert set(p) == {
        "agg_hll_only",
        "agg_quantiles_sketch_only",
        "agg_hll_merge_shards",
        "dedup_minhash_fast",
    }


def test_hll_only_within_error_bound(spark, queries):
    """approx_count_distinct(rsd=0.02) per returnflag must land within a
    conservative 3*rsd of the exact distinct (HLL++ rsd is a standard
    deviation; 6% ~= 3 sigma at this cardinality)."""
    from aind_hcr_data_transformation_spark.tables import load_table

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in queries["agg_hll_only"](spark, SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.06 * n), (k, approx[k], n)


def test_quantiles_sketch_only_rank_accuracy(spark, queries):
    """The GK sketch's p50/p95 answers must have true cumulative rank
    within 5% of target per group — the same rank-based gate the
    calibration twin (``agg_approx_quantiles``) hash-checks, applied to
    the production one-pass plan."""
    from aind_hcr_data_transformation_spark.tables import load_table

    rows = queries["agg_quantiles_sketch_only"](spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    got = {r["l_returnflag"]: (r["approx_p50"], r["approx_p95"]) for r in rows}
    # per group, true cumulative rank of each sketch answer
    checks = []
    for rf, (p50, p95) in got.items():
        g = li.filter(F.col("l_returnflag") == rf).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_quantity") <= F.lit(p50)).cast("int")).alias("c50"),
            F.sum((F.col("l_quantity") <= F.lit(p95)).cast("int")).alias("c95"),
        ).collect()[0]
        checks.append((rf, g["n"], g["c50"], g["c95"]))
    assert checks
    for rf, n, c50, c95 in checks:
        assert abs(c50 / n - 0.5) <= 0.05, (rf, c50 / n)
        assert abs(c95 / n - 0.95) <= 0.05, (rf, c95 / n)


def test_quantile_calibration_flags(spark, queries):
    """The calibration twin's own gate, pinned where the bench no longer
    times it (VERDICT r8 task 3: ``agg_approx_quantiles`` is excluded
    from the timed loop as calibration scaffolding — this pin keeps the
    exact-vs-sketch rank check enforced): every group's sketch answer
    must land within the rank bound, i.e. the hash-compared ok flags are
    all true, and the exact interpolated percentiles are present."""
    rows = queries["agg_approx_quantiles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["ok_p50"] is True, (r["l_returnflag"], "p50")
        assert r["ok_p95"] is True, (r["l_returnflag"], "p95")
        assert r["exact_p50"] is not None and r["exact_p95"] is not None
