"""Semantic pins for the round-5 additions beyond their oracle checks:
planted changepoints, nearest-asof tie/direction rules, rechunk-plan
conservation invariants, LPA determinism, Matryoshka recall bounds.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from tests.conftest import SF_DIR


def _ts(minute: int):
    return datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc).replace(
        tzinfo=None
    )


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Tiny events fixture: user 1 has a planted level shift, user 2 has
    purchases placed to exercise every nearest-asof branch, user 3 has
    no purchases at all."""
    d = tmp_path_factory.mktemp("r5b_sf")
    rows = []
    # user 1: 10 zeros then 10 tens -> mean 5, |CUSUM| peaks at i=10
    for i in range(20):
        rows.append(
            (100 + i, _ts(i), 1, "view", 0.0 if i < 10 else 10.0, "{}")
        )
    # user 2: purchases at minute 0 (value 1.0) and 30 (value 2.0);
    # probes at 10 (backward nearer), 20 (forward nearer), 15 (tie->backward)
    rows += [
        (200, _ts(0), 2, "purchase", 1.0, "{}"),
        (201, _ts(10), 2, "view", 0.0, "{}"),
        (202, _ts(15), 2, "view", 0.0, "{}"),
        (203, _ts(20), 2, "view", 0.0, "{}"),
        (204, _ts(30), 2, "purchase", 2.0, "{}"),
    ]
    # user 3: no purchases -> NULL enrichment
    rows += [(300, _ts(5), 3, "view", 7.0, "{}")]
    # single parquet FILE (like the real fixtures): tables.events_ts_is_nanos
    # sniffs the footer at exactly this path
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_purchase_dir(spark, tmp_path_factory):
    """User 4: a NULL-valued purchase nearer than a valued one — the
    review-found divergence case (Spark used to gate the purchase
    timestamp on pv IS NOT NULL while the oracle gates on event_type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("r5b_nullp")
    rows = [
        (400, _ts(0), 4, "purchase", None, "{}"),
        (401, _ts(1), 4, "view", 0.0, "{}"),
        (402, _ts(30), 4, "purchase", 5.0, "{}"),
    ]
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def test_asof_nearest_null_valued_purchase(spark, queries, null_purchase_dir):
    """A NULL-valued purchase still wins on distance; its value arrives
    as NULL — matching the oracle's event_type gate (and
    join_asof_tolerance's convention)."""
    rows = {
        r["event_id"]: r
        for r in queries["join_asof_nearest"](
            spark, null_purchase_dir
        ).collect()
    }
    r = rows[401]
    assert r["np_dir"] == "backward"
    assert r["np_dist_us"] == 60 * 1_000_000  # the NULL-valued one at 1 min
    assert r["nearest_purchase_value"] is None

    # differential: the oracle agrees on this adversarial fixture too
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_purchase_dir}/events.parquet')"
    )
    orc = {
        t[0]: t
        for t in con.execute(
            entrymod.oracle_sql()["join_asof_nearest"]
        ).fetchall()
    }
    assert orc[401][3] is None and orc[401][4] == "backward"
    assert orc[401][5] == 60 * 1_000_000


def test_cusum_locates_planted_shift(spark, queries, events_dir):
    rows = {
        r["user_id"]: r
        for r in queries["ts_changepoint_cusum"](spark, events_dir).collect()
    }
    u1 = rows[1]
    assert u1["n_events"] == 20
    # S_i = sum(v - 5): walks to -50 at i=10, back to 0 at i=20
    assert u1["cp_pos"] == 10
    assert u1["cusum_mag"] == pytest.approx(50.0)


def test_asof_nearest_directions_and_tie(spark, queries, events_dir):
    rows = {
        r["event_id"]: r
        for r in queries["join_asof_nearest"](spark, events_dir).collect()
    }
    assert rows[201]["np_dir"] == "backward"
    assert rows[201]["nearest_purchase_value"] == 1.0
    assert rows[203]["np_dir"] == "forward"
    assert rows[203]["nearest_purchase_value"] == 2.0
    # exact tie (15 min each way) breaks backward
    assert rows[202]["np_dir"] == "backward"
    assert rows[202]["nearest_purchase_value"] == 1.0
    assert rows[202]["np_dist_us"] == 15 * 60 * 1_000_000
    # purchases match themselves at distance 0
    assert rows[200]["np_dist_us"] == 0
    # no purchases anywhere -> NULL
    assert rows[300]["np_dir"] is None
    assert rows[300]["nearest_purchase_value"] is None


def test_stream_cusum_matches_batch_peak(spark, queries, events_dir):
    got = {
        r["user_id"]: r
        for r in queries["stream_cusum_drift"](spark, events_dir).collect()
    }
    # user 1: mean 5, S+ stays 0 through the zeros, then climbs 5 per
    # step to 50 at the last row
    assert got[1]["peak_pos"] == 20
    assert got[1]["peak_drift"] == pytest.approx(50.0)
    # user 3: single row, zero deviation -> trivial peak at row 1
    assert got[3]["peak_pos"] == 1
    assert got[3]["peak_drift"] == 0.0


def test_rechunk_plan_conserves_voxels(spark, queries):
    from pyspark.sql import functions as F

    df = queries["pipe_rechunk_plan"](spark, SF_DIR)
    # every voxel lies in exactly one (src, dst) pair: totals must equal
    # the stack volumes sz*sy*sx = (40+k)*64*(64+k%3)
    per_nation = {
        r["n_nationkey"]: r["tot"]
        for r in df.groupBy("n_nationkey")
        .agg(F.sum("overlap_voxels").alias("tot"))
        .collect()
    }
    for k, tot in per_nation.items():
        assert tot == (40 + k) * 64 * (64 + k % 3)
    # per-destination-chunk sums equal that chunk's true (clamped) size
    dst = (
        df.groupBy("n_nationkey", "dz0", "dy0", "dx0")
        .agg(F.sum("overlap_voxels").alias("dvox"))
        .collect()
    )
    for r in dst:
        k = r["n_nationkey"]
        sz, sy, sx = 40 + k, 64, 64 + k % 3
        exp = (
            (min(r["dz0"] + 32, sz) - r["dz0"])
            * (min(r["dy0"] + 16, sy) - r["dy0"])
            * (min(r["dx0"] + 64, sx) - r["dx0"])
        )
        assert r["dvox"] == exp


def test_lpa_deterministic_and_closed(spark, queries):
    a = sorted(
        map(tuple, queries["graph_label_propagation"](spark, SF_DIR).collect())
    )
    b = sorted(
        map(tuple, queries["graph_label_propagation"](spark, SF_DIR).collect())
    )
    assert a == b
    assert len(a) == 25
    # labels are node ids: every community label is a valid nation key
    assert all(0 <= lab < 25 for _, lab in a)


def test_matryoshka_recall_bounds(spark, queries):
    rows = queries["embed_matryoshka_recall"](spark, SF_DIR).collect()
    assert len(rows) == 5  # zero-recall queries are reported, not dropped
    for r in rows:
        assert 0 <= r["n_kept"] <= 10
        assert r["recall_at_10"] == pytest.approx(r["n_kept"] / 10)


def test_dq_suite_green_on_fixtures(spark, queries):
    rows = queries["dq_verification_suite"](spark, SF_DIR).collect()
    assert len(rows) == 6
    by_name = {r["check"]: r for r in rows}
    # TPC-H-shaped fixtures satisfy every constraint
    assert all(r["passed"] for r in rows), [
        r["check"] for r in rows if not r["passed"]
    ]
    assert by_name["completeness:lineitem.l_shipdate"]["metric"] == 1.0
    assert by_name["uniqueness:orders.o_orderkey"]["metric"] == 1.0
    assert by_name[
        "referential:lineitem.l_orderkey->orders.o_orderkey"
    ]["metric"] == 0.0


def test_feature_snapshot_leakage_discipline(spark, queries):
    from pyspark.sql import functions as F

    df = queries["feature_snapshot_asof"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        # features are strictly pre-cutoff, label strictly post
        assert r["n_7d"] <= r["n_lifetime"]
        assert r["days_since_last"] >= 0
        assert r["label_purchase_next7d"] in (0, 1)
        assert r["n_lifetime"] > 0  # label-only users are not rows
    # the cutoff leaves a real holdout: at least one positive label and
    # at least one user with trailing-week activity
    assert any(r["label_purchase_next7d"] == 1 for r in rows)
    assert any(r["n_7d"] > 0 for r in rows)
