"""Semantic invariants for the third round-5 operator batch
(containment dedup, lexical rarity, temperature mixing, ntile buckets,
tolerance as-of) — properties the differential oracle can't express."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_containment_catches_planted_suffix_mutants(spark, queries):
    """Every planted mutant (doc_id + 1e6, first two tokens dropped) with
    enough shingles must appear as an inner doc contained in its
    original, with containment ≈ 1 — the asymmetric case Jaccard can
    dilute.  And containment must stay within (0, 1]."""
    from aind_hcr_data_transformation_spark.operators.dedup import (
        _CONTAINMENT_MIN_SHINGLES,
        _MUT_OFFSET,
    )
    from aind_hcr_data_transformation_spark.tables import load_table

    rows = queries["dedup_containment"](spark, SF_DIR).collect()
    assert rows, "no containment pairs found"
    pairs = {(r["inner_id"], r["outer_id"]): r["containment"] for r in rows}
    for c in pairs.values():
        assert 0.0 < c <= 1.0

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()

    # scores are over the RAW shingle universe (candidate generation is
    # LSH ∪ rare-shingle; the verify stage uses full shingle sets), so
    # the suppression threshold counts raw shingles
    def shingle_set(text):
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    corpus = {r["doc_id"]: shingle_set(r["text"]) for r in docs}
    for r in docs:
        if r["doc_id"] % 20 == 0:
            corpus[r["doc_id"] + _MUT_OFFSET] = shingle_set(
                " ".join(r["text"].split(" ")[2:])
            )

    planted = 0
    for r in docs:
        if r["doc_id"] % 20 != 0:
            continue
        mid = r["doc_id"] + _MUT_OFFSET
        if len(corpus.get(mid, ())) < _CONTAINMENT_MIN_SHINGLES:
            continue
        planted += 1
        key = (mid, r["doc_id"])
        assert key in pairs, f"mutant {key} not reported as contained"
        assert pairs[key] == 1.0
    assert planted > 0


def test_rarity_score_matches_local_recount(spark, queries):
    """mean_ctf and rare_frac must equal a driver-side recount of corpus
    term frequencies on the same tokenization."""
    from aind_hcr_data_transformation_spark.operators.textops import _rarity_cap
    from aind_hcr_data_transformation_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    cap = _rarity_cap(len(docs))
    ctf: dict[str, int] = defaultdict(int)
    toks_by_doc = {}
    for r in docs:
        toks = r["text"].lower().split(" ")
        toks_by_doc[r["doc_id"]] = toks
        for t in toks:
            ctf[t] += 1

    rows = queries["text_rarity_score"](spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    for r in rows:
        toks = toks_by_doc[r["doc_id"]]
        assert r["n_tokens"] == len(toks)
        mean = sum(ctf[t] for t in toks) / len(toks)
        rare = sum(1 for t in toks if ctf[t] <= cap) / len(toks)
        assert abs(r["mean_ctf"] - mean) < 1e-5
        assert abs(r["rare_frac"] - rare) < 1e-6


def test_temperature_weights_flatten_toward_tail(spark, queries):
    """Shares sum to 1, follow sqrt proportionality, and are strictly
    flatter than proportional sampling: the biggest source's share
    shrinks vs its token share, the smallest source's share grows."""
    rows = queries["mix_temperature_weights"](spark, SF_DIR).collect()
    assert len(rows) > 1
    total_tokens = sum(r["n_tokens"] for r in rows)
    tot_w = sum(math.sqrt(r["n_tokens"]) for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r["share"] - math.sqrt(r["n_tokens"]) / tot_w) < 1e-5
        # budget floors the UNROUNDED ratio; allow ±1 for summation-order ulps
        expect = math.floor(math.sqrt(r["n_tokens"]) / tot_w * 10_000_000)
        assert abs(r["token_budget"] - expect) <= 1
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    if big["n_tokens"] > small["n_tokens"]:
        assert big["share"] < big["n_tokens"] / total_tokens
        assert small["share"] > small["n_tokens"] / total_tokens


def test_ntile_buckets_balanced_and_ordered(spark, queries):
    """Within each priority: four buckets, sizes differ by ≤ 1 with
    earlier buckets taking the extras, and value ranges are disjoint
    and increasing (lo/hi of quartile q sit below quartile q+1)."""
    rows = queries["win_ntile_buckets"](spark, SF_DIR).collect()
    by_prio = defaultdict(dict)
    for r in rows:
        by_prio[r["o_orderpriority"]][r["quartile"]] = r
    for prio, buckets in by_prio.items():
        assert sorted(buckets) == [1, 2, 3, 4]
        sizes = [buckets[q]["n_orders"] for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        for q in (1, 2, 3):
            assert buckets[q]["hi"] <= buckets[q + 1]["lo"]
        for q in (1, 2, 3, 4):
            assert buckets[q]["lo"] <= buckets[q]["hi"]


def test_asof_tolerance_nulls_stale_matches(spark, queries):
    """Wherever the unbounded as-of reports a match, the tolerance
    variant must agree iff the matching purchase is within one hour —
    verified against a driver-side replay on a sample of users."""
    from aind_hcr_data_transformation_spark.tables import load_table

    tol = queries["join_asof_tolerance"](spark, SF_DIR)
    got = {r["event_id"]: r["recent_purchase_value"] for r in tol.collect()}

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        pri = 0 if r["event_type"] == "purchase" else 1
        by_user[r["user_id"]].append((r["ts"], pri, r["event_id"], r))
    n_stale = n_fresh = 0
    for user, items in by_user.items():
        items.sort(key=lambda t: (t[0], t[1], t[2]))
        last = None  # (ts, value)
        for ts, pri, eid, r in items:
            if pri == 0:
                last = (r["ts"], r["value"])
            expect = None
            if last is not None and (ts - last[0]).total_seconds() <= 3600:
                expect = round(last[1], 2)
                n_fresh += 1
            elif last is not None:
                n_stale += 1
            have = got[eid]
            if expect is None:
                assert have is None
            else:
                assert have is not None and abs(have - expect) < 1e-9
    # the fixture must actually exercise both branches
    assert n_fresh > 0 and n_stale > 0


def test_null_safe_join_partitions_all_orders(spark, queries):
    """The NULL member must capture exactly the nulled-out key rows —
    every order lands in exactly one tier (a plain = join would drop
    the '3-MEDIUM' rows entirely)."""
    from aind_hcr_data_transformation_spark.tables import load_table

    rows = {r["tier"]: r["n_orders"] for r in queries["join_null_safe"](spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders")
    assert sum(rows.values()) == o.count()
    assert rows["unclassified"] == o.filter(
        F.col("o_orderpriority") == "3-MEDIUM"
    ).count()


def test_stream_asof_equals_batch_tolerance(spark, queries):
    """The stateful streaming as-of must agree with the batch window
    implementation row-for-row (modulo the batch side's display
    rounding)."""
    batch = {
        r["event_id"]: r["recent_purchase_value"]
        for r in queries["join_asof_tolerance"](spark, SF_DIR).collect()
    }
    stream = {
        r["event_id"]: r["recent_purchase_value"]
        for r in queries["stream_asof_enrich"](spark, SF_DIR).collect()
    }
    assert set(batch) == set(stream)
    for eid, bv in batch.items():
        sv = stream[eid]
        if bv is None:
            assert sv is None
        else:
            assert sv is not None and abs(round(sv, 2) - bv) < 1e-9


def test_rfm_quintiles_balanced_and_ordered(spark, queries):
    """Each metric's quintiles partition users near-evenly (formula
    split: sizes differ by ≤1), and the monetary quintile respects the
    actual purchase-sum ordering."""
    rows = queries["events_rfm_segments"](spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    from aind_hcr_data_transformation_spark.tables import load_table

    for col in ("r_q", "f_q", "m_q"):
        sizes = defaultdict(int)
        for r in rows:
            assert 1 <= r[col] <= 5
            sizes[r[col]] += 1
        assert sum(sizes.values()) == n
        assert max(sizes.values()) - min(sizes.values()) <= 1
    ev = load_table(spark, SF_DIR, "events").collect()
    mon = defaultdict(float)
    for e in ev:
        if e["event_type"] == "purchase":
            mon[e["user_id"]] += e["value"]
    top = [r["user_id"] for r in rows if r["m_q"] == 5]
    bot = [r["user_id"] for r in rows if r["m_q"] == 1]
    assert min(mon.get(u, 0.0) for u in top) >= max(mon.get(u, 0.0) for u in bot)


def test_hll_merge_equals_direct_sketch_and_tracks_exact(spark, queries):
    """Merging the daily sketch layer must equal sketching the raw data
    (the re-aggregation property), and the estimate must sit within the
    lgK=14 error bound of the exact distinct."""
    from aind_hcr_data_transformation_spark.tables import load_table

    merged = {
        r["event_type"]: r["approx_users"]
        for r in queries["agg_hll_merge_shards"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == direct  # union of the daily layer == one-pass sketch
    for t, est in merged.items():
        assert abs(est - exact[t]) <= max(3, 0.05 * exact[t])


def test_containment_dominates_jaccard_on_shared_pairs(spark, queries):
    """Over the same capped shingle universe, containment |A∩B|/|A| can
    never be below Jaccard |A∩B|/|A∪B| — a cross-operator consistency
    check tying the two pair scorers to one universe."""
    jac = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in queries["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    cont = {
        (r["inner_id"], r["outer_id"]): r["containment"]
        for r in queries["dedup_containment"](spark, SF_DIR).collect()
    }
    shared = 0
    for (d1, d2), j in jac.items():
        for key in ((d1, d2), (d2, d1)):
            if key in cont:
                shared += 1
                assert cont[key] >= j - 1e-6, (key, cont[key], j)
    assert shared > 0
