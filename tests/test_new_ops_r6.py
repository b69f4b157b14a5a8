"""Semantic invariants for the round-6 operator batch — properties the
differential oracle can't express (it already pins cross-engine value
equality; these pin the MEANING of the values)."""

from __future__ import annotations

from collections import Counter, defaultdict

from tests.conftest import SF_DIR


def test_bigram_lm_score_matches_reference_recompute(spark, queries):
    """The add-one-smoothed bigram LM score must equal an independent
    pure-Python recompute from raw text: corpus counts, 1e-6 fixed-point
    inverse probability, floor-mean — for every document."""
    from aind_hcr_data_transformation_spark.tables import load_table

    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    per_doc = defaultdict(list)
    for doc_id, toks in docs.items():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
            per_doc[doc_id].append((a, b))
    v = len(vocab)

    expected = {}
    for doc_id, bgs in per_doc.items():
        inv = [(c1[a] + v) * 1_000_000 // (c12[(a, b)] + 1) for a, b in bgs]
        expected[doc_id] = (len(bgs), (sum(inv) // len(inv)) / 1e6)

    rows = queries["text_bigram_lm_score"](spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, score = expected[r["doc_id"]]
        assert r["n_bigrams"] == n
        assert r["mean_inv_p"] == score

    # smoothed inverse probability is > 1 by construction (p < 1)
    assert all(r["mean_inv_p"] > 1.0 for r in rows)


def test_doremi_weights_match_reference_recompute(spark, queries):
    """The DoReMi multiplicative-weights update must equal an independent
    pure-Python recompute (token rarity difficulty, fixed-point ascent),
    and the resulting mixture must upweight harder domains monotonically."""
    from aind_hcr_data_transformation_spark.operators.textprep import (
        _DOREMI_ETA_Q,
        _DOREMI_ROUNDS,
        _DOREMI_SCALE,
    )
    from aind_hcr_data_transformation_spark.tables import load_table

    S, ETA = _DOREMI_SCALE, _DOREMI_ETA_Q
    toks = [
        (r["source"], t)
        for r in load_table(spark, SF_DIR, "documents")
        .select("source", "text")
        .collect()
        for t in r["text"].lower().split(" ")
    ]
    ctf: Counter = Counter(t for _, t in toks)
    n_tot = len(toks)
    by_src = defaultdict(list)
    for src, t in toks:
        by_src[src].append(n_tot // ctf[t])
    diff = {s: sum(v) // len(v) for s, v in by_src.items()}
    lo, hi = min(diff.values()), max(diff.values())

    expected = {}
    for s, d in diff.items():
        excess = 0 if hi == lo else (d - lo) * S // (hi - lo)
        w = S
        for _ in range(_DOREMI_ROUNDS):
            w = w * (S + ETA * excess // S) // S
        expected[s] = (len(by_src[s]), d, w)
    wgt_total = sum(w for _, _, w in expected.values())

    rows = queries["mix_doremi_weights"](spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, d, w = expected[r["source"]]
        assert (r["n_tokens"], r["difficulty"], r["weight_q"]) == (n, d, w)
        assert r["share"] == (w * S // wgt_total) / S

    # harder domains never get a smaller weight (monotone ascent)
    srt = sorted(rows, key=lambda r: r["difficulty"])
    assert all(
        a["weight_q"] <= b["weight_q"] for a, b in zip(srt, srt[1:])
    )
    # floor-renormalized shares sum to 1 within k ulps of the fixed point
    assert 1 - len(rows) / S <= sum(r["share"] for r in rows) <= 1.0


def test_url_canonical_dedup_matches_reference_recompute(spark, queries):
    """Canonicalization must collapse exactly the five planted messy
    spellings per logical URL: pure-Python recompute of the canonical
    key, keeper, and spelling census for every group."""
    import re

    from aind_hcr_data_transformation_spark.tables import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()

    def messy(doc_id: int) -> str:
        base = doc_id // 5
        host = f"site{base % 7}.example.com"
        path = f"/docs/{base}"
        v = doc_id % 5
        return [
            f"https://{host}{path}/",
            f"HTTPS://{host}{path}#top",
            f"https://WWW.{host}{path}",
            f"https://{host.replace('.example.com', '.example.com:443')}{path}",
            f"https://{host}{path}?utm_source=feed",
        ][v]

    def canon(url: str) -> str:
        c = url.lower()
        c = re.sub(r"#.*$", "", c)
        c = re.sub(r"\?utm_[a-z_]+=[a-z]+$", "", c)
        c = c.replace(":443/", "/")
        c = re.sub(r"^https://www\.", "https://", c)
        return re.sub(r"/$", "", c)

    from collections import defaultdict

    groups = defaultdict(list)
    for d in range(n_docs):
        groups[canon(messy(d))].append(d)

    rows = {r["canonical_url"]: r for r in
            queries["dedup_url_canonical"](spark, SF_DIR).collect()}
    assert set(rows) == set(groups)
    for cu, members in groups.items():
        r = rows[cu]
        assert r["n_variants"] == len(members)
        assert r["keeper"] == min(members)
        assert r["n_spellings"] == len({messy(d) for d in members})
    # every messy doc lands in exactly one canonical group
    assert sum(r["n_variants"] for r in rows.values()) == n_docs
    # full groups collapse 5 spellings into one resource
    full = [r for r in rows.values() if r["n_variants"] == 5]
    assert full and all(r["n_spellings"] == 5 for r in full)


def test_kmv_distinct_sketch_properties(spark, queries):
    """KMV: per-type rows + the merged ALL row; the estimate is exact
    below k and within the pinned 3σ band above it; and the estimate is
    reproducible from a reference recompute of the same md5 fractions."""
    import hashlib

    from aind_hcr_data_transformation_spark.operators.relational import (
        _KMV_K,
        _KMV_SPACE,
    )
    from aind_hcr_data_transformation_spark.tables import load_table

    rows = {r["event_type"]: r for r in queries["agg_kmv_distinct"](spark, SF_DIR).collect()}
    assert "ALL" in rows and len(rows) >= 2

    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    by_type: dict = {}
    all_users = set()
    for r in ev:
        by_type.setdefault(r["event_type"], set()).add(r["user_id"])
        all_users.add(r["user_id"])
    by_type["ALL"] = all_users

    def ref_est(users):
        fracs = sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) / _KMV_SPACE
            for u in users
        )
        if len(users) < _KMV_K:
            return float(len(users))
        return (_KMV_K - 1) / fracs[_KMV_K - 1]

    for t, r in rows.items():
        users = by_type[t]
        assert r["n_exact"] == len(users)
        assert abs(r["kmv_est"] - round(ref_est(users), 6)) < 1e-6
        if len(users) >= _KMV_K:
            assert r["within_3sigma"], (t, r["kmv_est"], len(users))
        else:
            assert r["kmv_est"] == float(len(users))


def test_priority_sample_reference_recompute_and_estimator(spark, queries):
    """Priority sampling: the sample is exactly the top-n reference
    priorities (md5-fraction recompute), and Σ max(w,τ) over the sample
    estimates the corpus total weight within a loose band."""
    import hashlib

    from aind_hcr_data_transformation_spark.operators.textprep import (
        _PRI_N,
        _PRI_SPACE,
    )
    from aind_hcr_data_transformation_spark.tables import load_table

    out = queries["mix_priority_sample"](spark, SF_DIR).collect()
    assert len(out) == _PRI_N

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars").collect()
    pri = sorted(
        (
            -(
                float(r["n_chars"])
                / (
                    (int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) + 1.0)
                    / _PRI_SPACE
                )
            ),
            r["doc_id"],
        )
        for r in docs
    )
    ref_ids = [doc_id for _, doc_id in pri[:_PRI_N]]
    assert sorted(r["doc_id"] for r in out) == sorted(ref_ids)

    total_w = sum(float(r["n_chars"]) for r in docs)
    est_total = sum(r["est_w"] for r in out)
    assert abs(est_total - total_w) / total_w < 0.35, (est_total, total_w)
