"""Semantic pins for the training-data preparation operators
(``operators/textprep.py``) — invariants the DuckDB twin cannot see
(it shares the formulation), checked against independent ground truth.
"""

import pytest

from aind_hcr_data_transformation_spark.operators.textprep import (
    _CHUNK_S,
    _CHUNK_W,
    _CONTAM_MOD,
    _PACK_BUDGET,
)
from aind_hcr_data_transformation_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_seq_pack_partitions_every_token_exactly_once(spark, queries):
    """Chunk fills per source must sum to the source's total token
    count (the chunking partitions the concatenated stream), and every
    chunk except the last per source is exactly full."""
    rows = queries["seq_pack"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    truth = {}
    for d in docs:
        truth[d.source] = truth.get(d.source, 0) + len(d.text.split(" "))
    got = {}
    last_chunk = {}
    for r in rows:
        got[r.source] = got.get(r.source, 0) + r.n_tokens
        last_chunk[r.source] = max(last_chunk.get(r.source, -1), r.chunk_id)
    assert got == truth
    for r in rows:
        if r.chunk_id != last_chunk[r.source]:
            assert r.n_tokens == _PACK_BUDGET, (r.source, r.chunk_id)
        assert 1 <= r.n_docs and 0 <= r.n_straddlers <= 1


def test_contamination_excludes_benchmark_and_bounds_ratio(spark, queries):
    rows = queries["contamination"](spark, SF).collect()
    assert rows, "planted vocabulary guarantees overlap"
    for r in rows:
        assert r.doc_id % _CONTAM_MOD != 0, "benchmark doc leaked into output"
        assert 0 < r.n_hits <= r.n_grams
        assert 0.0 < r.hit_ratio <= 1.0
        assert r.flagged == (r.n_hits / r.n_grams >= 0.2)


def test_pii_redact_counts_and_scrubs(spark, queries):
    rows = {r.doc_id: r for r in queries["pii_redact"](spark, SF).collect()}
    docs = {d.doc_id: d for d in load_table(spark, SF, "documents").collect()}
    assert rows.keys() == docs.keys()
    import hashlib

    for doc_id, r in rows.items():
        want_emails = 2 if doc_id % 7 == 0 else 1
        assert r.n_emails == want_emails, doc_id
        assert r.n_phones == 1
        # independent reconstruction of the redacted text
        extra = f" cc admin{doc_id}@example.org" if doc_id % 7 == 0 else ""
        planted = (
            f"{docs[doc_id].text} contact user{doc_id}@example.com{extra}"
            f" or call +1-555-{doc_id % 10000:04d}"
        )
        redacted = planted
        redacted = (
            redacted.replace(f"user{doc_id}@example.com", "<EMAIL>")
            .replace(f"admin{doc_id}@example.org", "<EMAIL>")
            .replace(f"+1-555-{doc_id % 10000:04d}", "<PHONE>")
        )
        assert "@" not in redacted
        assert r.redacted_md5 == hashlib.md5(redacted.encode()).hexdigest()
        assert r.redacted_len == len(redacted)


def test_doc_chunk_covers_docs_with_fixed_stride(spark, queries):
    rows = queries["doc_chunk"](spark, SF).collect()
    docs = {d.doc_id: d.text.split(" ") for d in
            load_table(spark, SF, "documents").collect()}
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert per_doc.keys() == docs.keys()
    import hashlib

    for doc_id, chunks in per_doc.items():
        toks = docs[doc_id]
        starts = list(range(0, len(toks), _CHUNK_S))
        assert [c.start_tok for c in sorted(chunks, key=lambda c: c.chunk_idx)] == starts
        for c in chunks:
            want = toks[c.start_tok : c.start_tok + _CHUNK_W]
            assert c.n_chunk_tokens == len(want)
            assert c.chunk_md5 == hashlib.md5(" ".join(want).encode()).hexdigest()


def test_sample_stratified_rates_follow_thresholds(spark, queries):
    rows = {r.lang: r for r in queries["sample_stratified"](spark, SF).collect()}
    assert set(rows) == {"en", "de", "es", "fr", "zh"}
    for r in rows.values():
        assert 0 <= r.n_kept <= r.n_total
        assert r.realized_rate == pytest.approx(r.n_kept / r.n_total, abs=1e-4)
    # the hard-downsampled majority stratum keeps a smaller fraction
    # than the keep-nearly-all rare stratum
    assert rows["en"].realized_rate < rows["zh"].realized_rate


def test_bloom_contamination_never_misses(spark):
    """Bloom membership can only err toward false POSITIVES: every doc
    the exact check flags must appear in the bloom result with at least
    as many hits, and FP inflation stays under the design bound."""
    from aind_hcr_data_transformation_spark.operators.textprep import (
        contamination,
        contamination_bloom,
    )

    sf = "/root/testdata/sf0.001"
    exact = {r.doc_id: r.n_hits for r in contamination(spark, sf).collect()}
    bloom = {
        r.doc_id: r.n_bloom_hits for r in contamination_bloom(spark, sf).collect()
    }
    for doc_id, n_hits in exact.items():
        assert bloom.get(doc_id, 0) >= n_hits, doc_id
    # false positives only add docs/hits; at ~1e-4 FP the overhang is tiny
    extra_docs = set(bloom) - set(exact)
    assert len(extra_docs) <= max(3, len(exact) // 10)


def test_mix_token_budget_semantics(spark, queries):
    """Mixing invariants: thresholds are availability-capped at 2^16,
    kept counts are bounded by totals, the realized corpus-level token
    take is near the 40% budget (hash-sampling tolerance), and the
    weight tiers order the realized per-source rates."""
    rows = queries["mix_token_budget"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.thr <= 65536
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.toks_kept <= r.src_toks
    tot = sum(r.src_toks for r in rows)
    kept = sum(r.toks_kept for r in rows)
    assert 0.3 <= kept / tot <= 0.5, "realized take far from the 40% budget"
    # per-token keep probability rises with the mixing weight
    by_w = {}
    for r in rows:
        a, b = by_w.get(r.w, (0, 0))
        by_w[r.w] = (a + r.toks_kept, b + r.src_toks)
    rates = {w: a / b for w, (a, b) in by_w.items()}
    assert rates[4] > rates[2] > rates[1]


def test_dsir_matches_python_walk(spark, queries):
    """Independent pure-Python reimplementation of the DSIR-shaped
    selection (hashed uni+bigram buckets, add-one smoothed integer
    ratios, per-gram average, top-50 by (avg desc, doc_id)) — the same
    third-opinion pattern as test_funnel_matches_python_walk, so a bug
    shared by the Spark and SQL formulations still fails here."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from aind_hcr_data_transformation_spark.operators.textprep import (
        _DSIR_BUCKETS,
        _DSIR_SCALE,
        _DSIR_TOP,
    )

    docs = duckdb.sql(
        "SELECT doc_id, lang, text FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()

    def buckets(text):
        t = text.split(" ")
        grams = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % _DSIR_BUCKETS
            for g in grams
        ]

    tn, rn = Counter(), Counter()
    per_doc = {}
    for doc_id, lang, text in docs:
        bs = buckets(text)
        per_doc[doc_id] = Counter(bs)
        rn.update(bs)
        if lang == "en":
            tn.update(bs)
    observed = set(rn)  # smoothing totals run over OBSERVED buckets only
    tt = sum(tn[b] + 1 for b in observed)
    rt = sum(rn[b] + 1 for b in observed)
    s = {
        b: (_DSIR_SCALE * (tn[b] + 1) * rt) // ((rn[b] + 1) * tt)
        for b in observed
    }
    avg = {
        d: sum(c * s[b] for b, c in cnt.items()) / sum(cnt.values())
        for d, cnt in per_doc.items()
    }
    want = sorted(avg, key=lambda d: (-avg[d], d))[:_DSIR_TOP]

    rows = sorted(
        queries["dsir_importance"](spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in rows] == want
    assert [r.rank for r in rows] == list(range(1, _DSIR_TOP + 1))
    for r in rows:
        assert abs(r.avg_score - avg[r.doc_id]) < 1e-6
