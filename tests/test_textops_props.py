"""Semantic pins for the round-3 text/embedding operators — invariants
checked against independent pure-Python ground truth (the DuckDB twin
shares the relational formulation, so it cannot catch a shared
misformulation; these reimplementations can).
"""

import hashlib
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from aind_hcr_data_transformation_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return {d.doc_id: d.text for d in load_table(spark, SF, "documents").collect()}


def _py_winnow(text: str):
    """Reference winnowing: 3-token shingle md5[:8], window-4 min set."""
    t = text.split(" ")
    if len(t) < 6:
        return None
    hs = [
        hashlib.md5(" ".join(t[i : i + 3]).encode()).hexdigest()[:8]
        for i in range(len(t) - 2)
    ]
    return {min(hs[i : i + 4]) for i in range(len(hs) - 3)}


def test_winnow_matches_python_reference(spark, queries):
    rows = {r.doc_id: r for r in queries["text_winnow_fingerprint"](spark, SF).collect()}
    docs = _docs(spark)
    checked = 0
    for doc_id, text in docs.items():
        fps = _py_winnow(text)
        if fps is None:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        assert r.n_fprints == len(fps), doc_id
        digest = hashlib.md5(",".join(sorted(fps)).encode()).hexdigest()
        assert r.digest == digest, doc_id
        assert r.n_windows == len(text.split(" ")) - 5, doc_id
        checked += 1
    assert checked == len(rows) > 0


def test_winnow_fingerprints_are_insertion_robust():
    """The property winnowing exists for: a single-token insertion only
    disturbs fingerprints near the edit site (window-local), so the
    fingerprint sets of the base and edited doc overlap heavily — unlike a
    positional chunk hash, which would shift every chunk after the edit."""
    base = " ".join(f"w{(i * 7) % 23}x{i % 11}" for i in range(60))
    toks = base.split(" ")
    edited = " ".join(toks[:30] + ["INSERTED"] + toks[30:])
    a, b = _py_winnow(base), _py_winnow(edited)
    overlap = len(a & b) / len(a | b)
    assert overlap >= 0.6, overlap


def _dec_round(x: float, scale: int) -> Decimal:
    """Spark/DuckDB's shared rounding route: shortest-repr decimal at 10
    digits, then HALF_UP to ``scale``."""
    d = Decimal(repr(x)).quantize(Decimal("1e-10"), rounding=ROUND_HALF_UP)
    return d.quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)


def test_quantize_codes_match_python_reference(spark, queries):
    rows = {r.vec_id: r for r in queries["embed_quantize_int8"](spark, SF).collect()}
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF, "embeddings").collect()
    }
    assert rows.keys() == emb.keys()
    for vec_id, r in rows.items():
        x = [float(v) for v in emb[vec_id]]
        scale = max(abs(v) for v in x) / 127.0
        q = [int(_dec_round(v / scale, 0)) for v in x]
        assert -127 <= r.q_min <= r.q_max <= 127
        assert (r.q_min, r.q_max) == (min(q), max(q)), vec_id
        codes = hashlib.md5(",".join(str(c) for c in q).encode()).hexdigest()
        assert r.codes_md5 == codes, vec_id
        # each |x_i - q_i*scale| <= scale/2 after rounding
        assert r.recon_err <= scale * (64**0.5) / 2 + 1e-9, vec_id


def test_repetition_matches_python_reference(spark, queries):
    rows = {r.doc_id: r for r in queries["text_repetition"](spark, SF).collect()}
    docs = _docs(spark)
    for doc_id, text in docs.items():
        t = text.split(" ")
        if len(t) < 3:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        g2 = Counter(" ".join(t[i : i + 2]) for i in range(len(t) - 1))
        g3 = Counter(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
        assert r.n_2grams == sum(g2.values())
        assert r.n_3grams == sum(g3.values())
        top2 = max(g2.values()) / sum(g2.values())
        dup3 = sum(c for c in g3.values() if c > 1) / sum(g3.values())
        assert float(_dec_round(top2, 6)) == r.top_2gram_frac, doc_id
        assert float(_dec_round(dup3, 6)) == r.dup_3gram_frac, doc_id
        assert r.flagged == (
            r.top_2gram_frac >= 0.2 or r.dup_3gram_frac >= 0.18
        ), doc_id


def test_tfidf_topk_matches_python_reference(spark, queries):
    rows = queries["text_tfidf_topk"](spark, SF).collect()
    docs = _docs(spark)
    n_docs = len(docs)
    tf = {
        doc_id: Counter(text.lower().split(" "))
        for doc_id, text in docs.items()
    }
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append((r.rank, r.token, r.tf, r.df))
    assert got.keys() == docs.keys()
    for doc_id, entries in got.items():
        want = sorted(
            tf[doc_id].items(),
            key=lambda kv: (-(kv[1] * n_docs) / df[kv[0]], kv[0]),
        )[:3]
        entries.sort()
        assert [(tok, c) for _, tok, c, _ in entries] == want, doc_id
        for _, tok, c, d in entries:
            assert d == df[tok]


def test_stream_sessions_equals_batch_sessionization(spark, queries):
    """Streaming session windows (merging-state path) must produce
    exactly the batch ``evw_session`` result — the upgrade-path parity
    statement, checked end-to-end through an actual streaming run."""
    batch = {tuple(r) for r in queries["evw_session"](spark, SF).collect()}
    stream = {tuple(r) for r in queries["stream_sessions"](spark, SF).collect()}
    assert batch == stream and len(batch) > 0
