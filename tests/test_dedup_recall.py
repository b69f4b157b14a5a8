"""LSH recall guard: the planted-mutant corpus design gives every 20th
document a near-duplicate at ``doc_id + 1e6`` (first two tokens dropped,
high Jaccard). Recall on those KNOWN pairs must be 100% at test scale —
so a parameter drift (fewer bands, wider bands, different hash salt)
that silently loses recall fails here rather than shipping.

Pairs whose true shingle-Jaccard falls below the verification threshold
(very short documents lose proportionally more from a 2-token drop) are
excluded from the ground truth — LSH is only ever asked to find pairs at
or above its threshold.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def _planted_truth(spark):
    """Ground truth: planted (doc, doc+1e6) pairs with true Jaccard >=
    the LSH verification threshold, computed exactly (no LSH)."""
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _MUT_OFFSET,
        _corpus_with_mutants,
        _shingles,
    )

    sh = _shingles(_corpus_with_mutants(spark, SF))
    orig = sh.filter(F.col("doc_id") < _MUT_OFFSET).select(
        F.col("doc_id").alias("doc1"), "sid"
    )
    mut = sh.filter(F.col("doc_id") >= _MUT_OFFSET).select(
        (F.col("doc_id") - _MUT_OFFSET).alias("doc1"),
        (F.col("doc_id")).alias("doc2"),
        "sid",
    )
    inter = (
        orig.join(mut, ["doc1", "sid"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n", "n1"), "doc1")
        .join(
            sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2")),
            "doc2",
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )
    return {(r.doc1, r.doc2) for r in truth.collect()}


def test_embedding_lsh_full_recall_on_planted_pairs(spark, queries):
    """Banded sign-LSH blocking must recover every planted embedding
    near-dup: the mutation SCALES a component (sign preserved), so each
    planted pair shares all band keys — a miss means the banding or key
    derivation regressed."""
    import duckdb

    from aind_hcr_data_transformation_spark.operators.dedup import _MUT_OFFSET

    expected = {
        (int(v), int(v) + _MUT_OFFSET)
        for (v,) in duckdb.sql(
            f"SELECT vec_id FROM '{SF}/embeddings.parquet' WHERE vec_id % 50 = 0"
        ).fetchall()
    }
    assert len(expected) >= 10

    found = {
        (r.id1, r.id2)
        for r in queries["dedup_embedding_cosine"](spark, SF).collect()
        if r.id2 - r.id1 == _MUT_OFFSET
    }
    missed = expected - found
    assert not missed, (
        f"sign-LSH banding lost {len(missed)}/{len(expected)} planted "
        f"embedding near-dups (e.g. {sorted(missed)[:5]})"
    )


def test_minhash_lsh_full_recall_on_planted_pairs(spark, queries):
    from aind_hcr_data_transformation_spark.operators.dedup import _MUT_OFFSET

    expected = _planted_truth(spark)
    assert len(expected) > 10, "fixture should plant a meaningful pair count"

    found = {
        (r.doc1, r.doc2)
        for r in queries["dedup_minhash_lsh"](spark, SF).collect()
        if r.doc2 - r.doc1 == _MUT_OFFSET
    }
    missed = expected - found
    assert not missed, (
        f"LSH lost {len(missed)}/{len(expected)} planted near-dup pairs "
        f"(e.g. {sorted(missed)[:5]}) — band/hash parameters no longer "
        "reach the designed recall"
    )


def test_minhash_fast_twin_matches_md5_pairs_and_recall(spark, queries):
    """The xxhash64 production-hash twin (rows-only, no DuckDB oracle)
    must (a) recover every planted pair the ground truth demands, and
    (b) agree with the md5 variant on the full emitted pair set at test
    scale — both variants verify candidates with the exact Jaccard over
    their (collision-free here) shingle-id sets, so any pair-set
    difference means the banding or hashing regressed, not noise."""
    from aind_hcr_data_transformation_spark.operators.dedup import _MUT_OFFSET

    expected = _planted_truth(spark)
    assert len(expected) > 10

    fast = {
        (r.doc1, r.doc2): r.jaccard
        for r in queries["dedup_minhash_fast"](spark, SF).collect()
    }
    planted_found = {p for p in fast if p[1] - p[0] == _MUT_OFFSET}
    missed = expected - planted_found
    assert not missed, (
        f"fast LSH lost {len(missed)}/{len(expected)} planted pairs "
        f"(e.g. {sorted(missed)[:5]})"
    )

    md5 = {
        (r.doc1, r.doc2): r.jaccard
        for r in queries["dedup_minhash_lsh"](spark, SF).collect()
    }
    assert set(fast) == set(md5), (
        f"pair sets diverge: fast-only {sorted(set(fast) - set(md5))[:5]}, "
        f"md5-only {sorted(set(md5) - set(fast))[:5]}"
    )
    for p, j in fast.items():
        assert abs(j - md5[p]) < 1e-9, (p, j, md5[p])


def test_components_resolve_planted_pairs(spark, queries):
    """Connected components must place every planted pair in one
    component labelled by the component's minimum doc_id — checked
    against an independent union-find ground truth, not the SQL twin
    (both engines share the propagation algorithm; this does not)."""
    from aind_hcr_data_transformation_spark.operators.dedup import (
        _cc_edges,
        _MUT_OFFSET,
    )

    comp = {
        r.doc_id: r.component
        for r in queries["dedup_components"](spark, SF).collect()
    }
    # ground truth by union-find over the same edge list
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = _cc_edges(spark, SF).collect()
    for e in edges:
        ra, rb = find(e.a), find(e.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}
    assert comp == truth
    # planted pairs co-resolve
    planted = [(d, d + _MUT_OFFSET) for d in comp if d % 20 == 0 and d < _MUT_OFFSET]
    assert planted and all(comp[a] == comp[b] for a, b in planted if b in comp)


def test_semdedup_prunes_every_planted_semantic_duplicate(spark, queries):
    """SemDeDup ground truth: every planted duplicate is a uniformly
    scaled copy (direction preserved), so after L2 normalization it is
    numerically identical to its original — same k-means cell, cosine
    1.0 — and MUST be pruned with pruned_by pointing at a smaller id.
    Any original pruned without a qualifying smaller near-identical
    partner would be a false positive."""
    import duckdb

    from aind_hcr_data_transformation_spark.operators.ivf import (
        _SEM_MUT_OFFSET,
    )

    expected = {
        int(v) + _SEM_MUT_OFFSET
        for (v,) in duckdb.sql(
            f"SELECT vec_id FROM '{SF}/embeddings.parquet' WHERE vec_id % 50 = 0"
        ).fetchall()
    }
    assert len(expected) >= 10

    rows = queries["dedup_semantic"](spark, SF).collect()
    pruned = {r.vec_id for r in rows}
    missed = expected - pruned
    assert not missed, (
        f"SemDeDup missed {len(missed)}/{len(expected)} planted semantic "
        f"duplicates (e.g. {sorted(missed)[:5]})"
    )
    for r in rows:
        assert r.pruned_by < r.vec_id
        assert r.max_cos >= 0.98
        # planted mutants pair with their own original
        if r.vec_id in expected:
            assert r.pruned_by == r.vec_id - _SEM_MUT_OFFSET


def test_cdc_chunks_resync_on_planted_prefix_drops(spark, queries):
    """CDC boundaries re-synchronize after the planted 2-token prefix
    drop, so every planted pair whose shared-chunk count (computed by an
    independent Python walk over md5 boundaries) reaches the report
    threshold MUST appear with exactly that count — the shift-robustness
    that fixed-width paragraph windows cannot provide."""
    import hashlib

    import duckdb

    from aind_hcr_data_transformation_spark.operators.dedup import (
        _CDC_MIN_SHARED,
        _CDC_MOD,
        _MUT_OFFSET,
    )

    def chunk_set(text):
        t = text.split(" ")
        h16 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16)  # noqa: E731
        bounds = (
            [0]
            + [p for p in range(1, len(t) + 1) if h16(t[p - 1]) % _CDC_MOD == 0]
            + [len(t)]
        )
        return {
            hashlib.md5(" ".join(t[a:b]).encode()).hexdigest()
            for a, b in zip(bounds, bounds[1:])
            if b > a
        }

    from collections import Counter

    from aind_hcr_data_transformation_spark.operators.dedup import (
        _ngram_df_cap,
    )

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    # mirror the operator's df cut: chunk document-frequency over the
    # FULL mutant-augmented corpus, cap derived from the raw doc count
    # (common short chunks are boilerplate and are dropped by design)
    sets = {d: chunk_set(t) for d, t in docs.items()}
    for d, t in docs.items():
        if d % 20 == 0:
            sets[d + _MUT_OFFSET] = chunk_set(" ".join(t.split(" ")[2:]))
    df = Counter(ck for s in sets.values() for ck in s)
    cap = _ngram_df_cap(len(docs))
    live = {ck for ck, n in df.items() if n <= cap}
    expected = {}
    for d in docs:
        if d % 20 != 0:
            continue
        n = len(sets[d] & sets[d + _MUT_OFFSET] & live)
        if n >= _CDC_MIN_SHARED:
            expected[(d, d + _MUT_OFFSET)] = n
    assert len(expected) >= 10

    found = {
        (r.doc1, r.doc2): r.n_shared_chunks
        for r in queries["dedup_cdc_chunks"](spark, SF).collect()
    }
    for pair, n in expected.items():
        assert found.get(pair) == n, (pair, n, found.get(pair))


def test_cdc_chunks_edge_documents(spark, queries, tmp_path):
    """CDC edge geometry: documents made ENTIRELY of boundary tokens
    (every chunk is one token), single-token documents, and exact tiny
    duplicates must flow through without index errors, and identical
    docs must pair with n_shared_chunks = their distinct chunk count.
    Tokens chosen by their md5: gamma/zeta/eta are boundaries
    (h16 % 8 == 0), alpha/beta/delta/epsilon are not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        # identical all-boundary docs: chunks = {gamma, zeta, eta} -> 3 shared
        1: "gamma zeta eta",
        2: "gamma zeta eta",
        # identical no-boundary docs: one chunk each -> 1 shared (< threshold)
        3: "alpha beta delta",
        4: "alpha beta delta",
        # single-token doc
        5: "epsilon",
        # identical mixed docs: chunks {alpha beta gamma, delta epsilon} -> 2
        6: "alpha beta gamma delta epsilon",
        7: "alpha beta gamma delta epsilon",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array(
                [len(t) for t in texts.values()], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        (r.doc1, r.doc2): r.n_shared_chunks
        for r in queries["dedup_cdc_chunks"](spark, str(tmp_path)).collect()
    }
    assert rows == {(1, 2): 3, (6, 7): 2}


def test_mid_similarity_head_shingle_recall(spark):
    """ADVICE r6: adversarial recall bound for the candidate index.

    Pairs with raw Jaccard in [0.4, 0.5) whose shared shingles ALL have
    df > _RARE_DF_CAP reach the verifier only through the banded-LSH
    channel, whose per-pair admission is the banding curve probability
    1-(1-s^r)^b (~0.56 at s=0.43 with r=2, b=4) — NOT a guarantee.
    This pins that documented behavior with a deterministic adversarial
    corpus (md5 minhashes are deterministic, so recall is a fixed
    number): recall must be well above zero (the channel works) and
    below one (the docstring's probabilistic caveat is real, i.e. the
    guarantee claim the round-6 advisor flagged would be false).
    """
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.operators.dedup import (
        _RARE_DF_CAP,
        _pair_candidates,
    )

    n_pairs, n_head, n_bg = 60, 100, 120
    rows = []
    # head shingles: each lives in 12 background docs -> df > cap
    for h in range(n_head):
        for j in range(12):
            rows.append(((h * 7 + j) % n_bg, h))
    # planted pairs: 12 shared HEAD shingles + 8 unique each
    # -> raw Jaccard = 12 / (20 + 20 - 12) = 0.4286 in [0.4, 0.5)
    for p in range(n_pairs):
        shared = [(p * 13 + k * 17) % n_head for k in range(12)]
        assert len(set(shared)) == 12
        for s in shared:
            rows.append((10_000 + p, s))
            rows.append((20_000 + p, s))
        for i in range(8):
            rows.append((10_000 + p, 1_000_000 + p * 100 + i))
            rows.append((20_000 + p, 2_000_000 + p * 100 + i))
    sh = spark.createDataFrame(rows, "doc_id long, sid long")

    # every shared shingle is non-rare by construction
    head_df = (
        sh.groupBy("sid").count().filter(F.col("sid") < n_head)
        .agg(F.min("count")).collect()[0][0]
    )
    assert head_df > _RARE_DF_CAP

    cands = {
        (r.doc1, r.doc2)
        for r in _pair_candidates(sh).filter(F.col("doc1") >= 10_000).collect()
    }
    found = sum((10_000 + p, 20_000 + p) in cands for p in range(n_pairs))
    recall = found / n_pairs
    # deterministic given the fixed corpus; expected ~0.56 from the
    # banding curve.  Loose bounds so fixture tweaks don't flake it.
    assert 0.2 <= recall < 1.0, f"recall {recall} outside documented band"


def test_array_intersect_verify_matches_join_counts(spark):
    """The r14 array-intersect verify (_doc_sid_sets + _verify_counts)
    must produce the same (n_common, n1, n2) as the exploded
    join-and-count it replaced, including duplicate-sid rows if a hash
    fold ever produced one within a doc (the helper's documented edge)."""
    from pyspark.sql import functions as F

    from aind_hcr_data_transformation_spark.operators.dedup import (
        _doc_sid_sets,
        _verify_counts,
    )

    sh = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 11), (2, 12), (2, 13),
         (3, 99), (4, 10), (4, 13)],
        "doc_id long, sid long",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (1, 4)], "doc1 long, doc2 long"
    )
    new = {
        (r.doc1, r.doc2): (r.n_common, r.n1, r.n2)
        for r in _verify_counts(cands, _doc_sid_sets(sh), "doc1", "doc2").collect()
    }
    # reference: the old exploded join + count + sizes
    sizes = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    s = {}
    for r in sh.collect():
        s.setdefault(r.doc_id, set()).add(r.sid)
    for (d1, d2) in [(1, 2), (1, 3), (2, 4), (1, 4)]:
        expected = (len(s[d1] & s[d2]), sizes[d1], sizes[d2])
        assert new[(d1, d2)] == expected, (d1, d2, new[(d1, d2)], expected)
