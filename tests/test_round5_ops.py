"""Semantic invariants for the round-5 operators — properties the
differential oracle can't express (it only proves Spark == DuckDB, not
that the shared semantics are the INTENDED ones)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_mmr_diversifies_against_plain_topk(spark, queries):
    """MMR must (a) pick the same #1 as relevance ranking, (b) never pick
    outside the candidate pool, (c) produce strictly valid greedy scores:
    each later pick's mmr_score is within (1−λ)·|max_sim| ≤ 0.3 of
    λ·its relevance (cosines live in [−1, 1], so the diversity term can
    add as well as subtract), (d) no passage picked twice per query."""
    topk = {
        (r["qid"], r["vec_id"]): r["rank"]
        for r in queries["sim_cosine_topk"](spark, SF_DIR).collect()
    }
    rel = {
        (r["qid"], r["vec_id"]): r["cos"]
        for r in queries["sim_cosine_topk"](spark, SF_DIR).collect()
    }
    mmr = queries["rag_mmr_rerank"](spark, SF_DIR).collect()
    assert len(mmr) == 15  # 5 queries × 3 picks
    for r in mmr:
        key = (r["qid"], r["vec_id"])
        assert key in topk, "MMR picked outside the top-10 pool"
        if r["sel_rank"] == 1:
            assert topk[key] == 1, "first MMR pick must be the most relevant"
            assert r["mmr_score"] == rel[key]
        else:
            assert abs(r["mmr_score"] - 0.7 * rel[key]) <= 0.3 + 1e-9
    for qid in {r["qid"] for r in mmr}:
        picks = [r["vec_id"] for r in mmr if r["qid"] == qid]
        assert len(picks) == len(set(picks)) == 3


def test_pq_codes_and_error_bounds(spark, queries):
    """Every vector gets 4 in-range codes; reconstruction error is
    non-negative and zero-ish only if a vector IS a centroid."""
    rows = queries["embed_pq_quantize"](spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        for m in range(4):
            assert 0 <= r[f"code{m}"] < 4
        assert r["sq_err"] >= 0.0
    # quantization must compress: far fewer distinct code tuples than rows
    tuples = {(r["code0"], r["code1"], r["code2"], r["code3"]) for r in rows}
    assert len(tuples) <= 256  # at most k^M
    assert len(tuples) > 1


def test_canonical_pick_keeps_best_member(spark, queries):
    """The keeper must be a member of its component and carry the
    component's maximum quality score; n_members ≥ 2 (CC emits only
    non-singleton components)."""
    comps = queries["dedup_components"](spark, SF_DIR).collect()
    members: dict[int, list[int]] = {}
    for r in comps:
        members.setdefault(r["component"], []).append(r["doc_id"])
    picks = queries["dedup_canonical_pick"](spark, SF_DIR).collect()
    assert {r["component"] for r in picks} == set(members)
    for r in picks:
        assert r["keeper"] in members[r["component"]]
        assert r["n_members"] == len(members[r["component"]])
        assert r["n_members"] >= 2


def test_boilerplate_strip_invariants(spark, queries):
    """Survivor counts never exceed originals; surviving text is a
    subsequence of the original token stream; SOMETHING was stripped at
    fixture scale (the derived cut fires on the small vocab)."""
    out = {r["doc_id"]: r for r in queries["boilerplate_strip"](spark, SF_DIR).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    stripped_any = False
    for doc_id, text in docs.items():
        toks = text.split(" ")
        r = out[doc_id]
        assert r["n_before"] == len(toks)
        assert 0 <= r["n_after"] <= r["n_before"]
        if r["n_after"] < r["n_before"]:
            stripped_any = True
        # subsequence check
        kept = r["cleaned_text"].split(" ") if r["cleaned_text"] else []
        it = iter(toks)
        assert all(tok in it for tok in kept), f"doc {doc_id} not a subsequence"
    assert stripped_any


def test_salted_join_matches_plain_join(spark, queries):
    """The salted join is semantically a no-op vs the plain join."""
    from pyspark.sql import functions as F

    got = {
        r["s_nationkey"]: (r["n_items"], r["revenue"])
        for r in queries["join_salted_skew"](spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    plain = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,10)")), 2)
            .cast("double")
            .alias("rev"),
        )
        .collect()
    )
    assert got == {r["s_nationkey"]: (r["n"], r["rev"]) for r in plain}


def test_cdc_apply_deletes_tombstones(spark, queries):
    """Keys whose latest change is a delete must be absent even when the
    base snapshot contains them; never-changed snapshot rows survive
    unmodified."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    latest = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    deleted = {r["user_id"] for r in latest if r["event_type"] == "purchase"}
    out_keys = {
        r["custkey"] for r in queries["cdc_apply_deletes"](spark, SF_DIR).collect()
    }
    cust_keys = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    assert deleted, "fixture should contain delete tombstones"
    assert not (deleted & out_keys), "tombstoned keys leaked into the result"
    untouched = cust_keys - {r["user_id"] for r in latest}
    assert untouched <= out_keys, "unchanged snapshot rows must survive"
