"""bpe_learn_merges must apply merges with EXACT greedy BPE semantics.

The three learned merges on a hand-computed corpus pin the application
step: round 2 and 3 counts are only right if round 1's merge rewrote
``aaaa`` → ``aa aa`` and ``aaa`` → ``aa a`` (greedy left-to-right,
non-overlapping — the Sennrich et al. 2016 contract). An overlapping or
regex-replace-style implementation produces different round-3 counts
and fails here.

Hand computation for text ``"aaaa aaa baaab cc cc cc"``:

* round 1 pairs: (a,a)=3+2+2=7, (c,c)=3, (b,a)=1, (a,b)=1 → merge (a,a,7)
* greedy apply: aaaa→[aa,aa], aaa→[aa,a], baaab→[b,aa,a,b], cc→[c,c]
* round 2 pairs: (c,c)=3, (aa,a)=1+1=2, (aa,aa)=1, (b,aa)=1, (a,b)=1
  → merge (c,c,3)
* round 3 pairs: (aa,a)=2 beats the 1-count pairs → merge (aa,a,2)
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def bpe_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_sf")
    spark.createDataFrame(
        [(0, "aaaa aaa baaab cc cc cc", "en", "src0", 23)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_greedy_merge_application(spark, queries, bpe_dir):
    got = {
        (r["rank"], r["left_sym"], r["right_sym"], r["n_pairs"])
        for r in queries["bpe_learn_merges"](spark, bpe_dir).collect()
    }
    assert got == {(1, "a", "a", 7), (2, "c", "c", 3), (3, "aa", "a", 2)}


def test_oracle_agrees_on_adversarial_corpus(spark, bpe_dir):
    """The DuckDB oracle reproduces the same three merges on the same
    adversarial fixture — the greedy islands logic is mirrored, not
    coincidentally equal on easy data."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{bpe_dir}/documents.parquet/*.parquet')"
    )
    rows = set(
        map(tuple, con.execute(entrymod.oracle_sql()["bpe_learn_merges"]).fetchall())
    )
    assert rows == {(1, "a", "a", 7), (2, "c", "c", 3), (3, "aa", "a", 2)}


def test_tokenize_applies_all_learned_merges(spark, queries, bpe_dir):
    """Hand computation on the same fixture, all THREE merges applied:
    aaaa→[aa,aa] (merge 3 (aa,a) does not match (aa,aa)), aaa→[aaa],
    baaab→[b,aaa,b], cc→[cc]×3 instances → 6 words, 9 tokens, 18 chars,
    exactly 2.0 chars/token."""
    rows = queries["bpe_tokenize_corpus"](spark, bpe_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["source"],
        r["n_words"],
        r["n_tokens"],
        r["n_chars"],
        r["chars_per_token"],
    ) == ("src0", 6, 9, 18, 2.0)


@settings(max_examples=20, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=10),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b", "c", "ab", "bc"]),
        st.sampled_from(["a", "b", "c", "ab", "bc"]),
    ),
)
def test_apply_merge_fold_matches_python_greedy(spark, words, pair):
    """Property pin for the round-7 array-fold _apply_merge: on random
    symbol sequences and an arbitrary (a, b) merge — including
    self-merges like (a, a) and multi-char symbols — the fold must
    agree with a direct Python statement of the greedy left-to-right
    non-overlapping contract."""
    from aind_hcr_data_transformation_spark.operators.textprep import (
        _apply_merge,
    )

    a, b = pair

    def ref(sym_seq):
        out, i = [], 0
        while i < len(sym_seq):
            if (
                i + 1 < len(sym_seq)
                and sym_seq[i] == a
                and sym_seq[i + 1] == b
            ):
                out.append(a + b)
                i += 2
            else:
                out.append(sym_seq[i])
                i += 1
        return out

    rows = [(w, 1, list(w)) for w in words]
    df = spark.createDataFrame(
        rows, "w string, wn long, s array<string>"
    )
    merge = spark.createDataFrame([(a, b)], "a string, b string")
    got = {r["w"]: list(r["s"]) for r in _apply_merge(df, merge).collect()}
    assert got == {w: ref(list(w)) for w in words}
