"""Training-data preparation operators for LLM pipelines: sequence
packing, benchmark-contamination detection, PII redaction, document
chunking, stratified sampling.

Complements ``textops`` (analysis) and ``dedup`` (duplicate removal)
with the *transform* stages of a pretraining-data pipeline.  All
JVM-side (split / sequence / explode / regexp / window — no Python in
the hot path).  Scale notes per operator:

* seq_pack — the cumulative-offset window is partitioned by ``source``
  (the shard key), never global: each shard packs independently, which
  is exactly how a 100 TB corpus is packed in practice (per input shard
  or per worker), so no single-partition window bottleneck.
* contamination — the benchmark n-gram set is tiny by construction
  (benchmarks are KBs, corpora are TBs); it broadcasts, and the corpus
  side never shuffles its text, only (doc_id, shingle-hash) pairs.
* pii_redact / doc_chunk — embarrassingly parallel per document.
* sample_stratified — one hash + one broadcast join + one aggregate;
  deterministic across engines, reruns, and cluster layouts (md5-based,
  like ``textops.sample_hash_split``).

Determinism: every cross-engine output is integer arithmetic or md5 —
see ``functions/compat`` for the float rules used elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import persist_tracked
from ..functions.compat import dround, sql_round
from ..tables import load_table, table_count

# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk, per shard)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 64  # tokens per packed training sequence


def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing, per ``source`` shard:
    documents are concatenated in doc_id order and cut into fixed
    ``_PACK_BUDGET``-token sequences; a document whose token span crosses
    a cut contributes to every chunk it overlaps.

    Relational formulation: a running-offset window gives each doc its
    token span ``[cum_before, cum_before + n_tok)``; the chunks it
    touches are ``floor(cum_before/B) .. floor((cum_before+n_tok-1)/B)``
    — one ``sequence``+``explode``, then a per-chunk aggregate.  The
    window partitions by the shard key (``source``), so packing is
    embarrassingly parallel across shards — no global ordering exists,
    matching how production packing shards the corpus.

    Output per (source, chunk_id): docs overlapping the chunk, tokens
    filled, and how many of those docs straddle the chunk's left edge
    (continuation fragments a trainer would mask or drop).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = toks.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_before"),
    )
    b = F.lit(_PACK_BUDGET)
    touched = spans.select(
        "source",
        "cum_before",
        "n_tok",
        F.explode(
            F.sequence(
                (F.col("cum_before") / b).cast("long"),
                ((F.col("cum_before") + F.col("n_tok") - 1) / b).cast("long"),
            )
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * b
    return (
        touched.groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.least(start + b, F.col("cum_before") + F.col("n_tok"))
                - F.greatest(start, F.col("cum_before"))
            ).alias("n_tokens"),
            F.sum(
                F.when(F.col("cum_before") < start, 1).otherwise(0)
            ).alias("n_straddlers"),
        )
    )


SEQ_PACK_SQL = f"""
WITH spans AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tok,
         CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM documents
),
touched AS (
  SELECT source, cum_before, n_tok,
         unnest(range(cum_before // {_PACK_BUDGET},
                      (cum_before + n_tok - 1) // {_PACK_BUDGET} + 1)) AS chunk_id
  FROM spans
)
SELECT source, chunk_id,
       count(*) AS n_docs,
       CAST(sum(least((chunk_id + 1) * {_PACK_BUDGET}, cum_before + n_tok)
           - greatest(chunk_id * {_PACK_BUDGET}, cum_before)) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cum_before < chunk_id * {_PACK_BUDGET} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_straddlers
FROM touched
GROUP BY source, chunk_id
ORDER BY source, chunk_id
"""


# ---------------------------------------------------------------------------
# benchmark-contamination detection (n-gram overlap)
# ---------------------------------------------------------------------------

_CONTAM_MOD = 50  # doc_id % 50 == 0 designates the stand-in benchmark set
_CONTAM_FLAG = 0.2  # flag docs whose distinct-3-gram hit ratio ≥ this


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct 3-word shingles per document —
    the same construction as ``dedup._shingles`` but over the raw
    ``documents`` table (no mutant corpus)."""
    t = F.split("text", " ")
    idx = F.sequence(F.lit(0), F.size(t) - 3)
    return (
        docs.filter(F.size(t) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        idx,
                        lambda i: F.concat_ws(
                            " ", t[i], t[i + 1], t[i + 2]
                        ),
                    )
                )
            ).alias("shingle"),
        )
    )


def contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: which corpus documents share a
    suspicious fraction of their 3-grams with a benchmark/eval set?
    (The decontamination step every pretraining pipeline runs before
    training — n-gram overlap is the method used for GPT-3/PaLM-style
    reports.)

    The benchmark stand-in is ``doc_id % {mod} == 0``.  Its distinct
    3-gram set is tiny relative to the corpus (real benchmarks are KBs
    vs TBs), so it BROADCASTS; corpus docs join their shingles against
    it and aggregate hit counts — the corpus text itself never
    shuffles.  Output: contaminated docs (≥1 shared gram) with the hit
    ratio over the doc's distinct grams and a ≥{flag} flag.
    """.format(mod=_CONTAM_MOD, flag=_CONTAM_FLAG)
    # spread: the shingle explosion is the CPU-heavy pre-shuffle stage
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # filter BEFORE the explode on both branches (bench and corpus doc
    # sets are disjoint, so every doc is shingled exactly once across
    # the two — no persist needed), then ONE aggregate: the broadcast
    # LEFT join marks benchmark shingles and totals/hits come out of
    # the same pass
    bench = (
        _doc_shingles(docs.filter(F.col("doc_id") % _CONTAM_MOD == 0))
        .select("shingle")
        .distinct()
    )
    corpus_sh = _doc_shingles(docs.filter(F.col("doc_id") % _CONTAM_MOD != 0))
    ratio = F.col("n_hits") / F.col("n_grams")
    return (
        corpus_sh.join(
            F.broadcast(bench.withColumn("_hit", F.lit(1))), "shingle", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
        .filter(F.col("n_hits") >= 1)
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            dround(ratio, 4).alias("hit_ratio"),
            (ratio >= _CONTAM_FLAG).alias("flagged"),
        )
    )


CONTAMINATION_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {_CONTAM_MOD} = 0
),
corpus AS (SELECT * FROM sh WHERE doc_id % {_CONTAM_MOD} <> 0),
totals AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM corpus c JOIN bench b USING (shingle)
  GROUP BY c.doc_id
)
SELECT t.doc_id, t.n_grams, h.n_hits,
       {sql_round('h.n_hits / t.n_grams', 4)} AS hit_ratio,
       h.n_hits / t.n_grams >= {_CONTAM_FLAG} AS flagged
FROM totals t JOIN hits h ON t.doc_id = h.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the constant-memory scale path)
# ---------------------------------------------------------------------------

#: probes per shingle; ~32 bits/key at k=5 gives FP ≈ 1e-4
_BLOOM_K = 5
_BLOOM_BITS_PER_KEY = 32


def _bloom_m(n_keys: int) -> int:
    """Filter size in bits: smallest power of two ≥ 32·n, clamped to
    [2^10, 2^26] — integer-exact, mirrored by the SQL CASE ladder
    (:func:`_sql_bloom_m`), the same derived-from-data pattern as
    ``dedup._emb_bits``."""
    t = max(1, _BLOOM_BITS_PER_KEY * n_keys)
    return min(1 << 26, max(1 << 10, 1 << (t - 1).bit_length()))


def _sql_bloom_m(t_expr: str) -> str:
    cases = " ".join(
        f"WHEN {t_expr} <= {1 << p} THEN {1 << p}" for p in range(10, 27)
    )
    return f"(CASE {cases} ELSE {1 << 26} END)"


def _bloom_pos(seed: int, m: int):
    """Probe position for ``seed``: md5 60-bit prefix of ``seed:shingle``
    mod m — the engine-exact hash family both engines share."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col("shingle"))), 1, 15),
            16,
            10,
        ).cast("long")
        % m
    )


def contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter — the
    constant-memory scale path. :func:`contamination` broadcasts the
    EXACT benchmark shingle set, which works while benchmarks are small;
    at a 100-TB corpus with a large held-out suite the exact set outgrows
    a broadcast, and production pipelines switch to a Bloom filter
    (false positives only ⇒ over-removal, never leakage).

    Spark-first construction, no driver-side bitmap: the filter IS a
    DataFrame of (word_idx, 32-bit word) built by ``bit_or`` aggregation
    over the k probe positions of every benchmark shingle; membership is
    ONE broadcast join of corpus probes against those words plus
    ``bool_and`` over each shingle's k probes. Geometry derives from the
    benchmark shingle count with the same integer-exact power-of-two
    ladder in both engines, so the DuckDB oracle reproduces the filter
    bit-for-bit — the differential check covers the false-positive
    behavior too, not just the happy path.

    Output matches :func:`contamination`'s shape (bloom hits replace
    exact hits; false positives can add rows — that is the documented
    trade)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    bench_sh = persist_tracked(
        _doc_shingles(docs.filter(F.col("doc_id") % _CONTAM_MOD == 0))
        .select("shingle")
        .distinct()
    )
    m = _bloom_m(bench_sh.count())

    probe_arr = F.array(*[_bloom_pos(s, m) for s in range(_BLOOM_K)])
    words = (
        bench_sh.select(F.explode(probe_arr).alias("pos"))
        .select(
            F.expr("pos div 32").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )

    # NOTE (r13): a K-chained-broadcast-probe rewrite (one join per
    # seed, no explode, no (doc_id, shingle) regroup) was tried and
    # MEASURED SLOWER (2.6 → 3.7 s at sf0.1): the explode's ×K rows
    # collapse map-side in the partial bool_and aggregation, so the
    # exchange already carries ~1 row per shingle, while the chained
    # form paid K broadcast builds. Kept the explode+regroup shape.
    corpus_sh = _doc_shingles(docs.filter(F.col("doc_id") % _CONTAM_MOD != 0))
    probes = corpus_sh.select(
        "doc_id", "shingle", F.explode(probe_arr).alias("pos")
    ).select(
        "doc_id",
        "shingle",
        F.expr("pos div 32").alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias(
            "mask"
        ),
    )
    per_shingle = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .select(
            "doc_id",
            "shingle",
            F.coalesce(
                F.expr("(word & mask) != 0"), F.lit(False)
            ).alias("bit_set"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.bool_and("bit_set").alias("all_set"))
    )
    ratio = F.col("n_bloom_hits") / F.col("n_grams")
    return (
        per_shingle.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("all_set").cast("long")).alias("n_bloom_hits"),
        )
        .filter(F.col("n_bloom_hits") >= 1)
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            dround(ratio, 4).alias("hit_ratio"),
            (ratio >= _CONTAM_FLAG).alias("flagged"),
        )
    )


def _bloom_sql() -> str:
    from .dedup import _sql_md5_prefix_int

    seeds = ", ".join(str(s) for s in range(_BLOOM_K))
    pos = _sql_md5_prefix_int("s::VARCHAR || ':' || shingle")
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_CONTAM_MOD} = 0),
geom AS (
  SELECT {_sql_bloom_m(f"{_BLOOM_BITS_PER_KEY} * n")} AS m
  FROM (SELECT count(*) AS n FROM bench)
),
seeds AS (SELECT unnest([{seeds}]) AS s),
bwords AS (
  SELECT pos // 32 AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word
  FROM (
    SELECT ({pos}) % m AS pos FROM bench, geom, seeds
  )
  GROUP BY 1
),
probes AS (
  SELECT doc_id, shingle, ({pos}) % m AS pos
  FROM sh, geom, seeds
  WHERE doc_id % {_CONTAM_MOD} <> 0
),
per_shingle AS (
  SELECT p.doc_id, p.shingle,
         bool_and(coalesce(
           (w.word & (1::BIGINT << CAST(p.pos % 32 AS INTEGER))) <> 0, FALSE
         )) AS all_set
  FROM probes p LEFT JOIN bwords w ON p.pos // 32 = w.word_idx
  GROUP BY 1, 2
)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN all_set THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       {sql_round('sum(CASE WHEN all_set THEN 1 ELSE 0 END) / count(*)', 4)} AS hit_ratio,
       sum(CASE WHEN all_set THEN 1 ELSE 0 END) / count(*) >= {_CONTAM_FLAG} AS flagged
FROM per_shingle
GROUP BY doc_id
HAVING CAST(sum(CASE WHEN all_set THEN 1 ELSE 0 END) AS BIGINT) >= 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction (regex scrub with match accounting)
# ---------------------------------------------------------------------------

# Patterns restricted to the syntax subset where Java regex (Spark) and
# RE2 (DuckDB) agree: char classes, +, bounded repeats, escaped '+'.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing with match accounting: redact e-mail addresses and
    phone numbers, report how many of each were removed per document
    (the audit trail a compliance pipeline keeps).

    The synthetic corpus contains no PII, so the query PLANTS a
    deterministic contact line per document (one e-mail + one phone;
    every 7th doc gets a second e-mail) and then scrubs it — the planted
    text doubles as ground truth, pinned by
    ``tests/test_textprep.py``.  Pure ``regexp_replace`` /
    ``regexp_count`` over each row: embarrassingly parallel, no
    shuffle until the final ordering.  Output keeps md5(redacted) rather
    than the full text so the comparison payload stays narrow.
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" cc admin"),
                F.col("doc_id").cast("string"),
                F.lit("@example.org"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    # No trailing orderBy (guide §2.4): range sampling re-executes the
    # regex plant/redact projection; ordering is cosmetic to the oracle.
    return docs.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(planted, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).alias("redacted_len"),
    )


PII_REDACT_SQL = rf"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         || CASE WHEN doc_id % 7 = 0
                 THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@example.org'
                 ELSE '' END
         || ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS full_text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, full_text,
         regexp_replace(
           regexp_replace(full_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '\+1-555-[0-9]{{4}}', '<PHONE>', 'g') AS redacted
  FROM planted
)
SELECT doc_id,
       CAST(len(regexp_extract_all(full_text, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(full_text, '\+1-555-[0-9]{{4}}')) AS INTEGER) AS n_phones,
       md5(redacted) AS redacted_md5,
       CAST(length(redacted) AS INTEGER) AS redacted_len
FROM scrubbed
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# document chunking (overlapping token windows)
# ---------------------------------------------------------------------------

_CHUNK_W = 32  # tokens per chunk
_CHUNK_S = 24  # stride (overlap = W - S = 8 tokens)


def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    embedding/RAG preprocessing step): windows of ``_CHUNK_W`` tokens
    every ``_CHUNK_S`` tokens, last window truncated at the document
    end.

    ``sequence`` generates the window starts, ``slice`` takes each
    window — all array built-ins inside whole-stage codegen, no UDF.
    Per-document and embarrassingly parallel; output carries
    md5(chunk text) instead of the text to keep rows narrow.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    starts = F.sequence(F.lit(0), F.size(t) - 1, F.lit(_CHUNK_S))
    exploded = docs.select(
        "doc_id",
        t.alias("toks"),
        F.size(t).alias("n_tok"),
        F.explode(starts).alias("start_tok"),
    )
    chunk_text = F.array_join(
        F.slice(F.col("toks"), F.col("start_tok") + 1, _CHUNK_W), " "
    )
    return exploded.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_S).cast("int").alias("chunk_idx"),
        "start_tok",
        F.least(F.lit(_CHUNK_W), F.col("n_tok") - F.col("start_tok")).alias(
            "n_chunk_tokens"
        ),
        F.md5(chunk_text).alias("chunk_md5"),
    )


DOC_CHUNK_SQL = f"""
WITH exploded AS (
  SELECT doc_id, t AS toks, len(t) AS n_tok,
         unnest(range(0, len(t), {_CHUNK_S})) AS start_tok
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
)
SELECT doc_id,
       CAST(start_tok // {_CHUNK_S} AS INTEGER) AS chunk_idx,
       start_tok,
       CAST(least({_CHUNK_W}, n_tok - start_tok) AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(
         list_slice(toks, start_tok + 1, least(start_tok + {_CHUNK_W}, n_tok)),
         ' ')) AS chunk_md5
FROM exploded
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# stratified sampling (deterministic per-language rates)
# ---------------------------------------------------------------------------

# Per-language keep thresholds out of 2^16 (integer compare against the
# first 16 bits of md5(doc_id) — exact, engine- and layout-independent).
_STRATA_THR: dict[str, int] = {
    "en": 8192,   # downsample the majority language hard (12.5%)
    "de": 16384,  # 25%
    "es": 32768,  # 50%
    "fr": 49152,  # 75%
    "zh": 57344,  # 87.5% — keep nearly all of the rarest stratum
}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling with per-language rates — the data-mix
    rebalancing step of a pretraining pipeline (downsample dominant
    languages, keep rare ones).

    Deterministic: a doc is kept iff the first 16 bits of
    md5(doc_id) fall below its language's threshold — reproducible
    across engines, reruns, and cluster layouts, unlike
    ``rand()``/``TABLESAMPLE`` (same rationale as
    ``textops.sample_hash_split``).  One broadcast join against the
    5-row rate table + one aggregate.  Output: per-language totals,
    kept counts, and the realized rate.
    """
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        list(_STRATA_THR.items()), "lang string, thr int"
    )
    h16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    kept = F.when(h16 < F.col("thr"), 1).otherwise(0)
    return (
        docs.join(F.broadcast(rates), "lang", "left")
        .withColumn("thr", F.coalesce("thr", F.lit(0)))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).alias("n_kept"),
            dround(F.sum(kept) / F.count(F.lit(1)), 4).alias("realized_rate"),
        )
    )


_NIB = "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {p}, 1)) - 1)"
_H16 = f"({_NIB.format(p=1)} * 4096 + {_NIB.format(p=2)} * 256 + {_NIB.format(p=3)} * 16 + {_NIB.format(p=4)})"

_STRATA_VALUES = ", ".join(f"('{k}', {v})" for k, v in _STRATA_THR.items())

SAMPLE_STRATIFIED_SQL = f"""
WITH rates(lang, thr) AS (VALUES {_STRATA_VALUES}),
scored AS (
  SELECT d.lang,
         CASE WHEN {_H16} < coalesce(r.thr, 0) THEN 1 ELSE 0 END AS kept
  FROM documents d LEFT JOIN rates r USING (lang)
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       {sql_round('sum(kept) / count(*)', 4)} AS realized_rate
FROM scored
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# data mixing: token-budget-driven multi-source sampling
# ---------------------------------------------------------------------------

# Corpus-level token budget as an exact fraction of the total (the
# "train on 40% of available tokens" knob of a mixing recipe).
_MIX_NUM, _MIX_DEN = 2, 5


def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data MIXING: hit a corpus-level token budget with
    per-source shares proportional to a mixing weight — the Pile/Dolma-
    style recipe step that upweights curated sources and downweights
    bulk web text when assembling a pretraining corpus.

    Unlike ``sample_stratified`` (fixed per-stratum thresholds), the
    per-source keep thresholds here are DERIVED FROM THE DATA in a
    first aggregation pass: target tokens for source s =
    ``budget · w_s / Σw``, threshold = ``min(2¹⁶, 2¹⁶·target_s /
    tokens_s)`` — all exact integer arithmetic, so both engines derive
    identical thresholds (the same data-derived-parameter discipline as
    the LSH band widths).  A source whose availability is below its
    target is kept whole (rate capped at 1) — exactly what real mixers
    hit on small curated sources.  Weights tier by source id
    (id mod 4 → 4/2/2/1), standing in for the recipe's per-source
    config.

    Selection is md5-deterministic per doc_id (reproducible across
    engines, reruns, partitionings — no ``rand()``).  Scale shape: one
    per-source stats aggregate (map-side combine, k rows) + broadcast
    of the k-row rate table + one filtered re-aggregate — two scans,
    zero wide shuffles.  Output: per-source totals, threshold, kept
    counts and kept tokens."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
    )
    srcn = F.regexp_replace(F.col("source"), "[^0-9]", "").cast("int")
    weight = (
        F.when(srcn % 4 == 0, 4)
        .when(srcn % 4 == 1, 2)
        .when(srcn % 4 == 2, 2)
        .otherwise(1)
    ).cast("long")
    stats = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("src_toks"))
        .withColumn("w", weight)
    )
    totals = stats.agg(
        F.sum("src_toks").alias("tot_toks"), F.sum("w").alias("tot_w")
    )
    rates = (
        stats.crossJoin(F.broadcast(totals))
        .withColumn(
            "thr",
            F.least(
                F.lit(65536).cast("long"),
                F.expr(
                    f"(65536 * ((tot_toks * {_MIX_NUM}) div {_MIX_DEN}) * w)"
                    " div (tot_w * src_toks)"
                ),
            ),
        )
        .select("source", "w", "n_docs", "src_toks", "thr")
    )
    h16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    kept = (
        docs.join(F.broadcast(rates.select("source", "thr")), "source")
        .withColumn("kept", F.when(h16 < F.col("thr"), 1).otherwise(0))
        .groupBy("source")
        .agg(
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(F.col("kept") * F.col("toks")).cast("long").alias("toks_kept"),
        )
    )
    return kept.join(F.broadcast(rates), "source").select(
        "source", "w", "n_docs", "src_toks", "thr", "n_kept", "toks_kept"
    )


MIX_TOKEN_BUDGET_SQL = f"""
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents
),
stats AS (
  SELECT source, count(*) AS n_docs, sum(toks) AS src_toks,
         CAST(CASE CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INTEGER) % 4
              WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 1 END AS BIGINT) AS w
  FROM docs GROUP BY source
),
totals AS (SELECT sum(src_toks) AS tot_toks, sum(w) AS tot_w FROM stats),
rates AS (
  SELECT source, w, n_docs, CAST(src_toks AS BIGINT) AS src_toks,
         CAST(least(65536, (65536 * ((tot_toks * {_MIX_NUM}) // {_MIX_DEN}) * w)
                    // (tot_w * src_toks)) AS BIGINT) AS thr
  FROM stats CROSS JOIN totals
),
kept AS (
  SELECT d.source,
         CAST(sum(CASE WHEN {_H16} < r.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN {_H16} < r.thr THEN d.toks ELSE 0 END) AS BIGINT) AS toks_kept
  FROM docs d JOIN rates r USING (source)
  GROUP BY d.source
)
SELECT source, w, n_docs, src_toks, thr, n_kept, toks_kept
FROM kept JOIN rates USING (source)
"""


# ---------------------------------------------------------------------------
# DSIR-shaped importance selection (Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256   # hashed n-gram feature buckets (the paper uses 10k)
_DSIR_TOP = 50        # docs selected
_DSIR_SCALE = 65536   # integer likelihood-ratio scale (2^16)


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling, DSIR-shaped (Xie et
    al. 2023): score every document by how target-like its hashed
    n-gram (unigram + bigram) feature distribution is, then select the
    top documents — the published recipe for picking pretraining data
    that matches a target domain (here: the ``lang='en'`` slice stands
    in for the target corpus; the whole table is the raw pool).

    Deviation from the paper, by design: per-bucket LOG-likelihood
    ratios are replaced by INTEGER-scaled likelihood ratios
    ``s_b = (2¹⁶ · p_b) // q_b`` (add-one smoothed) and the document
    score is the exact integer ``Σ c_b · s_b`` — ``ln`` is a libm call
    with no cross-engine bit guarantee, while this variant keeps the
    same per-bucket monotonicity and makes the whole selection
    differentially testable.  (Integer headroom: 2¹⁶·cnt·total fits
    int64 up to ~2¹⁵ tokens of target corpus per bucket ratio term; a
    100 TB deployment lifts the products into decimal(38), same plan.)

    Plan shape: one explode to (doc, bucket) counts, two bucket-stat
    aggregates (256-row tables), a broadcast join of bucket scores back
    onto per-doc counts, one sum per doc, global top-k
    (TakeOrderedAndProject).  No wide shuffles beyond the doc-count
    aggregate."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("t")
    )
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(
                F.col("t"),
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(F.col("t"), i),
                            F.element_at(F.col("t"), i + 1),
                        ),
                    ),
                ).otherwise(F.array()),
            )
        ).alias("g"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("int")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    # r13 (guide §2.3): aggregate to per-(doc, bucket) counts ONCE and
    # persist THAT — both consumers (bucket models, per-doc scores) used
    # to re-scan the raw exploded gram rows; the counts relation is ~3×
    # smaller and the second full pass over cached gram rows disappears.
    # Integer sums are associative, so tn/rn and the doc sums are the
    # same values (lang is functionally dependent on doc_id).
    counts = persist_tracked(
        grams.groupBy("doc_id", "lang", "b").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    # bucket models: add-one smoothed counts for target (en) and raw pool
    stats = counts.groupBy("b").agg(
        (
            F.sum(
                F.when(F.col("lang") == "en", F.col("c")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            + 1
        ).alias("tn"),
        (F.sum("c") + 1).alias("rn"),
    )
    totals = stats.agg(
        F.sum("tn").alias("tt"), F.sum("rn").alias("rt")
    )
    scores = stats.crossJoin(F.broadcast(totals)).select(
        "b",
        F.expr(f"({_DSIR_SCALE} * tn * rt) div (rn * tt)").alias("s"),
    )
    # score = per-gram AVERAGE ratio (exact integer numerator/denominator,
    # one deterministic double division): the raw DSIR weight is a product
    # over grams, so its log scales with length and top-k degenerates to
    # "longest target-ish doc"; the per-gram mean is the length-normalized
    # deterministic stand-in for the paper's Gumbel resampling
    per_doc = (
        counts.select("doc_id", "b", "c")
        .join(F.broadcast(scores), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("s")).alias("num"),
            F.sum("c").alias("den"),
        )
        .select(
            "doc_id",
            (F.col("num").cast("double") / F.col("den")).alias("avg_s"),
        )
    )
    # distributed top-k (TakeOrderedAndProject) FIRST, then rank the
    # k survivors — a global row_number window over every doc would be a
    # single-reducer sort of the whole corpus
    top = per_doc.orderBy(F.desc("avg_s"), F.asc("doc_id")).limit(_DSIR_TOP)
    w = Window.orderBy(F.desc("avg_s"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", dround(F.col("avg_s"), 6).alias("avg_score")
    )


_GNIB = "(instr('0123456789abcdef', substr(md5(g), {p}, 1)) - 1)"
_GH16 = (
    f"({_GNIB.format(p=1)} * 4096 + {_GNIB.format(p=2)} * 256 + "
    f"{_GNIB.format(p=3)} * 16 + {_GNIB.format(p=4)})"
)

DSIR_IMPORTANCE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, lang, ({_GH16}) % {_DSIR_BUCKETS} AS b FROM (
    SELECT doc_id, lang, unnest(
      list_concat(
        t,
        CASE WHEN len(t) >= 2
             THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
             ELSE [] END
      )
    ) AS g
    FROM toks
  )
),
stats AS (
  SELECT b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1 AS tn,
         count(*) + 1 AS rn
  FROM grams GROUP BY b
),
totals AS (SELECT sum(tn) AS tt, sum(rn) AS rt FROM stats),
scores AS (
  SELECT b, ({_DSIR_SCALE} * tn * rt) // (rn * tt) AS s
  FROM stats CROSS JOIN totals
),
per_doc AS (
  SELECT c.doc_id,
         CAST(CAST(sum(c.c * s.s) AS BIGINT) AS DOUBLE)
           / CAST(sum(c.c) AS BIGINT) AS avg_s
  FROM (SELECT doc_id, b, count(*) AS c FROM grams GROUP BY doc_id, b) c
  JOIN scores s USING (b)
  GROUP BY c.doc_id
)
SELECT rank, doc_id,
       {sql_round('avg_s', 6)} AS avg_score
FROM (
  SELECT doc_id, avg_s,
         CAST(row_number() OVER (ORDER BY avg_s DESC, doc_id ASC) AS INTEGER) AS rank
  FROM per_doc
)
WHERE rank <= {_DSIR_TOP}
"""


QUERIES = {
    "seq_pack": seq_pack,
    "contamination": contamination,
    "pii_redact": pii_redact,
    "doc_chunk": doc_chunk,
    "sample_stratified": sample_stratified,
    "mix_token_budget": mix_token_budget,
    "dsir_importance": dsir_importance,
}

ORACLES = {
    "seq_pack": SEQ_PACK_SQL,
    "contamination": CONTAMINATION_SQL,
    "pii_redact": PII_REDACT_SQL,
    "doc_chunk": DOC_CHUNK_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "mix_token_budget": MIX_TOKEN_BUDGET_SQL,
    "dsir_importance": DSIR_IMPORTANCE_SQL,
}


# ---------------------------------------------------------------------------
# corpus preparation funnel (quality -> holdout -> dedup -> decontam)
# ---------------------------------------------------------------------------


def corpus_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-data pipeline as ONE query: Gopher
    quality gate → benchmark-holdout removal → exact dedup (min-id
    keeper among survivors) → n-gram decontamination, reported as a
    single funnel row of survivor counts — the dataset-card headline
    every data-prep run publishes.

    Single-pass survival tagging: quality, holdout, and dedup-keeper are
    per-row expressions plus ONE window over ``text`` (the dedup keeper
    is ``min(doc_id) over (partition by text)`` restricted to surviving
    rows — no self-join), and only the decontamination stage adds the
    shingle join of :func:`contamination` (benchmark set broadcasts).
    Scale: one window shuffle on the text key + the broadcast-side
    shingle join; every stage prunes the next stage's input, in the
    order a production pipeline runs them.
    """
    from .textops import (
        _GOPHER_MAX_MWL,
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_ALPHA,
        _GOPHER_MIN_MWL,
        _GOPHER_MIN_STOP,
        _GOPHER_MIN_WORDS,
        _LEXICON,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mwl = (F.length("text") - n + 1) / n
    en_stop = F.array(*[F.lit(w) for w in _LEXICON["en"]])
    n_stop = F.size(F.array_intersect(toks, en_stop))
    alpha = F.size(F.filter(toks, lambda w: w.rlike("^[a-zA-Z]+$"))) / n
    qual_ok = (
        (n >= _GOPHER_MIN_WORDS)
        & (n <= _GOPHER_MAX_WORDS)
        & (mwl >= _GOPHER_MIN_MWL)
        & (mwl <= _GOPHER_MAX_MWL)
        & (n_stop >= _GOPHER_MIN_STOP)
        & (alpha >= _GOPHER_MIN_ALPHA)
    )
    base = docs.select("doc_id", "text", qual_ok.alias("qual_ok")).withColumn(
        "nonbench",
        F.col("qual_ok") & (F.col("doc_id") % _CONTAM_MOD != 0),
    )
    w = Window.partitionBy("text")
    base = persist_tracked(
        base.withColumn(
            "dedup_keep",
            F.col("nonbench")
            & (
                F.col("doc_id")
                == F.min(
                    F.when(F.col("nonbench"), F.col("doc_id"))
                ).over(w)
            ),
        )
    )
    # shingle ONLY what each side needs, pruning before the explode:
    # the benchmark holdout is doc_id % mod == 0 (a pushable filter),
    # and the corpus side shingles just the dedup survivors — explode
    # AFTER the survivor join, never the full corpus
    bench = (
        _doc_shingles(docs.filter(F.col("doc_id") % _CONTAM_MOD == 0))
        .select("shingle")
        .distinct()
    )
    surv_sh = _doc_shingles(
        docs.join(base.filter(F.col("dedup_keep")).select("doc_id"), "doc_id")
    )
    # one pass: broadcast LEFT join marks benchmark shingles, a single
    # aggregate yields totals and hits together (zero-hit docs fall out
    # of the >= threshold exactly as the old inner join dropped them)
    flagged = (
        surv_sh.join(
            F.broadcast(bench.withColumn("_hit", F.lit(1))), "shingle", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
        .filter(F.col("n_hits") / F.col("n_grams") >= _CONTAM_FLAG)
        .select("doc_id")
    )
    # No base⋈flagged join: flagged doc_ids are BY CONSTRUCTION a subset
    # of the dedup survivors (surv_sh shingles exactly the dedup_keep
    # docs) and distinct (groupBy doc_id), so
    # ``n_clean = n_dedup − |flagged|`` — the old LEFT JOIN shuffled the
    # full corpus-sized ``base`` by doc_id just to subtract a count.
    # Two one-row aggregates and a broadcast cross join replace it.
    b = lambda c: F.sum(c.cast("long"))  # noqa: E731
    totals = base.agg(
        F.count(F.lit(1)).alias("n_total"),
        b(F.col("qual_ok")).alias("n_quality"),
        b(F.col("nonbench")).alias("n_nonbench"),
        b(F.col("dedup_keep")).alias("n_dedup"),
    )
    n_flagged = flagged.agg(F.count(F.lit(1)).alias("n_flagged"))
    return totals.crossJoin(F.broadcast(n_flagged)).select(
        "n_total",
        "n_quality",
        "n_nonbench",
        "n_dedup",
        (F.col("n_dedup") - F.col("n_flagged")).alias("n_clean"),
    )


def _funnel_sql() -> str:
    from .textops import (
        _EN_STOP_SQL,
        _GOPHER_MAX_MWL,
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_ALPHA,
        _GOPHER_MIN_MWL,
        _GOPHER_MIN_STOP,
        _GOPHER_MIN_WORDS,
    )

    return f"""
WITH base AS (
  SELECT doc_id, text,
         (len(t) >= {_GOPHER_MIN_WORDS} AND len(t) <= {_GOPHER_MAX_WORDS}
          AND (CAST(length(text) - len(t) + 1 AS DOUBLE)) / len(t) >= {_GOPHER_MIN_MWL}
          AND (CAST(length(text) - len(t) + 1 AS DOUBLE)) / len(t) <= {_GOPHER_MAX_MWL}
          AND len(list_intersect(list_distinct(t), {_EN_STOP_SQL})) >= {_GOPHER_MIN_STOP}
          AND CAST(len(list_filter(t, w -> regexp_full_match(w, '[a-zA-Z]+'))) AS DOUBLE) / len(t) >= {_GOPHER_MIN_ALPHA}
         ) AS qual_ok
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
),
b2 AS (
  SELECT *, qual_ok AND doc_id % {_CONTAM_MOD} <> 0 AS nonbench FROM base
),
b3 AS (
  SELECT *,
         nonbench AND doc_id = min(CASE WHEN nonbench THEN doc_id END)
           OVER (PARTITION BY text) AS dedup_keep
  FROM b2
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_CONTAM_MOD} = 0),
surv AS (
  SELECT sh.* FROM sh JOIN (SELECT doc_id FROM b3 WHERE dedup_keep) s USING (doc_id)
),
totals AS (SELECT doc_id, count(*) AS n_grams FROM surv GROUP BY doc_id),
hits AS (
  SELECT surv.doc_id, count(*) AS n_hits
  FROM surv JOIN bench USING (shingle) GROUP BY surv.doc_id
),
flagged AS (
  SELECT t.doc_id FROM totals t JOIN hits h USING (doc_id)
  WHERE h.n_hits / t.n_grams >= {_CONTAM_FLAG}
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN qual_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN nonbench THEN 1 ELSE 0 END) AS BIGINT) AS n_nonbench,
       CAST(sum(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(sum(CASE WHEN dedup_keep AND f.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM b3 LEFT JOIN flagged f USING (doc_id)
"""


CORPUS_PREP_FUNNEL_SQL = _funnel_sql()

QUERIES["corpus_prep_funnel"] = corpus_prep_funnel
ORACLES["corpus_prep_funnel"] = CORPUS_PREP_FUNNEL_SQL

QUERIES["contamination_bloom"] = contamination_bloom
ORACLES["contamination_bloom"] = _bloom_sql()


# ---------------------------------------------------------------------------
# Corpus-frequency boilerplate removal (round 5)
# ---------------------------------------------------------------------------

# boilerplate cut: a bigram is boilerplate when it appears in at least
# n_docs/25 distinct documents (min 3) — derived from the corpus size with
# exact integer arithmetic so both engines and both scale factors agree
# (20 at the 500-doc fixture, 200 at sf0.1's 5000).
_BOILER_DIV, _BOILER_MIN = 25, 3


def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet / RefinedWeb
    "shared-line" cleaning stage, at bigram granularity): any token
    bigram occurring in ≥ ``n_docs/25`` distinct documents is boilerplate;
    every token covered by a boilerplate bigram occurrence is dropped and
    the document re-assembled from the survivors in position order.

    Unlike the dedup family (which decides keep/drop per DOCUMENT), this
    is a corpus-statistics-driven TRANSFORM of each document's payload —
    the navigation-chrome/cookie-banner cleanup pass that runs before
    dedup in web-corpus pipelines.

    Scale shape (r12 rework, VERDICT r11 task 3): one aggregation over
    exploded bigrams builds the document-frequency table (map-side
    combine; key cardinality is the bigram vocabulary, far below the
    corpus size); the boilerplate set (frequency ≥ cut) is small by
    construction and BROADCASTS back against the bigram stream. Only
    the MATCHED occurrences' (doc_id, position) pairs then shuffle —
    once, into a per-doc covered-position set — and each document is
    re-assembled by a higher-order ``filter`` over its (never-exploded,
    never-shuffled) token array. The pre-r12 plan anti-joined EVERY
    token row against the covered set and re-assembled with a
    collect_list regroup — two corpus-sized token shuffles this plan
    does not have (measured ~2x at sf1: 17.5 s -> 8.9 s median at equal
    calib, r12). Reference
    analog: none (the reference never rewrites payloads conditionally);
    closest is the keep/drop block predicate (``czi_to_zarr.py:300-316``)
    applied at token rather than block granularity."""
    n_docs = table_count(spark, sf_dir, "documents")
    cut = max(_BOILER_MIN, n_docs // _BOILER_DIV)
    docs = persist_tracked(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            # NULL text behaves as empty (one '' token) on BOTH engines:
            # without the coalesce, split(NULL) -> NULL makes size()
            # return -1 and array_join return NULL (code-review r12 —
            # latent, fixtures carry no NULL text, but the contract is
            # part of the operator)
            F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("t"),
        )
    )
    grams = persist_tracked(
        docs.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "struct(i AS gpos, concat(element_at(t, i), ' ', "
                    "element_at(t, i + 1)) AS gram))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.gpos").alias("gpos"), F.col("g.gram").alias("gram"))
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= cut)
        .select("gram")
    )
    # per-doc covered positions (1-based): ONLY matched occurrences
    # enter this shuffle — the token stream itself never does
    covered = (
        grams.join(F.broadcast(boiler), "gram")
        .select(
            "doc_id",
            F.explode(F.array(F.col("gpos"), F.col("gpos") + 1)).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("cov"))
    )
    kept = F.filter(
        F.col("t"),
        lambda tok, i: ~F.array_contains(
            F.coalesce(F.col("cov"), F.array().cast("array<int>")),
            (i + 1).cast("int"),
        ),
    )
    return docs.join(covered, "doc_id", "left").select(
        "doc_id",
        F.size("t").alias("n_before"),
        F.size(kept).cast("long").alias("n_after"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


BOILERPLATE_STRIP_SQL = f"""
WITH pd AS (
  SELECT greatest({_BOILER_MIN}, count(*) // {_BOILER_DIV}) AS cut FROM documents
),
docs AS MATERIALIZED (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents
),
toks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS p, t[i] AS tok
  FROM docs, unnest(range(1, len(t) + 1)) u(i)
),
grams AS MATERIALIZED (
  SELECT doc_id, CAST(i AS INTEGER) AS gpos, t[i] || ' ' || t[i + 1] AS gram
  FROM docs, unnest(range(1, len(t))) u(i)
  WHERE len(t) >= 2
),
boiler AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM grams GROUP BY gram
  ) WHERE df >= (SELECT cut FROM pd)
),
covered AS (
  SELECT DISTINCT g.doc_id, CAST(v.p AS INTEGER) AS p
  FROM grams g JOIN boiler b USING (gram), unnest([g.gpos, g.gpos + 1]) v(p)
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
),
cleaned AS (
  SELECT doc_id, count(*) AS n_after,
         string_agg(tok, ' ' ORDER BY p) AS cleaned_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.t) AS INTEGER) AS n_before,
       coalesce(c.n_after, 0)    AS n_after,
       coalesce(c.cleaned_text, '') AS cleaned_text
FROM docs d LEFT JOIN cleaned c USING (doc_id)
"""

QUERIES["boilerplate_strip"] = boilerplate_strip
ORACLES["boilerplate_strip"] = BOILERPLATE_STRIP_SQL


# ---------------------------------------------------------------------------
# BPE tokenizer training kernel: merge-candidate ranking
# ---------------------------------------------------------------------------


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner kernel of BPE tokenizer training (Sennrich et al. 2016)
    run corpus-wide: frequency of every adjacent symbol pair at the
    character stage — the statistic whose argmax becomes the first merge
    rule. Top-20 pairs with a fully deterministic ordering
    (count desc, pair asc).

    Training loops this kernel: apply the chosen merge (broadcast the
    merge table, remap symbols), recount, pick the next pair. Each
    iteration is one explode + one hash aggregate over the corpus — at
    100 TB the word-frequency pre-aggregate below is the critical step,
    shrinking the explode input from total tokens to DISTINCT words
    (orders of magnitude at web scale), which is exactly how production
    BPE trainers (HuggingFace tokenizers, SentencePiece) stay tractable.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
    )
    pairs = (
        words.select(
            "w",
            "wn",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            F.expr("substring(w, i, 1)").alias("a"),
            F.expr("substring(w, i + 1, 1)").alias("b"),
            "wn",
        )
        .groupBy("a", "b")
        .agg(F.sum("wn").alias("n_pairs"))
    )
    return pairs.orderBy(F.desc("n_pairs"), "a", "b").limit(20)


BPE_MERGE_CANDIDATES_SQL = """
WITH words AS (
  SELECT w, count(*) AS wn
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY w
),
pos AS (
  SELECT w, wn, unnest(range(1, length(w))) AS i FROM words
),
pairs AS (
  SELECT substr(w, CAST(i AS INT), 1) AS a,
         substr(w, CAST(i AS INT) + 1, 1) AS b,
         CAST(sum(wn) AS BIGINT) AS n_pairs
  FROM pos
  GROUP BY 1, 2
)
SELECT a, b, n_pairs FROM pairs
ORDER BY n_pairs DESC, a, b
LIMIT 20
"""

QUERIES["bpe_merge_candidates"] = bpe_merge_candidates
ORACLES["bpe_merge_candidates"] = BPE_MERGE_CANDIDATES_SQL


# ---------------------------------------------------------------------------
# Deterministic per-epoch training shuffle
# ---------------------------------------------------------------------------

_EPOCHS = 3
_EPOCH_HEAD = 5  # rows surfaced per epoch (the checkable prefix)


def mix_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch dataloader shuffle: each training epoch
    orders the corpus by ``md5(epoch || doc_id)`` — a different but
    REPRODUCIBLE permutation per epoch, with no ``rand()`` anywhere (the
    repo-wide sampling rule: restarts and stragglers must see the same
    order). Emits each epoch's first ``_EPOCH_HEAD`` samples plus a
    whole-permutation checksum so the oracle pins the entire order, not
    just the head.

    Scale: the per-epoch sort is a ``repartitionByRange`` on the hash
    key — the standard distributed shuffle a 100 TB dataloader feeds
    from; nothing here is driver-side. The checksum (sum of
    hash-prefix × rank over ALL rows) is order-sensitive, so two
    engines agreeing on it proves the full permutation matches.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("epoch"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hkey"),
    )
    w = Window.partitionBy("epoch").orderBy("hkey", "doc_id")
    ranked = keyed.withColumn("rank", F.row_number().over(w))
    head = ranked.filter(F.col("rank") <= _EPOCH_HEAD).select(
        "epoch", "rank", "doc_id"
    )
    checksum = ranked.groupBy("epoch").agg(
        F.sum(
            (F.col("hkey") % 1_000_003) * F.col("rank").cast("decimal(38,0)")
        ).cast("decimal(38,0)").cast("string").alias("perm_checksum")
    )
    return head.join(checksum, "epoch").select(
        "epoch", "rank", "doc_id", "perm_checksum"
    )


def _epoch_shuffle_sql() -> str:
    return f"""
WITH epochs AS (SELECT unnest(range({_EPOCHS})) AS epoch),
keyed AS (
  SELECT e.epoch, d.doc_id,
         CAST(concat('0x', substr(md5(concat_ws('|', e.epoch, d.doc_id)), 1, 8)) AS BIGINT) AS hkey
  FROM documents d CROSS JOIN epochs e
),
ranked AS (
  SELECT epoch, doc_id, hkey,
         row_number() OVER (PARTITION BY epoch ORDER BY hkey, doc_id) AS rank
  FROM keyed
),
checksum AS (
  SELECT epoch,
         CAST(sum(CAST(hkey % 1000003 AS HUGEINT) * rank) AS VARCHAR) AS perm_checksum
  FROM ranked GROUP BY 1
)
SELECT r.epoch, r.rank, r.doc_id, c.perm_checksum
FROM ranked r JOIN checksum c ON r.epoch = c.epoch
WHERE r.rank <= {_EPOCH_HEAD}
"""


QUERIES["mix_epoch_shuffle"] = mix_epoch_shuffle
ORACLES["mix_epoch_shuffle"] = _epoch_shuffle_sql()


# ---------------------------------------------------------------------------
# temperature-scaled mixing weights (multilingual / multi-domain sampling)
# ---------------------------------------------------------------------------

_MIX_TEMP_BUDGET = 10_000_000  # tokens in the resampled corpus


def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling weights — the multilingual /
    multi-domain rebalancing rule (mBERT/XLM-R's exponent-smoothed
    sampling, τ = 0.5): source s is drawn with probability
    ``n_s^τ / Σ n_j^τ``, flattening the head domains and boosting the
    tail relative to proportional sampling, without ever inverting the
    order.

    Float discipline: τ = 0.5 means ``n^τ = sqrt(n)``, and IEEE-754
    requires sqrt to be CORRECTLY ROUNDED — the one transcendental-ish
    kernel both engines compute bit-identically (unlike ``ln``/``pow``,
    which differ in the last ulp between libm and the JVM; see
    ``text_tfidf_topk``).  Each sqrt is then pinned to DECIMAL(30,10)
    (the ``dround`` cast, deterministic in both engines), the sum runs
    in exact decimal arithmetic — immune to summation order — and the
    share is ONE double division of the two pinned values.

    Scale shape: one per-source aggregate (map-side combine, k rows) →
    a k-row total broadcast back over the k-row frame.  The share table
    is the input to a mixer like ``mix_token_budget``; the token budget
    column shows the materialized allocation (floor, exact).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split(F.col("text"), " ")).cast("long").alias("toks")
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
    )
    # two consumers (the share rows and the total) — persist the k-row
    # aggregate so the corpus scan runs ONCE, not once per branch
    w = persist_tracked(
        per_src.withColumn(
            "w", F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(30,10)")
        )
    )
    tot = w.agg(F.sum("w").cast("decimal(30,10)").alias("w_total"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            dround(
                F.col("w").cast("double") / F.col("w_total").cast("double"), 6
            ).alias("share"),
            F.floor(
                (
                    F.col("w").cast("double") / F.col("w_total").cast("double")
                ) * F.lit(float(_MIX_TEMP_BUDGET))
            ).cast("long")
            .alias("token_budget"),
        )
    )


MIX_TEMPERATURE_SQL = f"""
WITH per_src AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,10)) AS w
  FROM per_src
),
tot AS (SELECT CAST(sum(w) AS DECIMAL(30,10)) AS w_total FROM w)
SELECT
  source,
  n_docs,
  n_tokens,
  {sql_round('CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE)', 6)} AS share,
  CAST(floor((CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE)) * {float(_MIX_TEMP_BUDGET)}) AS BIGINT) AS token_budget
FROM w, tot
"""

QUERIES["mix_temperature_weights"] = mix_temperature_weights
ORACLES["mix_temperature_weights"] = MIX_TEMPERATURE_SQL


# ---------------------------------------------------------------------------
# BPE tokenizer training loop: learn R merges (count -> argmax -> apply)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_learn_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE training LOOP (Sennrich et al. 2016), not just its
    first statistic (:func:`bpe_merge_candidates`): ``_BPE_ROUNDS``
    rounds of count-pairs → pick the argmax pair → APPLY the merge to
    every word's symbol sequence → recount. Returns the learned merge
    table (rank, left_sym, right_sym, n_pairs) — rounds 2 and 3 are
    only correct if round 1's merge was applied with exactly the right
    semantics, so the oracle match proves the application step, the
    hard part.

    Merge application is greedy left-to-right non-overlapping (the BPE
    contract: ``aaaa`` + merge ``a+a`` → ``aa aa``, ``aaa`` → ``aa a``),
    expressed as a single per-word array FOLD (:func:`_apply_merge` —
    map-only after the one-row merge broadcast; the ORACLE keeps the
    relational gaps-and-islands formulation, so the differential check
    is a cross-formulation proof of the greedy semantics). No UDF
    anywhere; ties in the argmax break (count desc, left asc, right
    asc) via ``min(struct(-cnt, a, b))`` — a single-row global
    aggregate that is BROADCAST back, never collected to the driver.

    Scale shape: every stage runs on the DISTINCT-word frequency table
    (vocabulary-sized, orders of magnitude below corpus tokens — the
    same pre-aggregate that makes production BPE trainers tractable).
    At 100 TB the word string key becomes an xxhash64 id (the
    ``dedup_minhash_fast`` trick) and each round is ONE pair-count
    aggregate — the fold application adds no exchange at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = persist_tracked(
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .select(
            "w",
            "wn",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("s"),
        )
    )
    words.count()

    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            words.select(
                "wn",
                F.explode(
                    # guard: sequence(1, 0) would DESCEND ([1, 0]) for
                    # single-symbol words (possible after a merge)
                    F.expr(
                        "CASE WHEN size(s) < 2 THEN array() ELSE "
                        "transform(sequence(1, size(s) - 1), i -> "
                        "struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"
                        " END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wn").alias("cnt"))
        )
        merge = persist_tracked(
            pairs.agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("a"), F.col("b")
                    )
                ).alias("m")
            ).select(
                F.col("m.a").alias("a"),
                F.col("m.b").alias("b"),
                (-F.col("m.nc")).alias("cnt"),
            )
        )  # cached on first consuming action (no eager count: one fewer
        #    scheduler round-trip per merge round)
        merges.append(
            merge.select(
                F.lit(r).alias("rank"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.col("cnt").alias("n_pairs"),
            )
        )
        if r == _BPE_ROUNDS:
            break
        words = persist_tracked(_apply_merge(words, merge))

    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def _apply_merge(words: DataFrame, merge: DataFrame) -> DataFrame:
    """Greedy left-to-right non-overlapping application of ONE (a, b)
    merge to every word's (w, wn, s) symbol sequence — the loop body of
    :func:`bpe_learn_merges`, shared verbatim with the corpus tokenizer
    (train and apply MUST agree on merge semantics or the tokenizer
    drifts from its own vocabulary).

    Expressed as a single array FOLD per word (``aggregate`` carrying a
    (out, skip) state): emit the merged symbol and skip the next
    position on a match, else emit the symbol — the literal statement
    of the BPE greedy contract (``aaaa`` + merge ``a+a`` → ``aa aa``,
    ``aaa`` → ``aa a``; pinned by ``tests/test_bpe_learn.py``).  This
    is a MAP-ONLY projection after the one-row (a, b) broadcast: the
    round-6 relational form (explode → two vocabulary windows →
    anti/left joins → reassembly aggregate) shuffled the vocabulary
    four times per round for the same result; now the only per-round
    shuffle left in the BPE loop is the pair-count aggregate itself.
    The ORACLE keeps the relational gaps-and-islands formulation — the
    differential check is therefore also a cross-formulation proof of
    the greedy semantics.

    ``try_element_at`` on the lookahead: ANSI ``AND`` does not
    short-circuit, so the ``i = size(s)`` row would error on plain
    ``element_at``."""
    wm = words.crossJoin(F.broadcast(merge.select("a", "b")))
    fold = F.expr(
        """
        aggregate(
          sequence(1, size(s)),
          named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false),
          (st, i) -> CASE
            WHEN st.skip
              THEN named_struct('out', st.out, 'skip', false)
            WHEN i < size(s) AND element_at(s, i) = a
                 AND try_element_at(s, i + 1) = b
              THEN named_struct('out', array_append(st.out, concat(a, b)),
                                'skip', true)
            ELSE named_struct('out', array_append(st.out, element_at(s, i)),
                              'skip', false)
          END,
          st -> st.out)
        """
    )
    return wm.select("w", "wn", fold.alias("s"))


def _bpe_chain_sql(apply_last: bool) -> str:
    """The learn-chain WITH body shared by the trainer oracle (merges
    1..R, last one NOT applied — its effect is unobservable in the merge
    table) and the tokenizer oracle (all R merges applied so ``words{R}``
    is the fully tokenized vocabulary)."""
    sql = """
WITH words0 AS MATERIALIZED (
  SELECT w, count(*) AS wn,
         list_transform(range(1, length(w) + 1),
                        i -> substr(w, CAST(i AS INT), 1)) AS s
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY w
)"""
    for r in range(1, _BPE_ROUNDS + 1):
        prev = f"words{r - 1}"
        sql += f""",
pairs{r} AS (
  SELECT s[CAST(u.i AS INT)] AS a, s[CAST(u.i AS INT) + 1] AS b,
         sum(wn) AS cnt
  FROM {prev}, unnest(range(1, len(s))) u(i)
  GROUP BY 1, 2
),
merge{r} AS MATERIALIZED (
  SELECT a, b, cnt FROM pairs{r} ORDER BY cnt DESC, a, b LIMIT 1
)"""
        if r == _BPE_ROUNDS and not apply_last:
            break
        sql += f""",
rows{r} AS MATERIALIZED (
  SELECT w, wn, CAST(u.i AS INT) AS i, s[CAST(u.i AS INT)] AS sym,
         CASE WHEN u.i < len(s)
                   AND s[CAST(u.i AS INT)] = m.a
                   AND s[CAST(u.i AS INT) + 1] = m.b
              THEN 1 ELSE 0 END AS mt
  FROM {prev}, merge{r} m, unnest(range(1, len(s) + 1)) u(i)
),
sel{r} AS MATERIALIZED (
  SELECT w, i FROM (
    SELECT w, i, row_number() OVER (PARTITION BY w, g ORDER BY i) AS rn
    FROM (
      SELECT w, i, i - row_number() OVER (PARTITION BY w ORDER BY i) AS g
      FROM rows{r} WHERE mt = 1
    )
  ) WHERE rn % 2 = 1
),
words{r} AS MATERIALIZED (
  SELECT k.w, any_value(k.wn) AS wn,
         list(CASE WHEN s.i IS NOT NULL THEN m.a || m.b ELSE k.sym END
              ORDER BY k.i) AS s
  FROM (
    SELECT r.w, r.wn, r.i, r.sym
    FROM rows{r} r
    ANTI JOIN (SELECT w, i + 1 AS i FROM sel{r}) d
      ON r.w = d.w AND r.i = d.i
  ) k
  LEFT JOIN sel{r} s ON k.w = s.w AND k.i = s.i
  CROSS JOIN merge{r} m
  GROUP BY k.w
)"""
    return sql


def _bpe_learn_sql() -> str:
    parts = [
        f"SELECT {r} AS rank, a AS left_sym, b AS right_sym, "
        f"CAST(cnt AS BIGINT) AS n_pairs "
        f"FROM merge{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    ]
    return _bpe_chain_sql(apply_last=False) + "\n" + "\nUNION ALL\n".join(parts)


BPE_LEARN_SQL = _bpe_learn_sql()

# registration for bpe_learn_merges lives next to the tokenizer's (the
# cached wrapper is defined there, after the shared merge cache)


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429)
# ---------------------------------------------------------------------------

_DOREMI_SCALE = 1_000_000  # fixed-point 1e6 for weights and shares
_DOREMI_ETA_Q = 200_000  # multiplicative-weights step η = 0.2
_DOREMI_ROUNDS = 3


def mix_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture weights by multiplicative-weights ascent on excess
    difficulty — the DoReMi recipe's deterministic skeleton: domains whose
    data is "harder" than the easiest domain get their sampling weight
    multiplied up each round, then the mixture renormalizes.

    The difficulty proxy is the mean integer token rarity
    ``N_total DIV ctf`` (the exact-arithmetic stand-in for per-domain
    reference loss; a real run would plug per-domain proxy-model losses
    into the same update). The update is pure fixed-point:
    ``w_t = w_{t-1} * (S + η_q * excess_norm) DIV S`` with per-round
    floor — genuinely iterative (flooring makes the compounding
    non-closed-form) and bit-identical across engines.

    Scale shape: ONE heavy stage — the token-stream explode collapses
    immediately to a (source, word) count frame (``inst``, vocabulary-
    sized), and the corpus frequency, total, and rarity join all derive
    from it: corpus text is read and exploded exactly once (the r7 form
    referenced the explode three times — ctf, total, rarity join — and
    the census showed no exchange reuse). The k-row domain frame is
    localCheckpoint-ed so the 3 multiplicative-weights rounds and the
    renormalization plan against a materialized constant-size RDD. At
    100 TB the iteration cost is independent of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    # one corpus pass; two consumers (ctf build, rarity join)
    inst = persist_tracked(
        docs.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n_sw"))
    )
    ctf = inst.groupBy("w").agg(F.sum("n_sw").alias("ctf"))
    # total tokens = sum of corpus term frequencies (exact, no re-scan)
    n_tot = ctf.agg(F.sum("ctf").alias("n_tot"))
    # sum over instances of (n_tot DIV ctf) == sum over (source, word)
    # groups of n_sw * (n_tot DIV ctf): identical integer arithmetic,
    # one vocabulary-sized join instead of a token-stream join
    diffs = (
        inst.join(ctf, "w")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("source")
        .agg(
            F.sum("n_sw").alias("n_tokens"),
            F.expr("sum(n_sw * (n_tot DIV ctf))").alias("sum_rarity"),
        )
        .select(
            "source",
            "n_tokens",
            F.expr("sum_rarity DIV n_tokens").alias("difficulty"),
        )
    ).localCheckpoint()
    lo_hi = diffs.agg(
        F.min("difficulty").alias("lo"), F.max("difficulty").alias("hi")
    )
    S, ETA = _DOREMI_SCALE, _DOREMI_ETA_Q
    cur = diffs.crossJoin(F.broadcast(lo_hi)).select(
        "source",
        "n_tokens",
        "difficulty",
        F.expr(
            f"CASE WHEN hi = lo THEN CAST(0 AS BIGINT) "
            f"ELSE (difficulty - lo) * CAST({S} AS BIGINT) DIV (hi - lo) END"
        ).alias("excess_norm"),
        F.lit(S).cast("long").alias("wgt"),
    )
    for _ in range(_DOREMI_ROUNDS):
        cur = cur.withColumn(
            "wgt", F.expr(f"wgt * (CAST({S} AS BIGINT) + {ETA} * excess_norm DIV {S}) DIV {S}")
        )
    tot = cur.agg(F.sum("wgt").alias("wgt_total"))
    return (
        cur.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            "difficulty",
            F.col("wgt").alias("weight_q"),
            F.expr(
                f"CAST(wgt * CAST({S} AS BIGINT) DIV wgt_total AS DOUBLE) / {S}.0"
            ).alias("share"),
        )
    )


def _doremi_sql() -> str:
    S, ETA, R = _DOREMI_SCALE, _DOREMI_ETA_Q, _DOREMI_ROUNDS
    rounds = []
    prev = "w0"
    for t in range(1, R + 1):
        rounds.append(
            f"w{t} AS (SELECT source, n_tokens, difficulty, excess_norm, "
            f"wgt * (CAST({S} AS BIGINT) + {ETA} * excess_norm // {S}) // {S} AS wgt "
            f"FROM {prev})"
        )
        prev = f"w{t}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
ctf AS (SELECT w, count(*) AS ctf FROM toks GROUP BY w),
n AS (SELECT count(*) AS n_tot FROM toks),
diffs AS (
  SELECT source, count(*) AS n_tokens,
         CAST(sum(n_tot // ctf) // count(*) AS BIGINT) AS difficulty
  FROM toks JOIN ctf USING (w) CROSS JOIN n
  GROUP BY source
),
lo_hi AS (SELECT min(difficulty) AS lo, max(difficulty) AS hi FROM diffs),
w0 AS (
  SELECT source, n_tokens, difficulty,
         CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
              ELSE (difficulty - lo) * CAST({S} AS BIGINT) // (hi - lo) END
           AS excess_norm,
         CAST({S} AS BIGINT) AS wgt
  FROM diffs CROSS JOIN lo_hi
),
{rounds_sql},
tot AS (SELECT sum(wgt) AS wgt_total FROM {prev})
SELECT source, n_tokens, difficulty, CAST(wgt AS BIGINT) AS weight_q,
       CAST(wgt * CAST({S} AS BIGINT) // wgt_total AS DOUBLE) / {S}.0 AS share
FROM {prev} CROSS JOIN tot
"""


MIX_DOREMI_SQL = _doremi_sql()

QUERIES["mix_doremi_weights"] = mix_doremi_weights
ORACLES["mix_doremi_weights"] = MIX_DOREMI_SQL


# ---------------------------------------------------------------------------
# BPE tokenizer APPLY at corpus scale (round 6)
# ---------------------------------------------------------------------------

#: session-learned merge table values — (rank, left, right), tiny by
#: definition (a merge table, not data); same cache shape as the IVF/PQ
#: codebooks: train once per (session, sf_dir), every consumer reuses
_BPE_MERGES_CACHE: dict[tuple[str, str], list] = {}


def _learned_merges(spark: SparkSession, sf_dir: str) -> list:
    """(rank, left, right, n_pairs) rows of the session's trained merge
    table, running the real training loop on first use."""
    key = (spark.sparkContext.applicationId, sf_dir)
    rows = _BPE_MERGES_CACHE.get(key)
    if rows is None:
        rows = sorted(
            (r["rank"], r["left_sym"], r["right_sym"], r["n_pairs"])
            for r in _bpe_learn_loop(spark, sf_dir).collect()
        )
        _BPE_MERGES_CACHE[key] = rows
    return rows


def bpe_learn_merges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for the trainer: the REAL loop on the session's
    first call (via :func:`_learned_merges`), the cached merge-table
    VALUES rebuilt as a local relation afterwards — the codebook-cache
    precedent (`ivf_kmeans_ann`): train once, every later consumer reads
    the trained artifact bit-identically."""
    return spark.createDataFrame(
        _learned_merges(spark, sf_dir),
        "rank int, left_sym string, right_sym string, n_pairs bigint",
    )


def bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's APPLY stage at corpus scale — the production
    counterpart of :func:`bpe_learn_merges`' training loop: take the
    session-learned merge table (trained once, cached like the IVF/PQ
    codebooks) and tokenize EVERY word, reporting per-source token
    economics (words, BPE tokens, chars, chars-per-token) — the numbers
    a data-mixture owner actually reads off a tokenized corpus.

    Application runs on the DISTINCT-word vocabulary through the SAME
    :func:`_apply_merge` kernel the trainer used (train/apply agreement
    by construction), then joins token counts back to the per-(source,
    word) instance table — the standard "tokenize the vocabulary, not
    the corpus" factorization: corpus-scale work is ONE distinct
    aggregate and ONE multiply-join, the merge loop runs on vocabulary
    rows. Single-char words are single tokens by definition (the
    trainer's ≥2 filter excludes them from PAIR statistics, which they
    cannot affect).

    The oracle re-derives the merges by unrolling the training rounds
    as CTEs and applies the final round too (``_bpe_chain_sql(True)``)
    — a differential test of the whole train→apply chain."""
    merges = _learned_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    # three consumers (vocabulary, single-char union, final multiply-
    # join) — without the persist the corpus explode+aggregate ran once
    # per consumer (census: 25 exchanges, reused 0)
    inst = persist_tracked(
        docs.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n_inst"))
    )
    vocab = (
        inst.groupBy("w")
        .agg(F.sum("n_inst").alias("wn"))
        .filter(F.length("w") >= 2)
        .select(
            "w",
            "wn",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("s"),
        )
    )
    # the merge rounds are MAP-ONLY folds (one 1-row broadcast each,
    # each round referenced exactly once): leave them LAZY so whole-
    # stage codegen pipelines all rounds into a single stage — r8
    # measured eager localCheckpoint per round 0.55 s slower (vocab
    # char-array serialization ×3) and per-round persist a wasted cache
    # fill (nothing ever reads a middle round twice)
    for _rank, a, b, _n_pairs in merges:
        vocab = _apply_merge(
            vocab, spark.createDataFrame([(a, b)], "a string, b string")
        )
    tok = vocab.select("w", F.size("s").cast("long").alias("n_tok")).unionByName(
        inst.select("w").filter(F.length("w") == 1).distinct().select(
            "w", F.lit(1).cast("long").alias("n_tok")
        )
    )
    return (
        inst.join(tok, "w")
        .groupBy("source")
        .agg(
            F.sum("n_inst").alias("n_words"),
            F.sum(F.col("n_inst") * F.col("n_tok")).alias("n_tokens"),
            F.sum(F.col("n_inst") * F.length("w")).alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            "n_chars",
            dround(F.col("n_chars") / F.col("n_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
    )


def _bpe_tokenize_sql() -> str:
    last = f"words{_BPE_ROUNDS}"
    return (
        _bpe_chain_sql(apply_last=True)
        + f""",
toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
inst AS (SELECT source, w, count(*) AS n_inst FROM toks GROUP BY 1, 2),
tok AS (
  SELECT w, CAST(len(s) AS BIGINT) AS n_tok FROM {last}
  UNION ALL
  SELECT DISTINCT w, CAST(1 AS BIGINT) AS n_tok FROM inst WHERE length(w) = 1
)
SELECT source,
       CAST(sum(n_inst) AS BIGINT) AS n_words,
       CAST(sum(n_inst * n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_inst * length(w)) AS BIGINT) AS n_chars,
       CAST(round(CAST(sum(n_inst * length(w)) / sum(n_inst * n_tok)
                       AS DECIMAL(30,10)), 6) AS DOUBLE) AS chars_per_token
FROM inst JOIN tok USING (w)
GROUP BY source
"""
    )


BPE_TOKENIZE_SQL = _bpe_tokenize_sql()

QUERIES["bpe_learn_merges"] = bpe_learn_merges_cached
ORACLES["bpe_learn_merges"] = BPE_LEARN_SQL

QUERIES["bpe_tokenize_corpus"] = bpe_tokenize_corpus
ORACLES["bpe_tokenize_corpus"] = BPE_TOKENIZE_SQL


# ---------------------------------------------------------------------------
# Priority sampling — deterministic weighted sampling without
# replacement, with an unbiased subset-sum estimator (round 7)
# ---------------------------------------------------------------------------

_PRI_N = 50
_PRI_SPACE = 16 ** 15  # md5-prefix hash space (dedup's 60-bit convention)


def mix_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted document sampling by priority sampling (Duffield,
    Lund & Thorup 2007): priority ``p_i = w_i / u_i`` with ``u_i``
    uniform on (0,1], keep the top-n priorities, and estimate any
    subset's total weight unbiasedly as ``Σ max(w_i, τ)`` over sampled
    members, where τ is the (n+1)-th priority.  This is the standard
    one-pass scheme for building a small weighted subsample of a corpus
    (here: weight = n_chars, a token-count proxy) whose aggregate
    statistics remain estimable — the data-mixing companion to
    `mix_stratified_sample`'s uniform strata.

    Determinism and parity: ``u_i`` is the md5-prefix fraction of the
    doc id mapped to (0,1] (never 0 — division is safe), so priorities
    are pure IEEE divisions that hash-compare across engines — no RNG,
    reproducible resamples (the property production selection pipelines
    need for lineage).  Ties break on doc_id.

    Scale: one map-only projection computes priorities; the top-(n+1)
    cut is a ``TakeOrderedAndProject`` (no full sort, no collect); τ
    joins back as a one-row broadcast.  At 100 TB nothing about the
    shape changes — the sample is O(n) rows end to end."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("w")
    )
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .cast("double")
            + F.lit(1.0)
        )
        / F.lit(float(_PRI_SPACE))
    )
    pri = docs.select("doc_id", "source", "w", (F.col("w") / u).alias("priority"))
    top = pri.orderBy(F.desc("priority"), F.asc("doc_id")).limit(_PRI_N + 1)
    # τ = the (n+1)-th priority; when the corpus has ≤ n docs the whole
    # population is sampled and τ = 0 (est_w degenerates to w, exact)
    w_rank = Window.orderBy(F.desc("priority"), F.asc("doc_id"))
    ranked = top.withColumn("rn", F.row_number().over(w_rank))
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _PRI_N + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    return (
        ranked.filter(F.col("rn") <= _PRI_N)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id",
            "source",
            F.col("w").cast("long").alias("n_chars"),
            dround("priority", 6).alias("priority"),
            dround(F.greatest(F.col("w"), F.col("tau")), 6).alias("est_w"),
        )
    )


def _priority_sample_sql() -> str:
    from .dedup import _sql_md5_prefix_int

    u = (
        f"((CAST({_sql_md5_prefix_int('CAST(doc_id AS VARCHAR)')} AS DOUBLE)"
        f" + 1.0) / CAST({_PRI_SPACE} AS DOUBLE))"
    )
    return f"""
WITH pri AS (
  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
         CAST(n_chars AS DOUBLE) / {u} AS priority
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
  FROM pri
),
tau AS (
  SELECT coalesce(max(CASE WHEN rn = {_PRI_N + 1} THEN priority END), 0.0)
           AS tau
  FROM ranked WHERE rn <= {_PRI_N + 1}
)
SELECT doc_id, source,
       CAST(w AS BIGINT) AS n_chars,
       {sql_round('priority', 6)} AS priority,
       {sql_round('greatest(w, tau)', 6)} AS est_w
FROM ranked CROSS JOIN tau
WHERE rn <= {_PRI_N}
"""


QUERIES["mix_priority_sample"] = mix_priority_sample
ORACLES["mix_priority_sample"] = _priority_sample_sql()
