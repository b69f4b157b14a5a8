"""The bench reporting channel is part of the driver contract (the
driver tail-captures ~2000 bytes of stdout and parses the LAST line as
JSON; round 2 shipped an unparseable line once). These tests pin the
pure parts of ``bench.py``: prior-timing absorption, the accepted-
regressions carve-out, and the final-line size/parse guarantees —
no SparkSession needed.
"""

from __future__ import annotations

import json

import bench


def _detail(n_queries: int = 3) -> dict:
    return {
        "value": 12.3,
        "sf": 0.1,
        "queries": {f"q{i}": 0.5 for i in range(n_queries)},
        "calib_sec": 0.5,
    }


def test_final_line_is_one_parseable_json_line():
    line = bench._final_line(_detail(), {"q1": [0.5, 1.2]}, {}, {})
    assert "\n" not in line
    doc = json.loads(line)
    assert doc["metric"] == "total_query_wall_seconds"
    assert doc["n_queries"] == 3
    assert doc["regressions"] == {"q1": [0.5, 1.2]}


def test_final_line_carries_per_query_timings():
    """VERDICT r13 task 2: the driver reads per-query timings from the
    final line (PERF_r13.per_query came back empty without them). The
    full registry-sized map must survive every trim path."""
    n = 240  # more than the current registry
    detail = {
        "value": 120.0,
        "sf": 0.1,
        "queries": {f"some_longish_query_name_{i:03d}": 0.527 for i in range(n)},
        "calib_sec": 0.4,
        "module_subtotals": {f"mod{i}": 1.0 for i in range(16)},
    }
    huge = {f"query_with_a_long_name_{i:04d}": [1.0, 2.0 + i] for i in range(200)}
    line = bench._final_line(detail, huge, {}, {})
    assert len(line) <= bench._MAX_LINE_BYTES
    doc = json.loads(line)
    assert len(doc["queries"]) == n
    assert doc["queries"]["some_longish_query_name_000"] == 0.527


def test_final_line_truncates_oversized_regression_maps():
    # 600 entries (~25 KB) exceeds the few-KB cap even though the cap
    # now budgets for the full per-query timings map
    huge = {f"query_with_a_long_name_{i:04d}": [1.0, 2.0 + i] for i in range(600)}
    line = bench._final_line(_detail(), huge, {}, {})
    assert len(line) <= bench._MAX_LINE_BYTES
    doc = json.loads(line)
    assert len(doc["regressions"]) == 8
    assert doc["regressions_truncated"] == 592
    # worst slowdown ratios survive the trim
    assert "query_with_a_long_name_0599" in doc["regressions"]


def test_final_line_carries_pipeline_sidecars():
    doc = json.loads(
        bench._final_line(
            _detail(), {}, {"sec": 20.0, "mib_per_s": 100.0}, {"mib_per_s": 75.0}
        )
    )
    assert doc["pipe_e2e_convert_sec"] == 20.0
    assert doc["pipe_czi_decode_mib_per_s"] == 75.0


def test_load_prior_keeps_best_timing_at_matching_sf(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q1": 2.0, "q2": 1.0}})
    )
    # driver-wrapped shape: payload under "parsed"
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q1": 1.5}}})
    )
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"sf": 0.1, "queries": {"q1": 1.8, "q3": 4.0}})
        + "\n"
        + json.dumps({"sf": 0.001, "queries": {"q1": 0.01}})  # other sf: ignored
        + "\n"
        + "not json\n"  # tolerated
    )
    prior, prior_calib, calib_ref, bands, pycalib_ref, recent = (
        bench._load_prior(tmp_path, 0.1)
    )
    assert prior == {"q1": 1.5, "q2": 1.0, "q3": 4.0}
    # no recording carried calib_sec -> no per-query calib, no reference
    assert prior_calib == {"q1": None, "q2": None, "q3": None}
    assert calib_ref is None
    assert pycalib_ref is None
    # the band spans every recording at the matching sf, with its count
    assert bands["q1"] == (1.5, 2.0, 3)
    assert bands["q2"] == (1.0, 1.0, 1)


def test_accepted_regressions_reasons_are_nonempty():
    for q, why in bench._ACCEPTED_REGRESSIONS.items():
        assert isinstance(why, str) and len(why) > 20, q


def test_load_prior_rejects_outlier_minimum(tmp_path):
    """One anomalously fast recording must not become the baseline every
    later honest run gets flagged against."""
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.5, "s": 1.0}})
        + "\n"
        + json.dumps({"sf": 0.1, "queries": {"q": 0.2, "s": 0.9}})  # q outlier
        + "\n"
        + json.dumps({"sf": 0.1, "queries": {"q": 1.6, "s": 1.1}})
        + "\n"
    )
    prior, *_ = bench._load_prior(tmp_path, 0.1)
    assert prior["q"] == 1.5  # 0.2 < 2/3 * 1.5 -> second-smallest wins
    assert prior["s"] == 0.9  # 0.9 corroborated by 1.0 -> min kept


def test_in_band_adjudication_rules():
    """The r12 automated band check: in-band flags are noise without a
    re-measure; bands need >= 4 recordings to adjudicate; a 5%
    tolerance absorbs recorded-value rounding."""
    band = (1.0, 2.0, 6)
    assert bench._in_band(1.9, band)
    assert bench._in_band(2.09, band)  # within the 5% tolerance
    assert not bench._in_band(2.2, band)
    assert not bench._in_band(1.9, (1.0, 2.0, 3))  # too little history
    assert not bench._in_band(1.9, None)


def test_pandas_bound_classification():
    assert bench._pandas_bound("multimodal_jpeg_cmyk", "multimodal")
    assert bench._pandas_bound("udaf_user_median", "whatever")
    assert not bench._pandas_bound("q1_pricing_summary", "tpch")


def test_band_max_is_trimmed_against_outliers(tmp_path):
    """code-review r12: one anomalously SLOW recording (host stall, or
    a regressed round later fixed) must not permanently widen the band
    and mask every later occurrence as noise_in_band — with >= 10
    recordings the band max is the p90, not the raw max."""
    rows = [{"sf": 0.1, "queries": {"q": 1.0 + 0.01 * i}} for i in range(11)]
    rows.append({"sf": 0.1, "queries": {"q": 9.0}})  # the one outlier
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    _, _, _, bands, _, _ = bench._load_prior(tmp_path, 0.1)
    lo, hi, n = bands["q"]
    assert n == 12 and lo == 1.0
    assert hi < 9.0  # outlier trimmed out of the band max
    assert not bench._in_band(8.0, bands["q"])


def test_load_prior_collects_pycalib_reference(tmp_path):
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps(
            {"sf": 0.1, "calib_sec": 0.3, "pycalib_sec": 0.8,
             "queries": {"q": 1.0}}
        )
        + "\n"
        + json.dumps(
            {"sf": 0.1, "calib_sec": 0.5, "pycalib_sec": 1.6,
             "queries": {"q": 1.2}}
        )
        + "\n"
    )
    _, _, _, _, pycalib_ref, _ = bench._load_prior(tmp_path, 0.1)
    assert pycalib_ref == 0.8  # low quartile of [0.8, 1.6]


def test_final_line_counts_adjudicated_noise():
    detail = _detail()
    detail["adjudications"] = {
        "a": {"verdict": "noise_in_band"},
        "b": {"verdict": "noise_remeasured"},
        "c": {"verdict": "real_out_of_band"},
    }
    doc = json.loads(bench._final_line(detail, {"c": [1.0, 3.0]}, {}, {}))
    assert doc["adjudicated_noise"] == 2
    assert doc["regressions"] == {"c": [1.0, 3.0]}


def test_recency_band_flags_plateau_excursion(tmp_path):
    """VERDICT r12 task 2 done-criterion: a +40% excursion off a
    stable plateau must be flagged even though the all-history band
    (widened by early slow rounds) still contains it."""
    rows = []
    # early rounds: slow (these keep the all-history band wide forever)
    for i in range(4):
        rows.append(
            {"sf": 0.1, "ts": f"2026-08-0{i+1}T00:00:00",
             "queries": {"q": 12.0 - i}}
        )
    # recent plateau: 4.4-4.7 s over the last 8 runs
    for i in range(8):
        rows.append(
            {"sf": 0.1, "ts": f"2026-08-1{i}T00:00:00",
             "queries": {"q": 4.4 + 0.04 * i}}
        )
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    prior, _, _, bands, _, recent = bench._load_prior(tmp_path, 0.1)
    lo, hi, n = recent["q"]
    assert n == 8 and lo == 4.4
    assert hi < 4.72  # second-largest of the window, not the max
    t = 6.46  # the r12 stream_feed_windowed excursion (+44% vs plateau)
    # all-history band absorbs it ...
    assert bench._in_band(t, bands["q"])
    # ... but the combined gate does not, and the excursion flag fires
    assert not bench._in_both_bands(t, bands["q"], recent["q"])
    assert bench._recent_excursion(t, recent["q"])
    # note: 6.46 < 1.5 * 4.4 so the sticky-prior gate alone missed it
    assert not bench._regressed(t, prior["q"])
    # plateau-level measurements stay unflagged
    assert bench._in_both_bands(4.7, bands["q"], recent["q"])
    assert not bench._recent_excursion(4.7, recent["q"])
    # host scaling relaxes the excursion gate like every other gate
    assert not bench._recent_excursion(6.46, recent["q"], scale=2.0)


def test_recent_excursion_ignores_subsecond_wobble():
    """Sub-second queries wobble 1.5-2x on worker spin-up alone; the
    absolute >0.5s excess guard keeps them out of the excursion flag."""
    recent = (0.2, 0.3, 8)
    assert not bench._recent_excursion(0.55, recent)  # 1.8x but +0.25s
    assert bench._recent_excursion(0.9, recent)  # 3x and +0.6s
    assert not bench._recent_excursion(9.9, (1.0, 8.0, 3))  # n < 4
    assert not bench._recent_excursion(9.9, None)


def test_small_history_band_max_drops_single_outlier(tmp_path):
    """r12 advisor: for 4 <= n < 10 the p90 index degenerates to the
    raw max, so one host-stall outlier among few recordings would
    permanently widen a young band — the second-largest is the max."""
    rows = [{"sf": 0.1, "queries": {"q": 1.0 + 0.1 * i}} for i in range(4)]
    rows.append({"sf": 0.1, "queries": {"q": 7.0}})  # the stall
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    _, _, _, bands, _, _ = bench._load_prior(tmp_path, 0.1)
    lo, hi, n = bands["q"]
    assert n == 5 and lo == 1.0 and hi == 1.3
    assert not bench._in_band(6.8, bands["q"])


def test_same_code_runs_envelope(tmp_path):
    """VERDICT r12 task 7: totals of every full run on the same git
    HEAD at the same sf are surfaced; other-HEAD / other-sf / dirty
    runs stay out."""
    rows = [
        {"sf": 0.1, "git_head": "abc1234", "calib_sec": 0.3,
         "ts": "t1", "queries": {"a": 1.0, "b": 2.0}},
        {"sf": 0.1, "git_head": "abc1234", "calib_sec": 0.4,
         "ts": "t2", "queries": {"a": 1.1, "b": 2.2}},
        {"sf": 0.1, "git_head": "old9999", "ts": "t0",
         "queries": {"a": 9.0}},
        {"sf": 0.001, "git_head": "abc1234", "ts": "t3",
         "queries": {"a": 0.1}},
        {"sf": 0.1, "git_head": "abc1234-dirty", "ts": "t4",
         "queries": {"a": 5.0}},
        {"sf": 0.1, "ts": "t5", "queries": {"a": 3.0}},  # pre-r13: no head
    ]
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    runs = bench._same_code_runs(tmp_path, 0.1, "abc1234")
    assert [r["total"] for r in runs] == [3.0, 3.3]
    assert runs[0]["calib_sec"] == 0.3 and runs[0]["ts"] == "t1"
    assert bench._same_code_runs(tmp_path, 0.1, None) == []


def test_final_line_carries_run_envelope():
    detail = _detail()
    detail["runs"] = [{"total": 205.6}, {"total": 215.9}]
    doc = json.loads(bench._final_line(detail, {}, {}, {}))
    assert doc["runs"] == [205.6, 215.9]
    # a single run is not worth the line bytes
    detail["runs"] = [{"total": 215.9}]
    assert "runs" not in json.loads(bench._final_line(detail, {}, {}, {}))


def test_load_prior_carries_the_baseline_runs_calib(tmp_path):
    """Each sticky prior must remember the host-speed floor of the run
    that set it, and the host normalization must relax the flag gate by
    exactly the capped calib ratio."""
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"sf": 0.1, "calib_sec": 0.3, "queries": {"q": 1.0}})
        + "\n"
        + json.dumps({"sf": 0.1, "calib_sec": 0.6, "queries": {"q": 1.4}})
        + "\n"
    )
    prior, prior_calib, calib_ref, _, _, _ = bench._load_prior(tmp_path, 0.1)
    assert prior == {"q": 1.0}
    assert prior_calib == {"q": 0.3}  # the 1.0 came from the 0.3 run
    assert calib_ref == 0.3  # low quartile of [0.3, 0.6]
    # 1.4 corroborates 1.0 (not an outlier min): min kept, with ITS calib
    # unnormalized: 1.9 > 1.5 and ratio 1.9 -> would flag via abs branch
    assert bench._regressed(1.9, 1.0)
    # same measurement on a 2x-slower host (scale 2.0): not flagged
    assert not bench._regressed(1.9, 1.0, scale=2.0)
    # a true structural blowup stays visible even at the scale cap
    assert bench._regressed(4.5, 1.0, scale=2.0)


def test_adjudication_confirms_persistent_plateau_excursion():
    """End-to-end r13 done-criterion: a query that plateaued at ~4.5 s
    and now persistently runs +40% (the injected-sleep shape) must come
    out real_out_of_band through the full ladder — flag gate,
    out-of-both-bands check, 4-sample re-measure — even though the
    all-history band (max 12.7 from early slow rounds) contains it."""
    band = (4.4, 12.7, 30)  # all-history: early rounds were 2-3x slower
    recent = (4.43, 4.69, 8)  # the plateau
    prior = 4.43
    # the flag fires via the recency gate (sticky-prior gate alone
    # would miss: 6.3 < 1.5 * 4.43)
    assert bench._recent_excursion(6.3, recent)
    entry = bench._adjudicate_flag(
        6.3, prior, band, recent, scale=1.0, run_once=lambda: 6.3
    )
    assert entry["verdict"] == "real_out_of_band"
    assert entry["samples"] == [6.3] * 4
    assert entry["recent_band"] == [4.43, 4.69]
    # a transient stall re-measures back to the plateau -> noise
    entry = bench._adjudicate_flag(
        6.3, prior, band, recent, scale=1.0, run_once=lambda: 4.5
    )
    assert entry["verdict"] == "noise_remeasured"
    # a plateau-level measurement never re-measures at all
    entry = bench._adjudicate_flag(
        4.6, prior, band, recent, scale=1.0,
        run_once=lambda: (_ for _ in ()).throw(AssertionError("no re-measure")),
    )
    assert entry["verdict"] == "noise_in_band"
