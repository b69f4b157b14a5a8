"""Unit coverage for the scale-probe event-log parser and classifier —
the artifact generator behind SCALE_PROBE.json."""

from __future__ import annotations

import json

from tools.scale_probe import DATA_GROWTH, classify, parse_event_log


def test_classify_thresholds():
    assert classify(0.5 * DATA_GROWTH) == "sublinear"
    assert classify(1.0 * DATA_GROWTH) == "linear"
    assert classify(1.5 * DATA_GROWTH) == "linear"
    assert classify(1.6 * DATA_GROWTH) == "superlinear"


def test_parse_event_log_attributes_by_job_group(tmp_path):
    """Task metrics must roll up to the job group that owns the stage;
    ungrouped stages and malformed lines are ignored."""
    events = [
        {
            "Event": "SparkListenerJobStart",
            "Stage IDs": [1, 2],
            "Properties": {"spark.jobGroup.id": "small:q"},
        },
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 1,
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 100},
                "Shuffle Read Metrics": {
                    "Remote Bytes Read": 30,
                    "Local Bytes Read": 20,
                },
                "Input Metrics": {"Bytes Read": 7},
            },
        },
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 2,
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 11}
            },
        },
        # stage 99 belongs to no group -> dropped
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 99,
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 10_000}
            },
        },
    ]
    log = tmp_path / "app-123"
    with open(log, "w", encoding="utf-8") as fh:
        for ev in events:
            fh.write(json.dumps(ev) + "\n")
        fh.write("{truncated final li")  # partial write on crash
    (tmp_path / "appstatus_app-123").write_text("")  # marker file, skipped

    agg = parse_event_log(tmp_path)
    assert set(agg) == {"small:q"}
    assert agg["small:q"]["shuffle_write"] == 111
    assert agg["small:q"]["shuffle_read"] == 50
    assert agg["small:q"]["input"] == 7


def test_parse_event_log_interval_attribution_for_ungrouped(tmp_path):
    """Stages with no job group (Structured Streaming micro-batch
    threads) are attributed by the wall-clock window of the serially
    running query; tasks outside every window stay dropped."""
    events = [
        # ungrouped stage, finish time inside the small:sq window
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 7,
            "Task Info": {"Finish Time": 1_500},
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 42},
                "Input Metrics": {"Bytes Read": 5},
            },
        },
        # ungrouped, outside every window (warm-up) -> dropped
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 8,
            "Task Info": {"Finish Time": 500},
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 9_999}
            },
        },
        # ungrouped, no finish time -> dropped
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 9,
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 1}
            },
        },
        # FOREIGN job group (Structured Streaming sets its runId as the
        # group on its micro-batch thread) -> re-attributed by window
        {
            "Event": "SparkListenerJobStart",
            "Stage IDs": [10],
            "Properties": {
                "spark.jobGroup.id": "3b5a9c-runid-of-stream-query"
            },
        },
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 10,
            "Task Info": {"Finish Time": 1_800},
            "Task Metrics": {
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 58}
            },
        },
    ]
    log = tmp_path / "app-456"
    with open(log, "w", encoding="utf-8") as fh:
        for ev in events:
            fh.write(json.dumps(ev) + "\n")

    agg = parse_event_log(tmp_path, [("small:sq", 1_000, 2_000)])
    assert set(agg) == {"small:sq"}
    assert agg["small:sq"]["shuffle_write"] == 42 + 58
    assert agg["small:sq"]["input"] == 5
