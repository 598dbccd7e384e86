"""The bench tail line is the driver's ONLY per-query window.

The driver captures a 2,000-char TAIL of bench stdout and parses the
last JSON line; r12/r13's tail dropped every nested dict, so the
driver's PERF comparison ran blind (n_common: 0, geomean null,
bench_ok false — VERDICT r13 ask #1). These tests pin the repaired
contract: the final line carries the headline + heavy per-query
medians, parses standalone, and always fits the capture window.
"""

from __future__ import annotations

import json

import bench


def _fake_full() -> dict:
    full = {
        "metric": "headline_queries_total",
        "value": 9.543,
        "unit": "sec",
        "estimator": "median_of_5",
        "queries": {name: 0.5964 for name in bench.HEADLINE},
        "queries_iqr": {name: 0.11 for name in bench.HEADLINE},
        "queries_best": {name: 0.55 for name in bench.HEADLINE},
        "value_best": 8.841,
        "value_r1set": 7.016,
        "value_r1set_best": 6.511,
        "queries_heavy": {name: 2.0433 for name in bench.HEAVY},
        "queries_heavy_iqr": {name: 0.3 for name in bench.HEAVY},
        "queries_heavy_best": {name: 1.9 for name in bench.HEAVY},
        "value_heavy": 8.172,
        "sf": 0.1,
        "ingest_msgs": 101500,
        "ingest_sec": 1.189,
        "ingest_sec_iqr": 0.174,
        "ingest_sec_best": 1.174,
        "ingest_msgs_per_sec": 85366,
        "ingest_msgs_per_sec_best": 86457,
        "stream_ingest_sec": 10.912,
        "stream_ingest_sec_iqr": 20.178,
        "stream_ingest_sec_best": 5.017,
        "stream_ingest_msgs_per_sec": 9302,
        "stream_ingest_msgs_per_sec_best": 20231,
        "stream_ingest_curve": {"1": {"sec": 1.591}},
        "stream_ingest_tuned_batches": 1,
        "stream_ingest_msgs_per_sec_tuned": 63796,
        "stream_ingest_msgs_per_sec_tuned_best": 73232,
        "corpus_dedup_docs": 5000,
        "corpus_dedup_sec": 2.293,
        "corpus_dedup_sec_iqr": 0.537,
        "corpus_dedup_sec_best": 2.103,
        "corpus_dedup_docs_per_sec": 2181,
    }
    return full


def test_tail_line_carries_per_query_maps():
    line = bench._tail_line(_fake_full())
    tail = json.loads(line)
    # the driver joins per-query maps round-over-round: every headline
    # and heavy entry must be present under its registry name
    assert set(tail["queries"]) == set(bench.HEADLINE)
    assert set(tail["queries_heavy"]) == set(bench.HEAVY)
    # medians are 3-decimal-rounded so the line stays compact
    assert tail["queries"][bench.HEADLINE[0]] == 0.596
    assert tail["queries_heavy"][bench.HEAVY[0]] == 2.043
    # the label must be LAST-writer so the tail is identifiable
    assert tail["metric"] == "bench_summary_tail"
    # headline scalars the driver reads must survive
    for key in ("value", "unit", "sf", "value_heavy", "value_r1set"):
        assert key in tail


def test_tail_line_fits_capture_window():
    line = bench._tail_line(_fake_full())
    assert len(line) <= bench._TAIL_BUDGET
    # no nested dict other than the two per-query maps (the curve etc.
    # would blow the budget and belongs to the preview artifact)
    tail = json.loads(line)
    nested = [k for k, v in tail.items() if isinstance(v, dict)]
    assert sorted(nested) == ["queries", "queries_heavy"]


def test_tail_line_trims_scalars_never_queries():
    full = _fake_full()
    # inflate low-priority scalars so the assembled line overflows
    for key in bench._TAIL_TRIM_ORDER:
        full[key] = 1.0e300
    # json float repr of 1e300 is short; instead blow up via many long
    # scalar keys being replaced with long strings? Scalars are numeric
    # in practice — emulate growth with a long estimator string, which
    # is NOT in the trim order, plus the inflated floats.
    full["estimator"] = "x" * 900
    line = bench._tail_line(full)
    tail = json.loads(line)
    # the per-query maps must survive any trimming
    assert set(tail["queries"]) == set(bench.HEADLINE)
    assert set(tail["queries_heavy"]) == set(bench.HEAVY)
    # and at least one trim-order scalar was dropped to make room
    assert any(k not in tail for k in bench._TAIL_TRIM_ORDER)
