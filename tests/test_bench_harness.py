"""Unit tests for bench.py's driver-facing mechanics (no Spark).

Round-3 postmortem: the official artifact BENCH_r03.json was parsed:null
because the final JSON line grew past the driver's 2000-char stdout tail
capture. These tests pin the two artifact-integrity invariants:

  * the FINAL stdout line is a compact headline that fits the tail
    capture with margin, for the full 27-query timing dict;
  * the whole-pair budget-cut arithmetic can drop pairs but never
    strands a partial pair, and the first pair always runs.
"""

from __future__ import annotations

import json

import bench


def _representative_headline() -> dict:
    # worst-ish case values: every query present with 3-decimal timings,
    # all optional fields populated, 5 pair efficiencies
    queries = {name: 123.456 for name in bench.TIMED_QUERIES}
    return {
        "metric": "index-build docs/sec + BM25 topk latency + scaling efficiency",
        "value": 12345.67,
        "unit": "sec",
        "sf": "/root/testdata/sf0.1",
        "queries": queries,
        "bench_docs": 600000,
        "index_build_docs_per_sec": 14714.6,
        "sec_per_query": 0.1234,
        "scaling_efficiency": 0.875,
        "scaling_efficiency_best_pair": 0.918,
        "scaling_efficiency_symmetric": 0.851,
        "scaling_efficiency_hw_normalized": 0.909,
        "scaling_efficiency_capable_windows": 0.944,
        "n_capable_pairs": 3,
        "pair_efficiencies": [0.918, 0.733, 0.823, 0.875, 0.911],
        "dropped_pairs": 0,
        "hw_parallel_scaling_median": 0.979,
        "t8_warmup_sec_per_pair": [21.8, 23.47, 34.75, 30.28, 21.31],
        "host_busy_query_phase": 0.123,
        "detail": "BENCH/last_run_full.json",
    }


def test_headline_fits_driver_tail_capture():
    line = json.dumps(_representative_headline())
    # driver keeps the last 2000 chars; leave real margin for a trailing
    # newline and any incidental stdout the JVM emits after the line
    assert len(line) < 1800, f"headline line is {len(line)} chars"


def test_headline_round_trips_key_fields():
    obj = json.loads(json.dumps(_representative_headline()))
    assert obj["scaling_efficiency"] == 0.875
    assert len(obj["queries"]) == len(bench.TIMED_QUERIES)
    assert obj["pair_efficiencies"][0] == 0.918


def test_budget_first_pair_always_runs():
    cut, avg, projected = bench.budget_cut_decision(0.0, 0, 2700.0)
    assert not cut and avg == 0.0
    # even with an absurdly small budget the first pair runs (fixed plan)
    cut, _, _ = bench.budget_cut_decision(0.0, 0, 1.0)
    assert not cut


def test_budget_cut_fires_on_projection():
    # 3 pairs done in 1800s -> avg 600s; projecting a 4th (2400s) fits a
    # 2700 budget, a 5th would not be reached by this call shape
    cut, avg, projected = bench.budget_cut_decision(1800.0, 3, 2700.0)
    assert not cut and avg == 600.0 and projected == 2400.0
    # 4 pairs done in 2400s -> avg 600s; a 5th projects to 3000 > 2700
    cut, avg, projected = bench.budget_cut_decision(2400.0, 4, 2700.0)
    assert cut and projected == 3000.0


def test_budget_cut_boundary_exact_fit():
    # projection exactly equal to budget is NOT a cut (<= fits)
    cut, _, projected = bench.budget_cut_decision(2160.0, 4, 2700.0)
    assert projected == 2700.0 and not cut
