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
    queries = {name: 123.46 for name in bench.TIMED_QUERIES}
    # worst case: the full 9-pair plan (5 base + 4 host-conditioned
    # extensions) so every per-pair evidence list carries 9 entries
    return {
        "metric": "build+query+scaling",
        "value": 12345.67,
        "unit": "sec",
        "sf": "/root/testdata/sf0.1",
        "queries": queries,
        "bench_docs": 300000,
        "qindex_docs": 600000,
        "index_build_docs_per_sec": 14714.6,
        "sec_per_query": 0.1234,
        "sec_per_query_all": [0.1234, 0.2345],
        "scaling_efficiency": 0.875,
        "scaling_efficiency_capable_windows": 0.944,
        "n_capable_pairs": 3,
        "quiet_truth_ratio": 0.923,
        "pair_efficiencies": [0.918, 0.733, 0.823, 0.875, 0.911,
                              0.844, 0.902, 0.888, 0.879],
        "dropped_pairs": 0,
        "t8_warmup_sec_per_pair": [21.8, 23.4, 34.7, 30.2, 21.3,
                                   22.1, 20.9, 23.8, 24.6],
        "query_warmup_pass_sec": 123.45,
        "spark_canary_query_phase_sec": 21.84,
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
    cut, avg, projected = bench.budget_cut_decision(0.0, [], 2700.0)
    assert not cut and avg == 0.0
    # even with an absurdly small budget the first pair runs (fixed plan)
    cut, _, _ = bench.budget_cut_decision(0.0, [], 1.0)
    assert not cut


def test_budget_cut_fires_on_projection():
    # 3 pairs of 600s each; projecting a 4th (2400s) fits a 2700 budget
    cut, avg, projected = bench.budget_cut_decision(1800.0, [600.0] * 3, 2700.0)
    assert not cut and avg == 600.0 and projected == 2400.0
    # 4 pairs of 600s; a 5th projects to 3000 > 2700
    cut, avg, projected = bench.budget_cut_decision(2400.0, [600.0] * 4, 2700.0)
    assert cut and projected == 3000.0


def test_budget_cut_boundary_exact_fit():
    # projection exactly equal to budget is NOT a cut (<= fits)
    cut, _, projected = bench.budget_cut_decision(2160.0, [540.0] * 4, 2700.0)
    assert projected == 2700.0 and not cut


def test_budget_projection_excludes_qbatch_cost():
    """Round-6 regression guard for the r5 failure mode: the projection
    must average PAIR-ONLY durations — a first window that spent ~600 s
    on the qindex build + expired canary waits must not inflate the
    projected cost of every later pair. Elapsed 1000 s of which only
    350 s was the pair itself: a second pair projects at 1350, not 2000."""
    cut, avg, projected = bench.budget_cut_decision(1000.0, [350.0], 3000.0)
    assert not cut and avg == 350.0 and projected == 1350.0
    # with a qbatch still scheduled, its expected cost IS projected
    cut, _, projected = bench.budget_cut_decision(
        1000.0, [350.0], 3000.0, next_extra=200.0)
    assert projected == 1550.0 and not cut


def test_plan_step_pairs_outrank_qbatch_draws():
    """Round-6 validation finding: a severe window priced the pair at
    1173s and the pending draw at ~300s; with 1333s of budget left the
    draw's projected cost cut 4 of 5 pairs. When the projection fits
    WITHOUT the scheduled draw, the draw is skipped and the pair runs."""
    # with the draw: 1667 + 1173 + 300 = 3140 > 3000; without: 2840 fits
    cut, skip, avg, projected = bench.plan_step_decision(
        1667.0, [1173.0], 3000.0, qbatch_est=300.0, q_batches_left=1)
    assert not cut and skip and projected == 2840.0
    # no draw scheduled -> plain pair projection, no skip
    cut, skip, _, _ = bench.plan_step_decision(
        1667.0, [1173.0], 3000.0, qbatch_est=300.0, q_batches_left=0)
    assert not cut and not skip
    # even without the draw the pair does not fit -> genuine cut
    cut, skip, _, projected = bench.plan_step_decision(
        2400.0, [1173.0], 3000.0, qbatch_est=300.0, q_batches_left=1)
    assert cut and not skip and projected == 3873.0
    # everything fits -> neither cut nor skip
    cut, skip, _, _ = bench.plan_step_decision(
        600.0, [290.0], 3000.0, qbatch_est=300.0, q_batches_left=1)
    assert not cut and not skip


def test_quiet_truth_ratio():
    pairs = [
        {"runs_4n_all": [{"build_sec": 29.5}, {"build_sec": 26.3}],
         "runs_n_all": [{"build_sec": 101.0}]},
        {"runs_4n_all": [{"build_sec": 95.9}],
         "runs_n_all": [{"build_sec": 97.5}, {"build_sec": 120.0}]},
    ]
    # best t2 97.5 / best t8 26.3 / 4 = 0.927
    assert bench.quiet_truth_ratio(pairs) == 0.927
    assert bench.quiet_truth_ratio([]) is None
    assert bench.quiet_truth_ratio([{"runs_4n_all": [], "runs_n_all": []}]) is None


def test_canary_gate_from_warmup():
    """A passing qbatch warmup doubles as the pair's canary; a failing
    one returns None so the real (waiting) gate runs."""
    bench._SPARK_CANARY_BEST[0] = float("inf")
    g = bench.canary_gate_from_warmup(21.4)
    assert g is not None and g["spark_canary_ok"]
    assert g["spark_canary_source"] == "qbatch_warmup"
    assert g["spark_canary_sec"] == 21.4 and g["spark_canary_wait_sec"] == 0.0
    # dilated warmup (vs the 22s absolute anchor * 1.2 ratio) -> no reuse
    assert bench.canary_gate_from_warmup(40.0) is None
    assert bench.canary_gate_from_warmup(None) is None
    bench._SPARK_CANARY_BEST[0] = float("inf")


# ----------------------------------------------------- capable-window filter

def _leg(cores, wu):
    rec = {"cores": cores, "build_sec": 50.0, "docs_per_sec": 12000.0}
    if wu is not None:
        rec["warmup_sec"] = wu
    return rec


def _pair(hw_start=0.96, hw_end=0.95, canary_ok=True, wu_4n=(20.5, 21.0),
          wu_n=43.0, canary_attempts=(20.5,)):
    return {
        "hw_parallel_scaling": hw_start,
        "hw_parallel_scaling_end": hw_end,
        "spark_canary_ok": canary_ok,
        "spark_canary_attempts": list(canary_attempts),
        "runs_4n_all": [_leg(bench.SCALING_4N, w) for w in wu_4n],
        "runs": {str(bench.SCALING_N): _leg(bench.SCALING_N, wu_n)},
        "efficiency": 0.85,
    }


def test_pair_capable_happy_path():
    p = _pair()
    refs = bench._wu_refs([p])
    assert bench.pair_capable(p, refs, 0.92)


def test_pair_capable_requires_canary_ok():
    p = _pair(canary_ok=False)
    refs = bench._wu_refs([p])
    assert not bench.pair_capable(p, refs, 0.92)


def test_pair_capable_missing_warmup_is_not_capable():
    # round-4 advice: absent warmup data must mean NOT capable, never
    # vacuously capable — here the 4N level has NO warmup samples at all
    p = _pair(wu_4n=(None, None))
    refs = bench._wu_refs([p])
    assert not bench.pair_capable(p, refs, 0.92)
    # N-level data missing entirely -> not capable either
    p2 = _pair()
    del p2["runs"][str(bench.SCALING_N)]["warmup_sec"]
    refs2 = bench._wu_refs([p2])
    assert not bench.pair_capable(p2, refs2, 0.92)


def test_pair_capable_hw_end_gate():
    p = _pair(hw_end=0.88)
    refs = bench._wu_refs([p])
    assert not bench.pair_capable(p, refs, 0.92)


def test_pair_capable_dilated_level_fails_but_single_spike_passes():
    # EVERY 4N warmup dilated (round-4 mode) -> not capable
    p = _pair(wu_4n=(41.0, 39.5))
    refs = bench._wu_refs([p])
    assert not bench.pair_capable(p, refs, 0.92)
    # a single slow probe next to clean sibling draws is scheduling
    # noise, not window dilation: min-of-probes keeps the pair capable
    # (round-5: a 24.45s spike disqualified the session's cleanest pair)
    p2 = _pair(wu_4n=(20.5, 41.0))
    refs2 = bench._wu_refs([p2])
    assert bench.pair_capable(p2, refs2, 0.92)


def test_pair_capable_n_leg_warmup_fails():
    p = _pair(wu_n=60.0)  # t2 quiet ref ~43-44 s
    refs = bench._wu_refs([p])
    assert not bench.pair_capable(p, refs, 0.92)


def test_wu_refs_absolute_anchor_defeats_dilated_session():
    # a session dilated END TO END: every observed warmup is ~2x quiet.
    # The absolute anchor (22 s for 4N, 44 s for N) keeps the reference
    # honest, so a fully-dilated pair is NOT capable even though it
    # matches the session's own (dilated) best — the round-4 advice hole.
    p = _pair(wu_4n=(40.0, 41.0), wu_n=85.0, canary_attempts=(40.0,))
    refs = bench._wu_refs([p])
    assert refs[bench.SCALING_4N] == 22.0
    assert refs[bench.SCALING_N] == 44.0
    assert not bench.pair_capable(p, refs, 0.92)


def test_wu_refs_canary_attempts_feed_4n_reference():
    p = _pair(wu_4n=(25.0, 26.0), canary_attempts=(19.0, 25.0))
    refs = bench._wu_refs([p])
    assert refs[bench.SCALING_4N] == 19.0
