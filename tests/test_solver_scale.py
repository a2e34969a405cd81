"""Device-solver validation in the regime auto routes to it
(V > 2048, i.e. S >= 45): end-to-end truth recovery through
run_bfb(solver="device"/"auto"), with the profiler's real
candidates-scored accounting (VERDICT r1 items 2 and 5).

Search budgets are shrunk via the AMBIGRAM_SEARCH_* env knobs so the
CPU-mesh test run stays fast; the full-budget behavior is measured on
real hardware by bench.py's suite benchmark.
"""

import os

import pytest

from ambigram_tpu.engine.pipeline import run_bfb
from ambigram_tpu.scripts.evaluate import junction_score, multiplicity_diff
from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case
from ambigram_tpu.utils.profiling import GLOBAL


@pytest.fixture(autouse=True)
def small_search_budget(monkeypatch):
    monkeypatch.setenv("AMBIGRAM_SEARCH_POP", "16")
    monkeypatch.setenv("AMBIGRAM_SEARCH_ROUNDS", "2")
    monkeypatch.setenv("AMBIGRAM_SEARCH_SWEEPS", "96")


@pytest.mark.parametrize("seed,n", [(3, 45), (1, 48)])
def test_device_solver_recovers_truth_large(seed, n, tmp_path, monkeypatch):
    """run_bfb(solver='device') at V=2070/2352: exact truth recovery,
    self-certified (eps == 0 or LP-bound certificate)."""
    monkeypatch.chdir(tmp_path)
    case = simulate_bfb_case(seed=seed, n_segments=n)
    paths = write_case(case, "dl%d" % seed)
    res = run_bfb(paths["lh"], solver="device")
    assert res.path_strings, "no path produced"
    assert multiplicity_diff(case.truth_string, res.path_strings[0]) == 0
    assert junction_score(case.truth_string, res.path_strings[0]).recall == 1.0
    assert res.chromosomes[0].certified


def test_auto_dispatches_device_at_scale(tmp_path, monkeypatch):
    """At V > AUTO_EXACT_FIRST_MAX_VARS the auto solver must go to the
    device search first (no host MILP prepass) and still recover truth."""
    monkeypatch.chdir(tmp_path)
    case = simulate_bfb_case(seed=7, n_segments=52)
    paths = write_case(case, "ad")
    GLOBAL.reset()
    res = run_bfb(paths["lh"], solver="auto")
    assert GLOBAL.counters.get("solve.device_calls", 0) >= 1
    # device-first: the host MILP never ran for this large program
    assert "solve.exact" not in GLOBAL.phases
    assert multiplicity_diff(case.truth_string, res.path_strings[0]) == 0


def test_profiler_reports_real_candidates_per_second(tmp_path, monkeypatch):
    """The BASELINE counter comes from a real solve, not a synthetic
    chain: sweeps counted inside the jitted search x move-set sizes."""
    monkeypatch.chdir(tmp_path)
    case = simulate_bfb_case(seed=1, n_segments=48)
    paths = write_case(case, "pc")
    GLOBAL.reset()
    run_bfb(paths["lh"], solver="device")
    assert GLOBAL.counters.get("candidates_scored", 0) > 1e6
    cps = GLOBAL.candidates_per_second()
    assert cps is not None and cps > 0
    report = GLOBAL.report()
    assert "candidates_scored" in report and "solve" in report
