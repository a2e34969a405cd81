"""Property fuzz: random simulated BFB cases recover the truth exactly
through the full pipeline (LH -> CN -> ILP -> solve -> replay), across
sizes and solver modes. This is the breadth check behind the
"exact BFB-path agreement" target in BASELINE.md."""

import os

import pytest

from ambigram_tpu.engine.pipeline import run_bfb
from ambigram_tpu.scripts.evaluate import junction_score, multiplicity_diff
from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case


@pytest.mark.parametrize("seed", range(12))
def test_nested_cases_recover_truth_auto(seed, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n = 6 + (seed * 3) % 15  # sizes 6..20
    case = simulate_bfb_case(seed=seed, n_segments=n)
    paths = write_case(case, "fz%d" % seed)
    res = run_bfb(paths["lh"], solver="auto")
    assert res.path_strings, "no path produced"
    diff = multiplicity_diff(case.truth_string, res.path_strings[0])
    score = junction_score(case.truth_string, res.path_strings[0])
    assert diff == 0, (case.truth_string, res.path_strings[0])
    assert score.recall == 1.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exact_and_auto_agree(seed, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    case = simulate_bfb_case(seed=100 + seed, n_segments=10)
    paths = write_case(case, "ag%d" % seed)
    r_exact = run_bfb(paths["lh"], solver="exact")
    r_auto = run_bfb(paths["lh"], solver="auto")
    assert r_exact.path_strings == r_auto.path_strings
    assert r_exact.ilp_error == r_auto.ilp_error


@pytest.mark.parametrize("seed", [0, 1])
def test_process_mode_resolves(seed, tmp_path, monkeypatch):
    """Raw break-fusion-bridge rounds can exceed the reference model's
    nesting caps; the pipeline must still return a consistent path (the
    reference would emit its best fit the same way)."""
    monkeypatch.chdir(tmp_path)
    case = simulate_bfb_case(seed=seed, n_segments=8, rounds=3, mode="process")
    paths = write_case(case, "pr%d" % seed)
    res = run_bfb(paths["lh"], solver="auto")
    assert res.path_strings and res.path_strings[0]
