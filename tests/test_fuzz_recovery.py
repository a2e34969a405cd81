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


@pytest.mark.parametrize("seed", range(6))
def test_virus_integration_recovers_truth(seed, tmp_path, monkeypatch):
    """Simulated PROP-I1 cases (virus block integrated into the host
    arm, nested BFB on the merged arm) recover the truth exactly
    through insertBeforeBFB -> solve -> virusBFB mapping."""
    from ambigram_tpu.scripts.simulate import simulate_virus_case

    monkeypatch.chdir(tmp_path)
    case = simulate_virus_case(seed=seed, n_host=5 + seed % 4, n_virus=2 + seed % 2)
    paths = write_case(case, "vf%d" % seed)
    res = run_bfb(paths["lh"], solver="auto")
    assert res.path_strings
    p = res.path_strings[0]
    assert multiplicity_diff(case.truth_string, p) == 0, (case.truth_string, p)
    assert junction_score(case.truth_string, p).recall == 1.0
    assert "||" in p  # human-virus boundaries marked


def test_virus_integration_noisy_depth(tmp_path, monkeypatch):
    """Noisy depths with CN -1: virus segments exercise the x2
    whole-host scaling (src/Graph.cpp:369-405) and the truth still
    recovers at 3% noise."""
    from ambigram_tpu.scripts.simulate import simulate_virus_case

    monkeypatch.chdir(tmp_path)
    case = simulate_virus_case(seed=11, n_host=6, n_virus=2, noise=0.03)
    paths = write_case(case, "vn")
    res = run_bfb(paths["lh"], solver="exact")
    assert multiplicity_diff(case.truth_string, res.path_strings[0]) == 0
