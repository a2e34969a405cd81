"""Determinism and jit-vs-eager equivalence — the build's replacement
for the reference's (absent) sanitizer story (SURVEY.md section 5)."""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _prog():
    from ambigram_tpu.engine.ilp import build_bfb_program

    seg = np.array([2.0, 6.0, 8.0, 8.0, 4.0, 4.0])
    fbi = np.array([0.0, 2.0, 1.0, 2.0, 0.0, 2.0])
    return build_bfb_program(1, 6, seg, fbi, 32, 1)


def test_scorer_jit_vs_eager():
    import jax

    from ambigram_tpu.solver.score import score_batch, score_batch_jit, scoring_tensors

    prog = _prog()
    st = scoring_tensors(prog)
    rng = np.random.default_rng(0)
    X = np.zeros((32, st.H.shape[1]), dtype=np.float32)
    X[:, : prog.num_vars] = rng.integers(0, 3, size=(32, prog.num_vars))
    with jax.disable_jit():
        eager = np.asarray(score_batch(st, X))
    jitted = np.asarray(score_batch_jit(st, X))
    np.testing.assert_array_equal(eager, jitted)


def test_device_search_deterministic():
    from ambigram_tpu.solver.search import solve_device

    prog = _prog()
    r1 = solve_device(prog, seed=3)
    r2 = solve_device(prog, seed=3)
    assert np.array_equal(r1.x, r2.x)
    assert r1.epsilon_sum == r2.epsilon_sum


def test_pipeline_run_to_run_identical():
    from ambigram_tpu.engine.pipeline import run_bfb

    a = run_bfb(os.path.join(DATA, "egfr6.lh"), solver="exact")
    b = run_bfb(os.path.join(DATA, "egfr6.lh"), solver="exact")
    assert a.path_strings == b.path_strings
    assert a.target_cn == b.target_cn


def test_profiler_counters():
    from ambigram_tpu.utils.profiling import Profiler

    p = Profiler()
    with p.phase("score"):
        p.count("candidates_scored", 1000)
    assert p.phases["score"].calls == 1
    assert p.counters["candidates_scored"] == 1000
    assert "score" in p.report()
