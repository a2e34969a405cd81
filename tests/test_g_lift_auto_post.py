"""Regression tests for the final round-5 host-path changes:

- ``BfbProgram._g_lift``: the cached contiguous int8->float lift behind
  ``hard_violation`` must pick float32 only when provably exact
  (worst-case |G| . x_ub < 2^24) and fall back to float64 otherwise,
  matching a straight float64 evaluation in both regimes.
- ``_auto_post(tried_exact=...)``: when a budgeted exact solve already
  ran upstream (batch exact-first prepass, big-case escalation), the
  last-resort MILP must not re-run the identical solve; without that
  flag it still fires for an infeasible candidate pool.
"""

import numpy as np
import pytest

from ambigram_tpu.engine.enumerate import enumerate_pairs
from ambigram_tpu.engine.ilp import BfbProgram, build_bfb_program


def _egfr_prog():
    seg_cn = np.array([2.0, 4.0, 6.0, 8.0, 6.0, 2.0])
    fbi_cn = np.array([1.0, 1.0, 1.0, 1.0, 2.0, 0.0])
    return build_bfb_program(1, 6, seg_cn, fbi_cn, seg_cn.sum(), 1)


def _hard_violation_f64(prog, x):
    g64 = prog.G.astype(np.float64)
    gx = x.astype(np.float64) @ g64.T
    return np.maximum(gx - prog.g_ub, 0).sum(axis=-1) + np.maximum(
        prog.g_lb - gx, 0
    ).sum(axis=-1)


def test_g_lift_f32_small_program_matches_f64():
    prog = _egfr_prog()
    gf, dtype = prog._g_lift()
    assert dtype is np.float32
    assert gf.dtype == np.float32 and gf.flags["C_CONTIGUOUS"]
    # the cache must return the identical object on re-entry
    assert prog._g_lift()[0] is gf
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, size=(8, prog.num_vars)).astype(np.float64)
    np.testing.assert_allclose(
        prog.hard_violation(x), _hard_violation_f64(prog, x)
    )


def _toy_prog(x_ub_val: float) -> BfbProgram:
    pairs = enumerate_pairs(1, 1)
    T = len(pairs)
    nv = 2 * T
    G = np.full((2, nv), 100, dtype=np.int8)
    return BfbProgram(
        start=1,
        end=1,
        pairs=pairs,
        A_seg=np.ones((1, nv)),
        c_seg=np.zeros(1),
        A_fbi=np.zeros((1, nv)),
        c_fbi=np.zeros(1),
        G=G,
        g_lb=np.full(2, -1e18),
        g_ub=np.full(2, 1e17),
        x_ub=np.full(nv, x_ub_val),
        bias=0,
    )


def test_g_lift_f64_fallback_on_huge_bounds():
    # worst-case row product 100 * 2^20 * nv >= 2^24: f32 accumulation
    # is no longer provably exact, the lift must choose float64
    prog = _toy_prog(2.0**20)
    gf, dtype = prog._g_lift()
    assert dtype is np.float64 and gf.dtype == np.float64
    # correctness at a magnitude where f32 rounding would actually bite:
    # 2^24 + 1 is not representable in f32
    x = np.array([[2.0**24 + 1, 0.0]])
    np.testing.assert_allclose(
        prog.hard_violation(x), _hard_violation_f64(prog, x)
    )
    # and the small-bound variant of the same program stays on f32
    assert _toy_prog(4.0)._g_lift()[1] is np.float32


def test_auto_post_tried_exact_skips_last_resort(monkeypatch):
    from ambigram_tpu.engine import pipeline
    from ambigram_tpu.solver import exact as exact_mod
    from ambigram_tpu.solver import native_bnb
    from ambigram_tpu.solver.exact import SolveResult

    if not exact_mod.have_exact_solver():
        pytest.skip("no MILP backend")

    prog = _egfr_prog()
    # an INFEASIBLE heuristic incumbent: all-upper-bound x violates the
    # hard rows, so the feasible pool is empty and the last-resort
    # branch is reached
    bad = prog.x_ub.astype(np.float64)
    assert float(prog.hard_violation(bad)) > 0.0
    res = SolveResult(
        x=bad, epsilon_sum=1e9, objective=1e9, status="heuristic"
    )

    calls = []

    def fake_exact(p, **kw):
        calls.append(kw)
        return SolveResult(
            x=bad, epsilon_sum=1e9, objective=1e9, status="error"
        )

    monkeypatch.setattr(exact_mod, "solve_exact", fake_exact)
    monkeypatch.setattr(
        native_bnb, "solve_native", lambda *a, **kw: None
    )

    out = pipeline._auto_post(prog, res, tried_exact=True)
    assert calls == []  # upstream already burned the exact budget
    assert out is res  # falls through to the only candidate

    pipeline._auto_post(prog, res, tried_exact=False)
    assert len(calls) == 1  # without the flag the last resort fires
