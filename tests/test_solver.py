import os

import numpy as np
import pytest

from ambigram_tpu.engine.ilp import build_bfb_program
from ambigram_tpu.engine.junccn import get_junc_cn
from ambigram_tpu.model.genome import Genome
from ambigram_tpu.solver.exact import solve_exact
from ambigram_tpu.solver.score import (
    score_batch_jit,
    score_batch_pallas,
    scoring_tensors,
)
from ambigram_tpu.solver.search import lp_lower_bound, solve_device

DATA = os.path.join(os.path.dirname(__file__), "data")


def _egfr_prog():
    g = Genome.from_lh(os.path.join(DATA, "egfr6.lh"))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    _, junc_cn = get_junc_cn(g, 1, 6)
    seg_cn = np.array([s.weight.copy_num for s in g.segments])
    return build_bfb_program(1, 6, seg_cn, junc_cn[1:7, 1], seg_cn.sum(), 1)


def _random_prog(rng, n):
    """A random but structurally consistent BFB-ish instance."""
    start, end = 1, n
    # build a random CN profile by stacking loops
    T = n * (n + 1) // 2
    from ambigram_tpu.engine.enumerate import enumerate_pairs

    pairs = enumerate_pairs(start, end)
    x = np.zeros(2 * T)
    for _ in range(rng.integers(2, 5)):
        t = rng.integers(0, T)
        x[T + t] += rng.integers(1, 3)
    seg_cn = np.zeros(n)
    fbi_cn = np.zeros(n)
    for t in range(T):
        i, j = pairs[t]
        if x[T + t] > 0:
            seg_cn[i - 1 : j] += 2 * x[T + t]
            fbi_cn[i - 1] += x[T + t]
            fbi_cn[j - 1] += x[T + t]
    # add noise to the profile
    seg_cn += rng.integers(0, 2, size=n)
    return build_bfb_program(start, end, seg_cn, fbi_cn, seg_cn.sum(), 1)


def test_exact_egfr6():
    prog = _egfr_prog()
    res = solve_exact(prog)
    assert res.status == "optimal"
    assert res.epsilon_sum == pytest.approx(1.0)
    assert res.objective == pytest.approx(0.0)
    # the hand-derived optimum: loops (1,6), (2,6), (2,4), (3,4)
    from ambigram_tpu.engine.enumerate import pair_index

    T = len(prog.pairs)
    expected = np.zeros(2 * T, dtype=np.int64)
    for ij in [(1, 6), (2, 6), (2, 4), (3, 4)]:
        expected[T + pair_index(1, 6, *ij)] = 1
    assert np.array_equal(res.x, expected)


def test_score_batch_matches_numpy():
    prog = _egfr_prog()
    st = scoring_tensors(prog)
    rng = np.random.default_rng(0)
    B = 16
    Vp = st.H.shape[1]
    X = np.zeros((B, Vp), dtype=np.float32)
    X[:, : prog.num_vars] = rng.integers(0, 3, size=(B, prog.num_vars))
    scores = np.asarray(score_batch_jit(st, X))
    for b in range(B):
        x = X[b, : prog.num_vars].astype(np.float64)
        expect = prog.residual_objective(x) + 1024.0 * prog.hard_violation(x)
        assert scores[b] == pytest.approx(expect, rel=1e-5)


def test_int8_device_expansion_matches_host_assembly():
    """scoring_tensors' int8-only device path (ship H8, expand the f32
    representation on device — solver/score.py _expand_f32) must be
    bitwise identical to the host f32 assembly, tensors and scores."""
    import jax

    prog = _egfr_prog()
    st_dev = scoring_tensors(prog)  # int8-exact: device expansion path
    assert st_dev.use_int8
    st_host = jax.device_put(scoring_tensors(prog, device=False))
    for name in ("H", "lb", "ub", "x_ub", "H8", "lb_raw", "ub_raw", "w"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_dev, name)),
            np.asarray(getattr(st_host, name)),
            err_msg=name,
        )
    rng = np.random.default_rng(2)
    X = np.zeros((32, st_dev.H.shape[1]), dtype=np.float32)
    X[:, : prog.num_vars] = rng.integers(0, 3, size=(32, prog.num_vars))
    np.testing.assert_array_equal(
        np.asarray(score_batch_jit(st_dev, X)),
        np.asarray(score_batch_jit(st_host, X)),
    )


def test_pallas_scorer_matches_reference_impl():
    prog = _egfr_prog()
    st = scoring_tensors(prog)
    rng = np.random.default_rng(1)
    B = 512
    Vp = st.H.shape[1]
    X = np.zeros((B, Vp), dtype=np.float32)
    X[:, : prog.num_vars] = rng.integers(0, 2, size=(B, prog.num_vars))
    want = np.asarray(score_batch_jit(st, X))
    got = np.asarray(score_batch_pallas(st, X, block_b=256))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lp_lower_bound_egfr6():
    prog = _egfr_prog()
    lb = lp_lower_bound(prog)
    assert lb is not None
    assert lb <= 1.0 + 1e-9


def test_device_search_finds_exact_optimum_egfr6():
    prog = _egfr_prog()
    res_exact = solve_exact(prog)
    res_dev = solve_device(prog)
    assert res_dev.epsilon_sum == pytest.approx(res_exact.epsilon_sum)
    assert float(prog.hard_violation(res_dev.x.astype(float))) == 0.0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_search_matches_exact_random(seed):
    rng = np.random.default_rng(seed)
    prog = _random_prog(rng, n=rng.integers(4, 8))
    res_exact = solve_exact(prog)
    assert res_exact.status == "optimal"
    res_dev = solve_device(prog)
    assert float(prog.hard_violation(res_dev.x.astype(float))) == 0.0
    assert res_dev.epsilon_sum == pytest.approx(res_exact.epsilon_sum, abs=1e-6)


def _bnb_or_skip():
    from ambigram_tpu.native import bnb_available

    if not bnb_available():
        pytest.skip("native bnb_solver unavailable (no C++ toolchain)")


def test_native_bnb_egfr6_matches_exact():
    _bnb_or_skip()
    from ambigram_tpu.solver.native_bnb import solve_native

    prog = _egfr_prog()
    res = solve_native(prog)
    assert res is not None and res.status == "optimal"
    assert res.epsilon_sum == pytest.approx(1.0)
    assert float(prog.hard_violation(res.x.astype(float))) == 0.0


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_native_bnb_matches_exact_random(seed):
    _bnb_or_skip()
    from ambigram_tpu.solver.native_bnb import solve_native

    rng = np.random.default_rng(seed + 100)
    prog = _random_prog(rng, n=rng.integers(4, 8))
    res_exact = solve_exact(prog)
    assert res_exact.status == "optimal"
    res = solve_native(prog)
    assert res is not None and res.status == "optimal"
    assert res.epsilon_sum == pytest.approx(res_exact.epsilon_sum, abs=1e-6)
    assert float(prog.hard_violation(res.x.astype(float))) == 0.0


def test_native_bnb_warm_start_from_device_search():
    _bnb_or_skip()
    from ambigram_tpu.solver.native_bnb import solve_native

    prog = _egfr_prog()
    warm = solve_device(prog)
    res = solve_native(prog, warm=warm)
    assert res is not None and res.status == "optimal"
    assert res.epsilon_sum == pytest.approx(1.0)


def test_native_bnb_node_cap_reports_heuristic():
    _bnb_or_skip()
    from ambigram_tpu.solver.native_bnb import solve_native

    rng = np.random.default_rng(7)
    prog = _random_prog(rng, n=7)
    warm = solve_device(prog)
    res = solve_native(prog, warm=warm, node_cap=3)
    assert res is not None
    # warm incumbent is kept but the search was truncated
    assert res.status == "heuristic"
    assert res.epsilon_sum == pytest.approx(warm.epsilon_sum, abs=1e-6)
    # without any incumbent the truncated search is inconclusive, not infeasible
    res2 = solve_native(prog, node_cap=3)
    assert res2 is not None and res2.status == "error"


def test_int8_scoring_path_exact():
    """The int8 representation (doubled FBI rows + post-hinge weights)
    must equal the f64 reference objective exactly for in-range
    candidates."""
    prog = _egfr_prog()
    st = scoring_tensors(prog)
    assert st.int8_ok  # all row entries are small integers after doubling
    assert st.use_int8  # EGFR CN sums fit the int8 candidate box
    rng = np.random.default_rng(5)
    B = 32
    Vp = st.H.shape[1]
    X = np.zeros((B, Vp), dtype=np.float32)
    X[:, : prog.num_vars] = rng.integers(0, 6, size=(B, prog.num_vars))
    got = np.asarray(score_batch_jit(st, X))
    from ambigram_tpu.solver.score import PENALTY

    xf = X[:, : prog.num_vars].astype(np.float64)
    want = prog.residual_objective(xf) + PENALTY * prog.hard_violation(xf)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_greedy_peel_seed_decomposes_profile():
    """On a noiseless loop-decomposable profile the peel seed must fit
    the segment CNs exactly (zero segment residual)."""
    from ambigram_tpu.solver.search import greedy_peel_seed

    n = 10
    T = n * (n + 1) // 2
    from ambigram_tpu.engine.enumerate import pair_index

    truth = np.zeros(2 * T)
    for (i, j), cnt in [((1, 10), 2), ((2, 6), 1), ((4, 10), 3)]:
        truth[T + pair_index(1, n, i, j)] = cnt
    seg = np.zeros(n)
    for (i, j), cnt in [((1, 10), 2), ((2, 6), 1), ((4, 10), 3)]:
        seg[i - 1 : j] += 2 * cnt
    prog = build_bfb_program(1, n, seg, np.zeros(n), seg.sum(), 1)
    x = greedy_peel_seed(prog)
    seg_res = np.abs(x.astype(np.float64) @ prog.A_seg.T - prog.c_seg).sum()
    assert seg_res == 0.0
    assert (x >= 0).all() and (x <= prog.x_ub).all()


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_sweep_delta_matches_sweep(seed):
    """The incremental delta sweep must reproduce the materializing
    sweep exactly: same move scores, same applied moves, same hx."""
    import jax.numpy as jnp

    from ambigram_tpu.solver.search import _seed_population, _sweep, _sweep_delta

    rng = np.random.default_rng(seed)
    prog = _random_prog(rng, int(rng.integers(5, 12)))
    st = scoring_tensors(prog)
    X = jnp.asarray(
        _seed_population(prog, st.H.shape[1], np.asarray(st.x_ub), pop=8, seed=seed)
    )
    hx = jnp.matmul(X, st.H.T, preferred_element_type=jnp.float32)
    from ambigram_tpu.solver.search import _score_from_hx

    scores = _score_from_hx(st, hx)
    # walk several sweeps, checking lockstep agreement
    Xa, sa = X, scores
    Xb, hxb, sb = X, hx, scores
    for _ in range(4):
        Xa, sa, imp_a = _sweep(st, Xa, sa)
        Xb, hxb, sb, imp_b = _sweep_delta(st, Xb, hxb, sb)
        assert bool(imp_a) == bool(imp_b)
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
        np.testing.assert_array_equal(np.asarray(Xa), np.asarray(Xb))
        np.testing.assert_array_equal(
            np.asarray(hxb), np.asarray(jnp.matmul(Xb, st.H.T))
        )
        if not bool(imp_a):
            break


def test_chained_pallas_matches_xla_loop():
    """The fused benchmark kernel must compute the same chain as the
    XLA fori_loop (small iters, small values => exact f32 sums)."""
    import jax
    import jax.numpy as jnp

    from ambigram_tpu.solver.score import (
        chained_mutate,
        chained_score_pallas,
        score_batch,
    )

    rng = np.random.default_rng(2)
    prog = _random_prog(rng, 10)
    prog.x_ub = np.minimum(prog.x_ub, 127)
    st = scoring_tensors(prog)
    assert st.use_int8
    B, Vp = 256, st.H.shape[1]
    X = np.zeros((B, Vp), dtype=np.float32)
    X[:, : prog.num_vars] = rng.integers(0, 2, size=(B, prog.num_vars))
    Xj = jnp.asarray(X)
    iters = 5

    def chained(st, X0):
        def body(i, carry):
            X, acc = carry
            s = score_batch(st, X)
            X = chained_mutate(X, s, i, st.x_ub)
            return X, acc + jnp.sum(s)

        _, acc = jax.lax.fori_loop(0, iters, body, (X0, jnp.float32(0)))
        return acc

    ref = float(jax.jit(chained)(st, Xj))
    got = float(chained_score_pallas(st, Xj, iters, block_b=128))
    # per-candidate scores are exact small integers, so the chains are
    # identical; the final checksum exceeds 2^24 and its f32 value
    # depends on accumulation order (per-block vs whole-batch)
    assert got == pytest.approx(ref, rel=1e-6)
    # row tiling is a pure reassociation of the same integer chain
    # (tile sums are exact): every layout must agree
    n_tiles = 2
    assert st.H8.shape[0] % (128 * n_tiles) == 0
    tiled = float(
        chained_score_pallas(st, Xj, iters, block_b=128, n_row_tiles=n_tiles)
    )
    assert tiled == pytest.approx(ref, rel=1e-6)


def test_auto_midsize_never_compiles_device(tmp_path, monkeypatch):
    """Time-to-solution guard: programs at or under
    AUTO_EXACT_FIRST_MAX_VARS close in the in-process MILP without ever
    touching the device search (whose cold jit compile costs 20-60s
    through the TPU remote-compile helper). pe16 has V=272."""
    from ambigram_tpu.engine import pipeline
    from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case

    monkeypatch.chdir(tmp_path)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("device search must not run for mid-size programs")

    import ambigram_tpu.solver.search as search

    monkeypatch.setattr(search, "solve_device", boom)
    case = simulate_bfb_case(seed=16, n_segments=16)
    paths = write_case(case, "pe16")
    res = pipeline.run_bfb(paths["lh"], solver="auto")
    assert res.path_strings
    from ambigram_tpu.scripts.evaluate import multiplicity_diff

    assert multiplicity_diff(case.truth_string, res.path_strings[0]) == 0
