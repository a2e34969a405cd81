"""LNS window polish (solver/lns.py): exact-window re-solves close the
device search's plateau gap on noisy profiles, repair infeasible
incumbents, and never make a point worse."""

import numpy as np
import pytest

from ambigram_tpu.engine.pipeline import extract_programs
from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case
from ambigram_tpu.solver.exact import solve_exact
from ambigram_tpu.solver.lns import lns_polish
from ambigram_tpu.solver.search import greedy_peel_seed, solve_device


def _noisy_program(seed, n, tmp_path, noise=0.08):
    case = simulate_bfb_case(
        seed=seed, n_segments=n, rounds=5, mode="process", noise=noise
    )
    paths = write_case(case, str(tmp_path / ("lns%d" % seed)))
    progs = extract_programs(paths["lh"])
    assert progs and progs[0] is not None
    return progs[0]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lns_reaches_exact_optimum_from_greedy_seed(seed, tmp_path):
    """From the greedy constructive seed (no device search at all), LNS
    windows alone must reach the exact MILP optimum on noisy S=24."""
    prog = _noisy_program(seed, 24, tmp_path)
    x0 = np.round(greedy_peel_seed(prog)).astype(np.int64)
    x, eps, vio = lns_polish(prog, x0, time_limit=5.0, max_passes=4)
    assert vio == 0.0
    ref = solve_exact(prog)
    assert ref.status == "optimal"
    assert eps == pytest.approx(ref.epsilon_sum, abs=1e-6)


def test_lns_never_worsens_and_repairs_violation(tmp_path):
    """An incumbent violating a hard nesting row is repaired (violation
    drops to 0) and epsilon does not regress past the start point."""
    prog = _noisy_program(5, 20, tmp_path)
    # deliberately break a hard row: max out every pattern's own value
    x0 = np.zeros(prog.num_vars, dtype=np.int64)
    T = len(prog.pairs)
    x0[:T] = 1  # all patterns on at once violates the hierarchy caps
    vio0 = float(prog.hard_violation(x0.astype(np.float64)))
    assert vio0 > 0
    x, eps, vio = lns_polish(prog, x0, time_limit=5.0, max_passes=4)
    assert vio == 0.0
    # repairing feasibility may raise the (meaningless) infeasible-start
    # epsilon; what matters is that the repaired point is exact-optimal
    ref = solve_exact(prog)
    assert eps == pytest.approx(ref.epsilon_sum, abs=1e-6)


def test_lns_solves_sc_block_program(tmp_path):
    """Single-cell block programs are polished too: masks replicate
    across clone blocks, coupling rows stay active. From zero, LNS must
    reach the exact joint optimum of a 2-clone program."""
    from ambigram_tpu.engine.sc import build_sc_program

    p1 = _noisy_program(7, 10, tmp_path)
    p2 = _noisy_program(8, 10, tmp_path)
    sc = build_sc_program([p1, p2], [[1], []])
    x0 = np.zeros(sc.num_vars, dtype=np.int64)
    x, eps, vio = lns_polish(sc, x0, time_limit=5.0, max_passes=4)
    assert vio == 0.0
    ref = solve_exact(sc)
    assert ref.status == "optimal"
    assert eps == pytest.approx(ref.epsilon_sum, abs=1e-6)


# The exact optimum of the seed=11/S=28/noise=0.08 program, computed
# once by solve_exact run to optimality (333 s of HiGHS — too slow to
# re-derive in-suite; the raw search plateaus at 39.908 on it, so the
# 4.27-epsilon gap below is closed entirely by the LNS endpoint pass).
# The simulation and program build are deterministic, so this value is
# a property of the bundled generator.
_S28_SEED11_OPTIMUM = 35.64290666666667


def test_eps_quantum_gates_bound_rounding(tmp_path):
    """Noise-free programs live on the 0.5 epsilon lattice, so the LP
    bound may be rounded up (sharper certificate). Noisy fractional
    targets are off-lattice: rounding would be unsound, so the
    certified bound must stay at the raw LP value."""
    from ambigram_tpu.solver.search import certified_bound, eps_quantum

    case = simulate_bfb_case(seed=2, n_segments=12, rounds=4, mode="process")
    paths = write_case(case, str(tmp_path / "clean"))
    clean = extract_programs(paths["lh"])[0]
    assert eps_quantum(clean) == 0.5
    assert certified_bound(clean, 3.2) == 3.5

    noisy = _noisy_program(1, 12, tmp_path)
    assert eps_quantum(noisy) == 0.0
    assert certified_bound(noisy, 3.2) == 3.2


def test_device_solver_sc_block_program(tmp_path, monkeypatch):
    """The device search on a single-cell block program: moves and
    seeds replicate per clone block, LNS handles the coupling rows —
    the joint solve must reach the exact optimum."""
    from ambigram_tpu.engine.sc import build_sc_program

    monkeypatch.setenv("AMBIGRAM_SEARCH_POP", "8")
    monkeypatch.setenv("AMBIGRAM_SEARCH_ROUNDS", "2")
    monkeypatch.setenv("AMBIGRAM_SEARCH_SWEEPS", "48")
    p1 = _noisy_program(3, 12, tmp_path, noise=0.05)
    p2 = _noisy_program(4, 12, tmp_path, noise=0.05)
    sc = build_sc_program([p1, p2], [[1], []])
    res = solve_device(sc)
    assert res.status in ("optimal", "heuristic")
    ref = solve_exact(sc)
    assert ref.status == "optimal"
    assert res.epsilon_sum == pytest.approx(ref.epsilon_sum, abs=1e-6)


def test_solve_device_polish_matches_exact_on_noisy(tmp_path, monkeypatch):
    """With a deliberately tiny search budget (which plateaus above the
    optimum), the polished device result still reaches the exact MILP
    optimum on a hard noisy S=28 case."""
    monkeypatch.setenv("AMBIGRAM_SEARCH_POP", "8")
    monkeypatch.setenv("AMBIGRAM_SEARCH_ROUNDS", "1")
    monkeypatch.setenv("AMBIGRAM_SEARCH_SWEEPS", "24")
    # the endpoint MILP on this instance needs ~26 s of HiGHS on an idle
    # core; the default 45 s budget gives it ~27 s — too tight under
    # suite load, so pin a generous budget (this test is about quality,
    # not the wall-clock default)
    monkeypatch.setenv("AMBIGRAM_LNS_BUDGET", "180")
    prog = _noisy_program(11, 28, tmp_path)
    import time as _time

    t0 = _time.perf_counter()
    res = solve_device(prog)
    elapsed = _time.perf_counter() - t0
    assert res.status in ("optimal", "heuristic")
    # the optimum is only guaranteed if the endpoint MILP ran to
    # completion within the budget; on a loaded host it may time out, in
    # which case the sound claim is "no worse than the raw-search
    # plateau" (39.908) — anything between proves LNS improved the point
    if elapsed < 170.0:
        assert res.epsilon_sum == pytest.approx(_S28_SEED11_OPTIMUM, abs=1e-6)
    else:  # pragma: no cover - loaded-host fallback
        assert res.epsilon_sum <= 39.908 + 1e-6
