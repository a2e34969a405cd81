"""Unit tests for the replay-retry stack (VERDICT r4 #4): epsilon-face
solves with combinatorial cuts, the restricted cut repair, and the
direct span-ordered splice replay."""

import numpy as np
import pytest

from ambigram_tpu.engine.ilp import build_bfb_program
from ambigram_tpu.solver.exact import solve_exact, solve_on_face


def _small_prog():
    seg = np.array([2.0, 4.0, 4.0, 2.0])
    fbi = np.array([0.0, 2.0, 0.0, 2.0])
    return build_bfb_program(1, 4, seg, fbi, 12, 0)


def test_solve_on_face_finds_equal_objective_vertex():
    prog = _small_prog()
    base = solve_exact(prog)
    assert base.status == "optimal"
    alt, reason = solve_on_face(
        prog, base.epsilon_sum, np.ones(prog.num_vars), time_limit=10.0
    )
    assert reason == "ok" and alt is not None
    assert alt.epsilon_sum <= base.epsilon_sum + 1e-6
    assert float(prog.hard_violation(alt.x.astype(np.float64))) == 0.0


def test_solve_on_face_cut_excludes_support():
    """A cut over the optimum's full support forces a DIFFERENT
    solution (or a proven-empty face) — the cut must actually bind."""
    prog = _small_prog()
    base = solve_exact(prog)
    support = [int(v) for v in np.flatnonzero(base.x)]
    assert support
    alt, reason = solve_on_face(
        prog,
        base.epsilon_sum,
        np.zeros(prog.num_vars),
        time_limit=10.0,
        forbidden_sets=[support],
    )
    if reason == "ok":
        assert alt is not None
        on = np.flatnonzero(alt.x)
        assert not set(support) <= set(int(v) for v in on), (
            "cut set fully positive despite the cut"
        )
    else:
        assert reason == "infeasible"


def test_cut_repair_produces_feasible_point_off_the_cut():
    from ambigram_tpu.solver.lns import cut_repair

    prog = _small_prog()
    base = solve_exact(prog)
    support = [int(v) for v in np.flatnonzero(base.x)]
    x_rep = cut_repair(prog, base.x, [support], time_limit=10.0)
    if x_rep is not None:  # None = proven stuck within this neighborhood
        assert float(prog.hard_violation(x_rep.astype(np.float64))) == 0.0
        on = set(int(v) for v in np.flatnonzero(x_rep))
        assert not set(support) <= on


def test_direct_splice_replay_recovers_truth(tmp_path):
    """On a noise-free nested case, the direct span-ordered replay of
    the exact solution reproduces the simulated truth multiplicities —
    same validity as a DAG-ordered replay."""
    from ambigram_tpu.engine.junccn import get_junc_cn
    from ambigram_tpu.engine.path import direct_splice_replay, format_bfb
    from ambigram_tpu.engine.pipeline import extract_programs
    from ambigram_tpu.model.genome import Genome
    from ambigram_tpu.scripts.evaluate import multiplicity_diff
    from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case

    case = simulate_bfb_case(seed=7, n_segments=10, mode="nested")
    paths = write_case(case, str(tmp_path / "d"))
    prog = extract_programs(paths["lh"])[0]
    sol = solve_exact(prog)
    assert sol.status == "optimal"
    g = Genome.from_lh(paths["lh"])
    g.calculate_hap_depth()
    g.calculate_copy_num()
    inv, _ = get_junc_cn(g, g.sources[0].id, g.sinks[0].id)
    path = direct_splice_replay(g, prog.pairs, sol.x, inv)
    assert path, "direct splice failed on a clean nested case"
    assert multiplicity_diff(case.truth_string, format_bfb(path)) == 0
