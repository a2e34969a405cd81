"""End-to-end golden tests against the reference's documented outputs."""

import io
import os

import pytest

from ambigram_tpu.engine.pipeline import run_bfb

DATA = os.path.join(os.path.dirname(__file__), "data")

# /root/reference/README.md:120-123 — expected console path for the
# 6-segment chr7/EGFR example
GOLDEN_EGFR6 = (
    "1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
)


def test_egfr6_golden_exact_solver():
    out = io.StringIO()
    result = run_bfb(os.path.join(DATA, "egfr6.lh"), solver="exact", out=out)
    assert len(result.paths) == 1
    assert result.path_strings[0] == GOLDEN_EGFR6
    assert out.getvalue().splitlines()[0] == GOLDEN_EGFR6
    assert result.ilp_error == pytest.approx(0.0)
    assert result.is_resolved
    assert result.num_inversions == 4


def test_trivial_no_fbi():
    import tempfile

    text = (
        "AVG_WHOLE_HOST_DP 30\nPURITY 1\nAVG_TUMOR_PLOIDY 2\n"
        "SOURCE 1\nSINK 3\n"
        "SEG H:1:chr1:1:100 30 2\nSEG H:2:chr1:101:200 30 2\nSEG H:3:chr1:201:300 30 2\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".lh", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        result = run_bfb(path, solver="exact")
        assert result.path_strings == ["1+2+3+"]
        assert result.chromosomes[0].trivial
    finally:
        os.unlink(path)


def test_heuristic_incumbent_used_for_path(tmp_path):
    """A feasible time-boxed incumbent (status 'heuristic') must still
    drive path reconstruction, flagged uncertified (ADVICE r1 medium:
    previously discarded as 'ILP is unsolvable')."""
    import numpy as np

    from ambigram_tpu.engine.pipeline import extract_programs
    from ambigram_tpu.solver.exact import SolveResult, solve_exact

    lh = os.path.join(DATA, "egfr6.lh")
    prog = extract_programs(lh)[0]
    opt = solve_exact(prog)
    heur = SolveResult(
        x=opt.x, epsilon_sum=opt.epsilon_sum, objective=opt.objective,
        status="heuristic",
    )
    result = run_bfb(lh, solver="exact", presolved=[heur])
    assert result.path_strings[0] == GOLDEN_EGFR6
    assert not result.chromosomes[0].certified
    assert not result.chromosomes[0].infeasible

    # an infeasible 'heuristic' vector must NOT be used: demoted to error
    bad = SolveResult(
        x=np.zeros_like(opt.x), epsilon_sum=0.0, objective=0.0,
        status="heuristic",
    )
    if float(prog.hard_violation(bad.x.astype(np.float64))) != 0.0:
        result2 = run_bfb(lh, solver="exact", presolved=[bad])
        assert result2.chromosomes[0].infeasible
