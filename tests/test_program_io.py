"""LP/MPS emission roundtrip: the emitted artifact, fed back through
HiGHS, must reproduce the in-process solve (VERDICT r3 missing #2;
reference artifact at LGM.cpp:4749-4750)."""

import os

import numpy as np
import pytest

from ambigram_tpu.engine.ilp import build_bfb_program
from ambigram_tpu.engine.pipeline import extract_programs, run_bfb
from ambigram_tpu.io.program_io import read_lp, solve_lp_file, write_lp, write_mps
from ambigram_tpu.solver.exact import solve_exact


def _small_prog():
    # the EGFR-like 6-segment profile: nontrivial but instant to solve
    seg_cn = np.array([2.0, 6.0, 8.0, 10.0, 6.0, 4.0])
    fbi_cn = np.array([0.0, 2.0, 1.0, 2.0, 0.0, 1.0])
    return build_bfb_program(1, 6, seg_cn, fbi_cn, seg_cn.sum(), 2)


def test_lp_roundtrip_reproduces_in_process_objective(tmp_path):
    prog = _small_prog()
    fn = str(tmp_path / "case.lp")
    write_lp(prog, fn)
    obj, x = solve_lp_file(fn)
    res = solve_exact(prog)
    assert res.status == "optimal"
    # the LP file's objective is sum(eps) - bias == the reported objective
    assert obj == pytest.approx(res.objective, abs=1e-6)
    # integer variable values reconstruct a vector with the same epsilon
    names = [n for n in x if n.startswith(("p_", "l_"))]
    assert len(names) == prog.num_vars
    x_vec = np.zeros(prog.num_vars)
    from ambigram_tpu.io.program_io import _var_names

    for i, n in enumerate(_var_names(prog)):
        x_vec[i] = round(x[n])
    assert float(prog.hard_violation(x_vec)) == 0.0
    assert float(prog.residual_objective(x_vec)) == pytest.approx(
        res.epsilon_sum, abs=1e-6
    )


def test_lp_reader_parses_bounds_and_integrality(tmp_path):
    prog = _small_prog()
    fn = str(tmp_path / "case.lp")
    write_lp(prog, fn)
    m = read_lp(fn)
    V = prog.num_vars
    E = prog.A_seg.shape[0] + prog.A_fbi.shape[0]
    # vars: elements + epsilons + bias
    assert len(m["var_names"]) == V + E + 1
    assert int(m["integrality"].sum()) == V
    # bias is fixed by its bounds
    bi = m["var_names"].index("bias")
    assert m["x_lb"][bi] == m["x_ub"][bi] == prog.bias


def test_mps_emitted_alongside(tmp_path):
    prog = _small_prog()
    fn = str(tmp_path / "case.mps")
    write_mps(prog, fn)
    text = open(fn).read()
    for section in ("ROWS", "COLUMNS", "RHS", "BOUNDS", "ENDATA"):
        assert section in text
    assert "'INTORG'" in text and "'INTEND'" in text
    # every element variable appears as a column
    assert "p_1_6" in text and "l_1_6" in text


def test_pipeline_emit_lp_writes_artifacts(tmp_path, monkeypatch):
    lh = os.path.join(os.path.dirname(__file__), "data", "egfr6.lh")
    prefix = str(tmp_path / "egfr")
    run_bfb(lh, solver="exact", lp_prefix=prefix, emit_lp=True)
    assert os.path.exists(prefix + ".lp")
    assert os.path.exists(prefix + ".mps")
    # the emitted program is the case's own fitting program: solving the
    # artifact reproduces the pipeline's epsilon
    prog = extract_programs(lh)[0]
    obj, _ = solve_lp_file(prefix + ".lp")
    res = solve_exact(prog)
    assert obj == pytest.approx(res.objective, abs=1e-6)
