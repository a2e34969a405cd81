"""The weak-scaling proxy script (BASELINE 'scaling efficiency' line)
runs end-to-end in-process on the test mesh."""

import numpy as np

from ambigram_tpu.scripts.scaling_proxy import run_proxy
from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case


def test_run_proxy_mesh_sizes(tmp_path, monkeypatch):
    monkeypatch.setenv("AMBIGRAM_SHARD_POP", "4")
    monkeypatch.setenv("AMBIGRAM_SHARD_STEPS", "4")
    monkeypatch.setenv("AMBIGRAM_SHARD_ROUNDS", "1")
    for i in range(2):
        case = simulate_bfb_case(
            seed=500 + i, n_segments=10, rounds=3, mode="process", noise=0.0
        )
        write_case(case, str(tmp_path / ("sp%d" % i)))
    for mesh in (1, 2):
        leg = run_proxy(str(tmp_path), mesh)
        assert leg["mesh"] == mesh
        assert leg["n_programs"] == 2
        assert leg["seconds"] > 0
