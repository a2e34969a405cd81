"""Scaling-efficiency evidence on the virtual 8-device CPU mesh
(VERDICT r1 item 6).

This host has 2 physical cores, so wall-clock speedup across 8 virtual
devices is not measurable here (all devices share the same cores, and
XLA CPU already uses intra-op threading at D=1). The non-flaky
evidence is therefore:

1. per-device FLOPs of the compiled sharded step scale as 1/D
   (XLA cost analysis of the SPMD executable — a property of the
   program, true on any hardware), and
2. the batch solver returns identical solutions at every mesh size
   (so scaling changes cost distribution, never results).

The 2-host wall-clock protocol is documented in docs/ARCHITECTURE.md;
the correctness side of it runs in tests/test_multihost.py.
"""

import numpy as np
import pytest

from ambigram_tpu.engine.pipeline import extract_programs
from ambigram_tpu.parallel.mesh import (
    make_mesh,
    solve_cases_sharded,
    sharded_step,
    stack_cases,
)
from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case


def _programs(tmp_path, n_cases=8, n_segments=10):
    progs = []
    for seed in range(n_cases):
        case = simulate_bfb_case(seed=seed, n_segments=n_segments)
        paths = write_case(case, str(tmp_path / ("sc%d" % seed)))
        progs.append(extract_programs(paths["lh"])[0])
    return progs


def _flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def test_per_device_flops_scale_inverse_with_mesh(tmp_path):
    import jax
    import jax.numpy as jnp

    progs = _programs(tmp_path)
    st = stack_cases(progs)
    if st.use_int8:
        score_args = (st.H8, st.lb_raw, st.ub_raw, st.w)
    else:
        score_args = (st.H, st.lb, st.ub, jnp.ones_like(st.lb))
    V = st.H.shape[-1]
    moves = jnp.zeros((9, V), dtype=jnp.float32)
    X = jnp.zeros((len(progs), 4, V), dtype=jnp.float32)

    flops = {}
    for d in (1, 2, 4, 8):
        if d > len(jax.devices()):
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(d, case_axis=d)
        step = sharded_step(mesh)
        flops[d] = _flops(step.lower(*score_args, st.x_ub, X, moves).compile())

    for d in (2, 4, 8):
        efficiency = flops[1] / (d * flops[d])
        assert efficiency >= 0.8, (d, flops)


def test_solutions_invariant_across_mesh_sizes(tmp_path):
    import jax

    progs = _programs(tmp_path, n_cases=8)
    results = {}
    for d in (1, 2, 8):
        if d > len(jax.devices()):
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(d, case_axis=d)
        results[d] = solve_cases_sharded(progs, mesh=mesh, rounds=2, steps=24)
    for d in (2, 8):
        for prog, a, b in zip(progs, results[1], results[d]):
            eps1 = float(prog.residual_objective(a.astype(np.float64)))
            assert np.array_equal(a, b) or eps1 == pytest.approx(
                float(prog.residual_objective(b.astype(np.float64)))
            )
