"""Exact integer solver for the BFB fitting program.

Replaces the reference's out-of-process `cbc` invocation
(localhap.cpp:179-220) with an in-process exact mixed-integer solve.
The formulation mirrors BFB_ILP's variable layout
[patterns | loops | epsilons] so solutions are directly comparable:

    minimize  sum(e)            (the reported objective subtracts bias)
    s.t.      A x + e >= c ,  A x - e <= c      per residual row
              g_lb <= G x <= g_ub
              x integer in [0, x_ub], e >= 0

Primary engine: scipy's HiGHS MILP (in-process). The JAX device
solver (ambigram_tpu.solver.search) is the performance path; this
module is the exactness anchor and the arbiter in tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ambigram_tpu.engine.ilp import BfbProgram

try:
    from scipy.optimize import Bounds, LinearConstraint, milp

    _HAVE_MILP = True
except Exception:  # pragma: no cover
    _HAVE_MILP = False


@dataclass
class SolveResult:
    x: np.ndarray  # [2T] integer variable values (elementCN)
    epsilon_sum: float  # sum of absolute residuals
    objective: float  # epsilon_sum - bias (what cbc reports as objective value)
    status: str  # "optimal" | "infeasible" | "error"

    @property
    def element_cn(self) -> np.ndarray:
        return self.x


def have_exact_solver() -> bool:
    return _HAVE_MILP


def solve_exact(prog: BfbProgram, time_limit: Optional[float] = None) -> SolveResult:
    if not _HAVE_MILP:  # pragma: no cover
        raise RuntimeError("scipy HiGHS MILP unavailable")
    V = prog.num_vars
    A_res = np.concatenate([prog.A_seg, prog.A_fbi], axis=0)
    c_res = np.concatenate([prog.c_seg, prog.c_fbi])
    E = A_res.shape[0]  # one epsilon per residual row
    N = V + E

    # objective: minimize sum of epsilons
    c = np.zeros(N)
    c[V:] = 1.0

    rows = []
    lbs = []
    ubs = []

    for i in range(E):
        row = np.zeros(N)
        row[:V] = A_res[i]
        row[V + i] = 1.0
        rows.append(row)
        lbs.append(c_res[i])
        ubs.append(np.inf)
        row2 = np.zeros(N)
        row2[:V] = A_res[i]
        row2[V + i] = -1.0
        rows.append(row2)
        lbs.append(-np.inf)
        ubs.append(c_res[i])
    for r in range(prog.G.shape[0]):
        row = np.zeros(N)
        row[:V] = prog.G[r]
        rows.append(row)
        lbs.append(prog.g_lb[r])
        ubs.append(prog.g_ub[r])

    A_full = np.array(rows)
    constraints = LinearConstraint(A_full, np.array(lbs), np.array(ubs))
    integrality = np.zeros(N)
    integrality[:V] = 1
    lb = np.zeros(N)
    ub = np.concatenate([prog.x_ub, np.full(E, np.inf)])
    bounds = Bounds(lb, ub)
    options = {}
    if time_limit is not None:
        options["time_limit"] = time_limit
    res = milp(
        c=c,
        constraints=constraints,
        integrality=integrality,
        bounds=bounds,
        options=options,
    )
    if res.status != 0 or res.x is None:
        if res.status == 1 and res.x is not None:
            # time/iteration limit with an integer-feasible incumbent:
            # return it as heuristic instead of discarding it — but only
            # if the rounded point actually satisfies the hard rows
            # (HiGHS may surface a fractional relaxation point here)
            x = np.round(res.x[:V]).astype(np.int64)
            if float(prog.hard_violation(x.astype(np.float64))) == 0.0:
                eps_sum = float(prog.residual_objective(x.astype(np.float64)))
                return SolveResult(
                    x=x,
                    epsilon_sum=eps_sum,
                    objective=eps_sum - prog.bias,
                    status="heuristic",
                )
            return SolveResult(
                x=np.zeros(V, dtype=np.int64),
                epsilon_sum=0.0,
                objective=0.0,
                status="error",
            )
        status = "infeasible" if res.status == 2 else "error"
        return SolveResult(
            x=np.zeros(V, dtype=np.int64),
            epsilon_sum=0.0,
            objective=0.0,
            status=status,
        )
    x = np.round(res.x[:V]).astype(np.int64)
    eps_sum = float(prog.residual_objective(x.astype(np.float64)))
    return SolveResult(
        x=x,
        epsilon_sum=eps_sum,
        objective=eps_sum - prog.bias,
        status="optimal",
    )
