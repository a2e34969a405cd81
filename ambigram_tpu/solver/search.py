"""Device-resident search over candidate BFB structures.

Population steepest-descent over the +-1 move neighborhood, scored by
the batched matmul scorer (ambigram_tpu.solver.score). Each sweep
evaluates every single-variable move of every population member —
tens of thousands of candidate structures per step, all on the MXU —
which is the TPU-shaped replacement for cbc's branch and bound on this
problem family.

Optimality certification: the integer optimum is lower-bounded by the
LP relaxation (continuous x). When the search result meets the LP
bound it is provably optimal ("optimal" status); otherwise the result
is returned as "heuristic" and the pipeline's auto mode falls back to
the exact solver (ambigram_tpu.solver.exact).

A full device branch-and-bound with PDHG dual bounds is the planned
follow-up; this module's search is already the throughput path the
BASELINE metric measures.

Known quality frontier (measured): at S>=48 the +-1 move set plateaus
well above the LP bound (eps 47.5 vs LP 6 on the synthetic S=48 case)
— single-variable moves cannot swap a large loop for two smaller ones
in one step. For scale, that still beats the exact MILP, which finds
NO feasible point in 240s at that size, but paired same-endpoint moves
(+1/-1 on loops sharing a boundary, chunk-enumerated like _sweep) are
the next structural improvement.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ambigram_tpu.engine.ilp import BfbProgram
from ambigram_tpu.solver.exact import SolveResult
from ambigram_tpu.solver.score import ScoringTensors, score_batch, scoring_tensors


@functools.partial(jax.jit, static_argnames=("chunk",))
def _sweep(st: ScoringTensors, X: jnp.ndarray, scores: jnp.ndarray, chunk: int = 128):
    """One steepest-descent sweep: for each population member, find the
    best single +-1 move across all variables and apply it if it
    improves. Returns (X', scores', improved_any)."""
    B, Vp = X.shape
    n_chunks = Vp // chunk
    var_ids = jnp.arange(Vp).reshape(n_chunks, chunk)

    def chunk_step(carry, var_block):
        best_score, best_var, best_sign = carry
        # delta rows for this chunk: [2*chunk, Vp]
        eye = jax.nn.one_hot(var_block, Vp, dtype=X.dtype)  # [chunk, Vp]
        deltas = jnp.concatenate([eye, -eye], axis=0)  # [2*chunk, Vp]
        cand = X[:, None, :] + deltas[None, :, :]  # [B, 2C, Vp]
        cand = jnp.clip(cand, 0.0, st.x_ub)
        s = score_batch(st, cand.reshape(B * 2 * chunk, Vp)).reshape(B, 2 * chunk)
        idx = jnp.argmin(s, axis=1)  # [B]
        val = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
        var = var_block[idx % chunk]
        sign = jnp.where(idx < chunk, 1.0, -1.0)
        better = val < best_score
        return (
            jnp.where(better, val, best_score),
            jnp.where(better, var, best_var),
            jnp.where(better, sign, best_sign),
        ), None

    init = (scores, jnp.zeros(B, dtype=jnp.int32), jnp.zeros(B))
    (best_score, best_var, best_sign), _ = jax.lax.scan(chunk_step, init, var_ids)
    improved = best_score < scores - 1e-6
    delta = jax.nn.one_hot(best_var, Vp, dtype=X.dtype) * best_sign[:, None]
    X_new = jnp.clip(X + delta, 0.0, st.x_ub)
    X_out = jnp.where(improved[:, None], X_new, X)
    s_out = jnp.where(improved, best_score, scores)
    return X_out, s_out, jnp.any(improved)


def _descend_loop(st: ScoringTensors, X, scores, max_sweeps: int, chunk: int):
    def cond(state):
        _, _, improved, it = state
        return jnp.logical_and(improved, it < max_sweeps)

    def body(state):
        X, scores, _, it = state
        X2, s2, imp = _sweep(st, X, scores, chunk=chunk)
        return X2, s2, imp, it + 1

    X, scores, _, _ = jax.lax.while_loop(
        cond, body, (X, scores, jnp.bool_(True), jnp.int32(0))
    )
    return X, scores


@functools.partial(jax.jit, static_argnames=("max_sweeps", "chunk", "rounds"))
def _search(
    st: ScoringTensors,
    X: jnp.ndarray,
    key: jnp.ndarray,
    rounds: int = 6,
    max_sweeps: int = 256,
    chunk: int = 128,
):
    """Basin hopping: steepest descent to a local optimum, then restart
    every member from the global best with random +-1/+-2 kicks."""
    B, Vp = X.shape
    scores = score_batch(st, X)

    def round_body(i, state):
        X, scores, best_x, best_s, key = state
        X, scores = _descend_loop(st, X, scores, max_sweeps, chunk)
        # fold the round's best into the global best
        idx = jnp.argmin(scores)
        round_best = scores[idx]
        take = round_best < best_s
        best_x = jnp.where(take, X[idx], best_x)
        best_s = jnp.where(take, round_best, best_s)
        # kick: half the population restarts from the global best
        # (exploitation), the other half from its OWN local minimum
        # (diversity — a strong early basin must not trap everyone);
        # member 0 stays exactly at the global best
        key, k1, k2 = jax.random.split(key, 3)
        n_kicks = 4
        vars_ = jax.random.randint(k1, (B, n_kicks), 0, Vp)
        signs = jax.random.choice(
            k2, jnp.array([-2.0, -1.0, 1.0, 2.0]), shape=(B, n_kicks)
        )
        kick = jnp.zeros((B, Vp), X.dtype)
        kick = jax.vmap(
            lambda k, v, s: k.at[v].add(s), in_axes=(0, 0, 0)
        )(kick, vars_, signs)
        kick = kick.at[0].set(0.0)
        from_best = (jnp.arange(B) % 2 == 0)[:, None]
        base = jnp.where(from_best, best_x[None, :], X)
        X = jnp.clip(base + kick, 0.0, st.x_ub)
        scores = score_batch(st, X)
        return X, scores, best_x, best_s, key

    best_x = X[0]
    best_s = scores[0]
    X, scores, best_x, best_s, _ = jax.lax.fori_loop(
        0, rounds, round_body, (X, scores, best_x, best_s, key)
    )
    # final descent from the best point
    Xf, sf = _descend_loop(st, best_x[None, :], best_s[None], max_sweeps, chunk)
    return Xf[0], sf[0]


def _seed_population(prog: BfbProgram, st: ScoringTensors, pop: int, seed: int) -> jnp.ndarray:
    Vp = st.H.shape[1]
    T = len(prog.pairs)
    X = np.zeros((pop, Vp), dtype=np.float32)
    rng = np.random.default_rng(seed)
    # member 0: all-zero (pure constructive descent)
    # member 1: the reference pattern p(start, end) = 1
    if pop > 1:
        X[1, _pair_idx(prog, prog.start, prog.end)] = 1
    # member 2: the top loop l(start, end) = 1
    if pop > 2:
        X[2, T + _pair_idx(prog, prog.start, prog.end)] = 1
    # rest: sparse random loop starts
    for b in range(3, pop):
        k = rng.integers(1, 4)
        idx = rng.integers(0, T, size=k)
        X[b, T + idx] = rng.integers(1, 3, size=k)
    ub = np.asarray(st.x_ub)
    return jnp.asarray(np.minimum(X, ub))


def _pair_idx(prog: BfbProgram, i: int, j: int) -> int:
    from ambigram_tpu.engine.enumerate import pair_index

    return pair_index(prog.start, prog.end, i, j)


def greedy_peel_seed(prog: BfbProgram) -> np.ndarray:
    """Water-level decomposition of the CN profile into loops and
    patterns — the natural constructive BFB start. Repeatedly take the
    longest run of residual CN >= 2 and subtract a loop (each loop adds
    2 per covered segment), then cover remaining runs of 1 with
    patterns. Ignores the nesting constraints (descent repairs those);
    lands near the optimum when the profile is loop-decomposable, which
    is exactly the BFB model."""
    n = prog.n
    T = len(prog.pairs)
    c = prog.c_seg.astype(np.float64).copy()
    x = np.zeros(prog.num_vars, dtype=np.float32)

    def longest_run(mask: np.ndarray):
        best = (0, -1, -1)  # (len, i, j)
        i = 0
        while i < n:
            if mask[i]:
                j = i
                while j + 1 < n and mask[j + 1]:
                    j += 1
                if j - i + 1 > best[0]:
                    best = (j - i + 1, i, j)
                i = j + 1
            else:
                i += 1
        return best

    for _ in range(4 * n):  # bounded; each step strictly reduces sum(c)
        ln, i, j = longest_run(c >= 2.0)
        if ln == 0:
            break
        amount = max(1.0, float(np.floor(c[i : j + 1].min() / 2.0)))
        t = T + _pair_idx(prog, prog.start + i, prog.start + j)
        amount = min(amount, float(prog.x_ub[t]) - float(x[t]))
        if amount < 1.0:
            break
        x[t] += amount
        c[i : j + 1] -= 2.0 * amount
    for _ in range(2 * n):
        ln, i, j = longest_run(c >= 1.0)
        if ln == 0:
            break
        t = _pair_idx(prog, prog.start + i, prog.start + j)
        if x[t] >= prog.x_ub[t]:
            c[i : j + 1] -= 1.0  # can't cover again; stop revisiting
            continue
        x[t] += 1.0
        c[i : j + 1] -= 1.0
    return x


def half_ceil(x: float, eps: float = 1e-6) -> float:
    """Round a bound up to the next multiple of 0.5 — every achievable
    epsilon sum is a half-integer (coefficients are in {0.5, 1, 2})."""
    import math

    return math.ceil((x - eps) * 2.0) / 2.0


def lp_relaxation(prog: BfbProgram):
    """Solve the LP relaxation; returns (bound, x_fractional) or
    (None, None)."""
    res = _lp_solve(prog)
    if res is None or not res.success:
        return None, None
    return float(res.fun), res.x[: prog.num_vars]


def lp_lower_bound(prog: BfbProgram) -> Optional[float]:
    bound, _ = lp_relaxation(prog)
    return bound


def _lp_solve(prog: BfbProgram):
    """LP-relaxation lower bound on the integer epsilon sum (host-side,
    tiny). None if scipy is unavailable or the LP fails."""
    try:
        from scipy.optimize import linprog
    except Exception:  # pragma: no cover
        return None
    V = prog.num_vars
    A_res = np.concatenate([prog.A_seg, prog.A_fbi], axis=0)
    c_res = np.concatenate([prog.c_seg, prog.c_fbi])
    E = A_res.shape[0]
    N = V + E
    c = np.zeros(N)
    c[V:] = 1.0
    A_ub = []
    b_ub = []
    for i in range(E):
        row = np.zeros(N)
        row[:V] = -A_res[i]
        row[V + i] = -1.0
        A_ub.append(row)
        b_ub.append(-c_res[i])
        row2 = np.zeros(N)
        row2[:V] = A_res[i]
        row2[V + i] = -1.0
        A_ub.append(row2)
        b_ub.append(c_res[i])
    for r in range(prog.G.shape[0]):
        if np.isfinite(prog.g_ub[r]):
            row = np.zeros(N)
            row[:V] = prog.G[r]
            A_ub.append(row)
            b_ub.append(prog.g_ub[r])
        if np.isfinite(prog.g_lb[r]):
            row = np.zeros(N)
            row[:V] = -prog.G[r]
            A_ub.append(row)
            b_ub.append(-prog.g_lb[r])
    bounds = [(0, ub) for ub in prog.x_ub] + [(0, None)] * E
    res = linprog(c, A_ub=np.array(A_ub), b_ub=np.array(b_ub), bounds=bounds, method="highs")
    return res


def solve_device(
    prog: BfbProgram,
    pop: int = 32,
    seed: int = 0,
    rounds: int = 6,
    max_sweeps: int = 256,
    certify: bool = True,
) -> SolveResult:
    st = scoring_tensors(prog)
    X0 = np.array(_seed_population(prog, st, pop, seed))  # writable copy
    Vp = st.H.shape[1]

    def place(slot: int, member: np.ndarray) -> None:
        xi = np.zeros(Vp, dtype=np.float32)
        xi[: prog.num_vars] = np.clip(member, 0, prog.x_ub)
        X0[slot] = xi

    # constructive seed: greedy loop/pattern peel of the CN profile
    if pop > 3:
        place(3, greedy_peel_seed(prog))
    # LP-rounding seeds: the relaxation is cheap on host and its
    # roundings cluster around the integer optimum
    lb, x_frac = lp_relaxation(prog)
    if x_frac is not None and pop > 5:
        place(4, np.round(x_frac))
        place(5, np.floor(x_frac))
        # a few randomized roundings populate the LP basin; the rest of
        # the population stays random for basin diversity
        rr = np.random.default_rng(seed + 1)
        frac = x_frac - np.floor(x_frac)
        for slot in range(6, min(pop, 10)):
            place(slot, np.floor(x_frac) + (rr.random(len(x_frac)) < frac))
    key = jax.random.PRNGKey(seed)
    best_x, _ = _search(st, jnp.asarray(X0), key, rounds=rounds, max_sweeps=max_sweeps)
    x = np.asarray(best_x)[: prog.num_vars]
    x_int = np.round(x).astype(np.int64)
    eps_sum = float(prog.residual_objective(x_int.astype(np.float64)))
    violation = float(prog.hard_violation(x_int.astype(np.float64)))
    status = "heuristic"
    if violation == 0.0 and certify:
        # the integer optimum is a half-integer >= the LP bound
        if lb is not None and eps_sum <= half_ceil(lb) + 1e-6:
            status = "optimal"
    elif violation > 0:
        status = "error"
    return SolveResult(
        x=x_int,
        epsilon_sum=eps_sum,
        objective=eps_sum - prog.bias,
        status=status,
    )
