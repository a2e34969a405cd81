"""Batched candidate scoring — the hot kernel of the engine.

A candidate BFB structure is an integer vector x = [patterns | loops].
Its score is the ILP objective the reference ships to cbc
(LGM.cpp:4397-4752), with epsilons eliminated analytically:

    score(x) = sum |A x - c|  +  PENALTY * violation(G x, g_lb, g_ub)

Since |r - c| = max(r - c, 0) + max(c - r, 0), a residual row is just a
hard row with lb = ub = c, so the whole program unifies into one
matrix H = [A; PENALTY*G] with bounds and score = sum of two hinges —
a single MXU matmul plus a fused elementwise reduction. That is the
speed-of-light inner loop the BASELINE metric (candidate structures
scored/sec/chip) measures.

Arrays are padded to lane/sublane multiples so XLA tiles them onto the
MXU without relayout. All arithmetic is f32: values are small integers
(|products| << 2^24) so f32 accumulation is exact.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ambigram_tpu.engine.ilp import BfbProgram

PENALTY = 1024.0  # dominates any achievable residual for in-range programs
_BIG = 3.0e38  # finite stand-in for +-inf bounds


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class ScoringTensors:
    """Padded device-ready tensors for one fitting program.

    H  [Rows, Vp]  unified rows: residual rows of A (lb = ub = c) then
                   hard rows of G prescaled by PENALTY
    lb [Rows], ub [Rows]  row bounds (prescaled for the G rows)
    x_ub [Vp]      variable upper bounds (0 on padding lanes)
    """

    H: jnp.ndarray
    lb: jnp.ndarray
    ub: jnp.ndarray
    x_ub: jnp.ndarray
    num_vars: int
    num_residual_rows: int

    def tree_flatten(self):
        return (
            (self.H, self.lb, self.ub, self.x_ub),
            (self.num_vars, self.num_residual_rows),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_vars=aux[0], num_residual_rows=aux[1])


def scoring_tensors(
    prog: BfbProgram,
    pad_vars: Optional[int] = None,
    pad_rows: Optional[int] = None,
) -> ScoringTensors:
    V = prog.num_vars
    Vp = pad_vars if pad_vars is not None else _round_up(max(V, 128), 128)
    A_np = np.concatenate([prog.A_seg, prog.A_fbi], axis=0)
    c_np = np.concatenate([prog.c_seg, prog.c_fbi], axis=0)
    R = A_np.shape[0]
    M = prog.G.shape[0]
    rows = R + M
    # bucketing so instances of similar size share one compiled search
    # program; 256 keeps MXU tiling while wasting at most ~7% of rows
    # on mid-size programs (512 cost ~12% on the S=32 benchmark shape)
    Rp = pad_rows if pad_rows is not None else _round_up(max(rows, 256), 256)
    H = np.zeros((Rp, Vp), dtype=np.float32)
    lb = np.full(Rp, -_BIG, dtype=np.float32)
    ub = np.full(Rp, _BIG, dtype=np.float32)
    H[:R, :V] = A_np
    lb[:R] = c_np
    ub[:R] = c_np
    if M:
        H[R : R + M, :V] = PENALTY * prog.G
        lb[R : R + M] = np.maximum(PENALTY * prog.g_lb, -_BIG)
        ub[R : R + M] = np.minimum(PENALTY * prog.g_ub, _BIG)
    x_ub = np.zeros(Vp, dtype=np.float32)
    x_ub[:V] = prog.x_ub
    return ScoringTensors(
        H=jnp.asarray(H),
        lb=jnp.asarray(lb),
        ub=jnp.asarray(ub),
        x_ub=jnp.asarray(x_ub),
        num_vars=V,
        num_residual_rows=R,
    )


def score_batch(st: ScoringTensors, x: jnp.ndarray) -> jnp.ndarray:
    """Score candidates. x: [..., Vp] float32 (integer-valued).
    Returns residual + PENALTY * violation, shape [...]."""
    hx = jnp.matmul(x, st.H.T, preferred_element_type=jnp.float32)
    over = jnp.maximum(hx - st.ub, 0.0)
    under = jnp.maximum(st.lb - hx, 0.0)
    return jnp.sum(over, axis=-1) + jnp.sum(under, axis=-1)


score_batch_jit = jax.jit(score_batch)


def residual_only(st: ScoringTensors, x: jnp.ndarray) -> jnp.ndarray:
    """Epsilon sum alone (no violation penalty)."""
    R = st.num_residual_rows
    hx = jnp.matmul(x, st.H[:R].T, preferred_element_type=jnp.float32)
    return jnp.sum(jnp.abs(hx - st.ub[:R]), axis=-1)


# ----------------------------------------------------------------- pallas

def _score_kernel(h_ref, lb_ref, ub_ref, x_ref, out_ref):
    """Grid (i, j): candidate tile i vs row tile j. The [block_b,
    block_r] product stays in VMEM; out accumulates over j."""
    from jax.experimental import pallas as pl

    jj = pl.program_id(1)

    @pl.when(jj == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    hx = jax.lax.dot_general(
        x_ref[...],
        h_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    over = jnp.maximum(hx - ub_ref[...], 0.0)
    under = jnp.maximum(lb_ref[...] - hx, 0.0)
    out_ref[...] += jnp.sum(over, axis=-1, keepdims=True) + jnp.sum(
        under, axis=-1, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("block_b", "block_r"))
def score_batch_pallas(
    st: ScoringTensors, x: jnp.ndarray, block_b: int = 512, block_r: int = 512
) -> jnp.ndarray:
    """Pallas-fused scorer. x: [B, Vp], B divisible by block_b, rows
    divisible by block_r. Returns [B] scores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Vp = x.shape
    Rows = st.H.shape[0]
    block_b = min(block_b, B)
    block_r = min(block_r, Rows)
    grid = (B // block_b, Rows // block_r)
    lb2 = st.lb.reshape(1, Rows)
    ub2 = st.ub.reshape(1, Rows)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, Vp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Vp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(st.H, lb2, ub2, x)
    return out[:, 0]
