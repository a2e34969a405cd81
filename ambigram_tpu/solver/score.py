"""Batched candidate scoring — the hot kernel of the engine.

A candidate BFB structure is an integer vector x = [patterns | loops].
Its score is the ILP objective the reference ships to cbc
(LGM.cpp:4397-4752), with epsilons eliminated analytically:

    score(x) = sum |A x - c|  +  PENALTY * violation(G x, g_lb, g_ub)

Both terms are matmul-shaped, so scoring a batch X [B, V] is two
MXU matmuls plus a fused elementwise reduction — this is the
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class ScoringTensors:
    """Padded device-ready tensors for one fitting program."""

    A: jnp.ndarray  # [R, Vp] residual rows (seg rows then fbi rows), zero-padded
    c: jnp.ndarray  # [R]
    G: jnp.ndarray  # [M, Vp] hard rows, zero-padded
    g_lb: jnp.ndarray  # [M]
    g_ub: jnp.ndarray  # [M]
    x_ub: jnp.ndarray  # [Vp] (0 for padding lanes)
    num_vars: int  # true V before padding

    def tree_flatten(self):
        return (
            (self.A, self.c, self.G, self.g_lb, self.g_ub, self.x_ub),
            (self.num_vars,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_vars=aux[0])


def scoring_tensors(
    prog: BfbProgram, pad_vars: Optional[int] = None, pad_rows: Optional[int] = None
) -> ScoringTensors:
    V = prog.num_vars
    Vp = pad_vars if pad_vars is not None else _round_up(max(V, 128), 128)
    A_np = np.concatenate([prog.A_seg, prog.A_fbi], axis=0)
    c_np = np.concatenate([prog.c_seg, prog.c_fbi], axis=0)
    R = A_np.shape[0]
    # generous bucketing so instances of similar size share one
    # compiled search program
    Rp = pad_rows if pad_rows is not None else _round_up(max(R, 128), 128)
    A = np.zeros((Rp, Vp), dtype=np.float32)
    A[:R, :V] = A_np
    c = np.zeros(Rp, dtype=np.float32)
    c[:R] = c_np
    M = prog.G.shape[0]
    Mp = _round_up(max(M, 512), 512)
    G = np.zeros((Mp, Vp), dtype=np.float32)
    g_lb = np.full(Mp, -np.inf, dtype=np.float32)
    g_ub = np.full(Mp, np.inf, dtype=np.float32)
    if M:
        G[:M, :V] = prog.G
        g_lb[:M] = prog.g_lb
        g_ub[:M] = prog.g_ub
    x_ub = np.zeros(Vp, dtype=np.float32)
    x_ub[:V] = prog.x_ub
    return ScoringTensors(
        A=jnp.asarray(A),
        c=jnp.asarray(c),
        G=jnp.asarray(G),
        g_lb=jnp.asarray(g_lb),
        g_ub=jnp.asarray(g_ub),
        x_ub=jnp.asarray(x_ub),
        num_vars=V,
    )


def score_batch(st: ScoringTensors, x: jnp.ndarray) -> jnp.ndarray:
    """Score a batch of candidates. x: [..., Vp] float32 (integer-valued).
    Returns residual + PENALTY * violation, shape [...]."""
    r = jnp.matmul(x, st.A.T, preferred_element_type=jnp.float32) - st.c
    residual = jnp.sum(jnp.abs(r), axis=-1)
    gx = jnp.matmul(x, st.G.T, preferred_element_type=jnp.float32)
    over = jnp.maximum(gx - st.g_ub, 0.0)
    under = jnp.maximum(st.g_lb - gx, 0.0)
    # padded hard rows have lb=-inf/ub=+inf; inf - finite = inf, and
    # max(x - inf, 0) = 0, so padding contributes nothing
    violation = jnp.sum(over, axis=-1) + jnp.sum(under, axis=-1)
    return residual + PENALTY * violation


score_batch_jit = jax.jit(score_batch)


def residual_only(st: ScoringTensors, x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.matmul(x, st.A.T, preferred_element_type=jnp.float32) - st.c
    return jnp.sum(jnp.abs(r), axis=-1)


# ----------------------------------------------------------------- pallas

def _score_kernel(a_ref, c_ref, g_ref, glb_ref, gub_ref, x_ref, out_ref):
    """One (block_b, Vp) tile of candidates against the full A/G
    (resident in VMEM): fused matmul + abs-residual + hinge-violation
    reduction; the [block_b, R] intermediate never leaves VMEM."""
    x = x_ref[...]
    r = jax.lax.dot_general(
        x,
        a_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) - c_ref[...]
    residual = jnp.sum(jnp.abs(r), axis=-1, keepdims=True)
    gx = jax.lax.dot_general(
        x,
        g_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    over = jnp.maximum(gx - gub_ref[...], 0.0)
    under = jnp.maximum(glb_ref[...] - gx, 0.0)
    violation = jnp.sum(over, axis=-1, keepdims=True) + jnp.sum(
        under, axis=-1, keepdims=True
    )
    out_ref[...] = residual + PENALTY * violation


@functools.partial(jax.jit, static_argnames=("block_b",))
def score_batch_pallas(st: ScoringTensors, x: jnp.ndarray, block_b: int = 512) -> jnp.ndarray:
    """Pallas-fused scorer. x: [B, Vp] with B a multiple of block_b.
    Returns [B] scores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Vp = x.shape
    R = st.A.shape[0]
    M = st.G.shape[0]
    grid = (B // block_b,)
    # finite stand-ins for +-inf padding bounds keep VMEM math clean
    big = jnp.float32(3.0e38)
    g_lb = jnp.maximum(st.g_lb, -big).reshape(1, M)
    g_ub = jnp.minimum(st.g_ub, big).reshape(1, M)
    c2 = st.c.reshape(1, R)
    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(st.A, c2, st.G, g_lb, g_ub, x)
    return out[:, 0]
