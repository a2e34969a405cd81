"""The BFB copy-number fitting program as dense constraint tensors.

Parity target: LocalGenomicMap::BFB_ILP
(/root/reference/src/LocalGenomicMap.cpp:4397-4752).

The reference builds a COIN-OR matrix with variables
[patterns | loops | 2 epsilons per segment | bias] and ships it to the
external `cbc` binary. Each epsilon appears in exactly one +/- row
pair, so its optimal value given the integer variables x is exactly
|c - a.x| — the program is really a least-absolute-deviations integer
program over x alone:

    minimize  sum_i |A_seg[i] . x - c_seg[i]| + sum_i |A_fbi[i] . x - c_fbi[i]|
              - bias
    s.t.      g_lb <= G x <= g_ub          (hard combinatorial rows)
              0 <= p_t <= 1,  0 <= l_t <= max_cn,  x integer

This module emits those tensors. The residual evaluation is a pair of
matmuls, which is what the TPU scoring kernel
(ambigram_tpu/solver/score.py) batches over thousands of candidates.

Variable order matches the reference's `variableIdx`: pattern t
(enumeration order of `enumerate_pairs`) is variable t, loop t is
variable T + t.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ambigram_tpu.engine.enumerate import enumerate_pairs, pair_index


@dataclass
class BfbProgram:
    start: int  # first segment id of the chromosome interval
    end: int  # last segment id
    pairs: np.ndarray  # [T, 2] (i, j) pairs, enumeration order
    A_seg: np.ndarray  # [n, 2T] float64: segment-CN residual rows
    c_seg: np.ndarray  # [n]
    A_fbi: np.ndarray  # [n, 2T] float64: FBI-CN residual rows
    c_fbi: np.ndarray  # [n]
    G: np.ndarray  # [m, 2T] float64: hard constraint rows
    g_lb: np.ndarray  # [m]
    g_ub: np.ndarray  # [m]
    x_ub: np.ndarray  # [2T] variable upper bounds (p: 1, l: max_cn)
    bias: int

    @property
    def n(self) -> int:
        return self.end - self.start + 1

    @property
    def num_vars(self) -> int:
        # column count of the residual rows — for a single-graph program
        # this is 2 * len(pairs); the single-cell block program has
        # num_graphs * 2 * len(pairs) columns (engine/sc.py)
        return self.A_seg.shape[1]

    def residual_objective(self, x: np.ndarray) -> np.ndarray:
        """Sum of absolute residuals (the epsilon sum), before -bias.
        Accepts [..., 2T] batches."""
        seg_res = np.abs(x @ self.A_seg.T - self.c_seg)
        fbi_res = np.abs(x @ self.A_fbi.T - self.c_fbi)
        return seg_res.sum(axis=-1) + fbi_res.sum(axis=-1)

    def hard_violation(self, x: np.ndarray) -> np.ndarray:
        """Total constraint violation; 0 means feasible."""
        gx = x @ self.G.T
        return np.maximum(gx - self.g_ub, 0).sum(axis=-1) + np.maximum(
            self.g_lb - gx, 0
        ).sum(axis=-1)


def build_bfb_program(
    start: int,
    end: int,
    seg_cn: np.ndarray,
    fbi_cn: np.ndarray,
    max_cn: float,
    bias: int,
    components: Optional[List[List[int]]] = None,
    juncs_info: bool = False,
) -> BfbProgram:
    """Build the fitting program for segment interval [start, end].

    seg_cn[k] is the CN of segment (start + k); fbi_cn likewise (the
    juncCN[i][1] column). max_cn is the loop upper bound — the
    reference uses the CN sum over *all* graph segments, not just this
    interval (LGM.cpp:4708-4711).
    """
    pairs = enumerate_pairs(start, end)
    T = len(pairs)
    n = end - start + 1
    V = 2 * T
    i_arr = pairs[:, 0]
    j_arr = pairs[:, 1]
    span = np.abs(i_arr - j_arr)

    def pidx(a: int, b: int) -> int:
        return pair_index(start, end, a, b)

    def lidx(a: int, b: int) -> int:
        return T + pair_index(start, end, a, b)

    # ---- segment-CN rows: sum p + 2 sum l over pairs covering segment s
    #      (LGM.cpp:4423-4451)
    seg_ids = np.arange(start, end + 1)
    covers = (i_arr[None, :] <= seg_ids[:, None]) & (seg_ids[:, None] <= j_arr[None, :])
    A_seg = np.zeros((n, V), dtype=np.float64)
    A_seg[:, :T] = covers.astype(np.float64)
    A_seg[:, T:] = 2.0 * covers.astype(np.float64)
    c_seg = np.asarray(seg_cn, dtype=np.float64).copy()

    # ---- FBI-CN rows (LGM.cpp:4453-4494):
    # loops with endpoint s contribute 1 (+= semantics);
    # patterns participating in any nested same-endpoint pair get 0.5.
    A_fbi = np.zeros((n, V), dtype=np.float64)
    endpoint = (i_arr[None, :] == seg_ids[:, None]) | (j_arr[None, :] == seg_ids[:, None])
    A_fbi[:, T:] = endpoint.astype(np.float64)
    # pattern pairs: for segment s, pattern t gets coefficient 0.5 if
    # there exists another pattern u with the same start (== s) or the
    # same end (== s) and a strictly different span (either parent or
    # child in such a pair gets marked).
    for s_idx, s in enumerate(seg_ids):
        share_start = np.where(i_arr == s)[0]
        share_end = np.where(j_arr == s)[0]
        for grp in (share_start, share_end):
            if len(grp) < 2:
                continue
            spans = span[grp]
            # pattern j in a (parent, child) ordered pair with |span_j| > |span_k|
            marked = np.zeros(len(grp), dtype=bool)
            for a in range(len(grp)):
                for b in range(len(grp)):
                    if spans[a] > spans[b]:
                        marked[a] = True
                        marked[b] = True
            A_fbi[s_idx, grp[marked]] = 0.5
    c_fbi = np.asarray(fbi_cn, dtype=np.float64).copy()

    # ---- hard constraint rows
    G_rows: List[np.ndarray] = []
    g_lb: List[float] = []
    g_ub: List[float] = []
    INF = np.inf

    def add_row(row: np.ndarray, lb: float, ub: float) -> None:
        G_rows.append(row)
        g_lb.append(lb)
        g_ub.append(ub)

    # pattern hierarchy (LGM.cpp:4543-4583):
    # sum(parent patterns) - p >= 0 ; p + sum(child patterns) <= 2
    for t in range(T):
        a, b = int(i_arr[t]), int(j_arr[t])
        row8 = np.zeros(V)
        row9 = np.zeros(V)
        flag1 = flag2 = False
        for j in range(start, a):
            flag1 = True
            row8[pidx(j, b)] += 1
        for j in range(b + 1, end + 1):
            flag1 = True
            row8[pidx(a, j)] += 1
        for j in range(a, b):
            flag2 = True
            row9[pidx(a, j)] += 1
        for j in range(a + 1, b + 1):
            flag2 = True
            row9[pidx(j, b)] += 1
        if flag1:
            row8[pidx(a, b)] -= 1
            add_row(row8, 0, INF)
        if flag2:
            row9[pidx(a, b)] += 1
            add_row(row9, 0, 2)

    # loop parent (LGM.cpp:4585-4612): sum(p_parent) + sum(l_parent) - l >= 0
    for t in range(T):
        a, b = int(i_arr[t]), int(j_arr[t])
        row = np.zeros(V)
        flag = False
        for j in range(start, a):
            flag = True
            row[pidx(j, b)] += 1
            row[lidx(j, b)] += 1
        for j in range(b + 1, end + 1):
            flag = True
            row[pidx(a, j)] += 1
            row[lidx(a, j)] += 1
        if flag:
            row[lidx(a, b)] -= 1
            add_row(row, 0, INF)

    # loop children (LGM.cpp:4614-4646):
    # l + sum(child loops) <= 2 ; p + sum(child loops) <= 2
    for t in range(T):
        a, b = int(i_arr[t]), int(j_arr[t])
        row10 = np.zeros(V)
        flag = False
        for j in range(a, b):
            flag = True
            row10[lidx(a, j)] += 1
        for j in range(a + 1, b + 1):
            flag = True
            row10[lidx(j, b)] += 1
        if flag:
            row11 = row10.copy()
            row10[lidx(a, b)] += 1
            add_row(row10, 0, 2)
            row11[pidx(a, b)] += 1
            add_row(row11, 0, 2)

    # pattern-loop nesting (LGM.cpp:4648-4681):
    # p + sum l(a, j<b) + sum p(j>a, b) <= 2 ; p + sum p(a, j<b) + sum l(j>a, b) <= 2
    for t in range(T):
        a, b = int(i_arr[t]), int(j_arr[t])
        row10 = np.zeros(V)
        row11 = np.zeros(V)
        flag = False
        for j in range(a, b):
            flag = True
            row10[lidx(a, j)] += 1
            row11[pidx(a, j)] += 1
        for j in range(a + 1, b + 1):
            flag = True
            row10[pidx(j, b)] += 1
            row11[lidx(j, b)] += 1
        if flag:
            row10[pidx(a, b)] += 1
            add_row(row10, 0, 2)
            row11[pidx(a, b)] += 1
            add_row(row11, 0, 2)

    # third-generation evidence (LGM.cpp:4684-4703): one row,
    # sum over unique component spans of (l + p) <= 5
    if components and juncs_info:
        row = np.zeros(V)
        seen = set()
        nonempty = False
        for comp in components:
            s = min(comp[0], comp[-1])
            e = max(comp[0], comp[-1])
            if s == start and e == end:
                continue
            key = (s, e)
            if key in seen:
                continue
            seen.add(key)
            row[lidx(s, e)] += 1
            row[pidx(s, e)] += 1
            nonempty = True
        # the reference appends this row even when every component was
        # skipped (LGM.cpp:4699-4702)
        del nonempty
        add_row(row, 0, 5)

    G = np.array(G_rows, dtype=np.float64) if G_rows else np.zeros((0, V))
    x_ub = np.concatenate(
        [np.ones(T, dtype=np.float64), np.full(T, float(max_cn), dtype=np.float64)]
    )
    return BfbProgram(
        start=start,
        end=end,
        pairs=pairs,
        A_seg=A_seg,
        c_seg=c_seg,
        A_fbi=A_fbi,
        c_fbi=c_fbi,
        G=G,
        g_lb=np.array(g_lb, dtype=np.float64),
        g_ub=np.array(g_ub, dtype=np.float64),
        x_ub=x_ub,
        bias=bias,
    )
