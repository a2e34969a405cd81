"""Pathological wide-DAG stress for --all / --reversed
(VERDICT r1 item 10; reference semantics LGM.cpp:3380-3409 order
enumeration, :3672-3685 --all printing, :3691-3695 reverse retry).

Width mechanism: pattern and loop nodes whose spans share no endpoint
are incomparable in the DAG, so their families interleave — the order
count is binomial in the family sizes. Structures that wide are mostly
NOT replayable (the splice rules anchor on shared endpoints), which is
exactly the pathological case: getBFB scans EVERY order forward, then
every order again in reverse orientation, before giving up. The lazy
enumerator keeps that double scan O(width) in memory, the native
replayer keeps it fast, and AMBIGRAM_MAX_ORDERS bounds it outright.
"""

import io
import itertools
import time

import numpy as np
import pytest

from ambigram_tpu.engine.dag import (
    all_topological_orders,
    construct_dag,
    iter_topological_orders,
)
from ambigram_tpu.engine.enumerate import enumerate_pairs, pair_index, sorted_key_order
from ambigram_tpu.engine.path import get_bfb, replay_bfb
from ambigram_tpu.model.genome import Genome


def _build(n, loops, pats, top_pattern=True):
    g = Genome()
    for i in range(1, n + 1):
        g.add_segment(i, 0, "w", i * 1000, i * 1000 + 999, 30.0, 1.0, 1.0)
    pairs = enumerate_pairs(1, n)
    T = len(pairs)
    cn = np.zeros(2 * T, dtype=np.int64)
    if top_pattern:
        cn[pair_index(1, n, 1, n)] = 1
    for a, b in pats:
        cn[pair_index(1, n, a, b)] = 1
    for a, b in loops:
        cn[T + pair_index(1, n, a, b)] = 1
    entries = sorted_key_order(pairs)
    adj, n2p, n2l = construct_dag(entries, cn)
    return g, adj, n2p, n2l


def _wide(n=20, fam=7):
    """p(1,n) + two incomparable families: loops l(2, even j) and
    patterns p(1, odd j) — C(2*fam, fam) topological orders."""
    loops = [(2, n - 2 * i) for i in range(fam)]
    pats = [(1, n - 1 - 2 * i) for i in range(fam)]
    return _build(n, loops, pats)


def _deep_chain(n=30):
    """An EGFR-style nested loop chain at depth ~n/2 — replayable,
    larger node count."""
    loops = []
    a, b = 2, n
    side = 0
    while b - a >= 2:
        loops.append((a, b))
        if side == 0:
            b -= 2
        else:
            a += 2
        side ^= 1
    return _build(n, loops, [])


def test_lazy_enumerator_matches_materialized():
    _, adj, _, _ = _wide(fam=3)
    lazy = list(iter_topological_orders(adj))
    full = all_topological_orders(adj)
    assert lazy == full
    assert all_topological_orders(adj, max_orders=7) == full[:7]


def test_wide_dag_is_actually_wide():
    _, adj, _, _ = _wide(fam=7)
    cnt = sum(1 for _ in itertools.islice(iter_topological_orders(adj), 5000))
    assert cnt >= 3000  # C(14,7) = 3432 interleavings


def test_full_double_scan_bounded_on_wide_dag(monkeypatch):
    """No order replays -> the engine scans all ~3432 orders forward
    AND reversed (reference giving-up semantics) in bounded memory and
    time; native and Python agree on the empty result."""
    g, adj, n2p, n2l = _wide(fam=7)
    t0 = time.perf_counter()
    native = replay_bfb(g, adj, n2p, n2l, {})
    t_native = time.perf_counter() - t0
    assert native == []
    assert t_native < 30.0

    import ambigram_tpu.native as native_mod

    monkeypatch.setattr(
        native_mod, "native_bfb_replay", lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    )
    t0 = time.perf_counter()
    python = replay_bfb(g, adj, n2p, n2l, {})
    assert python == []
    assert time.perf_counter() - t0 < 60.0


def test_order_cap_bounds_pathological_scan(monkeypatch):
    """AMBIGRAM_MAX_ORDERS caps each pass on inputs too wide to scan.

    Fixture note: fam=7 (C(14,7)=3432 orders, ACYCLIC) — wider fam
    configurations of _wide turn cyclic (the shared-parent edge rule is
    not span-monotone), and a cyclic graph exercises the Kahn fast-fail
    instead of the order cap this test is about."""
    g, adj, n2p, n2l = _wide(fam=7)
    import ambigram_tpu.native as native_mod

    monkeypatch.setattr(
        native_mod, "native_bfb_replay", lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    )
    monkeypatch.setenv("AMBIGRAM_MAX_ORDERS", "100")
    t0 = time.perf_counter()
    path = replay_bfb(g, adj, n2p, n2l, {})
    assert path == []
    assert time.perf_counter() - t0 < 10.0


def test_print_all_on_wide_dag_prints_nothing_and_terminates(monkeypatch):
    g, adj, n2p, n2l = _wide(fam=7)
    monkeypatch.setenv("AMBIGRAM_MAX_ORDERS", "500")
    out = io.StringIO()
    path = replay_bfb(g, adj, n2p, n2l, {}, print_all=True, out=out)
    assert path == [] and out.getvalue() == ""


def test_deep_chain_replays_at_larger_node_count():
    g, adj, n2p, n2l = _deep_chain(n=30)
    assert len(adj) >= 14
    fwd = replay_bfb(g, adj, n2p, n2l, {})
    assert fwd and fwd[0].dir == "+"
    # this chain has no negative-strand seeding, so --reversed falls
    # back to the forward orientation via the reverse-retry quirk
    # (LGM.cpp:3691-3695) and must return the same path
    rev = replay_bfb(g, adj, n2p, n2l, {}, is_reversed=True)
    assert [v.info() for v in rev] == [v.info() for v in fwd]


def test_print_all_deep_chain_matches_list_engine():
    """Regression pin: lazy --all output == the materializing engine."""
    g, adj, n2p, n2l = _deep_chain(n=16)
    out_lazy = io.StringIO()
    replay_bfb(g, adj, n2p, n2l, {}, print_all=True, out=out_lazy)
    orders = [o for o in all_topological_orders(adj) if o]
    out_list = io.StringIO()
    get_bfb(g, orders, n2p, n2l, {}, print_all=True, out=out_list)
    assert out_lazy.getvalue() == out_list.getvalue()
    assert out_lazy.getvalue()  # at least one printed path


def test_cyclic_graph_returns_no_path_fast():
    """The shared-parent edge rule (LGM.cpp:3353-3361) is not
    span-monotone, so some solved CN vectors yield a CYCLIC graph.
    Zero topological orders exist, so the only correct outcome is
    "no path" — and it must arrive in milliseconds, not after the
    factorial dead-end scan the reference would perform (observed: a
    noisy S=32 heuristic incumbent burnt 30+ CPU-minutes pre-guard).
    Both engines (native C and the Python fallback) are guarded."""
    g = Genome()
    for i in range(1, 7):
        g.add_segment(i, 0, "w", i * 1000, i * 1000 + 999, 30.0, 1.0, 1.0)
    # hand-built 3-cycle plus a free root: Kahn consumes only node 0
    adj = [[1], [2], [3], [1]]
    n2p = [[1, 6, 1], [], [1, 3, 1], []]
    n2l = [[], [2, 5, 1], [], [3, 4, 1]]
    t0 = time.perf_counter()
    path = replay_bfb(g, adj, n2p, n2l, {})
    assert path == []
    assert time.perf_counter() - t0 < 5.0
    # native engine agrees (when a toolchain is present)
    from ambigram_tpu.native import native_bfb_replay

    steps = native_bfb_replay(adj, n2p, n2l, {})
    assert steps in (None, [])


def test_enumeration_work_budget_bounds_dead_end_scan(monkeypatch, capsys):
    """Even without a cycle, a graph whose orders all fail to replay
    must stay inside the work budget: AMBIGRAM_MAX_REPLAYS bounds the
    native scan (count + derived splice-work), so the call returns
    empty instead of grinding through the factorial tail — AND warns
    on stderr that the 'no path' is budget-bounded, not proven (the
    reference enumerates unboundedly, so a silent bounded miss would
    be an invisible behavior divergence).

    Fixture note: fam=7 (C(14,7)=3432 orders, ACYCLIC, none of which
    replay). The previous n=24/fam=9 fixture is actually CYCLIC, so it
    exercised the Kahn fast-fail (a PROVEN no-path: budget untouched,
    no warning) rather than the budget path this test is about."""
    g, adj, n2p, n2l = _wide(fam=7)
    from ambigram_tpu.native import native_bfb_replay

    t0 = time.perf_counter()
    steps = native_bfb_replay(adj, n2p, n2l, {}, max_replays=50)
    assert steps in (None, [])
    assert time.perf_counter() - t0 < 5.0
    if steps is not None:  # native lib present: the bounded miss warns
        err = capsys.readouterr().err
        assert "budget exhausted" in err and "not proven" in err


def test_cyclic_optimum_replays_via_direct_splice(tmp_path):
    """Regression for the batch bench's no-path tail (VERDICT r4 #4,
    bench seed 208): every vertex of this noisy case's optimal face is
    CYCLIC under the reference's shared-parent DAG rule, so the
    reference-shaped replay proves zero topological orders and the
    reference itself would print nothing (LGM.cpp:261). The direct
    span-ordered splice fallback (engine.path.direct_splice_replay)
    must replay the SAME solution — identical epsilon, no quality
    trade."""
    import os

    import numpy as np

    from ambigram_tpu.engine.dag import construct_dag, find_cycle
    from ambigram_tpu.engine.enumerate import sorted_key_order
    from ambigram_tpu.engine.pipeline import extract_programs, run_bfb
    from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case
    from ambigram_tpu.solver.exact import solve_exact

    case = simulate_bfb_case(
        seed=208, n_segments=32, rounds=5, mode="process", noise=0.05
    )
    paths = write_case(case, str(tmp_path / "b208"))
    prog = extract_programs(paths["lh"])[0]
    sol = solve_exact(prog, time_limit=15.0)
    assert sol.status in ("optimal", "heuristic")
    # precondition: the reference rule yields a cyclic graph here
    entries = sorted_key_order(prog.pairs)
    adj, n2p, n2l = construct_dag(entries, sol.x)
    assert find_cycle(adj), "fixture drifted: solution graph now acyclic"
    res = run_bfb(paths["lh"], solver="exact", presolved=[sol])
    assert res.path_strings and res.path_strings[0], "no path produced"
    # the accepted solution is the original one — epsilon unchanged
    assert abs(res.ilp_error - sol.objective) < 1e-6
