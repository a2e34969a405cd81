"""Differential tests: native C++ replay vs the Python implementation."""

import numpy as np
import pytest

from ambigram_tpu.engine.dag import all_topological_orders, construct_dag
from ambigram_tpu.engine.enumerate import enumerate_pairs, pair_index, sorted_key_order
from ambigram_tpu.engine.path import get_bfb
from ambigram_tpu.model.genome import Genome
from ambigram_tpu.native import native_bfb_replay, replay_available

pytestmark = pytest.mark.skipif(
    not replay_available(), reason="native toolchain unavailable"
)


def _genome(n):
    g = Genome()
    for i in range(1, n + 1):
        g.add_segment(i, 0, "chr1", i * 1000, i * 1000 + 999, 30.0, 1.0, 2.0)
    return g


def _python_path(g, element, start, end, inversions=None, is_reversed=False):
    pairs = enumerate_pairs(start, end)
    from ambigram_tpu.engine.enumerate import variable_keys

    keys = variable_keys(pairs)
    element_cn = [element.get(k, 0) for k in keys]
    entries = sorted_key_order(pairs)
    adj, node2pat, node2loop = construct_dag(entries, element_cn)
    orders = [o for o in all_topological_orders(adj) if o]
    inv_juncs = {}
    if inversions:
        for seg, (s, t) in inversions.items():
            inv_juncs[seg] = g.add_junction(s, "+", t, "-", 30, 1, 1, False, True, False)
    path = get_bfb(g, orders, node2pat, node2loop, inv_juncs, is_reversed, False)
    native = native_bfb_replay(
        adj,
        node2pat,
        node2loop,
        inversions or {},
        is_reversed=is_reversed,
    )
    return [(v.id, 1 if v.dir == "+" else -1) for v in path], native


def test_native_matches_python_egfr_chain():
    g = _genome(6)
    element = {"l:1,6": 1, "l:2,6": 1, "l:2,4": 1, "l:3,4": 1}
    py, nat = _python_path(g, element, 1, 6)
    assert nat == py
    assert len(py) == 32


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python_random_chains(seed):
    from ambigram_tpu.scripts.simulate import random_nested_chain

    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 10))
    g = _genome(n)
    chain = random_nested_chain(rng, n)
    element = {"l:%d,%d" % (a, b): 1 for a, b in chain}
    py, nat = _python_path(g, element, 1, n)
    assert nat == py


def test_native_reverse_orientation():
    g = _genome(6)
    element = {"l:1,6": 1, "l:2,6": 1}
    py, nat = _python_path(g, element, 1, 6, is_reversed=True)
    assert nat == py
    assert py[0][1] == -1  # starts on the negative strand


def test_native_empty_dag():
    nat = native_bfb_replay([], [], [], {})
    assert nat == []
