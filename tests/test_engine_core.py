import os

import numpy as np
import pytest

from ambigram_tpu.engine.enumerate import (
    enumerate_pairs,
    pair_count,
    pair_index,
    sorted_key_order,
    variable_keys,
)
from ambigram_tpu.engine.dag import (
    all_topological_orders,
    compare_loops,
    construct_dag,
    libstdcxx_sort,
)
from ambigram_tpu.engine.ilp import build_bfb_program
from ambigram_tpu.engine.junccn import fbi_bias, get_junc_cn
from ambigram_tpu.engine.props import parse_bfb_props
from ambigram_tpu.model.genome import Genome

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_enumerate_pairs_order():
    pairs = enumerate_pairs(1, 3)
    assert pairs.tolist() == [[1, 1], [1, 2], [1, 3], [2, 2], [2, 3], [3, 3]]
    assert pair_count(1, 3) == 6
    for t, (i, j) in enumerate(pairs.tolist()):
        assert pair_index(1, 3, i, j) == t


def test_sorted_key_order_lexicographic():
    pairs = enumerate_pairs(9, 11)
    entries = sorted_key_order(pairs)
    keys = [k for k, _ in entries]
    # std::map string order: "l:10,10" < "l:10,11" < "l:9,10" ... and l < p
    assert keys[0].startswith("l:")
    assert keys == sorted(keys)
    assert keys.index("l:10,10") < keys.index("l:9,9")
    assert all(k.startswith("l:") for k in keys[: len(pairs)])


def test_libstdcxx_sort_quirk():
    # loops blocked by empty placeholders: [l2, [], l5] -> rotate moves
    # l5 to the front past the empty
    a = [[1, 3], [], [1, 6]]
    libstdcxx_sort(a, compare_loops)
    assert a == [[1, 6], [1, 3], []]
    b = [[], [1, 6], [1, 3]]
    libstdcxx_sort(b, compare_loops)
    assert b == [[], [1, 6], [1, 3]]  # empty at front blocks everything


def test_junc_cn_egfr6():
    g = Genome.from_lh(os.path.join(DATA, "egfr6.lh"))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    inversions, junc_cn = get_junc_cn(g, 1, 6)
    assert sorted(inversions.keys()) == [2, 3, 4, 6]
    assert junc_cn[2, 1] == 2.0
    assert junc_cn[3, 1] == 1.0
    assert junc_cn[4, 1] == 2.0
    assert junc_cn[6, 1] == 2.0
    assert junc_cn[:, 0].sum() == 0.0
    assert fbi_bias(inversions, junc_cn, 1, 6) == 1


def test_junc_cn_small_rounding():
    from ambigram_tpu.io.lh import parse_lh_text

    text = (
        "SOURCE 1\nSINK 3\n"
        "SEG H:1:chr1:1:100 30 2\nSEG H:2:chr1:101:200 30 2\nSEG H:3:chr1:201:300 30 2\n"
        "JUNC H:2:- H:2:+ 30 0.7 U B\n"
        "JUNC H:1:+ H:2:+ 30 0.6 U B\n"
    )
    g = Genome.from_records(parse_lh_text(text))
    inversions, junc_cn = get_junc_cn(g, 1, 3)
    assert junc_cn[2, 1] == 1.0  # 0.7 rounds up to 1
    assert junc_cn[1, 0] == 1.0  # normal junction CN also rounds


def test_props_grammar(tmp_path):
    p = tmp_path / "a.lh"
    p.write_text("PROP I1:chr8:virus:chr8 M:chr8\n")
    props = parse_bfb_props(str(p))
    assert props.ins_mode == 1
    assert props.ins_chr == ["chr8", "virus", "chr8"]
    assert props.main_chr == "chr8"

    p.write_text("PROP I2:chr2:chr6:chr13 M:chr2 S:3\n")
    props = parse_bfb_props(str(p))
    assert props.ins_mode == 2
    assert props.ins_chr == ["chr2", "chr6", "chr13"]
    assert props.start_segs == [3]

    p.write_text("PROP C1:chr1:260T-HBV_C3-RC\n")
    props = parse_bfb_props(str(p))
    assert props.con_mode == 1
    assert props.con_chr == ["chr1", "260T-HBV_C3-RC"]

    props = parse_bfb_props(str(tmp_path / "missing.lh"))
    assert props.ins_mode == 0 and props.con_mode == 0


def test_program_shapes_and_residual():
    g = Genome.from_lh(os.path.join(DATA, "egfr6.lh"))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    inversions, junc_cn = get_junc_cn(g, 1, 6)
    seg_cn = np.array([s.weight.copy_num for s in g.segments])
    prog = build_bfb_program(1, 6, seg_cn, junc_cn[1:7, 1], seg_cn.sum(), 1)
    T = 21
    assert len(prog.pairs) == T
    assert prog.A_seg.shape == (6, 2 * T)
    # hand-checked optimum: l(1,6)=l(2,6)=l(2,4)=l(3,4)=1, objective 1-1=0
    x = np.zeros(2 * T)
    for (i, j) in [(1, 6), (2, 6), (2, 4), (3, 4)]:
        x[T + pair_index(1, 6, i, j)] = 1
    assert prog.residual_objective(x) == pytest.approx(1.0)
    assert prog.hard_violation(x) == pytest.approx(0.0)
    # p(1,6) + loops instead: residuals jump
    x2 = x.copy()
    x2[T + pair_index(1, 6, 1, 6)] = 0
    x2[pair_index(1, 6, 1, 6)] = 1
    assert prog.residual_objective(x2) > 1.0


def test_dag_and_orders_egfr6():
    # nodes in map order: l:1,6  l:2,4  l:2,6  l:3,4 (all loops)
    element = {"l:1,6": 1, "l:2,4": 1, "l:2,6": 1, "l:3,4": 1}
    pairs = enumerate_pairs(1, 6)
    keys = variable_keys(pairs)
    element_cn = [element.get(k, 0) for k in keys]
    entries = sorted_key_order(pairs)
    adj, node2pat, node2loop = construct_dag(entries, element_cn)
    assert len(adj) == 4
    # after the libstdc++ sort: spans 5,2,4,1 -> [5,4,2,1]
    assert [l[:2] for l in node2loop] == [[1, 6], [2, 6], [2, 4], [3, 4]]
    assert adj == [[1], [2], [3], []]
    orders = all_topological_orders(adj)
    assert orders == [[0, 1, 2, 3]]


def test_vectorized_program_builder_matches_loop_builder():
    """The COO-assembled builder must be bit-identical (values, bounds,
    row order) to the straight-loop reference implementation."""
    import numpy as np

    from ambigram_tpu.engine.ilp import _build_bfb_program_loops, build_bfb_program

    rng = np.random.default_rng(3)
    for trial in range(6):
        n = int(rng.integers(1, 11))
        start = int(rng.integers(1, 6))
        end = start + n - 1
        seg = rng.integers(0, 9, size=n).astype(float)
        fbi = rng.integers(0, 4, size=n).astype(float)
        comps, ji = None, False
        if trial % 2 == 0 and n >= 3:
            comps = [[start, start + 1], [start + 1, end], [start, end]]
            ji = True
        p1 = _build_bfb_program_loops(start, end, seg, fbi, seg.sum() + 1, 1, comps, ji)
        p2 = build_bfb_program(start, end, seg, fbi, seg.sum() + 1, 1, comps, ji)
        assert np.array_equal(p1.A_seg, p2.A_seg)
        assert np.array_equal(p1.A_fbi, p2.A_fbi)
        assert np.array_equal(p1.G, p2.G)
        assert np.array_equal(p1.g_lb, p2.g_lb)
        assert np.array_equal(p1.g_ub, p2.g_ub)
        assert np.array_equal(p1.x_ub, p2.x_ub)
