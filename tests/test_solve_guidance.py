"""Hi-C / long-fragment guidance through the `solve` op CLI
(VERDICT r1 item 8; reference wiring at localhap.cpp:24-30,
LGM.cpp:2794-2851 traverseLongPath, :2620-2635 traverseWithHic)."""

import os

import numpy as np
import pytest

from ambigram_tpu.cli import main
from ambigram_tpu.scripts.simulate import all_junctions, legacy_lh_text, simulate_bfb_case

N = 16


@pytest.fixture()
def balanced_case(tmp_path):
    case = simulate_bfb_case(seed=5, n_segments=N, rounds=4, coverage=40.0, mode="process")
    lh = tmp_path / "mid.lh"
    lh.write_text(legacy_lh_text(case))
    balanced = tmp_path / "mid.balanced.lh"
    rc = main(
        ["--op", "check", "--in_lh", str(lh),
         "--lp_prefix", str(tmp_path / "t"), "--out_lh", str(balanced)]
    )
    assert rc == 0
    return case, balanced


def _frag_file(case, tmp_path, chunk=4):
    """Long-read fragments sampled from the truth path."""
    path = case.truth_path
    lines = []
    for k in range(0, len(path) - chunk, chunk // 2):
        frag = path[k : k + chunk]
        lines.append(" ".join("%d%s" % (s, d) for s, d in frag))
    f = tmp_path / "frags.txt"
    f.write_text("\n".join(lines[:12]) + "\n")
    return f, lines


def _hic_file(case, tmp_path):
    """Pairwise interaction counts from the truth path's junctions."""
    mat = np.zeros((N, N))
    for (s1, _d1, s2, _d2), cn in all_junctions(case.truth_path).items():
        mat[s1 - 1, s2 - 1] += cn
        mat[s2 - 1, s1 - 1] += cn
    f = tmp_path / "hic.txt"
    np.savetxt(f, mat, fmt="%g")
    return f


def test_solve_with_long_fragments(balanced_case, tmp_path):
    case, balanced = balanced_case
    frags, lines = _frag_file(case, tmp_path)
    hap = tmp_path / "h_frags.txt"
    rc = main(
        ["--op", "solve", "--in_lh", str(balanced), "--hap", str(hap),
         "--tgs_order", str(frags)]
    )
    assert rc == 0
    text = hap.read_text()
    assert text.startswith("partition")
    # the guided traversal realizes at least one sampled fragment as a
    # contiguous haploid run
    hap_flat = " ".join(
        line for line in text.splitlines() if not line.startswith("partition")
    )
    assert any(line in hap_flat for line in lines), (lines[:3], hap_flat[:120])


def test_solve_with_hic_matrix(balanced_case, tmp_path):
    case, balanced = balanced_case
    hic = _hic_file(case, tmp_path)
    hap = tmp_path / "h_hic.txt"
    rc = main(
        ["--op", "solve", "--in_lh", str(balanced), "--hap", str(hap),
         "--hic_matrix", str(hic)]
    )
    assert rc == 0
    text = hap.read_text()
    assert text.startswith("partition")
    assert sum(1 for line in text.splitlines() if line and line[0].isdigit()) >= 1


def test_solve_with_both_guidances(balanced_case, tmp_path):
    case, balanced = balanced_case
    frags, _ = _frag_file(case, tmp_path)
    hic = _hic_file(case, tmp_path)
    hap = tmp_path / "h_both.txt"
    circ = tmp_path / "c_both.txt"
    rc = main(
        ["--op", "solve", "--in_lh", str(balanced), "--hap", str(hap),
         "--circuits", str(circ), "--tgs_order", str(frags),
         "--hic_matrix", str(hic)]
    )
    assert rc == 0
    assert hap.read_text().startswith("partition")
    # circuits cover every positive-CN segment
    from ambigram_tpu.model.genome import Genome

    g = Genome.from_lh(str(balanced))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    want = {s.id for s in g.segments if s.weight.copy_num > 0}
    got = set()
    for line in circ.read_text().splitlines():
        if line and line[0].isdigit():
            for tok in line.split():
                got.add(int(tok[:-1]))
    assert want <= got
