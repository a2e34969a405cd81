"""Legacy-format LH ingestion + the check->solve pipeline at 75-segment
scale (VERDICT r1 items: legacy grammar of /root/reference/script/test.lh,
real-scale balancer/traversal coverage).

The bundled tests/data/legacy75.lh is an equivalent of the reference's
script/test.lh: same dialect (SAMPLE / AVG_DP / SOURCE H:1 / depth-only
SEG + JUNC rows), 75 segments, generated from a simulated 6-round BFB
process (so its true copy numbers are known). legacy75.junc.db is the
matching JunctionDB TSV in the script/junc.db format.
"""

import io
import os

import numpy as np
import pytest

from ambigram_tpu.io.lh import parse_lh
from ambigram_tpu.model.genome import Genome

DATA = os.path.join(os.path.dirname(__file__), "data")
REF_TEST_LH = "/root/reference/script/test.lh"
REF_JUNC_DB = "/root/reference/script/junc.db"


def test_parse_legacy_dialect_bundled():
    lh = parse_lh(os.path.join(DATA, "legacy75.lh"))
    assert lh.sample_name == "sim_legacy"
    assert lh.avg_whole_host_dp == 60.0
    assert lh.source_ids == [1]
    assert lh.sink_ids == [75]
    assert len(lh.segs) == 75
    assert all(s.copy_num == -1.0 for s in lh.segs)  # CN derived from depth
    assert all(j.copy_num == -1.0 for j in lh.juncs)


@pytest.mark.skipif(not os.path.exists(REF_TEST_LH), reason="reference absent")
def test_parse_reference_test_lh():
    """The reference's own 75-seg fixture (its live strtok parser hits
    NULL UB on this file, src/Graph.cpp:187-191)."""
    lh = parse_lh(REF_TEST_LH)
    assert len(lh.segs) == 75
    assert len(lh.juncs) == 112
    assert lh.source_ids == [1] and lh.sink_ids == [75]
    g = Genome.from_records(lh)
    g.calculate_hap_depth()
    g.calculate_copy_num()
    assert g.haploid_depth == pytest.approx(62.9532063584908 / 2.0)
    # depth-only SEG rows acquire integer-ish CN from depth
    assert g.segment_by_id(1).weight.copy_num == pytest.approx(
        44.78534391107089 / g.haploid_depth
    )


def _active_flow(genome):
    """in/out junction-CN sums at each positive vertex."""
    from ambigram_tpu.legacy.balancer import _flow_counts

    sums = {}
    cns = [j.weight.copy_num for j in genome.junctions]
    for seg in genome.segments:
        inflow = sum(c * cns[k] for k, c in _flow_counts(genome, seg, True).items())
        outflow = sum(c * cns[k] for k, c in _flow_counts(genome, seg, False).items())
        sums[seg.id] = (inflow, outflow, seg.weight.copy_num)
    return sums


def test_check_75seg_bundled(tmp_path):
    """check op on the bundled 75-seg legacy case: strict balance is
    feasible (a real BFB path is a circulation) and recovers the true
    CN from 3%-noise depths."""
    from ambigram_tpu.legacy.balancer import apply_balance, balance, write_balanced_lh
    from ambigram_tpu.legacy.reachability import connect_source_sink
    from ambigram_tpu.scripts.simulate import simulate_bfb_case

    truth = simulate_bfb_case(
        seed=75, n_segments=75, rounds=6, coverage=60.0, mode="process"
    ).seg_cn

    lh_path = os.path.join(DATA, "legacy75.lh")
    g = Genome.from_lh(lh_path)
    g.calculate_hap_depth()
    g.calculate_copy_num()
    connect_source_sink(g)
    res = balance(g)  # no relaxation needed
    assert res.status == "optimal"
    apply_balance(g, res)

    # balanced segment CN == simulated truth
    got = np.array([s.weight.copy_num for s in g.segments])
    assert (got == truth).mean() >= 0.95
    # exact flow conservation at every positive vertex
    for seg_id, (fin, fout, cn) in _active_flow(g).items():
        assert fin == pytest.approx(cn), seg_id
        assert fout == pytest.approx(cn), seg_id

    out_lh = str(tmp_path / "legacy75.balanced.lh")
    write_balanced_lh(g, out_lh, original_lh=lh_path)
    # the balanced file round-trips through the legacy grammar
    lh2 = parse_lh(out_lh)
    assert len(lh2.segs) == 75
    assert [s.copy_num for s in lh2.segs][:5] == [float(c) for c in got[:5]]


def test_solve_75seg_bundled(tmp_path):
    """solve op (traversal -> circuits -> haploids) on the balanced
    75-seg graph: the copy-exhaustive traversal consumes every segment
    copy, and haploids exist. (A copy stranded as a 1-vertex circuit
    legitimately vanishes from haploids — generateHaploids splices
    circuit[:-1], LGM.cpp:3064-3171 — so full coverage is asserted on
    the circuits, not the haploids.)"""
    from ambigram_tpu.cli import main

    lh_path = os.path.join(DATA, "legacy75.lh")
    balanced = str(tmp_path / "b.lh")
    hap = str(tmp_path / "haps.txt")
    circ = str(tmp_path / "circuits.txt")
    assert (
        main(
            [
                "--op", "check", "--in_lh", lh_path,
                "--lp_prefix", str(tmp_path / "t"), "--out_lh", balanced,
            ]
        )
        == 0
    )
    assert (
        main(
            ["--op", "solve", "--in_lh", balanced, "--hap", hap,
             "--circuits", circ]
        )
        == 0
    )
    text = open(hap).read()
    assert "partition" in text

    def seg_ids(path_text):
        ids = set()
        for line in path_text.splitlines():
            if line and line[0].isdigit():
                for tok in line.split():
                    ids.add(int(tok[:-1]))
        return ids

    g = Genome.from_lh(balanced)
    g.calculate_hap_depth()
    g.calculate_copy_num()
    want = {s.id for s in g.segments if s.weight.copy_num > 0}
    in_circuits = seg_ids(open(circ).read())
    missing = want - in_circuits
    assert not missing, "segments missing from circuits: %s" % sorted(missing)
    # haploids carry the overwhelming majority of the material
    in_haps = seg_ids(text)
    assert len(in_haps & want) >= 0.95 * len(want)


@pytest.mark.skipif(not os.path.exists(REF_TEST_LH), reason="reference absent")
def test_check_solve_reference_test_lh(tmp_path):
    """End-to-end on the reference's real fixture. Its graph admits no
    circulation with every observed junction active (out-flow at seg 18
    is over-constrained), so the elastic retry engages."""
    from ambigram_tpu.cli import main

    balanced = str(tmp_path / "ref.balanced.lh")
    hap = str(tmp_path / "ref.haps.txt")
    assert (
        main(
            [
                "--op", "check", "--in_lh", REF_TEST_LH,
                "--lp_prefix", str(tmp_path / "t"), "--out_lh", balanced,
            ]
        )
        == 0
    )
    lh = parse_lh(balanced)
    assert len(lh.segs) == 75
    assert all(s.copy_num >= 0 for s in lh.segs)
    assert main(["--op", "solve", "--in_lh", balanced, "--hap", hap]) == 0
    assert "partition" in open(hap).read()


def test_juncdb_fixture_parses():
    from ambigram_tpu.legacy.juncdb import JunctionDB

    db = JunctionDB(os.path.join(DATA, "legacy75.junc.db"))
    assert len(db.records) > 50


@pytest.mark.skipif(not os.path.exists(REF_JUNC_DB), reason="reference absent")
def test_reference_junc_db_parses():
    from ambigram_tpu.legacy.juncdb import JunctionDB

    db = JunctionDB(REF_JUNC_DB)
    assert len(db.records) > 100


def test_solve_default_hap_path_uses_lp_prefix(tmp_path, monkeypatch):
    """--op solve without --hap writes <lp_prefix>.haploids.txt instead
    of dropping haploids.txt into the cwd (VERDICT r2 #9)."""
    from ambigram_tpu.cli import main

    lh_path = os.path.join(DATA, "legacy75.lh")
    balanced = str(tmp_path / "b.lh")
    assert (
        main(
            [
                "--op", "check", "--in_lh", lh_path,
                "--lp_prefix", str(tmp_path / "t"), "--out_lh", balanced,
            ]
        )
        == 0
    )
    monkeypatch.chdir(tmp_path)
    prefix = str(tmp_path / "mysample")
    assert main(["--op", "solve", "--in_lh", balanced, "--lp_prefix", prefix]) == 0
    assert os.path.exists(prefix + ".haploids.txt")
    assert not os.path.exists(tmp_path / "haploids.txt")
