import os

import numpy as np
import pytest

from ambigram_tpu.io.lh import parse_lh, parse_lh_text
from ambigram_tpu.model.genome import Genome

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_parse_egfr6():
    lh = parse_lh(os.path.join(DATA, "egfr6.lh"))
    # "SAMPLE" is the legacy spelling of SAMPLE_NAME and is accepted
    # (the reference parser only matches SAMPLE_NAME and silently drops
    # the README's own `SAMPLE test` line; sample_name is cosmetic, so
    # honoring both spellings changes no computation)
    assert lh.sample_name == "test"
    assert lh.avg_chr_seg_dp == [30.0]
    assert lh.avg_whole_host_dp == 30.0
    assert lh.purity == 1.0
    assert lh.avg_tumor_ploidy == 2.0
    assert lh.ploidy_string == "2m1"
    assert lh.expected_ploidy == 2
    assert lh.virus_seg_start == 7
    assert lh.source_ids == [1]
    assert lh.sink_ids == [6]
    assert len(lh.segs) == 6
    assert len(lh.juncs) == 4
    assert lh.segs[1].chrom == "chr7"
    assert lh.segs[1].start == 55282001
    assert lh.segs[1].coverage == 180.0
    assert lh.segs[1].copy_num == 6.0
    j = lh.juncs[0]
    assert (j.source_id, j.source_dir, j.target_id, j.target_dir) == (2, "-", 2, "+")
    assert j.copy_num == 2.0
    assert not j.inferred and j.bounded


def test_junc_dropped_when_zero():
    text = (
        "SOURCE 1\nSINK 2\n"
        "SEG H:1:chr1:1:100 30 2\nSEG H:2:chr1:101:200 30 2\n"
        "JUNC H:1:+ H:2:+ 0 0 U B\n"
        "JUNC H:1:+ H:2:- 10 1 U B\n"
    )
    lh = parse_lh_text(text)
    assert len(lh.juncs) == 1
    assert lh.juncs[0].target_dir == "-"


def test_comment_and_blank_lines():
    text = "  # a comment\n\nSOURCE 1\nSINK 1\nSEG H:1:chr1:1:100 30 2\n"
    lh = parse_lh_text(text)
    assert len(lh.segs) == 1


def test_seg_coverage_clamped():
    text = "SOURCE 1\nSINK 1\nSEG H:1:chr1:1:100 -5.0 2\n"
    lh = parse_lh_text(text)
    assert lh.segs[0].coverage == 0.0


def test_multichrom_source_sink():
    text = (
        "SOURCE 1,4\nSINK 3,6\n"
        + "".join("SEG H:%d:chr%d:1:100 30 2\n" % (i, 1 if i <= 3 else 2) for i in range(1, 7))
    )
    lh = parse_lh_text(text)
    g = Genome.from_records(lh)
    assert [s.id for s in g.sources] == [1, 4]
    assert [s.id for s in g.sinks] == [3, 6]
    assert g.segment_by_id(2).chr_id == 0
    assert g.segment_by_id(5).chr_id == 1
    assert g.segment_by_id(5).partition == 1


def test_hap_depth_and_copy_num():
    g = Genome.from_lh(os.path.join(DATA, "egfr6.lh"))
    g.calculate_hap_depth()
    # purity 1, tumor ploidy 2 -> avg ploidy 2, hap depth 30*1/2 = 15
    assert g.avg_ploidy == pytest.approx(2.0)
    assert g.haploid_depth == pytest.approx(15.0)
    assert g.ratio == pytest.approx(0.0)
    g.calculate_copy_num()
    # all CNs were provided (> 0) so none change
    assert [s.weight.copy_num for s in g.segments] == [2, 6, 8, 8, 4, 4]


def test_copy_num_autofill():
    text = (
        "AVG_WHOLE_HOST_DP 30\nPURITY 1\nAVG_TUMOR_PLOIDY 2\n"
        "SOURCE 1\nSINK 2\n"
        "SEG H:1:chr1:1:100 60 -1\nSEG H:2:chr1:101:200 45 -1\n"
        "JUNC H:1:- H:1:+ 30 -1 U B\n"
    )
    g = Genome.from_records(parse_lh_text(text))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    # hap depth 15; cn = cov/15
    assert g.segments[0].weight.copy_num == pytest.approx(4.0)
    assert g.segments[1].weight.copy_num == pytest.approx(3.0)
    assert g.junctions[0].weight.copy_num == pytest.approx(2.0)


def test_virus_seg_copy_num():
    text = (
        "AVG_WHOLE_HOST_DP 30\nPURITY 1\nAVG_TUMOR_PLOIDY 2\nVIRUS_START 2\n"
        "SOURCE 1\nSINK 2\n"
        "SEG H:1:chr1:1:100 60 -1\nSEG H:2:virus:1:100 45 -1\n"
    )
    g = Genome.from_records(parse_lh_text(text))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    # virus seg: cov / avg_raw * 2 = 45/30*2 = 3
    assert g.segments[1].weight.copy_num == pytest.approx(3.0)


def test_junction_edge_wiring():
    g = Genome.from_lh(os.path.join(DATA, "egfr6.lh"))
    j = g.junctions[0]  # 2- -> 2+
    a, b = j.edge_a, j.edge_b
    assert a.source is g.segment_by_id(2).neg
    assert a.target is g.segment_by_id(2).pos
    # self-inversion: edge B endpoints exist but are NOT inserted into
    # the adjacency lists (src/Junction.cpp:108-120)
    assert a in g.segment_by_id(2).neg.edges_as_source
    assert b not in g.segment_by_id(2).neg.edges_as_source


def test_write_roundtrip(tmp_path):
    g = Genome.from_lh(os.path.join(DATA, "egfr6.lh"))
    g.calculate_hap_depth()
    g.calculate_copy_num()
    out = tmp_path / "roundtrip.lh"
    g.write_lh(str(out))
    text = out.read_text()
    assert "SEG H:1:chr7:55281001:55282000" in text
    assert "JUNC H:2:- H:2:+" in text
