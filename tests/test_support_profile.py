"""Tests for the SNP-support / simulator-support capability ports
(reference src/LocusDB.cpp, src/SupportProfile.cpp,
src/HaploidProfile.cpp, count_support.cpp)."""

import gzip
import io
import os

import pytest

from ambigram_tpu.scripts.juncdb_tool import Seg, SegmentDB
from ambigram_tpu.scripts.support_profile import (
    AlnRead,
    HaploidProfile,
    LocusDB,
    SimJunc,
    SimSeg,
    SupportProfile,
    count_split_support,
    fill_avg_depth,
    get_base_idx,
    get_seg_seq,
    get_sim_juncs,
    junction_windows,
    main,
    median_int,
    overlap_len,
    parse_cigar,
    read_sim_data,
    read_sim_segs,
    write_sim_lh,
)

VCF = """##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1
chr1\t100\t.\tA\tC\t.\tPASS\t.\tGT\t0/1
chr1\t200\t.\tG\tT\t.\tPASS\t.\tGT\t0|1
chr1\t300\t.\tT\tA\t.\tPASS\t.\tGT\t1/1
chr1\t400\t.\tC\tG\t.\tPASS\t.\tGT\t0/0
chr1\t900\t.\tA\tG\t.\tPASS\t.\tGT\t0/1
chr2\t150\t.\tA\tG\t.\tPASS\t.\tGT\t0/1
"""


def _make_db(tmp_path, start=1, end=500):
    vcf = os.path.join(tmp_path, "t.vcf")
    with open(vcf, "w") as f:
        f.write(VCF)
    db = LocusDB("chr1", start, end)
    db.read_vcf(vcf)
    return db, vcf


def _segdb():
    db = SegmentDB("chr1", 0, 1000)
    db.segs = [Seg(0, "chr1", 0, 249), Seg(1, "chr1", 250, 1000)]
    return db


def test_locusdb_region_filter_and_positions(tmp_path):
    db, _ = _make_db(str(tmp_path))
    # chr2 and pos 900 (outside [1,500]) are excluded; pos stored 0-based
    assert [l.pos for l in db.loci] == [99, 199, 299, 399]
    assert db.find_loci_in_range(150, 310) == (1, 3)


def test_locusdb_assign_to_segments(tmp_path):
    db, _ = _make_db(str(tmp_path))
    db.set_seg_ref(_segdb())
    db.assign_locus_to_seg()
    assert [l.seg.id for l in db.loci] == [0, 0, 1, 1]
    assert [l.id for l in db.seg_loci[0]] == [0, 1]


def test_genotypes_and_statistics(tmp_path):
    db, vcf = _make_db(str(tmp_path))
    sp = SupportProfile("s1")
    sp.set_loci_ref(db)
    sp.read_genotypes(vcf)
    assert sp.gt == [1, 1, 2, 0]
    assert sp.statistics() == (2, 2, 0, 4)


def test_get_base_idx_cigar_walk():
    # 10M: direct offset
    r = AlnRead("q", 95, parse_cigar("10M"), "ACGTACGTAC")
    assert get_base_idx(r, 99) == 4
    # soft clip shifts query index, deletion hides positions
    r2 = AlnRead("q", 95, parse_cigar("3S4M2D4M"), "NNNACGTACGT")
    assert get_base_idx(r2, 96) == 4  # in first M block
    assert get_base_idx(r2, 100) == -1  # inside the deletion
    assert get_base_idx(r2, 102) == 3 + 4 + (102 - 101)  # second M block


def test_count_support_pairs(tmp_path):
    db, vcf = _make_db(str(tmp_path))
    db.set_seg_ref(_segdb())
    db.assign_locus_to_seg()
    sp = SupportProfile("s1")
    sp.set_loci_ref(db)
    sp.read_genotypes(vcf)
    # read covering het loci 0 (pos 99) and 1 (pos 199): ref at 0, alt at 1
    seq = ["N"] * 150
    seq[99 - 90] = "A"  # ref of locus 0
    seq[199 - 90] = "T"  # alt of locus 1
    read = AlnRead("r1", 90, parse_cigar("150M"), "".join(seq))
    sp.count_support_reads([[read], [read]])
    # locus 0 pairs with locus 1 twice as ra (i ref, j alt)
    k = sp.pair_loci[0].index(1)
    rc = sp.pair_counts[0][k]
    assert (rc.rr, rc.ra, rc.ar, rc.aa) == (0, 2, 0, 0)
    # symmetric entry is ar
    k2 = sp.pair_loci[1].index(0)
    rc2 = sp.pair_counts[1][k2]
    assert (rc2.rr, rc2.ra, rc2.ar, rc2.aa) == (0, 0, 2, 0)
    # low-mapq and secondary/supplementary reads are skipped
    sp2 = SupportProfile("s1")
    sp2.set_loci_ref(db)
    sp2.read_genotypes(vcf)
    bad1 = AlnRead("r2", 90, parse_cigar("150M"), "".join(seq), mapq=5)
    bad2 = AlnRead("r3", 90, parse_cigar("150M"), "".join(seq), flag=0x800)
    sp2.count_support_reads([[bad1, bad2]])
    assert sp2.pair_loci[0] == []


def test_support_roundtrip(tmp_path):
    db, vcf = _make_db(str(tmp_path))
    sp = SupportProfile("s1")
    sp.set_loci_ref(db)
    sp.read_genotypes(vcf)
    sp._add_pair(0, 1, 0, 1)
    out = os.path.join(str(tmp_path), "sup.gz")
    sp.write_support(out)
    sp2 = SupportProfile("s1")
    sp2.set_loci_ref(db)
    sp2.read_support(out)
    assert sp2.pair_loci[0] == [1]
    assert sp2.pair_counts[0][0].ra == 1


def test_haploid_profile_phasing(tmp_path):
    db, vcf = _make_db(str(tmp_path))
    segdb = _segdb()
    db.set_seg_ref(segdb)
    db.assign_locus_to_seg()
    sp = SupportProfile("s1")
    sp.set_loci_ref(db)
    sp.read_genotypes(vcf)
    # loci 0,1 are het on segment 0; strong ra/ar support => opposite phase
    for _ in range(3):
        sp._add_pair(0, 1, 0, 1)
        sp._add_pair(1, 0, 1, 0)

    hp = HaploidProfile("s1")
    hp.set_seg_ref(segdb)
    hp.set_support_profile(sp)
    hap_file = os.path.join(str(tmp_path), "haps")
    # trailing token of each line is popped (HaploidProfile.cpp:61,78)
    with open(hap_file, "w") as f:
        f.write("1+ 2+ 0+\n1+ 2- 2+ 0+\n")
    hp.read_haploids(hap_file)
    assert [s.seg.id for s in hp.hap1] == [0, 1]
    hp.identify_normal()
    # seg 0 once per haploid => normal; seg 1 twice in hap2 => not
    assert hp.seg_normal == [True, False]
    out = io.StringIO()
    placements = hp.place_variants(out=out)
    types = {l.id: t for l, t in placements[0]}
    # locus 0 placed first (h0 default), locus 1 pulled to hap1 by ar support
    assert types[0] == 0 and types[1] == 1
    assert "segId" in out.getvalue()


def test_sim_support_tables(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "segs.txt"), "w") as f:
        f.write("id chrom start end count\n")
        f.write("1 BOR 1 100 0\n2 BOR 101 200 0\n3 BOR 201 300 0\n")
    with open(os.path.join(d, "map.txt"), "w") as f:
        f.write("s_start s_end r_start r_end ind\n")
        f.write("1 100 1 100 N\n101 200 201 300 I\n201 300 101 200 N\n")
    segs = read_sim_segs(os.path.join(d, "segs.txt"))
    maps = read_sim_data(os.path.join(d, "map.txt"), 3)
    seq = get_seg_seq(maps, segs)
    assert [s.id for s in seq] == [1, 3, 2]
    assert segs[2].is_inv  # seg 3 marked inverted
    juncs = get_sim_juncs(seq)
    assert [(j.left.id, j.right.id) for j in juncs] == [(1, 3), (3, 2)]

    # depth table: constant 10 over BOR
    fill_avg_depth(segs, {"BOR": {p: 10 for p in range(1, 301)}})
    assert segs[0].depth == pytest.approx(10 * 99 / 100.0)

    # split-read support: junction (1 -> 3 inverted): left break at end
    # of seg1 (100), right break at end of seg3 (300)
    lp, rp, lw, rw = junction_windows(juncs[0])
    assert (lp, rp) == (100, 300)
    r1 = AlnRead("q1", lw[0], [(0, lw[1] - lw[0] + 1)], "")
    r2 = AlnRead("q1", rw[0], [(0, rw[1] - rw[0] + 1)], "")
    count_split_support(juncs, [r1], {"q1": [r1, r2]})
    assert juncs[0].support == 1 and juncs[1].support == 0

    # median quirk: element n/2 of the sorted list
    assert median_int([1, 2, 100, 4]) == 4

    lh = os.path.join(d, "sim.lh")
    write_sim_lh(lh, segs, juncs, "simcase")
    text = open(lh).read()
    assert text.startswith("SAMPLE simcase\n")  # preserved header quirk
    assert "SINK H:3" in text and "JUNC H:1:+ H:3:+ 1" in text


def test_overlap_len_closed_interval():
    assert overlap_len(10, 20, 15, 30) == 6
    assert overlap_len(10, 20, 25, 30) < 0


def test_cli_count_support(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "segs.txt"), "w") as f:
        f.write("id chrom start end count\n1 BOR 1 100 0\n2 BOR 101 200 0\n")
    with open(os.path.join(d, "map.txt"), "w") as f:
        f.write("h\n1 100 1 100\n101 200 101 200\n")
    rc = main(
        [
            "count_support",
            "-s",
            os.path.join(d, "segs.txt"),
            "-j",
            os.path.join(d, "map.txt"),
            "-t",
            "dup",
            "-S",
            os.path.join(d, "segs.out"),
            "-J",
            os.path.join(d, "juncs.out"),
            "--lh_out",
            os.path.join(d, "out.lh"),
        ]
    )
    assert rc == 0
    assert open(os.path.join(d, "juncs.out")).read().splitlines()[1] == "1\t2\t0"
    assert os.path.exists(os.path.join(d, "out.lh"))
