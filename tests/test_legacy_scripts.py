import gzip
import os

import pytest

from ambigram_tpu.scripts.juncdb_tool import (
    SegmentDB,
    SVProfile,
    cigar_match_num,
    count_allele_support,
    juncdb_create,
)
from ambigram_tpu.scripts.legacy_pipeline import (
    HG38_SIZES,
    bfb2fasta,
    extract_bed_sequence,
    map_bps,
    merge_near_pos,
    mergedb,
    parse_snif_vcf,
    path_to_bed,
    read_fasta,
    revcomp,
    seg2fasta,
    segmentation,
    vcf2sv,
)

RAW_SV_HEADER = "\t".join(["c%d" % i for i in range(21)])


def _raw_sv_line(lc, lp, ls, lclip, rc, rp, rs, rclip, lcig="50M", rcig="50M"):
    cols = [lc, str(lp), ls, str(lclip), rc, str(rp), rs, str(rclip)]
    cols += ["x"] * 11
    cols += [lcig, rcig]
    return "\t".join(cols)


def test_cigar_match_num():
    assert cigar_match_num("50M") == 50
    assert cigar_match_num("10S40M2D8M") == 48
    assert cigar_match_num("100S") == 0


def test_svprofile_filter_and_pos2id(tmp_path):
    raw = tmp_path / "raw.txt"
    raw.write_text(
        RAW_SV_HEADER
        + "\n"
        + _raw_sv_line("chr1", 1500, "+", 10, "chr1", 3500, "+", 10)
        + "\n"
        + _raw_sv_line("chr1", 1500, "+", 3, "chr1", 3500, "+", 3)  # dup: clip sums
        + "\n"
        + _raw_sv_line("chr2", 100, "+", 10, "chr2", 200, "+", 10)  # other chrom
        + "\n"
        + _raw_sv_line("chr1", 2500, "-", 10, "chr1", 2500, "+", 10, lcig="5M")  # weak match
        + "\n"
    )
    sv = SVProfile(str(raw), "s1")
    sv.filter_abnormal("chr1", 0, 10000)
    assert len(sv.abnormal_info) == 1
    assert sv.abnormal_supports[0][0] == 13  # 10 + 3 clips merged
    # breakpoint union -> segments
    segdb = SegmentDB("chr1", 0, 9999)
    segdb.update_bps(sv)
    segdb.construct_segs_from_bps()
    assert [s.start for s in segdb.segs] == [0, 1499, 3499]
    sv.set_segdb(segdb)
    sv.pos2id()
    info = sv.abnormal_info[0]
    assert (info[1], info[4]) == (0, 2)  # left seg id 0, right id 1+1


def test_svprofile_depth_and_lh(tmp_path):
    raw = tmp_path / "raw.txt"
    raw.write_text(
        RAW_SV_HEADER + "\n" + _raw_sv_line("chr1", 3, "+", 10, "chr1", 6, "+", 10) + "\n"
    )
    sv = SVProfile(str(raw), "s1")
    sv.filter_abnormal("chr1", 0, 100)
    segdb = SegmentDB("chr1", 0, 9)
    segdb.update_bps(sv)
    segdb.construct_segs_from_bps()
    sv.set_segdb(segdb)
    sv.pos2id()
    depth = tmp_path / "d.txt.gz"
    with gzip.open(depth, "wt") as f:
        for pos in range(1, 11):
            f.write("chr1\t%d\t%d\n" % (pos, 10))
    sv.count_seg_depth(str(depth))
    assert sv.seg_depth[0] == pytest.approx(10.0, rel=0.5)
    sv.set_normal_from_counts([4, 4])
    out = tmp_path / "o.lh"
    sv.write_local_hap(str(out))
    text = out.read_text()
    assert text.startswith("SAMPLE s1")
    assert "SOURCE H:1" in text and "JUNC H:" in text


def test_juncdb_create(tmp_path):
    n = tmp_path / "n.txt"
    a = tmp_path / "a.txt"
    n.write_text("")
    f1 = tmp_path / "j1.txt"
    f1.write_text("1 + 2 + 5\n")
    a.write_text(str(f1) + "\n")
    nl = tmp_path / "nl.txt"
    nl.write_text("")
    out = tmp_path / "db.tsv"
    juncdb_create(str(nl), str(a), str(out))
    text = out.read_text()
    assert "1\t1\t+\t2\t2\t+\t5" in text


def test_count_allele_support():
    reads = [(100, "ACGT"), (101, "CGTA"), (100, "AGGT")]
    ref_n, alt_n = count_allele_support(reads, 101, ("C", "G"))
    assert (ref_n, alt_n) == (2, 1)


def test_fasta_roundtrip(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\nACGTACGTAC\n>chr2\nTTTTGGGG\n")
    seqs = read_fasta(str(fa))
    assert seqs["chr1"] == "ACGTACGTAC"
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AAGG") == "CCTT"
    s = extract_bed_sequence(seqs, [("chr1", 0, 4, "+"), ("chr1", 0, 4, "-")])
    assert s == "ACGT" + "ACGT"
    out = tmp_path / "o.fa"
    bfb2fasta(str(fa), [("chr2", 0, 4, "+")], str(out))
    assert out.read_text() == ">BFBPATH\nTTTT\n"


def test_path_to_bed():
    class S:
        def __init__(self, chrom, start, end):
            self.chrom, self.start, self.end = chrom, start, end

    segs = {1: S("chr1", 100, 199), 2: S("chr1", 200, 299)}
    steps = [(1, "+"), (2, "+"), (2, "-"), (1, "-")]
    rows = path_to_bed(steps, segs)
    assert rows == [("chr1", 100, 299, "+"), ("chr1", 100, 299, "-")]


def test_seg2fasta(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\nACGTACGTAC\n")
    seg = tmp_path / "seg.txt"
    seg.write_text("chr1:2-6\t2\n")
    out = tmp_path / "o.fa"
    seg2fasta(str(seg), str(fa), str(out))
    assert "GTAC" in out.read_text()


def test_vcf2sv_keeps_fbi_neighbors(tmp_path):
    def entry(c1, p1, s1, c2, p2, s2, dp):
        cols = [c1, str(p1), s1, c2, str(p2), s2] + ["x"] * 7
        cols.append("DP:%d " % dp)
        return "\t".join(cols)

    vcf = tmp_path / "v.txt"
    vcf.write_text(
        "\n".join(
            [
                entry("chr1", 100, "+", "chr1", 200, "+", 10),  # kept: next is FBI
                entry("chr1", 150, "+", "chr1", 150, "-", 20),  # FBI
                entry("chr1", 300, "+", "chr1", 400, "+", 10),  # kept: prev is FBI
                entry("chr2", 10, "+", "chr3", 20, "+", 5),  # translocation kept
                entry("chr1", 900, "+", "chr1", 950, "+", 10),  # last + prev not FBI: dropped
            ]
        )
        + "\n"
    )
    out = vcf2sv(str(vcf), str(tmp_path / "x"))
    body = open(out).read().splitlines()[1:]
    assert len(body) == 4
    assert not any("900" in line for line in body)


def test_parse_snif_vcf(tmp_path):
    vcf = tmp_path / "s.vcf"
    vcf.write_text(
        "#hdr\n"
        "chr7\t1000\tid\tN\tN]chr7:2000]\t.\tPASS\t"
        "PRECISE;SVMETHOD=x;CHR2=chr7;END=2000;STRANDS=++\tGT:DV\t0/1:9\n"
    )
    out = parse_snif_vcf(str(vcf), str(tmp_path / "o.txt"))
    rows = open(out).read().splitlines()
    assert rows[1].split("\t") == ["chr7", "1000", "+", "chr7", "2000", "-", "9"]


def test_bpsmap_core():
    assert merge_near_pos([10, 12, 30, 31, 60], 5) == [10, 30, 60]
    mapping = dict(map_bps([100, 103, 105, 400, 402]))
    assert mapping[100] == mapping[103] == mapping[105]
    assert mapping[400] == mapping[402]
    assert mapping[100] != mapping[400]


def test_segmentation_and_mergedb(tmp_path):
    segs = segmentation({"chr1": [100, 200, 300], "chr2": [10, 20]})
    assert segs == [(1, "chr1", 100, 200), (2, "chr1", 200, 300), (3, "chr2", 10, 20)]
    db1 = tmp_path / "a.tsv"
    db2 = tmp_path / "b.tsv"
    hdr = "chrom_5p\tpos_5p\tstrand_5p\tchrom_3p\tpos_3p\tstrand_3p\tcount\n"
    db1.write_text(hdr + "chr1\t100\t+\tchr1\t200\t+\t2\n")
    db2.write_text(hdr + "chr1\t100\t+\tchr1\t200\t+\t3\nchr2\t5\t-\tchr2\t9\t+\t1\n")
    out = mergedb([str(db1), str(db2)], str(tmp_path / "m.tsv"))
    text = open(out).read()
    assert "chr1\t100\t+\tchr1\t200\t+\t5" in text
    assert "chr2\t5\t-\tchr2\t9\t+\t1" in text
    assert HG38_SIZES["chr7"] > 1e8


def test_get_fasta(tmp_path):
    from ambigram_tpu.scripts.legacy_pipeline import get_fasta

    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\nACGTTTTTAC\n")
    out = get_fasta([("chr1", 0, 4, "+"), ("chr1", 4, 8, "-")], str(ref), str(tmp_path / "o.fa"))
    text = open(out).read()
    assert text.startswith(">BFB\n")
    # 0:4 forward = ACGT; 4:8 reverse-complemented: TTTT -> AAAA
    assert text.splitlines()[1] == "ACGTAAAA"


def test_unmap2ins_collapses_contig():
    from ambigram_tpu.scripts.legacy_pipeline import unmap2ins

    def row(c5, p5, s5, c3, p3, s3, jr):
        return {
            "chrom_5p": c5, "pos_5p": p5, "strand_5p": s5,
            "chrom_3p": c3, "pos_3p": p3, "strand_3p": s3,
            "inner_ins": ".", "span_reads": 0, "junc_reads": jr,
            "id": "x", "qual": 0, "filter": "PASS", "meta_info": "", "anno_info": "",
        }

    rows = [
        row("chr1", 100, "+", "ctgU1", 5, "+", 8),   # into the contig
        row("ctgU1", 90, "+", "chr1", 500, "+", 6),  # out of the contig
        row("chr1", 900, "+", "chr1", 1200, "-", 4), # ref-only row
    ]
    out = unmap2ins(rows, "ctgU", "chr")
    ins = [r for r in out if r["inner_ins"] == "ctgU1"]
    assert len(ins) == 1
    # the collapsed row connects chr1:100 -> chr1:500 with min support
    assert ins[0]["chrom_5p"] == "chr1" and ins[0]["chrom_3p"] == "chr1"
    assert ins[0]["pos_3p"] == 500 and ins[0]["junc_reads"] == 6
    assert any(r["pos_5p"] == 900 for r in out)  # ref row passes through


def test_update_bed_snaps_boundaries():
    from ambigram_tpu.scripts.legacy_pipeline import update_bed

    sv = [{
        "chrom_5p": "chr1", "pos_5p": 150, "strand_5p": "+",
        "chrom_3p": "chr1", "pos_3p": 260, "strand_3p": "-",
    }]
    bed = [
        ["chr1", 100, 160, "forward", "+"],
        ["chr1", 250, 300, "reverse", "-"],
    ]
    out = update_bed(sv, bed)
    assert out[0][2] == 150  # forward row end snapped to pos_5p
    assert out[1][2] == 260  # reverse row end snapped to pos_3p


def test_junc_db_updates_and_config(tmp_path):
    from ambigram_tpu.scripts.legacy_pipeline import (
        generate_config,
        update_junc_db_by_seg,
        update_junc_db_by_sv,
        write_junc_db,
    )

    sv = [{
        "chrom_5p": "chr1", "pos_5p": 200, "strand_5p": "+",
        "chrom_3p": "chr1", "pos_3p": 400, "strand_3p": "-",
        "junc_reads": 9, "left_read": 10, "right_read": 14,
    }]
    db = update_junc_db_by_sv(sv, [])
    assert db[0]["count"] == 1
    db = update_junc_db_by_sv(sv, db)  # existing + support>5 => count bump
    assert db[0]["count"] == 2

    segs = [(1, "chr1", 100, 200), (2, "chr1", 200, 400), (3, "chrV", 1, 50)]
    db = update_junc_db_by_seg(segs, db, normal_count=lambda c, p: 7)
    assert any(r["strand_5p"] == "+" and r["pos_5p"] == 200 and r["chrom_5p"] == "chr1"
               and r["pos_3p"] == 200 for r in db)
    path = write_junc_db(str(tmp_path / "db.tsv"), db)
    assert open(path).read().startswith("chrom_5p\t")

    cfg = generate_config(
        str(tmp_path / "cfg.lh"), "s1", sv, segs,
        avg_depth=lambda c, s, e: 100.0,
        normal_count=lambda c, p: 7,
        avg_whole_dp=95.0,
    )
    text = open(cfg).read()
    # chromosome switch creates a second source/sink pair; virus start at
    # the last source
    assert "SOURCE 1,3\n" in text and "SINK 2,3\n" in text
    assert "VIRUS_START 3\n" in text
    assert "JUNC H:1:+ H:2:+ 7 -1 U B" in text       # reference adjacency
    # strand_5p=+ leaves at the end of the segment ENDING at pos_5p (seg 1)
    assert "JUNC H:1:+ H:2:- 12.0 -1 U B" in text     # SV junction (mean support)


def test_legacy_pipeline_cli(tmp_path):
    from ambigram_tpu.scripts.legacy_pipeline import main

    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\nACGTTTTTAC\n")
    bed = tmp_path / "p.bed"
    bed.write_text("chr1 0 4 forward +\nchr1 4 8 reverse -\n")
    rc = main(["getFasta", "-b", str(bed), "-r", str(ref), "-s", str(tmp_path / "s1")])
    assert rc == 0
    assert open(str(tmp_path / "s1") + ".fa").read().splitlines()[1] == "ACGTAAAA"

    hdr = "chrom_5p\tpos_5p\tstrand_5p\tchrom_3p\tpos_3p\tstrand_3p\tcount\n"
    db1 = tmp_path / "a.tsv"
    db1.write_text(hdr + "chr1\t1\t+\tchr1\t2\t+\t1\n")
    rc = main(["mergedb", "-i", "%s,%s" % (db1, db1), "-o", str(tmp_path / "m.tsv")])
    assert rc == 0
    assert "chr1\t1\t+\tchr1\t2\t+\t2" in open(str(tmp_path / "m.tsv")).read()
