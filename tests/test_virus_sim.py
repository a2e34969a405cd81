"""Virus-pipeline driver pieces (scripts/virus_sim.py): pure functions
run for real, external-tool recipes checked structurally, and the
in-process check->solve leg driven end to end."""

import os

import numpy as np
import pytest

from ambigram_tpu.scripts import virus_sim


def test_generate_var_file(tmp_path):
    var = virus_sim.generate_var_file(
        ["chr5", "chr9"], "hpv16", 7906, str(tmp_path), "/x/mix.fa", seed=3
    )
    lines = open(var).read().splitlines()
    # 2 chromosomes x 2 inserts x 2 haplotype rows
    assert len(lines) == 8
    for line in lines:
        tok = line.split("\t")
        assert len(tok) == 10
        assert tok[0].startswith("VAR_chr")
        assert tok[1].startswith("FINS_")
        assert tok[3] in ("0", "1")
        payload = tok[9].split(",")
        assert payload[0] == "/x/mix.fa"
        chrom, span = payload[1].split(":")
        assert chrom == "hpv16"
        a, b = (int(x) for x in span.split("-"))
        assert 700 <= a and b <= 7906 and 800 <= b - a <= 2000
        assert 1 <= int(payload[2]) <= 3
        # reverse-orientation quirk: r iff virus start % 3 == 0
        assert payload[3] == ("r" if a % 3 == 0 else "f")
    # haplotype rows are paired: identical except the hap column
    for i in range(0, len(lines), 2):
        t0, t1 = lines[i].split("\t"), lines[i + 1].split("\t")
        assert t0[3] == "0" and t1[3] == "1"
        assert t0[4:] == t1[4:]


def test_write_mix_fa_and_depth(tmp_path):
    mix = virus_sim.write_mix_fa(
        str(tmp_path), {"chr1": "ACGT" * 10, "chr2": "GGCC" * 10}, "hpv", "TTTT" * 5
    )
    text = open(mix).read()
    assert text.count(">") == 3 and text.rstrip().endswith("TTTT")

    scov = tmp_path / "x.scov"
    scov.write_text(
        "#rname\tstart\tend\tnumreads\tcovbases\tcoverage\tmeandepth\tq\tm\n"
        "chr1\t1\t1000\t100\t900\t90\t30.0\t30\t30\n"
        "chr2\t1\t500\t50\t400\t80\t10.0\t20\t20\n"
    )
    # (1000*30 + 500*10) / 7000
    assert virus_sim.parse_mean_depth(str(scov), 7000) == pytest.approx(5.0)


def test_external_recipes_shape():
    seek = virus_sim.seeksv_commands("p", "p.bam", "mix.fa")
    assert seek[1][0] == "seeksv" and seek[-1][0] == "seeksv"
    assert any("clip.bam" in t for c in seek for t in c)
    gc = virus_sim.gc_correction_commands("a.bam", "p", "mix.fa", 123)
    assert [c[0] for c in gc] == [
        "samtools", "faToTwoBit", "computeGCBias", "correctGCBias", "samtools"
    ]
    assert any("123" in t for c in gc for t in c)
    hic = virus_sim.hic_commands("m.fa", 150_000, "p")
    assert hic[1][0] == "sim3C"
    assert "15000" in hic[1]  # 15x * 150k / 150
    mu = virus_sim.mutforge_command("v.var", "m.fa", "s.par", "p")
    assert mu[0] == "mutforge" and "v.var" in mu


def test_run_check_solve_end_to_end(tmp_path, monkeypatch):
    """The in-process check->solve leg on a simulated legacy case."""
    from ambigram_tpu.scripts.simulate import legacy_lh_text, simulate_bfb_case

    monkeypatch.chdir(tmp_path)
    case = simulate_bfb_case(seed=2, n_segments=12, rounds=3, coverage=40.0, mode="process")
    lh = tmp_path / "v.lh"
    lh.write_text(legacy_lh_text(case))
    outs = virus_sim.run_check_solve(str(lh), str(tmp_path / "v"))
    assert os.path.exists(outs["balanced"])
    assert open(outs["haps"]).read().startswith("partition")
    assert os.path.exists(outs["circuits"]) and os.path.exists(outs["traversed"])
