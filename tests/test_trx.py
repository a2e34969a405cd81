"""TRX/insertion/concatenation mode tests on synthetic fixtures.

The reference README's TRX fixtures live in the external
Ambigram_paper repo, so these fixtures are constructed to exercise the
same code paths (PROP C2 / I1) with hand-derivable expectations."""

import io
import os

import pytest

from ambigram_tpu.engine.pipeline import run_bfb

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_c2_post_bfb_concatenation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    result = run_bfb(os.path.join(DATA, "c2_twochrom.lh"), solver="exact", out=out)
    # chromosome 1 resolves a BFB path; chromosome 2 is trivial
    assert result.path_strings[1] == "5+6+7+8+"
    assert "|" in result.path_strings[0]
    # the merged path concatenates chr2's tail after the last 3+ via the
    # 3+ -> 6+ translocation
    assert result.merged_path is not None
    merged = result.merged_path_string
    assert "||" in merged
    assert "3+||6+" in merged
    assert merged.endswith("6+7+8+")
    # merged path starts with main chromosome (chr1) content
    assert merged.startswith("1+")
    text = out.getvalue()
    assert "BFB with translocation:" in text


def test_i1_pre_bfb_virus_insertion(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # insertBeforeBFB writes ./new.lh
    out = io.StringIO()
    result = run_bfb(os.path.join(DATA, "i1_virus.lh"), solver="exact", out=out)
    # rewritten graph is written out like the reference does
    assert os.path.exists(tmp_path / "new.lh")
    new_text = (tmp_path / "new.lh").read_text()
    # 6 segments on a single merged chromosome: 1,2,virus,virus,3,4
    assert new_text.count("SEG ") == 6
    assert "virus" in new_text
    # the final path is mapped back to ORIGINAL segment ids with '||' at
    # the human-virus boundaries
    text = out.getvalue()
    assert "TRX-BFB mode: BFB path in the first stage:" in text
    path_str = result.path_strings[0]
    assert "||" in path_str
    assert "2+||5+" in path_str  # human -> virus integration boundary
    assert "6+||3+" in path_str  # virus -> human return
    # virus segments present exactly as often as human flanks
    assert path_str.count("5+") + path_str.count("5-") >= 1


def test_i1_path_segment_multiplicities(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    result = run_bfb(os.path.join(DATA, "i1_virus.lh"), solver="exact")
    path = result.paths[0]
    counts = {}
    for v in path:
        counts[v.id] = counts.get(v.id, 0) + 1
    # loop l(1,6) on the rewritten graph: every segment twice
    assert counts == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2}


def test_i2_post_bfb_insertion(tmp_path, monkeypatch):
    """PROP I2 (README.md:139-146 shape): the donor chromosome's path is
    spliced into the main path along the translocation chain
    3+ -> 5+ ... 6+ -> 4+ (insertion branch of translocationBFB,
    LGM.cpp:4406-4453 semantics). Hand-derived expectation: the donor
    run [5+, 6+] replaces the gap between the first 3+ and the next
    4+."""
    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    result = run_bfb(os.path.join(DATA, "i2_insert.lh"), solver="exact", out=out)
    assert result.path_strings == ["1+2+3+4+|4-3-2-|2+3+4+", "5+6+"]
    assert result.merged_path_string == "1+2+3+||5+6+||4+|4-3-2-|2+3+4+"
    assert "BFB with translocation:" in out.getvalue()


def test_c1_pre_bfb_concatenation_two_stages(tmp_path, monkeypatch):
    """PROP C1 (README.md:147-158 shape): chromosomes are fused at the
    2+ -> 5+ translocation before BFB (concatBeforeBFB, segments 3 and
    4 dropped), the merged 4-segment graph solves the EGFR-like path,
    and virusBFB prints both stages — the path mapped back to original
    ids, then the second-stage edit from the unused 6+ -> 3+ SV (its
    target segment was dropped in the rewrite), which appends 3+ after
    the last 6+."""
    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    result = run_bfb(os.path.join(DATA, "c1_concat.lh"), solver="exact", out=out)
    # rewritten graph written like the reference (LGM.cpp:4394)
    assert os.path.exists(tmp_path / "new.lh")
    text = out.getvalue()
    assert "TRX-BFB mode: BFB path in the first stage:" in text
    assert "1+2+||5+6+|6-5-||2-|2+||5+6+" in text
    assert "TRX-BFB mode: BFB path in the second stage:" in text
    assert result.path_strings == ["1+2+||5+6+|6-5-||2-|2+||5+6+||3+"]
