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
