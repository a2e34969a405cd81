"""Indel/SV overlay edits (LGM.cpp:3699-3837) and the --reversed/--all
pipeline flags, on EGFR-derived fixtures.

Each fixture adds one non-FBI SV to the 6-segment EGFR case with its
input CN adjusted so getIndelBias restores the golden profile; the base
BFB path must stay golden and indelBFB must apply the documented edit.
Expected strings hand-derived from the reference's grouping/splice
rules."""

import io
import os

from ambigram_tpu.engine.pipeline import run_bfb

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN = "1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
EDIT_HEADER = "BFB path with insertion, deletion, or duplication:"


def _run(name):
    out = io.StringIO()
    run_bfb(os.path.join(DATA, name), solver="exact", out=out)
    lines = [l for l in out.getvalue().splitlines() if l]
    assert lines[0] == GOLDEN  # getIndelBias restored the profile
    assert lines[1] == EDIT_HEADER
    return lines[2]


def test_indel_deletion():
    # JUNC 2+ -> 4+ groups as [2,4] (deletion): seg3 biased +1 pre-ILP,
    # then the <=3 gap between the first 2+ and next 4+ is erased
    assert _run("indel_del.lh") == (
        "1+2+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
    )


def test_indel_duplication():
    # JUNC 4+ -> 2+ groups as [4,2] (duplication): segs 2..4 biased -1,
    # then the prefix [2+,3+,4+] is re-inserted after the first 4+
    assert _run("indel_dup.lh") == (
        "1+2+3+4+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
    )


def test_indel_inversion():
    # JUNC 3+ -> 6- (opposite strands, |src-tgt| > 2 so NOT an FBI): no
    # CN bias; the <=5 gap 4+5+6+ between 3+ and 6- is erased
    assert _run("indel_inv.lh") == (
        "1+2+3+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
    )


def test_indel_insertion():
    # JUNC 2+ -> 5+ and 5+ -> 4+ chain into group [2+,5+,4+]
    # (insertion): seg5 biased -1, then 3+ between 2+ and 4+ is
    # replaced by the spliced 5+
    assert _run("indel_ins.lh") == (
        "1+2+5+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
    )


def test_reversed_flag():
    # --reversed starts the seed on the negative strand (localhap.cpp:37,
    # LGM.cpp:3691-3695 reverse-retry semantics)
    res = run_bfb(os.path.join(DATA, "egfr6.lh"), solver="exact", is_reversed=True)
    assert res.path_strings == [
        "6-5-4-3-2-1-|1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+"
    ]


def test_print_all_flag():
    # --all prints every consistent path; the EGFR DAG admits one
    out = io.StringIO()
    res = run_bfb(os.path.join(DATA, "egfr6.lh"), solver="exact", print_all=True, out=out)
    lines = [l for l in out.getvalue().splitlines() if "|" in l]
    assert GOLDEN in lines
