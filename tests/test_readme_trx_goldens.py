"""Byte-parity with the reference README's four published TRX outputs.

The reference documents exact expected path strings for its four
translocation modes (/root/reference/README.md:132-167) but keeps the
inputs in the external Ambigram_paper repo. The fixtures here
(tests/data/readme_{i1,i2,c1,c2}.lh) were reconstructed so that the
solved outputs equal those published strings byte-for-byte:

- I1  PROP I1:chr8:virus:chr8 M:chr8   (insertion before BFB)
- I2  PROP I2:chr2:chr6:chr13 M:chr2 S:3 (insertion after BFB)
- C1  PROP C1:chr1:260T-HBV_C3-RC      (concatenation before BFB,
      two-stage output with an imperfect (5,7) FBI and a second-stage
      SV through a dropped HBV segment)
- C2  PROP C2:chr2:chr6                (concatenation after BFB)

For C1 the element set replaying to the published string
(p(1,7), l(1,7), p(2,5), p(2,7) on the merged graph) was verified to be
the UNIQUE match over the full {patterns 0/1} x {loops 0..2} space on
endpoint-candidate pairs, and the fixture's junction CNs make it the
MILP optimum.
"""

import io
import os

import pytest

from ambigram_tpu.engine.pipeline import run_bfb

DATA = os.path.join(os.path.dirname(__file__), "data")

I1_GOLDEN = "1+2+3+||6+||4+|4-||6-||3-2-|2+3+||6+||4+|4-||6-||3-2-"
I2_GOLDEN = "1+2+3+||5+6+7+|7-6-||8+9+||4-3-2-|2+3+4+|4-3-"
C1_GOLDEN_STAGE1 = (
    "8+||2+3+4+5+|7-6-5-4-3-2-||8-|8+||2+3+4+5+|7-6-5-4-3-2-|2+3+4+5+"
)
C1_GOLDEN_STAGE2 = (
    "10-||4+5+|7-6-5-4-3-2-||8-|8+||2+3+4+5+|7-6-5-4-3-2-|2+3+4+5+"
)
C2_GOLDEN = "1+2+3+4+|4-3-2-|2+3+||6+7+|7-6-|6+7+|7-6-5-"


def test_readme_i1_byte_golden(tmp_path, monkeypatch):
    """README.md:132-135: insertion before BFB (virus into chr8)."""
    monkeypatch.chdir(tmp_path)  # insert_before_bfb writes ./new.lh
    res = run_bfb(os.path.join(DATA, "readme_i1.lh"), solver="exact")
    assert res.path_strings[0] == I1_GOLDEN


def test_readme_i2_byte_golden(tmp_path, monkeypatch):
    """README.md:137-145: insertion after BFB (chr6+chr13 into chr2)."""
    monkeypatch.chdir(tmp_path)
    res = run_bfb(os.path.join(DATA, "readme_i2.lh"), solver="exact")
    assert res.merged_path_string == I2_GOLDEN


def test_readme_c1_byte_golden_two_stages(tmp_path, monkeypatch):
    """README.md:147-158: concatenation before BFB, both stages."""
    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    res = run_bfb(os.path.join(DATA, "readme_c1.lh"), solver="exact", out=out)
    text = out.getvalue()
    assert (
        "TRX-BFB mode: BFB path in the first stage:\n" + C1_GOLDEN_STAGE1 + "\n"
    ) in text
    assert (
        "TRX-BFB mode: BFB path in the second stage:\n" + C1_GOLDEN_STAGE2 + "\n"
    ) in text
    assert res.path_strings[0] == C1_GOLDEN_STAGE2


def test_readme_c2_byte_golden(tmp_path, monkeypatch):
    """README.md:160-167: concatenation after BFB (chr2 with chr6)."""
    monkeypatch.chdir(tmp_path)
    res = run_bfb(os.path.join(DATA, "readme_c2.lh"), solver="exact")
    assert res.merged_path_string == C2_GOLDEN


@pytest.mark.parametrize("solver", ["device", "auto"])
def test_readme_i1_solver_independent(tmp_path, monkeypatch, solver):
    """The byte-goldens hold on the device/auto solver paths too (small
    programs: auto routes to the exact solver, device must still land
    on an equal-objective solution that replays identically)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("AMBIGRAM_SEARCH_POP", "8")
    monkeypatch.setenv("AMBIGRAM_SEARCH_ROUNDS", "2")
    monkeypatch.setenv("AMBIGRAM_SEARCH_SWEEPS", "64")
    res = run_bfb(os.path.join(DATA, "readme_i1.lh"), solver=solver)
    assert res.path_strings[0] == I1_GOLDEN


def test_readme_juncs_example_keeps_golden(tmp_path, monkeypatch):
    """The README documents a test.juncs example (README.md:169-176)
    whose fragments are consistent with the EGFR golden path; feeding
    it as --juncdb --junc_info must keep the golden output (the JUNCS
    evidence rows constrain, not contradict)."""
    monkeypatch.chdir(tmp_path)
    golden = (
        "1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+"
        "|6-5-4-3-2-1-"
    )
    res = run_bfb(
        os.path.join(DATA, "egfr6.lh"),
        juncs_path=os.path.join(DATA, "readme_test.juncs"),
        juncs_info=True,
        solver="exact",
    )
    assert res.path_strings[0] == golden
