"""End-to-end golden tests against the reference's documented outputs."""

import io
import os

import pytest

from ambigram_tpu.engine.pipeline import run_bfb

DATA = os.path.join(os.path.dirname(__file__), "data")

# /root/reference/README.md:120-123 — expected console path for the
# 6-segment chr7/EGFR example
GOLDEN_EGFR6 = (
    "1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
)


def test_egfr6_golden_exact_solver():
    out = io.StringIO()
    result = run_bfb(os.path.join(DATA, "egfr6.lh"), solver="exact", out=out)
    assert len(result.paths) == 1
    assert result.path_strings[0] == GOLDEN_EGFR6
    assert out.getvalue().splitlines()[0] == GOLDEN_EGFR6
    assert result.ilp_error == pytest.approx(0.0)
    assert result.is_resolved
    assert result.num_inversions == 4


def test_trivial_no_fbi():
    import tempfile

    text = (
        "AVG_WHOLE_HOST_DP 30\nPURITY 1\nAVG_TUMOR_PLOIDY 2\n"
        "SOURCE 1\nSINK 3\n"
        "SEG H:1:chr1:1:100 30 2\nSEG H:2:chr1:101:200 30 2\nSEG H:3:chr1:201:300 30 2\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".lh", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        result = run_bfb(path, solver="exact")
        assert result.path_strings == ["1+2+3+"]
        assert result.chromosomes[0].trivial
    finally:
        os.unlink(path)
