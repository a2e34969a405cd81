"""Single-cell mode at scale: simulated K-clone cases with known
per-clone truths, driven through run_sc_bfb end-to-end.

The reference's BFB_ILP_SC (/root/reference/src/LocalGenomicMap.cpp:
4754-5093) couples K clone copies of the fitting program, so variables
multiply by K — 3 clones at S=32 is already the device regime
(V = 3*1056 > 2048). The reference ships no SC simulator; these cases
come from ambigram_tpu.scripts.simulate.simulate_sc_case (root clone
plays a nested BFB chain, children keep a shared prefix and add
private rounds along the evolution DAG).
"""

import pytest

from ambigram_tpu.engine.sc import parse_evolution_edges, run_sc_bfb
from ambigram_tpu.scripts.evaluate import multiplicity_diff
from ambigram_tpu.scripts.simulate import simulate_sc_case


def _write_clones(tmp_path, sc):
    names = []
    for k, case in enumerate(sc.cases):
        p = tmp_path / ("clone%d.lh" % k)
        p.write_text(case.lh_text)
        names.append(str(p))
    return names


def test_parse_evolution_edges_grammar():
    names = ["a.lh", "b.lh", "c.lh"]
    # reference grammar: file names
    assert parse_evolution_edges("a.lh:b.lh,a.lh:c.lh", names) == [[1, 2], [], []]
    # 1-based index extension
    assert parse_evolution_edges("1:2,2:3", names) == [[1], [2], []]
    # empty -> all-pairs default (localhap.cpp:430-434)
    assert parse_evolution_edges("", names) == [[1, 2], [2], []]
    with pytest.raises(ValueError):
        parse_evolution_edges("a.lh:nope.lh", names)
    with pytest.raises(ValueError):
        parse_evolution_edges("a.lh", names)
    # clone names containing colons resolve (split point is searched)
    cnames = ["/data/run:3/c1.lh", "/data/run:3/c2.lh"]
    assert parse_evolution_edges(
        "/data/run:3/c1.lh:/data/run:3/c2.lh", cnames
    ) == [[1], []]
    # self-coupling is rejected; reversed/duplicate pairs collapse (the
    # coupling rows are |x_a - x_b|, direction-free)
    with pytest.raises(ValueError):
        parse_evolution_edges("1:1", names)
    assert parse_evolution_edges("1:2,2:1,1:2", names) == [[1], [], []]


@pytest.mark.parametrize(
    "seed,n_clones,n_segments,topology",
    [(0, 2, 12, "chain"), (1, 3, 14, "chain"), (2, 4, 16, "star"), (5, 3, 10, "star")],
)
def test_sc_fuzz_recovers_per_clone_truth(seed, n_clones, n_segments, topology, tmp_path):
    """Joint exact solve over the simulated evolution DAG recovers each
    clone's truth multiplicities (clones share enough structure that
    the coupling rows never outweigh a clone's own CN fit)."""
    sc = simulate_sc_case(
        seed=seed, n_clones=n_clones, n_segments=n_segments, topology=topology
    )
    names = _write_clones(tmp_path, sc)
    res = run_sc_bfb(
        ",".join(names), solver="exact", edges=sc.edges_arg(names)
    )
    assert len(res.path_strings) == n_clones
    for k, case in enumerate(sc.cases):
        assert res.path_strings[k], "clone %d produced no path" % k
        assert multiplicity_diff(case.truth_string, res.path_strings[k][0]) == 0


def test_sc_device_regime_end_to_end(tmp_path, monkeypatch):
    """K=3 clones at S=32: V = 3*1056 = 3168 > 2048, so auto dispatches
    the SC block program to the device search + LNS polish. The device
    path must actually run (asserted via the profiler counter) and
    still recover every clone's truth."""
    monkeypatch.setenv("AMBIGRAM_SEARCH_POP", "8")
    monkeypatch.setenv("AMBIGRAM_SEARCH_ROUNDS", "2")
    monkeypatch.setenv("AMBIGRAM_SEARCH_SWEEPS", "64")
    monkeypatch.setenv("AMBIGRAM_LNS_BUDGET", "60")
    sc = simulate_sc_case(seed=3, n_clones=3, n_segments=32)
    names = _write_clones(tmp_path, sc)
    from ambigram_tpu.utils.profiling import GLOBAL

    GLOBAL.reset()
    res = run_sc_bfb(",".join(names), solver="auto", edges=sc.edges_arg(names))
    assert GLOBAL.counters.get("solve.device_calls", 0) >= 1
    for k, case in enumerate(sc.cases):
        assert res.path_strings[k], "clone %d produced no path" % k
        assert multiplicity_diff(case.truth_string, res.path_strings[k][0]) == 0


def test_parse_evolution_edges_ambiguity_rejected():
    """An edge string that resolves to DIFFERENT (parent, child) pairs
    at different colon split points is an input error, not a silent
    choice (self-review r3)."""
    names = ["a.lh", "b.lh:c.lh", "a.lh:b.lh", "c.lh"]
    with pytest.raises(ValueError, match="ambiguous"):
        parse_evolution_edges("a.lh:b.lh:c.lh", names)
    # multiple split points that agree on ONE edge are fine
    cnames = ["/run:3/c1.lh", "/run:3/c2.lh"]
    assert parse_evolution_edges("/run:3/c1.lh:/run:3/c2.lh", cnames) == [[1], []]
