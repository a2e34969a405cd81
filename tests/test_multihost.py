"""Two-process distributed integration test.

Launches two real OS processes that initialize jax.distributed over a
local coordinator (CPU backend, 4 virtual devices each), take their
`host_shard` of a shared case list, and run the batch pipeline. The
parent asserts the union of results covers every case with the
expected outputs — the multi-host execution model of
ambigram_tpu.parallel.distributed, exercised end to end."""

import json
import os
import socket
import subprocess
import sys

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from ambigram_tpu.parallel.distributed import host_shard, initialize
initialize()
cases = sys.argv[1].split(",")
mine = host_shard(cases)
from ambigram_tpu.engine.pipeline import run_bfb
out = {}
for path in mine:
    res = run_bfb(path, solver="exact")
    out[path] = res.path_strings
print("RESULT " + json.dumps({"pid": jax.process_index(), "out": out}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_host_sharding(tmp_path):
    from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case

    os.chdir(tmp_path)
    cases = [os.path.join(DATA, "egfr6.lh")]
    truths = {}
    for seed in (1, 2, 3):
        c = simulate_bfb_case(seed=seed, n_segments=6)
        p = write_case(c, str(tmp_path / ("m%d" % seed)))
        cases.append(p["lh"])
        truths[p["lh"]] = c.truth_string
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COORDINATOR_ADDRESS"] = "localhost:%d" % port
    env["JAX_NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        penv = dict(env)
        penv["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER, ",".join(cases)],
                env=penv,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = {}
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, stderr[-2000:]
        for line in stdout.splitlines():
            if line.startswith("RESULT "):
                data = json.loads(line[len("RESULT ") :])
                outs[data["pid"]] = data["out"]
    # both processes reported, disjoint shards, full coverage
    assert set(outs) == {0, 1}
    covered = set(outs[0]) | set(outs[1])
    assert covered == set(cases)
    assert not (set(outs[0]) & set(outs[1]))
    merged = {**outs[0], **outs[1]}
    GOLDEN = (
        "1+2+3+4+5+6+|6-5-4-3-2-|2+3+4+|4-3-|3+4+|4-3-2-|2+3+4+5+6+|6-5-4-3-2-1-"
    )
    assert merged[cases[0]][0] == GOLDEN
    for path, truth in truths.items():
        assert merged[path][0] == truth


WORKER_CRASH = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from ambigram_tpu.parallel.distributed import host_shard, initialize
initialize()
cases = sys.argv[1].split(",")
store = sys.argv[2]
mine = host_shard(cases)
from ambigram_tpu.engine.pipeline import run_bfb_many
if jax.process_index() == 1:
    # complete exactly one of this worker's cases, then die mid-batch
    run_bfb_many(mine[:1], solver="exact", result_store=store)
    print("RESULT " + json.dumps({"pid": 1, "done": mine[:1]}), flush=True)
    os._exit(17)
run_bfb_many(mine, solver="exact", result_store=store)
print("RESULT " + json.dumps({"pid": 0, "done": mine}), flush=True)
"""


@pytest.mark.slow
def test_worker_death_recovery_via_result_store(tmp_path):
    """A worker dies mid-batch; a rerun over the shared result_store
    completes the suite idempotently — finished cases are served from
    the store (files untouched), only the dead worker's remainder is
    recomputed. (SURVEY §5 failure-recovery build note.)"""
    from ambigram_tpu.engine.pipeline import run_bfb_many
    from ambigram_tpu.scripts.simulate import simulate_bfb_case, write_case

    os.chdir(tmp_path)
    store = str(tmp_path / "store")
    cases, truths = [], {}
    for seed in (1, 2, 3, 4):
        c = simulate_bfb_case(seed=seed, n_segments=6)
        p = write_case(c, str(tmp_path / ("k%d" % seed)))
        cases.append(p["lh"])
        truths[p["lh"]] = c.truth_string

    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COORDINATOR_ADDRESS"] = "localhost:%d" % port
    env["JAX_NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        penv = dict(env)
        penv["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER_CRASH, ",".join(cases), store],
                env=penv,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    rcs, stdouts = {}, {}
    for pid, p in enumerate(procs):
        stdout, stderr = p.communicate(timeout=300)
        rcs[pid] = p.returncode
        stdouts[pid] = stdout
    assert rcs[1] == 17  # the simulated death
    # the survivor finishes its shard's compute and persists results;
    # its distributed TEARDOWN may still fail (coordination service
    # reports the dead peer) — that is the realistic failure signature
    assert "RESULT" in stdouts[0]

    done_before = {f: os.path.getmtime(os.path.join(store, f)) for f in os.listdir(store)}
    assert 0 < len(done_before) < len(cases)  # partial progress persisted

    # recovery rerun: one process sweeps the full case list
    results = run_bfb_many(cases, solver="exact", result_store=store)
    for path, res in zip(cases, results):
        assert res.path_strings[0] == truths[path]
    # previously completed cases were not recomputed (files untouched)
    for f, mtime in done_before.items():
        assert os.path.getmtime(os.path.join(store, f)) == mtime
    assert len(os.listdir(store)) == len(cases)
