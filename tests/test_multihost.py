"""Multi-host (DCN) fleet sharding tests (SURVEY §2.8c: the
scripts/batch_starfit role — independent fits sharded across hosts).

Fast tests cover the deterministic shard math; the slow test launches a REAL
two-process ``jax.distributed`` CPU fleet (separate interpreters, gRPC
coordinator, cross-process barrier) that fits disjoint shards of a shared
work list and proves the shards are disjoint, complete, and correct.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from isochrones_tpu.parallel.multihost import process_shard

HERE = os.path.dirname(os.path.abspath(__file__))


# ------------------------------------------------------------ shard math
@pytest.mark.parametrize("n_items,nproc", [(5, 2), (8, 3), (3, 4), (0, 2), (7, 1)])
def test_process_shard_partition(n_items, nproc):
    items = list(range(n_items))
    shards = [process_shard(items, p, nproc) for p in range(nproc)]
    # disjoint and complete, order-preserving
    flat = [x for s in shards for x in s]
    assert flat == items
    # balanced: sizes differ by at most one
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_process_shard_explicit_ids():
    items = ["a", "b", "c", "d", "e"]
    assert process_shard(items, 0, 2) == ["a", "b", "c"]
    assert process_shard(items, 1, 2) == ["d", "e"]


# ------------------------------------------------- real two-process fleet
@pytest.mark.slow
def test_two_process_fleet(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(HERE)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(HERE, "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = {}
    for pid in range(2):
        with open(tmp_path / f"proc{pid}.json") as f:
            d = json.load(f)
        assert d["nproc"] == 2
        results[pid] = d["results"]

    # disjoint + complete coverage of the shared work list
    eeps = [r["eep_true"] for pid in range(2) for r in results[pid]]
    assert sorted(eeps) == [30.0, 32.0, 34.0, 36.0, 38.0]
    assert len(results[0]) == 3 and len(results[1]) == 2
    # each fit actually recovered its star
    for pid in range(2):
        for r in results[pid]:
            assert abs(r["eep_med"] - r["eep_true"]) < 5.0, r
