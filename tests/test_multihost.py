"""Multi-host execution evidence (reference: rlpyt/runners/sync_rl.py
~L15-250 — but rlpyt is single-node only; this exercises the TPU-pod
topology SURVEY.md §5.8 maps it to): two OS processes, each a simulated
host with 2 local CPU devices, joined via jax.distributed into one
4-device global mesh, running SyncRl with dp-sharded env/replay lanes.

Asserts: both processes finish, params end identical (GSPMD gradient
all-reduce spans the process boundary), and the per-host env-lane split
(parallel/mesh.py:host_env_slice) covers the batch.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).with_name("_multihost_worker.py")
FARM_WORKER = Path(__file__).with_name("_multihost_farm_worker.py")
REPO = WORKER.parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(worker: Path, n: int = 2, timeout: int = 540):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(n), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO),
            env={**os.environ,
                 "PYTHONPATH": str(REPO) + os.pathsep
                 + os.environ.get("PYTHONPATH", "")})
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
    return outs


def test_two_process_syncrl_identical_params():
    outs = _run_workers(WORKER)

    lines = {}
    for out in outs:
        ok = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert ok, f"no OK line in:\n{out}"
        parts = dict(kv.split("=") for kv in ok[0].split()[1:])
        lines[int(parts["rank"])] = parts

    assert set(lines) == {0, 1}
    # Identical final params on both hosts (the all-reduce worked and
    # both replicas saw the same reduced gradients).
    assert lines[0]["digest"] == lines[1]["digest"]
    # Disjoint, covering host env-lane slices.
    assert lines[0]["slice"] == "0:8" and lines[1]["slice"] == "8:16"
    assert int(lines[0]["cum"]) >= 1_024


def test_host_farm_feeds_global_mesh():
    """The SURVEY §5.8 production topology: each process owns a
    SharedMemVecEnv slice of the global lane batch (host_env_slice),
    feeds its [T, B_local] samples into one dp-sharded global batch,
    and a single global jitted DQN optimize trains over the 2-process
    mesh.  Asserts identical final params on both hosts (gradient
    all-reduce spans the farms) and disjoint covering lane slices."""
    outs = _run_workers(FARM_WORKER)

    lines = {}
    for out in outs:
        ok = [l for l in out.splitlines() if l.startswith("FARMHOST_OK")]
        assert ok, f"no OK line in:\n{out}"
        parts = dict(kv.split("=") for kv in ok[0].split()[1:])
        lines[int(parts["rank"])] = parts

    assert set(lines) == {0, 1}
    assert lines[0]["digest"] == lines[1]["digest"]
    assert lines[0]["slice"] == "0:4" and lines[1]["slice"] == "4:8"
    assert int(lines[0]["updates"]) > 0
