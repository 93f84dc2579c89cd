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
REPO = WORKER.parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_syncrl_identical_params():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    n = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, str(n), str(i)],
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
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"

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
