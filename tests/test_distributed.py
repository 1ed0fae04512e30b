"""Real multi-host smoke: a 2-process CPU jax.distributed cluster.

The reference's DDP path initializes a process group, barriers, and
all-reduces eval counters (ref:oscar/run_oscarplus_pretrain.py:168-178,229,
477-478). Without multi-host TPU hardware, the same capability is proven by
spawning two local processes that form a jax.distributed cluster over a
localhost coordinator and run initialize -> barrier -> all_reduce_metrics.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
rank = int(sys.argv[1]); port = sys.argv[2]

import jax
jax.config.update("jax_platforms", "cpu")

from aladin_tpu.parallel import distributed as D

D.initialize(f"localhost:{port}", num_processes=2, process_id=rank)
assert D.get_world_size() == 2, D.get_world_size()
assert D.get_rank() == rank
assert D.is_main_process() == (rank == 0)
D.barrier("smoke")

# host-local metrics differ per rank; the reduction must agree everywhere
m = D.all_reduce_metrics({"acc": float(rank + 1), "n": 10.0 * (rank + 1)})
assert abs(m["acc"] - 1.5) < 1e-6, m
assert abs(m["n"] - 15.0) < 1e-6, m
s = D.all_reduce_metrics({"count": float(rank + 1)}, op="sum")
assert abs(s["count"] - 3.0) < 1e-6, s
D.barrier("done")
print(f"rank {rank} OK")
"""


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + REPO
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(rank), str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"rank {rank} OK" in out
