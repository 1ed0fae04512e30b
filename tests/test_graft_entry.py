"""The driver contract: __graft_entry__ must work as a bare import+call.

Round-1 failure mode (VERDICT.md Missing #1): the driver calls
``dryrun_multichip(n_devices=8)`` directly in a process whose jax runtime
exposes ONE device (the axon TPU chip); the function must self-configure a
virtual CPU mesh instead of assuming the caller set XLA_FLAGS.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_contract():
    # Simulate the driver: a fresh interpreter with NO device-count flags,
    # importing the module and calling the function. Only 1 CPU device is
    # visible in that process, so the subprocess re-exec path must fire.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # keep the nested run off the real chip
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip(n=8)" in r.stdout, r.stdout
    # the dryrun must attest the whole multichip story, not just training
    for stage in ("train OK", "eval OK", "search OK"):
        assert stage in r.stdout, (stage, r.stdout)


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    # With enough devices already visible (the conftest's 8-vdev CPU mesh),
    # the body runs in-process with no re-exec.
    import __graft_entry__ as g

    g.dryrun_multichip(8)
