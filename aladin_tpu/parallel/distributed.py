"""Multi-host initialization and process-role helpers.

The reference's distributed surface is torch.distributed
(init_process_group / get_rank / get_world_size / barriers / all_reduce,
ref:oscar/run_oscarplus_pretrain.py:168-178,229,277,477-478 and
ref:oscar/utils/misc.py:49-66). The TPU-native equivalents (SURVEY.md S5.8):

  * ``initialize()`` -> jax.distributed.initialize (no-op on one host; on a
    multi-host slice every host calls it before first jax use);
  * rank/world helpers read jax.process_index / process_count;
  * ``all_reduce_metrics`` reduces host-local scalars across processes via a
    process-allgather (one tiny global array; XLA emits the cross-host
    collective over DCN/ICI - nothing hand-written);
  * ``barrier`` is a sync over all global devices.

Exercised for real by tests/test_distributed.py: a 2-process CPU
jax.distributed cluster (coordinator on localhost) runs initialize ->
barrier -> all_reduce_metrics and checks the reduced values.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host bring-up. Safe no-op for single-process runs.

    With explicit topology args, initializes directly. With no args it
    auto-initializes (jax.distributed.initialize's env detection) — but
    only when the environment actually announces a cluster (coordinator
    env vars / cloud TPU metadata); a plain single-host run stays a no-op
    instead of failing on missing coordinator discovery.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
        return
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    import os

    # only explicit coordinator announcements count: topology vars like
    # TPU_WORKER_HOSTNAMES are present even on single-host boxes
    cluster_hints = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                     "MEGASCALE_COORDINATOR_ADDRESS")
    if any(os.environ.get(k) for k in cluster_hints):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            # backend already up (e.g. a driver touched jax first) or
            # already initialized — keep going single-process
            pass


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def all_reduce_metrics(metrics: Dict[str, float], op: str = "mean") -> Dict[str, float]:
    """Reduce HOST-LOCAL scalar metrics across all processes (the
    reference's torch.distributed.all_reduce of eval counters,
    ref:run_oscarplus_pretrain.py:477-478).

    Each process passes its local values (e.g. eval counters over its data
    shard); every process returns the same reduced dict. Values that are
    replicated outputs of a pjit step are already global - reduce only
    genuinely per-host quantities.
    """
    assert op in ("mean", "sum"), op
    items = sorted(metrics.items())
    local = np.asarray([float(v) for _, v in items], np.float32)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        stacked = np.asarray(multihost_utils.process_allgather(local))
        local = stacked.sum(axis=0) if op == "sum" else stacked.mean(axis=0)
    return {k: float(v) for (k, _), v in zip(items, local)}


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (the reference's
    torch.distributed.barrier, ref:run_oscarplus_pretrain.py:229,277)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
