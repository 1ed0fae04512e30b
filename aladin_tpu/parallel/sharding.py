"""Parameter and batch sharding rules for the (dp, tp) mesh.

Megatron-style tensor parallelism expressed as weight PartitionSpecs - XLA's
SPMD partitioner inserts the (reduce-scatter/all-reduce) collectives:

  * QKV projections and the MLP up-projection split their OUTPUT features
    over tp (head-parallel attention, column-parallel MLP);
  * attention-out and MLP down-projections split their INPUT features
    (row-parallel; the following all-reduce rides ICI);
  * embeddings, LayerNorms, biases of row-parallel layers replicate.

tp must divide the head counts (backbone: 12 heads; heads: 4), i.e. tp in
{1, 2, 4} for the stock architecture.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, kernel spec, bias spec); first match wins.
_RULES = [
    # backbone attention + TE-head attention: column-parallel
    (re.compile(r"(attention/(query|key|value)|self_attn/(q|k|v)_proj)/kernel$"), P(None, "tp")),
    (re.compile(r"(attention/(query|key|value)|self_attn/(q|k|v)_proj)/bias$"), P("tp")),
    # attention out-projection: row-parallel
    (re.compile(r"(attention_output|self_attn/out_proj)/kernel$"), P("tp", None)),
    # MLP up (column) / down (row)
    (re.compile(r"(intermediate|linear1)/kernel$"), P(None, "tp")),
    (re.compile(r"(intermediate|linear1)/bias$"), P("tp")),
    (re.compile(r"(layer_\d+/output|linear2)/kernel$"), P("tp", None)),
]


def _spec_for(path: str, has_tp: bool) -> P:
    if has_tp:
        for rx, spec in _RULES:
            if rx.search(path):
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """PartitionSpec tree for a parameter tree (NamedSharding leaves)."""
    has_tp = "tp" in mesh.axis_names and mesh.shape.get("tp", 1) > 1
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    specs = {path_str(kp): _spec_for(path_str(kp), has_tp) for kp, _ in flat}

    def map_leaf(kp, _):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(map_leaf, params)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over dp, replicate over tp."""
    axis = "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
