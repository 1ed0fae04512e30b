"""Checkpoint save/restore (orbax) with the reference's logical contents.

Reference format (ref:alad/train.py:329-337,552-557): a dict {epoch, model,
optimizer, scheduler, opt(args), config, Eiters} written as
``checkpoint.pth.tar`` every val_step, copied to ``model_best_rsum.pth.tar``
on a new best rsum. Resume restores model+optimizer+scheduler+Eiters+epoch
(ref:train.py:278-297); ``--load-teacher-model`` restores weights only,
non-strict (ref:train.py:283).

Here: orbax PyTree checkpoints under ``<dir>/checkpoint`` and
``<dir>/model_best_rsum`` holding {params, opt_state, step, epoch, config,
best_rsum}; the scheduler needs no state (it is a pure function of step).
Teacher loading merges overlapping subtrees non-strictly. PyTorch-side
inputs (OSCAR dirs, ALADIN .pth.tar) are converted by io/convert.py.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    """Materialize a pytree as host numpy. In a multi-process run, arrays
    sharded across non-addressable devices (e.g. tp over two hosts) are
    gathered with a process_allgather FIRST - np.asarray on them would raise.
    This makes _to_host a COLLECTIVE in that case: every process must call
    save_checkpoint (rank 0 alone writes files below; ADVICE r2 #2)."""

    def f(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)  # fully-replicated global arrays read locally

    return jax.tree.map(f, tree)


def save_checkpoint(
    out_dir: str,
    state,
    epoch: int,
    config_dict: Dict[str, Any],
    best_rsum: float,
    is_best_rsum: bool = False,
    is_best_ndcgspice: bool = False,
    name: str = "checkpoint",
    retries: int = 10,
) -> str:
    """Write <out_dir>/<name>; copy to model_best_rsum / model_best_ndcgspice
    on the respective best (ref:alad/train.py:552-557 copy-on-best for BOTH
    gates; the reference's ndcg gate is wired but defect-disabled upstream -
    here it is live whenever an NDCG scorer is configured).

    Saves retry up to 10 times (the reference's blob-storage resilience loop,
    ref:oscar/run_retrieval.py:296-313) - the only failure-recovery mechanism
    the reference has besides manual --resume (SURVEY.md S5.3).
    """
    from aladin_tpu.parallel.distributed import barrier, is_main_process

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(out_dir, name))
    payload = {
        "params": _to_host(state.params),  # collective on multi-host (see _to_host)
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "best_rsum": float(best_rsum),
    }
    # write to a temp sibling, then swap — deleting the old checkpoint
    # before the new one exists would leave NO resume point if every save
    # attempt fails (the exact storage outage the retry loop is for)
    tmp = path + ".tmp"
    ckptr = ocp.PyTreeCheckpointer()
    if jax.process_count() > 1:
        # EVERY process calls the orbax save: it coordinates internally
        # (primary host writes the replicated host arrays; rank-0-only save
        # would deadlock against orbax's own multihost sync — ADVICE r2 #2,
        # proven by tests/test_distributed.py). Shared output dir assumed;
        # no retry loop across a collective.
        if is_main_process() and os.path.exists(tmp):
            shutil.rmtree(tmp)
        barrier("ckpt_tmp_clear")
        ckptr.save(tmp, payload)
    else:
        last_err = None
        for attempt in range(retries):
            try:
                if os.path.exists(tmp):
                    shutil.rmtree(tmp)
                ckptr.save(tmp, payload)
                last_err = None
                break
            except Exception as e:  # noqa: BLE001 - retry any IO-layer failure
                last_err = e
                import time

                time.sleep(min(2**attempt, 30))
        if last_err is not None:
            raise last_err
    if is_main_process():
        import json

        with open(os.path.join(tmp, "experiment_config.json"), "w") as f:
            json.dump(config_dict, f, indent=2, default=str)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        for flag, tag in ((is_best_rsum, "model_best_rsum"),
                          (is_best_ndcgspice, "model_best_ndcgspice")):
            if flag:
                best = os.path.join(out_dir, tag)
                best_tmp = best + ".tmp"
                if os.path.exists(best_tmp):
                    shutil.rmtree(best_tmp)
                shutil.copytree(path, best_tmp)
                if os.path.exists(best):
                    shutil.rmtree(best)
                os.replace(best_tmp, best)
    # rank 0's swap is ordered before anyone resumes from the path
    barrier("ckpt_save")
    return path


def is_pytorch_checkpoint(path: str) -> bool:
    """Reference checkpoints are single files (``model_best_rsum.pth.tar``,
    ref:alad/train.py:552-557); ours are orbax directories."""
    return os.path.isfile(path)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (payload dict, embedded experiment config dict).

    Accepts BOTH checkpoint families: an orbax directory written by
    :func:`save_checkpoint`, or a released reference ``.pth.tar`` file
    (converted on load via io/convert.load_aladin_checkpoint; the embedded
    reference YAML config dict comes back as-is - ExperimentConfig.from_dict
    reads its dash-spelled keys directly). The pytorch payload carries model
    params only (``payload["format"] == "pytorch"``); optimizer state does
    not cross the framework boundary.
    """
    import json

    path = os.path.abspath(path)
    if is_pytorch_checkpoint(path):
        from aladin_tpu.io.convert import load_aladin_checkpoint

        tree, config, meta = load_aladin_checkpoint(path)
        payload = {
            "params": {"model": tree},
            "step": int(meta["Eiters"]),
            "epoch": int(meta["epoch"]),
            "best_rsum": 0.0,
            "format": "pytorch",
        }
        return payload, config
    payload = ocp.PyTreeCheckpointer().restore(path)
    cfg_file = os.path.join(path, "experiment_config.json")
    config = {}
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            config = json.load(f)
    return payload, config


def resume_state(state, path: str):
    """Full resume: params + optimizer state + step (ref:train.py:287-297).
    Returns (state, start_epoch, best_rsum).

    The optimizer state restores via a TEMPLATED orbax restore against the
    current state's tree (namedtuple structure preserved, leaf-by-leaf shape
    check below), so a checkpoint whose optax layout differs from the
    running configuration (e.g. freeze_teran toggled between save and
    resume) fails loudly instead of silently transplanting leaves.

    A reference ``.pth.tar`` resumes model weights + epoch + Eiters only:
    torch Adam moments cannot become optax state, so the optimizer restarts
    fresh (logged as a warning; the reference's own --reinitialize-scheduler
    escape hatch, ref:train.py:163,291, acknowledges the same class of
    partial resume)."""
    path = os.path.abspath(path)
    if is_pytorch_checkpoint(path):
        import logging

        payload, _ = load_checkpoint(path)
        merged, stats = merge_params_report(
            jax.tree.map(np.asarray, state.params), payload["params"]
        )
        if stats["matched"] == 0:
            raise ValueError(
                f"{path}: no parameter matched the current model "
                f"(wrong checkpoint for this configuration?)"
            )
        logging.getLogger("vlpretrain").warning(
            "resuming from a PyTorch checkpoint: %d params loaded "
            "(%d missing, %d unused); optimizer state restarts fresh",
            stats["matched"], len(stats["missing"]), len(stats["unused"]),
        )
        restored = state.replace(
            params=jax.tree.map(jax.numpy.asarray, merged),
            step=jax.numpy.asarray(payload["step"], jax.numpy.int32),
        )
        return restored, int(payload["epoch"]), float(payload.get("best_rsum", 0.0))
    template = {
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": 0,
        "epoch": 0,
        "best_rsum": 0.0,
    }
    try:
        payload = ocp.PyTreeCheckpointer().restore(path, item=template)
    except Exception as e:
        raise ValueError(
            f"checkpoint at {path} does not match the current train state "
            f"(optimizer layout or parameter tree changed since save?): {e}"
        ) from e
    for kp, (cur, new) in zip(
        jax.tree_util.tree_flatten_with_path(template["opt_state"])[0],
        zip(jax.tree.leaves(template["opt_state"]), jax.tree.leaves(payload["opt_state"])),
    ):
        if np.shape(cur) != np.shape(new):
            raise ValueError(
                f"opt_state leaf {jax.tree_util.keystr(kp[0])}: checkpoint shape "
                f"{np.shape(new)} != current {np.shape(cur)}"
            )
    restored = state.replace(
        params=jax.tree.map(lambda _, v: jax.numpy.asarray(v), state.params, payload["params"]),
        opt_state=jax.tree.map(lambda _, v: jax.numpy.asarray(v), state.opt_state, payload["opt_state"]),
        step=jax.numpy.asarray(payload["step"], jax.numpy.int32),
    )
    return restored, int(payload["epoch"]), float(payload.get("best_rsum", 0.0))


def merge_params_non_strict(target: Any, source: Any) -> Any:
    """Teacher-model load: copy every leaf present in both trees with a
    matching shape; keep the target elsewhere (torch load_state_dict
    strict=False semantics, ref:train.py:283)."""

    def merge(dst, src):
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if isinstance(src, dict) and k in src:
                    out[k] = merge(v, src[k])
                else:
                    out[k] = v
            return out
        if src is None or not hasattr(src, "shape"):
            return dst
        if tuple(np.shape(src)) == tuple(np.shape(dst)):
            return np.asarray(src).astype(np.asarray(dst).dtype)
        return dst

    return merge(target, source)


def merge_params_report(target: Any, source: Any):
    """:func:`merge_params_non_strict` plus a coverage report: returns
    (merged tree, {"matched": n, "missing": [target paths not in source],
    "unused": [source paths not consumed]}) so callers can log what a
    non-strict load actually did (torch load_state_dict strict=False prints
    the same two lists)."""

    def flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flatten(v, prefix + (k,)))
        elif tree is not None:
            out[prefix] = tree
        return out

    tgt, src = flatten(target), flatten(source)
    matched, missing, unused = 0, [], []
    merged_flat = {}
    for path, dst in tgt.items():
        if path in src and tuple(np.shape(src[path])) == tuple(np.shape(dst)):
            merged_flat[path] = np.asarray(src[path]).astype(np.asarray(dst).dtype)
            matched += 1
        else:
            merged_flat[path] = dst
            missing.append("/".join(map(str, path)))
    for path in src:
        if path not in tgt or tuple(np.shape(src[path])) != tuple(np.shape(tgt[path])):
            unused.append("/".join(map(str, path)))
        # (shape-mismatched paths appear in BOTH lists: kept in target,
        # ignored from source)

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return merged_flat.get(prefix, tree)

    return rebuild(target), {"matched": matched, "missing": missing, "unused": unused}


def load_teacher_params(state, path: str):
    """Weights-only, non-strict load into an existing state
    (ref:train.py:283 load_state_dict strict=False). Accepts an orbax dir or
    a reference ``.pth.tar`` teacher (e.g. the released alignment model)."""
    payload, _ = load_checkpoint(path)
    merged = merge_params_non_strict(jax.tree.map(np.asarray, state.params), payload["params"])
    return state.replace(params=jax.tree.map(jax.numpy.asarray, merged))
