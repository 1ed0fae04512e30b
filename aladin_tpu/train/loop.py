"""The training orchestrator: epochs, in-loop validation, checkpointing.

Mirrors the reference driver (ref:alad/train.py:304-337 main loop, :388-471
train, :473-532 validate):

  * per-step: train_step, meters (batch/data time), tensorboard scalars
    {epoch, step, batch_time, data_time, lr} + loss meters, log every
    log_step (Eiters is the global x-axis);
  * every val_step and at epoch end: validate - encode the minival split,
    matching-head recall always, alignment-head i2t/t2i when the loss type
    includes 'alignment'; rsum = matching rsum (+ alignment rsum), gates the
    best checkpoint (ref:train.py:478-530);
  * checkpoint each validation + epoch with copy-on-best
    (ref:train.py:552-557).

The validation dataset replicates the reference's quirk of being built with
is_train=True (eval subset file bypassed, SURVEY.md S2.6(10)).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aladin_tpu.config import DataArgs, ExperimentConfig
from aladin_tpu.eval.encode import encode_data
from aladin_tpu.eval.recall import compute_recall
from aladin_tpu.eval.retrieval import evaluate_alignment_head
from aladin_tpu.io.checkpoint import save_checkpoint
from aladin_tpu.train.schedule import make_lr_schedule
from aladin_tpu.train.step import make_eval_step, make_multi_train_step, make_train_step
from aladin_tpu.utils.logging import AverageMeter, LogCollector, make_tb_writer, setup_logger
from aladin_tpu.utils.rng import make_training_key


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        args: DataArgs,
        model,
        state,
        train_loader,
        val_loader,
        ndcg_scorer=None,
        use_pallas: Optional[bool] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.args = args
        self.model = model
        self.state = state
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.ndcg_scorer = ndcg_scorer
        self.mesh = mesh
        self.use_pallas = (
            use_pallas if use_pallas is not None else jax.default_backend() == "tpu"
        )

        self.steps_per_dispatch = max(1, int(getattr(args, "steps_per_dispatch", 1)))
        if self.steps_per_dispatch > 1:
            self.multi_step = make_multi_train_step(model, cfg)
        self.train_step = make_train_step(model, cfg)
        self.eval_step = make_eval_step(model)
        self.lr_schedule = make_lr_schedule(cfg.training, max(len(train_loader), 1))
        self.logger = setup_logger("vlpretrain", args.logger_name)
        self.tb = make_tb_writer(args.logger_name)
        self.best_rsum = -1.0
        self.best_ndcgspice = -1.0
        # dropout-stream key; 'auto' = hardware rbg on TPU (utils/rng.py —
        # threefry mask generation measured at ~24% of the B=128 step)
        self.rng = make_training_key(args.seed, cfg.training.rng_impl)

    # ------------------------------------------------------------------
    def fit(self, start_epoch: int = 0):
        for epoch in range(start_epoch, self.args.num_epochs):
            self.train_epoch(epoch)
            rsum, ndcg = self.validate()
            self._checkpoint(epoch, rsum, ndcg)
        return self.state

    def train_epoch(self, epoch: int):
        """One epoch with NO per-step device->host syncs.

        Each step only dispatches the jitted update and buffers the metric
        handles; a single jax.device_get at every log_step boundary fetches
        the whole window at once (through the axon relay one fetch costs
        ~25 ms - per-step fetching was >50% overhead at B=32). TensorBoard
        still receives every step's scalars, written at flush time; the
        global step is tracked on host (state.step is only read on device).

        --steps_per_dispatch K > 1 additionally amortizes the DISPATCH: K
        batches are host-stacked and run as one on-device lax.scan
        (make_multi_train_step — bit-identical math, test-locked), so the
        host pays one dispatch + one transfer per K steps. log_step and
        val_step then fire at window boundaries (each stays >= its
        configured cadence). The epoch remainder (len % K) runs as one
        shorter scan — one extra compile the first time that size occurs.
        """
        batch_time, data_time = AverageMeter(), AverageMeter()
        collector = LogCollector()
        epoch_dev = jnp.int32(epoch)
        k = self.steps_per_dispatch
        # --profile_dir: trace steps [1, 1+profile_steps) of the first epoch
        # this Trainer runs (step 0 is compile; tracing it drowns the steady
        # state). One capture per process. Windowed mode traces the windows
        # covering those steps.
        prof_dir = getattr(self.args, "profile_dir", "")
        prof_steps = int(getattr(self.args, "profile_steps", 5))
        if prof_dir and prof_steps < 1:
            raise ValueError(f"--profile_steps must be >= 1, got {prof_steps}")
        prof_active = False
        prof_start = 1 if len(self.train_loader) > k else 0  # 1-dispatch epochs
        step0 = int(self.state.step)  # one fetch per epoch
        pending = []  # [(global_steps, batch_idxs, device metrics)]
        window_start = time.time()

        def flush(i):
            nonlocal window_start
            if not pending:
                return
            fetched = jax.device_get([m for _, _, m in pending])  # THE sync
            # lr values for the window in ONE device round trip (the
            # schedule is jnp math; per-step float() would be one ~25 ms
            # fetch each, re-adding the overhead this batching removes)
            gsteps = [g for gs, _, _ in pending for g in gs]
            lrs = iter(np.asarray(jax.vmap(self.lr_schedule)(jnp.asarray(gsteps))))
            elapsed = time.time() - window_start
            batch_time.update(elapsed / len(gsteps), n=len(gsteps))
            for (gs, bis, _), m in zip(pending, fetched):
                for j, (gstep, bi) in enumerate(zip(gs, bis)):
                    for key, v in m.items():
                        collector.update(key, float(v if np.ndim(v) == 0 else v[j]), n=1)
                    self.tb.add_scalar("epoch", epoch, gstep)
                    self.tb.add_scalar("step", bi, gstep)
                    self.tb.add_scalar("lr", float(next(lrs)), gstep)
                    collector.tb_log(self.tb, step=gstep)
            last = gsteps[-1]
            self.tb.add_scalar("batch_time", batch_time.val, last)
            self.tb.add_scalar("data_time", data_time.val, last)
            pending.clear()
            window_start = time.time()
            self.logger.info(
                f"Epoch: [{epoch}][{i}/{len(self.train_loader)}]\t{collector}\t"
                f"Time {batch_time}\tData {data_time}"
            )

        def crossed(gstep, width, period):
            # did a positive multiple of `period` land in (gstep-width, gstep]?
            r = gstep % period
            return r < width and r < gstep

        def maybe_validate(gstep, i, width):
            if crossed(gstep, width, self.args.log_step):
                flush(i)
            if self.args.val_step > 0 and crossed(gstep, width, self.args.val_step):
                flush(i)
                rsum, ndcg = self.validate()
                self._checkpoint(epoch, rsum, ndcg)

        ndisp = 0  # dispatches issued (profiling is per-dispatch)

        def prof_tick():
            nonlocal prof_active
            if not prof_dir or getattr(self, "_profiled", False):
                return
            if ndisp == prof_start:
                jax.profiler.start_trace(prof_dir)
                prof_active = True
            elif prof_active and (ndisp - prof_start) * k >= prof_steps:
                jax.block_until_ready(self.state.params)  # drain device
                jax.profiler.stop_trace()
                prof_active = False
                self._profiled = True
                self.logger.info(f"profiler trace ({prof_steps} steps) -> {prof_dir}")

        end = time.time()
        if k == 1:
            for i, batch in enumerate(self.train_loader.epoch(epoch)):
                prof_tick()
                data_time.update(time.time() - end, n=1)
                self.state, metrics = self.train_step(
                    self.state, batch, epoch_dev, self.rng)
                ndisp += 1
                gstep = step0 + i + 1
                pending.append(([gstep], [i], metrics))
                end = time.time()
                maybe_validate(gstep, i, 1)
        else:
            window, widx = [], []
            # batches arrive DEVICE-RESIDENT through the loader's prefetch
            # pipeline exactly as in the K=1 path (batch axis dp-sharded as
            # usual) and are stacked into the scan window INSIDE the jitted
            # multi step — keeping transfers overlapped with compute. A
            # host-side stack + one big window transfer measured SLOWER
            # than K=1 at the loop level (blocking transfer per window).

            def dispatch():
                nonlocal ndisp
                if not window:
                    return
                prof_tick()
                if len(window) == 1:  # 1-step remainder: reuse the single step
                    self.state, metrics = self.train_step(
                        self.state, window[0], epoch_dev, self.rng)
                else:
                    self.state, metrics = self.multi_step(
                        self.state, window, epoch_dev, self.rng)
                ndisp += 1
                gsteps = [step0 + bi + 1 for bi in widx]
                pending.append((gsteps, list(widx), metrics))
                i, width = widx[-1], len(widx)
                window.clear()
                widx.clear()
                maybe_validate(gsteps[-1], i, width)

            for i, batch in enumerate(self.train_loader.epoch(epoch)):
                data_time.update(time.time() - end, n=1)
                window.append(batch)
                widx.append(i)
                if len(window) == k:
                    dispatch()
                end = time.time()
            dispatch()  # epoch remainder
        if prof_active:  # epoch shorter than the trace window
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._profiled = True
            self.logger.info(f"profiler trace -> {prof_dir}")
        flush(max(len(self.train_loader) - 1, 0))

    # ------------------------------------------------------------------
    def validate(self):
        """Returns (rsum, spice_ndcg_sum). The ndcg term is the reference's
        intended-but-disabled gate metric (ref:train.py:514 commented
        spice_ndcg_sum; validate returns (rsum, 0) upstream) - live here when
        an ndcg_scorer is wired, 0 otherwise."""
        if self.val_loader is None:
            return 0.0, 0.0
        step = int(self.state.step)
        img_embs, cap_embs, img_lens, cap_lens = encode_data(
            self.eval_step, self.state.params["model"], self.val_loader, logger=self.logger,
        )
        self.logger.info("Evaluating matching head...")
        if self.mesh is not None:
            from aladin_tpu.eval.recall import compute_recall_from_scores
            from aladin_tpu.parallel.mesh import sharded_matching_scores

            scores = sharded_matching_scores(
                self.mesh, img_embs[::5, 0, :], cap_embs[:, 0, :]
            )
            m = compute_recall_from_scores(np.asarray(scores))
        else:
            m = compute_recall(img_embs[:, 0, :], cap_embs[:, 0, :])
        for k in ("r1", "r5", "r10", "r1i", "r5i", "r10i"):
            src = {
                "r1": "i2t_r1", "r5": "i2t_r5", "r10": "i2t_r10",
                "r1i": "t2i_r1", "r5i": "t2i_r5", "r10i": "t2i_r10",
            }[k]
            self.tb.add_scalar(f"matching/{k}", m[src], step)
        self.tb.add_scalar("matching/rsum", m["rsum"], step)
        rsum = m["rsum"]
        self.logger.info(
            "Matching: i2t %.1f/%.1f/%.1f t2i %.1f/%.1f/%.1f rsum %.1f"
            % (m["i2t_r1"], m["i2t_r5"], m["i2t_r10"],
               m["t2i_r1"], m["t2i_r5"], m["t2i_r10"], m["rsum"])
        )

        if "alignment" in self.cfg.training.loss_types:
            self.logger.info("Evaluating alignment head...")
            # --compute_dtype int8 -> quantized alignment scoring in-loop too
            # (same kernel mode as cli/test; rank parity test-locked)
            scoring_dtype = (
                jnp.int8 if getattr(self.args, "compute_dtype", "") == "int8"
                else jnp.bfloat16
            )
            score_fn = None
            if self.mesh is not None:
                from aladin_tpu.parallel.mesh import sharded_mrsw_scores

                def score_fn(ims, caps, il, cl):
                    return sharded_mrsw_scores(
                        self.mesh, ims, caps, il, cl,
                        aggregation=self.cfg.training.alignment_mode,
                        use_pallas=self.use_pallas,
                        compute_dtype=scoring_dtype,
                    )

            i2t, t2i, _ = evaluate_alignment_head(
                img_embs, cap_embs, img_lens, cap_lens,
                aggregation=self.cfg.training.alignment_mode,
                use_pallas=self.use_pallas,
                compute_dtype=scoring_dtype,
                ndcg_scorer=self.ndcg_scorer,
                score_fn=score_fn,
            )
            rsum_align = (
                i2t["r1"] + i2t["r5"] + i2t["r10"] + t2i["r1"] + t2i["r5"] + t2i["r10"]
            )
            for k, v in (("r1", i2t["r1"]), ("r5", i2t["r5"]), ("r10", i2t["r10"]),
                         ("r1i", t2i["r1"]), ("r5i", t2i["r5"]), ("r10i", t2i["r10"]),
                         ("medr", i2t["medr"]), ("meanr", i2t["meanr"]),
                         ("ndcg_rougel", i2t["ndcg_rougel"] + t2i["ndcg_rougel"]),
                         ("ndcg_spice", i2t["ndcg_spice"] + t2i["ndcg_spice"])):
                self.tb.add_scalar(f"alignment/{k}", v, step)
            self.tb.add_scalar("rsum", rsum_align, step)
            self.logger.info(
                "Alignment: i2t %.1f/%.1f/%.1f t2i %.1f/%.1f/%.1f rsum %.1f "
                "ndcg_rouge %.4f ndcg_spice %.4f"
                % (i2t["r1"], i2t["r5"], i2t["r10"], t2i["r1"], t2i["r5"], t2i["r10"],
                   rsum_align, i2t["ndcg_rougel"] + t2i["ndcg_rougel"],
                   i2t["ndcg_spice"] + t2i["ndcg_spice"])
            )
            rsum += rsum_align
            ndcg_sum = i2t["ndcg_spice"] + t2i["ndcg_spice"]
        else:
            ndcg_sum = 0.0
        return rsum, ndcg_sum

    def _checkpoint(self, epoch: int, rsum: float, ndcg_sum: float = 0.0):
        is_best = rsum > self.best_rsum
        self.best_rsum = max(rsum, self.best_rsum)
        is_best_ndcg = self.ndcg_scorer is not None and ndcg_sum > self.best_ndcgspice
        self.best_ndcgspice = max(ndcg_sum, self.best_ndcgspice)
        save_checkpoint(
            self.args.logger_name, self.state, epoch + 1, self.cfg.to_dict(),
            self.best_rsum, is_best_rsum=is_best, is_best_ndcgspice=is_best_ndcg,
        )
