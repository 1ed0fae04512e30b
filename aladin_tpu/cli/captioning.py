"""Image captioning driver - the ``oscar/run_captioning.py`` equivalent.

Reference capability (ref:oscar/run_captioning.py:195-1009): masked-caption
LM training over (caption, OD tags, regions) streams with the block
attention layout, greedy/beam inference through the masked-LM decoder, and
COCO caption metrics. TPU-native: the tensorizer emits static shapes, the decoders are
single jitted lax.scan programs - full-recompute by default, or the
KV-cached prefill+step engine (tasks/decode_cache.py, --kv_cache) which
reproduces the reference's history_state serving path - and metrics run
host-side (eval/caption_metrics: BLEU-1..4, ROUGE-L, CIDEr-D, METEOR,
SPICE when the jar is present).

  python -m aladin_tpu.cli.captioning --synthetic --epochs 8   # train+eval
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aladin_tpu.cli.common import add_hidden_act_flag
from aladin_tpu.cli.pretrain import make_optimizer
from aladin_tpu.data.tokenizer import encode_trunc_any
from aladin_tpu.eval.caption_metrics import evaluate_captions
from aladin_tpu.models.bert_img import BertImgConfig
from aladin_tpu.tasks.captioning import (
    BertImageCaptioner,
    CaptionTensorizer,
    _decode_attention_mask,
    beam_search_decode,
    captioning_loss,
    greedy_decode,
)
from aladin_tpu.tasks.task_inputs import ImageFeatureProvider
from aladin_tpu.utils.logging import setup_logger
from aladin_tpu.utils.rng import make_training_key


def gather_masked(logits, masked_idx):
    """(B, L, V) logits + (B, M) positions -> (B*M, V) masked-slot logits."""
    out = jnp.take_along_axis(logits, masked_idx[:, :, None], axis=1)
    return out.reshape(-1, logits.shape[-1])


def masked_positions(masked_pos: np.ndarray, max_masked: int) -> np.ndarray:
    """Binary (B, L) mask -> (B, M) position indices (0-padded; position 0 is
    CLS, never masked, so 0 doubles as the inactive slot)."""
    b = masked_pos.shape[0]
    out = np.zeros((b, max_masked), np.int32)
    for i in range(b):
        idx = np.where(masked_pos[i] == 1)[0][:max_masked]
        out[i, : len(idx)] = idx
    return out


def decode_inputs(tok, tz: CaptionTensorizer, od_labels, feats_list):
    """Static decode-time inputs for a batch: padded od ids/segments, padded
    features, per-example static block mask."""
    la, lt, li = tz.max_seq_a_len, tz.max_seq_len, tz.max_img_seq_len
    od_width = lt - la
    ids, segs, feats, masks = [], [], [], []
    for od, f in zip(od_labels, feats_list):
        body = encode_trunc_any(tok, od or "", od_width - 1)
        row = body + [tz.sep_id]
        od_len = len(row)
        row = row + [tz.pad_id] * (od_width - od_len)
        ids.append(row)
        segs.append([1] * od_len + [0] * (od_width - od_len))
        img_len = min(f.shape[0], li)
        out = np.zeros((li, tz.img_feature_dim), np.float32)
        out[:img_len] = f[:img_len, : tz.img_feature_dim]
        feats.append(out)
        masks.append(_decode_attention_mask(la, lt, li, od_len, img_len))
    return (np.asarray(ids, np.int32), np.asarray(segs, np.int32),
            np.stack(feats), np.stack(masks))


def detokenize(tok, rows: np.ndarray) -> list:
    """Token-id rows -> caption strings (stop at SEP, drop specials, undo
    wordpiece '##' continuation)."""
    inv = {v: k for k, v in tok.vocab.items()}
    sep = tok.vocab[tok.sep_token]
    special = {tok.vocab[t] for t in
               (tok.cls_token, tok.sep_token, tok.pad_token, tok.mask_token)}
    out = []
    for row in rows:
        words = []
        for t in row.tolist():
            if t == sep:
                break
            if t in special:
                continue
            piece = inv.get(t, tok.unk_token)
            if piece.startswith("##") and words:
                words[-1] += piece[2:]
            else:
                words.append(piece)
        out.append(" ".join(words))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="image captioning on TPU")
    p.add_argument("--data_dir", default="datasets/coco_caption")
    p.add_argument("--img_feat_file", default="")
    p.add_argument("--eval_model_dir", default="", help="vocab/backbone source")
    p.add_argument("--output_dir", default="output/captioning")
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_seq_a_length", type=int, default=40)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--img_feature_dim", type=int, default=2054)
    add_hidden_act_flag(p)
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--max_masked_tokens", type=int, default=3)
    p.add_argument("--label_smoothing", type=float, default=0.1)
    p.add_argument("--drop_worst_ratio", type=float, default=0.0)
    p.add_argument("--drop_worst_after", type=int, default=0)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--eval_batch_size", type=int, default=64,
                   help="decode batch at eval; inputs are built and decoded "
                        "per batch so the image set never materializes whole")
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--num_beams", type=int, default=1,
                   help="1 = greedy, >1 = beam search")
    p.add_argument("--scst_epochs", type=int, default=0,
                   help="self-critical (CIDEr-reward) fine-tune epochs after "
                        "CE training (ref:run_captioning.py:522-580)")
    p.add_argument("--scst_lr", type=float, default=1e-5)
    p.add_argument("--scst_top_k", type=int, default=5)
    p.add_argument("--kv_cache", action="store_true",
                   help="decode with the prefill+step KV-cache engine "
                        "(tasks/decode_cache.py) instead of full recompute; "
                        "identical outputs, lower per-step cost")
    p.add_argument("--use_cbs", action="store_true",
                   help="constrained beam search over detection-derived FSMs "
                        "(ref:run_captioning.py --use_cbs / oscar/utils/cbs.py)")
    p.add_argument("--min_constraints_to_satisfy", type=int, default=2)
    p.add_argument("--log_step", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_shape", default="dp=-1",
                   help="dp mesh for data-parallel CE training (the "
                        "reference's DDP wrap, ref:run_captioning.py:412-415)")
    p.add_argument("--synthetic", action="store_true")
    ns = p.parse_args(argv)
    logger = setup_logger("vlpretrain", ns.output_dir)

    if ns.synthetic:
        from aladin_tpu.data.dataset import make_synthetic_dataset

        ns.data_dir = os.path.join(ns.output_dir, "synthetic_caption")
        make_synthetic_dataset(ns.data_dir, n_images=8, feat_dim=ns.img_feature_dim)
    if not ns.img_feat_file:
        ns.img_feat_file = os.path.join(ns.data_dir, "features.tsv")

    if ns.eval_model_dir:
        from aladin_tpu.data.tokenizer import BertWordPieceTokenizer

        tok = BertWordPieceTokenizer.from_pretrained(ns.eval_model_dir)
    else:
        from aladin_tpu.cli.common import build_tokenizer
        from aladin_tpu.config import DataArgs

        tok = build_tokenizer(DataArgs())

    provider = ImageFeatureProvider(ns.img_feat_file)
    with open(os.path.join(ns.data_dir, "train_captions.json")) as f:
        captions = {str(k): v for k, v in json.load(f).items()}
    keys = sorted(captions.keys())
    items = [(k, c) for k in keys for c in captions[k]]
    logger.info(f"{len(items)} (image, caption) pairs / {len(keys)} images")

    tz = CaptionTensorizer(
        tok, max_img_seq_length=ns.max_img_seq_length,
        max_seq_length=ns.max_seq_length, max_seq_a_length=ns.max_seq_a_length,
        mask_prob=ns.mask_prob, max_masked_tokens=ns.max_masked_tokens,
        img_feature_dim=ns.img_feature_dim, is_train=True, seed=ns.seed,
    )

    if ns.synthetic:
        cfg = BertImgConfig(hidden_act=ns.hidden_act, vocab_size=tok.vocab_size, hidden_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=128, max_position_embeddings=256,
                            img_feature_dim=ns.img_feature_dim)
    else:
        cfg = BertImgConfig(hidden_act=ns.hidden_act, vocab_size=tok.vocab_size,
                            img_feature_dim=ns.img_feature_dim)
    model = BertImageCaptioner(cfg)

    def collate(batch_items):
        rows = [tz.tensorize(c, provider.get_od_labels(k), provider.get_image(k))
                for k, c in batch_items]
        ids, attn, seg, feats, mpos, mids = (np.stack(x) for x in zip(*rows))
        midx = masked_positions(mpos, ns.max_masked_tokens)
        return ids, attn, seg, feats, midx, mids.astype(np.int32)

    rng = np.random.RandomState(ns.seed)
    bs = min(ns.train_batch_size, len(items))
    b0 = collate(items[:bs])
    params = model.init(jax.random.PRNGKey(ns.seed), *b0[:4])["params"]
    steps_per_epoch = max(len(items) // bs, 1)
    tx, _ = make_optimizer(ns.learning_rate, ns.warmup_steps,
                           ns.epochs * steps_per_epoch)
    opt_state = tx.init(params)
    from aladin_tpu.cli.common import setup_dp_mesh

    params, opt_state, put = setup_dp_mesh(ns.mesh_shape, bs, params, opt_state,
                                           logger)

    @jax.jit
    def train_step(params, opt_state, ids, attn, seg, feats, midx, mids, epoch, key):
        def loss_fn(p):
            logits = model.apply({"params": p}, ids, attn, seg, feats, False,
                                 rngs={"dropout": key})
            masked = gather_masked(logits, midx)
            return captioning_loss(
                masked, mids.reshape(-1), ns.label_smoothing,
                ns.drop_worst_ratio, epoch >= ns.drop_worst_after)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    key = make_training_key(ns.seed)  # rbg on TPU (utils/rng.py)
    for epoch in range(ns.epochs):
        t0, losses = time.time(), []
        order = rng.permutation(len(items))
        for i in range(steps_per_epoch):
            batch = collate([items[j] for j in order[i * bs : (i + 1) * bs]])
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, *map(put, batch), jnp.int32(epoch), sub)
            losses.append(loss)
        vals = jax.device_get(losses)
        logger.info(f"epoch {epoch} loss {np.mean(vals):.4f} ({time.time() - t0:.1f}s)")

    # decode-time inputs are built PER BATCH of keys — materializing the
    # whole image set at once ((N, 50, 2054) float32) cannot scale past toy
    # data (real COCO test is 5k-113k images)
    def build_inputs(sel_keys):
        return decode_inputs(tok, tz,
                             [provider.get_od_labels(k) for k in sel_keys],
                             [provider.get_image(k) for k in sel_keys])

    common = dict(max_steps=ns.max_seq_a_length - 1,
                  cls_id=tok.vocab[tok.cls_token], sep_id=tok.vocab[tok.sep_token],
                  mask_id=tok.vocab[tok.mask_token], pad_id=tz.pad_id)

    if ns.scst_epochs > 0:
        from aladin_tpu.tasks.captioning import sample_decode, token_logprobs
        from aladin_tpu.tasks.scst import ScstRewardCriterion

        scst = ScstRewardCriterion()
        sb = min(ns.train_batch_size, len(keys))
        # horizon in OPTIMIZER STEPS (batches), not examples — otherwise the
        # linear decay barely moves over the whole fine-tune
        tx2, _ = make_optimizer(ns.scst_lr, 0,
                                ns.scst_epochs * max(len(keys) // sb, 1))
        opt2 = tx2.init(params)

        @jax.jit
        def scst_step(params, opt_state, sampled, advantage, od_i, od_s, f, m):
            def loss_fn(p):
                lps, tmask = token_logprobs(
                    model, p, sampled, od_i, od_s, f, m,
                    mask_id=common["mask_id"], pad_id=common["pad_id"])
                return ScstRewardCriterion.loss(advantage, lps, tmask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx2.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        for epoch in range(ns.scst_epochs):
            t0, losses, rews = time.time(), [], []
            order = rng.permutation(len(keys))
            for s in range(0, len(keys) - sb + 1, sb):
                sel = order[s : s + sb]
                od_i, od_s, f, m = build_inputs([keys[j] for j in sel])
                key, k1 = jax.random.split(key)
                if ns.kv_cache:
                    from aladin_tpu.tasks.decode_cache import (
                        greedy_decode_cached,
                        sample_decode_cached,
                    )

                    sampled = sample_decode_cached(
                        params, od_i, od_s, f, m, k1, cfg=cfg,
                        top_k=ns.scst_top_k, **common)
                    greedy, _ = greedy_decode_cached(
                        params, od_i, od_s, f, m, cfg=cfg, **common)
                else:
                    sampled = sample_decode(model, params, od_i, od_s, f, m, k1,
                                            top_k=ns.scst_top_k, **common)
                    greedy, _ = greedy_decode(model, params, od_i, od_s, f, m,
                                              **common)
                samp_str = detokenize(tok, np.asarray(sampled))
                base_str = detokenize(tok, np.asarray(greedy))
                gt_sets = [captions[keys[j]] for j in sel]
                adv = scst.rewards(samp_str, base_str, gt_sets).astype(np.float32)
                params, opt2, loss = scst_step(
                    params, opt2, sampled, jnp.asarray(adv), od_i, od_s, f, m)
                losses.append(float(loss))
                rews.append(float(adv.mean()))
            logger.info(f"scst epoch {epoch} loss {np.mean(losses):.4f} "
                        f"mean-advantage {np.mean(rews):.4f} ({time.time() - t0:.1f}s)")
    if ns.use_cbs and ns.kv_cache:
        logger.warning("--kv_cache has no effect with --use_cbs: the "
                       "constrained beam search decoder is full-recompute")

    def decode_chunk(ck):
        """Decode one fixed-size batch of image keys -> (len(ck), L) ids."""
        od_ids, od_seg, feats, masks = build_inputs(ck)
        if ns.use_cbs:
            from aladin_tpu.tasks.cbs import (
                ConstraintFilter,
                FiniteStateMachineBuilder,
                cbs_decode,
                select_best_beam_with_constraints,
            )

            filt = ConstraintFilter()
            builder = FiniteStateMachineBuilder(tok.vocab_size)
            tables, n_cons, max_states = [], [], 1
            for k in ck:
                objs = provider.get_objects(k)
                names = filt(
                    np.asarray([o.get("rect", [0, 0, 1, 1]) for o in objs], np.float32),
                    [o["class"] for o in objs],
                    np.asarray([o.get("conf", 1.0) for o in objs], np.float32),
                ) if objs else []
                forms = [[tok.convert_tokens_to_ids(tok.tokenize(n))] for n in names]
                forms = [f for f in forms if f and f[0]]
                nxt, n_states = builder.build(forms)
                tables.append(nxt)
                n_cons.append(len(forms))
                max_states = max(max_states, n_states)
            # pad every FSM to the chunk max state count (extra states are
            # unreachable identity rows; select_best only scans main states)
            padded = np.stack([
                np.concatenate([
                    t, np.tile(np.arange(t.shape[0], max_states, dtype=np.int32)[:, None],
                               (1, tok.vocab_size)),
                ]) if t.shape[0] < max_states else t
                for t in tables
            ])
            beams, scores_b, _ = cbs_decode(
                model, params, od_ids, od_seg, feats, masks, jnp.asarray(padded),
                num_beams=max(ns.num_beams, 2), num_states=max_states, **common)
            toks, _ = select_best_beam_with_constraints(
                np.asarray(beams), np.asarray(scores_b), np.asarray(n_cons),
                ns.min_constraints_to_satisfy)
            return np.asarray(toks)
        if ns.num_beams > 1:
            if ns.kv_cache:
                from aladin_tpu.tasks.decode_cache import beam_search_decode_cached

                toks, _ = beam_search_decode_cached(
                    params, od_ids, od_seg, feats, masks, cfg=cfg,
                    num_beams=ns.num_beams, **common)
            else:
                toks, _ = beam_search_decode(model, params, od_ids, od_seg, feats,
                                             masks, num_beams=ns.num_beams, **common)
        elif ns.kv_cache:
            from aladin_tpu.tasks.decode_cache import greedy_decode_cached

            toks, _ = greedy_decode_cached(params, od_ids, od_seg, feats, masks,
                                           cfg=cfg, **common)
        else:
            toks, _ = greedy_decode(model, params, od_ids, od_seg, feats, masks,
                                    **common)
        return np.asarray(toks)

    # decode every image once in fixed-size batches (tail padded to the
    # compiled shape), score against the reference captions
    eb = min(ns.eval_batch_size, len(keys))
    parts = []
    for s in range(0, len(keys), eb):
        ck = list(keys[s : s + eb])
        pad = eb - len(ck)
        if pad:
            ck = ck + [ck[-1]] * pad
        parts.append(decode_chunk(ck)[: eb - pad])
    toks = np.concatenate(parts)
    hyps = detokenize(tok, np.asarray(toks))
    preds = {k: [h] for k, h in zip(keys, hyps)}
    gts = {k: captions[k] for k in keys}
    metrics = evaluate_captions(preds, gts)
    logger.info("caption metrics: " +
                " ".join(f"{k} {v:.4f}" for k, v in metrics.items()
                         if isinstance(v, float)))
    os.makedirs(ns.output_dir, exist_ok=True)
    with open(os.path.join(ns.output_dir, "predictions.json"), "w") as f:
        json.dump([{"image_id": k, "caption": h} for k, h in zip(keys, hyps)], f)
    with open(os.path.join(ns.output_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
