"""On-disk search index: persisted encode buffers + metadata.

The deploy-time artifact behind cli/search: one ``build`` pass over a
dataset + checkpoint produces this directory, after which queries never
touch the dataset or re-encode the corpus (the amortized-corpus serving
story of the ALADIN paper — the matching head makes the corpus *indexable*,
ref:alad/plots/plot_efficiency_vs_effectiveness.py:12-15; the reference has
no persistence surface at all, its eval re-encodes the corpus every run,
ref:alad/test.py:253-276).

Layout: ``<dir>/embeddings.npz`` (token-set buffers with the slot-0 global
packing of eval/encode.py, images deduplicated to one row per image) +
``<dir>/index_meta.json`` (experiment config, data args, checkpoint path,
image keys, caption texts — everything query-time needs to rebuild the
query encoder and to print human-readable results).

Token sets store float16 by default: the device-side corpus is bf16 anyway
(eval/search.build_corpus; rank parity at bf16 store is test-locked in
tests/test_search.py), and fp16's extra mantissa over bf16 makes the
f16 -> bf16 hop benign for L2-normalized embeddings. Slot-0 globals are
kept separately in f32 so stage-1 scoring precision never degrades.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict

import numpy as np

META_NAME = "index_meta.json"
NPZ_NAME = "embeddings.npz"


@dataclass
class SearchIndex:
    """Host-side view of a persisted index (numpy; device placement happens
    in :meth:`corpus`)."""

    img_sets: np.ndarray  # (N_img, S, D) deduped, slot-0 global packing
    img_lens: np.ndarray  # (N_img,)
    cap_sets: np.ndarray  # (N_cap, S, D)
    cap_lens: np.ndarray  # (N_cap,)
    img_glob: np.ndarray  # (N_img, D) f32 slot-0 rows
    cap_glob: np.ndarray  # (N_cap, D) f32
    meta: Dict

    @property
    def n_images(self) -> int:
        return self.img_sets.shape[0]

    @property
    def n_captions(self) -> int:
        return self.cap_sets.shape[0]

    @property
    def captions_per_img(self) -> int:
        return int(self.meta.get("captions_per_img", 5))

    def corpus(self, modality: str):
        """Device-resident :class:`~aladin_tpu.eval.search.Corpus` for one
        modality ('image' for t2i search, 'caption' for i2t)."""
        import jax.numpy as jnp

        from aladin_tpu.eval.search import Corpus
        from aladin_tpu.ops.similarity import l2norm

        if modality == "image":
            sets, lens, glob = self.img_sets, self.img_lens, self.img_glob
        elif modality == "caption":
            sets, lens, glob = self.cap_sets, self.cap_lens, self.cap_glob
        else:
            raise ValueError(f"modality must be 'image' or 'caption', got {modality!r}")
        sets = l2norm(jnp.asarray(sets, jnp.float32), eps=1e-12).astype(jnp.bfloat16)
        glob = jnp.asarray(glob, jnp.float32)
        glob = glob / jnp.maximum(jnp.linalg.norm(glob, axis=-1, keepdims=True), 1e-12)
        return Corpus(sets, glob, jnp.asarray(lens, jnp.int32))

    def query_buffers(self, modality: str):
        """(sets, lens) numpy buffers for using index ROWS as queries (the
        curve harness and --query_index; slot-0 packing preserved, f32)."""
        if modality == "image":
            sets = self.img_sets.astype(np.float32)
            sets[:, 0, :] = self.img_glob
            return sets, self.img_lens
        if modality == "caption":
            sets = self.cap_sets.astype(np.float32)
            sets[:, 0, :] = self.cap_glob
            return sets, self.cap_lens
        raise ValueError(f"modality must be 'image' or 'caption', got {modality!r}")


def save_index(
    out_dir: str,
    img_embs: np.ndarray,
    cap_embs: np.ndarray,
    img_lens,
    cap_lens,
    meta: Dict,
    captions_per_img: int = 5,
    store_dtype: str = "float16",
) -> str:
    """Persist eval/encode.py buffers as a search index.

    ``img_embs``/``cap_embs`` are the raw (N_rows, S, D) encode buffers with
    images repeated per caption (the reference's row layout,
    ref:alad/evaluation.py:104-155); images deduplicate here to one row per
    image (row ``i*cpi``, the same convention recall_auxiliary assumes,
    ref:alad/recall_auxiliary.py:14-15).
    """
    os.makedirs(out_dir, exist_ok=True)
    cpi = captions_per_img
    assert img_embs.shape[0] == cap_embs.shape[0], "row-aligned buffers required"
    img_sets = np.ascontiguousarray(img_embs[::cpi])
    img_l = np.asarray(img_lens)[::cpi].astype(np.int32)
    dt = np.dtype(store_dtype)
    np.savez_compressed(
        os.path.join(out_dir, NPZ_NAME),
        img_sets=img_sets.astype(dt),
        cap_sets=cap_embs.astype(dt),
        img_lens=img_l,
        cap_lens=np.asarray(cap_lens, np.int32),
        img_glob=img_sets[:, 0, :].astype(np.float32),
        cap_glob=np.asarray(cap_embs[:, 0, :], np.float32),
    )
    meta = dict(meta)
    meta["captions_per_img"] = cpi
    meta["store_dtype"] = store_dtype
    meta["n_images"] = int(img_sets.shape[0])
    meta["n_captions"] = int(cap_embs.shape[0])
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_index(index_dir: str) -> SearchIndex:
    with open(os.path.join(index_dir, META_NAME)) as f:
        meta = json.load(f)
    z = np.load(os.path.join(index_dir, NPZ_NAME))
    return SearchIndex(
        img_sets=z["img_sets"], img_lens=z["img_lens"],
        cap_sets=z["cap_sets"], cap_lens=z["cap_lens"],
        img_glob=z["img_glob"], cap_glob=z["cap_glob"],
        meta=meta,
    )
