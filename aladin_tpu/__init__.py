"""ALADIN-TPU: a TPU-native image-text matching & retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mesnico/ALADIN
("Distilling Fine-grained Alignment Scores for Efficient Image-Text Matching
and Retrieval", CBMI 2022): an OSCAR/VinVL-style cross-modal BERT backbone run
disentangled over captions and region features, a TERAN-style fine-grained
alignment head, a global-embedding matching head, hinge triplet losses with
hardest-negative mining, alignment->matching score distillation, and sharded
all-pairs Recall@K evaluation on COCO.

Design stance (TPU-first, not a port):
  * pure-function model (Flax linen) with static shapes; lengths are device
    arrays and every mask is derived by `iota < len` broadcasting;
  * losses are pure functions over in-batch score matrices;
  * the B x B x R x W alignment tensor is fused on-chip (Pallas) for the
    all-pairs evaluation path and left to XLA fusion at training scale;
  * parallelism is jax.sharding over a device mesh (dp for training, corpus
    sharding for eval, optional tp over attention heads) - collectives are
    emitted by XLA, never hand-written;
  * the host-side data path (TSV + lineidx random access, base64 region
    features) has a C++ fast path with a pure-Python fallback.

Reference behavior map: see SURVEY.md at the repo root. Citations in
docstrings use ``ref:<path>:<lines>`` and point into the reference tree.
"""

__version__ = "0.1.0"

from aladin_tpu.config import ExperimentConfig, load_config  # noqa: F401
