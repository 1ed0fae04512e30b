"""Interop against a checkpoint the repo did NOT write (VERDICT r3 weak #6).

tests/test_checkpoint_interop.py locks load_aladin_checkpoint against this
repo's own inverse converter — if both sides shared a naming misconception,
those tests would still pass. Here the fixture ``.pth.tar`` is authored by
torch itself: a module tree assembled so torch's own attribute-path naming
produces exactly the released checkpoint's key layout
(ref:alad/alad_model.py:29-118 — ``img_txt_enc.oscar_model.bert.*`` for the
OSCAR backbone per ref:oscar/modeling/modeling_bert.py:150-279, torch
``nn.TransformerEncoder`` stacks for the matching head), with values drawn
randomly by torch initializers. The loader must map every tensor, ignore
the constructed-but-unused modules (img_proj / cap_proj / classifier,
ref:alad/alad_model.py:84-85 — never called in forward), and the converted
tree must drop straight into our flax model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_models import SMALL, make_batch
from tests.test_train import make_model

torch = pytest.importorskip("torch")
nn = torch.nn

E = SMALL["hidden_size"]  # embed-size == hidden: the shipped configs' layout


def _ns(**children):
    """A bare nn.Module with the given named children — torch derives
    state_dict keys purely from these attribute paths, which is exactly the
    property under test (the key names come from torch, not from us)."""
    m = nn.Module()
    for k, v in children.items():
        setattr(m, k, v)
    return m


def _bert_layer(h, i):
    return _ns(
        attention=_ns(**{
            "self": _ns(query=nn.Linear(h, h), key=nn.Linear(h, h),
                        value=nn.Linear(h, h)),
            "output": _ns(dense=nn.Linear(h, h),
                          LayerNorm=nn.LayerNorm(h, eps=1e-12)),
        }),
        intermediate=_ns(dense=nn.Linear(h, i)),
        output=_ns(dense=nn.Linear(i, h), LayerNorm=nn.LayerNorm(h, eps=1e-12)),
    )


def build_reference_module(tern_layers=1):
    """Reference-layout ALADIN module: same attribute paths as
    ref:alad/alad_model.py:250-259 (ALADModel.img_txt_enc) over
    ref:oscar/modeling/modeling_bert.py:150-279 (BertImgModel)."""
    h, i = SMALL["hidden_size"], SMALL["intermediate_size"]
    torch.manual_seed(7)
    bert = _ns(
        embeddings=_ns(
            word_embeddings=nn.Embedding(SMALL["vocab_size"], h),
            position_embeddings=nn.Embedding(SMALL["max_position_embeddings"], h),
            token_type_embeddings=nn.Embedding(2, h),
            LayerNorm=nn.LayerNorm(h, eps=1e-12),
        ),
        encoder=_ns(layer=nn.ModuleList(
            [_bert_layer(h, i) for _ in range(SMALL["num_hidden_layers"])]
        )),
        pooler=_ns(dense=nn.Linear(h, h)),
        img_embedding=nn.Linear(SMALL["img_feature_dim"], h),
        LayerNorm=nn.LayerNorm(h, eps=1e-12),  # image-feature LN (ref :181)
    )
    tern_layer = nn.TransformerEncoderLayer(
        d_model=E, nhead=4, dim_feedforward=E, dropout=0.1)
    img_txt_enc = _ns(
        oscar_model=_ns(bert=bert, classifier=nn.Linear(h, 2)),
        img_proj=nn.Linear(h, E),  # constructed but unused (ref :84-85)
        cap_proj=nn.Linear(h, E),
        final_projection_net=nn.TransformerEncoder(
            tern_layer, num_layers=tern_layers),
    )
    return _ns(img_txt_enc=img_txt_enc)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


@pytest.fixture(scope="module")
def reference_ckpt(tmp_path_factory):
    ref = build_reference_module()
    path = str(tmp_path_factory.mktemp("ref") / "model_best_rsum.pth.tar")
    config = {
        "dataset": {"name": "coco"},
        "model": {"embed-size": E, "tern-layers": 1, "teran-layers": 0,
                  "shared-transformer": True, "dropout": 0.1,
                  "text-aggregation": "first", "image-aggregation": "first"},
        "training": {"loss-type": "alignment-distillation",
                     "loss-weights": [1, 1], "measure": "dot",
                     "margin": 0.2, "max-violation": True, "bs": 4},
    }
    torch.save(
        {"epoch": 5, "model": ref.state_dict(), "optimizer": {},
         "scheduler": {}, "opt": {}, "config": config, "Eiters": 321},
        path,
    )
    return path, ref.state_dict()


def test_loads_torch_authored_checkpoint(reference_ckpt, rng):
    """load_aladin_checkpoint on a tree torch named: full structural match
    with our flax params + value-level spot checks + a live forward."""
    from aladin_tpu.io.convert import load_aladin_checkpoint

    path, sd = reference_ckpt
    tree, cfg_back, meta = load_aladin_checkpoint(path)
    assert meta == {"epoch": 5, "Eiters": 321}
    assert cfg_back["model"]["tern-layers"] == 1

    model, _cfg = make_model()
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch, True)["params"]

    got, want = _flatten(tree), _flatten(params)
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)

    # value-level: embeddings copy straight, dense kernels transpose,
    # the packed in_proj splits into q/k/v
    np.testing.assert_array_equal(
        got[("oscar", "word_embeddings", "embedding")],
        sd["img_txt_enc.oscar_model.bert.embeddings.word_embeddings.weight"].numpy())
    np.testing.assert_array_equal(
        got[("oscar", "layer_0", "attention", "query", "kernel")],
        sd["img_txt_enc.oscar_model.bert.encoder.layer.0.attention.self.query.weight"].numpy().T)
    np.testing.assert_array_equal(
        got[("oscar", "img_embedding", "kernel")],
        sd["img_txt_enc.oscar_model.bert.img_embedding.weight"].numpy().T)
    in_proj = sd["img_txt_enc.final_projection_net.layers.0.self_attn.in_proj_weight"].numpy()
    np.testing.assert_array_equal(
        got[("final_projection_net", "layer_0", "self_attn", "q_proj", "kernel")],
        in_proj[:E].T)
    np.testing.assert_array_equal(
        got[("final_projection_net", "layer_0", "self_attn", "v_proj", "kernel")],
        in_proj[2 * E :].T)

    # the converted tree runs as-is through the flax model (deterministic)
    out = model.apply({"params": tree}, batch, True)
    img, cap = np.asarray(out.img_global), np.asarray(out.cap_global)
    assert np.isfinite(img).all() and np.isfinite(cap).all()
    np.testing.assert_allclose(np.linalg.norm(img, axis=-1), 1.0, atol=1e-5)


def test_export_matches_torch_naming(reference_ckpt, rng, tmp_path):
    """The inverse direction against torch-authored names: every key
    save_aladin_checkpoint emits must exist in the torch module's own
    state_dict with the same tensor shape (the reference loads with
    strict=False, ref:alad/test.py:245, so our export being a subset —
    missing only the unused img_proj/cap_proj/classifier — is exactly
    loadable there)."""
    from aladin_tpu.io.convert import save_aladin_checkpoint

    _path, sd = reference_ckpt
    model, cfg = make_model()
    params = model.init(jax.random.PRNGKey(0), make_batch(rng), True)["params"]
    out = str(tmp_path / "export.pth.tar")
    save_aladin_checkpoint(out, jax.tree.map(np.asarray, params),
                           cfg.to_dict(), epoch=1, eiters=1)
    exported = torch.load(out, map_location="cpu", weights_only=False)["model"]
    assert exported, "export emitted no tensors"
    missing = [k for k in exported if k not in sd]
    assert not missing, missing[:10]
    for k, v in exported.items():
        assert tuple(v.shape) == tuple(sd[k].shape), (k, v.shape, sd[k].shape)
    # and the unused reference modules are the ONLY keys we do not emit
    leftover = {k.split(".")[1] for k in sd if k not in exported}
    assert leftover <= {"img_proj", "cap_proj", "oscar_model"}, leftover
    oscar_left = [k for k in sd if k not in exported
                  and k.startswith("img_txt_enc.oscar_model.")]
    assert all("classifier" in k for k in oscar_left), oscar_left[:5]
