"""Data layer tests: tokenizer parity vs HuggingFace, TSV roundtrip,
dataset/collate semantics on a synthetic on-disk fixture."""

import json
import os

import numpy as np
import pytest

from aladin_tpu.config import DataArgs
from aladin_tpu.data.dataset import (
    DisentangledTensorizer,
    RetrievalDataset,
    make_synthetic_dataset,
)
from aladin_tpu.data.tokenizer import BertWordPieceTokenizer, load_vocab
from aladin_tpu.data.tsv import TSVFile, decode_region_features, write_tsv

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the of photo number dog cat car tree person "
    "boat bird house un ##aff ##able runn ##ing 1 2 3 0 , . ! ? ' d ##og s ##now "
    "snow ##ball ball play ##ed play ##s un ##b ##el ##ie ##v ##ab ##ly green "
    "##1 ##2 ##3 ho ##use"
).split()


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    # dedup preserving order
    seen, toks = set(), []
    for t in VOCAB:
        if t not in seen:
            seen.add(t)
            toks.append(t)
    p.write_text("\n".join(toks) + "\n")
    return str(p)


def test_tokenizer_matches_hf(vocab_file):
    from transformers import BertTokenizer

    ours = BertWordPieceTokenizer(load_vocab(vocab_file))
    hf = BertTokenizer(vocab_file, do_lower_case=True)
    cases = [
        "a photo of a dog",
        "The DOG played snowball!",
        "unaffable, runningly?? plays 123",
        "  weird   spacing\tand\ncontrol\x00chars",
        "café résumé naïve",  # accents strip to unknown pieces
        "greenhouse",
        "",
        "a" * 150,  # > max_chars_per_word -> [UNK]
    ]
    for text in cases:
        assert ours.tokenize(text) == hf.tokenize(text), text
        assert ours.encode(text) == hf.convert_tokens_to_ids(hf.tokenize(text)), text


def test_native_tokenizer_parity(vocab_file):
    """The C++ WordPiece fast path (native/wordpiece.cpp) must produce the
    exact id sequence of the Python tokenizer for ASCII text — including
    truncation, controls, punctuation, never-split markers — and decline
    (fall back inside encode_trunc) on non-ASCII."""
    import random
    import string

    tok = BertWordPieceTokenizer(load_vocab(vocab_file), vocab_file=vocab_file)
    assert tok.native_enabled, "native wordpiece failed to build/load"

    cases = [
        "a photo of a dog",
        "The DOG played snowball!",
        "unaffable, runningly?? plays 123",
        "  weird   spacing\tand\ncontrol\x00chars",
        "café résumé naïve",  # non-ASCII -> python fallback path
        "[MASK] a [SEP] dog [UNK] [mask]",
        "greenhouse", "", "   ", "!!!", "a" * 150, "a-b.c's 1,2,3",
    ]
    for text in cases:
        full = tok.convert_tokens_to_ids(tok.tokenize(text))
        for cap in (64, 5, 1, 0):
            assert tok.encode_trunc(text, cap) == full[:cap], (text, cap)

    # a whitespace-delimited run longer than the C++ 4096-byte token buffer:
    # must DECLINE to the python fallback, not silently truncate - the tail
    # ".of the" would otherwise vanish from the id stream (ADVICE r2 #1)
    text = "a" * 4100 + ".of the"
    full = tok.convert_tokens_to_ids(tok.tokenize(text))
    assert len(full) >= 3  # [UNK] . of ...
    assert tok.encode_trunc(text, 64) == full[:64]

    rnd = random.Random(7)
    alphabet = string.ascii_letters + string.digits + string.punctuation + "  \t"
    for _ in range(500):
        text = "".join(rnd.choice(alphabet)
                       for _ in range(rnd.randint(0, 60)))
        full = tok.convert_tokens_to_ids(tok.tokenize(text))
        assert tok.encode_trunc(text, 64) == full[:64], text


def test_tensorizer_identical_with_and_without_native(vocab_file):
    """The tensorizer's id-level assembly must be invariant to whether the
    tokenizer carries the C++ fast path (same Example arrays either way)."""
    py_tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    nat_tok = BertWordPieceTokenizer(load_vocab(vocab_file),
                                     vocab_file=vocab_file)
    assert not py_tok.native_enabled and nat_tok.native_enabled
    feats = np.random.RandomState(0).rand(7, 2054).astype(np.float32)
    caption = "The DOG played snowball, unbelievably!"
    labels = "dog snow ball tree person café"  # non-ASCII word -> fallback
    for faithful in (True, False):
        a = DisentangledTensorizer(py_tok, 16, 5,
                                   faithful_image_unk_slot=faithful)
        b = DisentangledTensorizer(nat_tok, 16, 5,
                                   faithful_image_unk_slot=faithful)
        ea, eb = (t.tensorize(caption, labels, feats) for t in (a, b))
        for f in ea.__dataclass_fields__:
            np.testing.assert_array_equal(getattr(ea, f), getattr(eb, f), f)
        ja, jb = (t.tensorize_joint(caption, labels, feats) for t in (a, b))
        for xa, xb in zip(ja, jb):
            np.testing.assert_array_equal(xa, xb)


def test_joint_tensorizer_full_window_caption(vocab_file):
    """A caption that fills max_seq_len-2 wordpieces with non-empty
    od_labels must NOT overflow the static width (room<=0 drops the
    b-segment whole — not even its [SEP] fits); native and Python paths
    must agree. Regression: negative room reached the C encoder as a
    negative cap (crash) and Python's [:-1] slice (silent over-length)."""
    for tok in (BertWordPieceTokenizer(load_vocab(vocab_file)),
                BertWordPieceTokenizer(load_vocab(vocab_file),
                                       vocab_file=vocab_file)):
        tz = DisentangledTensorizer(tok, 8, 3)
        feats = np.zeros((2, 2054), np.float32)
        long_cap = "a photo of a dog cat tree person boat"  # > 6 pieces
        ids, mask, seg, feats_o, seq_a_len, img_len = tz.tensorize_joint(
            long_cap, "dog cat", feats)
        assert ids.shape == (8,) and seg.shape == (8,)
        assert seq_a_len == 8  # [CLS] + 6 + [SEP]
        # b-segment dropped entirely: no segment-1 positions
        np.testing.assert_array_equal(seg, 0)


def test_native_vocab_duplicate_and_crlf_parity(tmp_path):
    """load_vocab semantics the C side must copy exactly: duplicate lines
    -> LAST id wins; Python reads in TEXT mode, so universal newlines
    apply (\\n, \\r\\n, and lone \\r all terminate a line)."""
    p = tmp_path / "dup.txt"
    # 'a' twice; 'c' CRLF-terminated; lone \r splits 'd' and 'e'
    p.write_bytes(b"[UNK]\na\nb\na\nc\r\nd\re")
    vocab = load_vocab(str(p))
    assert vocab["a"] == 3 and vocab["c"] == 4
    assert vocab["d"] == 5 and vocab["e"] == 6
    tok = BertWordPieceTokenizer(vocab, vocab_file=str(p))
    assert tok.native_enabled
    for text in ("a b", "a c b"):
        py = tok.convert_tokens_to_ids(tok.tokenize(text))
        assert tok.encode_trunc(text, 16) == py, text


def test_tokenizer_int_zero_maps_to_unk(vocab_file):
    """The reference image stream leads with the INTEGER 0 (a bug) which
    pytorch_transformers maps to [UNK]; our converter must do the same."""
    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    ids = tok.convert_tokens_to_ids([0, "a", "[SEP]"])
    assert ids[0] == tok.vocab["[UNK]"]


def test_tsv_roundtrip(tmp_path):
    path = str(tmp_path / "t.tsv")
    feats = np.arange(12, dtype=np.float32).reshape(3, 4)
    import base64

    rows = [[1, 3, base64.b64encode(feats.tobytes()).decode()], [2, 1, "x"], [3, 2, "y"]]
    write_tsv(path, rows)
    t = TSVFile(path)
    assert t.num_rows() == 3
    row = t.seek(0)
    assert row[0] == "1" and int(row[1]) == 3
    got = decode_region_features(row[2], 3)
    np.testing.assert_array_equal(got, feats)
    assert t.seek(2)[0] == "3"
    # lineidx regeneration path
    os.remove(str(tmp_path / "t.lineidx"))
    t2 = TSVFile(path)
    assert t2.seek(1)[0] == "2"


@pytest.fixture
def synthetic_root(tmp_path):
    root = str(tmp_path / "coco_ir")
    make_synthetic_dataset(root, n_images=8, feat_dim=32, max_boxes=10)
    return root


def make_args(root, **kw):
    d = dict(
        data_dir=root,
        img_feat_file=os.path.join(root, "features.tsv"),
        max_seq_length=20,
        max_img_seq_length=12,
        img_feature_dim=32,
        add_od_labels=True,
    )
    d.update(kw)
    return DataArgs(**d)


def test_dataset_and_collate(vocab_file, synthetic_root):
    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    ds = RetrievalDataset(tok, make_args(synthetic_root), "train", is_train=True)
    assert len(ds) == 8 * 5
    ex = ds.example(0)
    # text stream: CLS ... SEP
    assert ex.txt_ids[0] == tok.vocab["[CLS]"]
    assert ex.txt_ids[ex.cap_len - 1] == tok.vocab["[SEP]"]
    assert ex.txt_mask[: ex.cap_len].all() and not ex.txt_mask[ex.cap_len :].any()
    # image stream: faithful [UNK] slot + od labels + SEP; segment ids 0,1,1...
    assert ex.img_ids[0] == tok.vocab["[UNK]"]
    assert ex.img_type[0] == 0 and ex.img_type[1] == 1
    # mask layout: L text slots then R region slots
    assert ex.img_mask.shape == (20 + 12,)
    assert ex.img_mask[20 : 20 + ex.img_len].all()
    assert ex.img_feats.shape == (12, 32)
    assert not ex.img_feats[ex.img_len :].any()

    batch = ds.collate(list(range(6)))
    assert batch["txt_ids"].shape == (6, 20)
    assert batch["img_feats"].shape == (6, 12, 32)
    # same image for the first 5 entries (5 captions per image)
    np.testing.assert_array_equal(batch["img_feats"][0], batch["img_feats"][4])
    assert (batch["img_feats"][0] != batch["img_feats"][5]).any()


def test_eval_subset(vocab_file, synthetic_root):
    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    with open(os.path.join(synthetic_root, "subset.tsv"), "w") as f:
        f.write("100\n102\n")
    ds = RetrievalDataset(
        tok, make_args(synthetic_root, eval_img_keys_file="subset.tsv"), "test", is_train=False
    )
    assert ds.img_keys == [100, 102]
    assert len(ds) == 10


def test_pipeline_prefetch(vocab_file, synthetic_root):
    from aladin_tpu.data.pipeline import BatchLoader

    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    ds = RetrievalDataset(tok, make_args(synthetic_root), "train", is_train=True)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b.txt_ids.shape == (8, 20)
    assert b.img_feats.shape == (8, 12, 32)
    # shuffling differs across epochs
    b2 = next(iter(loader.epoch(1)))
    assert (np.asarray(b.txt_ids) != np.asarray(b2.txt_ids)).any()


def test_loader_thread_pool_deterministic(vocab_file, synthetic_root):
    """The thread pool changes throughput, never content or order: byte-equal
    batches for 1 vs 4 workers (exercises the thread-safe readers)."""
    from aladin_tpu.data.pipeline import BatchLoader

    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    ds = RetrievalDataset(tok, make_args(synthetic_root), "train", is_train=True)
    solo = list(BatchLoader(ds, 8, shuffle=True, seed=3, num_threads=1).epoch(0))
    pooled = list(BatchLoader(ds, 8, shuffle=True, seed=3, num_threads=4).epoch(0))
    assert len(solo) == len(pooled)
    for a, b in zip(solo, pooled):
        np.testing.assert_array_equal(np.asarray(a.txt_ids), np.asarray(b.txt_ids))
        np.testing.assert_array_equal(np.asarray(a.img_feats), np.asarray(b.img_feats))


def test_native_reader_thread_safety(synthetic_root):
    """Hammer one NativeFeatureReader from 8 threads; every read must match
    the single-threaded ground truth (pread + thread-local buffers)."""
    from concurrent.futures import ThreadPoolExecutor

    from aladin_tpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    reader = native.NativeFeatureReader(os.path.join(synthetic_root, "features.tsv"))
    n = reader.num_rows()
    expected = [reader.read_features(i) for i in range(n)]
    idxs = [i % n for i in range(512)]
    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(reader.read_features, idxs))
    for i, got in zip(idxs, results):
        np.testing.assert_array_equal(got, expected[i])


def test_trim_batch_slices_consistently(vocab_file, synthetic_root):
    from aladin_tpu.data.pipeline import trim_batch

    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    ds = RetrievalDataset(tok, make_args(synthetic_root), "train", is_train=True)
    d = ds.collate(list(range(8)))
    t = trim_batch(d, 4)
    l_t, r = d["txt_ids"].shape[1], d["img_feats"].shape[1]
    m_t, m_r = t["txt_ids"].shape[1], t["img_feats"].shape[1]
    assert m_t % 4 == 0 or m_t == l_t
    assert m_t >= d["cap_len"].max() and m_r >= d["img_len"].max()
    # label lengths preserved: trimmed mask text slots cover all real labels
    lab_len = d["img_mask"][:, :l_t].sum(1)
    assert m_t >= lab_len.max()
    np.testing.assert_array_equal(t["txt_ids"], d["txt_ids"][:, :m_t])
    np.testing.assert_array_equal(t["img_mask"][:, :m_t], d["img_mask"][:, :m_t])
    np.testing.assert_array_equal(t["img_mask"][:, m_t:], d["img_mask"][:, l_t : l_t + m_r])
    np.testing.assert_array_equal(t["img_feats"], d["img_feats"][:, :m_r])
    # no real content beyond the trim point
    assert not d["txt_mask"][:, m_t:].any()
    assert not d["img_mask"][:, l_t + m_r :].any()


def test_bucketed_encode_matches_plain(vocab_file, synthetic_root):
    """Length-sorted + trimmed encode must reproduce the plain encode
    buffers exactly after inverse permutation (the --bucketed_encode path)."""
    import jax

    from aladin_tpu.config import ExperimentConfig
    from aladin_tpu.data.pipeline import BatchLoader
    from aladin_tpu.eval.encode import encode_data
    from aladin_tpu.models.aladin import ALADIN
    from aladin_tpu.models.bert_img import BertImgConfig
    from aladin_tpu.train.step import make_eval_step

    tok = BertWordPieceTokenizer(load_vocab(vocab_file))
    ds = RetrievalDataset(tok, make_args(synthetic_root), "test", is_train=False)
    cfg = ExperimentConfig.from_dict(
        {"model": {"embed-size": 32, "tern-layers": 1},
         "training": {"loss-type": "matching"}})
    bert_cfg = BertImgConfig(vocab_size=tok.vocab_size, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=4,
                             intermediate_size=64, max_position_embeddings=64,
                             img_feature_dim=32)
    model = ALADIN(cfg, bert_cfg)

    plain = BatchLoader(ds, 8, shuffle=False, drop_last=False, num_threads=1)
    bucketed = BatchLoader(ds, 8, shuffle=False, drop_last=False, num_threads=1,
                           sort_by_length=True, trim_multiple=4)
    params = model.init(jax.random.PRNGKey(0), next(iter(plain.epoch(0))), True)["params"]
    step = make_eval_step(model)

    buf = max(20, 12) + 1
    ie, ce, il, cl = encode_data(step, params, plain, buffer_len=buf)
    ie2, ce2, il2, cl2 = encode_data(step, params, bucketed, buffer_len=buf)
    inv = np.argsort(bucketed.row_order(0), kind="stable")
    np.testing.assert_array_equal(il, il2[inv])
    np.testing.assert_array_equal(cl, cl2[inv])
    # compare only REAL positions: beyond each row's length the plain
    # buffers hold pad-token model outputs while trimmed buffers hold the
    # untouched zeros — every consumer masks by length (slot 0 = global,
    # alignment scoring masks by img_len/cap_len)
    ie2, ce2 = ie2[inv], ce2[inv]
    for i in range(len(il)):
        np.testing.assert_allclose(ie[i, : il[i]], ie2[i, : il[i]], atol=2e-5)
        np.testing.assert_allclose(ce[i, : cl[i]], ce2[i, : cl[i]], atol=2e-5)
    np.testing.assert_allclose(ie[:, 0], ie2[:, 0], atol=2e-5)  # globals
    np.testing.assert_allclose(ce[:, 0], ce2[:, 0], atol=2e-5)
