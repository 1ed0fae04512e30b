"""CI lock for the day-one parity harness (cli/parity).

The real-data north star (released .pth.tar + coco_ir -> BASELINE.md diff)
cannot execute in this image (zero egress); this locks the ENTIRE command
end-to-end on the synthetic reference-format fixture so the first real run
is pure data-path risk: reference-format checkpoint in, one encode pass,
1k/5k/5-fold protocols for both heads, serial latency, PASS/FAIL report
with --strict gating and --expected_json overrides.
"""

import json
import os

import numpy as np
import pytest

import jax

COMMON = [
    "--max_seq_length", "20", "--max_img_seq_length", "12",
    "--img_feature_dim", "32", "--synthetic",
]
RECIPE = "aladin_tpu/configs/alad-alignment-and-matching-distill.yaml"


def _run(tmp_path, extra, workdir=None):
    from aladin_tpu.cli.parity import main

    workdir = workdir or str(tmp_path)
    report_dir = os.path.join(workdir, "parity")
    rc = main(["--config", RECIPE, "--output_dir", workdir,
               "--report_dir", report_dir, "--latency_serial", "8",
               *COMMON, *extra])
    rpath = os.path.join(report_dir, "parity_report.json")
    report = json.load(open(rpath)) if os.path.exists(rpath) else None
    return rc, report, report_dir


def test_parity_harness_sections(tmp_path):
    """The one command produces every section of the report: both heads on
    1k/5k/5-fold, latency, and gating checks; exit 0."""
    rc, report, report_dir = _run(tmp_path, [])
    assert rc == 0
    for proto in ("matching_5k", "alignment_5k", "matching_5fold",
                  "alignment_5fold", "matching_1k", "alignment_1k"):
        assert "rsum" in report["results"][proto], proto
    # the 1k subset must be a strict subset of the 5k set (fixture halves)
    assert 0 < report["n_images_1k"] < report["n_images_5k"]
    assert report["latency"]["matching_serial_s_per_query"] is None or \
        report["latency"]["matching_serial_s_per_query"] > 0
    names = {c["check"] for c in report["checks"]}
    assert names == {"matching_rsum_1k", "alignment_rsum_1k",
                     "matching_serial_s_per_query",
                     "alignment_serial_s_per_query"}
    # joint profile (loss-type alignment-distillation): matching row gates
    by = {c["check"]: c["status"] for c in report["checks"]}
    assert by["matching_rsum_1k"] in ("PASS", "FAIL")
    assert by["alignment_rsum_1k"].startswith("INFO")
    md = open(os.path.join(report_dir, "parity_report.md")).read()
    assert "Gating checks" in md and "Overall:" in md


def test_parity_strict_gating_and_overrides(tmp_path):
    """--expected_json targets gate regardless of profile; --strict turns a
    FAIL into exit 1; achievable targets pass."""
    impossible = tmp_path / "impossible.json"
    impossible.write_text(json.dumps({"alignment_rsum_1k": 9999.0}))
    rc, report, _ = _run(
        tmp_path, ["--strict", "--skip_latency",
                   "--expected_json", str(impossible)],
        workdir=str(tmp_path / "a"))
    assert rc == 1 and report["pass"] is False
    by = {c["check"]: c["status"] for c in report["checks"]}
    assert by["alignment_rsum_1k"] == "FAIL"

    achievable = tmp_path / "achievable.json"
    achievable.write_text(json.dumps({
        "alignment_rsum_1k": report["results"]["alignment_1k"]["rsum"],
        "matching_rsum_1k": report["results"]["matching_1k"]["rsum"],
    }))
    rc2, report2, _ = _run(
        tmp_path, ["--strict", "--skip_latency",
                   "--expected_json", str(achievable)],
        workdir=str(tmp_path / "b"))
    assert rc2 == 0 and report2["pass"] is True


def test_subset_rows_order_and_missing(tmp_path, caplog):
    """_subset_rows returns buffer rows grouped per image, in keys-file
    order, and tolerates keys absent from the split."""
    from aladin_tpu.cli.parity import _subset_rows
    import logging

    keys_path = tmp_path / "keys.tsv"
    keys_path.write_text("104\n101\n999\n")
    logger = logging.getLogger("test")
    rows, n = _subset_rows([100, 101, 102, 103, 104], 5, str(keys_path), logger)
    assert n == 2
    np.testing.assert_array_equal(
        rows, np.concatenate([np.arange(20, 25), np.arange(5, 10)]))


@pytest.mark.slow
def test_parity_on_released_format_checkpoint(tmp_path):
    """The MIGRATION.md day-one command: a reference-format .pth.tar runs
    through the harness with full coverage (0 missing / 0 unused)."""
    import argparse

    from aladin_tpu.cli.common import (
        add_shared_flags, build_model_and_params, build_tokenizer,
        example_batch_from_loader, prepare_synthetic, to_data_args,
    )
    from aladin_tpu.config import load_config
    from aladin_tpu.data.dataset import RetrievalDataset
    from aladin_tpu.data.pipeline import BatchLoader
    from aladin_tpu.io.convert import save_aladin_checkpoint

    workdir = str(tmp_path)
    parser = argparse.ArgumentParser()
    add_shared_flags(parser)
    ns = parser.parse_args([*COMMON, "--output_dir", workdir])
    args = to_data_args(ns)
    cfg = load_config(RECIPE)
    args = prepare_synthetic(args)
    tokenizer = build_tokenizer(args)
    ds = RetrievalDataset(tokenizer, args, "test", is_train=False)
    loader = BatchLoader(ds, cfg.training.bs, shuffle=False, drop_last=False)
    example = example_batch_from_loader(loader)
    _, params, _ = build_model_and_params(cfg, args, example)

    ckpt = os.path.join(workdir, "model_best_rsum.pth.tar")
    save_aladin_checkpoint(ckpt, jax.tree.map(np.asarray, params),
                           cfg.to_dict(), epoch=9, eiters=900)

    rc, report, _ = _run(tmp_path, ["--load_checkpoint", ckpt])
    assert rc == 0
    cov = report["coverage"]
    assert cov["matched"] > 20 and cov["missing"] == 0 and cov["unused"] == 0
    assert report["checkpoint"] == ckpt
    assert report["profile"] == "joint"
