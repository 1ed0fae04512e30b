"""End-to-end CLI smoke locked into the suite: train one epoch on the
synthetic dataset, evaluate the saved checkpoint, resume - through the real
command-line entry points (the reference's de-facto regression harness,
SURVEY.md S4 'eval-as-test')."""

import os

import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


COMMON = [
    "--max_seq_length", "20", "--max_img_seq_length", "12",
    "--img_feature_dim", "32", "--synthetic",
]


def test_train_test_resume_cycle(workdir):
    from aladin_tpu.cli.test import main as test_main
    from aladin_tpu.cli.train import main as train_main

    runs = os.path.join(workdir, "runs")
    rc = train_main([
        "--config", "aladin_tpu/configs/alad-alignment-and-matching-distill.yaml",
        "--output_dir", workdir, "--logger_name", runs,
        "--num_epochs", "1", "--val_step", "0", "--log_step", "100", *COMMON,
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(runs, "checkpoint"))
    assert os.path.isdir(os.path.join(runs, "model_best_rsum"))

    rc = test_main([
        "--load_checkpoint", os.path.join(runs, "model_best_rsum"),
        "--output_dir", workdir, "--logger_name", os.path.join(workdir, "runs_test"),
        *COMMON,
    ])
    assert rc == 0

    rc = train_main([
        "--config", "aladin_tpu/configs/alad-alignment-and-matching-distill.yaml",
        "--output_dir", workdir, "--logger_name", os.path.join(workdir, "runs2"),
        "--num_epochs", "2", "--val_step", "0", "--log_step", "100",
        "--resume", os.path.join(runs, "checkpoint"), *COMMON,
    ])
    assert rc == 0
