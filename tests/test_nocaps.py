"""nocaps offline evaluation (eval/nocaps.py) against a tiny fixture.

Covers the reference surface at ref:oscar/utils/caption_evaluate.py:20-57
(prediction TSV -> COCO-format conversion through the image-info id map)
and :318-337 (the NocapsEvaluator per-domain metric restructuring), plus
the local per-domain metric table the reference can only get from EvalAI.
"""

import json

import pytest

from aladin_tpu.eval.nocaps import (
    DOMAINS,
    convert_nocaps_predictions,
    evaluate_nocaps_offline,
    flip_domain_metrics,
    write_evalai_submission,
)

GT = {
    1: ["a dog runs on the grass", "a brown dog running outside"],
    2: ["a red car parked on the street", "a parked red car"],
    3: ["an accordion on a wooden table", "an accordion sits on a table"],
    4: ["two birds on a wire", "birds perched on a power line"],
}
DOMAIN = {1: "in-domain", 2: "in-domain", 3: "out-domain", 4: "near-domain"}
OPEN_ID = {1: "oi_aaa", 2: "oi_bbb", 3: "oi_ccc", 4: "oi_ddd"}


@pytest.fixture
def fixture_files(tmp_path):
    ann = {
        "images": [
            {"id": i, "open_images_id": OPEN_ID[i], "domain": DOMAIN[i]}
            for i in GT
        ],
        "annotations": [
            {"image_id": i, "caption": c, "id": 100 + 10 * i + j}
            for i, caps in GT.items()
            for j, c in enumerate(caps)
        ],
    }
    ann_file = tmp_path / "nocaps_val_ann.json"
    ann_file.write_text(json.dumps(ann))

    # predictions: first GT caption for 3 images, a paraphrase for img 3;
    # second list entry must be ignored (reference takes [0]["caption"])
    rows = []
    for i in GT:
        cap = GT[i][0] if i != 3 else "a shiny accordion on the table"
        rows.append(
            f"{OPEN_ID[i]}\t"
            + json.dumps([{"caption": cap, "conf": 0.9},
                          {"caption": "WRONG second caption"}])
        )
    pred_file = tmp_path / "pred.tsv"
    pred_file.write_text("\n".join(rows) + "\n")
    return str(pred_file), str(ann_file)


def test_convert_predictions(fixture_files, tmp_path):
    pred_file, ann_file = fixture_files
    preds = convert_nocaps_predictions(pred_file, ann_file)
    assert [p["image_id"] for p in preds] == [1, 2, 3, 4]
    assert [p["id"] for p in preds] == [0, 1, 2, 3]  # sequential caption ids
    assert preds[0]["caption"] == GT[1][0]
    assert "WRONG" not in json.dumps(preds)

    out = write_evalai_submission(preds, str(tmp_path / "sub.json"))
    assert json.load(open(out)) == preds


def test_convert_unknown_open_id_raises(fixture_files, tmp_path):
    _, ann_file = fixture_files
    bad = tmp_path / "bad.tsv"
    bad.write_text('oi_nope\t[{"caption": "x"}]\n')
    with pytest.raises(KeyError):
        convert_nocaps_predictions(str(bad), ann_file)


def test_flip_domain_metrics():
    # EvalAI's response shape: a list of one-domain dicts
    response = [
        {"in-domain": {"CIDEr": 80.0, "SPICE": 11.0}},
        {"near-domain": {"CIDEr": 73.0, "SPICE": 10.5}},
        {"out-domain": {"CIDEr": 60.0, "SPICE": 9.0}},
        {"entire": {"CIDEr": 72.0, "SPICE": 10.4}},
    ]
    flipped = flip_domain_metrics(response)
    assert flipped["CIDEr"] == {
        "in-domain": 80.0, "near-domain": 73.0, "out-domain": 60.0,
        "entire": 72.0,
    }
    # reordered response still parses (the reference assumes list order)
    assert flip_domain_metrics(response[::-1]) == flipped
    with pytest.raises(ValueError, match="missing domains"):
        flip_domain_metrics(response[:2])


def test_evaluate_nocaps_offline(fixture_files):
    pred_file, ann_file = fixture_files
    metrics = evaluate_nocaps_offline(pred_file, ann_file)
    for m in ("B1", "B4", "METEOR", "ROUGE-L", "CIDEr"):
        assert m in metrics, metrics.keys()
        assert set(metrics[m]) == set(DOMAINS)
    # in-domain predictions are verbatim GT captions -> perfect BLEU-1
    assert metrics["B1"]["in-domain"] == pytest.approx(1.0)
    # out-domain is a paraphrase -> strictly below the in-domain score
    assert metrics["B1"]["out-domain"] < 1.0
    # 'entire' pools all four images
    assert 0.0 < metrics["B1"]["entire"] <= 1.0


def test_cli_main(fixture_files, tmp_path, capsys):
    from aladin_tpu.eval.nocaps import main

    pred_file, ann_file = fixture_files
    out = str(tmp_path / "submission.json")
    main([pred_file, "--annotations", ann_file, "--out", out])
    assert len(json.load(open(out))) == 4
    printed = capsys.readouterr().out
    assert "CIDEr" in printed and "out-domain" in printed
