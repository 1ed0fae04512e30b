"""SPICE / PTB-tokenizer subprocess protocols executed against stub "jars".

VERDICT r2 missing #3: the temp-file JSON/line protocols in eval/spice.py
(ref:alad/evaluate_utils/spice.py:58-91, ptbtokenizer.py:19-31) had never
executed in CI because no JVM/jars exist in the image. These tests run the
REAL code paths - temp-file writing, argv construction, output parsing,
punct filtering, line-drift detection, cleanup - against python stub
interpreters that speak the same protocols (spice.JAVA override).
"""

import json
import os
import sys
import textwrap

import numpy as np
import pytest

import aladin_tpu.eval.spice as spice_mod


STUB = textwrap.dedent(
    """
    import json, os, sys

    argv = sys.argv[1:]
    if "-cp" in argv:
        # PTBTokenizer protocol: java -cp <jar> edu.stanford...PTBTokenizer
        #                        -preserveLines -lowerCase <file>
        assert argv[argv.index("-cp") + 2] == "edu.stanford.nlp.process.PTBTokenizer"
        assert "-preserveLines" in argv and "-lowerCase" in argv
        path = argv[-1]
        with open(path) as f:
            lines = f.read().split("\\n")
        if os.environ.get("STUB_DROP_LINES"):
            lines = lines[:-1]
        out = []
        for line in lines:
            toks = []
            for w in line.lower().split():
                # split trailing sentence punctuation into its own token,
                # like the real tokenizer, to exercise the punct filter
                while w and w[-1] in ".,!?;:":
                    toks_tail = w[-1]
                    w = w[:-1]
                    toks.append(w) if w else None
                    toks.append(toks_tail)
                    w = ""
                if w:
                    toks.append(w)
            out.append(" ".join(toks))
        sys.stdout.write("\\n".join(out) + "\\n")
    elif "-jar" in argv:
        # SPICE protocol: java -jar -Xmx8G <jar> <in.json> -cache <dir>
        #                 -out <out.json> -subset -silent
        assert argv[0] == "-jar" and argv[1] == "-Xmx8G"
        in_file = argv[3]
        cache = argv[argv.index("-cache") + 1]
        out_file = argv[argv.index("-out") + 1]
        assert "-subset" in argv and "-silent" in argv
        assert os.path.isdir(cache)
        with open(in_file) as f:
            data = json.load(f)
        results = []
        for item in data:
            assert set(item) == {"image_id", "test", "refs"}, item
            assert isinstance(item["refs"], list) and item["refs"]
            test = set(item["test"].split())
            f1 = 0.0
            for ref in item["refs"]:
                r = set(ref.split())
                inter = len(test & r)
                if inter:
                    p, rc = inter / len(test), inter / len(r)
                    f1 = max(f1, 2 * p * rc / (p + rc))
            results.append({"image_id": item["image_id"],
                            "scores": {"All": {"f": f1}}})
        with open(out_file, "w") as f:
            json.dump(results, f)
    else:
        sys.exit(2)
    """
)


@pytest.fixture
def stub_java(tmp_path, monkeypatch):
    stub = tmp_path / "fake_jvm.py"
    stub.write_text(STUB)
    jar = tmp_path / "fake.jar"
    jar.write_text("not a real jar")
    monkeypatch.setattr(spice_mod, "JAVA", [sys.executable, str(stub)])
    monkeypatch.setattr(spice_mod, "SPICE_JAR", str(jar))
    monkeypatch.setattr(spice_mod, "CORENLP_JAR", str(jar))
    return stub


def test_ptb_tokenizer_protocol(stub_java):
    caps = {
        "img1": [{"caption": "A Dog runs."}, {"caption": "Two cats,\nsitting!"}],
        "img2": [{"caption": "THE car."}],
    }
    out = spice_mod.PTBTokenizer().tokenize(caps)
    # per-image grouping preserved, order within an image preserved,
    # lowercased, punctuation tokens filtered (ref:ptbtokenizer.py:45-56)
    assert out == {"img1": ["a dog runs", "two cats sitting"],
                   "img2": ["the car"]}


def test_ptb_line_drift_raises(stub_java, monkeypatch):
    monkeypatch.setenv("STUB_DROP_LINES", "1")
    with pytest.raises(RuntimeError, match="lines for"):
        spice_mod.PTBTokenizer().tokenize(
            {"a": [{"caption": "x y"}], "b": [{"caption": "z w"}]})


def test_ptb_missing_jar_message(tmp_path, monkeypatch):
    monkeypatch.setattr(spice_mod, "CORENLP_JAR", str(tmp_path / "absent.jar"))
    with pytest.raises(FileNotFoundError, match="ALADIN_CORENLP_JAR"):
        spice_mod.PTBTokenizer().tokenize({"a": [{"caption": "x"}]})


def test_spice_protocol_roundtrip(stub_java):
    gts = {0: ["a dog runs fast", "the dog is running"],
           1: ["a red car parked"]}
    res = {0: ["a dog runs fast"], 1: ["a blue boat"]}
    mean, results = spice_mod.Spice().compute_score(gts, res)
    by_id = {r["image_id"]: r["scores"]["All"]["f"] for r in results}
    assert by_id[0] == 1.0  # exact match
    assert 0.0 < by_id[1] < 0.5  # only "a" overlaps
    assert np.isclose(mean, (by_id[0] + by_id[1]) / 2)


def test_spice_relevance_matrix_build(stub_java, tmp_path):
    """method='spice' through compute_relevances: memmap layout + the
    max-over-query-sentences semantics (ref:compute_relevance.py:43-54)."""
    from aladin_tpu.eval.relevance import compute_relevances

    image_caps = [["a dog runs", "dog running"], ["a red car"], ["boat on water"]]
    query_caps = [["a dog runs"], ["boat on water", "a red car"]]
    out = str(tmp_path / "coco-test-spice.npy")
    compute_relevances(query_caps, image_caps, out, method="spice", num_workers=1)

    mm = np.memmap(out, dtype=np.float32, mode="r").reshape(2, 3)
    assert mm[0, 0] == 1.0 and mm[0, 2] < 0.5
    # query 1: max over its two sentences -> perfect on BOTH car and boat
    assert mm[1, 1] == 1.0 and mm[1, 2] == 1.0
    assert mm[1, 0] < 0.5
