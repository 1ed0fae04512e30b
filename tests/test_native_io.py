"""Native C++ IO fast-path tests (skipped when the toolchain is absent)."""

import base64
import os

import numpy as np
import pytest

from aladin_tpu.data.tsv import TSVFile, decode_region_features, write_tsv

native = pytest.importorskip("aladin_tpu.io.native")
if not native.available():
    pytest.skip("libaladin_io.so not buildable", allow_module_level=True)


@pytest.fixture
def feature_tsv(tmp_path, rng):
    path = str(tmp_path / "f.tsv")
    rows, ref = [], []
    for i in range(20):
        nb = int(rng.randint(2, 30))
        feats = rng.randn(nb, 64).astype(np.float32)
        ref.append(feats)
        rows.append([100 + i, nb, base64.b64encode(feats.tobytes()).decode()])
    write_tsv(path, rows)
    return path, ref


def test_native_matches_python(feature_tsv):
    path, ref = feature_tsv
    r = native.NativeFeatureReader(path, max_floats=64 * 64)
    assert r.num_rows() == 20
    t = TSVFile(path)
    for i in range(20):
        got = r.read_features(i)
        row = t.seek(i)
        py = decode_region_features(row[-1], int(row[1]))
        np.testing.assert_array_equal(got, py)
        np.testing.assert_array_equal(got, ref[i])


def test_native_builds_lineidx(feature_tsv):
    path, _ = feature_tsv
    os.remove(os.path.splitext(path)[0] + ".lineidx")
    r = native.NativeFeatureReader(path, max_floats=64 * 64)
    assert r.num_rows() == 20
    assert r.read_features(3).shape[1] == 64


def test_b64_decode_floats_roundtrip(rng):
    x = rng.randn(77).astype(np.float32)
    got = native.b64_decode_floats(base64.b64encode(x.tobytes()))
    np.testing.assert_array_equal(got, x)


def test_native_bad_row_errors(tmp_path):
    path = str(tmp_path / "bad.tsv")
    write_tsv(path, [[1, 2, "!!!not-base64!!!"]])
    r = native.NativeFeatureReader(path, max_floats=100)
    with pytest.raises(IOError):
        r.read_features(0)
