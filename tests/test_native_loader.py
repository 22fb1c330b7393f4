"""Native C++ feature loader: build, parity with the python path, batch API."""

import os

import numpy as np
import pytest

from gvl_tpu.data.features import load_video_features, resize_feature
from gvl_tpu.native import (load_batch_native, load_resize_native,
                            native_available)


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feats")
    rng = np.random.RandomState(0)
    shapes = [(37, 16), (5, 16), (1, 16), (64, 16)]
    for i, (t, c) in enumerate(shapes):
        np.save(d / f"vid{i}.npy", rng.randn(t, c).astype(np.float32))
    np.save(d / "vid_f64.npy", rng.randn(11, 16))  # float64
    return str(d)


def test_native_builds():
    assert native_available(), "C++ loader failed to build"


@pytest.mark.parametrize("method", ["nearest", "linear"])
def test_native_matches_python_resize(npy_dir, method):
    for name in ["vid0", "vid1", "vid2", "vid3", "vid_f64"]:
        path = os.path.join(npy_dir, name + ".npy")
        raw = np.load(path).astype(np.float32)
        want = resize_feature(raw, 24, method) if len(raw) != 24 else raw
        got, ok = load_resize_native(path, 24, 16, method)
        assert ok
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_native_missing_file(npy_dir):
    got, ok = load_resize_native(os.path.join(npy_dir, "nope.npy"), 10, 16)
    assert not ok
    assert (got == 0).all()


def test_native_batch(npy_dir):
    paths = [os.path.join(npy_dir, f"vid{i}.npy") for i in range(4)]
    paths.append(os.path.join(npy_dir, "missing.npy"))
    feats, ok = load_batch_native(paths, 24, 16)
    assert feats.shape == (5, 24, 16)
    assert ok.tolist() == [True, True, True, True, False]
    assert (feats[4] == 0).all()


def test_load_video_features_uses_native(npy_dir):
    out, missing = load_video_features(
        "vid0", "npy", npy_dir, 16, data_rescale=True,
        frame_embedding_num=24)
    raw = np.load(os.path.join(npy_dir, "vid0.npy"))
    want = resize_feature(raw.astype(np.float32), 24, "nearest")
    np.testing.assert_allclose(out, want, rtol=1e-5)
    assert not missing
