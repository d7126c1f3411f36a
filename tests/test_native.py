"""Native C++ preprocessing library tests (vs the numpy/PIL reference)."""

import subprocess
import sys

import numpy as np
import pytest

from ivit_tpu.train.data import eval_transform
from ivit_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def build_native():
    r = subprocess.run(["make", "-C", "native"], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    native._TRIED = False
    native._LIB = None
    assert native.available()


def test_preprocess_matches_python(rng):
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(300, 400), (224, 224), (180, 240), (500, 300)]]
    got = native.preprocess_batch(imgs, out_size=224, num_threads=4)
    assert got.shape == (4, 224, 224, 3)
    for i, im in enumerate(imgs):
        want = eval_transform(im, img_size=224)
        # both are bicubic but with different kernel boundary handling
        # (PIL vs Catmull-Rom); agreement is to interpolation tolerance
        diff = np.abs(got[i] - want)
        assert diff.mean() < 0.1, (i, diff.mean())
        assert np.corrcoef(got[i].ravel(), want.ravel())[0, 1] > 0.99


def test_preprocess_throughput(rng):
    """Native path should beat single-threaded PIL comfortably."""
    import time
    imgs = [rng.integers(0, 256, (320, 320, 3), dtype=np.uint8)
            for _ in range(32)]
    t0 = time.perf_counter()
    native.preprocess_batch(imgs, out_size=224, num_threads=4)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for im in imgs:
        eval_transform(im, img_size=224)
    t_py = time.perf_counter() - t0
    # don't be strict in CI noise; just require it's not slower
    assert t_native < t_py * 1.5, (t_native, t_py)


def test_preprocess_rejects_bad_input(rng):
    with pytest.raises(ValueError):
        native.preprocess_batch([np.zeros((32, 32), np.uint8)])
