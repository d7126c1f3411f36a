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
    """Native path throughput vs single-threaded PIL (report, not assert:
    wall-clock ratios flake under CI CPU contention)."""
    import time
    imgs = [rng.integers(0, 256, (320, 320, 3), dtype=np.uint8)
            for _ in range(32)]
    best_native = min(
        _timed(lambda: native.preprocess_batch(imgs, out_size=224,
                                               num_threads=4))
        for _ in range(3))
    best_py = min(_timed(lambda: [eval_transform(im, img_size=224)
                                  for im in imgs]) for _ in range(2))
    print(f"native {best_native * 1e3:.0f} ms vs PIL {best_py * 1e3:.0f} ms")
    # generous bound: must at least be in the same league
    assert best_native < best_py * 3


def _timed(fn):
    import time
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_preprocess_rejects_bad_input(rng):
    with pytest.raises(ValueError):
        native.preprocess_batch([np.zeros((32, 32), np.uint8)])
