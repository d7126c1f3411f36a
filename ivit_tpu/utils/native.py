"""ctypes bindings for the native C++ preprocessing runtime.

``native/preproc.cpp`` (built to ``libivit_preproc.so`` by ``make -C
native``) provides multi-threaded bicubic resize + center-crop + normalize
for the eval/serving data path — the framework's native equivalent of the
reference's torch-DataLoader C++ workers.  Falls back to the numpy/PIL path
when the library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

from ..train.data import IMAGENET_MEAN, IMAGENET_STD

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libivit_preproc.so"),
                 os.environ.get("IVIT_PREPROC_LIB", "")):
        if cand and os.path.exists(cand):
            return cand
    return None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ivit_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.ivit_preprocess_batch.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def preprocess_batch(images: Sequence[np.ndarray], out_size: int = 224,
                     num_threads: int = 8) -> np.ndarray:
    """Eval-preprocess a list of HWC uint8 images -> [N, S, S, 3] float32.

    Native fast path (multi-threaded C++); raises if the library is absent —
    callers check :func:`available` and fall back to the PIL path.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native preproc library not built; "
                           "run `make -C native`")
    n = len(images)
    heights = np.asarray([im.shape[0] for im in images], np.int32)
    widths = np.asarray([im.shape[1] for im in images], np.int32)
    sizes = (heights.astype(np.int64) * widths * 3)
    offsets = np.zeros(n, np.int64)
    offsets[1:] = np.cumsum(sizes)[:-1]
    data = np.empty(int(sizes.sum()), np.uint8)
    for i, im in enumerate(images):
        if im.ndim != 3 or im.shape[2] != 3 or im.dtype != np.uint8:
            raise ValueError(f"image {i}: expected HWC uint8 RGB, "
                             f"got {im.shape} {im.dtype}")
        data[offsets[i]:offsets[i] + sizes[i]] = im.reshape(-1)

    out = np.empty((n, out_size, out_size, 3), np.float32)
    mean = np.ascontiguousarray(IMAGENET_MEAN, np.float32)
    std = np.ascontiguousarray(IMAGENET_STD, np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ivit_preprocess_batch(
        ptr(data, ctypes.c_uint8), ptr(offsets, ctypes.c_int64),
        ptr(heights, ctypes.c_int32), ptr(widths, ctypes.c_int32),
        n, out_size, ptr(mean, ctypes.c_float), ptr(std, ctypes.c_float),
        ptr(out, ctypes.c_float), num_threads)
    return out
