"""Probe: which same-shape dynamic-gather forms does Mosaic lower?

Round-4 feasibility for VERDICT item 1 (freeze-time exact nonlinearity
LUTs).  Mosaic's gather is a same-shape per-element shuffle: probe lane
(axis=1, 128-entry) and sublane (axis=0, 8-entry) variants plus dtypes.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, shape, axis, dtype=np.float32):
    R, C = shape
    T = shape[axis]
    rng = np.random.default_rng(0)
    table_np = rng.integers(0, 120, size=(T,)).astype(dtype)
    idx_np = rng.integers(0, T, size=(R, C)).astype(np.int32)
    want = table_np[idx_np]
    if axis == 1:
        tab2 = np.broadcast_to(table_np[None, :], (R, T)).copy()
    else:
        tab2 = np.broadcast_to(table_np[:, None], (T, C)).copy()

    def kernel(idx_ref, t_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], idx_ref[...], axis=axis)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(idx_np), jnp.asarray(tab2))
        out = np.asarray(jax.block_until_ready(out))
        ok = np.array_equal(out, want)
        print(f"{name} {shape} axis={axis} {np.dtype(dtype).name}: exact={ok}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name} {shape} axis={axis} {np.dtype(dtype).name}: "
              f"FAIL {type(e).__name__}: {msg}")
        return False


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    ok = False
    ok |= run("lane", (256, 128), 1)            # 128-entry lane shuffle f32
    ok |= run("lane", (8, 128), 1)
    ok |= run("lane", (256, 256), 1)            # 256 lanes (2 tiles)?
    ok |= run("sublane", (8, 128), 0)
    ok |= run("sublane", (16, 128), 0)          # 16 sublanes (2 tiles)?
    ok |= run("lane-i32", (256, 128), 1, np.int32)
    sys.exit(0 if ok else 1)
