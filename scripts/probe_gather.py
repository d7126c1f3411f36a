"""LUT-gather feasibility probe (gates IVIT_LUT in scripts/tpu_session_r4.sh).

Compiles and value-checks EXACTLY the construction the LUT kernels use
(ops/pallas/block.py): a [nb, 128] table input, in-kernel broadcast of each
bank row across the gather rows, f32-held indices cast to int32, the
2-bank `>= 128` select, and a 2-slab [R, 256] lookup — on the real Mosaic
backend.  Exit 0 = the LUT paths are safe to enable on hardware.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from ivit_tpu.ops.pallas.block import _lut_banks, _lut_lookup  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    R, L, NB = 256, 256, 2
    table = rng.integers(0, 2**24, size=(NB * 128,)).astype(np.float32)
    idx = rng.integers(0, NB * 128, size=(R, L)).astype(np.float32)
    want = table[idx.astype(np.int32)]

    def kernel(idx_ref, lut_ref, o_ref):
        banks = _lut_banks(lut_ref[...], R)
        o_ref[...] = _lut_lookup(idx_ref[...], banks)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(table).reshape(NB, 128))
    out = np.asarray(jax.block_until_ready(out))
    ok = np.array_equal(out, want)
    print(f"lut-gather kernel construction: exact={ok} "
          f"(backend={jax.default_backend()})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
