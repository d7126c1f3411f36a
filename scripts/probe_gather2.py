"""Probe 2: gather envelope details for the round-4 LUT design.

a) lane-gather with lane dim < 128 (Swin n=56, ViT tail 72)
b) lane-gather applied to a [R, 200] operand via two column slices
c) in-kernel reshape [R, 1] -> [R//128, 128] (LayerNorm Newton-chain layout)
d) XLA (non-Pallas) jnp.take of a 256-entry table — cost on TPU
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, args, out_shape, want=None):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*[jnp.asarray(a) for a in args])
        out = np.asarray(jax.block_until_ready(out))
        ok = True if want is None else np.array_equal(out, want)
        print(f"{name}: compiled, exact={ok}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


rng = np.random.default_rng(0)

# --- a) narrow lanes ---
for L in (56, 72):
    R = 256
    tab = rng.integers(0, 999, size=(L,)).astype(np.float32)
    idx = rng.integers(0, L, size=(R, L)).astype(np.int32)
    want = tab[idx]
    t2 = np.broadcast_to(tab[None, :], (R, L)).copy()

    def k(idx_ref, t_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], idx_ref[...], axis=1)

    try_kernel(f"narrow L={L}", k, [idx, t2], (R, L), want)

# --- b) [R, 200] via two slices, 256-entry table as two 128-lane banks ---
R, C, T = 512, 200, 256
tab = rng.integers(0, 2**24, size=(T,)).astype(np.float32)
idx = rng.integers(0, T, size=(R, C)).astype(np.int32)
want = tab[idx]
bank = np.stack([np.broadcast_to(tab[:128][None], (R, 128)),
                 np.broadcast_to(tab[128:][None], (R, 128))])  # [2, R, 128]


def k_sliced(idx_ref, bank_ref, o_ref):
    for lo in (0, 128):
        w = min(128, C - lo)
        ix = idx_ref[:, lo:lo + w]
        t0 = bank_ref[0, :, :w] if w < 128 else bank_ref[0]
        t1 = bank_ref[1, :, :w] if w < 128 else bank_ref[1]
        # two-bank lookup: bank = ix >> 7, lane = ix & 127
        lane = jnp.bitwise_and(ix, 127)
        g0 = jnp.take_along_axis(t0[...] if w == 128 else bank_ref[0, :, :w],
                                 lane, axis=1)
        g1 = jnp.take_along_axis(t1[...] if w == 128 else bank_ref[1, :, :w],
                                 lane, axis=1)
        o_ref[:, lo:lo + w] = jnp.where(ix < 128, g0, g1)


try_kernel("two-bank [R,200]", k_sliced, [idx, bank], (R, C), want)

# --- c) reshape [R,1] -> [R//128, 128] in-kernel ---
R = 1024
v = rng.random((R, 1)).astype(np.float32)


def k_reshape(v_ref, o_ref):
    x = v_ref[...].reshape(R // 128, 128)
    x = jnp.sqrt(x)
    o_ref[...] = x.reshape(R, 1)


try_kernel("reshape R,1 -> R/128,128", k_reshape, [v], (R, 1),
           np.sqrt(v))

# --- d) XLA take on TPU: cost of a 256-entry lookup over a big tensor ---
x = rng.integers(0, 256, size=(256 * 600, 200)).astype(np.int32)
tabj = jnp.asarray(tab)
xj = jnp.asarray(x)


@jax.jit
def f_take(x, t):
    return jnp.take(t, x, axis=0)


@jax.jit
def f_arith(x):
    # ~30-op stand-in for the exp tower
    y = x.astype(jnp.float32)
    for _ in range(10):
        y = jnp.floor(y * 0.5) + jnp.floor(y * 0.25) - y
    return y


for name, f, args in [("xla_take", f_take, (xj, tabj)),
                      ("xla_arith30", f_arith, (xj,))]:
    try:
        o = jax.block_until_ready(f(*args))
        ts = time.perf_counter()
        for _ in range(20):
            o = f(*args)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - ts) / 20
        print(f"{name}: {dt*1e3:.3f} ms for {x.size/1e6:.1f}M elements")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
