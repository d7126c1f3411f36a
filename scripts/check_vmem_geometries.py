#!/usr/bin/env python
"""Hardware compile-geometry guard (VERDICT r2 item 10, ground truth).

Compiles (AOT, no execution) every fused Pallas block kernel at every real
model geometry on the attached backend.  The round-2 driver bench died on a
scoped-VMEM OOM that only manifests at Mosaic *compile* time at full
geometry — this script makes that class of failure a red step in
scripts/tpu_session.sh instead of a driver-time surprise.

Exit code: 0 iff every (kernel, geometry, family) combination compiles.

Usage: python scripts/check_vmem_geometries.py [--mxu int8|bf16|both]
"""

import argparse
import sys

sys.path.insert(0, ".")

# (name, embed C, heads, n_pad tokens) — ViT/DeiT attention geometries
VIT_GEOMS = [
    ("deit_tiny", 192, 3, 200),
    ("deit_small", 384, 6, 200),
    ("deit_base/vit_base", 768, 12, 200),
    ("vit_large", 1024, 16, 200),
]
# (name, C, heads, window n) — Swin window-attention geometries (T/S/B)
SWIN_GEOMS = [
    ("swin_stage_96", 96, 3, 49),
    ("swin_stage_192", 192, 6, 49),
    ("swin_stage_384", 384, 12, 49),
    ("swin_stage_768", 768, 24, 49),
    ("swin_b_stage_1024", 1024, 32, 49),
]
BATCH_ROWS = 256 * 200      # bench-shape token stream for the MLP kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mxu", default="int8", choices=["int8", "bf16", "both"])
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ivit_tpu.ops.pallas.block as pblk

    rng = np.random.default_rng(0)
    modes = ["int8", "bf16"] if args.mxu == "both" else [args.mxu]
    failures = []

    def compile_only(label, fn, *arrs):
        try:
            jax.jit(fn).lower(*arrs).compile()
            print(f"PASS {label}", flush=True)
        except Exception as exc:  # noqa: BLE001
            failures.append(label)
            print(f"FAIL {label}: {repr(exc)[:300]}", flush=True)

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(rng.integers(-100, 100, size=shape), jnp.int8)
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    for mxu in modes:
        for fam in ("ivit", "ibert"):
            # MLP kernel at every hidden geometry
            for name, c, _h, _n in VIT_GEOMS + SWIN_GEOMS:
                hd = 4 * c
                x = mk((BATCH_ROWS if c <= 768 else BATCH_ROWS // 2, c),
                       jnp.int8)
                kw = dict(
                    ln_bias=mk((c,), jnp.float32), s_ln=mk((c,), jnp.float32),
                    m_ln=jnp.full((c,), 0.01, jnp.float32),
                    ln_shift=jnp.zeros(()), fc1_w=mk((c, hd), jnp.int8),
                    fc1_b=mk((hd,), jnp.float32),
                    m_fc1=jnp.full((hd,), 0.01, jnp.float32),
                    s_gelu=jnp.float32(0.05), m_gelu=jnp.float32(0.01),
                    fc2_w=mk((hd, c), jnp.int8), fc2_b=mk((c,), jnp.float32),
                    m_fc2=jnp.full((c,), 0.01, jnp.float32),
                    m_res_x=jnp.float32(0.5), m_res_id=jnp.float32(0.5),
                    ln_base=fam, gelu_base=fam, mxu=mxu)
                compile_only(f"mlp[{name}] {fam}/{mxu}",
                             lambda a, kw=kw: pblk.mlp_block_p(a, **kw), x)

            # ViT attention kernel
            for name, c, h, n_pad in VIT_GEOMS:
                x = mk((args.batch if c <= 768 else args.batch // 2,
                        n_pad, c), jnp.int8)
                kw = dict(
                    ln_bias=mk((c,), jnp.float32), s_ln=mk((c,), jnp.float32),
                    m_ln=jnp.full((c,), 0.01, jnp.float32),
                    ln_shift=jnp.zeros(()),
                    qkv_w=mk((c, 3 * c), jnp.int8),
                    qkv_b=mk((3 * c,), jnp.float32),
                    m_qkv=jnp.full((3 * c,), 0.01, jnp.float32),
                    m_attn=jnp.float32(0.01), s_attn=jnp.float32(0.05),
                    m_av=jnp.float32(0.01), proj_w=mk((c, c), jnp.int8),
                    proj_b=mk((c,), jnp.float32),
                    m_proj=jnp.full((c,), 0.01, jnp.float32),
                    m_res_x=jnp.float32(0.5), m_res_id=jnp.float32(0.5),
                    num_heads=h, n_valid=n_pad - 3, ln_base=fam,
                    sm_base=fam, s_exp_act=jnp.float32(2**30),
                    mxu=mxu)
                compile_only(f"attn[{name}] {fam}/{mxu}",
                             lambda a, kw=kw: pblk.attn_block_p(a, **kw), x)

            # Swin window-attention kernel
            for name, c, h, n in SWIN_GEOMS:
                nw = 16
                x = mk((4 * nw, n, c), jnp.int8).astype(jnp.int16)
                kw = dict(
                    ln_bias=mk((c,), jnp.float32), s_ln=mk((c,), jnp.float32),
                    m_ln=jnp.full((c,), 0.01, jnp.float32),
                    ln_shift=jnp.zeros(()),
                    qkv_w=mk((c, 3 * c), jnp.int8),
                    qkv_b=mk((3 * c,), jnp.float32),
                    m_qkv=jnp.full((3 * c,), 0.01, jnp.float32),
                    m_attn=jnp.float32(0.01), m_attn2=jnp.float32(1.0),
                    s_attn=jnp.float32(0.05),
                    rel_addend=mk((h, n, n), jnp.float32),
                    mask_addend=None, m_av=jnp.float32(0.01),
                    proj_w=mk((c, c), jnp.int8),
                    proj_b=mk((c,), jnp.float32),
                    m_proj=jnp.full((c,), 0.01, jnp.float32),
                    m_res_x=jnp.float32(0.5), m_res_id=jnp.float32(0.5),
                    num_heads=h, n_windows=nw, ln_base=fam, sm_base=fam,
                    s_exp_act=jnp.float32(2**30), mxu=mxu)
                compile_only(f"swin_attn[{name}] {fam}/{mxu}",
                             lambda a, kw=kw: pblk.swin_attn_block_p(a, **kw),
                             x)

    print(f"\n{len(failures)} failures" + (": " + ", ".join(failures)
                                           if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
