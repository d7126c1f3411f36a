"""Pallas kernel bit-compatibility tests (interpret mode on CPU).

Each fused kernel must produce exactly the integers of the unfused
``ops/ivit.py`` core it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.ops import ivit
from ivit_tpu.ops.pallas import nonlinear as pk


def test_shiftmax_kernel_matches_core(rng):
    s = np.float32(0.0521371)
    scores = rng.integers(-127, 128, size=(4, 6, 37, 197)).astype(np.int8)
    want, _ = ivit.shiftmax_int(jnp.asarray(scores, jnp.float32),
                                jnp.asarray([s]), 8)
    got = pk.shiftmax_p(jnp.asarray(scores), jnp.asarray(s), 8,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.int32),
                                  np.asarray(want, np.int32))


def test_shiftmax_kernel_row_tiling(rng):
    """Rows not divisible by the tile size must still be exact."""
    s = np.float32(0.061)
    scores = rng.integers(-127, 128, size=(130, 50)).astype(np.int8)
    want, _ = ivit.shiftmax_int(jnp.asarray(scores, jnp.float32),
                                jnp.asarray([s]), 8)
    got = pk.shiftmax_p(jnp.asarray(scores), jnp.asarray(s), 8,
                        tile_rows=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.int32),
                                  np.asarray(want, np.int32))


def test_shift_gelu_requant_kernel_matches_core(rng):
    s = np.float32(0.0417093)
    m_out = np.float32(0.031727)
    x = rng.integers(-127, 128, size=(64, 384)).astype(np.int8)
    y_int, _ = ivit.shift_gelu_int(jnp.asarray(x, jnp.float32),
                                   jnp.asarray([s]), 8)
    want = np.clip(np.round(np.asarray(y_int) * m_out), -128, 127)
    got = pk.shift_gelu_requant_p(jnp.asarray(x), jnp.asarray(s),
                                  jnp.asarray(m_out), 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.int32),
                                  want.astype(np.int32))


def test_engine_standalone_kernels_match_unfused(rng):
    """Mixed families fall back to the standalone fused kernels (shiftmax_p):
    that path must equal the unfused path exactly."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    import ivit_tpu.ops.pallas as ppkg
    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward

    # gelu=ibert disables the fused block path; softmax=ivit still uses the
    # standalone shiftmax kernel
    model, variables = build_calibrated(rng, gelu="ibert", softmax="ivit",
                                        ln="ivit")
    spec = freeze_model(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    base = np.asarray(engine_forward(spec, x, pallas=False))
    ppkg.FORCE_INTERPRET = True
    try:
        fused = np.asarray(engine_forward(spec, x, pallas=True))
    finally:
        ppkg.FORCE_INTERPRET = False
    np.testing.assert_allclose(fused, base, atol=1e-6)


import pytest


@pytest.mark.parametrize("mxu", ["int8", "bf16"])
@pytest.mark.parametrize("hoist_ln", ["0", "1"])
def test_engine_block_kernels_match_unfused(rng, mxu, hoist_ln, monkeypatch):
    """Fused block-kernel engine (padded tokens) == unfused engine, exactly.

    Parametrized over both MXU operand modes (ADVICE r2) and both LN
    placements (ADVICE r4): with IVIT_HOIST_LN=0 the kernels run their
    in-kernel LN chains, so the hoisted==in-kernel claim is asserted here
    rather than assumed (the hoisted leg alone would make the LN comparison
    tautological — the engine feeds the kernels its own XLA LN output).
    Full-model-size coverage of the same axis lives in
    scripts/tpu_validate.py (--hoist-ln {0,1}).
    """
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    import ivit_tpu.ops.pallas as ppkg
    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward

    monkeypatch.setenv("IVIT_MXU", mxu)
    monkeypatch.setenv("IVIT_HOIST_LN", hoist_ln)
    for gelu, softmax, ln in (("ivit", "ivit", "ivit"),
                              ("ivit", "ivit", "ibert"),
                              ("ibert", "ibert", "ivit")):
        model, variables = build_calibrated(rng, gelu=gelu, softmax=softmax,
                                            ln=ln)
        spec = freeze_model(model, variables)
        x = jnp.asarray(rng.normal(size=(3, 64, 64, 3)).astype(np.float32))
        base = np.asarray(engine_forward(spec, x, pallas=False))
        ppkg.FORCE_INTERPRET = True
        try:
            fused = np.asarray(engine_forward(spec, x, pallas=True))
        finally:
            ppkg.FORCE_INTERPRET = False
        np.testing.assert_allclose(fused, base, atol=1e-6,
                                   err_msg=f"{gelu}/{softmax}/{ln}")


def test_shiftmax_kernel_int16_probs(rng):
    """INT16 softmax configs: the kernel must carry int16 probs (an int8
    out_shape silently truncated them before)."""
    s = np.float32(0.0521371)
    scores = rng.integers(-127, 128, size=(16, 197)).astype(np.int8)
    want, _ = ivit.shiftmax_int(jnp.asarray(scores, jnp.float32),
                                jnp.asarray([s]), 16)
    got = pk.shiftmax_p(jnp.asarray(scores), jnp.asarray(s), 16,
                        interpret=True)
    assert got.dtype == jnp.int16
    assert int(np.asarray(want).max()) > 127   # actually exercises >int8
    np.testing.assert_array_equal(np.asarray(got, np.int32),
                                  np.asarray(want, np.int32))


def test_attn_block_kernel_int16_softmax(rng):
    """Fused attention block with 16-bit probs (sm_bit=16) must match the
    unfused engine op-for-op (int16 x int8 ctx GEMM)."""
    import ivit_tpu.ops.pallas as ppkg
    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.models import BitWidths, VisionTransformer

    model = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=10, gelu_type="ivit", softmax_type="ivit",
        layernorm_type="ivit",
        bitwidths=BitWidths.from_spec("8,8,8,8,16,8,8,8"))
    x0 = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, running_stat=True)
    qs = variables["quant_stats"]
    for _ in range(2):
        xb = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
        _, st = model.apply({"params": variables["params"],
                             "quant_stats": qs}, xb, running_stat=True,
                            mutable=["quant_stats"])
        qs = st["quant_stats"]
    spec = freeze_model(model, {"params": variables["params"],
                                "quant_stats": qs})
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(engine_forward(spec, x, pallas=False))
    # drive the fused path directly despite the engine gate (the gate keeps
    # sm_bit<=8 until Mosaic's int16 dot is hardware-validated)
    from ivit_tpu.ops.pallas import block as pblk
    from ivit_tpu.engine.vit_int import (_container, _gemm_bias,
                                         _layernorm_int, _ln_requant,
                                         _requant, rdiv)
    cfg, p = spec.config, spec.params
    bw = cfg.bitwidths
    B = x.shape[0]
    g = cfg.img_size // cfg.patch_size
    C = cfg.embed_dim
    ppkg.FORCE_INTERPRET = True
    try:
        xi = jnp.clip(jnp.round(rdiv(x, p["s_input"])), -128,
                      127).astype(jnp.int8)
        xi = xi.reshape(B, g, 16, g, 16, 3).transpose(0, 1, 3, 2, 4, 5)
        xi = xi.reshape(B, g * g, 16 * 16 * 3)
        acc = _gemm_bias(xi, p["patch"]["w"], p["patch"]["b"])
        xi = _requant(acc, p["patch"]["m"], bw.patch_embed)
        cls = jnp.broadcast_to(p["cls_int"].astype(jnp.int32), (B, 1, C))
        xi = jnp.concatenate([cls, xi.astype(jnp.int32)], axis=1)
        xi = jnp.clip(jnp.round(xi.astype(jnp.float32) * p["m_x0"])
                      + p["pos_addend"],
                      -(2.0 ** (bw.block_input - 1)),
                      2.0 ** (bw.block_input - 1) - 1
                      ).astype(_container(bw.block_input))
        N = cfg.num_patches + 1
        n_pad = ((N + 7) // 8) * 8
        xi = jnp.pad(xi, ((0, 0), (0, n_pad - N), (0, 0)))
        for blk in p["blocks"]:
            xi = pblk.attn_block_p(
                xi, ln_bias=blk["ln1_bias_int"], s_ln=blk["s_ln1"],
                m_ln=blk["m_ln1"], ln_shift=blk["ln1_shift"],
                qkv_w=blk["qkv_w"], qkv_b=blk["qkv_b"], m_qkv=blk["m_qkv"],
                m_attn=blk["m_attn"], s_attn=blk["s_attn"],
                m_av=blk["m_av"], proj_w=blk["proj_w"],
                proj_b=blk["proj_b"], m_proj=blk["m_proj"],
                m_res_x=blk["m_res1_x"], m_res_id=blk["m_res1_id"],
                num_heads=cfg.num_heads, n_valid=N, ln_base="ivit",
                sm_base="ivit", sm_bit=16, attn_bits=8,
                proj_bits=bw.attention_out, out_bits=bw.norm2_in,
                out_dtype=_container(bw.norm2_in))
            xf = xi.reshape(B * n_pad, C)
            xf = pblk.mlp_block_p(
                xf, ln_bias=blk["ln2_bias_int"], s_ln=blk["s_ln2"],
                m_ln=blk["m_ln2"], ln_shift=blk["ln2_shift"],
                fc1_w=blk["fc1_w"], fc1_b=blk["fc1_b"], m_fc1=blk["m_fc1"],
                s_gelu=blk["s_gelu"], m_gelu=blk["m_gelu"],
                fc2_w=blk["fc2_w"], fc2_b=blk["fc2_b"], m_fc2=blk["m_fc2"],
                m_res_x=blk["m_res2_x"], m_res_id=blk["m_res2_id"],
                ln_base="ivit", gelu_base="ivit", mlp_bits=bw.mlp_out,
                out_bits=bw.att_block_out,
                out_dtype=_container(bw.att_block_out))
            xi = xf.reshape(B, n_pad, C)
        y = _layernorm_int(cfg, xi[:, :1], p["lnf_bias_int"],
                           p["lnf_shift"])
        y = _ln_requant(y, p["s_lnf"], p["m_lnf"], 8)[:, 0]
        acc = _gemm_bias(y, p["head_w"], p["head_b"])
        got = np.asarray(acc.astype(jnp.float32) * p["head_scale"])
    finally:
        ppkg.FORCE_INTERPRET = False
    np.testing.assert_array_equal(got, want)


def test_engine_tune_params_bitwise(rng):
    """Autotuned kernel params (dispatch.TUNED -> engine_forward tune=) are
    pure schedule choices: any tiling/packing must be bit-identical."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    import ivit_tpu.ops.pallas as ppkg
    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward

    model, variables = build_calibrated(rng)
    spec = freeze_model(model, variables)
    x = jnp.asarray(rng.normal(size=(3, 64, 64, 3)).astype(np.float32))
    want = np.asarray(engine_forward(spec, x, pallas=False))
    ppkg.FORCE_INTERPRET = True
    try:
        for tune in ({"img_tile": 1, "mlp_tile": 64, "head_pack": 1},
                     {"img_tile": 3, "mlp_tile": 512, "head_pack": 2}):
            got = np.asarray(engine_forward(spec, x, pallas=True, tune=tune))
            np.testing.assert_array_equal(got, want, err_msg=str(tune))
    finally:
        ppkg.FORCE_INTERPRET = False
