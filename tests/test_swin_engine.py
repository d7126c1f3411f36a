"""Swin integer-engine parity vs the frozen QAT sim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.engine.swin_int import freeze_swin_model, swin_engine_forward
from ivit_tpu.models.swin import SwinTransformer


def build_swin(rng, **kw):
    kw.setdefault("img_size", 56)
    kw.setdefault("patch_size", 4)
    kw.setdefault("embed_dim", 32)
    kw.setdefault("depths", (2, 2))
    kw.setdefault("num_heads", (2, 4))
    kw.setdefault("window_size", 7)
    kw.setdefault("num_classes", 10)
    kw.setdefault("drop_path_rate", 0.0)
    model = SwinTransformer(**kw)
    x0 = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, running_stat=True)
    qs = variables["quant_stats"]
    for _ in range(3):
        xb = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
        _, st = model.apply({"params": variables["params"],
                             "quant_stats": qs}, xb, running_stat=True,
                            mutable=["quant_stats"])
        qs = st["quant_stats"]
    return model, {"params": variables["params"], "quant_stats": qs}


@pytest.mark.parametrize("fam", ["ivit", "ibert"])
def test_swin_engine_matches_sim(rng, fam):
    model, variables = build_swin(rng, gelu_type=fam, softmax_type=fam,
                                  layernorm_type=fam)
    spec = freeze_swin_model(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    sim = np.asarray(model.apply(variables, x, running_stat=False))
    eng = np.asarray(swin_engine_forward(spec, x, pallas=False))
    import ivit_tpu.ops.pallas as ppkg
    ppkg.FORCE_INTERPRET = True
    try:
        eng_p = np.asarray(swin_engine_forward(spec, x, pallas=True))
    finally:
        ppkg.FORCE_INTERPRET = False
    # Bit-exact: the two-limb exact variance/sum reductions (ops/quant.py)
    # removed the 16-bit LN reduction-order nondeterminism that used to cap
    # this at ~1e-3; sim, engine, and kernels now agree to the last bit.
    np.testing.assert_array_equal(eng, sim)
    np.testing.assert_array_equal(eng_p, eng)


def test_swin_engine_weights_int8(rng):
    model, variables = build_swin(rng)
    spec = freeze_swin_model(model, variables)
    blk = [b for b in spec.params["blocks"] if "merge" not in b][0]
    assert blk["qkv_w"].dtype == jnp.int8
    mg = [b for b in spec.params["blocks"] if "merge" in b][0]["merge"]
    assert mg["red_w"].dtype == jnp.int8


def test_swin_engine_activation_envelope(rng):
    """Datapath-sizing audit for the Swin engine (SURVEY §4.3): GEMM
    accumulators inside the f32-exact envelope (the sim-equality
    precondition), LN centered values within the two-limb variance bound,
    requant/residual saturation bounded."""
    from ivit_tpu.engine.vit_int import audit_capture, audit_violations

    model, variables = build_swin(rng)
    spec = freeze_swin_model(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    with audit_capture() as records:
        y = np.asarray(swin_engine_forward(spec, x, pallas=False))
    assert np.isfinite(y).all()
    assert len(records) > 20
    hard = [r for r in records if "sat_frac" not in r]
    assert any(r["kind"] == "gemm_acc" for r in hard)
    bad = audit_violations(hard)
    assert not bad, bad
    for r in records:
        if "sat_frac" in r:
            assert float(r["sat_frac"]) <= 0.05, \
                (r["site"], float(r["sat_frac"]))


def test_swin_engine_ppoly_matches_sim(rng):
    """Swin + ppoly family: freeze reads the fitted tables and the
    backend-aware gelu_s_out grid; engine matches the sim bitwise."""
    from ivit_tpu.train.ppoly_fit import fit_ppoly_tables

    model, variables = build_swin(
        rng, gelu_type="ppoly_backend_ibert",
        softmax_type="ppoly_backend_ibert", layernorm_type="ivit")
    variables = fit_ppoly_tables(model, variables)
    spec = freeze_swin_model(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    sim = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, running_stat=False))(variables, x))
    eng = np.asarray(jax.jit(
        lambda p, a: swin_engine_forward(
            type(spec)(spec.config, p), a, pallas=False))(spec.params, x))
    np.testing.assert_array_equal(eng, sim)
    # fused window-attention + FFN kernels with in-kernel ppoly Horner
    import ivit_tpu.ops.pallas as ppkg
    ppkg.FORCE_INTERPRET = True
    try:
        eng_p = np.asarray(swin_engine_forward(spec, x, pallas=True))
    finally:
        ppkg.FORCE_INTERPRET = False
    np.testing.assert_array_equal(eng_p, sim)


def test_swin_engine_stage_paths_bitwise(rng):
    """Per-stage fused/unfused mixes (dispatch item r4-3) are bit-identical
    to the all-unfused engine for every mask."""
    import itertools

    model, variables = build_swin(rng, gelu_type="ivit", softmax_type="ivit",
                                  layernorm_type="ivit")
    spec = freeze_swin_model(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    want = np.asarray(swin_engine_forward(spec, x, pallas=False))
    import ivit_tpu.ops.pallas as ppkg
    ppkg.FORCE_INTERPRET = True
    try:
        for mask in itertools.product((False, True), repeat=2):
            got = np.asarray(swin_engine_forward(spec, x, pallas=True,
                                                 stage_paths=mask))
            np.testing.assert_array_equal(got, want, err_msg=str(mask))
    finally:
        ppkg.FORCE_INTERPRET = False
