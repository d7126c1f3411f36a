"""Engine parity suite: the integer-only engine must reproduce the frozen
QAT sim (the scale-graph validator demanded by SURVEY §7.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.engine import Engine, freeze_model
from ivit_tpu.models import VisionTransformer


def build_calibrated(rng, *, gelu="ivit", softmax="ivit", ln="ivit",
                     img=64, depth=2, dim=64, heads=2, classes=10,
                     calib_batches=3):
    model = VisionTransformer(
        img_size=img, patch_size=16, embed_dim=dim, depth=depth,
        num_heads=heads, num_classes=classes,
        gelu_type=gelu, softmax_type=softmax, layernorm_type=ln)
    x0 = jnp.asarray(rng.normal(size=(4, img, img, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, running_stat=True)
    qs = variables["quant_stats"]
    for _ in range(calib_batches):
        xb = jnp.asarray(rng.normal(size=(4, img, img, 3)).astype(np.float32))
        _, st = model.apply({"params": variables["params"], "quant_stats": qs},
                            xb, running_stat=True, mutable=["quant_stats"])
        qs = st["quant_stats"]
    return model, {"params": variables["params"], "quant_stats": qs}


FAMILIES = [
    ("ivit", "ivit", "ivit"),
    ("ibert", "ibert", "ibert"),
    ("ivit", "ibert", "ivit"),
    ("ibert", "ivit", "ibert_use-int-sqrt_true"),
]


@pytest.mark.parametrize("gelu,softmax,ln", FAMILIES)
def test_engine_matches_sim(rng, gelu, softmax, ln):
    model, variables = build_calibrated(rng, gelu=gelu, softmax=softmax, ln=ln)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))

    sim_logits = np.asarray(model.apply(variables, x, running_stat=False))
    eng = Engine(freeze_model(model, variables))
    eng_logits = np.asarray(eng(x))

    assert eng_logits.shape == sim_logits.shape
    # Bit-exact: exact-int matmul operand snapping + correctly-rounded
    # rdiv/exact_fma/two-limb sums make the QAT sim and the integer engine
    # agree to the last bit in every compilation context (ops/quant.py).
    np.testing.assert_array_equal(eng_logits, sim_logits)


def test_engine_deterministic(rng):
    model, variables = build_calibrated(rng)
    eng = Engine(freeze_model(model, variables))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    y1 = np.asarray(eng(x))
    y2 = np.asarray(eng(x))
    np.testing.assert_array_equal(y1, y2)


def test_engine_weights_are_int8(rng):
    model, variables = build_calibrated(rng)
    spec = freeze_model(model, variables)
    assert spec.params["patch"]["w"].dtype == jnp.int8
    blk = spec.params["blocks"][0]
    for k in ("qkv_w", "proj_w", "fc1_w", "fc2_w"):
        assert blk[k].dtype == jnp.int8, k
    for k in ("qkv_b", "proj_b", "fc1_b", "fc2_b"):
        assert blk[k].dtype == jnp.int32, k
    assert spec.params["head_w"].dtype == jnp.int8


@pytest.mark.parametrize("gelu,softmax,ln", FAMILIES[:2])
def test_engine_activation_envelope(rng, gelu, softmax, ln):
    """Datapath-sizing audit (SURVEY §4.3; ref scripts/analyze_io_stats.py):
    on a calibrated model, every integer site must stay inside its declared
    container / exactness envelope:

    * GEMM accumulators (+bias) within the f32-exact range 2**24 — the
      precondition for the sim's f32 matmul being bit-equal to the engine's
      int32 accumulation;
    * LN centered values within the two-limb variance exactness bound;
    * exp sums within int32;
    * requant/residual sites: pre-clip values may saturate (QuantAct clamps
      outliers by design) but only a bounded fraction of elements may clip.
    """
    from ivit_tpu.engine.vit_int import (audit_capture, audit_violations,
                                         engine_forward)

    model, variables = build_calibrated(rng, gelu=gelu, softmax=softmax,
                                        ln=ln)
    spec = freeze_model(model, variables)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    with audit_capture() as records:
        y = np.asarray(engine_forward(spec, x, pallas=False))
    assert np.isfinite(y).all()
    assert len(records) > 20           # taps actually fired

    hard = [r for r in records if "sat_frac" not in r]
    assert any(r["kind"] == "gemm_acc" for r in hard)
    bad = audit_violations(hard)
    assert not bad, bad

    # QuantAct's EMA (momentum 0.95) deliberately shrinks ranges below the
    # observed max, so a few percent of elements clipping is the calibrated
    # steady state (the reference behaves identically); a broken scale graph
    # saturates tens of percent.
    for r in records:
        if "sat_frac" in r:
            assert float(r["sat_frac"]) <= 0.05, \
                (r["site"], float(r["sat_frac"]), float(r["min"]),
                 float(r["max"]), r["lo_bound"], r["hi_bound"])


def test_engine_16bit_softmax_config(rng):
    """The reference's INT16 run config (softmax_bw=16, norm2_in_bw=16)."""
    from ivit_tpu.models import BitWidths, VisionTransformer

    model = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=10, gelu_type="ivit", softmax_type="ivit",
        layernorm_type="ivit",
        bitwidths=BitWidths.from_spec("8,8,8,8,16,8,16,8"))
    x0 = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, running_stat=True)
    qs = variables["quant_stats"]
    for _ in range(2):
        xb = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
        _, st = model.apply({"params": variables["params"],
                             "quant_stats": qs}, xb, running_stat=True,
                            mutable=["quant_stats"])
        qs = st["quant_stats"]
    variables = {"params": variables["params"], "quant_stats": qs}

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    sim = np.asarray(model.apply(variables, x, running_stat=False))
    spec = freeze_model(model, variables)
    eng = np.asarray(Engine(spec, pallas=False)(x))
    assert spec.params["blocks"][0]["s_attn"].dtype == jnp.float32
    scale = np.abs(sim).max()
    assert np.abs(eng - sim).max() < 1e-5 * scale + 1e-6
    # probs container must actually be int16 in this config
    from ivit_tpu.engine.vit_int import _container
    assert _container(16) == jnp.int16



def test_dispatch_tables_invariants():
    """Calibration tables are measurement records: every row must carry its
    evidence citation, keys must be well-formed, and the resolvers must
    return consistent structures (guards future table edits)."""
    from ivit_tpu.engine import dispatch

    for key, row in dispatch.MEASURED.items():
        arch, dim = key
        assert arch in ("vit", "swin") and isinstance(dim, int)
        assert isinstance(row["fused"], bool)
        assert "evidence" in row and row["evidence"]
    for key, row in dispatch.TUNED.items():
        arch, dim = key
        assert arch in ("vit", "swin") and isinstance(dim, int)
        assert "evidence" in row and row["evidence"]
        for k in row:
            assert k in ("img_tile", "mlp_tile", "head_pack", "evidence"), k
    for dim, row in dispatch.MEASURED_SWIN_STAGE.items():
        assert isinstance(dim, int)
        assert isinstance(row["fused"], bool)
        assert "evidence" in row and row["evidence"]

    class VitCfg:
        embed_dim = 192
    class SwinCfg:
        embed_dim = 96
        depths = (2, 2, 6, 2)

    fused, rep = dispatch.static_choice(VitCfg())
    assert isinstance(fused, bool) and "source" in rep
    paths, rep = dispatch.swin_stage_choice(SwinCfg())
    assert len(paths) == 4 and all(isinstance(p, bool) for p in paths)
    assert set(rep["evidence"]) == {"96", "192", "384", "768"}
    tune = dispatch.kernel_tune(VitCfg())
    assert set(tune) <= {"img_tile", "mlp_tile", "head_pack", "evidence"}
