"""Freeze-time nonlinearity LUTs (engine/luts.py + block.py gather paths).

The LUT contract: engine output with the LUT paths enabled is BIT-IDENTICAL
to the tower paths (and hence to the QAT sim — test_engine.py already pins
sim == engine with LUTs on, since freeze enables them by default).  These
tests pin the remaining claims:

* the tables ARE active on the standard family configs (no silent fallback),
* lut-on == lut-off exactly, per family, ViT and Swin (incl. shifted
  blocks, whose masked positions take the freeze-verified saturation
  constant),
* the tables equal the towers pointwise over the full 8-bit domain,
* the Swin saturation gate passes on real calibrated scales.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ivit_tpu.engine import Engine, freeze_model
from ivit_tpu.engine import luts
from ivit_tpu.engine.vit_int import engine_forward, fusion_report
from ivit_tpu.engine.swin_int import freeze_swin_model, swin_engine_forward

from test_engine import build_calibrated
from test_swin_engine import build_swin


def _forward_lut_ab(fwd, spec, x, monkeypatch):
    import jax
    import ivit_tpu.ops.pallas as ppkg
    ppkg.FORCE_INTERPRET = True
    try:
        monkeypatch.setenv("IVIT_LUT", "1")
        on = np.asarray(jax.jit(lambda xx: fwd(spec, xx, pallas=True))(x))
        monkeypatch.setenv("IVIT_LUT", "0")
        off = np.asarray(jax.jit(lambda xx: fwd(spec, xx, pallas=True))(x))
        monkeypatch.delenv("IVIT_LUT")
    finally:
        ppkg.FORCE_INTERPRET = False
    return on, off


@pytest.mark.parametrize("gelu,softmax,ln", [
    ("ivit", "ivit", "ivit"),
    ("ibert", "ibert", "ibert"),
    ("ppoly", "ppoly_backend_ibert", "ivit"),
])
def test_vit_lut_on_off_identical(rng, gelu, softmax, ln, monkeypatch):
    model, variables = build_calibrated(rng, gelu=gelu, softmax=softmax,
                                        ln=ln)
    if "ppoly" in (gelu, softmax):
        from ivit_tpu.train.ppoly_fit import fit_ppoly_tables
        variables = fit_ppoly_tables(model, variables)
    spec = freeze_model(model, variables)
    assert spec.config.use_lut, "LUTs must be built on this family config"
    assert "sm_lut" in spec.params["blocks"][0]
    assert "gelu_lut" in spec.params["blocks"][0]
    # default OFF after the r4 hardware A/B (Mosaic gather slower than the
    # gated towers — ops/pallas/block._lut_on); IVIT_LUT=1 opts in
    monkeypatch.setenv("IVIT_LUT", "1")
    rep = fusion_report(spec.config, pallas=True)
    assert rep["lut_nonlinearities"]
    monkeypatch.delenv("IVIT_LUT")
    assert not fusion_report(spec.config, pallas=True)["lut_nonlinearities"]
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    on, off = _forward_lut_ab(engine_forward, spec, x, monkeypatch)
    np.testing.assert_array_equal(on, off)


def test_swin_lut_on_off_identical(rng, monkeypatch):
    model, variables = build_swin(rng, gelu_type="ivit", softmax_type="ivit",
                                  layernorm_type="ivit")
    spec = freeze_swin_model(model, variables)
    assert spec.config.use_lut
    # shifted blocks must carry the saturation constant (gate passed)
    shifted = [blk for (kind, _, sh), blk in zip(spec.config.layout,
                                                 spec.params["blocks"])
               if kind == "block" and sh > 0]
    assert shifted, "test model must contain shifted blocks"
    assert all("sm_sat" in blk for blk in shifted), \
        "saturation gate should pass on calibrated scales"
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    on, off = _forward_lut_ab(swin_engine_forward, spec, x, monkeypatch)
    np.testing.assert_array_equal(on, off)


def test_shiftmax_table_matches_tower():
    from ivit_tpu.ops.ivit import int_exp_shift
    for s in (0.01, 0.05, 0.21):
        t = luts.shiftmax_exp_lut(np.float32(s))
        d = -jnp.arange(256, dtype=jnp.float32)
        want, _ = int_exp_shift(d, jnp.float32(s), n=15)
        np.testing.assert_array_equal(t, np.asarray(want))


def test_ibert_tables_match_tower():
    from ivit_tpu.ops.ibert import GELU_K, int_erf, int_exp
    from ivit_tpu.ops.quant import rdiv
    s, se_act = np.float32(0.031), np.float32(7.3)
    t = luts.ibert_softmax_exp16_lut(s, se_act)
    d = -jnp.arange(256, dtype=jnp.float32)
    exp, _ = int_exp(d, jnp.float32(s))
    m = rdiv(1.0, jnp.float32(se_act))
    want = jnp.clip(jnp.round(exp * m), -(2.0**15), 2.0**15 - 1)
    np.testing.assert_array_equal(t, np.asarray(want))

    u = luts.ibert_gelu_lut(s)
    x = jnp.arange(256, dtype=jnp.float32) - 128.0
    erf, sig_scale = int_erf(x, rdiv(jnp.float32(s), GELU_K))
    shift = jnp.floor(rdiv(1.0, sig_scale))
    np.testing.assert_array_equal(u, np.asarray(erf + shift))


def test_swin_sat_gate_degenerate_scale():
    # a tiny mask (|M| < saturation depth) must fail the gate, not
    # silently produce a wrong constant
    ok, _ = luts.swin_shift_sat("ivit", np.float32(0.05), -30.0)
    assert not ok
    # ppoly extrapolates — never saturates
    ok, _ = luts.swin_shift_sat("ppoly", np.float32(0.05), -2000.0)
    assert not ok


def test_sum_gate():
    t = luts.shiftmax_exp_lut(np.float32(0.05))
    assert luts.sum_fits_int32(t, 197)
    assert not luts.sum_fits_int32(np.asarray([2.0**29], np.float32), 8)
