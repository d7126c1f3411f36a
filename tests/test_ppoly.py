"""ppoly family tests: fitting, evaluation, full-model + engine parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erf

from ivit_tpu.ops import ppoly


def test_fit_and_eval_gelu_float_backend():
    s = 0.05
    table = ppoly.fit_gelu_table(-6.4, 6.35, s, backend="float", seg=16,
                                 deg=2, optim_bounds=False)
    x_int = jnp.arange(-128, 128, dtype=jnp.float32)
    y_int = ppoly.eval_piecewise_poly(x_int, table.bounds.astype(np.float32),
                                      table.coeffs.astype(np.float32))
    y = np.asarray(y_int) / 2.0**table.scale_bits
    xs = np.arange(-128, 128) * s
    ref = 0.5 * xs * (1 + erf(xs / np.sqrt(2)))
    assert np.abs(y - ref).max() < 0.02, np.abs(y - ref).max()


def test_fit_gelu_optim_bounds_not_worse():
    s = 0.05
    xs = np.arange(-128, 128) * s
    ref = 0.5 * xs * (1 + erf(xs / np.sqrt(2)))

    def err(table):
        y_int = ppoly.eval_piecewise_poly(
            jnp.arange(-128, 128, dtype=jnp.float32),
            table.bounds.astype(np.float32), table.coeffs.astype(np.float32))
        return np.abs(np.asarray(y_int) / 2.0**table.scale_bits - ref).max()

    uniform = ppoly.fit_gelu_table(-6.4, 6.35, s, backend="float", seg=8,
                                   deg=2, optim_bounds=False)
    optimized = ppoly.fit_gelu_table(-6.4, 6.35, s, backend="float", seg=8,
                                     deg=2, optim_bounds=True)
    assert err(optimized) <= err(uniform) * 1.5


def test_fit_softmax_exp_table():
    s = 0.05
    table = ppoly.fit_softmax_exp_table(-128, 127, s, backend="float",
                                        seg=16, deg=2, scale_bits=28)
    x_off = jnp.arange(-100, 128, dtype=jnp.float32)
    y_int = np.asarray(ppoly.eval_piecewise_poly(
        x_off, table.bounds.astype(np.float32),
        table.coeffs.astype(np.float32)))
    ref = np.exp((np.arange(-100, 128) - 127) * s) * 2.0**28
    rel = np.abs(np.clip(y_int, 0, None) - ref) / 2.0**28
    assert rel.max() < 0.01, rel.max()


def test_model_with_ppoly_and_fit(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    from ivit_tpu.train.ppoly_fit import fit_ppoly_tables

    model, variables = build_calibrated(
        rng, gelu="ppoly_backend_float_optim-bounds_false",
        softmax="ppoly_backend_float", ln="ivit")
    variables = fit_ppoly_tables(model, variables)
    # all sites fitted
    flags = [np.asarray(v) for k, v in
             jax.tree_util.tree_flatten_with_path(variables["quant_stats"])[0]
             if "fitted" in str(k)]
    assert flags and all(f[0] == 1.0 for f in flags)

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    y = model.apply(variables, x, running_stat=False)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("backend", ["float", "ibert"])
def test_engine_ppoly_parity(rng, backend):
    """Bit-exact sim(eager) == sim(jit) == engine for the ppoly family
    (round_ste input snap + precomputed gelu_s_out grid — the round-2 full-
    size hunt found the floor-recovery knife edge and the backend-blind
    composite grid; see models/layers.py PPolyGELU)."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.train.ppoly_fit import fit_ppoly_tables

    model, variables = build_calibrated(
        rng, gelu=f"ppoly_backend_{backend}_optim-bounds_false",
        softmax=f"ppoly_backend_{backend}", ln="ivit")
    variables = fit_ppoly_tables(model, variables)
    spec = freeze_model(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    sim = np.asarray(model.apply(variables, x, running_stat=False))
    sim_j = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, running_stat=False))(variables, x))
    eng = np.asarray(jax.jit(
        lambda p, a: engine_forward(type(spec)(spec.config, p), a,
                                    pallas=False))(spec.params, x))
    np.testing.assert_array_equal(sim_j, sim)
    np.testing.assert_array_equal(eng, sim)
    # fused block kernels run the in-kernel ppoly Horner (VERDICT r2 item 8)
    import ivit_tpu.ops.pallas as ppkg
    ppkg.FORCE_INTERPRET = True
    try:
        fused = np.asarray(engine_forward(spec, x, pallas=True))
    finally:
        ppkg.FORCE_INTERPRET = False
    np.testing.assert_array_equal(fused, sim)


def test_freeze_unfreeze_lifecycle(rng):
    """fix()/unfix() parity: freeze fits ppoly tables, unfreeze clears."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    from ivit_tpu.models.model_utils import freeze_model, unfreeze_model

    model, variables = build_calibrated(
        rng, gelu="ppoly_backend_float_optim-bounds_false",
        softmax="ivit", ln="ivit")
    frozen = freeze_model(model, variables)
    flags = [np.asarray(v) for k, v in
             jax.tree_util.tree_flatten_with_path(frozen["quant_stats"])[0]
             if "fitted" in str(k)]
    assert flags and all(f[0] == 1.0 for f in flags)

    unfrozen = unfreeze_model(model, frozen)
    flags = [np.asarray(v) for k, v in
             jax.tree_util.tree_flatten_with_path(unfrozen["quant_stats"])[0]
             if "fitted" in str(k)]
    assert all(f[0] == 0.0 for f in flags)


def test_ppoly_fastdiv_gate(rng):
    """The freeze-time fast-div gate: one multiply + sparse patches must
    reproduce floor(rdiv(poly(x)/2**sb, s_out)) over the FULL int8 domain,
    and the engine must produce identical bits with the gate on and off
    (unfused AND fused kernels)."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    import ivit_tpu.ops.pallas as ppkg
    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.freeze import (PPOLY_FASTDIV_PATCHES,
                                        _ppoly_fastdiv_gate)
    from ivit_tpu.engine.luts import ppoly_gelu_lut
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.train.ppoly_fit import fit_ppoly_tables

    model, variables = build_calibrated(rng, gelu="ppoly_backend_ibert",
                                        softmax="ppoly_backend_ibert",
                                        ln="ivit")
    variables = fit_ppoly_tables(model, variables)
    spec = freeze_model(model, variables)
    assert spec.config.ppoly_fastdiv     # gate fires on this model

    # 1. exhaustive-domain equality of the gate's fast form per block
    for blk in spec.params["blocks"]:
        bounds = np.asarray(blk["gelu_bounds"])
        coeffs = np.asarray(blk["gelu_coeffs"])
        c = np.float32(np.asarray(blk["gelu_s_out_c"]))
        ph = np.asarray(blk["gelu_patch_h"])
        pd = np.asarray(blk["gelu_patch_d"])
        assert ph.shape == (PPOLY_FASTDIV_PATCHES,)
        truth = ppoly_gelu_lut(bounds, coeffs, 22, blk["gelu_s_out"])
        x = np.arange(256, dtype=np.float32) - 128.0
        y_int = np.asarray(ppoly.eval_piecewise_poly(
            jnp.asarray(x), jnp.asarray(bounds, jnp.float32),
            jnp.asarray(coeffs, jnp.float32)))
        fast = np.floor(y_int * c)
        for j in range(PPOLY_FASTDIV_PATCHES):
            fast = fast + np.where(x == ph[j], pd[j], 0.0)
        np.testing.assert_array_equal(fast, truth)

    # 2. engine bits identical gate-on vs gate-off, unfused and fused
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    fast_u = np.asarray(jax.jit(
        lambda i: engine_forward(spec, i, pallas=False))(x))
    slow_spec = type(spec)(
        dataclasses.replace(spec.config, ppoly_fastdiv=False), spec.params)
    slow_u = np.asarray(jax.jit(
        lambda i: engine_forward(slow_spec, i, pallas=False))(x))
    np.testing.assert_array_equal(fast_u, slow_u)
    ppkg.FORCE_INTERPRET = True
    try:
        fast_f = np.asarray(jax.jit(
            lambda i: engine_forward(spec, i, pallas=True))(x))
    finally:
        ppkg.FORCE_INTERPRET = False
    np.testing.assert_array_equal(fast_u, fast_f)
