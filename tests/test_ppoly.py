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
