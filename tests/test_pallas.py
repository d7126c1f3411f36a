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


def test_engine_block_kernels_match_unfused(rng):
    """Fused block-kernel engine (padded tokens) == unfused engine, exactly."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    import ivit_tpu.ops.pallas as ppkg
    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward

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
