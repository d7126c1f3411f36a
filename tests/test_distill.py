"""Distillation loss tests (working version of the reference's dead code)."""

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.train.distill import distillation_loss


def test_soft_distillation(rng):
    s = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    base = jnp.asarray(2.0)
    out = distillation_loss(base, s, t, "soft", alpha=0.5, tau=2.0)
    assert np.isfinite(float(out))
    # teacher == student -> KL = 0 -> loss = base/2
    same = distillation_loss(base, s, s, "soft", alpha=0.5, tau=1.0)
    np.testing.assert_allclose(float(same), 1.0, atol=1e-5)


def test_hard_distillation(rng):
    s = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    out = distillation_loss(jnp.asarray(1.0), s, t, "hard", alpha=0.5)
    assert np.isfinite(float(out))


def test_none_passthrough():
    base = jnp.asarray(3.0)
    out = distillation_loss(base, None, None, "none")
    assert float(out) == 3.0
