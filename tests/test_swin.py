"""Quantized Swin tests (the reference's Swin is broken; ours must work
with every approximation family — SURVEY §7.2 item 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.models.swin import (SwinTransformer, attention_mask,
                                  relative_position_index, window_partition,
                                  window_reverse)


def tiny_swin(**kw):
    """56px, 2 stages, dims 32/64 — fast CPU variant of the real topology."""
    kw.setdefault("img_size", 56)
    kw.setdefault("patch_size", 4)
    kw.setdefault("embed_dim", 32)
    kw.setdefault("depths", (2, 2))
    kw.setdefault("num_heads", (2, 4))
    kw.setdefault("window_size", 7)
    kw.setdefault("num_classes", 10)
    kw.setdefault("drop_path_rate", 0.0)
    return SwinTransformer(**kw)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 8)).astype(np.float32))
    wins = window_partition(x, 7)
    assert wins.shape == (2 * 4, 49, 8)
    back = window_reverse(wins, 7, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() == 0 and idx.max() == 13 * 13 - 1
    # symmetric pairs map to mirrored offsets
    assert idx[0, 0] == idx[48, 48]


def test_attention_mask():
    m = attention_mask((14, 14), 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # unshifted window (top-left) fully visible
    assert (m[0] == 0).all()


@pytest.mark.parametrize("fam", ["ivit", "ibert"])
def test_swin_forward_families(rng, fam):
    model = tiny_swin(gelu_type=fam, softmax_type=fam, layernorm_type=fam)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)
    logits, st = model.apply(variables, x, running_stat=True,
                             mutable=["quant_stats"])
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()
    # frozen eval deterministic
    frozen = {"params": variables["params"],
              "quant_stats": st["quant_stats"]}
    y1 = model.apply(frozen, x, running_stat=False)
    y2 = model.apply(frozen, x, running_stat=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_swin_shifted_windows_differ_from_unshifted(rng):
    """The cyclic-shift path must actually mix information across windows."""
    model = tiny_swin(gelu_type="ivit", softmax_type="ivit",
                      layernorm_type="ivit")
    x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)
    # second block of each stage is shifted; its attn mask is nontrivial
    m = attention_mask((14, 14), 7, 3)
    assert (m != 0).any()


def test_swin_gradients(rng):
    model = tiny_swin(gelu_type="ivit", softmax_type="ivit",
                      layernorm_type="ivit")
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "quant_stats": variables["quant_stats"]},
            x, running_stat=True, mutable=["quant_stats"])
        return jnp.mean(logits ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
