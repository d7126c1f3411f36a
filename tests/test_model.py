"""Model-graph integration tests: init → calibrate → freeze → jitted eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.models import BitWidths, VisionTransformer


def tiny_model(**kw):
    """A scaled-down ViT for fast CPU tests (2 blocks, dim 64, 64px)."""
    kw.setdefault("img_size", 64)
    kw.setdefault("patch_size", 16)
    kw.setdefault("embed_dim", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_classes", 10)
    return VisionTransformer(**kw)


def _data(rng, n=2, img=64):
    return jnp.asarray(rng.normal(size=(n, img, img, 3)).astype(np.float32))


@pytest.mark.parametrize("types", [
    ("ivit", "ivit", "ivit"),
    ("ibert", "ibert", "ibert"),
    ("float", "float", "float"),
    ("ivit", "ibert", "ivit"),
])
def test_forward_families(rng, types):
    g, s, ln = types
    model = tiny_model(gelu_type=g, softmax_type=s, layernorm_type=ln)
    x = _data(rng)
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)
    logits, state = model.apply(variables, x, running_stat=True,
                                mutable=["quant_stats"])
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_calibrate_then_freeze_deterministic(rng):
    model = tiny_model(gelu_type="ivit", softmax_type="ivit",
                       layernorm_type="ivit")
    x = _data(rng, n=4)
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)
    qs = variables["quant_stats"]
    # a few calibration batches settle EMA ranges
    for i in range(3):
        xb = _data(rng, n=4)
        _, st = model.apply({"params": variables["params"], "quant_stats": qs},
                            xb, running_stat=True, mutable=["quant_stats"])
        qs = st["quant_stats"]

    frozen = {"params": variables["params"], "quant_stats": qs}
    y1 = model.apply(frozen, x, running_stat=False)
    y2 = model.apply(frozen, x, running_stat=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    # jitted frozen eval matches unjitted
    fast = jax.jit(lambda v, a: model.apply(v, a, running_stat=False))
    y3 = fast(frozen, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y3), rtol=1e-5,
                               atol=1e-5)


def test_gradients_exist_and_are_finite(rng):
    model = tiny_model(gelu_type="ivit", softmax_type="ivit",
                       layernorm_type="ivit")
    x = _data(rng)
    labels = jnp.asarray([1, 2])
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "quant_stats": variables["quant_stats"]},
            x, running_stat=True, mutable=["quant_stats"])
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(2), labels])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the quantized graph must backprop into the conv + attention weights
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_bitwidths_spec():
    assert BitWidths.from_spec("8").to_list() == [8] * 8
    assert BitWidths.from_spec(8).to_list() == [8] * 8
    bw = BitWidths.from_spec("8,8,8,8,16,8,16,8")
    assert bw.softmax == 16 and bw.norm2_in == 16
    with pytest.raises(ValueError):
        BitWidths.from_spec("8,8")


def test_mixed_bitwidths_forward(rng):
    model = tiny_model(gelu_type="ivit", softmax_type="ivit",
                       layernorm_type="ivit",
                       bitwidths=BitWidths.from_spec("8,8,8,8,8,8,16,16"))
    x = _data(rng)
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)
    logits, _ = model.apply(variables, x, running_stat=True,
                            mutable=["quant_stats"])
    assert np.isfinite(np.asarray(logits)).all()


def test_parameterized_layer_types(rng):
    model = tiny_model(gelu_type="ibert",
                       softmax_type="ibert",
                       layernorm_type="ibert_use-int-sqrt_true")
    x = _data(rng)
    variables = model.init(jax.random.PRNGKey(0), x, running_stat=True)
    logits, _ = model.apply(variables, x, running_stat=True,
                            mutable=["quant_stats"])
    assert np.isfinite(np.asarray(logits)).all()


def test_quantact_percentile_mode(rng):
    """Percentile-based range calibration (ref quant_modules.py:319-344)."""
    import jax

    from ivit_tpu.models.layers import QuantAct

    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    x = x.at[0, 0].set(100.0)  # outlier
    mod_minmax = QuantAct(8)
    mod_pct = QuantAct(8, percentile=99.0)
    v1 = mod_minmax.init(jax.random.PRNGKey(0), x, running_stat=True)
    v2 = mod_pct.init(jax.random.PRNGKey(0), x, running_stat=True)
    (_, s1), st1 = mod_minmax.apply(v1, x, running_stat=True,
                                    mutable=["quant_stats"])
    (_, s2), st2 = mod_pct.apply(v2, x, running_stat=True,
                                 mutable=["quant_stats"])
    # percentile range must ignore the outlier -> much smaller scale
    assert float(s2[0]) < float(s1[0]) / 5


def test_quantact_per_channel(rng):
    import jax

    from ivit_tpu.models.layers import QuantAct

    c = 8
    x = rng.normal(size=(16, 10, c)).astype(np.float32)
    x[..., 0] *= 100.0  # one hot channel
    x = jnp.asarray(x)
    mod = QuantAct(8, per_channel=True, channel_len=c)
    v = mod.init(jax.random.PRNGKey(0), x, running_stat=True)
    (_, s), st = mod.apply(v, x, running_stat=True, mutable=["quant_stats"])
    s = np.asarray(s)
    assert s.shape == (c,)
    assert s[0] > 10 * s[1:].max()


def test_quantact_momentum_minus_one(rng):
    """momentum -1 selects running min/max instead of EMA."""
    import jax

    from ivit_tpu.models.layers import QuantAct

    mod = QuantAct(8, act_range_momentum=-1)
    x1 = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    x2 = x1 * 0.01
    v = mod.init(jax.random.PRNGKey(0), x1, running_stat=True)
    _, st = mod.apply(v, x1, running_stat=True, mutable=["quant_stats"])
    qs1 = st["quant_stats"]
    _, st2 = mod.apply({"quant_stats": qs1}, x2, running_stat=True,
                       mutable=["quant_stats"])
    # running max must not shrink on a smaller batch
    np.testing.assert_array_equal(
        np.asarray(st2["quant_stats"]["x_max"]),
        np.asarray(qs1["x_max"]))
