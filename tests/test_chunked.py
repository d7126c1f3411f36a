"""scan_apply (scan-over-blocks sim) bit-identity vs the unrolled model.

Also locks the contraction-pinned QuantAct EMA (ops/quant.ema_update): the
unpinned ``old*m + new*(1-m)`` produced context-dependent ranges (unrolled
vs lax.scan calibration differed by an ulp), which shifted every downstream
scale.  Reference semantics: quant_modules.py:351-360 (torch eager, three
roundings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.models import BitWidths, VisionTransformer
from ivit_tpu.models.chunked import scan_apply


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("fam", ["ivit", "ibert"])
def test_scan_apply_bitwise(rng, fam):
    model = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=3, num_heads=2,
        num_classes=11, bitwidths=BitWidths.from_spec("8"),
        gelu_type=fam, softmax_type=fam, layernorm_type=fam)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x)

    # calibration step: logits AND updated EMA stats bit-identical
    ref, st_ref = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x)
    got, st_got = jax.jit(lambda v, a: scan_apply(
        model, v, a, running_stat=True))(variables, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    ref_leaves = jax.tree_util.tree_flatten_with_path(st_ref["quant_stats"])[0]
    got_map = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(st_got["quant_stats"])[0]}
    assert len(ref_leaves) == len(got_map)
    for k, v in ref_leaves:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(got_map[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k))

    # frozen eval bit-identical
    frozen = {"params": variables["params"],
              "quant_stats": st_ref["quant_stats"]}
    y1 = np.asarray(jax.jit(lambda v, a: model.apply(
        v, a, running_stat=False))(frozen, x))
    y2 = np.asarray(jax.jit(lambda v, a: scan_apply(model, v, a))(frozen, x))
    np.testing.assert_array_equal(y1, y2)


def test_swin_chunked_apply_bitwise(rng):
    from ivit_tpu.models.chunked import swin_chunked_apply
    from ivit_tpu.models.swin import SwinTransformer

    model = SwinTransformer(
        img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
        num_heads=(2, 4), window_size=7, num_classes=10, drop_path_rate=0.0,
        gelu_type="ivit", softmax_type="ivit", layernorm_type="ivit")
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x)
    ref, st_ref = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x)
    got, st_got = swin_chunked_apply(model, variables, x, running_stat=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    for (k, v), (k2, v2) in zip(
            jax.tree_util.tree_flatten_with_path(st_ref["quant_stats"])[0],
            jax.tree_util.tree_flatten_with_path(st_got["quant_stats"])[0]):
        assert jax.tree_util.keystr(k) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v2),
                                      err_msg=jax.tree_util.keystr(k))
    frozen = {"params": variables["params"],
              "quant_stats": st_ref["quant_stats"]}
    y1 = np.asarray(jax.jit(lambda v, a: model.apply(
        v, a, running_stat=False))(frozen, x))
    y2 = np.asarray(swin_chunked_apply(model, frozen, x))
    np.testing.assert_array_equal(y1, y2)


def test_ema_update_deterministic():
    """ema_update: eager == jit == in-scan, equals the defined
    fl(old*m + fl(new*(1-m))) value (f64-computed oracle)."""
    from ivit_tpu.ops.quant import ema_update

    rng = np.random.default_rng(3)
    old = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 8e15)
    new = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 8e15)
    m = 0.95
    eager = np.asarray(ema_update(old, new, m))
    jitted = np.asarray(jax.jit(lambda a, b: ema_update(a, b, m))(old, new))

    def scan_form(a, b):
        out, _ = jax.lax.scan(
            lambda c, _: (ema_update(c, b, m), None), a, None, length=1)
        return out
    scanned = np.asarray(jax.jit(scan_form)(old, new))
    np.testing.assert_array_equal(eager, jitted)
    np.testing.assert_array_equal(eager, scanned)

    p2 = np.float32(np.asarray(new, np.float32) * np.float32(1 - m))
    oracle = (np.asarray(old, np.float64) * np.float64(np.float32(m))
              + p2.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(eager, oracle)
