"""Google ViT .npz ingestion tests (synthetic checkpoint with the real schema)."""

import numpy as np
import pytest

from ivit_tpu.compat.flax_npz import (convert_npz, load_npz_into_model,
                                      resize_pos_embed)


def make_npz(tmp_path, depth=2, c=64, heads=2, grid=4, hidden=256,
             classes=10, prefix=""):
    rng = np.random.default_rng(0)
    hd = c // heads
    w = {}
    w[prefix + "embedding/kernel"] = rng.normal(
        size=(16, 16, 3, c)).astype(np.float32)
    w[prefix + "embedding/bias"] = rng.normal(size=(c,)).astype(np.float32)
    w[prefix + "cls"] = rng.normal(size=(1, 1, c)).astype(np.float32)
    w[prefix + "Transformer/posembed_input/pos_embedding"] = rng.normal(
        size=(1, grid * grid + 1, c)).astype(np.float32)
    w[prefix + "Transformer/encoder_norm/scale"] = np.ones(c, np.float32)
    w[prefix + "Transformer/encoder_norm/bias"] = np.zeros(c, np.float32)
    w[prefix + "head/kernel"] = rng.normal(size=(c, classes)).astype(np.float32)
    w[prefix + "head/bias"] = np.zeros(classes, np.float32)
    for i in range(depth):
        bp = prefix + f"Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_1/"
        for n in ("query", "key", "value"):
            w[mha + f"{n}/kernel"] = rng.normal(
                size=(c, heads, hd)).astype(np.float32)
            w[mha + f"{n}/bias"] = rng.normal(
                size=(heads, hd)).astype(np.float32)
        w[mha + "out/kernel"] = rng.normal(
            size=(heads, hd, c)).astype(np.float32)
        w[mha + "out/bias"] = np.zeros(c, np.float32)
        w[bp + "LayerNorm_0/scale"] = np.ones(c, np.float32)
        w[bp + "LayerNorm_0/bias"] = np.zeros(c, np.float32)
        w[bp + "LayerNorm_2/scale"] = np.ones(c, np.float32)
        w[bp + "LayerNorm_2/bias"] = np.zeros(c, np.float32)
        w[bp + "MlpBlock_3/Dense_0/kernel"] = rng.normal(
            size=(c, hidden)).astype(np.float32)
        w[bp + "MlpBlock_3/Dense_0/bias"] = np.zeros(hidden, np.float32)
        w[bp + "MlpBlock_3/Dense_1/kernel"] = rng.normal(
            size=(hidden, c)).astype(np.float32)
        w[bp + "MlpBlock_3/Dense_1/bias"] = np.zeros(c, np.float32)
    path = tmp_path / "vit.npz"
    np.savez(path, **w)
    return str(path)


def test_convert_npz_shapes(tmp_path):
    path = make_npz(tmp_path)
    params = convert_npz(np.load(path), depth=2, num_patches=16)
    assert params["blocks_0"]["attn"]["qkv"]["kernel"].shape == (64, 192)
    assert params["blocks_0"]["attn"]["proj"]["kernel"].shape == (64, 64)
    assert params["pos_embed"].shape == (1, 17, 64)


def test_load_into_model(tmp_path, rng):
    import jax.numpy as jnp

    from ivit_tpu.models import VisionTransformer

    path = make_npz(tmp_path)
    model = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=10, gelu_type="ivit", softmax_type="ivit",
        layernorm_type="ivit")
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables, report = load_npz_into_model(model, path, sample)
    assert not report["missing"], report["missing"]
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    logits, _ = model.apply(variables, x, running_stat=True,
                            mutable=["quant_stats"])
    assert np.isfinite(np.asarray(logits)).all()


def test_pos_embed_resize(tmp_path, rng):
    """Loading a 4x4-grid npz into a 2x2-grid model resizes the pos grid."""
    pos = rng.normal(size=(1, 17, 64)).astype(np.float32)
    out = resize_pos_embed(pos, ntok_new=5)
    assert out.shape == (1, 5, 64)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls preserved
