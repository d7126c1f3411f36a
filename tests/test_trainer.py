"""Trainer lifecycle tests: calibrate -> train -> validate -> resume."""

import dataclasses

import numpy as np
import pytest

from ivit_tpu.train.data import (Mixup, SyntheticDataset, data_loader,
                                 eval_transform, repeated_aug_indices,
                                 train_transform)
from ivit_tpu.train.trainer import TrainConfig, Trainer


def small_cfg(tmp_path, **kw):
    kw.setdefault("model", "deit_tiny_patch16_224")
    return TrainConfig(
        epochs=kw.pop("epochs", 1), batch_size=8, lr=1e-4,
        calibration_batches=2, num_classes=10, img_size=224,
        mixup=kw.pop("mixup", 0.8), output_dir=str(tmp_path),
        log_interval=1, **kw)


def test_data_pipeline(rng):
    ds = SyntheticDataset(n=32, img_size=64, num_classes=5)
    batches = list(data_loader(ds, 8, train=True, img_size=64, num_threads=2))
    assert len(batches) == 4
    assert batches[0]["image"].shape == (8, 64, 64, 3)
    assert batches[0]["image"].dtype == np.float32
    # eval path keeps all samples
    evs = list(data_loader(ds, 8, train=False, img_size=64, drop_last=False))
    assert sum(len(b["label"]) for b in evs) == 32


def test_transforms(rng):
    img = rng.integers(0, 256, (90, 120, 3), dtype=np.uint8)
    t = train_transform(img, rng, img_size=64)
    assert t.shape == (64, 64, 3) and t.dtype == np.float32
    e = eval_transform(img, img_size=64)
    assert e.shape == (64, 64, 3)


def test_mixup(rng):
    mx = Mixup(num_classes=10, label_smoothing=0.1)
    imgs = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    out, y = mx(imgs, labels, rng)
    assert y.shape == (8, 10)
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-5)


def test_repeated_aug(rng):
    idx = repeated_aug_indices(30, rng, repeats=3)
    assert len(idx) == 30
    # each index appears up to 3 times, from ~1/3 of the dataset
    assert len(np.unique(idx)) <= 12


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, rng):
    ds_train = SyntheticDataset(n=32, img_size=224, num_classes=10)
    ds_val = SyntheticDataset(n=16, img_size=224, num_classes=10, seed=7)
    cfg = small_cfg(tmp_path)
    tr = Trainer(cfg, ds_train, ds_val)
    best = tr.fit()
    assert 0.0 <= best <= 1.0

    # resume from the saved checkpoint and run one more epoch
    cfg2 = dataclasses.replace(
        cfg, epochs=2, resume=f"{tmp_path}/checkpoint_{tr.run_id}",
        run_id=tr.run_id)
    tr2 = Trainer(cfg2, ds_train, ds_val)
    assert tr2.start_epoch == 1
    assert int(tr2.state["step"]) > 0
    tr2.fit()


@pytest.mark.slow
def test_trainer_on_mesh(tmp_path, rng):
    """DP training through the Trainer on the virtual 8-device mesh."""
    ds_train = SyntheticDataset(n=16, img_size=224, num_classes=5)
    ds_val = SyntheticDataset(n=8, img_size=224, num_classes=5, seed=7)
    cfg = small_cfg(tmp_path, epochs=1)
    import dataclasses as dc
    cfg = dc.replace(cfg, mesh_dp=4, mesh_tp=2, num_classes=5,
                     log_grad_norm=True, calibration_batches=1)
    tr = Trainer(cfg, ds_train, ds_val)
    best = tr.fit()
    assert 0.0 <= best <= 1.0
    assert tr.mesh is not None


def test_weight_decay_mask(rng):
    """timm create_optimizer parity (ref quant_train.py:392): decay applies
    only to multi-dim kernels — never biases, norm weights (1-d leaves),
    cls_token, pos_embed, or the Swin relative_position_bias_table."""
    import jax
    import jax.numpy as jnp

    from ivit_tpu.models import str2model
    from ivit_tpu.train.trainer import weight_decay_mask

    model = str2model("deit_tiny_patch16_224")(num_classes=10)
    x0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)["params"]
    mask = weight_decay_mask(params)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree_util.tree_leaves(mask)
    assert len(flat_p) == len(flat_m)
    n_decay = 0
    for (path, leaf), decay in zip(flat_p, flat_m):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if "cls_token" in names or "pos_embed" in names:
            assert not decay, names
        elif names[-1] == "bias" or jnp.ndim(leaf) <= 1:
            assert not decay, names
        elif names[-1] == "kernel":
            assert decay, names
            n_decay += 1
    assert n_decay >= 4 * 12  # every block's qkv/proj/fc1/fc2 kernels

    # swin: the rel-pos table is 2-d but must not decay
    swin = str2model("swin_tiny_patch4_window7_224")(
        num_classes=10, drop_path_rate=0.0)
    sp = jax.jit(lambda a: swin.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)["params"]
    smask = weight_decay_mask(sp)
    hits = [m for (path, leaf), m in zip(
        jax.tree_util.tree_flatten_with_path(sp)[0],
        jax.tree_util.tree_leaves(smask))
        if any("relative_position_bias_table" ==
               getattr(k, "key", getattr(k, "name", "")) for k in path)]
    assert hits and not any(hits)


def test_optimizer_decay_masks_applied(tmp_path):
    """With huge weight_decay and zero grads, masked leaves must not move."""
    import jax
    import jax.numpy as jnp
    import optax

    from ivit_tpu.models import str2model
    from ivit_tpu.train.trainer import TrainConfig, build_optimizer

    cfg = TrainConfig(model="deit_tiny_patch16_224", weight_decay=1.0,
                      lr=1e-2, epochs=1, num_classes=10)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)
    model = str2model(cfg.model)(num_classes=10)
    x0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)["params"]
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    upd = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, u in upd:
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        moved = float(jnp.abs(u).max())
        if ("cls_token" in names or "pos_embed" in names
                or names[-1] == "bias" or jnp.ndim(u) <= 1):
            assert moved == 0.0, names
        elif names[-1] == "kernel":
            assert moved > 0.0, names


def test_randaugment_timm_parity(rng):
    """Op inventory + magnitude mapping vs timm auto_augment.py's table.

    The expected values are timm's published level maps (the reference
    trains through ``create_transform(auto_augment='rand-m9-mstd0.5-inc1')``,
    ref utils/data_utils.py:42-55, quant_train.py:117); timm itself is not
    in this image, so the table is transcribed, not imported.
    """
    from ivit_tpu.train import randaug as ra

    # 1. op inventory == timm _RAND_TRANSFORMS (15 ops, same names)
    names = [n for n, _ in ra.RAND_TRANSFORMS]
    assert names == [
        "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
        "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
        "Sharpness", "ShearX", "ShearY", "TranslateXRel", "TranslateYRel"]

    # 2. magnitude -> argument mapping at M=9 (timm LEVEL_TO_ARG)
    r = np.random.default_rng(0)
    assert ra._enhance_level(9, r) == pytest.approx(9 / 10 * 1.8 + 0.1)
    assert abs(ra._shear_level(9, r)) == pytest.approx(0.9 * 0.3)
    assert abs(ra._translate_rel_level(9, r)) == pytest.approx(0.9 * 0.45)
    assert abs(ra._rotate_level(9, r)) == pytest.approx(0.9 * 30)
    assert ra._posterize_level(9, r) == int(9 / 10 * 4)          # 3 bits
    assert ra._solarize_level(9, r) == int(9 / 10 * 256)         # 230
    assert ra._solarize_add_level(9, r) == int(9 / 10 * 110)     # 99
    # increasing flavor (the reference default's -inc1)
    assert abs(ra._enhance_level(9, r, inc=True) - 1.0) == \
        pytest.approx(0.9 * 0.9)
    assert ra._posterize_level(9, r, inc=True) == 4 - 3          # 1 bit
    assert ra._solarize_level(9, r, inc=True) == 256 - 230

    # 3. config-string grammar (timm rand_augment_transform)
    pol = ra.parse_rand_augment("rand-m9-mstd0.5-inc1")
    assert (pol.magnitude, pol.mstd, pol.num_layers, pol.prob,
            pol.increasing) == (9.0, 0.5, 2, 0.5, True)
    assert ra.parse_rand_augment("none") is None

    # 4. magnitude sampling: gauss(M, mstd) clamped to [0, 10]
    levels = [pol._sample_level(np.random.default_rng(s)) for s in range(200)]
    assert all(0.0 <= l <= 10.0 for l in levels)
    assert 8.0 < np.mean(levels) < 10.0

    # 5. every op runs and preserves shape/dtype on uint8 HWC
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    from PIL import Image
    for name, fn in ra.RAND_TRANSFORMS:
        for inc in (False, True):
            out = fn(Image.fromarray(img), 9.0, ra.IMAGENET_FILL,
                     np.random.default_rng(1), inc=inc)
            arr = np.asarray(out)
            assert arr.shape == img.shape and arr.dtype == np.uint8, name

    # 6. wired into train_transform (jitter off when aa active, like timm)
    t = train_transform(img, np.random.default_rng(2), img_size=64,
                        rand_augment=pol)
    assert t.shape == (64, 64, 3) and t.dtype == np.float32
