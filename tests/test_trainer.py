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
