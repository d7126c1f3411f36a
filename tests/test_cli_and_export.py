"""CLI smoke tests + engine export round-trip + io-stats tracing."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_engine_export_roundtrip(tmp_path, rng):
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.export import load_engine, save_engine
    from ivit_tpu.engine.vit_int import engine_forward

    model, variables = build_calibrated(rng)
    spec = freeze_model(model, variables)
    save_engine(spec, str(tmp_path / "engine.npz"))
    spec2 = load_engine(str(tmp_path / "engine.npz"))
    assert spec2.config == spec.config
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    y1 = np.asarray(engine_forward(spec, x, pallas=False))
    y2 = np.asarray(engine_forward(spec2, x, pallas=False))
    np.testing.assert_array_equal(y1, y2)
    # weights survived as int8
    assert spec2.params["blocks"][0]["qkv_w"].dtype == jnp.int8


def test_io_stats(rng):
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    from ivit_tpu.utils import iostats

    model, variables = build_calibrated(rng)
    iostats.clear_io_stats()
    fwd = iostats.attach_io_stats(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    fwd(x)
    df = iostats.get_io_stats_df()
    assert len(df) > 20
    assert {"layer", "scale_out", "min_out_int", "max_out_int"} <= set(df)
    # 8-bit activations stay in envelope at quantizer outputs
    qacts = df[df.layer.str.endswith("qact1")]
    assert (qacts.max_out_int.abs() <= 65536).all()
    iostats.clear_io_stats()
    assert len(iostats.get_io_stats_df()) == 0


def test_train_cli_smoke(tmp_path):
    cmd = [sys.executable, "scripts/quant_train.py", "--dataset", "synthetic",
           "--epochs", "1", "--batch-size", "4", "--img-size", "64",
           "--num-classes", "5", "--calibration-batches", "1",
           "--synthetic-samples", "16",
           "--model", "deit_tiny_patch16_224",
           "--output-dir", str(tmp_path), "--run-id", "smoke",
           "--log-interval", "1000"]
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=500,
                       env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "checkpoint_smoke" / "meta.json").exists()


def test_inference_cli_smoke(tmp_path):
    # train one tiny checkpoint first (reuse CLI), then evaluate it
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    train = [sys.executable, "scripts/quant_train.py", "--dataset",
             "synthetic", "--epochs", "1", "--batch-size", "4",
             "--img-size", "64", "--num-classes", "5",
             "--synthetic-samples", "16",
             "--calibration-batches", "1", "--output-dir", str(tmp_path),
             "--run-id", "ev", "--log-interval", "1000"]
    r = subprocess.run(train, capture_output=True, text=True, timeout=500,
                       env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    infer = [sys.executable, "scripts/inference.py", "--weights",
             str(tmp_path / "checkpoint_ev"), "--dataset", "synthetic",
             "--batch-size", "4", "--img-size", "64", "--num-classes", "5",
             "--max-batches", "2", "--no-pallas",
             "--export-engine", str(tmp_path / "eng.npz"),
             "--io-stats", str(tmp_path / "io.csv")]
    r = subprocess.run(infer, capture_output=True, text=True, timeout=500,
                       env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert 0 <= out["top1"] <= 1 and out["images"] > 0
    assert (tmp_path / "eng.npz").exists()
    assert (tmp_path / "io.csv").exists()


def test_swin_engine_export_roundtrip(tmp_path, rng):
    """Swin specs round-trip through the .npz artifact (SwinEngineConfig
    restored with its static tuples) and Engine dispatches on spec type."""
    sys.path.insert(0, "tests")
    from test_swin_engine import build_swin

    from ivit_tpu.engine import Engine
    from ivit_tpu.engine.export import load_engine, save_engine
    from ivit_tpu.engine.swin_int import (SwinEngineSpec, freeze_swin_model,
                                          swin_engine_forward)

    model, variables = build_swin(rng)
    spec = freeze_swin_model(model, variables)
    save_engine(spec, str(tmp_path / "swin.npz"))
    spec2 = load_engine(str(tmp_path / "swin.npz"))
    assert isinstance(spec2, SwinEngineSpec)
    assert spec2.config == spec.config
    x = jnp.asarray(rng.normal(
        size=(2, spec.config.img_size, spec.config.img_size, 3)
    ).astype(np.float32))
    y1 = np.asarray(swin_engine_forward(spec, x, pallas=False))
    y2 = np.asarray(Engine(spec2, pallas=False)(x))
    np.testing.assert_array_equal(y1, y2)
