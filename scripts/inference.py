#!/usr/bin/env python
"""Inference / evaluation / engine-export CLI
(ref ``/root/reference/scripts/inference.py`` parity).

Loads a checkpoint (this framework's directory format or a reference
``.pth.tar``), reconstructs the model from the embedded ``model_config``
with optional CLI overrides of approximation types/bitwidths, optionally
re-calibrates, freezes to the integer engine, and evaluates top-1/3/5 with
per-batch latency stats.  ``--export-engine`` saves the frozen integer
EngineSpec (the TPU counterpart of the reference's ONNX/TVM export).
"""

import argparse
import os

if os.environ.get("JAX_PLATFORMS"):
    # the hosted TPU plugin ignores this env var; honor it explicitly
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import json
import logging
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="I-ViT TPU inference")
    p.add_argument("--weights", required=True,
                   help="checkpoint dir (ours) or reference .pth.tar")
    p.add_argument("--model", default=None, help="override model name")
    p.add_argument("--gelu", default=None)
    p.add_argument("--softmax", default=None)
    p.add_argument("--layernorm", default=None)
    p.add_argument("--bitwidth", default=None)
    p.add_argument("--data-path", default=None)
    p.add_argument("--dataset", default="synthetic",
                   choices=["imagenet", "cifar100", "synthetic"])
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--calibration-batches", type=int, default=0,
                   help="re-calibrate ranges before freezing")
    p.add_argument("--engine", choices=["int", "sim"], default="int",
                   help="int = integer engine (Pallas), sim = QAT fake-quant")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--export-engine", default=None,
                   help="save the frozen integer EngineSpec to this path")
    p.add_argument("--io-stats", default=None,
                   help="write per-layer IO statistics to this CSV")
    p.add_argument("--max-batches", type=int, default=None)
    return p.parse_args()


def load_model_and_vars(args):
    import jax
    import jax.numpy as jnp

    from ivit_tpu.models import BitWidths, str2model

    if args.weights.endswith((".pth.tar", ".pth", ".tar")):
        from ivit_tpu.compat.torch_ckpt import (load_into_model,
                                                load_torch_checkpoint,
                                                model_from_config)
        _, model_config = load_torch_checkpoint(args.weights)
        model_config = dict(model_config or {})
    else:
        from ivit_tpu.train.checkpoint import load_meta
        model_config = load_meta(args.weights)["model_config"]

    # CLI overrides (ref inference.py:133-190)
    if args.model:
        model_config["model"] = args.model
    for key, val in (("gelu_type", args.gelu), ("softmax_type", args.softmax),
                     ("layernorm_type", args.layernorm)):
        if val:
            model_config[key] = val
    kwargs = dict(
        gelu_type=model_config.get("gelu_type", "ivit"),
        softmax_type=model_config.get("softmax_type", "ivit"),
        layernorm_type=model_config.get("layernorm_type", "ivit"),
        img_size=args.img_size)
    if args.num_classes:
        kwargs["num_classes"] = args.num_classes
    if args.bitwidth:
        kwargs["bitwidths"] = BitWidths.from_spec(args.bitwidth)
    model = str2model(model_config["model"])(**kwargs)

    sample = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32)
    if args.weights.endswith((".pth.tar", ".pth", ".tar")):
        variables, report = load_into_model(model, args.weights, sample,
                                            strict=False)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        from ivit_tpu.train.checkpoint import load_variables
        variables = jax.tree.map(jnp.asarray, load_variables(args.weights))
    return model, variables, model_config


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    import jax
    import jax.numpy as jnp

    from ivit_tpu.engine import Engine, freeze_model
    from ivit_tpu.train.data import (CIFAR100Dataset, ImageFolderDataset,
                                     SyntheticDataset, data_loader)

    model, variables, model_config = load_model_and_vars(args)
    logging.info("model config: %s", model_config)

    if args.dataset == "synthetic":
        ncls = args.num_classes or model.num_classes
        ds = SyntheticDataset(n=8 * args.batch_size, num_classes=ncls,
                              img_size=args.img_size, seed=1)
        ds_cal = SyntheticDataset(n=8 * args.batch_size, num_classes=ncls,
                                  img_size=args.img_size, seed=2)
    elif args.dataset == "cifar100":
        ds = CIFAR100Dataset(args.data_path, train=False)
        ds_cal = CIFAR100Dataset(args.data_path, train=True)
    else:
        ds = ImageFolderDataset(f"{args.data_path}/val")
        ds_cal = ImageFolderDataset(f"{args.data_path}/train")

    if args.calibration_batches:
        from ivit_tpu.train.steps import make_calibration_step
        calib = jax.jit(make_calibration_step(model))
        qs = variables["quant_stats"]
        for i, batch in enumerate(data_loader(
                ds_cal, args.batch_size, train=True,
                img_size=args.img_size)):
            if i >= args.calibration_batches:
                break
            qs = calib(variables["params"], qs, jnp.asarray(batch["image"]))
        variables = {**variables, "quant_stats": qs}

    if "ppoly" in (model.gelu_type + model.softmax_type):
        from ivit_tpu.train.ppoly_fit import fit_ppoly_tables
        variables = jax.tree.map(jnp.asarray,
                                 fit_ppoly_tables(model, variables))

    if args.engine == "int":
        spec = freeze_model(model, variables)
        eng = Engine(spec, pallas=False if args.no_pallas else None)
        fwd = lambda x: eng(x)  # noqa: E731
        if args.export_engine:
            from ivit_tpu.engine.export import save_engine
            save_engine(spec, args.export_engine)
            logging.info("saved engine spec to %s", args.export_engine)
    else:
        fwd = jax.jit(lambda x: model.apply(variables, x,
                                            running_stat=False))

    if args.io_stats:
        from ivit_tpu.utils.iostats import attach_io_stats
        fwd_stats = attach_io_stats(model, variables)

    top1 = top3 = top5 = n = 0
    times = []
    for bi, batch in enumerate(data_loader(ds, args.batch_size, train=False,
                                           img_size=args.img_size,
                                           drop_last=True)):
        if args.max_batches and bi >= args.max_batches:
            break
        x = jnp.asarray(batch["image"])
        t0 = time.perf_counter()
        logits = np.asarray(jax.block_until_ready(fwd(x)))
        times.append(time.perf_counter() - t0)
        order = np.argsort(-logits, axis=-1)
        lab = batch["label"][:, None]
        top1 += (order[:, :1] == lab).any(-1).sum()
        top3 += (order[:, :3] == lab).any(-1).sum()
        top5 += (order[:, :5] == lab).any(-1).sum()
        n += len(batch["label"])
        if args.io_stats and bi == 0:
            fwd_stats(x)

    times = np.asarray(times[1:] or times)
    result = {
        "top1": top1 / max(1, n), "top3": top3 / max(1, n),
        "top5": top5 / max(1, n), "images": int(n),
        "ms_per_batch": float(times.mean() * 1e3),
        "ms_per_image": float(times.mean() * 1e3 / args.batch_size),
        "images_per_sec": float(args.batch_size / times.mean()),
    }
    if args.io_stats:
        from ivit_tpu.utils.iostats import save_io_stats
        save_io_stats(args.io_stats)
        logging.info("io stats written to %s", args.io_stats)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
