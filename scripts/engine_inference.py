#!/usr/bin/env python
"""Run a saved integer-engine artifact (ref ``scripts/onnx_inference.py``
parity — evaluating the *exported* deployment artifact rather than the
checkpoint).

  python scripts/engine_inference.py --engine eng.npz --dataset synthetic
  python scripts/engine_inference.py --engine eng.npz --serve --batch-size 64
"""

import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--engine", required=True, help="saved EngineSpec (.npz)")
    p.add_argument("--dataset", default="synthetic",
                   choices=["imagenet", "cifar100", "synthetic"])
    p.add_argument("--data-path", default=None)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--serve", action="store_true",
                   help="drive through the continuous-batching server")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ivit_tpu.engine import Engine
    from ivit_tpu.engine.export import load_engine
    from ivit_tpu.train.data import (CIFAR100Dataset, ImageFolderDataset,
                                     SyntheticDataset, data_loader)

    spec = load_engine(args.engine)
    cfg = spec.config
    print(f"engine: {cfg.gelu_type}/{cfg.softmax_type}/{cfg.layernorm_type} "
          f"dim={cfg.embed_dim} depth={cfg.depth} classes={cfg.num_classes}",
          file=sys.stderr)

    if args.dataset == "synthetic":
        ds = SyntheticDataset(n=8 * args.batch_size,
                              num_classes=cfg.num_classes,
                              img_size=cfg.img_size, seed=1)
    elif args.dataset == "cifar100":
        ds = CIFAR100Dataset(args.data_path, train=False)
    else:
        ds = ImageFolderDataset(f"{args.data_path}/val")

    pallas = False if args.no_pallas else None
    top1 = top5 = n = 0
    times = []

    if args.serve:
        from ivit_tpu.engine.serving import ServingEngine
        with ServingEngine(spec, batch_size=args.batch_size,
                           pallas=pallas) as srv:
            for bi, batch in enumerate(data_loader(
                    ds, args.batch_size, train=False,
                    img_size=cfg.img_size, drop_last=True)):
                if args.max_batches and bi >= args.max_batches:
                    break
                logits = srv.infer(batch["image"])
                order = np.argsort(-logits, axis=-1)
                lab = batch["label"][:, None]
                top1 += (order[:, :1] == lab).any(-1).sum()
                top5 += (order[:, :5] == lab).any(-1).sum()
                n += len(batch["label"])
            metrics = srv.metrics.summary()
    else:
        eng = Engine(spec, pallas=pallas)
        for bi, batch in enumerate(data_loader(
                ds, args.batch_size, train=False, img_size=cfg.img_size,
                drop_last=True)):
            if args.max_batches and bi >= args.max_batches:
                break
            t0 = time.perf_counter()
            logits = np.asarray(jax.block_until_ready(
                eng(jnp.asarray(batch["image"]))))
            times.append(time.perf_counter() - t0)
            order = np.argsort(-logits, axis=-1)
            lab = batch["label"][:, None]
            top1 += (order[:, :1] == lab).any(-1).sum()
            top5 += (order[:, :5] == lab).any(-1).sum()
            n += len(batch["label"])
        t = np.asarray(times[1:] or times)
        metrics = {"ms_per_batch": float(t.mean() * 1e3),
                   "images_per_sec": float(args.batch_size / t.mean())}

    print(json.dumps({"top1": top1 / max(1, n), "top5": top5 / max(1, n),
                      "images": int(n), **metrics}, indent=2))


if __name__ == "__main__":
    main()
