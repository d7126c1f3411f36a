#!/usr/bin/env python
"""QAT training CLI (ref ``/root/reference/quant_train.py`` flag surface).

Examples:
  python scripts/quant_train.py --model deit_tiny_patch16_224 \\
      --data-path /data/imagenet --epochs 90 --batch-size 128 --lr 5e-7 \\
      --gelu ivit --softmax ivit --layernorm ivit --bitwidth 8
  python scripts/quant_train.py --dataset synthetic --epochs 1  # smoke run
"""

import argparse
import os

if os.environ.get("JAX_PLATFORMS"):
    # the hosted TPU plugin ignores this env var; honor it explicitly
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import logging
import sys

sys.path.insert(0, ".")


def parse_args():
    p = argparse.ArgumentParser(description="I-ViT TPU QAT training")
    p.add_argument("--model", default="deit_tiny_patch16_224")
    p.add_argument("--data-path", default=None)
    p.add_argument("--dataset", default="imagenet",
                   choices=["imagenet", "cifar100", "synthetic"])
    p.add_argument("--synthetic-samples", type=int, default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--eff-batch-size", type=int, default=None,
                   help="gradient-accumulation target batch size")
    p.add_argument("--lr", type=float, default=5e-7)
    p.add_argument("--warmup-epochs", type=int, default=0)
    p.add_argument("--warmup-lr", type=float, default=1e-7)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--model-ema", action="store_true")
    p.add_argument("--model-ema-decay", type=float, default=0.99996)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--repeated-aug", action="store_true")
    p.add_argument("--aa", default="rand-m9-mstd0.5-inc1",
                   help="RandAugment policy string (ref quant_train.py:117; "
                        "'none' disables)")
    # quantization config (ref quant_train.py:151-170)
    p.add_argument("--bitwidth", default="8",
                   help="'8' or 8-value CSV: patch_embed,pos_enc,block_in,"
                        "attn_out,softmax,mlp_out,norm2_in,att_block_out")
    p.add_argument("--gelu", default="ivit")
    p.add_argument("--softmax", default="ivit")
    p.add_argument("--layernorm", default="ivit")
    p.add_argument("--layer-type", default=None,
                   help="bulk override for gelu/softmax/layernorm")
    p.add_argument("--calibration-batches", type=int, default=10)
    p.add_argument("--calibration-epochs", type=int, default=0)
    # experiment infra
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="runs")
    p.add_argument("--run-id", default="")
    p.add_argument("--resume", default=None)
    p.add_argument("--pretrained", default=None,
                   help="reference .pth.tar or float weights to start from")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--log-grad-norm", action="store_true")
    p.add_argument("--mesh-dp", type=int, default=None,
                   help="data-parallel width over local devices")
    p.add_argument("--mesh-tp", type=int, default=1)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize()")
    return p.parse_args()


def build_datasets(args):
    from ivit_tpu.train.data import (CIFAR100Dataset, ImageFolderDataset,
                                     SyntheticDataset)

    if args.dataset == "synthetic":
        ncls = args.num_classes or 10
        n = args.synthetic_samples or 64 * args.batch_size
        return (SyntheticDataset(n=n, num_classes=ncls,
                                 img_size=args.img_size),
                SyntheticDataset(n=max(args.batch_size, n // 8),
                                 num_classes=ncls,
                                 img_size=args.img_size, seed=1),
                ncls)
    if args.dataset == "cifar100":
        tr = CIFAR100Dataset(args.data_path, train=True)
        va = CIFAR100Dataset(args.data_path, train=False)
        return tr, va, 100
    tr = ImageFolderDataset(f"{args.data_path}/train")
    va = ImageFolderDataset(f"{args.data_path}/val")
    return tr, va, tr.num_classes


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from ivit_tpu.train.trainer import TrainConfig, Trainer

    if args.layer_type:
        args.gelu = args.softmax = args.layernorm = args.layer_type

    if args.distributed:
        import jax
        jax.distributed.initialize()

    ds_train, ds_val, ncls = build_datasets(args)
    cfg = TrainConfig(
        model=args.model, gelu_type=args.gelu, softmax_type=args.softmax,
        layernorm_type=args.layernorm, bitwidth=args.bitwidth,
        epochs=args.epochs, batch_size=args.batch_size,
        eff_batch_size=args.eff_batch_size, lr=args.lr,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        model_ema=args.model_ema, model_ema_decay=args.model_ema_decay,
        calibration_batches=args.calibration_batches,
        calibration_epochs=args.calibration_epochs,
        mixup=args.mixup, cutmix=args.cutmix, smoothing=args.smoothing,
        aa=args.aa,
        img_size=args.img_size, num_classes=args.num_classes or ncls,
        seed=args.seed, output_dir=args.output_dir, run_id=args.run_id,
        resume=args.resume, log_interval=args.log_interval,
        log_grad_norm=args.log_grad_norm,
        mesh_dp=args.mesh_dp, mesh_tp=args.mesh_tp)

    trainer = Trainer(cfg, ds_train, ds_val)
    if args.pretrained and not args.resume:
        from ivit_tpu.compat.torch_ckpt import load_into_model
        import jax.numpy as jnp
        sample = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
        variables, report = load_into_model(trainer.model, args.pretrained,
                                            sample, strict=False)
        import jax
        trainer.state["params"] = jax.tree.map(jnp.asarray,
                                               variables["params"])
        trainer.state["quant_stats"] = jax.tree.map(jnp.asarray,
                                                    variables["quant_stats"])
        logging.info("loaded pretrained weights (%d leaves, %d missing)",
                     len(report["matched"]), len(report["missing"]))

    best = trainer.fit()
    logging.info("best top-1: %.4f", best)


if __name__ == "__main__":
    main()
