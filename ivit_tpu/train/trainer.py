"""QAT trainer (the ``quant_train.py`` replacement, TPU-native).

Reproduces the reference training recipe (quant_train.py:246-658):
calibration (forward-only EMA settling) -> ranges frozen for
``calibration_epochs`` -> unfix -> AdamW + cosine schedule with warmup
(min_lr = lr/15, :391) -> gradient accumulation to an effective batch size,
gradient clipping, model EMA, mixup/cutmix with label smoothing -> per-epoch
checkpoint + best tracking -> resume with full optimizer/schedule state.

Differences by design:
* steps are jitted pure functions shardable over a Mesh (data-parallel
  batches, replicated or TP-sharded params — ``ivit_tpu.parallel``);
* W&B is replaced by an offline JSONL logger with the same fields;
* ppoly approximations are refit from tracked ranges after calibration and
  at every epoch boundary (the reference refits per forward on host).
"""

from __future__ import annotations

import dataclasses
import logging
import time
import uuid
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import str2model
from ..models.vit import BitWidths
from ..utils.metrics import AverageMeter, JsonlLogger, ProgressMeter
from . import checkpoint as ckpt_io
from .data import Mixup, data_loader
from .ppoly_fit import fit_ppoly_tables
from .steps import (cross_entropy, init_train_state, make_calibration_step,
                    make_eval_step)

log = logging.getLogger("ivit_tpu.train")


@dataclasses.dataclass
class TrainConfig:
    """Reference CLI surface (quant_train.py:31-186), trimmed to the knobs
    that affect training semantics."""

    model: str = "deit_tiny_patch16_224"
    gelu_type: str = "ivit"
    softmax_type: str = "ivit"
    layernorm_type: str = "ivit"
    bitwidth: str = "8"

    epochs: int = 90
    batch_size: int = 128
    eff_batch_size: Optional[int] = None      # grad accumulation target
    lr: float = 5e-7
    min_lr_div: float = 15.0                  # min_lr = lr / 15 (ref :391)
    warmup_epochs: int = 0
    warmup_lr: float = 1e-7
    weight_decay: float = 0.0
    clip_grad: Optional[float] = None
    model_ema: bool = False
    model_ema_decay: float = 0.99996

    calibration_batches: int = 10
    calibration_epochs: int = 0

    mixup: float = 0.8
    cutmix: float = 1.0
    smoothing: float = 0.1
    aa: Optional[str] = "rand-m9-mstd0.5-inc1"  # ref quant_train.py:117
    img_size: int = 224
    num_classes: int = 1000

    seed: int = 0
    output_dir: str = "runs"
    run_id: str = ""
    resume: Optional[str] = None
    log_interval: int = 50
    log_grad_norm: bool = False            # wandb.watch-style gradient stats
    mesh_dp: Optional[int] = None          # data-parallel width (None = off)
    mesh_tp: int = 1                       # tensor-parallel width

    def model_config(self) -> dict:
        bw = BitWidths.from_spec(self.bitwidth)
        return {
            "model": self.model,
            "gelu_type": self.gelu_type,
            "softmax_type": self.softmax_type,
            "layernorm_type": self.layernorm_type,
            "patch_embed_bitwidth": bw.patch_embed,
            "pos_encoding_bitwidth": bw.pos_encoding,
            "block_input_bitwidth": bw.block_input,
            "attention_out_bitwidth": bw.attention_out,
            "softmax_bitwidth": bw.softmax,
            "mlp_out_bitwidth": bw.mlp_out,
            "norm2_in_bitwidth": bw.norm2_in,
            "att_block_out_bitwidth": bw.att_block_out,
        }


def build_model(cfg: TrainConfig):
    return str2model(cfg.model)(
        bitwidths=BitWidths.from_spec(cfg.bitwidth),
        gelu_type=cfg.gelu_type, softmax_type=cfg.softmax_type,
        layernorm_type=cfg.layernorm_type,
        img_size=cfg.img_size, num_classes=cfg.num_classes)


# Parameter names timm's ViT/Swin `no_weight_decay()` exempts (in addition
# to every 1-d tensor): learned embeddings and the Swin rel-pos table.
_NO_DECAY_NAMES = ("cls_token", "pos_embed", "relative_position_bias_table")


def weight_decay_mask(params) -> Any:
    """True where AdamW should apply weight decay.

    Mirrors timm's ``create_optimizer`` parameter groups (the reference
    builds its optimizer through it, quant_train.py:392): decay only
    multi-dimensional kernels — never biases, norm scales (any 1-d leaf),
    nor the named embedding tables — so quant-stat-adjacent and norm
    parameters aren't pulled toward zero.
    """
    def decide(path, leaf):
        names = {getattr(k, "key", getattr(k, "name", "")) for k in path}
        if names & set(_NO_DECAY_NAMES):
            return False
        return jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """AdamW + cosine decay to lr/15 with linear warmup + optional clip,
    wrapped in MultiSteps for gradient accumulation (ref :581-587,616-631).

    Weight decay is masked per timm's parameter groups (ref :392); see
    :func:`weight_decay_mask`.
    """
    accum = max(1, (cfg.eff_batch_size or cfg.batch_size) // cfg.batch_size)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=cfg.warmup_lr if cfg.warmup_epochs else cfg.lr,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_epochs * steps_per_epoch // accum,
        decay_steps=max(1, cfg.epochs * steps_per_epoch // accum),
        end_value=cfg.lr / cfg.min_lr_div)
    chain = []
    if cfg.clip_grad:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    chain.append(optax.adamw(schedule, weight_decay=cfg.weight_decay,
                             mask=weight_decay_mask))
    tx = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule, accum


class Trainer:
    def __init__(self, cfg: TrainConfig, dataset_train, dataset_val):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.ds_train = dataset_train
        self.ds_val = dataset_val
        self.run_id = cfg.run_id or uuid.uuid4().hex[:8]
        self.logger = JsonlLogger(
            f"{cfg.output_dir}/log_{self.run_id}.jsonl", self.run_id)
        self.mixup_fn = (Mixup(cfg.mixup, cfg.cutmix,
                               label_smoothing=cfg.smoothing,
                               num_classes=cfg.num_classes)
                         if cfg.mixup > 0 or cfg.cutmix > 0 else None)
        self.steps_per_epoch = max(1, len(dataset_train) // cfg.batch_size)
        self.tx, self.schedule, self.accum = build_optimizer(
            cfg, self.steps_per_epoch)
        self.rng = np.random.default_rng(cfg.seed)
        from .randaug import parse_rand_augment
        self.rand_augment = parse_rand_augment(cfg.aa)

        sample = jnp.zeros((cfg.batch_size, cfg.img_size, cfg.img_size, 3),
                           jnp.float32)
        self.state = init_train_state(self.model, self.tx,
                                      jax.random.PRNGKey(cfg.seed), sample)
        self.ema_params = (jax.tree.map(np.copy, self.state["params"])
                          if cfg.model_ema else None)
        self.best_acc1 = 0.0
        self.start_epoch = 0

        self.mesh = None
        self._batch_shardings = None
        if cfg.mesh_dp:
            from ..parallel import (batch_sharding, make_mesh,
                                    param_shardings, replicated)
            self.mesh = make_mesh(dp=cfg.mesh_dp, tp=cfg.mesh_tp)
            state_shardings = {
                "params": param_shardings(self.state["params"], self.mesh),
                "quant_stats": param_shardings(self.state["quant_stats"],
                                               self.mesh),
                "opt_state": param_shardings(self.state["opt_state"],
                                             self.mesh),
                "step": replicated(self.mesh),
            }
            self._batch_shardings = {"image": batch_sharding(self.mesh),
                                     "label": batch_sharding(self.mesh)}
            self.state = jax.device_put(self.state, state_shardings)
            self._train_step = jax.jit(
                self._make_train_step(), static_argnums=(3,),
                in_shardings=(state_shardings, self._batch_shardings,
                              replicated(self.mesh)),
                out_shardings=(state_shardings, replicated(self.mesh)))
        else:
            self._train_step = jax.jit(self._make_train_step(),
                                       static_argnums=(3,))
        self._eval_step = jax.jit(make_eval_step(self.model, cfg.num_classes))
        self._calib_step = jax.jit(make_calibration_step(self.model))

        if cfg.resume:
            self._resume(cfg.resume)

    # -- steps --------------------------------------------------------------

    def _make_train_step(self):
        model, tx, ncls = self.model, self.tx, self.cfg.num_classes

        def step(state, batch, rng, running_stat):
            def loss_fn(params):
                rngs = {"dropout": rng,
                        "droppath": jax.random.fold_in(rng, 1)}
                logits, upd = model.apply(
                    {"params": params, "quant_stats": state["quant_stats"]},
                    batch["image"], running_stat=running_stat, train=True,
                    rngs=rngs, mutable=["quant_stats"])
                return (cross_entropy(logits, batch["label"], ncls),
                        (upd["quant_stats"], logits))

            (loss, (qs, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt_state = tx.update(grads, state["opt_state"],
                                           state["params"])
            params = optax.apply_updates(state["params"], updates)
            label = batch["label"]
            hard = label.argmax(-1) if label.ndim == 2 else label
            acc = jnp.mean((logits.argmax(-1) == hard).astype(jnp.float32))
            metrics = {"loss": loss, "acc": acc}
            if self.cfg.log_grad_norm:
                metrics["grad_norm"] = optax.global_norm(grads)
            return ({"params": params, "quant_stats": qs,
                     "opt_state": opt_state, "step": state["step"] + 1},
                    metrics)

        return step

    # -- lifecycle ----------------------------------------------------------

    def calibrate(self):
        """Forward-only EMA range settling (ref calibrate_model :199-244)."""
        cfg = self.cfg
        log.info("calibrating on %d batches", cfg.calibration_batches)
        it = data_loader(self.ds_train, cfg.batch_size, train=True,
                         img_size=cfg.img_size, seed=cfg.seed + 999,
                         rand_augment=self.rand_augment)
        qs = self.state["quant_stats"]
        prev_scale = None
        for i, batch in enumerate(it):
            if i >= cfg.calibration_batches:
                break
            qs = self._calib_step(self.state["params"], qs,
                                  jnp.asarray(batch["image"]))
            scale = float(np.asarray(
                qs["qact_input"]["act_scaling_factor"]).reshape(-1)[0])
            if prev_scale:
                log.info("calib %d: input scale %.6g (drift %.3g)",
                         i, scale, abs(scale - prev_scale) / prev_scale)
            prev_scale = scale
        self.state["quant_stats"] = qs
        self._refit_ppoly()

    def _refit_ppoly(self):
        if "ppoly" in (self.cfg.gelu_type + self.cfg.softmax_type):
            vars_ = fit_ppoly_tables(
                self.model, {"params": self.state["params"],
                             "quant_stats": self.state["quant_stats"]})
            self.state["quant_stats"] = jax.tree.map(
                jnp.asarray, vars_["quant_stats"])

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        # ranges frozen until calibration_epochs, then unfixed (ref :454-459)
        running_stat = epoch >= cfg.calibration_epochs
        meters = {k: AverageMeter(k, ":.4f") for k in
                  ("loss", "acc", "time")}
        progress = ProgressMeter(
            self.steps_per_epoch,
            list(meters.values()), prefix=f"Epoch[{epoch}]")
        it = data_loader(self.ds_train, cfg.batch_size, train=True,
                         img_size=cfg.img_size, seed=cfg.seed + epoch,
                         rand_augment=self.rand_augment)
        t0 = time.time()
        for i, batch in enumerate(it):
            images, labels = batch["image"], batch["label"]
            if self.mixup_fn is not None:
                images, labels = self.mixup_fn(images, labels, self.rng)
            device_batch = {"image": jnp.asarray(images),
                            "label": jnp.asarray(labels)}
            if self._batch_shardings is not None:
                device_batch = jax.device_put(device_batch,
                                              self._batch_shardings)
            self.state, metrics = self._train_step(
                self.state, device_batch,
                jax.random.PRNGKey(epoch * 100003 + i),
                running_stat)
            if self.ema_params is not None:
                d = self.cfg.model_ema_decay
                self.ema_params = jax.tree.map(
                    lambda e, p: e * d + (1 - d) * p,
                    self.ema_params, self.state["params"])
            dt = time.time() - t0
            t0 = time.time()
            meters["loss"].update(float(metrics["loss"]))
            meters["acc"].update(float(metrics["acc"]))
            meters["time"].update(dt)
            if i % cfg.log_interval == 0:
                progress.display(i)
                self.logger.log({"phase": "train", "epoch": epoch,
                                 "loss": float(metrics["loss"]),
                                 "acc": float(metrics["acc"])},
                                step=int(self.state["step"]))
        return meters["loss"].avg

    def validate(self):
        cfg = self.cfg
        totals = {"loss": 0.0, "top1": 0.0, "top5": 0.0, "n": 0}
        it = data_loader(self.ds_val, cfg.batch_size, train=False,
                         img_size=cfg.img_size, drop_last=True)
        variables = {"params": self.state["params"],
                     "quant_stats": self.state["quant_stats"]}
        for batch in it:
            m = self._eval_step(variables,
                                {"image": jnp.asarray(batch["image"]),
                                 "label": jnp.asarray(batch["label"])})
            n = int(m["count"])
            totals["n"] += n
            for k in ("loss", "top1", "top5"):
                totals[k] += float(m[k]) * n
        n = max(1, totals["n"])
        return {k: totals[k] / n for k in ("loss", "top1", "top5")}

    def fit(self):
        cfg = self.cfg
        if cfg.calibration_batches and self.start_epoch == 0:
            self.calibrate()
        t_start = time.time()
        for epoch in range(self.start_epoch, cfg.epochs):
            train_loss = self.train_epoch(epoch)
            self._refit_ppoly()
            val = self.validate()
            is_best = val["top1"] > self.best_acc1
            self.best_acc1 = max(self.best_acc1, val["top1"])
            elapsed = time.time() - t_start
            eta = elapsed / (epoch - self.start_epoch + 1) * \
                (cfg.epochs - epoch - 1)
            log.info("epoch %d: loss %.4f top1 %.4f top5 %.4f best %.4f "
                     "eta %.0fs", epoch, train_loss, val["top1"],
                     val["top5"], self.best_acc1, eta)
            self.logger.log({"phase": "epoch", "epoch": epoch,
                             "train_loss": train_loss, **val,
                             "best_acc1": self.best_acc1, "eta_s": eta})
            ckpt_io.save_checkpoint(
                f"{cfg.output_dir}/checkpoint_{self.run_id}",
                self.state, epoch=epoch, best_acc1=self.best_acc1,
                model_config=cfg.model_config(),
                args=dataclasses.asdict(cfg),
                ema_params=self.ema_params, is_best=is_best)
        return self.best_acc1

    # -- resume -------------------------------------------------------------

    def _resume(self, path: str):
        template = dict(self.state)
        if self.ema_params is not None:
            template["ema_params"] = self.ema_params
        state, meta = ckpt_io.load_checkpoint(path, template)
        self.ema_params = state.pop("ema_params", self.ema_params)
        self.state = state
        self.start_epoch = meta["epoch"] + 1
        self.best_acc1 = meta["best_acc1"]
        log.info("resumed from %s at epoch %d (best %.4f)", path,
                 self.start_epoch, self.best_acc1)
