"""Jittable QAT train/eval steps (the pjit-able core of the trainer).

The reference trains single-device (``quant_train.py:572-658``); here the
step is a pure function over a ``TrainState`` pytree, shardable over a
``Mesh`` (batch on the data axis, params replicated or TP-sharded per
``ivit_tpu.parallel``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, targets, num_classes: int):
    """CE against int labels or soft (mixup) target rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    if targets.ndim == logits.ndim:       # soft targets
        return -jnp.mean(jnp.sum(targets * logp, axis=-1))
    onehot = jax.nn.one_hot(targets, num_classes)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def make_train_step(model, tx: optax.GradientTransformation, num_classes: int,
                    running_stat: bool = True):
    """Returns ``step(state, batch, rng) -> (state, metrics)``.

    ``state``: dict(params, quant_stats, opt_state, step)
    ``batch``: dict(image [B,H,W,3] f32, label [B] int or [B,C] soft)
    """

    def step(state: Dict[str, Any], batch, rng):
        def loss_fn(params):
            rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
            logits, upd = model.apply(
                {"params": params, "quant_stats": state["quant_stats"]},
                batch["image"], running_stat=running_stat, train=True,
                rngs=rngs, mutable=["quant_stats"])
            loss = cross_entropy(logits, batch["label"], num_classes)
            return loss, (upd["quant_stats"], logits)

        (loss, (quant_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "quant_stats": quant_stats,
                     "opt_state": opt_state, "step": state["step"] + 1}
        label = batch["label"]
        hard = label.argmax(-1) if label.ndim == 2 else label
        acc = jnp.mean((logits.argmax(-1) == hard).astype(jnp.float32))
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_eval_step(model, num_classes: int):
    def step(variables, batch):
        logits = model.apply(variables, batch["image"], running_stat=False)
        loss = cross_entropy(logits, batch["label"], num_classes)
        top1 = (logits.argmax(-1) == batch["label"]).astype(jnp.float32)
        top5 = jnp.any(
            jax.lax.top_k(logits, 5)[1] == batch["label"][:, None],
            axis=-1).astype(jnp.float32)
        return {"loss": loss, "top1": jnp.mean(top1), "top5": jnp.mean(top5),
                "count": jnp.asarray(batch["label"].shape[0], jnp.float32)}

    return step


def make_calibration_step(model):
    """Forward-only EMA range settling (ref calibrate_model, quant_train:199)."""

    def step(params, quant_stats, images):
        _, upd = model.apply({"params": params, "quant_stats": quant_stats},
                             images, running_stat=True,
                             mutable=["quant_stats"])
        return upd["quant_stats"]

    return step


def init_train_state(model, tx, rng, sample_batch) -> Dict[str, Any]:
    variables = model.init({"params": rng}, sample_batch, running_stat=True)
    return {
        "params": variables["params"],
        "quant_stats": variables["quant_stats"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
