"""DeiT distillation loss (ref ``/root/reference/utils/train_utils.py:6-66``).

The reference carries this as dead code (never constructed); here it is a
working option: hard or soft distillation from a float teacher (typically
``models/vit_float.FloatVisionTransformer`` with pretrained weights), for
DeiT-style QAT fine-tuning.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def distillation_loss(base_loss, student_logits, teacher_logits,
                      distillation_type: str = "none",
                      alpha: float = 0.5, tau: float = 1.0):
    """Combine the base criterion with a distillation term.

    ``soft``: KL(teacher || student) at temperature tau (scaled by tau^2);
    ``hard``: CE against the teacher's argmax — matching train_utils.py:40-62.
    """
    if distillation_type == "none" or teacher_logits is None:
        return base_loss
    if distillation_type == "soft":
        t = jax.nn.log_softmax(teacher_logits / tau, axis=-1)
        s = jax.nn.log_softmax(student_logits / tau, axis=-1)
        distill = jnp.mean(jnp.sum(jnp.exp(t) * (t - s), axis=-1)) * tau * tau
    elif distillation_type == "hard":
        hard_targets = jnp.argmax(teacher_logits, axis=-1)
        logp = jax.nn.log_softmax(student_logits, axis=-1)
        distill = -jnp.mean(
            jnp.take_along_axis(logp, hard_targets[:, None], axis=-1))
    else:
        raise ValueError(f"unknown distillation type {distillation_type!r}")
    return base_loss * (1 - alpha) + distill * alpha


def make_teacher_fn(teacher_model, teacher_variables) -> Callable:
    """Jitted frozen teacher forward for use inside the train step."""
    @jax.jit
    def teacher_fn(images):
        return jax.lax.stop_gradient(
            teacher_model.apply(teacher_variables, images))
    return teacher_fn
