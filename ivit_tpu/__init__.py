"""ivit_tpu — TPU-native integer-only Vision Transformer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
lionnus/I-ViT reference (PyTorch QAT + TVM int8 deployment): W8A8
quantization-aware training with dyadic requantization, integer-only
nonlinearities (Shiftmax / ShiftGELU / I-LayerNorm, I-BERT polynomials,
runtime-fitted piecewise polynomials), and an integer deployment engine built
on Pallas int8 kernels with multi-chip serving via jax.sharding.
"""

__version__ = "0.1.0"

from . import models, ops  # noqa: F401
