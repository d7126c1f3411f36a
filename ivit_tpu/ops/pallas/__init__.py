"""Pallas TPU kernels (fused integer nonlinearities and block kernels).

``FORCE_INTERPRET`` routes every kernel through the Pallas interpreter —
used by the CPU test suite to validate bit-parity without TPU hardware.
"""

import contextlib

FORCE_INTERPRET = False


def _interp(flag: bool) -> bool:
    return flag or FORCE_INTERPRET


@contextlib.contextmanager
def _kernel_trace(interpret: bool):
    """Context for tracing a kernel body.

    The hardened float primitives (ops/quant.py) use
    ``lax.optimization_barrier`` to defeat XLA's HLO-level rewrites.  Mosaic
    has no lowering rule for that primitive — and never runs those rewrites
    (it is a separate compiler that lowers ops 1:1) — so when tracing for a
    REAL TPU kernel the barriers must come out of the jaxpr.  Interpret-mode
    kernels execute as XLA ops, where the barriers are load-bearing.
    """
    from .. import quant
    old = quant._BARRIERS
    quant._BARRIERS = interpret     # keep barriers only under the interpreter
    try:
        yield
    finally:
        quant._BARRIERS = old
