"""Pallas TPU kernels (fused integer nonlinearities and block kernels).

``FORCE_INTERPRET`` routes every kernel through the Pallas interpreter —
used by the CPU test suite to validate bit-parity without TPU hardware.
"""

FORCE_INTERPRET = False


def _interp(flag: bool) -> bool:
    return flag or FORCE_INTERPRET
