"""Host-side init helper for flaky accelerator tunnels.

Model ``init`` RNG graphs intermittently SIGSEGV the axon compile helper
(runs/tpu_probe.log), so measurement scripts prepare parameters on the host
CPU backend when one is registered.  Some tunnel configurations register
ONLY the accelerator backend (``Unknown backend cpu``, round-3
bench_matrix failure) — in that case fall back to the default device and
accept the occasional retry.
"""

from __future__ import annotations

import contextlib


def host_init():
    """Context manager: run traced init on the CPU backend if one exists."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)
