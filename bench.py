"""Headline benchmark: DeiT-Small INT8 images/sec/chip on the integer engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup of the int8 engine over the same-architecture
bf16 float model on the same chip (the reference paper's headline comparison
is int8-vs-fp32 latency, TVM_benchmark methodology).
Runs on whatever jax.devices() provides (the real TPU in the driver).
"""

import json
import sys
import threading

import numpy as np


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """True if jax can reach a backend within the timeout.

    The axon TPU tunnel sometimes hangs indefinitely in backend init
    (runs/tpu_probe.log documents multi-hour outages); failing fast with a
    clear message beats a silent driver timeout.
    """
    ok = []

    def try_init():
        try:
            import jax
            jax.devices()
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=try_init, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if not _probe_backend():
        print("bench.py: backend init did not complete within 180s "
              "(TPU tunnel down? see runs/tpu_probe.log)", file=sys.stderr)
        return 1
    import jax
    import jax.numpy as jnp

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.models import str2model
    from ivit_tpu.models.vit_float import float_model
    from ivit_tpu.utils.benchmarking import time_dispatch

    MODEL = "deit_small_patch16_224"
    BATCH = 256
    rng = np.random.default_rng(0)

    # --- int8 engine (BASELINE config matrix: DeiT-S uses ibert) ---
    model = str2model(MODEL)(gelu_type="ibert", softmax_type="ibert",
                             layernorm_type="ibert")
    x_cal = jnp.asarray(rng.normal(size=(16, 224, 224, 3)).astype(np.float32))
    variables = jax.jit(
        lambda a: model.init(jax.random.PRNGKey(0), a, running_stat=True))(x_cal)
    _, st = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x_cal)
    spec = freeze_model(model, {"params": variables["params"],
                                "quant_stats": st["quant_stats"]})
    eng = jax.jit(lambda p, a: engine_forward(type(spec)(spec.config, p), a,
                                             pallas=None))

    x = jnp.asarray(rng.normal(size=(BATCH, 224, 224, 3)).astype(np.float32))
    t_int8 = time_dispatch(lambda a: eng(spec.params, a), x, iters=30)

    # --- bf16 float baseline, same architecture ---
    fm = float_model(MODEL)
    fvars = jax.jit(lambda a: fm.init(jax.random.PRNGKey(0), a))(x_cal)
    ff = jax.jit(lambda v, a: fm.apply(v, a))
    t_bf16 = time_dispatch(lambda a: ff(fvars, a), x, iters=30)

    ips = BATCH / t_int8
    print(json.dumps({
        "metric": "deit_small_int8_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "img/s",
        "vs_baseline": round(t_bf16 / t_int8, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
